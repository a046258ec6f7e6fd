package graft

import graft.sources.Lexicon
import org.apache.spark.sql.functions._

/** The shipped sentiment lexicon (fixtures/sentiment_lexicon.tsv) and the
  * reference's categorize semantics (TextBlob polarity, ±0.1 thresholds —
  * 实习四/…yelp_analysis.ipynb:835-856). */
class LexiconSpec extends SparkSpec {
  import spark.implicits._

  test("lexicon fixture loads with AFINN-scale coverage") {
    val lex = Lexicon.sentiment(spark).cache()
    val n = lex.count()
    assert(n >= 1000L, s"expected >= 1000 entries, got $n")
    // normalized to [-1, 1], both polarities present, no duplicate words
    assert(lex.filter(col("score") > 1.0 || col("score") < -1.0).count() === 0L)
    assert(lex.filter(col("score") > 0).count() > 300L)
    assert(lex.filter(col("score") < 0).count() > 300L)
    assert(lex.select("tok").distinct().count() === n)
    // spot scores on unambiguous words
    def score(w: String): Double =
      lex.filter(col("tok") === w).head().getDouble(1)
    assert(score("excellent") > 0.6)
    assert(score("terrible") < -0.4)
    lex.unpersist()
  }

  test("±0.1 categorize over real English reproduces the reference split") {
    val reviews = Seq(
      (1L, "the food was excellent and the service wonderful truly great"),
      (2L, "terrible experience awful food and rude staff never again"),
      (3L, "the restaurant is on main street and serves lunch daily"),
      (4L, "good pizza but the wait was annoying overall fine"),
      (5L, "worst meal ever disgusting and overpriced")).toDF("id", "text")
    val toks = reviews.select(col("id"), explode(split(col("text"), " ")).as("tok"))
    val cats = toks.join(broadcast(Lexicon.sentiment(spark)), Seq("tok"), "left")
      .groupBy("id").agg(avg("score").as("polarity"))
      .withColumn("cat",
        when(col("polarity").isNull, "no_signal")
          .when(col("polarity") > 0.1, "positive")
          .when(col("polarity") >= -0.1, "neutral")
          .otherwise("negative"))
    val got = cats.select("id", "cat").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "positive")
    assert(got(2L) === "negative")
    assert(got(3L) === "no_signal") // no scored word at all
    assert(got(4L) === "positive")  // good(+2) fine(+2) annoying(-1) -> +0.2
    assert(got(5L) === "negative")
  }

  test("overlay words never collide with the shipped lexicon") {
    val overlap = Lexicon.sentiment(spark)
      .join(Lexicon.domainOverlay(spark).select("tok"), "tok")
    assert(overlap.count() === 0L)
  }
}
