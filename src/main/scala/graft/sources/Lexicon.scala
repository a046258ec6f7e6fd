package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sentiment polarity lexicon (SURVEY.md §2.9 M7; reference TextBlob
  * PatternAnalyzer at 实习四/实习四代码/yelp_analysis.ipynb:798).
  *
  * The shipped fixture (fixtures/sentiment_lexicon.tsv, written by
  * tools/make_lexicon.py) is an AFINN-style English wordlist: ~1,100 words
  * scored on the integer [-5, 5] scale, authored for this repo and dedicated
  * to the public domain. [[sentiment]] normalizes to TextBlob's [-1, 1]
  * polarity scale (score/5), so AFINN-/VADER-derived files drop in
  * unchanged. The lexicon is dimension-table-sized BY CONSTRUCTION (every
  * real lexicon is ≤ tens of thousands of rows), so consumers broadcast it
  * and the corpus-side scan stays shuffle-free until the per-doc aggregate.
  */
object Lexicon {

  def defaultPath: String = Fixtures.path("fixtures/sentiment_lexicon.tsv")

  /** (tok, score) rows on the [-1, 1] polarity scale. */
  def sentiment(spark: SparkSession, path: String = null): DataFrame =
    spark.read
      .option("header", "true").option("sep", "\t")
      .schema(StructType(Seq(
        StructField("word", StringType), StructField("score", IntegerType))))
      .csv(Option(path).getOrElse(defaultPath))
      .select(col("word").as("tok"), (col("score") / lit(5.0)).as("score"))

  /** Engine-domain overlay for the synthetic `documents` corpus, whose
    * 31-token vocabulary is query-engine jargon no English lexicon scores.
    * Kept OUT of the fixture file (make_lexicon.py excludes these words) so
    * the union is collision-free. */
  def domainOverlay(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("fast", 0.8), ("slow", -0.8), ("big", 0.2), ("small", -0.2),
      ("dup", -0.5), ("merge", 0.3), ("join", 0.4), ("filter", 0.2),
      ("sort", -0.3), ("stream", 0.5), ("batch", -0.4), ("hash", 0.1))
      .toDF("tok", "score")
  }

  /** The full scoring table the engine queries join: real lexicon + overlay. */
  def scoring(spark: SparkSession): DataFrame =
    sentiment(spark).unionByName(domainOverlay(spark))

  /** DuckDB fragment producing the identical scoring table (CTE `lex`). */
  def scoringSql: String =
    s"""lex AS (
       |  SELECT word AS tok, CAST(score AS DOUBLE) / 5 AS score
       |  FROM read_csv('$defaultPath',
       |    header=true, delim='\t')
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    ('fast', 0.8), ('slow', -0.8), ('big', 0.2), ('small', -0.2),
       |    ('dup', -0.5), ('merge', 0.3), ('join', 0.4), ('filter', 0.2),
       |    ('sort', -0.3), ('stream', 0.5), ('batch', -0.4), ('hash', 0.1))
       |    t(tok, score))""".stripMargin
}
