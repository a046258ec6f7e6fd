package graft

import graft.ops.ShingleIndex
import org.apache.spark.sql.functions._

/** The sf testdata never exceeds the df cap (max shingle df ≈ 25 at sf0.1),
  * so the production guard is exercised here on a corpus built to trip it:
  * a boilerplate trigram shared by every doc must be dropped from the index
  * while genuinely discriminative near-dup overlap survives. */
class ShingleIndexSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "click here now"

  // 12 docs, all starting with the same boilerplate trigram; docs 10/11 are
  // near-dups of each other beyond the boilerplate.
  private def corpus = (0 until 10).map { i =>
    (i.toLong, s"$boiler unique$i alpha$i beta$i gamma$i delta$i")
  } ++ Seq(
    (10L, s"$boiler same tail of shared tokens here"),
    (11L, s"$boiler same tail of shared tokens here"))

  test("df cap drops boilerplate shingles, keeps discriminative ones") {
    val docs = corpus.toDF("doc_id", "text")
    val capped = ShingleIndex.cappedOf(docs, cap = 10)
    val shingleSet = capped.select("sh").distinct().as[String].collect().toSet
    assert(!shingleSet.contains(boiler),
      "df=12 boilerplate shingle must be dropped at cap=10")
    assert(shingleSet.exists(_.contains("unique0")),
      "df=1 shingles must survive")
  }

  test("near-dup pair survives the cap while boilerplate-only pairs vanish") {
    val docs = corpus.toDF("doc_id", "text")
    val sh = ShingleIndex.cappedOf(docs, cap = 10)
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L)),
      s"only the true near-dup pair should remain, got $pairs")
  }

  test("without the cap, boilerplate fans out to all-pairs") {
    val docs = corpus.toDF("doc_id", "text")
    val sh = ShingleIndex.cappedOf(docs, cap = 1000)
    val nPairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select("a.doc_id", "b.doc_id").distinct().count()
    assert(nPairs === 12L * 11 / 2,
      "uncapped boilerplate must connect every doc pair — the O(df²) blowup the cap prevents")
  }
}
