package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Multi-table LSH (v2/v3's candidate generator): exact duplicates must
  * collide in EVERY table, and the banded join must generate strictly fewer
  * candidate pairs than the n² scan it replaces. */
class MultiTableLshSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  // Deterministic spread-out vectors; id 100 duplicates id 3 exactly.
  private def vecs = ((0 until 20).map { i =>
    (i.toLong, (0 until Dim).map(d => (((i * 31 + d * 17) % 97) / 97.0f - 0.5f)).toArray)
  } :+ (100L, (0 until Dim).map(d => (((3 * 31 + d * 17) % 97) / 97.0f - 0.5f)).toArray))

  private def banded = vecs.toDF("vec_id", "embedding")
    .withColumn("dots", hyperplaneDots(col("embedding"), 32, Dim))
    .withColumn("bands", lshBandKeysVec(col("dots"), 4, 8))

  test("band keys are well-formed and span all 4 tables") {
    val bands = banded.select(explode(col("bands")).as("band"))
      .as[String].collect()
    assert(bands.forall(_.matches("""[0-3]:\d+""")))
    assert(bands.map(_.split(":")(0)).distinct.sorted.toSeq === Seq("0", "1", "2", "3"))
  }

  test("exact duplicates collide in every table; candidates stay below n²") {
    val b = banded.select(col("vec_id"), explode(col("bands")).as("band"))
    val dup = b.filter(col("vec_id").isin(3L, 100L))
      .groupBy("band").agg(countDistinct("vec_id").as("n"))
      .filter(col("n") === 2).count()
    assert(dup === 4L, "an identical pair must share all 4 band keys")

    val nPairs = b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.vec_id") < col("b.vec_id"))
      .select("a.vec_id", "b.vec_id").distinct().count()
    val allPairs = 21L * 20 / 2
    assert(nPairs < allPairs,
      s"banding must prune the pair space ($nPairs vs $allPairs)")
  }

  test("fused native band keys == HOF composition, at oracle and whale geometry") {
    import graft.functions.VectorExpr
    val df = vecs.toDF("vec_id", "embedding")
    for ((t, w) <- Seq((4, 8), (11, 15))) {
      val hof = df
        .withColumn("dots", hyperplaneDots(col("embedding"), t * w, Dim))
        .select(col("vec_id"), lshBandKeysVec(col("dots"), t, w).as("bands"))
      val fused = df.select(col("vec_id"),
        VectorExpr.vecLshBandKeys(col("embedding"), t, w).as("bands"))
      val mismatch = hof.as[(Long, Seq[String])].collect().toMap
      val got = fused.as[(Long, Seq[String])].collect().toMap
      assert(got === mismatch, s"geometry ${t}x$w")
    }
  }

  test("corpus-adaptive geometry: oracle scales get the frozen 4x8; width grows with n") {
    import graft.queries.VectorQueries.lshGeometry
    // Every oracle-checked corpus size must yield the literal geometry the
    // DuckDB twins pin (sf0.001=20, sf0.01=200, sf0.1=2000 embeddings).
    for (n <- Seq(20L, 200L, 2000L)) assert(lshGeometry(n) === ((4, 8)), s"n=$n")
    // Whale scales widen: E[bucket] <= 8 keeps candidate pairs ~4nT (linear).
    assert(lshGeometry(20000L) === ((8, 12)))
    assert(lshGeometry(200000L) === ((11, 15)))
    // Monotone non-decreasing width; caps respected.
    val ws = Seq(1L, 100L, 10000L, 1000000L, 100000000L, Long.MaxValue / 2)
      .map(lshGeometry(_)._2)
    assert(ws === ws.sorted && ws.last <= 24)
    assert(lshGeometry(Long.MaxValue / 2)._1 <= 12)
  }
}
