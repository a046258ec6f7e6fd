package graft

import graft.spatial.DistanceBand
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DistanceBand's collapsed weighted-location aggregate pinned against the
  * naive id-level pair enumeration on fixtures where they must agree —
  * including the coincident-mass shape the collapse exists for. */
class DistanceBandSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-collapse shape: enumerate all unordered id pairs within eps,
    * aggregate. Affordable at fixture size; the ground truth. */
  private def naive(pts: DataFrame, eps: Double): (Long, Long, Option[Double], Option[Double]) = {
    val a = pts.select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya"))
    val row = a.crossJoin(pts)
      .filter(col("ia") < col("id"))
      .withColumn("d2",
        (col("xa") - col("x")) * (col("xa") - col("x"))
          + (col("ya") - col("y")) * (col("ya") - col("y")))
      .filter(col("d2") <= lit(eps * eps))
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(col("ia") + col("id")), lit(0L)).as("id_checksum"),
        round(min(sqrt(col("d2"))), 6).as("min_dist"),
        round(max(sqrt(col("d2"))), 6).as("max_dist"))
      .head()
    (row.getLong(0), row.getLong(1),
      Option(row.get(2)).map(_.asInstanceOf[Double]),
      Option(row.get(3)).map(_.asInstanceOf[Double]))
  }

  private def collapsed(pts: DataFrame, eps: Double): (Long, Long, Option[Double], Option[Double]) = {
    val row = DistanceBand.pairStats(pts, eps).head()
    (row.getLong(0), row.getLong(1),
      Option(row.get(2)).map(_.asInstanceOf[Double]),
      Option(row.get(3)).map(_.asInstanceOf[Double]))
  }

  private def check(pts: Seq[(Long, Double, Double)], eps: Double): Unit = {
    val df = pts.toDF("id", "x", "y")
    assert(collapsed(df, eps) === naive(df, eps))
  }

  test("coincident mass: heavy exact-duplicate coordinates match the naive aggregate") {
    // 3 locations × many coincident ids each, two within eps of each other,
    // one isolated — within-location pairs (d=0) and cross-location pairs
    // both present; checksum exercises the w·S fold.
    val pts =
      (0L until 40L).map(i => (i, 1.0, 1.0)) ++
      (40L until 70L).map(i => (i, 1.003, 1.004)) ++
      (70L until 90L).map(i => (i, 9.0, 9.0))
    check(pts, eps = 0.01)
  }

  test("spread points across cell boundaries match the naive aggregate") {
    // Deterministic scatter spanning multiple grid cells, pairs straddling
    // cell borders (the 3×3 probe's reason to exist).
    val pts = (0L until 200L).map { i =>
      (i, (i * 7919 % 101) / 100.0, (i * 104729 % 97) / 96.0)
    }
    check(pts, eps = 0.05)
  }

  test("no pairs within eps yields zero counts and null distances") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 10.0, 0.0), (3L, 0.0, 10.0))
    assert(collapsed(pts.toDF("id", "x", "y"), eps = 0.5)
      === ((0L, 0L, None, None)))
  }

  test("single coincident location only: distances are exactly zero") {
    val pts = (0L until 12L).map(i => (i, 5.0, 5.0))
    val got = collapsed(pts.toDF("id", "x", "y"), eps = 0.01)
    assert(got._1 === 66L)                  // C(12,2)
    assert(got._2 === (0L until 12L).sum * 11) // (w-1)·S
    assert(got._3 === Some(0.0) && got._4 === Some(0.0))
  }

  test("adversarial distinct-dense cell is refused by GridGuard") {
    val n = graft.ops.GridGuard.DefaultMaxCellCount + 1
    val dense = spark.range(n).toDF("id")
      .withColumn("x", col("id") / 1e9)
      .withColumn("y", lit(0.0))
    val e = intercept[IllegalArgumentException] {
      DistanceBand.pairStats(dense, eps = 0.01).head()
    }
    assert(e.getMessage.contains("distance band"))
  }
}
