package graft

import graft.ops.Cumulative
import org.apache.spark.sql.functions._

/** ops.Cumulative — the distributed prefix sum behind a11/a12/m2/m21 — must
  * reproduce the sequential running totals exactly, across many partitions,
  * for asc and desc orders, with heavy value ties (unique tie-breaker). */
class CumulativeSpec extends SparkSpec {
  import spark.implicits._

  test("running sum and rank match the sequential computation (asc, ties)") {
    val n = 5000
    val rows = (1 to n).map(i => (i.toLong, (i % 37).toLong)) // 37-way ties
    val df = rows.toDF("id", "v").repartition(16)
    val got = Cumulative.runningSum(df, Seq(col("v"), col("id")), col("v"), "rnk", "cum")
      .select("id", "v", "rnk", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val expected = rows.sortBy { case (id, v) => (v, id) }
      .scanLeft((0L, 0L, 0L)) { case ((_, rnk, cum), (id, v)) => (id, rnk + 1, cum + v) }
      .drop(1)
      .map { case (id, rnk, cum) => (id, rnk, cum) }
      .sortBy(_._1)
    assert(got.toSeq === expected)
  }

  test("desc order with a unique key") {
    val df = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 30L)).toDF("id", "v")
      .repartition(4)
    val got = Cumulative.runningSum(df, Seq(col("v").desc, col("id")), col("v"), "rnk", "cum")
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // order: (30,id2) (30,id4) (20,id3) (10,id1)
    assert(got === Seq((2L, 1L, 30L), (4L, 2L, 60L), (3L, 3L, 80L), (1L, 4L, 90L)))
  }

  test("single row and empty frames") {
    val one = Seq((7L, 5L)).toDF("id", "v")
    val g1 = Cumulative.runningSum(one, Seq(col("v"), col("id")), col("v"), "rnk", "cum")
      .head()
    assert(g1.getAs[Long]("rnk") === 1L && g1.getAs[Long]("cum") === 5L)
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Cumulative.runningSum(empty, Seq(col("v"), col("id")), col("v"), "rnk", "cum")
      .count() === 0L)
  }

  test("ntileOfRank reproduces Spark's ntile for every group size 1..35") {
    // Every (n, r) pair with n in 1..35 at k=10 — covers n<k, n=k, n%k=0,
    // and every remainder class — checked against ntile itself on a
    // single-group window (safe at test size; the closed form exists so
    // production plans never need that window).
    import org.apache.spark.sql.expressions.Window
    val rows = for { n <- 1 to 35; r <- 1 to n } yield (n.toLong, r.toLong)
    val df = rows.toDF("n", "r")
    val got = df.withColumn("d", Cumulative.ntileOfRank(col("r"), col("n"), 10))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    for (n <- 1 to 35) {
      val w = Window.partitionBy(lit(1)).orderBy("r")
      val exp = (1 to n).map(_.toLong).toDF("r")
        .withColumn("d", ntile(10).over(w).cast("long"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      for (r <- 1 to n)
        assert(got((n.toLong, r.toLong)) === exp(r.toLong), s"n=$n r=$r")
    }
  }

  test("runningMaxExclusive matches the single-partition exclusive window") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i => (i, rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "v").repartition(8)
    val got = Cumulative.runningMaxExclusive(df, Seq(col("id")), col("v"), "mx")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    val expected = rows.scanLeft((0L, -1L)) { case ((_, mx), (id, v)) =>
      (id, math.max(mx, v))
    }.sliding(2).map { case Seq((_, prevMx), (id, _)) => (id, prevMx) }.toSeq
    assert(got.toSeq === expected)
    // the first row has no predecessor: null prefix max
    assert(got.head === (1L, -1L))
  }
}
