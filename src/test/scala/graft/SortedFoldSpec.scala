package graft

import org.apache.spark.sql.functions._
import graft.ops.SortedFold

/** Pins the two-level sorted-fold contract directly (it is otherwise only
  * covered transitively via the oracle-green m3b/m4b/v5-v7 queries):
  *  1. the fold is bit-identical to a local replay of the documented
  *     two-level order (inner: sort each (group, id/4096) bucket, sum
  *     left-to-right; outer: sort bucket partials BY VALUE, sum) — the
  *     exact order DuckDB replays via list_sum(list_sort(list(x)));
  *  2. a group larger than BucketCap genuinely splits into buckets (the
  *     OOM-avoidance claim), and the result still matches the replay;
  *  3. the inputs are chosen so FP addition order MATTERS (mix of 1e16 and
  *     1.0 magnitudes) — if the operator folded in any other order the
  *     bit-comparison would fail, so the test distinguishes orders. */
class SortedFoldSpec extends SparkSpec {
  import spark.implicits._

  /** Local replay of the documented two-level fold order. */
  private def replaySum(rows: Seq[(Long, Double)]): Double = {
    val partials = rows.groupBy(_._1 / SortedFold.BucketCap).toSeq
      .map { case (_, b) => b.map(_._2).sorted.foldLeft(0.0)(_ + _) }
    partials.sorted.foldLeft(0.0)(_ + _)
  }

  // Magnitude mix: (1e16 + 1.0) == 1e16 in doubles, so sum order matters.
  private def mixedVals(n: Int, seed: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i => if (r.nextInt(3) == 0) 1.0e16 * (r.nextInt(5) - 2) else r.nextDouble())
  }

  test("small group (single bucket) folds bit-identically to the replayed order") {
    val rows = mixedVals(200, 1).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "x").withColumn("g", lit("a"))
    val got = SortedFold.sums(df, Seq("g"), col("id"), Seq("x" -> "sx"))
      .select("sx").as[Double].head()
    assert(got == replaySum(rows), "two-level fold must equal the local replay bit-for-bit")
  }

  test("group larger than BucketCap splits into buckets and still matches the replay") {
    val n = 3 * SortedFold.BucketCap + 17 // forces 4 buckets
    val rows = mixedVals(n, 2).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "x").withColumn("g", lit("big")).repartition(8)
    val got = SortedFold.sums(df, Seq("g"), col("id"), Seq("x" -> "sx"))
      .select("sx").as[Double].head()
    assert(got == replaySum(rows))
  }

  test("fold order is sorted-ascending, provably (distinguishes orders)") {
    // [1e16, 1, 1]: sorted fold = (1+1)+1e16 = 1e16+2 exactly (ulp(1e16)=2);
    // id-order fold = (1e16+1)+1 = 1e16 (each +1 rounds away, ties-to-even).
    val rows = Seq((0L, 1.0e16), (1L, 1.0), (2L, 1.0))
    val got = SortedFold.sums(rows.toDF("id", "x").withColumn("g", lit("o")),
        Seq("g"), col("id"), Seq("x" -> "sx"))
      .select("sx").as[Double].head()
    assert(got == 1.0e16 + 2.0)
    assert(rows.map(_._2).foldLeft(0.0)(_ + _) == 1.0e16,
      "id-order fold collapses — the assertion above genuinely pins the sorted order")
  }

  test("means returns replayed sum / n and carries n_fold; multi-group, multi-column") {
    val ra = mixedVals(5000, 3).zipWithIndex.map { case (v, i) => (i.toLong, v, "a") }
    val rb = mixedVals(300, 4).zipWithIndex.map { case (v, i) => (i.toLong, v, "b") }
    val df = (ra ++ rb).toDF("id", "x", "g").withColumn("y", col("x") * 2)
    val out = SortedFold.means(df, Seq("g"), col("id"), Seq("x" -> "mx", "y" -> "my"))
      .collect().map(r => r.getString(0) -> r).toMap
    val expA = replaySum(ra.map(t => (t._1, t._2))) / 5000
    val expB = replaySum(rb.map(t => (t._1, t._2))) / 300
    assert(out("a").getDouble(1) == expA && out("a").getLong(3) == 5000L)
    assert(out("b").getDouble(1) == expB && out("b").getLong(3) == 300L)
    val expAy = replaySum(ra.map(t => (t._1, t._2 * 2))) / 5000
    assert(out("a").getDouble(2) == expAy, "second folded column must replay independently")
  }
}
