package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-level deterministic sorted-fold aggregation.
  *
  * The suite's order-free-exact means fold each group's values in sorted
  * order (VecSeqSumD ≡ DuckDB `list_sum(list_sort(list(x)))`), which makes
  * the FP result bit-identical across engines — but a SINGLE-level fold
  * collects a group-sized array, and groups like "members of one k-means
  * cluster" or "all values of one PCA dimension" grow with the corpus: a
  * latent executor OOM at cluster scale (flagged by the round-6 scale
  * sweep). This helper folds in two levels instead: an inner fold over the
  * ≤ `BucketCap` values of each (group, id div BucketCap) bucket, then an
  * outer fold over the bucket partials sorted BY VALUE. Both engines replay
  * the identical two-level order (SQL twin below), so cross-engine
  * bit-exactness survives, and the largest collected array is
  * max(BucketCap, n/BucketCap) — at BucketCap = 4096 a trillion-row group
  * folds through ~2 MB arrays per level instead of one n-sized array.
  *
  * DuckDB twin shape for `means(df, Seq("g"), col("id"), Seq("x" -> "mx"))`:
  * {{{
  *   p AS (SELECT g, id // 4096 AS bkt,
  *       list_sum(list_sort(list(x))) AS sx, count(*) AS n
  *     FROM src GROUP BY 1, 2),
  *   out AS (SELECT g, list_sum(list_sort(list(sx))) / sum(n) AS mx,
  *       sum(n) AS n_fold
  *     FROM p GROUP BY 1)
  * }}}
  */
object SortedFold {

  val BucketCap = 4096

  // Primitive-buffer sorted-fold aggregate (round-15): one
  // TypedImperativeAggregate over a raw Array[Double] replaces the boxed
  // collect_list → sort_array → vec_seq_sum chain, bit-identically (see
  // SortedSumD's contract + SortedSumAggSpec).
  private def ssum(c: Column): Column =
    graft.functions.SortedSumD.sortedSum(c)

  /** Deterministic two-level sums of `pairs` (inCol -> outCol) per `keys`
    * group, bucketed by `idCol div BucketCap`. Output: keys ++ outCols. */
  def sums(df: DataFrame, keys: Seq[String], idCol: Column,
           pairs: Seq[(String, String)]): DataFrame = {
    val bucketed = df.withColumn("__bkt",
      floor(idCol / lit(BucketCap.toDouble)).cast("long"))
    val innerAggs = pairs.map { case (in, out) => ssum(col(in)).as(s"__s_$out") }
    val inner = bucketed.groupBy((keys :+ "__bkt").map(col): _*)
      .agg(innerAggs.head, innerAggs.tail: _*)
    val outerAggs = pairs.map { case (_, out) => ssum(col(s"__s_$out")).as(out) }
    inner.groupBy(keys.map(col): _*)
      .agg(outerAggs.head, outerAggs.tail: _*)
  }

  /** Deterministic two-level means of `pairs` (inCol -> outCol) per `keys`
    * group, bucketed by `idCol div BucketCap`. Output: keys ++ outCols ++
    * `n_fold` (the group count, for callers that need it). */
  def means(df: DataFrame, keys: Seq[String], idCol: Column,
            pairs: Seq[(String, String)]): DataFrame = {
    val bucketed = df.withColumn("__bkt",
      floor(idCol / lit(BucketCap.toDouble)).cast("long"))
    val innerAggs = count(lit(1)).as("__n") +:
      pairs.map { case (in, out) => ssum(col(in)).as(s"__s_$out") }
    val inner = bucketed.groupBy((keys :+ "__bkt").map(col): _*)
      .agg(innerAggs.head, innerAggs.tail: _*)
    val outerAggs = sum("__n").as("n_fold") +:
      pairs.map { case (_, out) => ssum(col(s"__s_$out")).as(s"__t_$out") }
    inner.groupBy(keys.map(col): _*)
      .agg(outerAggs.head, outerAggs.tail: _*)
      .select((keys.map(col) ++
        pairs.map { case (_, out) => (col(s"__t_$out") / col("n_fold")).as(out) }) :+
        col("n_fold"): _*)
  }
}
