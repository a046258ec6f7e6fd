package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running totals — the classic range-partitioned prefix-sum,
  * replacing the `Window.orderBy(...)` global window whose "No Partition
  * Defined" plan drags every row through ONE task (the scale-killer flagged
  * on the Pareto/CDF queries: per-user totals are data-proportional, so at
  * 100 TB that single partition is the whole aggregate).
  *
  * Shape: `repartitionByRange` on the total sort order → each partition holds
  * a contiguous key range, so a PARTITIONED window (bounded by partition
  * size) computes within-partition prefix sums, and the cross-partition
  * offsets come from a partitions-count-sized summary frame (≤ a few hundred
  * rows) joined back by broadcast. No step is ever single-partition over
  * data-proportional rows.
  *
  * Requirement: `sortCols` must be a TOTAL order (include a unique
  * tie-breaker) — rows with identical range keys may otherwise straddle a
  * partition boundary and double-count into the offsets.
  */
object Cumulative {

  /** Adds `rnkName` (1-based position in `sortCols` order) and `cumName`
    * (inclusive running sum of `valueCol` in that order) to `df`. */
  def runningSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                 rnkName: String, cumName: String): DataFrame = {
    val parts = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    // AQE may coalesce the range shuffle, but only ADJACENT partitions merge,
    // so __pid stays monotone with the sort order.
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val local = ranged
      .withColumn("__rnk_in", row_number().over(w))
      .withColumn("__cum_in", sum(valueCol).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // Per-partition totals: one row per range partition. The prefix over THIS
    // frame is computed by a broadcast self-join (≤ parts² tiny rows), not a
    // window — keeping the whole plan free of unpartitioned WindowExec.
    val ptot = local.groupBy("__pid")
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    val offsets = ptot.as("a")
      .join(broadcast(ptot.select(col("__pid").as("__bpid"),
        col("__psum").as("__bsum"), col("__pcnt").as("__bcnt"))),
        col("__bpid") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum("__bsum"), lit(0)).as("__osum"),
        coalesce(sum("__bcnt"), lit(0L)).as("__ocnt"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rnkName, col("__rnk_in") + col("__ocnt"))
      .withColumn(cumName, col("__cum_in") + col("__osum"))
      .drop("__pid", "__rnk_in", "__cum_in", "__osum", "__ocnt")
  }

  /** SQL-standard `ntile(k)` bucket of 1-based rank `r` in a group of `n`
    * rows, in closed form — the companion to [[runningSum]]'s distributed
    * rank that lets a per-group ntile run WITHOUT a per-group window (the
    * low-cardinality window-partition trap: `ntile OVER (PARTITION BY flag)`
    * with 3 flag values is 3 tasks however big the table). Semantics match
    * Spark/DuckDB exactly: the first (n mod k) buckets hold ceil(n/k) rows,
    * the rest floor(n/k); when n < k the first n buckets hold one row each.
    * All-integer arithmetic on longs. */
  def ntileOfRank(r: Column, n: Column, k: Int): Column = {
    // Spark's `/` is double division even on longs; (a - a%b)/b divides
    // exactly, so the double quotient IS the integer (exact to 2^53 — past
    // any per-group row count the long ranks themselves survive).
    def intDiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val q = intDiv(n.cast("long"), lit(k.toLong))
    val rem = pmod(n.cast("long"), lit(k.toLong))
    val cut = rem * (q + lit(1L)) // rows covered by the ceil-sized buckets
    when(q === 0L, r.cast("long"))
      .when(r <= cut, intDiv(r - lit(1L), q + lit(1L)) + lit(1L))
      .otherwise(rem + intDiv(r - cut - lit(1L), q) + lit(1L))
  }

  /** Adds `maxName`: the EXCLUSIVE prefix max of `valueCol` over the total
    * `sortCols` order (max of all STRICTLY earlier rows; null on the global
    * first row) — same range-partition + broadcast-offset shape as
    * [[runningSum]], so no unpartitioned window anywhere. The skyline /
    * dominance primitive: a row beats the running max iff nothing before it
    * dominates on `valueCol`. */
  def runningMaxExclusive(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                          maxName: String): DataFrame = {
    val parts = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__mx_in", max(valueCol).over(w))
    val ptot = local.groupBy("__pid").agg(max(valueCol).as("__pmax"))
    val offsets = ptot.as("a")
      .join(broadcast(ptot.select(col("__pid").as("__bpid"), col("__pmax").as("__bmax"))),
        col("__bpid") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(max("__bmax").as("__omax"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(maxName,
        when(col("__mx_in").isNull, col("__omax"))
          .when(col("__omax").isNull, col("__mx_in"))
          .otherwise(greatest(col("__mx_in"), col("__omax"))))
      .drop("__pid", "__mx_in", "__omax")
  }
}
