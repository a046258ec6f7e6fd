package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (reference semantics: merge consecutive
  * anomalous hours when the gap ≤ threshold — 实习一/实习一代码/test.py:664-683,
  * `diff() → (gap>thresh).cumsum()` group id).
  *
  * Spark form: `lag` + running `sum` over an ordered window. NOTE the
  * single-partition caveat: with no partition key this is a global sort on
  * one task. That is correct for the reference's use (sessionizing a few
  * hundred anomalous *windows*, i.e. post-aggregation rows), and we keep a
  * partitioned variant (`byGapPerKey`) for raw-event-scale sessionization
  * where the per-user partition restores parallelism at 100 TB.
  */
object Sessionize {

  /** Adds `session_id` (0-based, in `orderCol` order) where a new session
    * starts whenever `orderCol - lag(orderCol) > maxGap`. `orderCol` must be
    * numeric (e.g. epoch seconds / hour index). */
  def byGap(df: DataFrame, orderCol: Column, maxGap: Long): DataFrame = {
    // Constant partition key: semantically identical to the empty
    // partitionSpec (one partition) but silences the WindowExec warning, so
    // any REAL unpartitioned window over data-proportional rows stands out
    // in a clean log. Must be NON-FOLDABLE (derived from a column) — a bare
    // lit(0) is constant-folded out of the partitionSpec and the warning
    // returns; pmod(x, 1) is 0 for every non-null numeric x.
    val w = Window.partitionBy(coalesce(pmod(orderCol, lit(1)), lit(0))).orderBy(orderCol)
    df.withColumn("_gap", orderCol - lag(orderCol, 1).over(w))
      .withColumn("session_id",
        sum(when(col("_gap").isNull || col("_gap") <= maxGap, 0L).otherwise(1L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_gap")
  }

  /** Per-key variant: sessions never span keys; the shuffle is on `key`, so
    * parallelism scales with key cardinality (users), not data volume. */
  def byGapPerKey(df: DataFrame, key: Column, orderCol: Column, maxGap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCol)
    df.withColumn("_gap", orderCol - lag(orderCol, 1).over(w))
      .withColumn("session_id",
        sum(when(col("_gap").isNull || col("_gap") <= maxGap, 0L).otherwise(1L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_gap")
  }
}
