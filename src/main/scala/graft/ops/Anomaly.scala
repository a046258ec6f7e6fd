package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** High-density-period detection (reference 实习一/实习一代码/test.py:636-694):
  * tumbling 1-hour counts → keep windows with count > mean + 2σ →
  * gap-sessionize (≤ maxGapHours) → per-session min/max/max/avg → top-k by
  * peak count.
  *
  * Scale notes: the hourly aggregate is a map-side-combinable groupBy on the
  * hour index (one shuffle, key cardinality = #hours — tiny); the 2σ
  * thresholds are a scalar aggregate broadcast back via cross join (Catalyst
  * plans a BroadcastNestedLoopJoin over a 1-row side); sessionization then
  * runs on only the anomalous hours (a few rows), so the global-order window
  * is not a bottleneck at any scale.
  */
object Anomaly {

  /** `df` must carry `ts_ns` (int64 epoch nanos). Returns one row per
    * high-density session: start_hour/end_hour (epoch seconds), peak and
    * average hourly count, duration_hours. */
  def highDensityPeriods(events: DataFrame, maxGapHours: Int = 1, sigma: Double = 2.0): DataFrame = {
    val hourly = events
      .withColumn("hour_idx", expr("ts_ns div 3600000000000"))
      .groupBy("hour_idx").agg(count(lit(1)).as("cnt"))

    val stats = hourly.agg(
      avg("cnt").as("mean_cnt"),
      stddev_samp(col("cnt").cast("double")).as("std_cnt"))

    val anomalous = hourly.crossJoin(stats)
      .filter(col("cnt") > col("mean_cnt") + lit(sigma) * col("std_cnt"))
      .select("hour_idx", "cnt")

    Sessionize.byGap(anomalous, col("hour_idx"), maxGapHours.toLong)
      .groupBy("session_id")
      .agg(
        (min("hour_idx") * 3600L).as("start_epoch"),
        (max("hour_idx") * 3600L).as("end_epoch"),
        max("cnt").as("max_count"),
        round(avg("cnt"), 4).as("avg_count"),
        (max("hour_idx") - min("hour_idx") + 1L).as("duration_hours"))
      .drop("session_id")
  }
}
