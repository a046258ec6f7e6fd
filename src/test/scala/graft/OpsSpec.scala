package graft

import graft.ops.{Anomaly, Sessionize}
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap ≤ threshold merges, gap > threshold splits (reference test.py:664-683)") {
    // Hours 1,2,3 (gaps 1) then 10,11 (gap 7) → sessions {1,2,3}, {10,11}.
    val df = Seq(1L, 2L, 3L, 10L, 11L).toDF("h")
    val out = Sessionize.byGap(df, col("h"), maxGap = 1L)
      .groupBy("session_id").agg(count(lit(1)).as("n"), min("h").as("start"))
      .orderBy("start").as[(Long, Long, Long)].collect()
    assert(out.map(_._2).toSeq === Seq(3L, 2L))
    assert(out.map(_._3).toSeq === Seq(1L, 10L))
  }

  test("all gaps above threshold → every row is its own session") {
    val df = Seq(0L, 5L, 10L, 15L).toDF("h")
    val n = Sessionize.byGap(df, col("h"), maxGap = 2L)
      .select("session_id").distinct().count()
    assert(n === 4)
  }

  test("per-key sessions never span keys") {
    val df = Seq(("u1", 1L), ("u1", 2L), ("u2", 2L), ("u2", 10L)).toDF("u", "h")
    val out = Sessionize.byGapPerKey(df, col("u"), col("h"), maxGap = 1L)
      .groupBy("u").agg(countDistinct("session_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(out === Map("u1" -> 1L, "u2" -> 2L))
  }
}

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("high-density periods: a planted 3-hour spike is found and sessionized") {
    val hourNs = 3600000000000L
    // 50 quiet hours with 2 events each + hours 100–102 with 60 events each.
    val quiet = for (h <- 0L until 50L; i <- 0 until 2) yield h * hourNs + i
    val spike = for (h <- 100L to 102L; i <- 0 until 60) yield h * hourNs + i
    val events = (quiet ++ spike).toDF("ts_ns")
    val out = Anomaly.highDensityPeriods(events, maxGapHours = 1, sigma = 2.0)
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(out.length === 1, s"expected one merged session, got ${out.toSeq}")
    val (start, end, maxCnt, avgCnt, dur) = out.head
    assert(start === 100L * 3600 && end === 102L * 3600)
    assert(maxCnt === 60L && avgCnt === 60.0 && dur === 3L)
  }
}

/** CpuWitness.stageLatency — the scheduler-latency witness must actually
  * schedule its chained stages (Catalyst can't collapse RDD repartitions)
  * and return a sane positive reading. */
class StageLatencySpec extends SparkSpec {
  test("stage-latency probe runs its chained no-op job and reads positive") {
    val v = graft.ops.CpuWitness.stageLatency(spark.sparkContext)
    assert(v > 0.0 && v < 60.0, s"stage_ref read $v")
    // the chain really is multi-stage: a second read in a warm scheduler
    // still costs at least a stage round-trip per link
    assert(v > 0.005)
  }
}
