package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct (HLL++) accuracy guard for the sketch-based
  * coverage query a13b — estimates must stay within the configured rsd
  * envelope of exact counts. */
class ApproxSpec extends SparkSpec {

  test("HLL distinct estimate within 5% of exact per group") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.01")
    val both = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact"),
        approx_count_distinct("user_id", 0.02).as("approx"))
      .collect()
    both.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: exact $exact vs approx $approx")
    }
  }
}
