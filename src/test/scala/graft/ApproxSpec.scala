package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct (HLL++) accuracy guard for the sketch-based
  * coverage query a13b — estimates must stay within the configured rsd
  * envelope of exact counts. */
class ApproxSpec extends SparkSpec {

  test("GK approx quantiles within 1% of exact (a7b's sketch path)") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val r = li.agg(
      expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)").as("a"),
      expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("e"))
      .head()
    val approx = r.getSeq[Double](0)
    val exact = r.getSeq[Double](1)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.01, s"approx $a vs exact $e")
    }
  }

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
