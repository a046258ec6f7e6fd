package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join (SURVEY.md §4 "grid bucketing / co-located
  * joins"): persisting both sides bucketed by the join key lets Spark join
  * without any shuffle exchange — the storage-level partitioning strategy
  * for repeated large-large joins at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("bucketed self-join on the bucket key plans without a shuffle exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")

    val t = spark.table("li_bucketed")
    val joined = t.as("a").join(t.as("b"), "l_orderkey")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    // The join itself must not shuffle either side: the only exchange in
    // the plan belongs to the downstream aggregation... and with the
    // grouping key equal to the bucket key, even that one is avoided.
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)

    // Cross-check the result against the unbucketed join.
    val expected = li.as("a").join(li.as("b"), "l_orderkey")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
  }
}
