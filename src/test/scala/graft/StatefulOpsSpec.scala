package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StatefulOpsSpec extends SparkSpec {

  test("mapGroupsWithState running profiles accumulate across batches and match batch agg") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[UserEvent]
    // Two addData calls → two micro-batches; user 1 spans both, so only
    // cross-batch state can produce the right totals.
    stream.addData(Seq(UserEvent(1L, 10L, 2.0), UserEvent(2L, 11L, 5.0)))
    stream.addData(Seq(UserEvent(1L, 20L, 3.0)))
    val q = StatefulOps.runningProfiles(stream.toDS())
      .writeStream.format("memory").queryName("profiles_test")
      .outputMode(StatefulOps.outputMode)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // Update mode emits a row per key per batch: keep the latest per user.
    val latest = spark.table("profiles_test")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("n_events").as("n_events"),
        org.apache.spark.sql.functions.max("total_value").as("total_value"),
        org.apache.spark.sql.functions.max("last_epoch").as("last_epoch"))
      .as[(Long, Long, Double, Long)].collect()
      .map { case (u, n, v, e) => u -> ((n, v, e)) }.toMap
    assert(latest(1L) === ((2L, 5.0, 20L)))
    assert(latest(2L) === ((1L, 5.0, 11L)))

    val batch = StatefulOps.profilesBatch(spark,
      Seq(UserEvent(1L, 10L, 2.0), UserEvent(2L, 11L, 5.0), UserEvent(1L, 20L, 3.0)).toDS())
      .collect().map(p => p.user_id -> ((p.n_events, p.total_value, p.last_epoch))).toMap
    assert(batch === latest)
  }
}
