package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via mapGroupsWithState (SURVEY.md §1.1: the
  * KeyValueGroupedDataset state path for semantics session_window can't
  * express). The running per-user profile keeps a cumulative event count,
  * a running value sum, and the last-seen event time across ALL batches —
  * unbounded-lifetime state with an idle-timeout eviction policy, which a
  * gap-bounded session window cannot represent.
  */
object StatefulOps {

  case class UserEvent(user_id: Long, epoch: Long, value: Double)
  case class UserProfile(user_id: Long, n_events: Long, total_value: Double,
      last_epoch: Long)

  /** One profile row per user per batch (update semantics). Production
    * deployments bound state with a processing-time idle timeout
    * (`GroupStateTimeout.ProcessingTimeTimeout` + `setTimeoutDuration`);
    * that path needs a real clocked trigger — under bounded
    * Trigger.AvailableNow replay the timeout scheduler keeps the query
    * alive, so this library default is NoTimeout and eviction is opt-in. */
  def runningProfiles(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](GroupStateTimeout.NoTimeout) {
        case (userId, batch, state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0.0, Long.MinValue))
          val next = batch.foldLeft(prev) { (p, e) =>
            UserProfile(userId, p.n_events + 1, p.total_value + e.value,
              math.max(p.last_epoch, e.epoch))
          }
          state.update(next)
          next
      }
  }

  case class Ev(user_id: Long, ts_ns: Long, event_id: Long, event_type: String)
  case class LastEvent(ts_ns: Long, event_id: Long, event_type: String)
  case class TransPair(prev_type: String, event_type: String)

  /** Streaming first-order transition pairs: per user, each event pairs with
    * its predecessor — WITHIN a batch by (ts, id) sort of that user's slice,
    * ACROSS batches through the kept last-event state. Replaying the full
    * corpus therefore emits exactly the batch lag-window pairs (the w18
    * oracle). State is one event per user; flatMap emits ≥0 rows per group,
    * which complete-mode aggregation can't express — hence append mode. */
  def transitionStream(events: Dataset[Ev]): Dataset[TransPair] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, TransPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, batch, state: GroupState[LastEvent]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_ns, e.event_id))
          var prev = state.getOption
          val out = Seq.newBuilder[TransPair]
          for (e <- sorted) {
            prev.foreach(p => out += TransPair(p.event_type, e.event_type))
            prev = Some(LastEvent(e.ts_ns, e.event_id, e.event_type))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Batch-mode equivalence oracle for the spec: the same profile from a
    * plain aggregation. */
  def profilesBatch(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserProfile] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"),
        max("epoch").as("last_epoch"))
      .as[UserProfile]
  }

  val outputMode: OutputMode = OutputMode.Update()
}
