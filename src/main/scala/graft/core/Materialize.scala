package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative DataFrame programs (SSSP, connected
  * components, DBSCAN, kNN): each round must cut its plan or Catalyst
  * analysis grows exponentially (see GraphOps.sssp).
  *
  * Mode switch: when the SparkContext has a checkpoint dir configured
  * (`spark.sparkContext.setCheckpointDir(...)` — cluster jobs), rounds use
  * RELIABLE `checkpoint`, whose files survive executor loss; otherwise
  * `localCheckpoint`, whose executor-local blocks are faster but die with
  * the executor — correct single-JVM, fragile on a real cluster. Both are
  * eager, so callers may release the previous round's state immediately. */
object Materialize {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // RDD checkpoint re-runs lineage in a second job unless the plan is
      // persisted first; persist → checkpoint → unpersist halves each
      // iteration's cost. Checkpoint FILES of superseded rounds are swept by
      // the ContextCleaner when the session sets
      // spark.cleaner.referenceTracking.cleanCheckpoints=true (GraftSession
      // does) — without it they accumulate for the app's lifetime.
      val persisted = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cut = persisted.checkpoint(eager = true)
      persisted.unpersist(blocking = false)
      cut
    } else df.localCheckpoint(eager = true)
}
