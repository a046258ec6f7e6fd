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
  /** Lineage cut whose materialization is FUSED into the caller's next
    * action (guide §1.2 "remove unnecessary passes"): `cut` is eager — it
    * spends one whole job just materializing — yet every iterative caller
    * immediately runs a small aggregate over the fresh state (the fixpoint
    * signature). `cutLazy` marks the local checkpoint lazily so that ONE
    * action both computes/stores the state blocks and returns the
    * signature, halving the jobs per iteration round (measured round-14:
    * sssp/routes 2 jobs/round → 1, CC 3 → 2).
    *
    * CONTRACT: the caller's first action on the returned frame must scan
    * every partition (count / full aggregate — what the fixpoint signatures
    * do). A partial action (`head`, `limit`) would truncate lineage with
    * blocks missing, making later reads unrecoverable.
    *
    * Reliable-checkpoint mode (cluster, checkpoint dir set) falls back to
    * the eager [[cut]]: reliable checkpointing re-runs lineage in a second
    * job unless persisted first, so the fusion buys nothing there and the
    * persist/unpersist bracket below stays the measured-cheapest shape. */
  def cutLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) cut(df)
    else df.localCheckpoint(eager = false)

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
