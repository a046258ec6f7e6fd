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
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
