package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Releases the storage blocks behind a `localCheckpoint`ed Dataset.
  *
  * `Dataset.unpersist()` only uncaches CacheManager entries (`df.persist()`);
  * a checkpointed frame's blocks belong to the underlying RDD, which the
  * public API does not expose (`df.rdd` wraps it in a fresh deserializing
  * MapPartitionsRDD). The LogicalRDD leaf that holds the real handle is
  * private[sql], hence this shim package (same convention as ColumnBridge).
  *
  * Only call once the frame's consumers have run: checkpointed lineage is
  * truncated, so dropped blocks cannot be recomputed.
  */
object CheckpointBlocks {
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
