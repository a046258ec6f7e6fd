package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-staged shared intermediates.
  *
  * An expensive deterministic frame consumed by several queries (the capped
  * shingle index, a kNN neighbor list) is materialized to parquet ONCE per
  * (application, key) and re-read by every consumer. Compared to keeping a
  * persisted/localCheckpoint'ed frame alive across a suite, the parquet
  * stage holds no executor memory, survives block sweeps/evictions and
  * executor loss, and is exactly how a 100 TB pipeline passes a shared
  * intermediate between jobs. Re-reading costs one columnar scan — cheap
  * against the aggregation/join work these frames feed.
  */
object Staged {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = s.sparkContext.applicationId + ":" + key
    val path = cache.getOrElseUpdate(k, {
      val p = s"${sys.props("java.io.tmpdir")}/graft-${s.sparkContext.applicationId}" +
        s"/stage-${Integer.toHexString(key.hashCode)}"
      build.write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }
}
