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

  // Stage roots created by this JVM, deleted on exit: without the hook every
  // application run leaks its parquet stages to the machine's tmp dir.
  private val roots = scala.collection.concurrent.TrieMap.empty[String, Unit]
  private lazy val hookInstalled: Unit =
    sys.addShutdownHook(roots.keys.foreach(deleteRecursively))

  private def deleteRecursively(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.isDirectory) f.listFiles().foreach(c => deleteRecursively(c.getPath))
    f.delete(): Unit
  }

  /** The app's tmp staging root, registered for shutdown-hook cleanup.
    * Callers staging non-parquet artifacts (ORC round-trips, export files)
    * place them under this root so they share the stages' lifecycle. */
  def appRoot(s: SparkSession): String = {
    hookInstalled
    val root = s"${sys.props("java.io.tmpdir")}/graft-${s.sparkContext.applicationId}"
    roots.put(root, ()): Unit
    root
  }

  /** `afterWrite` runs once, after the stage's parquet write completes —
    * the hook for releasing build-side caches the write consumed. */
  def apply(s: SparkSession, key: String, afterWrite: () => Unit = () => ())
           (build: => DataFrame): DataFrame = {
    val k = s.sparkContext.applicationId + ":" + key
    // TrieMap.getOrElseUpdate may race two builders onto the same path; the
    // coarse lock is fine — each stage builds exactly once per app, and a
    // concurrent duplicate build would corrupt the directory under a reader.
    val path = cache.synchronized {
      cache.getOrElseUpdate(k, {
        // md5 of the full key: a 32-bit hashCode collision would silently
        // alias two different stages onto one directory.
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val p = s"${appRoot(s)}/stage-$digest"
        build.write.mode("overwrite").parquet(p)
        afterWrite()
        p
      })
    }
    s.read.parquet(path)
  }
}
