package graft

/** Dev-only in-process sampling profiler: runs one declared query while a
  * daemon thread samples every live thread's top-of-stack frames, then
  * prints a frame histogram. Exists because the sandbox JVM has no SIGQUIT
  * handler and jcmd attach is blocked, so the usual thread-dump playbook
  * (optimization guide §7.3) needs an in-process stand-in.
  *
  *   sbt "runMain graft.StackSample <queryName> [sfDir] [reps] [depth]"
  */
object StackSample {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val depth = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)

    val hist = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val traces = Thread.getAllStackTraces()
          traces.forEach { (t, frames) =>
            // Only executor task threads: the hot path we are hunting.
            if (t.getName.startsWith("Executor task launch") && frames.nonEmpty) {
              val sig = frames.take(depth).map(f =>
                s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}")
                .mkString(" <- ")
              val st = t.getState.toString.take(1)
              hist.merge(s"[$st] $sig", 1L, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(7)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val fn = SparkEntry.queries(name)
    // Warm rep (JIT/codegen), unsampled.
    fn(spark, sfDir).count()
    graft.core.GraftSession.releaseTransientBlocks(spark)
    System.gc()
    sampling = true
    val t0 = System.nanoTime()
    for (_ <- 1 to reps) {
      fn(spark, sfDir).count()
      graft.core.GraftSession.releaseTransientBlocks(spark)
    }
    sampling = false
    val wallMs = (System.nanoTime() - t0) / 1000000
    println(s"[stacksample] $name: $reps reps in ${wallMs} ms")
    import scala.jdk.CollectionConverters._
    val rows = hist.asScala.toSeq.sortBy(-_._2)
    val total = rows.map(_._2.toLong).sum.max(1L)
    println(s"[stacksample] ${total} task-thread samples; top frames:")
    rows.take(40).foreach { case (k, v) =>
      println(f"[stacksample] ${v.toLong * 100.0 / total}%5.1f%% $k")
    }
    spark.stop()
  }
}
