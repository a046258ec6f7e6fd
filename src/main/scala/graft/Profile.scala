package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev-only per-stage profiler: run one query a few times and print where
  * the wall-clock goes (stage name, task time, GC, spill). Usage:
  *
  *   sbt "runMain graft.Profile <queryName> <sfDir> [reps]"
  *
  * Complements Bench (whole-suite totals) when a single query needs a
  * breakdown: executor-side task time vs driver-side planning/codegen gap,
  * and which stage dominates.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)

    final case class StageRow(name: String, tasks: Int, taskMs: Long, gcMs: Long,
      spillBytes: Long, shuffleReadBytes: Long, shuffleWriteBytes: Long)
    val stages = mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += StageRow(si.name.takeWhile(_ != '\n').take(80), si.numTasks,
          m.executorRunTime, m.jvmGCTime, m.memoryBytesSpilled + m.diskBytesSpilled,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1000000
      graft.core.GraftSession.releaseTransientBlocks(spark)
      // Listener events are posted asynchronously; drain before reading.
      Thread.sleep(300)
      val taskMs = stages.map(_.taskMs).sum
      println(f"[profile] rep $r: wall ${wallMs}ms, task-time ${taskMs}ms " +
        f"(parallel-adjusted ~${taskMs / cpus}ms), stages ${stages.size}")
      stages.sortBy(-_.taskMs).take(12).foreach { s =>
        println(f"[profile]   ${s.taskMs}%7dms gc=${s.gcMs}%5d spill=${s.spillBytes}%9d " +
          f"sr=${s.shuffleReadBytes}%9d sw=${s.shuffleWriteBytes}%9d t=${s.tasks}%3d ${s.name}")
      }
    }
    spark.stop()
  }
}
