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

    final case class StageRow(name: String, submittedMs: Long, tasks: Int,
      taskMs: Long, gcMs: Long, spillBytes: Long, shuffleReadBytes: Long,
      shuffleWriteBytes: Long)
    // Appended from the async listener thread while the rep loop reads —
    // synchronized, and each row carries the stage SUBMISSION time so a rep
    // only counts its own stages: under a heavy suite the listener bus runs
    // seconds behind, and the round-8 harness (clear + 300 ms sleep)
    // attributed one rep's late-arriving stage events to the NEXT rep,
    // printing task-time sums that disagreed with their own stage tables.
    val stages = mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += StageRow(si.name.takeWhile(_ != '\n').take(80),
            si.submissionTime.getOrElse(0L), si.numTasks,
            m.executorRunTime, m.jvmGCTime, m.memoryBytesSpilled + m.diskBytesSpilled,
            m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      val repStart = System.currentTimeMillis()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1000000
      graft.core.GraftSession.releaseTransientBlocks(spark)
      // Forced GC between reps (default ON; PROFILE_GC_BETWEEN=0 opts out
      // to study the accumulation itself): on an 80g heap the JVM may never
      // collect on its own, so per-execution state (broadcast pieces,
      // shuffle registrations, SQL-metric accumulators) piles up and the
      // ContextCleaner — which triggers off weak refs, i.e. off GC — never
      // runs. Measured at sf10 (a16_group_deciles, 80g): reps without this
      // read 44→75→116 s; with it 33.8→30.9→29.5 s.
      if (!sys.env.get("PROFILE_GC_BETWEEN").contains("0")) {
        System.gc(); Thread.sleep(1000); System.gc()
      }
      // Listener events are posted asynchronously; drain before reading.
      // The submission-time filter below makes a straggler at worst a
      // missing row, never a misattributed one.
      Thread.sleep(2000)
      val mine = stages.synchronized {
        stages.filter(_.submittedMs >= repStart).toVector
      }
      val taskMs = mine.map(_.taskMs).sum
      println(f"[profile] rep $r: wall ${wallMs}ms, task-time ${taskMs}ms " +
        f"(parallel-adjusted ~${taskMs / cpus}ms), stages ${mine.size}")
      mine.sortBy(-_.taskMs).take(12).foreach { s =>
        println(f"[profile]   ${s.taskMs}%7dms gc=${s.gcMs}%5d spill=${s.spillBytes}%9d " +
          f"sr=${s.shuffleReadBytes}%9d sw=${s.shuffleWriteBytes}%9d t=${s.tasks}%3d ${s.name}")
      }
    }
    spark.stop()
  }
}
