package graft

/** Fresh-JVM re-probe of named queries — the mechanical second half of the
  * floor protocol.
  *
  * A full-suite Bench run carries ~190 queries' checkpointed state, block
  * churn and GC history; BASELINE.md documents a contention class that is
  * LOCKED to suite position (round 3: d3/d4/d5; round 6: v7 read 31.5 s in
  * all three suite reps vs 2.5 s isolated, same commit). A floor flag from
  * the suite therefore has two readings — "this query regressed" and "this
  * query's suite position is hostile" — and only a fresh-JVM probe taken in
  * the SAME host window can split them: still slow in isolation ⇒ real (or
  * the window itself); fast ⇒ suite-position effect, not a code regression.
  *
  * Bench spawns this main (same classpath, same JVM flags) for the queries
  * whose cpu-adjusted floor flags survived, parses the one-line JSON it
  * prints, and embeds it as `isolated_recheck` in the bench record.
  *
  * Protocol per query: one UNTIMED warm run at the smallest scale factor
  * (JIT + whole-stage-codegen is per-query-shape and dwarfs sf0.001 data
  * cost — same rationale as Bench's warm pass; without it, iterative
  * many-stage queries read their compile time as "persisting" inflation:
  * first outing measured g2_sssp at 4.9 s isolated vs 2.0 s in-suite),
  * then two timed runs at the target dir, min reported. Blocks are swept
  * between queries exactly as the suite sweeps them.
  *
  * Args: sfDir cpus name1,name2,...
  * Output: single stdout line `ISOLATED {"name":sec,...}`.
  */
object IsolatedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1).toInt
    val names = args(2).split(',').toSeq.filter(SparkEntry.queries.contains)
    // Run-spanning memory-bandwidth samples (VERDICT r9 item 2): one raw
    // all-core sample before the warm loop, one after each query's timed
    // reps, one at the end — a "persists-isolated" verdict on a
    // bandwidth-sensitive query is only readable against the contention
    // the probe experienced ACROSS its run (round-9's five-flag class:
    // start-time point probes read quiet while same-hour probes read 2x).
    val memDuring = scala.collection.mutable.ArrayBuffer.empty[Double]
    val spark = graft.core.GraftSession.local(cpus)
    memDuring += graft.ops.CpuWitness.quickMemSpinMt(cpus)
    val warmDir = {
      val small = new java.io.File(sfDir).getParentFile match {
        case null => sfDir
        case p => s"${p.getPath}/sf0.001"
      }
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    names.foreach { name =>
      try { SparkEntry.queries(name)(spark, warmDir).count(); () }
      catch { case _: Throwable => () }
      graft.core.GraftSession.releaseTransientBlocks(spark)
    }
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // The probe JVM's own scheduler-latency reading (see
    // ops.CpuWitness.stageLatency): a "persists-isolated" verdict on a
    // stage-latency-bound query (graph family, m1) is only meaningful
    // against the latency THIS JVM experienced — taken after the warm
    // loop so scheduler-path JIT doesn't read as host latency.
    val stageRef = graft.ops.CpuWitness.stageLatency(spark.sparkContext)
    println("ISOLATED-STAGEREF " + sec(stageRef))
    // The probe's own frequency witness: Bench's run-start cpu_ref is a
    // point sample from BEFORE the suite; the probe may execute in a
    // different host window, so its verdicts must be read against the
    // factor measured HERE (ADVICE r7: probe-time host factor).
    val cpuRef = graft.ops.CpuWitness.singleThread()
    println("ISOLATED-CPUREF " + sec(cpuRef))
    val out = names.map { name =>
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[isolated] $name FAILED: ${e.getMessage}"); false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.GraftSession.releaseTransientBlocks(spark)
        if (ok) dt else -1.0
      }
      val best = if (samples.exists(_ >= 0.0)) samples.filter(_ >= 0.0).min else -1.0
      memDuring += graft.ops.CpuWitness.quickMemSpinMt(cpus)
      s""""$name":${sec(best)}"""
    }
    val md = memDuring.sorted
    println("ISOLATED-MEM-DURING " +
      s"""{"min":${sec(md.head)},"med":${sec(md(md.size / 2))},"max":${sec(md.last)},"n":${md.size}}""")
    println("ISOLATED " + out.mkString("{", ",", "}"))
    spark.stop()
  }
}
