package graft

/** Dev-only bisect probe for the streaming-replay harness cost (round-8
  * w10_stream_hourly investigation).
  *
  * graft.Profile showed w10 is NOT stage-latency-bound: 5 stages, but the
  * 32-task stateful-aggregation stage carries ~25 s of task time (~780 ms
  * PER TASK) against 18 KB of shuffle input — a per-partition constant in
  * the state-store path, not scheduler round-trips and not data. This main
  * splits that constant along the two axes it could live on:
  *
  *   - partition count: rerun the identical replay with
  *     spark.sql.shuffle.partitions ∈ {32, 8, 2} (a streaming query freezes
  *     its state-partition count at first start, but every replay uses a
  *     fresh checkpoint, so the session conf takes effect each time). A
  *     per-partition constant scales the stage's task time linearly with
  *     the partition count; a per-row or per-batch cost doesn't move.
  *   - stateful vs stateless: the same replay with the aggregation replaced
  *     by a select (no state store at all) isolates the state-store share
  *     from file-source + query-lifecycle overhead.
  *
  * Usage: sbt "runMain graft.StreamProbe [sfDir]"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.local(32)
    import graft.streaming.EventsAnomaly
    import graft.core.Tables

    def agg(src: org.apache.spark.sql.DataFrame) =
      EventsAnomaly.hourlyCounts(Tables.normalizeEvents(src))
    def stateless(src: org.apache.spark.sql.DataFrame) =
      Tables.normalizeEvents(src).select("event_id", "ts")

    // Warm the plan shapes once at the smallest SF.
    val warm = {
      val small = new java.io.File(dir).getParentFile match {
        case null => dir
        case p => s"${p.getPath}/sf0.001"
      }
      if (new java.io.File(small).isDirectory) small else dir
    }
    EventsAnomaly.replayBounded(spark, s"$warm/events.parquet", agg).count()

    // Witness context for cross-session correlation records (BASELINE.md
    // w10 anatomy): which host window were these readings taken in?
    println(f"[streamprobe] stage_ref=${graft.ops.CpuWitness.stageLatency(spark.sparkContext)}%.3f " +
      f"cpu_ref=${graft.ops.CpuWitness.singleThread()}%.3f")

    def time(label: String, f: () => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        // GC before each timing: per-execution state (broadcast pieces,
        // shuffle registrations) accumulates un-collected on an oversized
        // heap and degrades later arms/reps (round-9 finding, BASELINE.md).
        System.gc()
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[streamprobe] $label times=${ts.map(t => f"$t%.3f").mkString(",")} min=${ts.min}%.3f")
    }

    for (parts <- Seq(32, 8, 2)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      time(s"stateful parts=$parts",
        () => EventsAnomaly.replayBounded(spark, s"$dir/events.parquet", agg).count())
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    // Checkpoint-IO arm, INVERTED since round 8: replayBounded now defaults
    // to a /dev/shm ephemeral checkpoint (the structural w10 fix), so the
    // arms above already measure the shm path. To isolate checkpoint IO the
    // probe passes an explicit DISK checkpoint through replayBounded's
    // override — the disk-vs-default delta is the fsync/IO share the round-8
    // fix removed (a session-conf toggle would be silently overridden by
    // the per-query ephemeral location and measure nothing).
    // Caller-owned checkpoint (ADVICE r9: runBounded no longer deletes a
    // supplied dir): cleared INSIDE the thunk, before EVERY rep — time()
    // runs the thunk several times, and a stale checkpoint makes every
    // rep after the first resume past the data and measure an empty
    // replay (caught live: reps read 1.40/0.25/0.17 s with the clear
    // outside the thunk). The old runBounded deleted inside the timed
    // window too, so rep timings stay comparable; final clear so the
    // probe leaves nothing in tmp.
    val diskCkpt = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_probe_ckpt_disk")
    def rmTree(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rmTree)
      f.delete(); ()
    }
    time("stateful parts=32 disk-ckpt",
      () => {
        rmTree(diskCkpt)
        EventsAnomaly.replayBounded(spark, s"$dir/events.parquet", agg,
          checkpointDir = Some(diskCkpt.getPath)).count()
      })
    rmTree(diskCkpt)
    // Stateless replay: append mode (no aggregate => complete mode invalid).
    time("stateless parts=32",
      () => EventsAnomaly.replayBoundedAppend(spark, s"$dir/events.parquet", stateless).count())
    // Batch reference: the same aggregation without the streaming machinery.
    time("batch parts=32",
      () => agg(spark.read.parquet(s"$dir/events.parquet")).count())
    spark.stop()
  }
}
