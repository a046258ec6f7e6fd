package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale-evidence main that retires the round-8 w15_stream_join caveat with
  * a MEASUREMENT (VERDICT r8, next-round item 1).
  *
  * The single-file bounded replay (the correctness harness) feeds the whole
  * corpus to the stream-stream join in ONE micro-batch, so the watermark
  * never advances mid-run and click state is never evicted: every purchase
  * scans its user's ENTIRE click history, Σᵤ purchases_u × clicks_u work.
  * The whale corpora are span-extended at fixed density with a FIXED user
  * population (tools/make_sf1.py: sf0.1 → sf1 → sf10 spans 30 d → 300 d →
  * 3000 d over the same 1 500 users), so that sum grows ~100× per data
  * decade (measured: 266 k → 26.6 M → 2.66 G) — which is exactly the
  * super-linear warm ratio WHALESCALE_r08 recorded (31.4×/decade).
  *
  * A production stream is not a single batch: data arrives in event-time
  * order and the watermark advances continuously, so click state holds only
  * the join window + watermark delay (~1.5 h of per-user clicks — a
  * CONSTANT at fixed density, independent of how long the stream has run).
  * This main demonstrates that regime over the SAME whale corpora, the
  * StreamScaleEvidence corpus discipline applied to w15:
  *
  *   1. stage the corpus's events into time-ordered parquet files of a
  *      fixed event-time span each (chunkDays; files get ascending mtimes —
  *      the file-stream source's batch order), so the per-micro-batch event
  *      count is a scale-invariant constant and the file count carries all
  *      the growth;
  *   2. replay EventsAnomaly.purchaseClickJoin with maxFilesPerTrigger=1 so
  *      the watermark advances between micro-batches and join state is
  *      evicted as it expires;
  *   3. read state bounds from StreamingQueryProgress (max/final state
  *      rows, rows removed) and emit one JSON line per scale.
  *
  * Expected signature if the round-8 adjudication is right: max_state_rows
  * ≈ flat per decade (state counts the horizon, not the corpus), removed
  * rows > 0 (eviction really runs), emitted pairs exactly linear, and
  * wall-clock ≈ batches × a constant — i.e. LINEAR in data, against the
  * single-batch replay's measured ~100×/decade joint-scan growth.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.W15ReplayEvidence [dirs...]"
  * (defaults to the three-decade ladder sf0.1 / tmp/scale/sf1 /
  * tmp/scale/sf10). Results append to tmp/scale/w15_replay.jsonl, which
  * tools/whale_report.py folds into WHALESCALE_r{N}.json.
  */
object W15ReplayEvidence {

  /** Stage `eventsPath` into one parquet file per `chunkDays` of event time
    * under `outDir`, files named/mtimed in ascending event-time order.
    * Single shuffle pass: chunk ids are hash-routed to one task each
    * (numPartitions = nChunks), so partitionBy emits exactly one file per
    * chunk dir; the files are then flattened into outDir root. */
  def stageChunks(s: SparkSession, eventsPath: String, outDir: String,
      chunkDays: Int): Int = {
    val ev = graft.core.Tables.normalizeEvents(s.read.parquet(eventsPath))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    // One aggregate pass for both span ends; an EMPTY events table yields
    // null aggregates (the old per-agg head().getLong/getInt NPE'd,
    // ADVICE r9) — stage nothing and report zero chunks.
    val span = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    if (span.isNullAt(0)) {
      // Re-staging over a previously-staged dir with a NOW-EMPTY events
      // table must leave an empty staging dir, not the old ev-*.parquet
      // files a subsequent replay would consume (ADVICE r10) — same
      // delete-then-recreate as the non-empty path.
      val root = new java.io.File(outDir)
      if (root.exists()) rm(root)
      root.mkdirs()
      return 0
    }
    val t0 = span.getLong(0)
    val chunkUs = chunkDays.toLong * 86400L * 1000000L
    val withChunk = ev.withColumn("chunk",
      ((unix_micros(col("ts")) - lit(t0)) / lit(chunkUs)).cast("int"))
    val nChunks = ((span.getLong(1) - t0) / chunkUs).toInt + 1
    val root = new java.io.File(outDir)
    if (root.exists()) rm(root)
    root.mkdirs()
    val stage = new java.io.File(root, "_stage")
    withChunk.repartition(nChunks, col("chunk"))
      .write.partitionBy("chunk").parquet(stage.getPath)
    for (i <- 0 until nChunks) {
      val d = new java.io.File(stage, s"chunk=$i")
      val parts = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
      // Empty chunks (a quiet stretch) simply have no file — the stream
      // skips to the next chunk and the watermark jumps accordingly.
      parts.zipWithIndex.foreach { case (p, j) =>
        val dest = new java.io.File(root, f"ev-$i%05d-$j.parquet")
        java.nio.file.Files.move(p.toPath, dest.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        val _ = dest.setLastModified(1700000000000L + i.toLong * 2000L + j)
      }
    }
    rm(stage)
    nChunks
  }

  final case class Result(events: Long, files: Int, batches: Int, pairs: Long,
      maxStateRows: Long, finalStateRows: Long, removedRows: Long,
      batchMsMed: Long, batchMsP90: Long, batchMsMax: Long,
      batchMsFirstQuintileMed: Long, batchMsLastQuintileMed: Long,
      triggerSumSec: Double, sec: Double)

  /** Replay the w15 join over the staged dir, one file per micro-batch per
    * side, to a parquet file sink (pairs are data-proportional — the memory
    * sink is exactly the driver funnel the round-8 rebuild removed). */
  def replay(s: SparkSession, stagedDir: String): Result = {
    val schema = s.read.parquet(stagedDir).schema
    def src() = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stagedDir)
    val joined = graft.streaming.EventsAnomaly.purchaseClickJoin(
      graft.core.Tables.normalizeEvents(src()),
      graft.core.Tables.normalizeEvents(src()), 1800L)
    val out = graft.ops.Staged.appRoot(s) + "/w15-replay-" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val shm = new java.io.File("/dev/shm")
    val ckptBase = if (shm.isDirectory && shm.canWrite) shm
      else new java.io.File(sys.props("java.io.tmpdir"))
    val ckpt = new java.io.File(ckptBase,
      "graft-w15-" + java.util.UUID.randomUUID().toString).getPath
    val t0 = System.nanoTime()
    val q = joined.writeStream
      .format("parquet").option("path", out)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val progs = q.recentProgress.toSeq
    val states = progs.map(_.stateOperators.map(_.numRowsTotal).sum)
    // Per-batch durations IN BATCH ORDER (for the first-vs-last-quintile
    // medians that distinguish a monotonically GROWING per-batch term — a
    // real scale bug — from periodic maintenance spikes that only drag the
    // mean); `durs` is the same list sorted for the quantiles.
    val dursSeq = progs.flatMap(p => Option(p.durationMs.get("triggerExecution")))
      .map(_.toLong)
    val durs = dursSeq.sorted
    def medOf(xs: Seq[Long]): Long = {
      val s = xs.sorted
      if (s.isEmpty) 0L else s(s.size / 2)
    }
    val quintile = math.max(1, dursSeq.size / 5)
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(ckpt))
    Result(
      events = progs.map(_.numInputRows).sum / 2, // two sources read the corpus twice
      files = new java.io.File(stagedDir).listFiles()
        .count(_.getName.endsWith(".parquet")),
      batches = progs.count(_.numInputRows > 0),
      // Zero-emission guard (ADVICE r9, the readSinkOrEmpty pattern): a
      // run whose rows are all held back by the final watermark commits
      // no data files, and spark.read.parquet on a data-less sink dir
      // throws a schema-inference error instead of returning 0.
      pairs = {
        val fs = new java.io.File(out).listFiles()
        val hasData = fs != null && fs.exists(f =>
          f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        if (hasData) s.read.parquet(out).count() else 0L
      },
      maxStateRows = if (states.isEmpty) 0L else states.max,
      finalStateRows = states.lastOption.getOrElse(0L),
      removedRows = progs.map(_.stateOperators.map(_.numRowsRemoved).sum).sum,
      batchMsMed = if (durs.isEmpty) 0L else durs(durs.size / 2),
      batchMsP90 = if (durs.isEmpty) 0L else durs((durs.size * 9) / 10 min (durs.size - 1)),
      batchMsMax = if (durs.isEmpty) 0L else durs.last,
      batchMsFirstQuintileMed = medOf(dursSeq.take(quintile)),
      batchMsLastQuintileMed = medOf(dursSeq.takeRight(quintile)),
      triggerSumSec = dursSeq.sum / 1e3,
      sec = sec)
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "tmp/scale/sf1", "tmp/scale/sf10")
    val chunkDays = sys.env.getOrElse("SPARK_GRAFT_W15_CHUNK_DAYS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    // sf10 replays ~600 micro-batches; keep the whole progress history.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "4000")
    // State partitions sized to the per-batch volume (~17k rows/chunk at
    // the whale density), the way a production job sizes them to
    // throughput: each micro-batch pays a fixed per-state-partition
    // init+commit constant (the w10 StreamProbe bisection), so 32
    // partitions for a 17k-row batch is pure constant, ~4x the replay's
    // wall-clock. The constant is scale-INVARIANT either way — this only
    // moves the ladder's absolute times, not its per-decade shape.
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_W15_PARTS", "8"))
    // Maintenance-interval arm for the last-quintile drift A/B (round 11;
    // r9 filed the 1,405 -> 2,543 ms batch-median drift across 601
    // back-to-back AvailableNow batches as state-store maintenance
    // starvation — the background snapshot/cleanup task defaults to a 60 s
    // cadence that a busy driver never reaches, so HDFSBackedStateStore
    // reconstructs each version from an ever-longer delta-file chain). A
    // shorter interval paces maintenance INTO the replay; if the drift
    // flattens, the mechanism is confirmed (engine unchanged — a real
    // deployment's batches arrive with think-time between them).
    sys.env.get("SPARK_GRAFT_W15_MAINT").foreach { v =>
      spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", v)
      System.err.println(s"[w15replay] stateStore.maintenanceInterval=$v")
    }
    val cpuRef = graft.ops.CpuWitness.singleThread()
    val stageRef = graft.ops.CpuWitness.stageLatency(spark.sparkContext)
    // Output override for config experiments (round-11 maintenance-interval
    // A/B): the ladder file folds min-wall per (scale, chunk_days), so a
    // run under a non-default state-store config must not append to it —
    // it would pollute the decade ladder with a config the canonical
    // replays don't use.
    val outPath = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_W15_OUT", "tmp/scale/w15_replay.jsonl"))
    Option(outPath.getParentFile).foreach(_.mkdirs())

    for (dir <- dirs) {
      val label = new java.io.File(dir).getName
      val staged = s"tmp/scale/w15_chunks/$label"
      System.err.println(s"[w15replay] staging $dir into $chunkDays-day chunks")
      val nChunks = stageChunks(spark, s"$dir/events.parquet", staged, chunkDays)
      System.err.println(s"[w15replay] $label: $nChunks chunks, replaying")
      val r = replay(spark, staged)
      val line = String.format(java.util.Locale.ROOT,
        """{"scale":"%s","chunk_days":%d,"events":%d,"files":%d,"batches":%d,"pairs":%d,"max_state_rows":%d,"final_state_rows":%d,"removed_rows":%d,"batch_ms_med":%d,"batch_ms_p90":%d,"batch_ms_max":%d,"batch_ms_first_quintile_med":%d,"batch_ms_last_quintile_med":%d,"trigger_sum_sec":%.2f,"sec":%.2f,"cpu_ref_sec":%.3f,"stage_ref_sec":%.3f}""",
        label, Int.box(chunkDays), Long.box(r.events), Int.box(r.files),
        Int.box(r.batches), Long.box(r.pairs), Long.box(r.maxStateRows),
        Long.box(r.finalStateRows), Long.box(r.removedRows),
        Long.box(r.batchMsMed), Long.box(r.batchMsP90), Long.box(r.batchMsMax),
        Long.box(r.batchMsFirstQuintileMed), Long.box(r.batchMsLastQuintileMed),
        Double.box(r.triggerSumSec), Double.box(r.sec), Double.box(cpuRef),
        Double.box(stageRef))
      println(line)
      val w = new java.io.FileWriter(outPath, true)
      try w.write(line + "\n") finally w.close()
      System.out.flush()
      // Between scales: reclaim the finished replay's accumulated state
      // (broadcast pieces, shuffle registrations) so the next scale starts
      // from a clean heap — on an 80g heap the JVM may never GC on its own
      // and the accumulation degrades later scales (measured round 9).
      System.gc(); Thread.sleep(1000); System.gc()
    }
    spark.stop()
  }
}
