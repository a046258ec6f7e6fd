package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Scale-evidence harness for the dedup/ANN candidate-generation paths.
  *
  * The 100 TB argument for d2/d3/d4/d7 is that candidate pairs come from
  * equi-joins on bounded-fanout keys (df-capped shingles, LSH bands,
  * SimHash blocks), so pair counts — the joins' output volume, hence the
  * work — grow ~linearly with corpus size, never n². This main MEASURES
  * that claim across corpus scales and prints one JSON line per corpus:
  * docs, candidate-pair counts per family, full-query wall-clock. The
  * driver-side df-cap prediction to compare against: a df-capped shingle
  * contributes ≤ cap·(cap−1)/2 pairs, and with token distributions held
  * fixed the number of capped shingles grows linearly in docs.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleEvidence <dir1> <dir2> …"
  * (each dir needs documents.parquet; results land in BASELINE.md's scale
  * section by hand).
  */
object ScaleEvidence {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/root/repo/tmp/scale/docs10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Family / end-to-end-query selection for big rungs (round 11): at the
    // sf100 docs rung (5M docs) the FIXED-width simhash block join is
    // measured quadratic-dominant — its candidate-pair shuffle alone
    // exceeds this box's local disk (BASELINE.md round-11), so the decade-3
    // pass must be able to measure the bounded families (df-capped
    // shingles, LSH bands, corpus-adaptive SimHashWide) without paying the
    // one family whose explosion is already established. Unset = all (the
    // decade-1/2 behavior, unchanged).
    val famSel = sys.env.get("SPARK_GRAFT_SCALE_FAMILIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Fail fast on unknown selections (ADVICE r11): a typo here used to
    // silently disable every measurement and emit sentinel values that
    // could be mistaken for a measured result.
    val knownFamilies = Set("shingle", "lsh", "simhash", "simwide")
    famSel.foreach { sel =>
      val bad = sel -- knownFamilies
      require(bad.isEmpty, s"SPARK_GRAFT_SCALE_FAMILIES: unknown families " +
        s"${bad.toSeq.sorted.mkString(", ")} (known: ${knownFamilies.toSeq.sorted.mkString(", ")})")
    }
    def famOn(name: String): Boolean = famSel.forall(_.contains(name))
    // Single source of truth for the measured end-to-end queries (ADVICE
    // r12: the validation Set and the measurement loop used to hold two
    // copies of this list; a query added to one but not the other either
    // failed a valid selection or was silently unmeasured).
    val measuredQueries = Seq("d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash",
      "d4b_simhash_adaptive", "d7_tfidf_similarity", "d13_simhash_resolution")
    val knownQueries = measuredQueries.toSet
    val querySel = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    querySel.foreach { sel =>
      val bad = sel -- knownQueries
      require(bad.isEmpty, s"SPARK_GRAFT_SCALE_QUERIES: unknown queries " +
        s"${bad.toSeq.sorted.mkString(", ")} (known: ${knownQueries.toSeq.sorted.mkString(", ")})")
    }
    val spark = graft.core.GraftSession.local(cpus)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val lines = dirs.map { dir =>
      val docs = graft.core.Tables.documents(spark, dir)
      val nDocs = docs.count()

      // candidate PAIR counts — the join fanout each family's scale claim
      // bounds (pre-threshold, post-dedup), measured on the real machinery.
      // Lazy (ADVICE r11): ShingleIndex.capped eagerly STAGES the full
      // capped index to parquet on call, so a run selecting only simhash/
      // simwide (which derive from shHashed, not sh) must not pay the
      // corpus tokenize + df-agg + write at the 5M-doc rung.
      lazy val sh = graft.ops.ShingleIndex.capped(spark, dir)
      val (shinglePairs, tShPairs) = if (!famOn("shingle")) (-1L, -1.0) else timed {
        sh.as("a").join(sh.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .dropDuplicates("id_a", "id_b").count()
      }
      val k = 16
      lazy val banded = {
        val hashed = sh.withColumn("h", hash64(col("sh")))
        val sigCols = (0 until k).map(i => min(seededFromBase(i, col("h"))).as(s"s$i"))
        hashed.groupBy("doc_id")
          .agg(sigCols.head, sigCols.tail: _*)
          .withColumn("sig", array((0 until k).map(i => col(s"s$i")): _*))
          .select(col("doc_id"), explode(lshBandKeys(col("sig"), 8, 2)).as("band"))
      }
      val (lshPairs, tLshPairs) = if (!famOn("lsh")) (-1L, -1.0) else timed {
        banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .dropDuplicates("id_a", "id_b").count()
      }
      val bits = 48
      val shHashed = graft.core.Tables.fanout(docs)
        .select(col("doc_id"),
          explode(graft.functions.ShingleExpr.shinglesNative(
            tokens(col("text")), 3)).as("shingle"))
        .withColumn("h", hash64(col("shingle")))
      val voteCols = (0 until bits).map(b =>
        sum((shiftright(col("h"), b) % 2) * 2 - 1).as(s"v$b"))
      val blocked = shHashed.groupBy("doc_id")
        .agg(voteCols.head, voteCols.tail: _*)
        .select(col("doc_id"),
          (0 until bits).map(b =>
            when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
            .reduce(_ + _).as("sig"))
        .select(col("doc_id"),
          explode(array((0 until 4).map(b =>
            concat_ws(":", lit(b.toString),
              (shiftright(col("sig"), b * 12) % 4096).cast("string"))): _*)).as("blk"))
      val (simhashPairs, tSimPairs) = if (!famOn("simhash")) (-1L, -1.0) else timed {
        blocked.as("a").join(blocked.as("b"),
            col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .dropDuplicates("id_a", "id_b").count()
      }

      // Corpus-adaptive multi-word SimHash (ops.SimHashWide) on the SAME
      // real shingles: candidate volume at width = ceil(log2 n)+margin,
      // vs the fixed 4x12 measurement above. Real corpora have correlated
      // signatures (true near-dups), so this is the honest companion to
      // SimHashWideSpec's random-signature sublinearity measurement.
      val widePlan = graft.ops.SimHashWide.planFor(nDocs, hamming = 3)
      val wideSigs = graft.ops.SimHashWide.signatures(
        shHashed.select("doc_id", "shingle"), widePlan.words)
      val wideBlocked = wideSigs.select(col("doc_id"),
        explode(array((0 until widePlan.blocks).map(b =>
          concat_ws(":", lit(b.toString),
            graft.ops.SimHashWide.blockKey(col("sh"), b, widePlan.width)
              .cast("string"))): _*)).as("blk"))
      val (simwidePairs, tWidePairs) = if (!famOn("simwide")) (-1L, -1.0) else timed {
        wideBlocked.as("a").join(wideBlocked.as("b"),
            col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .dropDuplicates("id_a", "id_b").count()
      }

      // full-query wall-clock on the same corpus (d2/d3/d4/d4b/d7 end-to-end)
      val queryTimes = measuredQueries
        .filter(q => querySel.forall(_.contains(q))).map { q =>
        val (_, t) = timed(SparkEntry.queries(q)(spark, dir).count())
        graft.core.GraftSession.releaseTransientBlocks(spark)
        q -> t
      }

      def sec(v: Double) =
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      // Skipped families serialize as JSON null, never a -1 sentinel a
      // downstream reader could mistake for a measurement (ADVICE r11); the
      // "skipped" array names them explicitly.
      def pairs(on: Boolean, v: Long) = if (on) v.toString else "null"
      def scan(on: Boolean, t: Double) = if (on) sec(t) else "null"
      val skipped = knownFamilies.toSeq.sorted.filterNot(famOn) ++
        knownQueries.toSeq.sorted.filterNot(q => querySel.forall(_.contains(q)))
      val qjson = queryTimes.map { case (q, t) => s""""$q":${sec(t)}""" }.mkString(",")
      val line =
        s"""{"dir":"$dir","docs":$nDocs,"shingle_pairs":${pairs(famOn("shingle"), shinglePairs)},""" +
          s""""lsh_pairs":${pairs(famOn("lsh"), lshPairs)},"simhash_pairs":${pairs(famOn("simhash"), simhashPairs)},""" +
          s""""simwide_pairs":${pairs(famOn("simwide"), simwidePairs)},"simwide_width":${widePlan.width},"simwide_words":${widePlan.words},""" +
          s""""pair_scan_sec":{"shingle":${scan(famOn("shingle"), tShPairs)},"lsh":${scan(famOn("lsh"), tLshPairs)},"simhash":${scan(famOn("simhash"), tSimPairs)},"simwide":${scan(famOn("simwide"), tWidePairs)}},""" +
          s""""skipped":${skipped.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
          s""""query_sec":{$qjson}}"""
      println(s"[scale] $line")
      graft.core.GraftSession.releaseTransientBlocks(spark)
      line
    }
    println("[scale] ALL " + lines.mkString("[", ",", "]"))
    spark.stop()
  }
}
