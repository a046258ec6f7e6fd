package graft

/** Physical-plan shape assertions (the 100 TB posture, SURVEY.md §4):
  * pushdown and pruning must reach the parquet scan, small sides must
  * broadcast, aggregates must have map-side partials, and the hot path must
  * stay inside whole-stage codegen. Plans are inspected at sf0.001 — shape,
  * not timing. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    // Execute first: under AQE the final plan (with whole-stage codegen
    // stages and runtime join choices) only exists after the run.
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("p1: column pruning reaches the scan (ReadSchema = 3 columns)") {
    val p = plan("p1_projection")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"), p)
  }

  test("p4: equality predicate pushed into the parquet scan") {
    val p = plan("p4_filter_eq")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"), p)
  }

  test("j2: dimension side broadcasts (BroadcastHashJoin, no shuffle of facts)") {
    val p = plan("j2_join_rename")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("j3: semi join stays a broadcast semi join") {
    val p = plan("j3_semi_join")
    assert(p.contains("LeftSemi"), p)
  }

  test("a1: hash aggregation runs partial then final (map-side combine)") {
    val p = plan("a1_group_count")
    assert(p.contains("partial_count"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("w1: hourly counts pipeline is whole-stage codegen'd") {
    // Codegen'd operators carry the `*(stageId)` marker in the plan string.
    val p = plan("w1_hourly_counts")
    assert(p.contains("*(1)"), p)
  }

  test("s1: global sort + limit plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("s1_scan_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("g7: POI-isochrone match is a grid equi-join, never a cartesian product") {
    val p = plan("g7_poi_accessibility")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v2: LSH candidates come from an equi-join on the band key") {
    val p = plan("v2_ann_lsh")
    // the band join keys on the exploded band string; any join flavor is
    // fine as long as it is keyed (hashed/sorted on band), not nested-loop
    assert(p.contains("band"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t2: no broadcast hint on the vocabulary-sized profile join") {
    // The per-(lang, token) profile is vocabulary-sized — GBs/executor at
    // web scale — so the scoring join must not carry a builder-forced
    // broadcast; only the 5-row per-language totals side may hint.
    val df = SparkEntry.queries("t2_lang_id_confusion")(spark, dir)
    val analyzed = df.queryExecution.analyzed.toString
    val hints = "UnresolvedHint|ResolvedHint".r.findAllIn(analyzed).length
    assert(hints <= 1, s"expected at most the langTotals hint, plan:\n$analyzed")
  }

  test("d6: benchmark shingle set broadcasts (corpus side never shuffles for the probe join)") {
    val p = plan("d6_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("d6: probe side keeps its pruned scan (fanout must not sit below the filter)") {
    val p = plan("d6_decontaminate")
    assert(p.contains("LessThan(doc_id,5)"), p)
  }

  test("t9: packing windows are partitioned, never a global-order window") {
    val p = plan("t9_sequence_pack")
    assert(p.contains("Window"), p)
    // A global-order window plans a single-partition exchange feeding the
    // Window operator — the shape that serializes the corpus at scale.
    assert(!p.contains("SinglePartition"), p)
  }

  test("m3b: Lloyd assignment joins broadcast the k-row center side") {
    val p = plan("m3b_kmeans_lloyd")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j6b: ingested raster broadcasts into the lookup join") {
    val p = plan("j6b_geotiff_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("m7b: lexicon side of the sentiment join broadcasts") {
    val p = plan("m7b_sentiment_5way")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("f9: geo scalar pipeline stays inside whole-stage codegen") {
    val p = plan("f9_manhattan_mercator")
    assert(p.contains("*(1)"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("Invoke"), p)
  }

  test("no unpartitioned window over data-proportional rows (a11/a12/w4/m2/m21/m10b)") {
    // The round-2 verdict's scale-killers: a global Window.orderBy drags the
    // whole frame through ONE task. These queries now use the distributed
    // prefix-sum / limit-then-rank / block-local-permutation forms; pin that
    // no WindowExec with an empty partitionSpec survives in their plans.
    // (w3/w6/w13 keep documented global windows over BOUNDED post-aggregation
    // rows and are deliberately not listed.)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def unpartitioned(p: SparkPlan): Seq[WindowExec] = {
      val here = p.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case a: AdaptiveSparkPlanExec => unpartitioned(a.executedPlan)
        case q: QueryStageExec => unpartitioned(q.plan)
      }.flatten
      here
    }
    for (name <- Seq("a11_pareto", "a12_cdf", "w4_rank", "m2_knn_elbow",
        "m21_bias_audit", "m10b_lisa_pvalues")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val bad = unpartitioned(df.queryExecution.executedPlan)
      assert(bad.isEmpty, s"$name has unpartitioned windows: $bad")
    }
  }

  test("j12: as-of join windows partition by user key, never globally") {
    val p = plan("j12_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  // v8's plan is not pinnable here: the query returns a Materialize.cut
  // frame, so the executed plan collapses to the checkpoint scan. Its
  // broadcast shapes are asserted structurally by construction
  // (broadcast(...) on every centers/adc join) and exercised by PqSpec.

  test("t10: chunk fan-out is a generate over the scan (no shuffle before the agg)") {
    val p = plan("t10_chunking")
    assert(p.contains("Generate"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("j13: binned range join is an equi-join, never a nested loop") {
    val p = plan("j13_range_bin_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the bin key gives the range predicate a hashable equi-join
    assert(p.contains("HashJoin"), p)
  }

  test("w16: forward-fill window partitions by the series key, never globally") {
    val p = plan("w16_resample_ffill")
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("s15: partition filter prunes the hive-layout scan at planning time") {
    val p = plan("s15_partition_prune")
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("l_returnflag"), p)
  }

  test("w19: cohort retention is pure hash aggregation — no window at all") {
    val p = plan("w19_cohort_retention")
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("g9: wedge/triangle joins stay equi-joins, never a cartesian product") {
    val p = plan("g9_triangles")
    // (the plan's two BroadcastNestedLoopJoins are the final cross of three
    // ONE-ROW aggregate scalars — the data-proportional wedge and closure
    // joins must be hashable equi-joins)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin"), p)
  }

  test("w17: funnel stages are conditional-min aggregates, no cross product") {
    val p = plan("w17_funnel_stages")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j14: distance-band pairs is a grid equi-join, never a cartesian product") {
    val p = plan("j14_distance_band_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin"), p)
    // the 3×3 neighbor fan-out is a native Generate, not a join
    assert(p.contains("Generate"), p)
  }

  test("a22: weighted median has no unpartitioned window (Cumulative path)") {
    val p = plan("a22_weighted_median")
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("u8: merge/upsert is one equi-join over the change set, no nested loop") {
    val p = plan("u8_merge_upsert")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("FullOuter"), p)
  }

  test("t12: zipf fit ranks only the top-k slice (TakeOrderedAndProject)") {
    val p = plan("t12_zipf_fit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("a23: gini rank runs on the Cumulative path, no unpartitioned window") {
    val p = plan("a23_gini")
    // the terminal 1-row agg may exchange to SinglePartition, but every
    // WINDOW (the rank scale-killer) must be the Cumulative __pid-partitioned
    // one — an unpartitioned rank window would list an empty partition spec
    val winLines = p.linesIterator.filter(_.contains("- Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("__pid")), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), p) // cents agg is map-side combined
  }

  test("m23: KS drift argmax is TakeOrderedAndProject over the bounded bins") {
    val p = plan("m23_ks_drift")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the histogram shuffle is map-side combined; the ECDF window runs on
    // the bounded post-agg frame, never an unpartitioned sort of raw events
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("u9: temperature mix selects via equi-join on source, no nested loop over docs") {
    val p = plan("u9_temperature_mix")
    assert(!p.contains("CartesianProduct"), p)
    // quota/offset frames ride broadcast into the doc-selection join
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("j15: bloom probe filters the fact scan BEFORE the semi join") {
    val p = plan("j15_bloom_semi_join")
    // the might_contain predicate must sit on the fact side (pre-exchange),
    // and the exact join that absorbs false positives stays broadcast-semi
    // (the registered bloom_might_contain prints with its prettyName)
    assert(p.contains("might_contain"), p)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("bloom_filter_agg"), p)
  }

  test("t13: duplicated-coverage df count is one map-side-combined shuffle, no pair join") {
    val p = plan("t13_dup_coverage")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t14: bigram scoring joins on the bigram shuffle key, never nested-loop") {
    val p = plan("t14_bigram_quality")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
  }

  test("u10: rendezvous assignment is a pure projection — no join, no window") {
    val p = plan("u10_rendezvous_shard")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count"), p) // only the bounded shard rollup shuffles
  }

  test("m24: benford digit agg is map-side combined; dim frames broadcast") {
    val p = plan("m24_benford")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("g12: link prediction candidates come from the two-hop equi-join, top-k bounded") {
    val p = plan("g12_link_prediction")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("w24: backtest runs on bounded post-agg frames, no window at all") {
    val p = plan("w24_seasonal_backtest")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count"), p)
  }

  test("m25: basket pairs self-join on the order key; dims broadcast; top-k bounded") {
    val p = plan("m25_basket_lift")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("a24: corr matrix is ONE aggregation pass (single scan, 15 partial sums)") {
    val p = plan("a24_corr_matrix")
    // the 6 pair rows fan out from the lineage-cut 1-row moment frame; the
    // fact table must appear in exactly one scan (inside the cut), so the
    // FINAL plan has no parquet scan at all — only the checkpoint fan-out
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("FileScan"), p)
  }

  test("m26: chi-square contingency riders broadcast back onto the cells") {
    val p = plan("m26_chi2_independence")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("f11: geohash encode is pure projection + one bounded rollup") {
    val p = plan("f11_geohash")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count"), p)
  }

  test("w25: attribution rank windows are purchase-partitioned, never global") {
    val p = plan("w25_attribution")
    val winLines = p.linesIterator.filter(_.contains("- Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("pid")), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d11: calibration pairs ride the staged index equi-join") {
    val p = plan("d11_minhash_calibration")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
  }

  test("mm4: audio features aggregate map-side after the partition-batched decode") {
    val p = plan("mm4_audio_features")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Window"), p)
  }

  test("m27: Mann-Whitney ranks run on the Cumulative path, no unpartitioned window") {
    val p = plan("m27_mann_whitney")
    val winLines = p.linesIterator.filter(_.contains("- Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("__pid")), p)
    assert(p.contains("partial_sum"), p)
  }

  test("u12: negative sampling fans out only the literal brand dim; rank per customer") {
    val p = plan("u12_negative_sampling")
    assert(!p.contains("CartesianProduct"), p)
    val winLines = p.linesIterator.filter(_.contains("- Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("cust")), p)
  }

  test("m28: Kaplan-Meier windows run over the bounded day table only") {
    val p = plan("m28_kaplan_meier")
    assert(!p.contains("CartesianProduct"), p)
    // every window is the constant-key bounded-series one (coalesce(pmod..))
    val winLines = p.linesIterator.filter(_.contains("- Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("_w0")), p)
  }

  test("o6: skyline runs on the range-partitioned prefix-max, no pair join") {
    val p = plan("o6_skyline")
    val winLines = p.linesIterator.filter(_.contains("- Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("__pid")), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("w27: gap-detection windows run per type over the grid-bounded frame") {
    val p = plan("w27_gap_detection")
    val winLines = p.linesIterator.filter(_.contains("- Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("t#")), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t16: BM25 top-10 is a TakeOrdered, query-term filter lands before the tf agg") {
    val p = plan("t16_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // The |terms|-bounded side filters on the scan/explode, not post-agg.
    assert(p.contains("tok#"), p)
  }

  test("m29: AUC ranks ride the Cumulative range-partitioned path") {
    val p = plan("m29_auc")
    val winLines = p.linesIterator.filter(_.contains("- Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("__pid")), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("w28: EWMA plan has no window operator and no cartesian product") {
    // The sequential recurrence folds inside one bounded-series HOF call;
    // the data-proportional work is the hourly hash aggregate below it.
    val p = plan("w28_ewma")
    assert(!p.contains("- Window ["), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t15: MMR rounds are lineage-cut; final plan is the bounded checkpoint scan") {
    // The TakeOrdered pool/pick stages run inside per-round Materialize.cut
    // boundaries (each pick re-enters the next round twice — uncut, the plan
    // doubles per round), so the final plan must be a checkpoint-backed scan
    // with no cartesian scoring anywhere.
    val p = plan("t15_mmr_select")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
