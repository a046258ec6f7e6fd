package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregations (SURVEY.md §2.4): grouped counts, pivot heatmaps, named
  * multi-aggs, descriptive stats, histograms, Pareto/CDF/coverage profiles.
  *
  * All of these are single-shuffle hash aggregations with map-side partials;
  * group-key cardinality is small relative to data, so they scale linearly.
  * Double-valued outputs are rounded so DuckDB's different partial-sum order
  * cannot flip a hash compare.
  */
object AggQueries extends QueryCatalog {

  private val hourNs = 3600000000000L

  def defs: Map[String, QueryDef] = Map(

    // A1 — group count (reference groupby().size(), test.py:223-324).
    "a1_group_count" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // A2 — multi-key group + pivot to a 7×24 heatmap matrix (reference
    // unstack(fill_value=0), test.py:378). Spark's pivot enumerates the 24
    // hour columns up front so a single aggregate pass produces the matrix.
    "a2_pivot_heatmap" -> QueryDef(
      (s, dir) => {
        val renames = (0 to 23).map(h => col(h.toString).as(s"h$h"))
        Tables.events(s, dir)
          .withColumn("dow", expr("((ts_ns div 86400000000000) + 4) % 7"))
          .withColumn("hod", expr(s"(ts_ns div $hourNs) % 24"))
          .groupBy("dow").pivot("hod", 0 to 23).count()
          .na.fill(0)
          .select(col("dow") +: renames: _*)
          .orderBy("dow")
      },
      Some {
        val cols = (0 to 23).map(h =>
          s"count(*) FILTER (WHERE (epoch_ns(ts) // $hourNs) % 24 = $h) AS h$h").mkString(",\n  ")
        s"""SELECT ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow,
           |  $cols
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // A3 — group mean (reference per-region mean speed, 实习二/…ipynb:641-661).
    "a3_group_mean" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(avg(l_extendedprice), 4) AS avg_price,
             |round(avg(l_discount), 6) AS avg_disc
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A4 — named multi-agg (reference agg(start_time=min, end_time=max,
    // max_count=max, avg_count=mean), test.py:672-677).
    "a4_named_multi_agg" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_linestatus")
        .agg(
          date_format(min("l_shipdate"), "yyyy-MM-dd").as("first_ship"),
          date_format(max("l_shipdate"), "yyyy-MM-dd").as("last_ship"),
          max("l_quantity").as("max_qty"),
          round(avg("l_quantity"), 4).as("avg_qty"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
             |  strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship,
             |  max(l_quantity) AS max_qty, round(avg(l_quantity), 4) AS avg_qty
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A5 — mixed agg incl. share-of-predicate lambda (reference positive-rate
    // (x=='positive').sum()/len(x), 实习四/…ipynb:891-904) as avg(when).
    "a5_mixed_agg" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          round(avg("value"), 4).as("avg_value"),
          round(stddev_samp(col("value")), 4).as("std_value"),
          count(lit(1)).as("n"),
          round(avg(when(col("value") > 100, 1.0).otherwise(0.0)), 6).as("high_rate"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type"),
      Some("""SELECT event_type, round(avg(value), 4) AS avg_value,
             |  round(stddev_samp(value), 4) AS std_value, count(*) AS n,
             |  round(avg(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END), 6) AS high_rate,
             |  round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      headline = true),

    // A6 — value_counts: count desc (reference test.py:708-730).
    "a6_value_counts" -> QueryDef(
      (s, dir) => Tables.part(s, dir)
        .groupBy("p_type").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("p_type")),
      Some("""SELECT p_type, count(*) AS n FROM part
             |GROUP BY 1 ORDER BY n DESC, p_type""".stripMargin)),

    // A7 — global scalar stats battery (reference mean/std/median/quantiles/
    // skew/kurtosis, 实习二/…ipynb:271-272, …network_analysis.ipynb:1199-1207).
    // Skew/kurtosis via explicit moment arithmetic so both engines evaluate
    // the identical formula (library definitions differ: sample vs population).
    "a7_scalar_stats" -> QueryDef(
      (s, dir) => {
        val x = col("l_extendedprice")
        Tables.lineitem(s, dir)
          .agg(
            avg(x).as("m1"), avg(x * x).as("r2"),
            avg(x * x * x).as("r3"), avg(x * x * x * x).as("r4"),
            round(stddev_samp(x), 4).as("std_price"),
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
            round(expr("percentile(l_extendedprice, 0.25)"), 4).as("q1_price"),
            round(expr("percentile(l_extendedprice, 0.75)"), 4).as("q3_price"),
            min(x).as("min_price"), max(x).as("max_price"))
          .withColumn("m2", col("r2") - col("m1") * col("m1"))
          .withColumn("m3",
            col("r3") - lit(3) * col("m1") * col("r2") + lit(2) * col("m1") * col("m1") * col("m1"))
          .withColumn("m4",
            col("r4") - lit(4) * col("m1") * col("r3") + lit(6) * col("m1") * col("m1") * col("r2")
              - lit(3) * col("m1") * col("m1") * col("m1") * col("m1"))
          .select(
            round(col("m1"), 4).as("mean_price"),
            col("std_price"), col("median_price"), col("q1_price"), col("q3_price"),
            col("min_price"), col("max_price"),
            round(col("m3") / pow(col("m2"), 1.5), 6).as("skewness"),
            round(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6).as("kurtosis"))
      },
      Some("""WITH r AS (SELECT avg(l_extendedprice) m1,
             |  avg(l_extendedprice*l_extendedprice) r2,
             |  avg(l_extendedprice*l_extendedprice*l_extendedprice) r3,
             |  avg(l_extendedprice*l_extendedprice*l_extendedprice*l_extendedprice) r4,
             |  round(stddev_samp(l_extendedprice), 4) AS std_price,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
             |  round(quantile_cont(l_extendedprice, 0.25), 4) AS q1_price,
             |  round(quantile_cont(l_extendedprice, 0.75), 4) AS q3_price,
             |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
             |  FROM lineitem),
             |m AS (SELECT *, r2 - m1*m1 AS m2,
             |  r3 - 3*m1*r2 + 2*m1*m1*m1 AS m3,
             |  r4 - 4*m1*r3 + 6*m1*m1*r2 - 3*m1*m1*m1*m1 AS m4 FROM r)
             |SELECT round(m1, 4) AS mean_price, std_price, median_price, q1_price,
             |  q3_price, min_price, max_price,
             |  round(m3 / power(m2, 1.5), 6) AS skewness,
             |  round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis
             |FROM m""".stripMargin)),

    // A8 — describe() battery (reference dfs[0].describe(), 实习二/…ipynb:259):
    // pandas' count/mean/std/min/25%/50%/75%/max for each numeric column, in
    // long format — stack the columns with one explode, then a single
    // hash-aggregate pass (not one job per column).
    "a8_describe" -> QueryDef(
      (s, dir) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        Tables.lineitem(s, dir)
          .select(explode(array(cols.map(c =>
            struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*)).as("cv"))
          .select(col("cv.col_name").as("col_name"), col("cv.v").as("v"))
          .groupBy("col_name")
          .agg(count(lit(1)).as("n"),
            round(avg("v"), 4).as("mean"),
            round(stddev_samp(col("v")), 4).as("std"),
            round(min("v"), 4).as("min_v"),
            round(expr("percentile(v, 0.25)"), 4).as("p25"),
            round(expr("percentile(v, 0.5)"), 4).as("p50"),
            round(expr("percentile(v, 0.75)"), 4).as("p75"),
            round(max("v"), 4).as("max_v"))
          .orderBy("col_name")
      },
      Some("""WITH stacked AS (
             |  SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
             |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
             |  UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem)
             |SELECT col_name, count(*) AS n,
             |  round(avg(v), 4) AS mean, round(stddev_samp(v), 4) AS std,
             |  round(min(v), 4) AS min_v,
             |  round(quantile_cont(v, 0.25), 4) AS p25,
             |  round(quantile_cont(v, 0.5), 4) AS p50,
             |  round(quantile_cont(v, 0.75), 4) AS p75,
             |  round(max(v), 4) AS max_v
             |FROM stacked GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A16 — per-group decile binning (pandas groupby().qcut shape): ntile
    // is the SQL-standard equal-count binning both engines implement
    // identically, but the obvious
    // `ntile(10) OVER (PARTITION BY l_returnflag ...)` window would funnel
    // the whole fact table through THREE tasks (one per flag value — the
    // low-cardinality window-partition trap: at 10× data the round-7 whale
    // read it 12.7× slower, the three sorts being the whole wall-clock; at
    // 100 TB it never finishes). The scale-safe exact form: a global rank
    // from ops.Cumulative's range-partitioned prefix sum over the total
    // order (flag, price, orderkey, linenumber), per-flag rank = global
    // rank minus the (≤ handful of flags, broadcast) earlier-flag count,
    // then ntile's bucket arithmetic in closed form — SQL-standard ntile
    // gives the first (n mod 10) buckets ceil(n/10) rows and the rest
    // floor(n/10), so the bucket of rank r is pure integer arithmetic
    // (CumulativeSpec pins the identity against Spark's own ntile). Per-bucket
    // stats are count/min/max only — exact in both engines, no FP
    // accumulation.
    "a16_group_deciles" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_returnflag").as("f"), col("l_extendedprice").as("p"),
          col("l_orderkey"), col("l_linenumber"))
        val ranked = graft.ops.Cumulative.runningSum(
          li, Seq(col("f"), col("p"), col("l_orderkey"), col("l_linenumber")),
          lit(1L), "rnk", "__cnt").drop("__cnt")
        val ftot = li.groupBy("f").agg(count(lit(1)).as("n"))
        val off = ftot.as("a")
          .join(broadcast(ftot.select(col("f").as("bf"), col("n").as("bn"))),
            col("bf") < col("f"), "left")
          .groupBy(col("f"), col("n"))
          .agg(coalesce(sum("bn"), lit(0L)).as("off"))
        ranked.join(broadcast(off), "f")
          .withColumn("r", col("rnk") - col("off"))
          .withColumn("decile", graft.ops.Cumulative.ntileOfRank(col("r"), col("n"), 10))
          .groupBy(col("f"), col("decile"))
          .agg(count(lit(1)).as("n"),
            min("p").as("min_price"),
            max("p").as("max_price"))
          .select(col("f").as("l_returnflag"), col("decile"), col("n"),
            col("min_price"), col("max_price"))
          .orderBy("l_returnflag", "decile")
      },
      Some("""WITH d AS (SELECT l_returnflag, l_extendedprice,
             |    CAST(ntile(10) OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS decile
             |  FROM lineitem)
             |SELECT l_returnflag, decile, count(*) AS n,
             |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
             |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // A17 — exact per-group quantiles (pandas groupby().median()/.quantile):
    // Spark's `percentile` exact aggregate == DuckDB quantile_cont (both the
    // SQL-standard continuous interpolation over the sorted group). Exact
    // sort-based aggregation, deterministic — unlike avg, no FP accumulation
    // order in play (interpolation touches at most two values). The approx
    // scale path for wide groups is a7b's GK sketch; this is the exact form
    // a reference user gets from pandas.
    "a17_group_quantiles" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_extendedprice, 0.5)").as("median_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
             |  quantile_cont(l_quantity, 0.5) AS median_qty,
             |  quantile_cont(l_quantity, 0.9) AS p90_qty,
             |  quantile_cont(l_extendedprice, 0.5) AS median_price
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A9 — histogram with fixed bins (reference density-level bins
    // …network_analysis.ipynb:1209-1218).
    "a9_histogram" -> QueryDef(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("bin",
          when(col("o_totalprice") < 1000, "0-1k")
            .when(col("o_totalprice") < 2000, "1k-2k")
            .when(col("o_totalprice") < 5000, "2k-5k")
            .when(col("o_totalprice") < 10000, "5k-10k")
            .otherwise("10k+"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
        .orderBy("bin"),
      Some("""SELECT CASE WHEN o_totalprice < 1000 THEN '0-1k'
             |  WHEN o_totalprice < 2000 THEN '1k-2k'
             |  WHEN o_totalprice < 5000 THEN '2k-5k'
             |  WHEN o_totalprice < 10000 THEN '5k-10k'
             |  ELSE '10k+' END AS bin, count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A10 — missing-rate profile per column (reference % isna,
    // analyze_data_bias.py:63-80).
    "a10_missing_rates" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val rates = o.columns.toSeq.map(c =>
          round(avg(col(c).isNull.cast("double")), 6).as(s"miss_$c"))
        o.agg(rates.head, rates.tail: _*)
      },
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority").map(c =>
          s"round(avg(CASE WHEN $c IS NULL THEN 1.0 ELSE 0.0 END), 6) AS miss_$c").mkString(",\n  ")
        s"SELECT\n  $cols\nFROM orders"
      }),

    // A18 — hierarchical subtotals via ROLLUP (beyond the reference — its
    // pandas aggregates one level at a time; SURVEY §2.4 notes Spark gives
    // grouping sets for free): per-(returnflag, linestatus) revenue with
    // per-flag subtotals and a grand total in ONE pass — at 100 TB this
    // replaces three separate scans with one partial-aggregated shuffle.
    "a18_rollup" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("revenue"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("revenue"))
        .orderBy("flag", "status"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
             |  coalesce(l_linestatus, 'ALL') AS status,
             |  count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY flag, status""".stripMargin)),

    // Engine-added — CUBE: all four grouping sets over (status, priority)
    // in ONE pass (Spark expands grouping sets inside a single hash
    // aggregate — no union of scans), a18's ROLLUP companion.
    "a19_cube" -> QueryDef(
      (s, dir) => Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("revenue"))
        .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS revenue
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // Engine-added — per-group mode (pandas .mode() / most_common): the
    // heavy pass is one hash aggregate over (group, value); the argmax
    // window runs over the aggregated counts only (≤ |statuses × priorities|
    // rows), with lexicographic tie-break for determinism.
    "a20_group_mode" -> QueryDef(
      (s, dir) => {
        val counts = Tables.orders(s, dir)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(desc("n"), col("o_orderpriority"))
        counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("o_orderstatus").as("status"),
            col("o_orderpriority").as("mode_priority"), col("n"))
          .orderBy("status")
      },
      Some("""WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
             |  FROM orders GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
             |    ORDER BY n DESC, o_orderpriority) AS rn FROM c)
             |SELECT o_orderstatus AS status, o_orderpriority AS mode_priority, n
             |FROM r WHERE rn = 1 ORDER BY status""".stripMargin)),

    // Engine-added — join-key skew profile, the diagnostic that decides
    // whether a join needs salting (ops.SkewJoin) before it runs: per-key
    // cardinalities reduced to key count, max/top-1 share, and Shannon
    // entropy. Entropy uses the count-of-counts identity
    // H = ln T − Σ m·n·ln n / T, so the fold runs over the CARDINALITY
    // HISTOGRAM (a handful of rows however many keys exist — scale-safe,
    // unlike folding per-key terms), sorted-sequentially on both engines.
    "a21_key_skew_profile" -> QueryDef(
      (s, dir) => {
        val perKey = Tables.lineitem(s, dir)
          .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        val cc = perKey.groupBy("n").agg(count(lit(1)).as("m"))
        def ssum(c: org.apache.spark.sql.Column) =
          graft.functions.SortedSumD.sortedSum(c)
        val t = cc.agg(sum(col("n") * col("m")).as("total"),
          sum("m").as("n_keys"), max("n").as("max_n"))
        val fold = cc.agg(ssum(col("n").cast("double") * col("m")
          * log(col("n").cast("double"))).as("s2"))
        t.crossJoin(fold).select(col("n_keys"), col("max_n").as("max_per_key"),
          round(col("max_n").cast("double") / col("total"), 6).as("top_share"),
          round(log(col("total").cast("double")) - col("s2") / col("total"), 6)
            .as("entropy"))
      },
      Some("""WITH k AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1),
             |cc AS (SELECT n, count(*) AS m FROM k GROUP BY 1),
             |t AS (SELECT CAST(sum(n * m) AS BIGINT) AS total,
             |    CAST(sum(m) AS BIGINT) AS n_keys, max(n) AS max_n FROM cc),
             |fold AS (SELECT list_sum(list_sort(list(CAST(n AS DOUBLE) * m * ln(n))))
             |    AS s2 FROM cc)
             |SELECT n_keys, max_n AS max_per_key,
             |  round(max_n / CAST(total AS DOUBLE), 6) AS top_share,
             |  round(ln(total) - s2 / total, 6) AS entropy
             |FROM t CROSS JOIN fold""".stripMargin)),

    // A11 — Pareto concentration (reference top-20%-users share,
    // analyze_data_bias.py:155-178): running share over the desc-ordered
    // per-user totals. Totals are EXACT INTEGER ten-thousandths and the
    // running sum is the range-partitioned distributed prefix sum
    // (ops.Cumulative): integer sums are order-free, so partition partials
    // reordering the adds cannot move the >= 0.5 threshold by an ulp, and no
    // global single-partition window survives in the plan (per-user rows are
    // data-proportional — the old Window.orderBy was the scale bottleneck).
    "a11_pareto" -> QueryDef(
      (s, dir) => {
        val totals = Tables.events(s, dir)
          .groupBy("user_id")
          .agg(round(sum("value") * 10000).cast("long").as("ti"))
        val cum = graft.ops.Cumulative.runningSum(
          totals, Seq(col("ti").desc, col("user_id")), col("ti"), "rnk", "cum")
          .crossJoin(totals.agg(sum("ti").as("grand"), count(lit(1)).as("n_users")))
        cum.filter(col("cum") * 2 >= col("grand"))
          .orderBy("rnk").limit(1)
          .select(col("rnk").as("users_for_half"), col("n_users"),
            round(col("rnk").cast("double") / col("n_users"), 6).as("user_share"))
      },
      Some("""WITH t AS (SELECT user_id, CAST(round(sum(value) * 10000) AS BIGINT) AS ti
             |           FROM events GROUP BY 1),
             |c AS (SELECT row_number() OVER (ORDER BY ti DESC, user_id) AS rnk,
             |  sum(ti) OVER (ORDER BY ti DESC, user_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t),
             |g AS (SELECT sum(ti) AS grand, count(*) AS n_users FROM t)
             |SELECT rnk AS users_for_half, n_users,
             |  round(CAST(rnk AS DOUBLE) / n_users, 6) AS user_share
             |FROM c, g WHERE cum * 2 >= grand ORDER BY rnk LIMIT 1""".stripMargin)),

    // A12 — cumulative distribution (reference cumsum/len CDF,
    // …network_analysis.ipynb:1163-1169). cume_dist(t) = #{rows ≤ t} / n,
    // computed scale-safe: group by distinct total, distributed prefix-count
    // over the grouped frame (ops.Cumulative — integer counts, order-free),
    // then only the 100 lowest candidates (TakeOrderedAndProject) join their
    // tie-group's inclusive count by broadcast. The old global cume_dist
    // window single-partitioned the whole per-user aggregate.
    "a12_cdf" -> QueryDef(
      (s, dir) => {
        val totals = Tables.events(s, dir)
          .groupBy("user_id")
          .agg(round(sum("value") * 10000).cast("long").as("ti"))
        val byVal = totals.groupBy("ti").agg(count(lit(1)).as("cnt"))
        val cum = graft.ops.Cumulative.runningSum(
            byVal, Seq(col("ti")), col("cnt"), "r", "cum_cnt")
          .crossJoin(totals.agg(count(lit(1)).as("n")))
          .select(col("ti"), round(col("cum_cnt").cast("double") / col("n"), 6).as("cdf"))
        val cand = totals.orderBy("ti", "user_id").limit(100)
        cand.join(cum, "ti")
          .select(col("user_id"), (col("ti") / 10000.0).as("total"), col("cdf"))
          .orderBy("total", "user_id").limit(100)
      },
      Some("""WITH t AS (SELECT user_id, CAST(round(sum(value) * 10000) AS BIGINT) AS ti
             |           FROM events GROUP BY 1)
             |SELECT user_id, ti / 10000.0 AS total,
             |  round(cume_dist() OVER (ORDER BY ti), 6) AS cdf
             |FROM t ORDER BY total, user_id LIMIT 100""".stripMargin)),

    // A13 — coverage ratio: distinct ÷ count (reference reviewed businesses ÷
    // all, analyze_data_bias.py:211-216).
    "a13_coverage" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
        .withColumn("events_per_user",
          round(col("n_events").cast("double") / col("n_users"), 6))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
             |  count(*) AS n_events,
             |  round(CAST(count(*) AS DOUBLE) / count(DISTINCT user_id), 6) AS events_per_user
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A13b — sketch-based distinct counting (the 100 TB path for A13:
    // HyperLogLog++ partial aggregates merge without holding the distinct
    // set). Raw HLL estimates are engine-specific, so — like a7b and d11 —
    // the query VERIFIES the sketch in-engine instead of hashing it: emit
    // the exact per-group distinct count (oracle-recomputable) plus a flag
    // that the estimate landed within the 2.5× rsd envelope (rsd 0.02 →
    // |err| ≤ 5%). A sketch regression flips the flag and hash-mismatches.
    "a13b_coverage_approx" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct("user_id", 0.02).as("approx"),
          countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("n_users"), col("n_events"),
          (abs(col("approx") - col("n_users")).cast("double") / col("n_users")
            <= lit(0.05)).as("within_envelope"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
             |  count(*) AS n_events, true AS within_envelope
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A7b — sketch quantiles: approx_percentile (Greenwald-Khanna) as the
    // 100 TB path for A7's exact percentile — the exact form buffers every
    // value per group; GK keeps a bounded summary and merges map-side.
    // Merge order makes the raw estimates partitioning-dependent, so instead
    // of hashing them the query VERIFIES the GK rank guarantee in-engine:
    // for each q, the estimate's achieved rank must lie within ±εn
    // (ε = 1/accuracy) of qn — #{x ≤ e} ≥ ⌊(q−ε)n⌋ and #{x < e} ≤ ⌈(q+ε)n⌉.
    // The emitted row is (n_rows, n_quantiles, n_within): n_rows is
    // independently recomputed by the oracle and n_within = n_quantiles pins
    // the guarantee — any sketch regression hash-mismatches. The bound check
    // is one extra scan (broadcast of the 1-row estimate frame), which is
    // exactly the calibration-query shape d11 already uses.
    "a7b_approx_quantiles" -> QueryDef(
      (s, dir) => {
        val acc = 10000
        val eps = 1.0 / acc
        val li = Tables.lineitem(s, dir).select(col("l_extendedprice").as("p"))
        val est = li
          .agg(expr(s"approx_percentile(p, array(0.25, 0.5, 0.75), $acc)").as("q"))
          .select(
            element_at(col("q"), 1).as("e1"),
            element_at(col("q"), 2).as("e2"),
            element_at(col("q"), 3).as("e3"))
        val counted = li.crossJoin(broadcast(est)).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("p") <= col("e1"), 1L).otherwise(0L)).as("le1"),
          sum(when(col("p") < col("e1"), 1L).otherwise(0L)).as("lt1"),
          sum(when(col("p") <= col("e2"), 1L).otherwise(0L)).as("le2"),
          sum(when(col("p") < col("e2"), 1L).otherwise(0L)).as("lt2"),
          sum(when(col("p") <= col("e3"), 1L).otherwise(0L)).as("le3"),
          sum(when(col("p") < col("e3"), 1L).otherwise(0L)).as("lt3"))
        def within(q: Double, le: String, lt: String) =
          when(col(le) >= floor((lit(q) - lit(eps)) * col("n_rows")) &&
            col(lt) <= ceil((lit(q) + lit(eps)) * col("n_rows")), 1L).otherwise(0L)
        counted.select(
          col("n_rows"),
          lit(3L).as("n_quantiles"),
          (within(0.25, "le1", "lt1") + within(0.50, "le2", "lt2") +
            within(0.75, "le3", "lt3")).as("n_within"))
      },
      Some("""SELECT count(*) AS n_rows, CAST(3 AS BIGINT) AS n_quantiles,
             |  CAST(3 AS BIGINT) AS n_within FROM lineitem""".stripMargin)),

    // A14 — weighted composite score (reference sentiment*0.7 + stars/5*0.3,
    // 实习四/…ipynb:908-911).
    "a14_weighted_score" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(round(avg("value"), 4).as("avg_value"),
          round(max("value"), 4).as("max_value"))
        .withColumn("score",
          round(col("avg_value") / lit(200.0) * lit(0.7) + col("max_value") / lit(1000.0) * lit(0.3), 6))
        .orderBy(desc("score"), col("event_type")),
      Some("""WITH a AS (SELECT event_type, round(avg(value), 4) AS avg_value,
             |  round(max(value), 4) AS max_value FROM events GROUP BY 1)
             |SELECT event_type, avg_value, max_value,
             |  round(avg_value / 200.0 * 0.7 + max_value / 1000.0 * 0.3, 6) AS score
             |FROM a ORDER BY score DESC, event_type""".stripMargin)),

    // A15 — grand totals over the pivot + argmax (reference row/col sums and
    // idxmax, test.py:416-418): per-dow total + peak hour, deterministic
    // tie-break on the smaller hour.
    "a15_pivot_totals" -> QueryDef(
      (s, dir) => {
        val counts = Tables.events(s, dir)
          .withColumn("dow", expr("((ts_ns div 86400000000000) + 4) % 7"))
          .withColumn("hod", expr(s"(ts_ns div $hourNs) % 24"))
          .groupBy("dow", "hod").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("dow").orderBy(desc("cnt"), col("hod"))
        counts
          .withColumn("total", sum("cnt").over(Window.partitionBy("dow")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("dow"), col("total"), col("hod").as("peak_hour"), col("cnt").as("peak_count"))
          .orderBy("dow")
      },
      Some(s"""WITH c AS (SELECT ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow,
              |  (epoch_ns(ts) // $hourNs) % 24 AS hod, count(*) AS cnt
              |  FROM events GROUP BY 1, 2)
              |SELECT dow, CAST(sum(cnt) OVER (PARTITION BY dow) AS BIGINT) AS total,
              |  hod AS peak_hour, cnt AS peak_count
              |FROM c QUALIFY row_number() OVER (PARTITION BY dow
              |  ORDER BY cnt DESC, hod) = 1 ORDER BY dow""".stripMargin)),

    // Engine-added — EXACT per-group weighted median (price weighted by
    // quantity): the smallest value whose cumulative weight reaches half
    // the group total. Scale-safe shape: ONE range-partitioned prefix sum
    // over the total order (flag, price, orderkey, linenumber) via
    // ops.Cumulative — never a per-group global-order window over
    // data-proportional rows — then per-flag cumulative = global cumulative
    // minus the (≤ handful of flags, broadcast) earlier-flag offset.
    // Weights are integer quantities, so the threshold test 2·cum ≥ total
    // is exact; the median itself is a data value, no arithmetic on it.
    "a22_weighted_median" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_returnflag").as("f"), col("l_extendedprice").as("p"),
          col("l_quantity").cast("long").as("wt"),
          col("l_orderkey"), col("l_linenumber"))
        val cum = graft.ops.Cumulative.runningSum(
          li, Seq(col("f"), col("p"), col("l_orderkey"), col("l_linenumber")),
          col("wt"), "rnk", "cumw")
        val ftot = li.groupBy("f").agg(sum("wt").as("tw"))
        val off = ftot.as("a")
          .join(broadcast(ftot.select(col("f").as("bf"), col("tw").as("btw"))),
            col("bf") < col("f"), "left")
          .groupBy(col("f"), col("tw"))
          .agg(coalesce(sum("btw"), lit(0L)).as("off"))
        cum.join(broadcast(off), "f")
          .filter((col("cumw") - col("off")) * 2 >= col("tw"))
          .groupBy(col("f"), col("tw"))
          .agg(min("p").as("wmedian_price"))
          .select(col("f").as("l_returnflag"), col("wmedian_price"),
            col("tw").as("total_weight"))
          .orderBy("l_returnflag")
      },
      Some("""WITH w AS (SELECT l_returnflag AS f, l_extendedprice AS p,
             |    CAST(l_quantity AS BIGINT) AS wt, l_orderkey, l_linenumber
             |  FROM lineitem),
             |tot AS (SELECT f, CAST(sum(wt) AS BIGINT) AS tw FROM w GROUP BY 1),
             |c AS (SELECT f, p, CAST(sum(wt) OVER (PARTITION BY f
             |    ORDER BY p, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
             |  FROM w)
             |SELECT c.f AS l_returnflag, min(c.p) AS wmedian_price, t.tw AS total_weight
             |FROM c JOIN tot t ON t.f = c.f WHERE c.cw * 2 >= t.tw
             |GROUP BY 1, 3 ORDER BY 1""".stripMargin)),

    // Engine-added — EXACT Gini concentration of per-customer spend: how
    // unequally revenue concentrates across customers, the curation
    // diagnostic behind "does one key dominate the corpus" (complements the
    // a21 count-of-counts entropy with the classic inequality index). Spend
    // is integer cents (order-free exact sums, one map-side-combined
    // shuffle); the sorted-rank term needs every row's global rank by spend,
    // which comes from ops.Cumulative's range-partitioned prefix rank over
    // the (cents, custkey) total order — never a global-order window. The
    // formula G = (2·Σrnk·x − (n+1)·Σx) / (n·Σx) stays ALL-INTEGER until
    // the final division (long holds to ~1e9 keys × ~5e7 cents; beyond
    // that the two sums widen to decimal(38,0) with the same plan shape).
    "a23_gini" -> QueryDef(
      (s, dir) => {
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        val ranked = graft.ops.Cumulative.runningSum(
          spend, Seq(col("cents"), col("o_custkey")), col("cents"), "rnk", "__cum")
        ranked.agg(
            count(lit(1)).as("n"),
            sum("cents").as("tot"),
            sum(col("rnk") * col("cents")).as("s1"))
          .select(col("n").as("n_customers"), col("tot").as("total_cents"),
            round((lit(2L) * col("s1") - (col("n") + lit(1L)) * col("tot")).cast("double")
              / (col("n") * col("tot")).cast("double"), 6).as("gini"))
      },
      Some("""WITH spend AS (SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |r AS (SELECT cents,
             |    row_number() OVER (ORDER BY cents, o_custkey) AS rnk FROM spend),
             |t AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS tot,
             |    CAST(sum(rnk * cents) AS BIGINT) AS s1 FROM r)
             |SELECT n AS n_customers, tot AS total_cents,
             |  round(CAST(2 * s1 - (n + 1) * tot AS DOUBLE)
             |    / CAST(n * tot AS DOUBLE), 6) AS gini
             |FROM t""".stripMargin)),

    // Engine-added — full Pearson correlation matrix of the lineitem
    // numeric columns in ONE aggregation pass: all 4 first moments, 4
    // squares and 6 cross-products land in a single hash aggregate (15
    // sums, one scan, map-side combined) — never a per-pair corr() that
    // re-scans the fact table 6×. Inputs quantize to integers (quantity is
    // integral; price to whole units, discount/tax to hundredths), the
    // sums run in decimal(38,0) (sum(long) would WRAP silently at scale —
    // DuckDB's HUGEINT sum is the same widening), and each r is a
    // pure-IEEE chain over the exactly-summed moments cast once to double.
    // The 1-row moment frame is lineage-cut and fanned to the 6 pair rows.
    "a24_corr_matrix" -> {
      val vars = Seq("q", "e", "d", "t")
      val names = Map("q" -> "quantity", "e" -> "price_usd",
        "d" -> "discount_pct", "t" -> "tax_pct")
      val pairs = for { i <- vars.indices; j <- (i + 1) until vars.size }
        yield (vars(i), vars(j))
      QueryDef(
        (s, dir) => {
          val li = Tables.lineitem(s, dir).select(
            col("l_quantity").cast("long").as("q"),
            round(col("l_extendedprice")).cast("long").as("e"),
            round(col("l_discount") * 100).cast("long").as("d"),
            round(col("l_tax") * 100).cast("long").as("t"))
          val sums = Seq(count(lit(1)).cast("double").as("n")) ++
            vars.map(v => sum(col(v).cast("decimal(38,0)")).cast("double").as(s"s_$v")) ++
            (for { i <- vars.indices; j <- i until vars.size } yield {
              val (a, b) = (vars(i), vars(j))
              sum((col(a) * col(b)).cast("decimal(38,0)")).cast("double").as(s"s_$a$b")
            })
          val m = graft.core.Materialize.cut(li.agg(sums.head, sums.tail: _*))
          pairs.map { case (a, b) =>
            m.select(lit(names(a)).as("col_a"), lit(names(b)).as("col_b"),
              round((col("n") * col(s"s_$a$b") - col(s"s_$a") * col(s"s_$b"))
                / (sqrt(col("n") * col(s"s_$a$a") - col(s"s_$a") * col(s"s_$a"))
                  * sqrt(col("n") * col(s"s_$b$b") - col(s"s_$b") * col(s"s_$b"))), 6)
                .as("corr"))
          }.reduce(_ unionByName _).orderBy("col_a", "col_b")
        },
        Some {
          val mom = vars.map(v => s"CAST(sum($v) AS DOUBLE) AS s_$v") ++
            (for { i <- vars.indices; j <- i until vars.size } yield {
              val (a, b) = (vars(i), vars(j))
              s"CAST(sum($a * $b) AS DOUBLE) AS s_$a$b"
            })
          val rows = pairs.map { case (a, b) =>
            s"""SELECT '${names(a)}' AS col_a, '${names(b)}' AS col_b,
               |  round((n * s_$a$b - s_$a * s_$b)
               |    / (sqrt(n * s_$a$a - s_$a * s_$a)
               |      * sqrt(n * s_$b$b - s_$b * s_$b)), 6) AS corr FROM m""".stripMargin
          }.mkString("\nUNION ALL\n")
          s"""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q,
             |    CAST(round(l_extendedprice) AS BIGINT) AS e,
             |    CAST(round(l_discount * 100) AS BIGINT) AS d,
             |    CAST(round(l_tax * 100) AS BIGINT) AS t
             |  FROM lineitem),
             |m AS (SELECT CAST(count(*) AS DOUBLE) AS n, ${mom.mkString(", ")} FROM li)
             |SELECT * FROM ($rows) ORDER BY col_a, col_b""".stripMargin
        })
    }
  )
}
