package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.core.Tables
import graft.ops.{Anomaly, Sessionize}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions / time series / sessions (SURVEY.md §2.5) over `events`.
  *
  * Time convention: `ts_ns` int64 epoch nanoseconds (exact); hour buckets are
  * `ts_ns div 3.6e12`, emitted as epoch seconds — integer arithmetic that a
  * DuckDB oracle reproduces bit-for-bit via epoch_ns(ts).
  */
object WindowQueries extends QueryCatalog {

  private val hourNs = 3600000000000L

  def defs: Map[String, QueryDef] = Map(

    // W1 — tumbling 1-hour window counts (reference pd.Grouper(freq='1h') at
    // 实习一/实习一代码/test.py:636-639). Map-side combinable single shuffle.
    "w1_hourly_counts" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .groupBy((expr(s"ts_ns div $hourNs") * lit(3600L)).as("hour_epoch"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("hour_epoch"),
      Some(s"""SELECT (epoch_ns(ts) // $hourNs) * 3600 AS hour_epoch, count(*) AS cnt
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      headline = true),

    // W13 — rolling 24-hour moving average + hour-over-hour delta (pandas
    // df.rolling(24).mean() / .diff() over the hourly series). The global-
    // order window is over the AGGREGATED series — one row per hour, bounded
    // by the time range regardless of event volume — never the raw events,
    // so the single-partition window input stays tiny at any scale (same
    // argument as the sessionize ops). Ratio kept as exact-sum / exact-count
    // so both engines divide the same integers.
    "w13_rolling_avg" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(expr(s"ts_ns div $hourNs").as("hour_idx"))
          .agg(count(lit(1)).as("cnt"))
        // constant non-foldable partition key = same one-partition plan,
        // warning-free (see Sessionize.byGap for why lit(0) won't do)
        val one = coalesce(pmod(col("hour_idx"), lit(1)), lit(0))
        val roll = Window.partitionBy(one).orderBy("hour_idx").rowsBetween(-23, 0)
        val seq = Window.partitionBy(one).orderBy("hour_idx")
        hourly
          .withColumn("roll_avg",
            round(sum("cnt").over(roll) / count(lit(1)).over(roll), 6))
          .withColumn("delta",
            coalesce(col("cnt") - lag("cnt", 1).over(seq), lit(0L)))
          .select((col("hour_idx") * 3600L).as("hour_epoch"),
            col("cnt"), col("roll_avg"), col("delta"))
          .orderBy(desc("roll_avg"), col("hour_epoch")).limit(10)
      },
      Some(s"""WITH h AS (SELECT epoch_ns(ts) // $hourNs AS hour_idx, count(*) AS cnt
             |  FROM events GROUP BY 1),
             |r AS (SELECT hour_idx, cnt,
             |    round(CAST(sum(cnt) OVER w AS DOUBLE) / count(*) OVER w, 6) AS roll_avg,
             |    coalesce(cnt - lag(cnt, 1) OVER (ORDER BY hour_idx), 0) AS delta
             |  FROM h
             |  WINDOW w AS (ORDER BY hour_idx ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
             |SELECT hour_idx * 3600 AS hour_epoch, cnt, roll_avg, delta
             |FROM r ORDER BY roll_avg DESC, hour_epoch LIMIT 10""".stripMargin)),

    // W2 — threshold anomaly: hours with count > mean + 2σ (test.py:642-651).
    "w2_anomalous_hours" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(expr(s"ts_ns div $hourNs").as("hour_idx"))
          .agg(count(lit(1)).as("cnt"))
        val stats = hourly.agg(avg("cnt").as("m"), stddev_samp(col("cnt").cast("double")).as("sd"))
        hourly.crossJoin(stats)
          .filter(col("cnt") > col("m") + lit(2.0) * col("sd"))
          .select((col("hour_idx") * 3600L).as("hour_epoch"), col("cnt"))
          .orderBy("hour_epoch")
      },
      Some(s"""WITH h AS (SELECT epoch_ns(ts) // $hourNs AS hour_idx, count(*) AS cnt
              |           FROM events GROUP BY 1)
              |SELECT hour_idx * 3600 AS hour_epoch, cnt
              |FROM h, (SELECT avg(cnt) m, stddev_samp(cnt) sd FROM h) s
              |WHERE cnt > m + 2.0 * sd ORDER BY hour_epoch""".stripMargin)),

    // W3 — full high-density-period pipeline: threshold → gap-sessionize →
    // per-session agg → top-3 by peak (test.py:636-694; SURVEY §7.2 slice).
    "w3_high_density_sessions" -> QueryDef(
      (s, dir) => Anomaly.highDensityPeriods(Tables.events(s, dir))
        .orderBy(desc("max_count"), col("start_epoch"))
        .limit(3),
      Some(s"""WITH h AS (SELECT epoch_ns(ts) // $hourNs AS hour_idx, count(*) AS cnt
              |           FROM events GROUP BY 1),
              |anom AS (SELECT hour_idx, cnt
              |         FROM h, (SELECT avg(cnt) m, stddev_samp(cnt) sd FROM h) s
              |         WHERE cnt > m + 2.0 * sd),
              |sess AS (SELECT hour_idx, cnt,
              |  sum(CASE WHEN prev IS NULL OR hour_idx - prev <= 1 THEN 0 ELSE 1 END)
              |    OVER (ORDER BY hour_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              |  FROM (SELECT hour_idx, cnt, lag(hour_idx) OVER (ORDER BY hour_idx) AS prev FROM anom))
              |SELECT min(hour_idx) * 3600 AS start_epoch, max(hour_idx) * 3600 AS end_epoch,
              |  max(cnt) AS max_count, round(avg(cnt), 4) AS avg_count,
              |  max(hour_idx) - min(hour_idx) + 1 AS duration_hours
              |FROM sess GROUP BY session_id
              |ORDER BY max_count DESC, start_epoch LIMIT 3""".stripMargin),
      headline = true),

    // W4 — ranking (reference rank(ascending=False) at 实习四/…ipynb:914-915):
    // per-user total purchase value, dense ranking, deterministic tie-break.
    "w4_rank" -> QueryDef(
      (s, dir) => {
        val byUser = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(round(sum("value"), 4).as("total_value"))
        // Top-50 first via TakeOrderedAndProject (distributed), THEN rank within
        // the bounded frame: the global rank window this replaces sorted every
        // user through a single task only to discard rows 51…n. (user_id breaks
        // all ties, so rank ≡ row_number ≡ 1 + count of strict predecessors; a
        // broadcast self-count over 50 rows computes it without any window.)
        val top = byUser.orderBy(desc("total_value"), col("user_id")).limit(50)
        top
          .join(broadcast(top.select(col("total_value").as("btv"), col("user_id").as("bid"))),
            col("btv") > col("total_value") ||
              (col("btv") === col("total_value") && col("bid") <= col("user_id")))
          .groupBy(col("user_id"), col("total_value"))
          .agg(count(lit(1)).as("rnk"))
          .orderBy("rnk").limit(50)
      },
      Some("""WITH u AS (SELECT user_id, round(sum(value), 4) AS total_value
             |           FROM events WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT user_id, total_value,
             |  rank() OVER (ORDER BY total_value DESC, user_id) AS rnk
             |FROM u ORDER BY rnk LIMIT 50""".stripMargin)),

    // W5 — top-k per group (reference nlargest per metric, 实习四/…ipynb:1120-1138):
    // top-3 users by event count within each event_type.
    "w5_topk_per_group" -> QueryDef(
      (s, dir) => {
        val counts = Tables.events(s, dir)
          .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy(desc("n"), col("user_id"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("event_type", "rn")
      },
      Some("""WITH c AS (SELECT event_type, user_id, count(*) AS n
             |           FROM events GROUP BY 1, 2)
             |SELECT event_type, user_id, n,
             |  row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rn
             |FROM c QUALIFY rn <= 3 ORDER BY event_type, rn""".stripMargin)),

    // W6 — elbow/knee detection on a sorted series (reference k-distance
    // gradient argmax, test.py:109-115): central finite difference via
    // lead/lag over the descending hourly-count curve.
    "w6_elbow" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(expr(s"ts_ns div $hourNs").as("hour_idx"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(coalesce(pmod(col("hour_idx"), lit(1)), lit(0)))
          .orderBy(desc("cnt"), col("hour_idx"))
        hourly.withColumn("pos", row_number().over(w))
          .withColumn("grad",
            (lead("cnt", 1).over(w) - lag("cnt", 1).over(w)).cast("double") / lit(2.0))
          .filter(col("grad").isNotNull)
          .orderBy(col("grad"), col("pos")).limit(1)
          .select("pos", "cnt", "grad")
      },
      Some(s"""WITH h AS (SELECT epoch_ns(ts) // $hourNs AS hour_idx, count(*) AS cnt
              |           FROM events GROUP BY 1),
              |g AS (SELECT row_number() OVER (ORDER BY cnt DESC, hour_idx) AS pos, cnt,
              |  (lead(cnt) OVER (ORDER BY cnt DESC, hour_idx)
              |   - lag(cnt) OVER (ORDER BY cnt DESC, hour_idx)) / 2.0 AS grad
              |  FROM h)
              |SELECT pos, cnt, grad FROM g WHERE grad IS NOT NULL
              |ORDER BY grad, pos LIMIT 1""".stripMargin)),

    // W7 — time-component extraction (reference dt.hour/.dayofweek at
    // test.py:215-216): pure integer arithmetic on epoch nanos (1970-01-01
    // was a Thursday → dow0 Sunday = (days+4) mod 7).
    "w7_time_components" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("hour_of_day", expr(s"(ts_ns div $hourNs) % 24"))
        .withColumn("dow", expr("((ts_ns div 86400000000000) + 4) % 7"))
        .groupBy("dow", "hour_of_day").agg(count(lit(1)).as("n"))
        .orderBy("dow", "hour_of_day"),
      Some(s"""SELECT ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow,
              |  (epoch_ns(ts) // $hourNs) % 24 AS hour_of_day, count(*) AS n
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // W8 — calendar bucketing CASE (reference morning/evening-peak buckets,
    // 实习二/…ipynb:347-368; weekends treated as off-peak).
    "w8_calendar_buckets" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("hod", expr(s"(ts_ns div $hourNs) % 24"))
        .withColumn("dow", expr("((ts_ns div 86400000000000) + 4) % 7"))
        .withColumn("bucket",
          when(col("dow").isin(0, 6), lit("weekend"))
            .when(col("hod").between(7, 9), lit("morning_peak"))
            .when(col("hod").between(17, 19), lit("evening_peak"))
            .when(col("hod").between(10, 16), lit("day"))
            .otherwise(lit("night")))
        .groupBy("bucket").agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
        .orderBy("bucket"),
      Some(s"""SELECT CASE
              |  WHEN ((epoch_ns(ts) // 86400000000000) + 4) % 7 IN (0, 6) THEN 'weekend'
              |  WHEN (epoch_ns(ts) // $hourNs) % 24 BETWEEN 7 AND 9 THEN 'morning_peak'
              |  WHEN (epoch_ns(ts) // $hourNs) % 24 BETWEEN 17 AND 19 THEN 'evening_peak'
              |  WHEN (epoch_ns(ts) // $hourNs) % 24 BETWEEN 10 AND 16 THEN 'day'
              |  ELSE 'night' END AS bucket,
              |count(*) AS n, round(avg(value), 4) AS avg_value
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Engine-added — calendar resample + forward fill (pandas
    // df.resample('1h').ffill()): each event_type's hourly series is
    // densified to every hour between its first and last observation
    // (sequence+explode spine — no driver loop), missing hours carry the
    // last observed count forward. The fill window partitions by key and
    // each partition is calendar-bounded (720 hours here regardless of
    // event volume), the same bounded-series argument as w13; at 100 TB
    // the spine grows with keys × calendar, never with row count.
    "w16_resample_ffill" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"), expr(s"ts_ns div $hourNs").as("h"))
          .agg(count(lit(1)).as("cnt"))
        val spine = hourly.groupBy("event_type")
          .agg(min("h").as("h0"), max("h").as("h1"))
          .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
        val fill = Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(hourly, Seq("event_type", "h"), "left")
          .withColumn("was_gap", col("cnt").isNull)
          .withColumn("cnt_filled", last(col("cnt"), ignoreNulls = true).over(fill))
          .select(col("event_type"), (col("h") * 3600L).as("hour_epoch"),
            col("cnt_filled"), col("was_gap"))
          .orderBy("event_type", "hour_epoch")
      },
      Some(s"""WITH hourly AS (SELECT event_type, epoch_ns(ts) // $hourNs AS h,
             |    count(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |span AS (SELECT event_type, min(h) AS h0, max(h) AS h1
             |  FROM hourly GROUP BY 1),
             |spine AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS h FROM span),
             |j AS (SELECT s.event_type, s.h, hourly.cnt
             |  FROM spine s LEFT JOIN hourly
             |    ON hourly.event_type = s.event_type AND hourly.h = s.h)
             |SELECT event_type, h * 3600 AS hour_epoch,
             |  last_value(cnt IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt_filled,
             |  cnt IS NULL AS was_gap
             |FROM j ORDER BY 1, 2""".stripMargin)),

    // Engine-added — strict sequential funnel view → click → purchase: each
    // user's stage-k timestamp is the earliest qualifying event STRICTLY
    // AFTER their stage-(k-1) timestamp (not min-per-type, which overcounts
    // users whose purchase preceded their first view). Three conditional-min
    // hash aggregates keyed by user, each re-joined on user_id — at scale
    // every pass is one map-side-combinable shuffle on the user key; nothing
    // is ordered globally and no per-user event list is materialized.
    "w17_funnel_stages" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir).select("user_id", "event_type", "ts_ns")
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_ns").as("t1"))
        val s2 = ev.join(s1, "user_id")
          .filter(col("event_type") === "click" && col("ts_ns") > col("t1"))
          .groupBy("user_id").agg(min("ts_ns").as("t2"))
        val s3 = ev.join(s2, "user_id")
          .filter(col("event_type") === "purchase" && col("ts_ns") > col("t2"))
          .groupBy("user_id").agg(min("ts_ns").as("t3"))
        val n1 = s1.count(); val n2 = s2.count(); val n3 = s3.count()
        val stages = Seq(("1_view", n1, n1), ("2_click", n2, n1), ("3_purchase", n3, n2))
        import s.implicits._
        stages.toDF("stage", "n_users", "prev_users")
          .select(col("stage"), col("n_users"),
            round(col("n_users").cast("double") / col("prev_users"), 6).as("conversion"))
          .orderBy("stage")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
             |s1 AS (SELECT user_id, min(ts_ns) AS t1 FROM ev
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT ev.user_id, min(ts_ns) AS t2 FROM ev JOIN s1 USING (user_id)
             |  WHERE event_type = 'click' AND ts_ns > t1 GROUP BY 1),
             |s3 AS (SELECT ev.user_id, min(ts_ns) AS t3 FROM ev JOIN s2 USING (user_id)
             |  WHERE event_type = 'purchase' AND ts_ns > t2 GROUP BY 1),
             |n AS (SELECT (SELECT count(*) FROM s1) AS n1,
             |  (SELECT count(*) FROM s2) AS n2, (SELECT count(*) FROM s3) AS n3)
             |SELECT stage, n_users, round(n_users / CAST(prev_users AS DOUBLE), 6)
             |    AS conversion
             |FROM (
             |  SELECT '1_view' AS stage, n1 AS n_users, n1 AS prev_users FROM n
             |  UNION ALL SELECT '2_click', n2, n1 FROM n
             |  UNION ALL SELECT '3_purchase', n3, n2 FROM n)
             |ORDER BY stage""".stripMargin)),

    // Engine-added — first-order event-transition matrix: per user, each
    // event's predecessor type via lag over (user, time), then global
    // (prev → next) counts and row-normalized probabilities. The lag window
    // partitions by user — thousands of small partitions, no global order —
    // and the probability window runs over the 25-row aggregated matrix.
    "w18_transition_matrix" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
        val pairs = Tables.events(s, dir)
          .select("user_id", "event_id", "event_type", "ts_ns")
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
        val row = Window.partitionBy("prev_type")
        pairs
          .withColumn("p", round(col("n").cast("double") / sum("n").over(row), 6))
          .orderBy("prev_type", "event_type")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns
             |  FROM events),
             |pairs AS (SELECT lag(event_type, 1) OVER (PARTITION BY user_id
             |    ORDER BY ts_ns, event_id) AS prev_type, event_type
             |  FROM ev),
             |m AS (SELECT prev_type, event_type, count(*) AS n FROM pairs
             |  WHERE prev_type IS NOT NULL GROUP BY 1, 2)
             |SELECT prev_type, event_type, n,
             |  round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
             |FROM m ORDER BY prev_type, event_type""".stripMargin)),

    // Engine-added — weekly cohort retention: users are cohorted by the
    // week of their first activity, and each (cohort, weeks-since) cell
    // counts the cohort members still active that week. Two hash
    // aggregates keyed by user plus one keyed by (cohort, offset) — every
    // shuffle is on a data-proportional key, no window at all.
    "w19_cohort_retention" -> QueryDef(
      (s, dir) => {
        val dayNs = 86400000000000L
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr(s"ts_ns div $dayNs div 7").as("week"))
          .distinct()
        val first = ev.groupBy("user_id").agg(min("week").as("cohort"))
        val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
        ev.join(first, "user_id")
          .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, "cohort")
          .select(col("cohort"), col("week_offset"), col("n_active"),
            round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
          .orderBy("cohort", "week_offset")
      },
      Some("""WITH ev AS (SELECT DISTINCT user_id,
             |    epoch_ns(ts) // 86400000000000 // 7 AS week FROM events),
             |first AS (SELECT user_id, min(week) AS cohort FROM ev GROUP BY 1),
             |sizes AS (SELECT cohort, count(*) AS n_cohort FROM first GROUP BY 1),
             |cells AS (SELECT f.cohort, ev.week - f.cohort AS week_offset,
             |    count(*) AS n_active
             |  FROM ev JOIN first f USING (user_id) GROUP BY 1, 2)
             |SELECT cohort, week_offset, n_active,
             |  round(n_active / CAST(n_cohort AS DOUBLE), 6) AS retention
             |FROM cells JOIN sizes USING (cohort)
             |ORDER BY cohort, week_offset""".stripMargin)),

    // Engine-added — seasonal residual anomalies: instead of w2's global
    // mean+2σ, each hour is scored against its HOUR-OF-DAY baseline (the
    // daily seasonality profile), surfacing hours that are unusual for
    // their slot. The baseline is integer sums / integer counts — both
    // engines divide the same integers — joined back broadcast (24 rows).
    "w20_seasonal_residual" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(expr(s"ts_ns div $hourNs").as("hour_idx"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("hod", pmod(col("hour_idx"), lit(24L)))
        val profile = hourly.groupBy("hod")
          .agg(sum("cnt").as("tot"), count(lit(1)).as("days"))
        hourly.join(broadcast(profile), "hod")
          .withColumn("baseline", col("tot").cast("double") / col("days"))
          .withColumn("residual", col("cnt") - col("baseline"))
          .select((col("hour_idx") * 3600L).as("hour_epoch"), col("hod"),
            col("cnt"), round(col("baseline"), 6).as("baseline"),
            round(col("residual"), 6).as("residual"))
          .orderBy(desc("residual"), col("hour_epoch")).limit(15)
      },
      Some(s"""WITH h AS (SELECT epoch_ns(ts) // $hourNs AS hour_idx, count(*) AS cnt
             |  FROM events GROUP BY 1),
             |hh AS (SELECT hour_idx, cnt, hour_idx % 24 AS hod FROM h),
             |prof AS (SELECT hod, CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS days
             |  FROM hh GROUP BY 1)
             |SELECT hour_idx * 3600 AS hour_epoch, hod, cnt,
             |  round(tot / CAST(days AS DOUBLE), 6) AS baseline,
             |  round(cnt - tot / CAST(days AS DOUBLE), 6) AS residual
             |FROM hh JOIN prof USING (hod)
             |ORDER BY residual DESC, hour_epoch LIMIT 15""".stripMargin)),

    // Engine-added — autocorrelation function of the hourly series at lags
    // 1..24 (the classic seasonality diagnostic behind the reference's
    // hour-of-day profiles; pandas Series.autocorr(lag)). Per-lag Pearson
    // over an hour-shifted equi-join of the AGGREGATED series (one row per
    // hour — bounded by the time range, so the 24× fan-out is 24×720 rows
    // at any event volume). All moments are exact integer sums; the final
    // correlation is a pure IEEE chain (·, −, /, sqrt) on identical
    // integers, so Spark and DuckDB agree bit-for-bit before round(6).
    "w22_acf" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(expr(s"ts_ns div $hourNs").as("hour_idx"))
          .agg(count(lit(1)).as("cnt"))
        val lags = s.range(1, 25).select(col("id").as("lag"))
        val x = hourly.select(col("hour_idx"), col("cnt").as("xv"))
        val y = hourly.select(col("hour_idx").as("y_idx"), col("cnt").as("yv"))
        val m = x.join(broadcast(lags))
          .join(y, col("hour_idx") + col("lag") === col("y_idx"))
          .groupBy("lag").agg(
            count(lit(1)).as("n"),
            sum("xv").as("sx"), sum("yv").as("sy"),
            sum(col("xv") * col("yv")).as("sxy"),
            sum(col("xv") * col("xv")).as("sxx"),
            sum(col("yv") * col("yv")).as("syy"))
        m.select(col("lag"), col("n").as("n_pairs"),
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
                * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
              .as("acf"))
          .orderBy("lag")
      },
      Some(s"""WITH h AS (SELECT epoch_ns(ts) // $hourNs AS hour_idx, count(*) AS cnt
             |  FROM events GROUP BY 1),
             |lags AS (SELECT unnest(generate_series(1, 24)) AS lag),
             |p AS (SELECT l.lag, x.cnt AS xv, y.cnt AS yv
             |  FROM h x CROSS JOIN lags l JOIN h y ON y.hour_idx = x.hour_idx + l.lag),
             |s AS (SELECT lag, count(*) AS n,
             |    CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
             |    CAST(sum(xv * yv) AS BIGINT) AS sxy,
             |    CAST(sum(xv * xv) AS BIGINT) AS sxx,
             |    CAST(sum(yv * yv) AS BIGINT) AS syy
             |  FROM p GROUP BY 1)
             |SELECT lag, n AS n_pairs,
             |  round(CAST(n * sxy - sx * sy AS DOUBLE)
             |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             |      * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS acf
             |FROM s ORDER BY lag""".stripMargin)),

    // Engine-added — CUSUM changepoint detection on the hourly series: the
    // point where the cumulative sum of mean-residuals peaks splits the
    // series into maximally-different halves (the classic single-changepoint
    // statistic). Residuals are kept integer by scaling: r_t = cnt_t·T −
    // total (T hours, total events), so the running sum, the argmax, and
    // the pre/post splits are all exact integer arithmetic both engines
    // reproduce bit-for-bit. The running sum is a bounded window over the
    // AGGREGATED series (one row per hour — w13's argument) with a
    // non-foldable constant partition key; the (total, T) scalar rides the
    // plan broadcast.
    "w23_cusum_changepoint" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(expr(s"ts_ns div $hourNs").as("hour_idx"))
          .agg(count(lit(1)).as("cnt"))
        val tot = hourly.agg(sum("cnt").as("total"), count(lit(1)).as("nh"))
        val one = coalesce(pmod(col("hour_idx"), lit(1)), lit(0))
        val w = Window.partitionBy(one).orderBy("hour_idx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cus = hourly.crossJoin(broadcast(tot))
          .withColumn("cusum", sum(col("cnt") * col("nh") - col("total")).over(w))
        val cp = cus.orderBy(abs(col("cusum")).desc, col("hour_idx")).limit(1)
          .select(col("hour_idx").as("cph"), abs(col("cusum")).as("mx"))
        hourly.crossJoin(broadcast(cp))
          .groupBy("cph", "mx")
          .agg(
            count(when(col("hour_idx") <= col("cph"), 1)).as("n_pre"),
            count(when(col("hour_idx") > col("cph"), 1)).as("n_post"),
            round(sum(when(col("hour_idx") <= col("cph"), col("cnt"))).cast("double")
              / count(when(col("hour_idx") <= col("cph"), 1)), 6).as("pre_mean"),
            round(sum(when(col("hour_idx") > col("cph"), col("cnt"))).cast("double")
              / count(when(col("hour_idx") > col("cph"), 1)), 6).as("post_mean"))
          .select((col("cph") * 3600L).as("cp_hour_epoch"), col("mx").as("max_abs_cusum"),
            col("n_pre"), col("n_post"), col("pre_mean"), col("post_mean"))
      },
      Some(s"""WITH h AS (SELECT epoch_ns(ts) // $hourNs AS hour_idx, count(*) AS cnt
             |  FROM events GROUP BY 1),
             |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS nh FROM h),
             |c AS (SELECT hour_idx,
             |    CAST(sum(cnt * nh - total) OVER (ORDER BY hour_idx) AS BIGINT) AS cusum
             |  FROM h CROSS JOIN t),
             |cp AS (SELECT hour_idx AS cph, abs(cusum) AS mx FROM c
             |  ORDER BY abs(cusum) DESC, hour_idx LIMIT 1)
             |SELECT cph * 3600 AS cp_hour_epoch, mx AS max_abs_cusum,
             |  count(*) FILTER (WHERE hour_idx <= cph) AS n_pre,
             |  count(*) FILTER (WHERE hour_idx > cph) AS n_post,
             |  round(CAST(sum(cnt) FILTER (WHERE hour_idx <= cph) AS DOUBLE)
             |    / count(*) FILTER (WHERE hour_idx <= cph), 6) AS pre_mean,
             |  round(CAST(sum(cnt) FILTER (WHERE hour_idx > cph) AS DOUBLE)
             |    / count(*) FILTER (WHERE hour_idx > cph), 6) AS post_mean
             |FROM h CROSS JOIN cp GROUP BY 1, 2""".stripMargin)),

    // Engine-added — seasonal-naive forecast backtest: predict week 4's
    // hourly event counts as the mean of the same hour-of-week over weeks
    // 1–3, and score the forecast (MAE / RMSE / mean bias) — the sanity
    // baseline every capacity-planning forecast must beat. The error stays
    // INTEGER by scoring 3·actual against Σtrain (avoiding the mean's
    // division): err3 = |Σtrain − 3·actual|, so the sums are order-free
    // exact and the final three divisions are single IEEE ops. Hours
    // missing any of the 3 training weeks are excluded (nw = 3 guard) —
    // deterministic in both engines. Bounded post-agg frames throughout:
    // 720 hourly rows, then 168 scored hours.
    "w24_seasonal_backtest" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(expr(s"ts_ns div $hourNs").as("hour_idx"))
          .agg(count(lit(1)).as("cnt"))
        val base = hourly.agg(min("hour_idx").as("h0"))
        val rel = hourly.crossJoin(broadcast(base))
          .select(((col("hour_idx") - col("h0")) % 168).as("how"),
            expr("(hour_idx - h0) div 168").as("week"),
            col("cnt"))
        val train = rel.filter(col("week") < 3)
          .groupBy("how").agg(sum("cnt").as("strain"), count(lit(1)).as("nw"))
          .filter(col("nw") === 3)
        val test = rel.filter(col("week") === 3)
          .select(col("how"), col("cnt").as("actual"))
        train.join(test, "how")
          .select(col("how"), col("strain"), col("actual"),
            abs(col("strain") - lit(3L) * col("actual")).as("err3"),
            (col("strain") - lit(3L) * col("actual")).as("bias3"))
          .agg(count(lit(1)).as("n_hours"),
            round(sum("err3").cast("double") / lit(3.0) / count(lit(1)), 4).as("mae"),
            round(sqrt(sum(col("err3") * col("err3")).cast("double") / lit(9.0)
              / count(lit(1))), 6).as("rmse"),
            round(sum("bias3").cast("double") / lit(3.0) / count(lit(1)), 4).as("mean_bias"))
      },
      Some(s"""WITH h AS (SELECT epoch_ns(ts) // $hourNs AS hour_idx, count(*) AS cnt
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(hour_idx) AS h0 FROM h),
             |rel AS (SELECT (hour_idx - h0) % 168 AS how,
             |    (hour_idx - h0) // 168 AS week, cnt FROM h CROSS JOIN b),
             |train AS (SELECT how, CAST(sum(cnt) AS BIGINT) AS strain,
             |    count(*) AS nw FROM rel WHERE week < 3 GROUP BY 1
             |  HAVING count(*) = 3),
             |test AS (SELECT how, cnt AS actual FROM rel WHERE week = 3),
             |e AS (SELECT t.how, strain, actual,
             |    abs(strain - 3 * actual) AS err3,
             |    strain - 3 * actual AS bias3
             |  FROM train t JOIN test USING (how))
             |SELECT count(*) AS n_hours,
             |  round(CAST(sum(err3) AS DOUBLE) / 3.0 / count(*), 4) AS mae,
             |  round(sqrt(CAST(sum(err3 * err3) AS DOUBLE) / 9.0 / count(*)), 6) AS rmse,
             |  round(CAST(sum(bias3) AS DOUBLE) / 3.0 / count(*), 4) AS mean_bias
             |FROM e""".stripMargin)),

    // Engine-added — position-based multi-touch attribution (the 40/20/40
    // U-shape rule): each purchase distributes 1000 milli-credits over the
    // clicks in its preceding 24 h — first touch 400, last touch 400,
    // middles split 200 by truncating division with the remainder going to
    // the EARLIEST middles (an explicit deterministic rule, because 200
    // rarely divides evenly). Credits are integers end-to-end, so per-
    // channel totals are order-free exact. The click↔purchase match is a
    // per-user equi-join (clicks per user bounded); the position rank runs
    // PARTITIONED BY PURCHASE — never an unpartitioned window. Channels
    // derive from the JSON props (the f5 path).
    "w25_attribution" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ns").as("cts"), col("event_id").as("cid"),
            element_at(array(lit("ads"), lit("email"), lit("search"), lit("social")),
              (pmod(col("k"), lit(4L)) + 1).cast("int")).as("channel"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ns").as("pts"), col("event_id").as("pid"))
        val touches = purchases.join(clicks, "user_id")
          .filter(col("cts") <= col("pts") && col("cts") > col("pts") - lit(86400L * 1000000000L))
        val wRank = Window.partitionBy("pid").orderBy(col("cts"), col("cid"))
        val wCnt = Window.partitionBy("pid")
        val credited = touches
          .withColumn("pos", row_number().over(wRank))
          .withColumn("ntouch", count(lit(1)).over(wCnt))
          .withColumn("credit",
            when(col("ntouch") === 1, 1000L)
              .when(col("ntouch") === 2, 500L)
              .when(col("pos") === 1, 400L)
              .when(col("pos") === col("ntouch"), 400L)
              .otherwise(expr("200 div (ntouch - 2)") +
                when(col("pos") - 1 <= expr("200 % (ntouch - 2)"), 1L).otherwise(0L)))
        credited.groupBy("channel")
          .agg(count(lit(1)).as("n_touches"),
            countDistinct("pid").as("n_purchases"),
            sum("credit").as("credit_milli"))
          .withColumn("credit", round(col("credit_milli").cast("double") / 1000.0, 3))
          .drop("credit_milli")
          .orderBy("channel")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns,
             |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |  FROM events),
             |clicks AS (SELECT user_id, ts_ns AS cts, event_id AS cid,
             |    (['ads', 'email', 'search', 'social'])[CAST(k % 4 AS INT) + 1] AS channel
             |  FROM ev WHERE event_type = 'click'),
             |purch AS (SELECT user_id, ts_ns AS pts, event_id AS pid
             |  FROM ev WHERE event_type = 'purchase'),
             |touches AS (SELECT pid, cid, cts, channel
             |  FROM purch JOIN clicks USING (user_id)
             |  WHERE cts <= pts AND cts > pts - 86400000000000),
             |ranked AS (SELECT pid, channel,
             |    row_number() OVER (PARTITION BY pid ORDER BY cts, cid) AS pos,
             |    count(*) OVER (PARTITION BY pid) AS ntouch
             |  FROM touches),
             |cr AS (SELECT pid, channel,
             |    CASE WHEN ntouch = 1 THEN 1000
             |         WHEN ntouch = 2 THEN 500
             |         WHEN pos = 1 THEN 400
             |         WHEN pos = ntouch THEN 400
             |         ELSE 200 // (ntouch - 2)
             |           + CASE WHEN pos - 1 <= 200 % (ntouch - 2) THEN 1 ELSE 0 END
             |    END AS credit
             |  FROM ranked)
             |SELECT channel, count(*) AS n_touches,
             |  count(DISTINCT pid) AS n_purchases,
             |  round(CAST(sum(credit) AS DOUBLE) / 1000.0, 3) AS credit
             |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Engine-added — stream-completeness gap detection: which (event_type,
    // hour) cells inside the corpus time span saw ZERO events, and how long
    // are the silent runs — the monitor a pipeline owner checks before
    // trusting any downstream hourly metric. The expected grid explodes
    // from the 1-row bounds frame (≤ span-hours × |types| — bounded by TIME
    // RANGE, not volume), observed cells leave via anti join, and runs
    // group by the classic h − row_number() island key, windowed PER TYPE
    // over grid-bounded rows. Types with no gaps still report (zeros, −1).
    "w27_gap_detection" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type").as("t"), expr(s"ts_ns div $hourNs").as("h"))
        val obs = ev.distinct()
        val bounds = ev.agg(min("h").as("h0"), max("h").as("h1"))
        val hours = bounds.select(explode(sequence(col("h0"), col("h1"))).as("h"), col("h0"))
        val types = ev.select("t").distinct()
        val missing = hours.crossJoin(broadcast(types))
          .join(obs, Seq("t", "h"), "left_anti")
        val wrn = Window.partitionBy("t").orderBy("h")
        val runs = missing
          .withColumn("grp", col("h") - row_number().over(wrn))
          .groupBy("t", "grp")
          .agg(count(lit(1)).as("len"), min(col("h") - col("h0")).as("start"))
        val agg = runs.groupBy("t")
          .agg(sum("len").as("n_missing"), count(lit(1)).as("n_runs"),
            max("len").as("longest_run"), min("start").as("first_missing"))
        types.join(agg, Seq("t"), "left")
          .select(col("t").as("event_type"),
            coalesce(col("n_missing"), lit(0L)).as("n_missing"),
            coalesce(col("n_runs"), lit(0L)).as("n_runs"),
            coalesce(col("longest_run"), lit(0L)).as("longest_run"),
            coalesce(col("first_missing"), lit(-1L)).as("first_missing"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (SELECT event_type AS t, epoch_ns(ts) // $hourNs AS h
             |  FROM events),
             |obs AS (SELECT DISTINCT t, h FROM ev),
             |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
             |hours AS (SELECT unnest(generate_series(h0, h1)) AS h, h0 FROM b),
             |types AS (SELECT DISTINCT t FROM ev),
             |miss AS (SELECT g.t, g.h, g.h0
             |  FROM (SELECT t, h, h0 FROM hours CROSS JOIN types) g
             |  ANTI JOIN obs ON obs.t = g.t AND obs.h = g.h),
             |runs AS (SELECT t, h - row_number() OVER (PARTITION BY t ORDER BY h) AS grp,
             |    h, h0 FROM miss),
             |ra AS (SELECT t, grp, count(*) AS len, min(h - h0) AS start
             |  FROM runs GROUP BY 1, 2),
             |agg AS (SELECT t, CAST(sum(len) AS BIGINT) AS n_missing,
             |    count(*) AS n_runs, CAST(max(len) AS BIGINT) AS longest_run,
             |    min(start) AS first_missing
             |  FROM ra GROUP BY 1)
             |SELECT types.t AS event_type, coalesce(n_missing, 0) AS n_missing,
             |  coalesce(n_runs, 0) AS n_runs, coalesce(longest_run, 0) AS longest_run,
             |  coalesce(first_missing, -1) AS first_missing
             |FROM types LEFT JOIN agg ON agg.t = types.t
             |ORDER BY 1""".stripMargin)),

    // Engine-added — EWMA smoothing + deviation alerts over the hourly
    // event-rate series (the monitoring primitive behind every ops
    // dashboard): ŝᵢ = (7·ŝᵢ₋₁ + 1000·xᵢ) div 8 — α = ⅛ as EXACT
    // truncating integer arithmetic in milli-units, so the inherently
    // sequential recurrence is bit-reproducible cross-engine (no float
    // accumulation drift, ever). The series spine (zero-filled from the
    // bounds frame) is bounded by TIME RANGE, not event volume — so folding
    // it through one `aggregate` HOF on a single row is the legitimate
    // bounded-series move (the w13 argument), while the data-proportional
    // work stays in the hash aggregate below it. Alert when the raw rate
    // deviates from the prior smoothed baseline by more than 50%
    // (2·|xᵢ·1000 − ŝᵢ₋₁| > ŝᵢ₋₁). Oracle: the same recurrence as a
    // DuckDB recursive CTE over the row-indexed spine.
    "w28_ewma" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(expr(s"ts_ns div $hourNs").as("h"))
        val hourly = ev.groupBy("h").agg(count(lit(1)).as("cnt"))
        val b = ev.agg(min("h").as("h0"), max("h").as("h1"))
        val ser = b.select(explode(sequence(col("h0"), col("h1"))).as("h"))
          .join(hourly, Seq("h"), "left")
          .select(col("h"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        // Native linear fold (graft.functions.EwmaSeq): the HOF
        // aggregate/array_append accumulator was Θ(hours²) — array copied
        // per step — and the sf10 whale read it at 72.7× per data decade.
        // Same integer arithmetic, same output rows, one pass.
        ser.agg(sort_array(collect_list(struct(col("h"), col("cnt")))).as("xs"))
          .select(explode(graft.functions.EwmaExpr.ewmaSeq(col("xs"))).as("y"))
          .select((col("y.h") * 3600L).as("hour_epoch"), col("y.cnt").as("cnt"),
            col("y.ew").as("ew_milli"),
            (col("y.cnt") * 1000L - col("y.prev")).as("resid_milli"),
            when(abs(col("y.cnt") * 1000L - col("y.prev")) * 2 > col("y.prev"), 1L)
              .otherwise(0L).as("alert"))
          .orderBy("hour_epoch")
      },
      Some(s"""WITH RECURSIVE ev AS (SELECT epoch_ns(ts) // $hourNs AS h FROM events),
             |hourly AS (SELECT h, count(*) AS cnt FROM ev GROUP BY 1),
             |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
             |spine AS (SELECT unnest(generate_series(h0, h1)) AS h, h0 FROM b),
             |ser AS (SELECT spine.h, coalesce(cnt, 0) AS cnt, spine.h - h0 + 1 AS i
             |  FROM spine LEFT JOIN hourly ON hourly.h = spine.h),
             |ew AS (SELECT i, h, cnt, cnt * 1000 AS ew, cnt * 1000 AS prev
             |    FROM ser WHERE i = 1
             |  UNION ALL
             |  SELECT s.i, s.h, s.cnt, (7 * e.ew + s.cnt * 1000) // 8, e.ew
             |    FROM ser s JOIN ew e ON s.i = e.i + 1)
             |SELECT h * 3600 AS hour_epoch, cnt, ew AS ew_milli,
             |  cnt * 1000 - prev AS resid_milli,
             |  CAST(CASE WHEN 2 * abs(cnt * 1000 - prev) > prev
             |    THEN 1 ELSE 0 END AS BIGINT) AS alert
             |FROM ew ORDER BY 1""".stripMargin))
  )
}
