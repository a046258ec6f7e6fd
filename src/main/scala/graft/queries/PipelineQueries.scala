package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.pipelines.Pipelines

/** End-to-end lab pipelines as single queries. lab1, lab3, and lab4 are
  * deterministic compositions of oracle-checked operators, so the composed
  * runs get exact DuckDB oracles too (DBSCAN/SSSP via recursive CTEs —
  * same fragments as the m1/g2/g3 component oracles). lab2 embeds a GBT
  * fit, which isn't DuckDB-expressible — it emits an oracle-checkable
  * verdict row instead (exact split sizes + MlBands booleans). */
object PipelineQueries extends QueryCatalog {

  def defs: Map[String, QueryDef] = Map(

    "lab1_noise_hotspots" -> QueryDef(
      (s, dir) => Pipelines.noiseHotspots(s, dir),
      Some("""WITH RECURSIVE ev AS (
             |  SELECT event_id, epoch_ns(ts) AS ts_ns FROM events WHERE event_type = 'error'),
             |cells AS (
             |  SELECT event_id AS id,
             |         -74.3 + ((event_id * 7919) % 6000) / 10000.0 AS x,
             |         40.5 + ((event_id * 104729) % 5000) / 10000.0 AS y
             |  FROM ev
             |  WHERE -74.3 + ((event_id * 7919) % 6000) / 10000.0 BETWEEN -74.3 AND -73.7
             |    AND 40.5 + ((event_id * 104729) % 5000) / 10000.0 BETWEEN 40.5 AND 41.0),
             |g AS (SELECT id, x, y,
             |    CAST(floor(x / 0.017) AS BIGINT) AS cx,
             |    CAST(floor(y / 0.017) AS BIGINT) AS cy FROM cells),
             |pairs AS (
             |  SELECT a.id AS aid, b.id AS bid
             |  FROM g a JOIN g b
             |    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
             |   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
             |   AND (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y) <= 0.017*0.017),
             |cores AS (SELECT aid AS id FROM pairs GROUP BY aid HAVING count(*) >= 5),
             |core_edges AS (
             |  SELECT p.aid AS src, p.bid AS dst FROM pairs p
             |  JOIN cores ca ON ca.id = p.aid JOIN cores cb ON cb.id = p.bid),
             |reach(id, lbl) AS (
             |  SELECT id, id FROM cores
             |  UNION
             |  SELECT e.dst, r.lbl FROM reach r JOIN core_edges e ON e.src = r.id),
             |labels AS (SELECT id, min(lbl) AS label FROM reach GROUP BY id),
             |border AS (
             |  SELECT p.aid AS id, min(l.label) AS label
             |  FROM pairs p JOIN labels l ON l.id = p.bid
             |  WHERE p.aid NOT IN (SELECT id FROM cores)
             |  GROUP BY p.aid),
             |final AS (
             |  SELECT c.id, coalesce(a.label, -1) AS label
             |  FROM cells c LEFT JOIN (SELECT * FROM labels UNION ALL SELECT * FROM border) a USING (id)),
             |sizes AS (SELECT label, count(*) AS n FROM final GROUP BY label),
             |clus AS (
             |  SELECT CAST(sum(CASE WHEN label >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clusters,
             |    CAST(coalesce(sum(CASE WHEN label = -1 THEN n END), 0) AS BIGINT) AS n_noise,
             |    CAST(sum(n) AS BIGINT) AS n_points,
             |    CAST(coalesce(max(CASE WHEN label >= 0 THEN n END), 0) AS BIGINT) AS max_cluster_size
             |  FROM sizes),
             |h AS (SELECT ts_ns // 3600000000000 AS hour_idx, count(*) AS cnt FROM ev GROUP BY 1),
             |anom AS (SELECT hour_idx, cnt
             |  FROM h, (SELECT avg(cnt) m, stddev_samp(cnt) sd FROM h) s
             |  WHERE cnt > m + 2.0 * sd),
             |sess AS (SELECT hour_idx, cnt,
             |  sum(CASE WHEN prev IS NULL OR hour_idx - prev <= 1 THEN 0 ELSE 1 END)
             |    OVER (ORDER BY hour_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM (SELECT hour_idx, cnt, lag(hour_idx) OVER (ORDER BY hour_idx) AS prev FROM anom)),
             |per AS (SELECT session_id, max(cnt) AS max_count FROM sess GROUP BY session_id),
             |periods AS (SELECT CAST(count(*) AS BIGINT) AS n_periods,
             |    CAST(coalesce(max(max_count), 0) AS BIGINT) AS peak_hourly_count FROM per),
             |hod AS (SELECT (ts_ns // 3600000000000) % 24 AS hod, count(*) AS cnt FROM ev GROUP BY 1),
             |peak AS (SELECT hod AS peak_hour FROM hod ORDER BY cnt DESC, hod DESC LIMIT 1)
             |SELECT * FROM clus, periods, peak""".stripMargin)),

    "lab2_trip_duration" -> QueryDef((s, dir) => Pipelines.tripDuration(s, dir),
      // The GBT fit itself isn't DuckDB-expressible; the verdict row is
      // (m12 pattern): exact hash-split sizes + in-engine band booleans.
      Some("""SELECT
             |  CAST(sum(CASE WHEN (l_orderkey * 2654435761) % 100 >= 70 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
             |  CAST(sum(CASE WHEN (l_orderkey * 2654435761) % 100 < 70 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             |  true AS mae_ok, true AS rmse_ok, true AS r2_ok
             |FROM lineitem""".stripMargin)),

    "lab3_road_network" -> QueryDef(
      (s, dir) => Pipelines.roadNetwork(s, dir),
      Some("""WITH RECURSIVE nn AS (SELECT count(*) AS n FROM supplier),
             |e0 AS (SELECT s_suppkey AS src, (s_suppkey + 1) % nn.n AS dst FROM supplier, nn
             |  UNION ALL SELECT s_suppkey, (s_suppkey + 7) % nn.n FROM supplier, nn
             |  UNION ALL SELECT s_suppkey, (s_suppkey * 3 + 1) % nn.n FROM supplier, nn),
             |edges AS (SELECT src, dst, (src * 7 + dst * 13) % 20 + 1 AS w FROM e0),
             |deg AS (SELECT id, count(*) AS degree FROM (
             |    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges) GROUP BY 1),
             |degstats AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             |    round(avg(degree), 4) AS avg_degree,
             |    CAST(max(degree) AS BIGINT) AS max_degree FROM deg),
             |walk(id, dist, depth) AS (
             |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
             |  UNION ALL
             |  SELECT e.dst, walk.dist + e.w, walk.depth + 1
             |  FROM walk JOIN edges e ON e.src = walk.id WHERE walk.depth < 8),
             |sp AS (SELECT id, min(dist) AS dist FROM walk GROUP BY 1),
             |spstats AS (SELECT CAST(count(*) AS BIGINT) AS n_reached,
             |    CAST(max(dist) AS BIGINT) AS max_dist FROM sp),
             |iso AS (SELECT CAST(count(*) AS BIGINT) AS n_isochrone FROM sp WHERE dist <= 30)
             |SELECT * FROM degstats, spstats, iso""".stripMargin)),

    "lab4_review_sentiment" -> QueryDef(
      (s, dir) => Pipelines.reviewSentiment(s, dir),
      Some(s"""WITH ${graft.sources.Lexicon.scoringSql},
             |dt AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
             |       FROM documents),
             |perdoc AS (SELECT doc_id, source, avg(score) AS polarity
             |  FROM dt LEFT JOIN lex USING (tok) GROUP BY 1, 2),
             |persrc AS (SELECT source, count(*) AS n_docs,
             |    round(avg(polarity), 6) AS avg_polarity,
             |    round(avg(CASE WHEN polarity > 0.1 THEN 1.0 ELSE 0.0 END), 6) AS positive_rate
             |  FROM perdoc GROUP BY 1),
             |ranked AS (SELECT source,
             |    round(avg_polarity * 0.7 + positive_rate * 0.3, 6) AS score,
             |    avg_polarity FROM persrc)
             |SELECT count(*) AS n_sources,
             |  (SELECT source FROM ranked ORDER BY score DESC, source LIMIT 1) AS top_source,
             |  round(max(score), 6) AS top_score,
             |  round(avg(avg_polarity), 6) AS corpus_polarity
             |FROM ranked""".stripMargin))
  )
}
