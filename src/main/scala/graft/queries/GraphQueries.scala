package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.core.Tables
import graft.graph.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Road-network analysis (SURVEY.md §2.9 M14–M19) over a deterministic
  * synthetic graph derived from the supplier table: node k connects to
  * (k+1)%n, (k+7)%n, (k·3+1)%n with integer weight (src·7+dst·13)%20+1.
  * Node coordinates come from Tables.withSyntheticPoint, so a SQL oracle
  * reproduces the exact graph — while the algorithms (iterative SSSP,
  * segment clipping) are the real distributed implementations.
  */
object GraphQueries extends QueryCatalog {

  /** edges(src, dst, w) from the supplier table; n = |suppliers|. */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(s, dir).select(col("s_suppkey").as("k"))
    val n = supp.agg(count(lit(1)).as("n"))
    val base = supp.crossJoin(broadcast(n))
    Seq(col("k") + 1, col("k") + 7, col("k") * 3 + 1)
      .map(d => base.select(col("k").as("src"), pmod(d, col("n")).as("dst")))
      .reduce(_ unionByName _)
      .withColumn("w", pmod(col("src") * 7 + col("dst") * 13, lit(20L)) + 1)
  }

  /** Shared lab-3 frames (round 13): the map document (sources.MapDocs)
    * renders FROM these exact builders, so every coordinate/number it
    * embeds is the output of an oracle-checked plan — the same split as
    * StatPanel/MapPanel. Each is the body its declared query aggregates. */

  /** g2b's route polyline frame: (seq, id, lon, lat) in route order. */
  private[graft] def routeVertices(s: SparkSession, dir: String): DataFrame = {
    val rt = GraphOps.routes(edges(s, dir), 0L, 8)
    val dest = rt.agg(max("id").as("dest"))
    val nodes = Tables.withSyntheticPoint(
      Tables.supplier(s, dir).select(col("s_suppkey").as("id")), "id")
    rt.join(broadcast(dest), col("id") === col("dest"))
      .select(posexplode(col("path")))
      .select((col("pos") + 1).cast("long").as("seq"), col("col").as("id"))
      .join(nodes, "id")
      .select(col("seq"), col("id"),
        round(col("lon"), 6).as("lon"), round(col("lat"), 6).as("lat"))
      .orderBy("seq")
  }

  /** g3/g3b's reachable-node frame: (id, dist, lon, lat), cost ≤ 30. */
  private[graft] def reachNodes(s: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.withSyntheticPoint(
      Tables.supplier(s, dir).select(col("s_suppkey").as("id")), "id")
    GraphOps.reachable(edges(s, dir), 0L, 30L, 8).join(nodes, "id")
  }

  /** g7's per-POI frame: (poi_id, tag, lon, lat, acc ∈ {0,1}). */
  private[graft] def poiPoints(s: SparkSession, dir: String): DataFrame = {
    val eps = 0.02
    val tags = Seq("school", "hospital", "park", "shop")
    val pois = Tables.withSyntheticPoint(
        Tables.part(s, dir).select(col("p_partkey").as("poi_id")), "poi_id")
      .withColumn("tag", element_at(
        array(tags.map(lit): _*), (pmod(col("poi_id"), lit(4L)) + 1).cast("int")))
    val reach = reachNodes(s, dir)
    val rcells = reach
      .withColumn("cx", explode(array(
        floor(col("lon") / eps) - 1, floor(col("lon") / eps), floor(col("lon") / eps) + 1)))
      .withColumn("cy", explode(array(
        floor(col("lat") / eps) - 1, floor(col("lat") / eps), floor(col("lat") / eps) + 1)))
      .select(col("cx"), col("cy"), col("lon").as("nlon"), col("lat").as("nlat"))
    val pcells = pois
      .withColumn("cx", floor(col("lon") / eps))
      .withColumn("cy", floor(col("lat") / eps))
    val accessible = pcells.join(rcells, Seq("cx", "cy"))
      .filter(pow(col("lon") - col("nlon"), 2)
        + pow(col("lat") - col("nlat"), 2) <= eps * eps)
      .select("poi_id").distinct()
    pois.join(accessible.withColumn("acc", lit(1L)), Seq("poi_id"), "left")
      .select(col("poi_id"), col("tag"), col("lon"), col("lat"),
        coalesce(col("acc"), lit(0L)).as("acc"))
  }

  /** g6's connectivity-grid frame: (cx, cy, n_nodes, degree_density). */
  private[graft] def gridCells(s: SparkSession, dir: String): DataFrame = {
    val deg = GraphOps.degrees(edges(s, dir))
    val nodes = Tables.withSyntheticPoint(
      Tables.supplier(s, dir).select(col("s_suppkey").as("id")), "id")
    nodes.join(deg, "id")
      .withColumn("cx", floor((col("lon") + lit(74.3)) / 0.1))
      .withColumn("cy", floor((col("lat") - lit(40.5)) / 0.1))
      .groupBy("cx", "cy")
      .agg(count(lit(1)).as("n_nodes"),
        round(sum("degree") / lit(0.01), 4).as("degree_density"))
      .orderBy("cx", "cy")
  }

  private val edgesSql: String =
    """nn AS (SELECT count(*) AS n FROM supplier),
      |e0 AS (SELECT s_suppkey AS src, (s_suppkey + 1) % nn.n AS dst FROM supplier, nn
      |  UNION ALL SELECT s_suppkey, (s_suppkey + 7) % nn.n FROM supplier, nn
      |  UNION ALL SELECT s_suppkey, (s_suppkey * 3 + 1) % nn.n FROM supplier, nn),
      |edges AS (SELECT src, dst, (src * 7 + dst * 13) % 20 + 1 AS w FROM e0)""".stripMargin

  def defs: Map[String, QueryDef] = Map(

    // M17 — node degree distribution (reference G.degree() + endpoint/
    // middle/intersection shares, …bounds_analysis.ipynb:168, 352-358).
    "g1_degree_dist" -> QueryDef(
      (s, dir) => GraphOps.degrees(edges(s, dir))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree"),
      Some(s"""WITH $edgesSql,
              |deg AS (SELECT id, count(*) AS degree FROM (
              |    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
              |  GROUP BY 1)
              |SELECT degree, count(*) AS n_nodes FROM deg
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // M14 — single-source shortest path (reference nx.shortest_path,
    // …network_analysis.ipynb:320-324): iterative Bellman-Ford rounds on
    // DataFrames (8 rounds ≡ min cost over ≤8-edge paths; converges early
    // when a round improves nothing). Oracle: bounded recursive CTE.
    "g2_sssp" -> QueryDef(
      (s, dir) => GraphOps.sssp(edges(s, dir), 0L, 8)
        .orderBy("dist", "id").limit(20)
        .select(col("id"), col("dist")),
      Some(s"""WITH RECURSIVE $edgesSql,
              |walk(id, dist, depth) AS (
              |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
              |  UNION ALL
              |  SELECT e.dst, walk.dist + e.w, walk.depth + 1
              |  FROM walk JOIN edges e ON e.src = walk.id WHERE walk.depth < 8)
              |SELECT id, min(dist) AS dist FROM walk
              |GROUP BY 1 ORDER BY dist, id LIMIT 20""".stripMargin)),

    // M14 (complete) — the route POLYLINE itself (reference plots the
    // nx.shortest_path node list as route_lons/route_lats,
    // …network_analysis.ipynb cell 4, and folium draws the same polyline):
    // bounded Bellman-Ford carrying (dist, path) state with lexicographic
    // struct-min relaxation (GraphOps.routes), destination = the highest
    // node id the 8-round horizon touches, one row per route vertex in
    // order. Oracle: the same ≤8-edge walk enumeration as g2 extended with
    // a path list; DuckDB's ORDER BY dist, path reproduces the engine's
    // struct-min tie-break exactly (both order arrays lexicographically).
    "g2b_route" -> QueryDef(
      (s, dir) => routeVertices(s, dir),
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("id")
        s"""WITH RECURSIVE $edgesSql,
           |walk(id, dist, depth, path) AS (
           |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0, [CAST(0 AS BIGINT)]
           |  UNION ALL
           |  SELECT e.dst, walk.dist + e.w, walk.depth + 1,
           |    list_append(walk.path, e.dst)
           |  FROM walk JOIN edges e ON e.src = walk.id WHERE walk.depth < 8),
           |dest AS (SELECT max(id) AS d FROM walk),
           |best AS (SELECT path FROM walk, dest WHERE id = dest.d
           |         ORDER BY dist, path LIMIT 1),
           |rt AS (SELECT CAST(u.seq AS BIGINT) AS seq, path[u.seq] AS id
           |       FROM best, unnest(generate_series(1, len(path))) AS u(seq)),
           |pts AS (SELECT s_suppkey AS id, $lonSql AS lon, $latSql AS lat FROM supplier)
           |SELECT seq, id, round(lon, 6) AS lon, round(lat, 6) AS lat
           |FROM rt JOIN pts USING (id) ORDER BY seq""".stripMargin
      }),

    // M15 — isochrone reachable set (reference ego_graph radius=cutoff,
    // …network_analysis.ipynb:543-569): nodes within cost 30 of node 0 +
    // the reachable set's bounding envelope (the convex hull itself is the
    // ConvexHull aggregator, scalatest-verified — not SQL-expressible).
    "g3_isochrone" -> QueryDef(
      (s, dir) => {
        reachNodes(s, dir)
          .agg(count(lit(1)).as("n_reach"),
            round(min("lon"), 6).as("min_lon"), round(max("lon"), 6).as("max_lon"),
            round(min("lat"), 6).as("min_lat"), round(max("lat"), 6).as("max_lat"))
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("id")
        s"""WITH RECURSIVE $edgesSql,
           |walk(id, dist, depth) AS (
           |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
           |  UNION ALL
           |  SELECT e.dst, walk.dist + e.w, walk.depth + 1
           |  FROM walk JOIN edges e ON e.src = walk.id WHERE walk.depth < 8),
           |reach AS (SELECT id, min(dist) AS dist FROM walk GROUP BY 1
           |          HAVING min(dist) <= 30),
           |pts AS (SELECT s_suppkey AS id, $lonSql AS lon, $latSql AS lat FROM supplier)
           |SELECT count(*) AS n_reach,
           |  round(min(lon), 6) AS min_lon, round(max(lon), 6) AS max_lon,
           |  round(min(lat), 6) AS min_lat, round(max(lat), 6) AS max_lat
           |FROM reach JOIN pts USING (id)""".stripMargin
      }),

    // M15 (complete) — the isochrone POLYGON itself (reference returns the
    // convex hull of the reachable set, …network_analysis.ipynb:543-569):
    // reachable nodes ≤ cost 30 → ConvexHull aggregator → vertex count,
    // shoelace area, perimeter. Oracle: gift-wrapping (Jarvis march) as a
    // recursive CTE — from the lowest point, repeatedly take the vertex all
    // remaining points lie left of, stopping when the walk would re-enter
    // the start; identical strict-hull vertex set as the monotone chain in
    // generic position. Doubles round to 6dp (engine sums sequentially,
    // SQL per-group — ulp-level difference only).
    "g3b_isochrone_hull" -> QueryDef(
      (s, dir) => {
        reachNodes(s, dir)
          .agg(count(lit(1)).as("n_reach"),
            graft.spatial.ConvexHull.convexHullStats(col("lon"), col("lat")).as("h"))
          .select(col("n_reach"),
            col("h.n_vertices").as("n_vertices"),
            round(col("h.area"), 8).as("hull_area"),
            round(col("h.perimeter"), 6).as("hull_perimeter"))
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("id")
        s"""WITH RECURSIVE $edgesSql,
           |walk(id, dist, depth) AS (
           |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
           |  UNION ALL
           |  SELECT e.dst, walk.dist + e.w, walk.depth + 1
           |  FROM walk JOIN edges e ON e.src = walk.id WHERE walk.depth < 8),
           |reach AS (SELECT id, min(dist) AS dist FROM walk GROUP BY 1
           |          HAVING min(dist) <= 30),
           |ptsrc AS (SELECT s_suppkey AS id, $lonSql AS lon, $latSql AS lat FROM supplier),
           |rp AS (SELECT id, lon, lat FROM reach JOIN ptsrc USING (id)),
           |pts AS (SELECT DISTINCT lon AS x, lat AS y FROM rp),
           |start AS (SELECT x, y FROM pts ORDER BY y, x LIMIT 1),
           |hw(step, cx, cy) AS (
           |  SELECT 0, x, y FROM start
           |  UNION ALL
           |  SELECT h.step + 1, q.x, q.y
           |  FROM hw h JOIN pts q
           |    ON NOT (q.x = h.cx AND q.y = h.cy)
           |  WHERE h.step < 200
           |    AND NOT (h.step > 0 AND q.x = (SELECT x FROM start)
           |                        AND q.y = (SELECT y FROM start))
           |    AND NOT EXISTS (SELECT 1 FROM pts r
           |      WHERE NOT (r.x = h.cx AND r.y = h.cy)
           |        AND NOT (r.x = q.x AND r.y = q.y)
           |        AND ((q.x - h.cx) * (r.y - h.cy) - (q.y - h.cy) * (r.x - h.cx) < 0
           |          OR ((q.x - h.cx) * (r.y - h.cy) - (q.y - h.cy) * (r.x - h.cx) = 0
           |            AND (r.x-h.cx)*(r.x-h.cx) + (r.y-h.cy)*(r.y-h.cy)
           |              > (q.x-h.cx)*(q.x-h.cx) + (q.y-h.cy)*(q.y-h.cy))))),
           |seq AS (SELECT step, cx, cy,
           |    coalesce(lead(cx) OVER (ORDER BY step), (SELECT x FROM start)) AS nx,
           |    coalesce(lead(cy) OVER (ORDER BY step), (SELECT y FROM start)) AS ny
           |  FROM hw),
           |hull AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices,
           |    round(abs(sum(cx * ny - nx * cy)) / 2, 8) AS hull_area,
           |    round(sum(sqrt((nx-cx)*(nx-cx) + (ny-cy)*(ny-cy))), 6) AS hull_perimeter
           |  FROM seq)
           |SELECT (SELECT CAST(count(*) AS BIGINT) FROM rp) AS n_reach,
           |  n_vertices, hull_area, hull_perimeter
           |FROM hull""".stripMargin
      }),

    // M18 — gridded road density with exact segment-to-cell clipping
    // (reference O(cells×edges) shapely loop, …struct_analysis.ipynb:124-220,
    // which its own markdown calls prohibitively slow): Liang-Barsky
    // parametric clip against each candidate cell from the segment's
    // bounding rectangle — an explode + equi-group, linear in segments.
    "g4_road_density" -> QueryDef(
      (s, dir) => {
        val nodes = Tables.withSyntheticPoint(
          Tables.supplier(s, dir).select(col("s_suppkey").as("id")), "id")
        val segs = edges(s, dir)
          .join(nodes.select(col("id").as("src"), col("lon").as("x1"), col("lat").as("y1")), "src")
          .join(nodes.select(col("id").as("dst"), col("lon").as("x2"), col("lat").as("y2")), "dst")
          .withColumn("len", sqrt(pow(col("x2") - col("x1"), 2) + pow(col("y2") - col("y1"), 2)))
        val cells = segs
          .select(col("*"),
            explode(sequence(
              floor((least(col("x1"), col("x2")) + lit(74.3)) / 0.1).cast("int"),
              floor((greatest(col("x1"), col("x2")) + lit(74.3)) / 0.1).cast("int"))).as("cx"))
          .select(col("*"),
            explode(sequence(
              floor((least(col("y1"), col("y2")) - lit(40.5)) / 0.1).cast("int"),
              floor((greatest(col("y1"), col("y2")) - lit(40.5)) / 0.1).cast("int"))).as("cy"))
        def slab(p1: String, p2: String, lo: org.apache.spark.sql.Column) = {
          val d = col(p2) - col(p1)
          val t0 = (lo - col(p1)) / d
          val t1 = (lo + 0.1 - col(p1)) / d
          ( when(d =!= 0, least(t0, t1)).otherwise(
              when(col(p1) >= lo && col(p1) < lo + 0.1, lit(0.0)).otherwise(lit(1.0))),
            when(d =!= 0, greatest(t0, t1)).otherwise(
              when(col(p1) >= lo && col(p1) < lo + 0.1, lit(1.0)).otherwise(lit(0.0))))
        }
        val (txMin, txMax) = slab("x1", "x2", lit(-74.3) + col("cx") * 0.1)
        val (tyMin, tyMax) = slab("y1", "y2", lit(40.5) + col("cy") * 0.1)
        cells
          .withColumn("clip",
            col("len") * greatest(lit(0.0),
              least(lit(1.0), txMax, tyMax) - greatest(lit(0.0), txMin, tyMin)))
          .filter(col("clip") > 0)
          .groupBy("cx", "cy")
          .agg(count(lit(1)).as("n_segs"), round(sum("clip"), 6).as("density"))
          .orderBy("cx", "cy")
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("s_suppkey")
        s"""WITH $edgesSql,
           |pts AS (SELECT s_suppkey AS id, $lonSql AS lon, $latSql AS lat FROM supplier),
           |segs AS (SELECT src, dst, a.lon AS x1, a.lat AS y1, b.lon AS x2, b.lat AS y2,
           |    sqrt(power(b.lon - a.lon, 2) + power(b.lat - a.lat, 2)) AS len
           |  FROM edges JOIN pts a ON a.id = src JOIN pts b ON b.id = dst),
           |cells AS (SELECT segs.*, cxl.cx, cyl.cy FROM segs,
           |  unnest(generate_series(CAST(floor((least(x1, x2) + 74.3) / 0.1) AS INT),
           |    CAST(floor((greatest(x1, x2) + 74.3) / 0.1) AS INT))) cxl(cx),
           |  unnest(generate_series(CAST(floor((least(y1, y2) - 40.5) / 0.1) AS INT),
           |    CAST(floor((greatest(y1, y2) - 40.5) / 0.1) AS INT))) cyl(cy)),
           |clipped AS (SELECT cx, cy, len * greatest(0.0,
           |    least(1.0,
           |      CASE WHEN x2 - x1 <> 0 THEN greatest((-74.3 + cx*0.1 - x1) / (x2 - x1),
           |        (-74.3 + cx*0.1 + 0.1 - x1) / (x2 - x1))
           |        WHEN x1 >= -74.3 + cx*0.1 AND x1 < -74.3 + cx*0.1 + 0.1 THEN 1.0 ELSE 0.0 END,
           |      CASE WHEN y2 - y1 <> 0 THEN greatest((40.5 + cy*0.1 - y1) / (y2 - y1),
           |        (40.5 + cy*0.1 + 0.1 - y1) / (y2 - y1))
           |        WHEN y1 >= 40.5 + cy*0.1 AND y1 < 40.5 + cy*0.1 + 0.1 THEN 1.0 ELSE 0.0 END)
           |    - greatest(0.0,
           |      CASE WHEN x2 - x1 <> 0 THEN least((-74.3 + cx*0.1 - x1) / (x2 - x1),
           |        (-74.3 + cx*0.1 + 0.1 - x1) / (x2 - x1))
           |        WHEN x1 >= -74.3 + cx*0.1 AND x1 < -74.3 + cx*0.1 + 0.1 THEN 0.0 ELSE 1.0 END,
           |      CASE WHEN y2 - y1 <> 0 THEN least((40.5 + cy*0.1 - y1) / (y2 - y1),
           |        (40.5 + cy*0.1 + 0.1 - y1) / (y2 - y1))
           |        WHEN y1 >= 40.5 + cy*0.1 AND y1 < 40.5 + cy*0.1 + 0.1 THEN 0.0 ELSE 1.0 END))
           |    AS clip
           |  FROM cells)
           |SELECT cx, cy, count(*) AS n_segs, round(sum(clip), 6) AS density
           |FROM clipped WHERE clip > 0 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // M19 — gridded degree density (reference per-cell Σ node degree /
    // cell area, …bounds_analysis.ipynb:159-214): floor-bucket groupBy.
    "g6_degree_density" -> QueryDef(
      (s, dir) => gridCells(s, dir),
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("s_suppkey")
        s"""WITH $edgesSql,
           |deg AS (SELECT id, count(*) AS degree FROM (
           |    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
           |  GROUP BY 1),
           |pts AS (SELECT s_suppkey AS id, $lonSql AS lon, $latSql AS lat FROM supplier)
           |SELECT CAST(floor((lon + 74.3) / 0.1) AS BIGINT) AS cx,
           |  CAST(floor((lat - 40.5) / 0.1) AS BIGINT) AS cy,
           |  count(*) AS n_nodes, round(sum(degree) / 0.01, 4) AS degree_density
           |FROM pts JOIN deg USING (id)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // S9/S10 — POI tag-predicate + isochrone accessibility (reference
    // ox.features_from_place(tags) at …urban_road_network_analysis.ipynb:796
    // and the POIs-within-isochrone accessibility analysis at :806-822):
    // a tagged POI layer (deterministic tags over the part table) is tested
    // for membership in the cost≤30 isochrone of node 0 — a POI is
    // "accessible" if any reachable network node lies within ε. The ε-match
    // is a 3×3 grid-cell equi-join with the expansion on the SMALL
    // (reachable) side, so the POI side scans once and never self-explodes —
    // the same candidate-bounding shape as DBSCAN's pair join.
    "g7_poi_accessibility" -> QueryDef(
      (s, dir) => poiPoints(s, dir)
        .groupBy("tag")
        .agg(count(lit(1)).as("n_pois"),
          sum("acc").as("n_accessible"),
          round(avg(col("acc").cast("double")), 6).as("access_rate"))
        .orderBy("tag"),
      Some {
        val (nodeLon, nodeLat) = Tables.syntheticPointSql("s_suppkey")
        val (poiLon, poiLat) = Tables.syntheticPointSql("p_partkey")
        s"""WITH RECURSIVE $edgesSql,
           |walk(id, dist, depth) AS (
           |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
           |  UNION ALL
           |  SELECT e.dst, walk.dist + e.w, walk.depth + 1
           |  FROM walk JOIN edges e ON e.src = walk.id WHERE walk.depth < 8),
           |reach AS (SELECT id FROM walk GROUP BY 1 HAVING min(dist) <= 30),
           |npts AS (SELECT s_suppkey AS id, $nodeLon AS lon, $nodeLat AS lat FROM supplier),
           |rp AS (SELECT lon, lat FROM reach JOIN npts USING (id)),
           |pois AS (SELECT p_partkey AS poi_id, $poiLon AS lon, $poiLat AS lat,
           |    (['school', 'hospital', 'park', 'shop'])[CAST(p_partkey % 4 AS INT) + 1] AS tag
           |  FROM part),
           |acc AS (SELECT DISTINCT p.poi_id FROM pois p JOIN rp
           |  ON power(rp.lon - p.lon, 2) + power(rp.lat - p.lat, 2) <= 0.02 * 0.02)
           |SELECT tag, count(*) AS n_pois,
           |  CAST(sum(CASE WHEN acc.poi_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_accessible,
           |  round(avg(CASE WHEN acc.poi_id IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
           |    AS access_rate
           |FROM pois LEFT JOIN acc ON pois.poi_id = acc.poi_id
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // M16 — edge speed/travel-time annotation by road class
    // (reference ox.add_edge_speeds, …network_analysis.ipynb:525-526) and
    // per-class aggregation.
    "g5_edge_speeds" -> QueryDef(
      (s, dir) => edges(s, dir)
        .withColumn("cls", pmod(col("src"), lit(4L)))
        .withColumn("speed",
          when(col("cls") === 0, 30.0).when(col("cls") === 1, 50.0)
            .when(col("cls") === 2, 80.0).otherwise(100.0))
        .withColumn("travel_time", col("w") / col("speed") * 3600)
        .groupBy("cls")
        .agg(count(lit(1)).as("n_edges"), sum("w").as("total_w"),
          round(avg("travel_time"), 4).as("avg_tt"))
        .orderBy("cls"),
      Some(s"""WITH $edgesSql,
              |ann AS (SELECT w, src % 4 AS cls,
              |    CASE src % 4 WHEN 0 THEN 30.0 WHEN 1 THEN 50.0
              |      WHEN 2 THEN 80.0 ELSE 100.0 END AS speed
              |  FROM edges)
              |SELECT cls, count(*) AS n_edges, CAST(sum(w) AS BIGINT) AS total_w,
              |  round(avg(w / speed * 3600), 4) AS avg_tt
              |FROM ann GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Engine-added — PageRank (reference computes centrality with networkx
    // in-process, …urban_road_network_analysis.ipynb; here it's the join-
    // based message-passing formulation). Integer-scaled state makes every
    // iteration bit-reproducible, so the oracle is the SAME six rounds
    // unrolled as materialized CTEs (AS MATERIALIZED: DuckDB inlines twice-
    // referenced CTEs, which would re-evaluate each round exponentially).
    "g8_pagerank" -> QueryDef(
      (s, dir) => GraphOps.pageRank(edges(s, dir), iters = 6)
        .orderBy(desc("pr"), col("id")).limit(20)
        .select(col("id"), col("pr").as("pr_scaled")),
      Some {
        val steps = (1 to 6).map { i =>
          s"""dang$i AS MATERIALIZED (SELECT CAST(coalesce(sum(p.pr), 0) AS BIGINT) AS ds
             |  FROM pr${i - 1} p LEFT JOIN outdeg o ON o.id = p.id WHERE o.id IS NULL),
             |infl$i AS MATERIALIZED (SELECT e.dst AS id,
             |    CAST(sum((p.pr * 85) // (100 * o.od)) AS BIGINT) AS s
             |  FROM pr${i - 1} p JOIN outdeg o ON o.id = p.id
             |  JOIN edges e ON e.src = p.id GROUP BY 1),
             |pr$i AS MATERIALIZED (SELECT nd.id,
             |    coalesce(f.s, 0) + (15 * 1000000000000) // (100 * nc.n)
             |      + (d.ds * 85) // (100 * nc.n) AS pr
             |  FROM nodes nd CROSS JOIN ncnt nc CROSS JOIN dang$i d
             |  LEFT JOIN infl$i f ON f.id = nd.id)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgesSql,
           |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
           |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
           |ncnt AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
           |outdeg AS MATERIALIZED (SELECT src AS id, count(*) AS od
           |  FROM edges GROUP BY 1),
           |pr0 AS MATERIALIZED (SELECT id, 1000000000000 // n AS pr
           |  FROM nodes CROSS JOIN ncnt),
           |$steps
           |SELECT id, pr AS pr_scaled FROM pr6
           |ORDER BY pr DESC, id LIMIT 20""".stripMargin
      }),

    // Engine-added — triangle counting by ordered-orientation join: the
    // undirected edge set is canonicalized to a<b, wedges are the e1(a,b)
    // ⋈ e2(b,c) equi-join (so a<b<c — each triangle counted exactly once),
    // and triangles close the wedge against a third equi-join on (a,c).
    // Orientation bounds the wedge fanout by per-node oriented degree; at
    // production scale the orientation key would be (degree, id) rather
    // than raw id, which provably minimizes Σdeg² fanout — same plan shape.
    "g9_triangles" -> QueryDef(
      (s, dir) => {
        val und = edges(s, dir)
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .filter(col("a") < col("b")).distinct()
        val wedges = und.select(col("a"), col("b").as("m"))
          .join(und.select(col("a").as("m"), col("b").as("c")), "m")
        val tri = wedges.join(
          und.select(col("a"), col("b").as("c")), Seq("a", "c"))
        und.agg(count(lit(1)).as("n_edges_und")).crossJoin(
            wedges.agg(count(lit(1)).as("n_wedges")))
          .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
          .select(col("n_edges_und"), col("n_wedges"), col("n_triangles"),
            round(col("n_triangles").cast("double") / col("n_wedges"), 6)
              .as("closure_rate"))
      },
      Some(s"""WITH $edgesSql,
              |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              |  FROM edges WHERE least(src, dst) < greatest(src, dst)),
              |wedges AS (SELECT e1.a, e1.b AS m, e2.b AS c
              |  FROM und e1 JOIN und e2 ON e1.b = e2.a),
              |tri AS (SELECT w.a FROM wedges w JOIN und e3
              |  ON e3.a = w.a AND e3.b = w.c)
              |SELECT (SELECT count(*) FROM und) AS n_edges_und,
              |  (SELECT count(*) FROM wedges) AS n_wedges,
              |  (SELECT count(*) FROM tri) AS n_triangles,
              |  round((SELECT count(*) FROM tri)
              |    / CAST((SELECT count(*) FROM wedges) AS DOUBLE), 6) AS closure_rate""".stripMargin)),

    // Engine-added — synchronous label-propagation communities (the same
    // community-detection role networkx plays in the reference's road
    // topology study). Four fixed rounds of most-frequent-neighbor-label
    // with min-label tie-break are fully deterministic, so the oracle is
    // the SAME four rounds unrolled as materialized CTEs with a
    // row_number argmax (ORDER BY c DESC, nlbl — identical tie-break).
    "g10_label_prop" -> QueryDef(
      (s, dir) => GraphOps.labelPropagation(edges(s, dir), iters = 4)
        .groupBy(col("lbl").as("community")).agg(count(lit(1)).as("csize"))
        .orderBy(desc("csize"), col("community")).limit(20),
      Some {
        val steps = (1 to 4).map { i =>
          s"""cnt$i AS MATERIALIZED (SELECT u.id, l.lbl AS nlbl, count(*) AS c
             |  FROM und u JOIN lbl${i - 1} l ON l.id = u.nbr GROUP BY 1, 2),
             |lbl$i AS MATERIALIZED (SELECT n.id, coalesce(b.nlbl, n.id) AS lbl
             |  FROM nodes n LEFT JOIN (
             |    SELECT id, nlbl FROM (SELECT id, nlbl,
             |        row_number() OVER (PARTITION BY id ORDER BY c DESC, nlbl) AS rn
             |      FROM cnt$i) WHERE rn = 1) b ON b.id = n.id)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgesSql,
           |und AS MATERIALIZED (SELECT DISTINCT id, nbr FROM (
           |  SELECT src AS id, dst AS nbr FROM edges
           |  UNION ALL SELECT dst, src FROM edges)),
           |nodes AS MATERIALIZED (SELECT DISTINCT id FROM und),
           |lbl0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes),
           |$steps
           |SELECT lbl AS community, count(*) AS csize FROM lbl4
           |GROUP BY 1 ORDER BY csize DESC, community LIMIT 20""".stripMargin
      }),

    // Engine-added — k-core peeling (k=6, two fixed cascade rounds): the
    // dense-backbone extraction the reference's road-topology study gets
    // from networkx. Two rounds on this graph already cascade hard (100 →
    // 80 → 24 nodes at sf0.01; a third empties it, which is the degenerate
    // answer — bounded peeling reports the interesting intermediate core).
    // Deterministic set-algebra per round, so the oracle is the SAME two
    // degree-filter-semijoin rounds unrolled as materialized CTEs over the
    // canonical undirected edge set.
    "g11_kcore" -> QueryDef(
      (s, dir) => {
        val core = GraphOps.kCoreEdges(edges(s, dir), k = 6, iters = 2)
        val nodes = core.select(col("a").as("id"))
          .unionByName(core.select(col("b").as("id"))).distinct()
        nodes.agg(count(lit(1)).as("n_core_nodes"),
            coalesce(sum("id"), lit(0L)).as("node_checksum"))
          .crossJoin(core.agg(count(lit(1)).as("n_core_edges")))
          .select(col("n_core_nodes"), col("n_core_edges"), col("node_checksum"))
      },
      Some {
        val steps = (1 to 2).map { i =>
          s"""deg$i AS MATERIALIZED (SELECT id, count(*) AS degree FROM (
             |    SELECT a AS id FROM und${i - 1} UNION ALL SELECT b FROM und${i - 1})
             |  GROUP BY 1),
             |keep$i AS MATERIALIZED (SELECT id FROM deg$i WHERE degree >= 6),
             |und$i AS MATERIALIZED (SELECT a, b FROM und${i - 1}
             |  WHERE a IN (SELECT id FROM keep$i) AND b IN (SELECT id FROM keep$i))""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgesSql,
           |und0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
           |    greatest(src, dst) AS b FROM edges WHERE least(src, dst) < greatest(src, dst)),
           |$steps
           |SELECT (SELECT count(*) FROM (SELECT DISTINCT id FROM (
           |    SELECT a AS id FROM und2 UNION ALL SELECT b FROM und2))) AS n_core_nodes,
           |  (SELECT count(*) FROM und2) AS n_core_edges,
           |  (SELECT CAST(coalesce(sum(id), 0) AS BIGINT) FROM (SELECT DISTINCT id FROM (
           |    SELECT a AS id FROM und2 UNION ALL SELECT b FROM und2))) AS node_checksum""".stripMargin
      }),

    // Engine-added — link prediction by common-neighbor / Jaccard scores:
    // rank the non-adjacent node pairs most likely to be connected (the
    // classic missing-road / recommendation primitive). Candidates come
    // ONLY from the two-hop join keyed on the middle node — fanout is
    // Σ deg(m)², bounded by the road graph's small max degree, never the
    // n² of scoring all pairs. Direct edges leave via an anti join on the
    // same (a,b) key; the Jaccard quantizes to integer micro-units
    // (cn·10⁶ div (da+db−cn)) so ranking is exact, and the top-20 is a
    // TakeOrderedAndProject — no global sort.
    "g12_link_prediction" -> QueryDef(
      (s, dir) => {
        val e = edges(s, dir)
        val sym = e.select(col("src"), col("dst"))
          .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
          .filter(col("src") =!= col("dst")).distinct()
        val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        val two = sym.select(col("src").as("a"), col("dst").as("m"))
          .join(sym.select(col("src").as("m"), col("dst").as("b")), "m")
          .filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("cn"))
        two.join(sym.select(col("src").as("a"), col("dst").as("b")),
            Seq("a", "b"), "left_anti")
          .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
          .withColumn("jmic", expr("(cn * 1000000) div (da + db - cn)"))
          .orderBy(desc("jmic"), desc("cn"), col("a"), col("b"))
          .limit(20)
          .select(col("a"), col("b"), col("cn"), col("da"), col("db"),
            round(col("jmic").cast("double") / lit(1000000.0), 6).as("jaccard"))
      },
      Some(s"""WITH $edgesSql,
              |sym AS (SELECT DISTINCT src, dst FROM (
              |    SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
              |  WHERE src <> dst),
              |deg AS (SELECT src AS id, count(*) AS deg FROM sym GROUP BY 1),
              |two AS (SELECT x.src AS a, y.dst AS b, count(*) AS cn
              |  FROM sym x JOIN sym y ON x.dst = y.src
              |  WHERE x.src < y.dst GROUP BY 1, 2),
              |ne AS (SELECT a, b, cn FROM two
              |  WHERE NOT EXISTS (SELECT 1 FROM sym WHERE src = a AND dst = b)),
              |sc AS (SELECT a, b, cn, da.deg AS da, db.deg AS db,
              |    (cn * 1000000) // (da.deg + db.deg - cn) AS jmic
              |  FROM ne JOIN deg da ON da.id = a JOIN deg db ON db.id = b)
              |SELECT a, b, cn, da, db,
              |  round(CAST(jmic AS DOUBLE) / 1000000.0, 6) AS jaccard
              |FROM sc ORDER BY jmic DESC, cn DESC, a, b LIMIT 20""".stripMargin))
  )
}
