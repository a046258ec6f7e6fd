package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lab-3 and lab-4 interactive map documents (S13 map parity; VERDICT r12
  * items 3–4) — the remaining folium artifacts, rendered dependency-free
  * with the MapPanel machinery (self-contained HTML, inline SVG + JS,
  * pan/zoom, layer control, tooltips).
  *
  * Reference surfaces:
  *  - lab 3, 实习三/实习三代码/urban_road_network_analysis.ipynb cell 4
  *    (route polyline: shadow stroke + red main stroke over the network,
  *    origin/destination markers) and cell 7 (folium map: blue isochrone
  *    polygon fill 0.2, per-category POI layers colored when reachable /
  *    red when not with the hospital layer shown by default, a YlGn
  *    choropleth of the connectivity grid colored by avg_degree_density
  *    with a caption legend, center star marker, LayerControl, stats
  *    side panel from sta_html.py).
  *  - lab 4, 实习四/实习四代码/yelp_analysis.ipynb create_sentiment_map
  *    (center = mean coordinates; sentiment heat layer with weights
  *    normalized (s+1)/2; positive = top score quartile in
  *    darkgreen/green/lightgreen shades by +0.5/+0.2 over the threshold;
  *    negative = bottom quartile in darkred/red/lightcoral; top-20 and
  *    bottom-20 layers; tooltips "name (score)"; LayerControl).
  *
  * Split as in StatPanel/MapPanel: map DATA is engine work — every layer
  * is a frame an oracle-checked query aggregates (GraphQueries
  * routeVertices/reachNodes/poiPoints/gridCells = the g2b/g3/g3b/g7/g6
  * bodies; Pipelines.reviewSentimentRanked = the lab4 body), landed via
  * writeReportJson — and the map DOCUMENT is driver work over the re-read
  * rows, capped and loud like MapPanel.
  */
object MapDocs {

  /** ColorBrewer YlGn (9-class) — the reference's `linear.YlGn_09` grid
    * colormap. Public colorbrewer2.org values. */
  val YlGn: Array[String] = Array(
    "#ffffe5", "#f7fcb9", "#d9f0a3", "#addd8e", "#78c679",
    "#41ab5d", "#238443", "#006837", "#004529")

  /** Reachable-POI marker colors per tag (the reference's folium Icon
    * colors: hospital green, school orange, park darkgreen — plus shop,
    * which the synthetic tag set adds; Leaflet marker palette hexes). */
  val TagColors: Map[String, String] = Map(
    "hospital" -> "#72b026", "school" -> "#f69730",
    "park" -> "#728224", "shop" -> "#38aadd")

  /** Out-of-reach POI marker color (the reference's `color="red"`). */
  val OutColor = "#d63e2a"

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#39;")

  /** Quoted JSON string literal for the embedded JS data — see
    * [[ChartHtml.jstr]] (shared encoder: escapes `\`/`"`/control chars,
    * \u00XX for `<`/`>`/`&` so `</script>` can't terminate the block). */
  private def jstr(s: String): String = ChartHtml.jstr(s)

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))

  // ---------------------------------------------------------------- lab 3

  /** Engine-side lab-3 map rows, one uniform exchange schema
    * `(layer, tag, seq, lon, lat, value)`:
    *  - route: seq = vertex order, value = node id     (g2b's frame)
    *  - reach: value = path cost                       (g3/g3b's frame)
    *  - poi:   tag = category, value = acc ∈ {0,1}     (g7's frame)
    *  - grid:  lon/lat = cell origin, seq = n_nodes,
    *           value = degree_density                  (g6's frame)
    */
  def lab3MapRows(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.GraphQueries
    val nul = lit(null).cast("string")
    val nulL = lit(null).cast("long")
    val route = GraphQueries.routeVertices(s, dir).select(
      lit("route").as("layer"), nul.as("tag"), col("seq"),
      col("lon"), col("lat"), col("id").cast("double").as("value"))
    val reach = GraphQueries.reachNodes(s, dir).select(
      lit("reach").as("layer"), nul.as("tag"), nulL.as("seq"),
      col("lon"), col("lat"), col("dist").cast("double").as("value"))
    val poi = GraphQueries.poiPoints(s, dir).select(
      lit("poi").as("layer"), col("tag"), nulL.as("seq"),
      col("lon"), col("lat"), col("acc").cast("double").as("value"))
    val grid = GraphQueries.gridCells(s, dir).select(
      lit("grid").as("layer"), nul.as("tag"), col("n_nodes").as("seq"),
      (col("cx") * 0.1 - 74.3).as("lon"), (col("cy") * 0.1 + 40.5).as("lat"),
      col("degree_density").as("value"))
    route.unionByName(reach).unionByName(poi).unionByName(grid)
  }

  /** Linear YlGn ramp lookup, exposed so the spec derives expected cell
    * colors from the same arithmetic. */
  def ylgnColor(v: Double, minV: Double, maxV: Double): String = {
    val t = if (maxV > minV) (v - minV) / (maxV - minV) else 0.0
    YlGn(math.min(YlGn.length - 1, math.max(0, (t * (YlGn.length - 1)).round.toInt)))
  }

  /** The lab-3 interactive map document over collected map rows. */
  def renderLab3Html(rows: Seq[(String, String, Long, Double, Double, Double)],
      title: String): String = {
    val route = rows.filter(_._1 == "route").sortBy(_._3)
    val reach = rows.filter(_._1 == "reach")
    val pois = rows.filter(_._1 == "poi")
    val grid = rows.filter(_._1 == "grid")
    require(route.nonEmpty, "no route vertices — lab-3 map needs the g2b frame")
    require(reach.nonEmpty, "no reachable nodes — lab-3 map needs the g3 frame")

    // Isochrone hull from the SAME reach points g3b aggregates, through
    // the same public hull function its aggregator uses.
    val hull = graft.spatial.ConvexHull.hull(
      reach.map(r => graft.spatial.ConvexHull.Pt(r._4, r._5)).distinct)
    val (minD, maxD) =
      (grid.map(_._6).minOption.getOrElse(0.0), grid.map(_._6).maxOption.getOrElse(0.0))

    def pt(lon: Double, lat: Double) = s"[${num(lat)},${num(lon)}]"
    val routeJs = route.map(r => pt(r._4, r._5)).mkString("[", ",", "]")
    val reachJs = reach.sortBy(r => (r._5, r._4))
      .map(r => s"{\"p\":${pt(r._4, r._5)},\"d\":${r._6.toLong}}").mkString("[", ",", "]")
    val hullJs = hull.map(p => pt(p.x, p.y)).mkString("[", ",", "]")
    val tags = pois.map(_._2).distinct.sorted
    val poiJs = tags.map { t =>
      val ps = pois.filter(_._2 == t).sortBy(r => (r._5, r._4))
      val in = ps.filter(_._6 > 0.5).map(r => pt(r._4, r._5)).mkString("[", ",", "]")
      val out = ps.filter(_._6 <= 0.5).map(r => pt(r._4, r._5)).mkString("[", ",", "]")
      s"""{"tag":${jstr(t)},"color":"${TagColors.getOrElse(t, "#555555")}","in":$in,"out":$out}"""
    }.mkString("[", ",", "]")
    val gridJs = grid.sortBy(g => (g._4, g._5)).map { g =>
      s"""{"lon":${num(g._4)},"lat":${num(g._5)},"n":${g._3},"d":${num(g._6)},"color":"${ylgnColor(g._6, minD, maxD)}"}"""
    }.mkString("[", ",", "]")
    val statsJs = tags.map { t =>
      val ps = pois.filter(_._2 == t)
      val in = ps.count(_._6 > 0.5)
      s"""{"tag":${jstr(t)},"total":${ps.size},"inside":$in}"""
    }.mkString("[", ",", "]")
    val routeLen = route.size
    val origin = route.head
    val dest = route.last

    s"""<!DOCTYPE html><html><head><meta charset="UTF-8"><title>${esc(title)}</title>
       |<style>
       |body{font-family:sans-serif;margin:0;display:flex;height:100vh}
       |#map{flex:1;cursor:grab;background:#eef2f5}
       |#control{width:250px;padding:12px;border-left:1px solid #ddd;font-size:13px;overflow:auto}
       |#control h2{font-size:14px;margin:4px 0 8px}
       |#control label{display:block;margin:3px 0}
       |.sw{display:inline-block;width:10px;height:10px;border-radius:5px;margin-right:4px}
       |#legend{margin-top:8px}
       |#legend .cell{display:inline-block;width:18px;height:10px}
       |table{border-collapse:collapse;font-size:12px;margin-top:8px}
       |td,th{border:1px solid #ccc;padding:2px 6px;text-align:right}
       |</style></head><body>
       |<svg id="map" xmlns="http://www.w3.org/2000/svg"></svg>
       |<div id="control"><h2>${esc(title)}</h2><div id="layers"></div>
       |<div id="legend"><b>Average degree density</b><br/>
       |${YlGn.map(c => s"""<span class="cell" style="background:$c"></span>""").mkString}
       |<br/><span>${num(minD)} &rarr; ${num(maxD)}</span></div>
       |<table id="stats"><tr><th>POI</th><th>reachable</th><th>total</th><th>rate</th></tr></table>
       |<p id="meta"></p></div>
       |<script>
       |const routePts = $routeJs;
       |const reachPts = $reachJs;
       |const hullPts = $hullJs;
       |const poiLayers = $poiJs;
       |const gridCells = $gridJs;
       |const poiStats = $statsJs;
       |const outColor = "$OutColor";
       |const svg = document.getElementById('map');
       |const NS = 'http://www.w3.org/2000/svg';
       |const allLat = reachPts.map(r => r.p[0]).concat(routePts.map(p => p[0]))
       |  .concat(poiLayers.flatMap(l => l.in.concat(l.out).map(p => p[0])));
       |const allLon = reachPts.map(r => r.p[1]).concat(routePts.map(p => p[1]))
       |  .concat(poiLayers.flatMap(l => l.in.concat(l.out).map(p => p[1])));
       |const pad = 0.02;
       |const lat0 = Math.min(...allLat) - pad, lat1 = Math.max(...allLat) + pad;
       |const lon0 = Math.min(...allLon) - pad, lon1 = Math.max(...allLon) + pad;
       |const W = 900, H = 700;
       |const fx = lon => (lon - lon0) / (lon1 - lon0) * W;
       |const fy = lat => H - (lat - lat0) / (lat1 - lat0) * H;
       |let vb = {x: 0, y: 0, w: W, h: H};
       |const applyVb = () => svg.setAttribute('viewBox', vb.x + ' ' + vb.y + ' ' + vb.w + ' ' + vb.h);
       |applyVb();
       |function group(id) {
       |  const g = document.createElementNS(NS, 'g'); g.id = id; svg.appendChild(g); return g;
       |}
       |function shape(g, name, attrs, tip) {
       |  const el = document.createElementNS(NS, name);
       |  for (const k in attrs) el.setAttribute(k, attrs[k]);
       |  if (tip) { const t = document.createElementNS(NS, 'title'); t.textContent = tip; el.appendChild(t); }
       |  g.appendChild(el); return el;
       |}
       |// Connectivity-grid choropleth (reference folium.GeoJson + YlGn_09)
       |const gridG = group('layer-grid');
       |const cw = fx(lon0 + 0.1 + pad) - fx(lon0 + pad);
       |const ch = fy(lat0 + pad) - fy(lat0 + 0.1 + pad);
       |gridCells.forEach(c => shape(gridG, 'rect', {
       |  x: fx(c.lon).toFixed(2), y: fy(c.lat + 0.1).toFixed(2),
       |  width: cw.toFixed(2), height: ch.toFixed(2),
       |  fill: c.color, 'fill-opacity': 0.7, stroke: 'gray', 'stroke-width': 0.5
       |}, 'degree density: ' + c.d.toFixed(2) + ' (nodes: ' + c.n + ')'));
       |// Isochrone: hull polygon (blue, fillOpacity 0.2) over reach dots
       |const isoG = group('layer-iso');
       |shape(isoG, 'polygon', {
       |  points: hullPts.map(p => fx(p[1]).toFixed(2) + ',' + fy(p[0]).toFixed(2)).join(' '),
       |  fill: 'blue', 'fill-opacity': 0.2, stroke: 'blue', 'stroke-width': 2
       |}, 'cost-30 reachable area (' + reachPts.length + ' nodes)');
       |reachPts.forEach(r => shape(isoG, 'circle', {
       |  cx: fx(r.p[1]).toFixed(2), cy: fy(r.p[0]).toFixed(2), r: 2.5,
       |  fill: '#1f6feb', 'fill-opacity': 0.7
       |}, 'node cost ' + r.d));
       |// POI layers, per tag, reachable vs not (reference colored vs red)
       |poiLayers.forEach(l => {
       |  const gIn = group('layer-poi-' + l.tag + '-in');
       |  l.in.forEach(p => shape(gIn, 'circle', {
       |    cx: fx(p[1]).toFixed(2), cy: fy(p[0]).toFixed(2), r: 3,
       |    fill: l.color, 'fill-opacity': 0.85
       |  }, l.tag + ' (reachable)'));
       |  const gOut = group('layer-poi-' + l.tag + '-out');
       |  l.out.forEach(p => shape(gOut, 'circle', {
       |    cx: fx(p[1]).toFixed(2), cy: fy(p[0]).toFixed(2), r: 3,
       |    fill: outColor, 'fill-opacity': 0.6
       |  }, l.tag + ' (out of reach)'));
       |});
       |// Route polyline: shadow + main stroke (reference cell 4 styling)
       |const routeG = group('layer-route');
       |const routeD = routePts.map(p => fx(p[1]).toFixed(2) + ',' + fy(p[0]).toFixed(2)).join(' ');
       |shape(routeG, 'polyline', {points: routeD, fill: 'none',
       |  stroke: '#2D3748', 'stroke-width': 8, 'stroke-opacity': 0.3});
       |shape(routeG, 'polyline', {points: routeD, fill: 'none',
       |  stroke: '#E53E3E', 'stroke-width': 2, 'stroke-opacity': 0.9},
       |  'route: ' + routePts.length + ' nodes');
       |shape(routeG, 'circle', {cx: fx(routePts[0][1]).toFixed(2),
       |  cy: fy(routePts[0][0]).toFixed(2), r: 5, fill: '#2f9e44'}, 'origin (analysis center)');
       |shape(routeG, 'circle', {cx: fx(routePts[routePts.length-1][1]).toFixed(2),
       |  cy: fy(routePts[routePts.length-1][0]).toFixed(2), r: 5, fill: '#e03131'}, 'destination');
       |// Layer control; the hospital POI layer starts visible like the
       |// reference (m.add_child(layer_groups["医院"])), others hidden.
       |const layers = [['layer-grid', 'Connectivity grid', true],
       |  ['layer-iso', 'Isochrone (cost 30)', true],
       |  ['layer-route', 'Shortest route', true]];
       |poiLayers.forEach(l => {
       |  layers.push(['layer-poi-' + l.tag + '-in', l.tag + ' (reachable)', l.tag === 'hospital']);
       |  layers.push(['layer-poi-' + l.tag + '-out', l.tag + ' (out of reach)', l.tag === 'hospital']);
       |});
       |const ctl = document.getElementById('layers');
       |layers.forEach(([id, name, on]) => {
       |  const el = document.getElementById(id);
       |  if (!on) el.style.display = 'none';
       |  const l = document.createElement('label');
       |  const cb = document.createElement('input'); cb.type = 'checkbox'; cb.checked = on;
       |  cb.onchange = () => el.style.display = cb.checked ? '' : 'none';
       |  l.appendChild(cb); l.appendChild(document.createTextNode(' ' + name));
       |  ctl.appendChild(l);
       |});
       |// Accessibility stats table (reference sta_html side panel + the
       |// printed per-category summary)
       |const tbl = document.getElementById('stats');
       |poiStats.forEach(s => {
       |  const tr = document.createElement('tr');
       |  [s.tag, s.inside, s.total, (s.total ? (100*s.inside/s.total).toFixed(1) : '0.0') + '%']
       |    .forEach(v => { const td = document.createElement('td'); td.textContent = v; tr.appendChild(td); });
       |  tbl.appendChild(tr);
       |});
       |document.getElementById('meta').textContent =
       |  'route ' + routePts.length + ' nodes; isochrone ' + reachPts.length +
       |  ' nodes, hull ' + hullPts.length + ' vertices; grid ' + gridCells.length + ' cells';
       |let drag = null;
       |svg.onmousedown = e => { drag = {x: e.clientX, y: e.clientY}; };
       |window.onmouseup = () => { drag = null; };
       |window.onmousemove = e => {
       |  if (!drag) return;
       |  const sc = vb.w / svg.clientWidth;
       |  vb.x -= (e.clientX - drag.x) * sc; vb.y -= (e.clientY - drag.y) * sc;
       |  drag = {x: e.clientX, y: e.clientY}; applyVb();
       |};
       |svg.onwheel = e => {
       |  e.preventDefault();
       |  const f = e.deltaY < 0 ? 0.8 : 1.25;
       |  const mx = vb.x + (e.offsetX / svg.clientWidth) * vb.w;
       |  const my = vb.y + (e.offsetY / svg.clientHeight) * vb.h;
       |  vb = {x: mx - (mx - vb.x) * f, y: my - (my - vb.y) * f, w: vb.w * f, h: vb.h * f};
       |  applyVb();
       |};
       |</script></body></html>
       |""".stripMargin
  }

  /** Full lab-3 sink: rows land as a JSON-lines report, the driver re-reads
    * and renders (StatPanel pattern; capped + loud like MapPanel). */
  def writeLab3MapPanel(s: SparkSession, dir: String, outPath: String,
      title: String = "Road network accessibility", maxPoints: Int = 100000): Unit = {
    val rowsDf = lab3MapRows(s, dir)
    val n = rowsDf.count()
    require(n <= maxPoints,
      s"writeLab3MapPanel is a single-file exchange export capped at $maxPoints rows; got $n")
    IO.writeReportJson(rowsDf, s"$outPath/rows")
    val back = s.read
      .schema("layer STRING, tag STRING, seq LONG, lon DOUBLE, lat DOUBLE, value DOUBLE")
      .json(s"$outPath/rows").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).toSeq
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outPath/map_lab3.html"),
      renderLab3Html(back, title)): Unit
  }

  // ---------------------------------------------------------------- lab 4

  /** Engine-side lab-4 map rows: the SAME per-source frame the
    * oracle-checked lab4 query aggregates (Pipelines.reviewSentimentRanked),
    * placed with the synthetic-point derivation keyed by a source hash. */
  def lab4MapRows(s: SparkSession, dir: String): DataFrame = {
    val ranked = graft.pipelines.Pipelines.reviewSentimentRanked(s, dir)
      .withColumn("skey", pmod(xxhash64(col("source")), lit(100000L)))
    graft.core.Tables.withSyntheticPoint(ranked, "skey")
      .select(col("source"), col("n_docs"), col("avg_polarity"),
        col("positive_rate"), col("score"), col("lon"), col("lat"))
  }

  /** Pandas-default (linear interpolation) quantile, exposed so the spec
    * reproduces the reference thresholds (`restaurant_stats.quantile`). */
  def quantile(sorted: Seq[Double], q: Double): Double = {
    require(sorted.nonEmpty, "quantile of empty")
    val pos = q * (sorted.size - 1)
    val lo = pos.toInt
    val hi = math.min(lo + 1, sorted.size - 1)
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** The reference's positive shade rule (darkgreen/green/lightgreen by
    * +0.5/+0.2 over the top-quartile threshold) and its negative mirror. */
  def posShade(score: Double, q75: Double): String =
    if (score >= q75 + 0.5) "#006400" else if (score >= q75 + 0.2) "#008000" else "#90ee90"
  def negShade(score: Double, q25: Double): String =
    if (score <= q25 - 0.5) "#8b0000" else if (score <= q25 - 0.2) "#ff0000" else "#f08080"

  /** The lab-4 sentiment map document over collected per-source rows
    * `(source, n_docs, avg_polarity, positive_rate, score, lon, lat)`. */
  def renderLab4Html(rows: Seq[(String, Long, Double, Double, Double, Double, Double)],
      title: String): String = {
    require(rows.nonEmpty, "no per-source rows — lab-4 map needs the ranked frame")
    val centerLat = rows.map(_._7).sum / rows.size
    val centerLon = rows.map(_._6).sum / rows.size
    val scores = rows.map(_._5).sorted
    val q75 = quantile(scores, 0.75)
    val q25 = quantile(scores, 0.25)
    val positive = rows.filter(_._5 >= q75)
    val negative = rows.filter(_._5 <= q25)
    val byScore = rows.sortBy(r => (-r._5, r._1))
    val top20 = byScore.take(20)
    val bottom20 = byScore.reverse.take(20)

    def js(r: (String, Long, Double, Double, Double, Double, Double), color: String) =
      s"""{"name":${jstr(r._1)},"n":${r._2},"pol":${num(r._3)},"posRate":${num(r._4)},""" +
        s""""score":${num(r._5)},"p":[${num(r._7)},${num(r._6)}],"color":"$color"}"""

    val heatJs = rows.sortBy(r => (r._7, r._6))
      .map(r => s"[${num(r._7)},${num(r._6)},${num((r._5 + 1) / 2)}]").mkString("[", ",", "]")
    val posJs = positive.sortBy(_._1).map(r => js(r, posShade(r._5, q75))).mkString("[", ",", "]")
    val negJs = negative.sortBy(_._1).map(r => js(r, negShade(r._5, q25))).mkString("[", ",", "]")
    val topJs = top20.map(r => js(r, "#2b8a3e")).mkString("[", ",", "]")
    val botJs = bottom20.map(r => js(r, "#c92a2a")).mkString("[", ",", "]")

    s"""<!DOCTYPE html><html><head><meta charset="UTF-8"><title>${esc(title)}</title>
       |<style>
       |body{font-family:sans-serif;margin:0;display:flex;height:100vh}
       |#map{flex:1;cursor:grab;background:#eef2f5}
       |#control{width:240px;padding:12px;border-left:1px solid #ddd;font-size:13px;overflow:auto}
       |#control h2{font-size:14px;margin:4px 0 8px}
       |#control label{display:block;margin:3px 0}
       |</style></head><body>
       |<svg id="map" xmlns="http://www.w3.org/2000/svg"></svg>
       |<div id="control"><h2>${esc(title)}</h2><div id="layers"></div>
       |<p>positive threshold (q75): ${num(q75)}<br/>negative threshold (q25): ${num(q25)}</p>
       |<p id="meta"></p></div>
       |<script>
       |const center = [${num(centerLat)}, ${num(centerLon)}];
       |const heatData = $heatJs;
       |const positives = $posJs;
       |const negatives = $negJs;
       |const top20 = $topJs;
       |const bottom20 = $botJs;
       |const svg = document.getElementById('map');
       |const NS = 'http://www.w3.org/2000/svg';
       |const lats = heatData.map(p => p[0]), lons = heatData.map(p => p[1]);
       |const pad = 0.02;
       |const lat0 = Math.min(...lats) - pad, lat1 = Math.max(...lats) + pad;
       |const lon0 = Math.min(...lons) - pad, lon1 = Math.max(...lons) + pad;
       |const W = 900, H = 700;
       |const fx = lon => (lon - lon0) / (lon1 - lon0) * W;
       |const fy = lat => H - (lat - lat0) / (lat1 - lat0) * H;
       |let vb = {x: 0, y: 0, w: W, h: H};
       |const applyVb = () => svg.setAttribute('viewBox', vb.x + ' ' + vb.y + ' ' + vb.w + ' ' + vb.h);
       |applyVb();
       |function group(id) {
       |  const g = document.createElementNS(NS, 'g'); g.id = id; svg.appendChild(g); return g;
       |}
       |function dot(g, lat, lon, r, color, opacity, tip) {
       |  const c = document.createElementNS(NS, 'circle');
       |  c.setAttribute('cx', fx(lon).toFixed(2)); c.setAttribute('cy', fy(lat).toFixed(2));
       |  c.setAttribute('r', r); c.setAttribute('fill', color); c.setAttribute('fill-opacity', opacity);
       |  const t = document.createElementNS(NS, 'title'); t.textContent = tip; c.appendChild(t);
       |  g.appendChild(c);
       |}
       |// Sentiment heat layer: weight = (score+1)/2 (reference HeatMap input)
       |const heatG = group('layer-heat');
       |heatData.forEach(p => dot(heatG, p[0], p[1], 6 + 6 * p[2], '#ff5722',
       |  0.05 + 0.15 * p[2], 'sentiment weight ' + p[2].toFixed(3)));
       |function markers(id, arr, tag) {
       |  const g = group(id);
       |  arr.forEach(r => dot(g, r.p[0], r.p[1], 5, r.color, 0.7,
       |    r.name + ' (score: ' + r.score.toFixed(3) + '; docs: ' + r.n +
       |    '; positive rate: ' + (100 * r.posRate).toFixed(1) + '%)' + tag));
       |  return g;
       |}
       |markers('layer-pos', positives, ' — recommended');
       |markers('layer-neg', negatives, ' — needs improvement');
       |markers('layer-top', top20, ' — top 20');
       |markers('layer-bot', bottom20, ' — bottom 20');
       |const layers = [['layer-heat', 'Sentiment heat'],
       |  ['layer-pos', 'Positive sources (top quartile)'],
       |  ['layer-neg', 'Negative sources (bottom quartile)'],
       |  ['layer-top', 'Top 20 by score'], ['layer-bot', 'Bottom 20 by score']];
       |const ctl = document.getElementById('layers');
       |layers.forEach(([id, name]) => {
       |  const l = document.createElement('label');
       |  const cb = document.createElement('input'); cb.type = 'checkbox'; cb.checked = true;
       |  cb.onchange = () => document.getElementById(id).style.display = cb.checked ? '' : 'none';
       |  l.appendChild(cb); l.appendChild(document.createTextNode(' ' + name));
       |  ctl.appendChild(l);
       |});
       |document.getElementById('meta').textContent =
       |  heatData.length + ' sources; ' + positives.length + ' positive, ' +
       |  negatives.length + ' negative; center ' + center[0].toFixed(4) + ', ' + center[1].toFixed(4);
       |let drag = null;
       |svg.onmousedown = e => { drag = {x: e.clientX, y: e.clientY}; };
       |window.onmouseup = () => { drag = null; };
       |window.onmousemove = e => {
       |  if (!drag) return;
       |  const sc = vb.w / svg.clientWidth;
       |  vb.x -= (e.clientX - drag.x) * sc; vb.y -= (e.clientY - drag.y) * sc;
       |  drag = {x: e.clientX, y: e.clientY}; applyVb();
       |};
       |svg.onwheel = e => {
       |  e.preventDefault();
       |  const f = e.deltaY < 0 ? 0.8 : 1.25;
       |  const mx = vb.x + (e.offsetX / svg.clientWidth) * vb.w;
       |  const my = vb.y + (e.offsetY / svg.clientHeight) * vb.h;
       |  vb = {x: mx - (mx - vb.x) * f, y: my - (my - vb.y) * f, w: vb.w * f, h: vb.h * f};
       |  applyVb();
       |};
       |</script></body></html>
       |""".stripMargin
  }

  /** Full lab-4 sink (StatPanel pattern; capped + loud like MapPanel). */
  def writeLab4MapPanel(s: SparkSession, dir: String, outPath: String,
      title: String = "Review sentiment by source", maxPoints: Int = 100000): Unit = {
    val rowsDf = lab4MapRows(s, dir)
    val n = rowsDf.count()
    require(n <= maxPoints,
      s"writeLab4MapPanel is a single-file exchange export capped at $maxPoints rows; got $n")
    IO.writeReportJson(rowsDf, s"$outPath/rows")
    val back = s.read
      .schema("source STRING, n_docs LONG, avg_polarity DOUBLE, positive_rate DOUBLE, " +
        "score DOUBLE, lon DOUBLE, lat DOUBLE")
      .json(s"$outPath/rows").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outPath/map_lab4.html"),
      renderLab4Html(back, title)): Unit
  }
}
