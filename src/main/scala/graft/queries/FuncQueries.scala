package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.core.Tables
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

/** Scalar-function families (SURVEY.md §2.8 F1–F7): string, date/time, math,
  * geo, JSON, array/collection, conditional. Every function stays a native
  * codegen'd column expression; each query aggregates so the oracle compare
  * is a handful of rows regardless of scale.
  */
object FuncQueries extends QueryCatalog {

  def defs: Map[String, QueryDef] = Map(

    // F1 — string battery: lower/trim/regexp_replace/split/substring/concat
    // (reference text preprocessing, 实习四/…ipynb:776-782, analyze_data_bias.py:660).
    "f1_string_funcs" -> QueryDef(
      (s, dir) => Tables.part(s, dir)
        .select(
          substring(regexp_replace(lower(trim(col("p_name"))), "[aeiou]", ""), 1, 8).as("devoweled"),
          size(split(col("p_name"), " ")).as("n_tokens"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .groupBy("n_tokens")
        .agg(count(lit(1)).as("n"),
          min("devoweled").as("min_dev"),
          max("brand_type").as("max_bt"))
        .orderBy("n_tokens"),
      Some("""SELECT len(string_split(p_name, ' ')) AS n_tokens, count(*) AS n,
             |  min(substr(regexp_replace(lower(trim(p_name)), '[aeiou]', '', 'g'), 1, 8)) AS min_dev,
             |  max(p_brand || '|' || p_type) AS max_bt
             |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)),

    // F2 — date/time battery: component extraction, formatting, interval
    // arithmetic, epoch diffs (reference strftime/strptime/timedelta,
    // test.py:64-65, stat_html.py:76-80, ghy_实习二.py:31).
    "f2_datetime_funcs" -> QueryDef(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("ship_deadline", col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .withColumn("age_days",
          (unix_timestamp(lit("1998-12-31 00:00:00")) - unix_timestamp(col("o_orderdate"))) / 86400.0)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n"),
          date_format(max("ship_deadline"), "yyyy-MM-dd").as("max_deadline"),
          round(avg("age_days"), 4).as("avg_age_days"))
        .orderBy("ym"),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n,
             |  strftime(max(o_orderdate + INTERVAL 30 DAY), '%Y-%m-%d') AS max_deadline,
             |  round(avg((epoch(TIMESTAMP '1998-12-31 00:00:00') - epoch(o_orderdate)) / 86400.0), 4) AS avg_age_days
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // F3 — math battery: log1p/expm1/sqrt/pow/abs/round/pmod (reference
    // log-target transform 实习二/…ipynb:324, rmsle :908-911, %360 lx:43).
    "f3_math_funcs" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .select(
          log1p(col("l_extendedprice")).as("log_price"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          pow(col("l_discount"), 2).as("disc2"),
          pmod(col("l_orderkey"), lit(7L)).as("key_mod"),
          abs(col("l_quantity") - lit(25.0)).as("qty_dev"))
        .groupBy("key_mod")
        .agg(round(avg("log_price"), 6).as("avg_log_price"),
          round(sum("sqrt_qty"), 4).as("sum_sqrt_qty"),
          round(avg("disc2"), 8).as("avg_disc2"),
          round(max("qty_dev"), 2).as("max_qty_dev"))
        .orderBy("key_mod"),
      Some("""SELECT l_orderkey % 7 AS key_mod,
             |  round(avg(ln(1 + l_extendedprice)), 6) AS avg_log_price,
             |  round(sum(sqrt(l_quantity)), 4) AS sum_sqrt_qty,
             |  round(avg(power(l_discount, 2)), 8) AS avg_disc2,
             |  round(max(abs(l_quantity - 25.0)), 2) AS max_qty_dev
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // F4 — geo scalars: haversine + bearing from each synthetic point to a
    // fixed reference point, bucketed by distance band (reference formulas
    // 实习二/…ipynb:434-440, lx_lightgbmTest.py:37-43).
    "f4_geo_funcs" -> QueryDef(
      (s, dir) => {
        val refLat = lit(40.758)
        val refLon = lit(-73.9857)
        Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
          .withColumn("hav_km", GeoFunctions.haversineKm(col("lat"), col("lon"), refLat, refLon))
          .withColumn("bearing", GeoFunctions.bearingDeg(col("lat"), col("lon"), refLat, refLon))
          .withColumn("band", floor(col("hav_km") / lit(10.0)))
          .groupBy("band")
          .agg(count(lit(1)).as("n"),
            round(avg("hav_km"), 6).as("avg_km"),
            round(avg("bearing"), 6).as("avg_bearing"))
          .orderBy("band")
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        val hav = GeoFunctions.haversineSql("lat", "lon", "40.758", "-73.9857")
        val brg = GeoFunctions.bearingSql("lat", "lon", "40.758", "-73.9857")
        s"""WITH pts AS (SELECT $lonSql AS lon, $latSql AS lat FROM customer),
           |d AS (SELECT ($hav) AS hav_km, ($brg) AS bearing FROM pts)
           |SELECT CAST(floor(hav_km / 10.0) AS BIGINT) AS band, count(*) AS n,
           |  round(avg(hav_km), 6) AS avg_km, round(avg(bearing), 6) AS avg_bearing
           |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
      },
      headline = true),

    // F9 — the remaining F4 geo scalars: Manhattan-approximation distance
    // with cos-lat longitude scaling (reference lx_lightgbmTest.py:31-34)
    // and Web-Mercator EPSG:3857 projection (reference to_crs(epsg=3857),
    // 实习三/…network_analysis.ipynb:623) — both composed native column
    // expressions, identical arithmetic in the oracle.
    "f9_manhattan_mercator" -> QueryDef(
      (s, dir) => {
        val refLat = lit(40.758)
        val refLon = lit(-73.9857)
        Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
          .withColumn("manh_km",
            GeoFunctions.manhattanKm(col("lat"), col("lon"), refLat, refLon))
          .withColumn("mx", GeoFunctions.webMercatorX(col("lon")))
          .withColumn("my", GeoFunctions.webMercatorY(col("lat")))
          .groupBy(floor(col("manh_km") / 10.0).as("band"))
          .agg(count(lit(1)).as("n"),
            round(avg("manh_km"), 6).as("avg_manh_km"),
            round(min("mx"), 4).as("min_mx"),
            round(max("my"), 4).as("max_my"))
          .orderBy("band")
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        s"""WITH pts AS (SELECT $lonSql AS lon, $latSql AS lat FROM customer),
           |d AS (SELECT
           |    abs(40.758 - lat) * 111.0 +
           |      abs(-73.9857 - lon) * 111.0 * cos(radians((lat + 40.758) / 2)) AS manh_km,
           |    6378137.0 * radians(lon) AS mx,
           |    6378137.0 * ln(tan(pi() / 4 + radians(lat) / 2)) AS my
           |  FROM pts)
           |SELECT CAST(floor(manh_km / 10.0) AS BIGINT) AS band, count(*) AS n,
           |  round(avg(manh_km), 6) AS avg_manh_km,
           |  round(min(mx), 4) AS min_mx, round(max(my), 4) AS max_my
           |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // F4b — CRS projection via the custom codegen'd Catalyst expression
    // (reference pyproj EPSG:32618, 实习二/…ipynb:476-492): project every
    // point to UTM meters, band by 10 km easting. The oracle expands the
    // SAME 4th-order Krüger series in SQL — series constants interpolated
    // as the identical doubles (%.17g round-trips exactly), hyperbolics as
    // exp-expansions; libm ulp differences are 9 orders of magnitude under
    // the 2dp rounding. UtmProjectSpec additionally pins round-trip and
    // EPSG:32618 known-coordinate behavior.
    "f8_utm_projection" -> QueryDef(
      (s, dir) => Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
        .withColumn("en", graft.functions.UtmProject.utm(col("lon"), col("lat"), 18))
        .withColumn("easting", col("en").getItem(0))
        .withColumn("northing", col("en").getItem(1))
        .groupBy(floor(col("easting") / 10000).as("band_10km"))
        .agg(count(lit(1)).as("n"),
          round(avg("northing"), 2).as("avg_northing"))
        .orderBy("band_10km"),
      Some {
        import graft.functions.UtmMath
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        // Locale.ROOT: the default locale could render a comma decimal
        // separator, silently corrupting the SQL literal.
        def d(x: Double) = String.format(java.util.Locale.ROOT, "%.17g", Double.box(x))
        val e = d(UtmMath.eccentricity)
        val kA = d(UtmMath.scaleK0 * UtmMath.A)
        val a1 = d(UtmMath.alpha(0)); val a2 = d(UtmMath.alpha(1))
        val a3 = d(UtmMath.alpha(2)); val a4 = d(UtmMath.alpha(3))
        def atanh(x: String) = s"0.5 * ln((1 + ($x)) / (1 - ($x)))"
        def sinh(x: String) = s"(exp($x) - exp(-($x))) / 2"
        def cosh(x: String) = s"(exp($x) + exp(-($x))) / 2"
        // zone 18 central meridian = -75°
        s"""WITH pts AS (SELECT $lonSql AS lon, $latSql AS lat FROM customer),
           |p1 AS (SELECT radians(lat) AS phi, radians(lon + 75.0) AS lam FROM pts),
           |p2 AS (SELECT lam,
           |    ${atanh("sin(phi)")} - $e * ${atanh(s"$e * sin(phi)")} AS q
           |  FROM p1),
           |p3 AS (SELECT lam, ${sinh("q")} AS t FROM p2),
           |p4 AS (SELECT atan2(t, cos(lam)) AS xip,
           |    ${atanh("sin(lam) / sqrt(1 + t * t)")} AS etap
           |  FROM p3),
           |p5 AS (SELECT
           |    xip + $a1 * sin(2 * xip) * ${cosh("2 * etap")}
           |        + $a2 * sin(4 * xip) * ${cosh("4 * etap")}
           |        + $a3 * sin(6 * xip) * ${cosh("6 * etap")}
           |        + $a4 * sin(8 * xip) * ${cosh("8 * etap")} AS xi,
           |    etap + $a1 * cos(2 * xip) * ${sinh("2 * etap")}
           |         + $a2 * cos(4 * xip) * ${sinh("4 * etap")}
           |         + $a3 * cos(6 * xip) * ${sinh("6 * etap")}
           |         + $a4 * cos(8 * xip) * ${sinh("8 * etap")} AS eta
           |  FROM p4),
           |en AS (SELECT 500000.0 + $kA * eta AS easting, $kA * xi AS northing FROM p5)
           |SELECT CAST(floor(easting / 10000) AS BIGINT) AS band_10km,
           |  count(*) AS n, round(avg(northing), 2) AS avg_northing
           |FROM en GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // F5 — JSON: parse the events.props JSON payload, extract + aggregate
    // (reference per-line json.loads with .get defaulting, 实习四/…ipynb:286).
    "f5_json_funcs" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          round(avg(coalesce(col("k"), lit(0L))), 4).as("avg_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  round(avg(coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)), 4) AS avg_k
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // F6 — array/collection: split → explode → count with stopword filtering
    // (reference Counter word counts + stopwords, 实习四/…ipynb:1092-1097);
    // top-20 tokens with deterministic tie-break.
    "f6_array_explode" -> QueryDef(
      (s, dir) => Tables.part(s, dir)
        .select(explode(split(lower(col("p_name")), " ")).as("tok"))
        .filter(length(col("tok")) > 3 && !col("tok").isin("with", "from"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("tok")).limit(20),
      Some("""SELECT tok, count(*) AS n FROM (
             |  SELECT unnest(string_split(lower(p_name), ' ')) AS tok FROM part)
             |WHERE length(tok) > 3 AND tok NOT IN ('with', 'from')
             |GROUP BY 1 ORDER BY n DESC, tok LIMIT 20""".stripMargin)),

    // F7 — conditional bucketing: the reference's sentiment thresholds
    // (±0.1/±0.5 five-way, 实习四/…ipynb:835-856) applied to a derived score.
    "f7_conditional" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("score", (col("value") - lit(100.0)) / lit(100.0))
        .withColumn("cat",
          when(col("score") > 0.5, "very_pos")
            .when(col("score") > 0.1, "positive")
            .when(col("score") >= -0.1, "neutral")
            .when(col("score") >= -0.5, "negative")
            .otherwise("very_neg"))
        .groupBy("cat").agg(count(lit(1)).as("n"), round(avg("score"), 6).as("avg_score"))
        .orderBy("cat"),
      Some("""SELECT CASE WHEN (value-100.0)/100.0 > 0.5 THEN 'very_pos'
             |  WHEN (value-100.0)/100.0 > 0.1 THEN 'positive'
             |  WHEN (value-100.0)/100.0 >= -0.1 THEN 'neutral'
             |  WHEN (value-100.0)/100.0 >= -0.5 THEN 'negative'
             |  ELSE 'very_neg' END AS cat, count(*) AS n,
             |  round(avg((value-100.0)/100.0), 6) AS avg_score
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Engine-added — fuzzy string matching with blocking (entity-resolution
    // shape): candidate pairs come from an equi-join on a 16-char prefix
    // block — never the n² cross product — and only candidates pay the
    // levenshtein comparison (identical unit-cost edit distance in Spark
    // and DuckDB). Per-block near-match counts, lexicographic order.
    "f10_fuzzy_match" -> QueryDef(
      (s, dir) => {
        val sup = Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"),
            substring(col("s_name"), 1, 16).as("blk"))
        val a = sup.select(col("blk"), col("s_suppkey").as("k1"), col("s_name").as("n1"))
        val b = sup.select(col("blk"), col("s_suppkey").as("k2"), col("s_name").as("n2"))
        a.join(b, "blk").filter(col("k1") < col("k2"))
          .filter(levenshtein(col("n1"), col("n2")) <= 1)
          .groupBy("blk").agg(count(lit(1)).as("n_close_pairs"))
          .orderBy("blk")
      },
      Some("""WITH s AS (SELECT s_suppkey, s_name, substring(s_name, 1, 16) AS blk
             |  FROM supplier),
             |pairs AS (SELECT a.blk, a.s_name AS n1, b.s_name AS n2
             |  FROM s a JOIN s b ON a.blk = b.blk AND a.s_suppkey < b.s_suppkey)
             |SELECT blk, count(*) AS n_close_pairs FROM pairs
             |WHERE levenshtein(n1, n2) <= 1
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // F11 — true geohash-12 encoding as composed native expressions: the
    // standard 60-bit geohash IS floor-quantization of lon/lat to 30 bits
    // each + bit interleave (lon in the higher positions) + base-32 — so it
    // reuses ZOrder's plan-time-unrolled interleave and 12 substr picks on
    // the alphabet; zero UDFs, all integer/IEEE-exact. Geohash prefixes
    // are THE exchange format for geo bucketing (cell = prefix truncation),
    // complementing the engine's internal Z-order key with the
    // interoperable textual form. One map-side-combined rollup per
    // 4-char cell.
    "f11_geohash" -> QueryDef(
      (s, dir) => {
        val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        val pts = Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
          .withColumn("lonq",
            floor((col("lon") + 180.0) / 360.0 * 1073741824.0).cast("long"))
          .withColumn("latq",
            floor((col("lat") + 90.0) / 180.0 * 1073741824.0).cast("long"))
          .withColumn("z", graft.spatial.ZOrder.zIndex(col("latq"), col("lonq"), 30))
        val gh = (0 until 12).map { i =>
          val sh = 60 - 5 * (i + 1)
          expr(s"substr('$alpha', cast((z >> $sh) % 32 + 1 as int), 1)")
        }
        pts.withColumn("geohash", concat(gh: _*))
          .groupBy(substring(col("geohash"), 1, 4).as("prefix"))
          .agg(count(lit(1)).as("n_points"),
            min("geohash").as("first_hash"), max("geohash").as("last_hash"))
          .orderBy("prefix")
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        val chars = (0 until 12).map { i =>
          val sh = 60 - 5 * (i + 1)
          s"substr('$alpha', CAST((z >> $sh) % 32 + 1 AS INT), 1)"
        }.mkString(" || ")
        s"""WITH pts AS (SELECT $lonSql AS lon, $latSql AS lat FROM customer),
           |q AS (SELECT
           |    CAST(floor((lon + 180.0) / 360.0 * 1073741824.0) AS BIGINT) AS lonq,
           |    CAST(floor((lat + 90.0) / 180.0 * 1073741824.0) AS BIGINT) AS latq
           |  FROM pts),
           |z AS (SELECT ${graft.spatial.ZOrder.zIndexSql("latq", "lonq", 30)} AS z FROM q),
           |g AS (SELECT $chars AS geohash FROM z)
           |SELECT substr(geohash, 1, 4) AS prefix, count(*) AS n_points,
           |  min(geohash) AS first_hash, max(geohash) AS last_hash
           |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
      })
  )
}
