package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans, projections, filters, dedup, CASE remapping (SURVEY.md §2.1/§2.2).
  *
  * Every query is a declarative DataFrame program: filters and projections
  * sit directly on the parquet scan so Catalyst pushes them down
  * (PushedFilters / ReadSchema visible in .explain), and each ends in an
  * explicit total order for oracle determinism.
  */
object CoreQueries extends QueryCatalog {

  def defs: Map[String, QueryDef] = Map(

    // S1 — scan with limit pushdown (reference 实习一/实习一代码/test.py:25-33
    // reads only the first n CSV rows). Deterministic form: ordered top-100.
    "s1_scan_limit" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |LIMIT 100""".stripMargin)),

    // S14 (engine-added) — ORC round-trip: the returned-flag lineitem slice
    // is written as ORC into the app's staging root and scanned back through
    // Spark's native ORC reader before aggregating. The oracle runs the same
    // aggregate straight off parquet — equality proves the ORC write→scan
    // path is lossless. (l_quantity is integral, so the bigint cast is exact
    // and the sum order-free.)
    "s14_orc_roundtrip" -> QueryDef(
      (s, dir) => {
        val slice = Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_linestatus")
        val path = graft.ops.Staged.appRoot(s) + "/orc-rt-" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
        graft.sources.IO.writeOrc(slice, path)
        graft.sources.IO.readOrc(s, path)
          .groupBy("l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem WHERE l_returnflag = 'R'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S16 (engine-added) — schema-evolution scan: two parquet generations
    // of the same table (the older one written BEFORE a column existed)
    // read back as one frame via mergeSchema, missing values null-filled.
    // This is the drift every long-lived 100 TB table accumulates; the
    // merge is footer-level (schemas reconciled at planning, no data
    // rewrite). Oracle: the same slices reconstructed from the source
    // table with the late column nulled on the old generation.
    "s16_schema_merge" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val path = graft.ops.Staged.appRoot(s) + "/schema-evo-" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
        o.filter(pmod(col("o_orderkey"), lit(2L)) === 1)
          .select("o_orderkey", "o_totalprice")
          .write.mode("overwrite").parquet(path + "/gen1")
        o.filter(pmod(col("o_orderkey"), lit(2L)) === 0)
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
          .write.mode("overwrite").parquet(path + "/gen2")
        s.read.option("mergeSchema", "true")
          .parquet(path + "/gen1", path + "/gen2")
          .agg(count(lit(1)).as("n_rows"),
            count(col("o_orderpriority")).as("n_with_priority"),
            countDistinct(col("o_orderpriority")).as("n_priorities"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      },
      Some("""SELECT count(*) AS n_rows,
             |  count(*) FILTER (WHERE o_orderkey % 2 = 0) AS n_with_priority,
             |  count(DISTINCT CASE WHEN o_orderkey % 2 = 0 THEN o_orderpriority END)
             |    AS n_priorities,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS total_cents
             |FROM orders""".stripMargin)),

    // S15 (engine-added) — hive-partitioned layout + partition pruning:
    // lineitem is written partitioned by return flag, and the filtered
    // re-scan must touch ONE directory — the pruning shows up as
    // PartitionFilters on the scan (PlanSpec pins it). This is the layout
    // a 100 TB table actually ships with: the filter eliminates whole
    // partitions at planning time, before any IO.
    "s15_partition_prune" -> QueryDef(
      (s, dir) => {
        val path = graft.ops.Staged.appRoot(s) + "/part-lineitem-" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_quantity", "l_linestatus", "l_returnflag")
          .write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
        s.read.parquet(path).filter(col("l_returnflag") === "A")
          .groupBy("l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem WHERE l_returnflag = 'A'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S10 — geocode lookup against an offline gazetteer (reference
    // ox.geocode at 实习三/…urban_road_network_analysis.ipynb:307-310): the
    // gazetteer maps place NAME → deterministic point, and the lookup joins
    // on the name string — the geocode semantics — not on a surrogate key.
    // The 25-row gazetteer broadcasts; per-region centroid of the geocoded
    // customer places comes back. At scale the gazetteer stays the small
    // dim side of a broadcast join, exactly this shape.
    "s10_geocode_lookup" -> QueryDef(
      (s, dir) => {
        val gaz = Tables.withSyntheticPoint(
            Tables.nation(s, dir).select(col("n_name").as("place"),
              col("n_nationkey").as("k")), "k")
          .select("place", "lon", "lat")
        val places = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
          .join(Tables.nation(s, dir)
            .select(col("n_nationkey").as("c_nationkey"),
              col("n_name").as("place"), col("n_regionkey")), "c_nationkey")
        places.join(broadcast(gaz), "place")
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("n_geocoded"),
            round(avg("lon"), 6).as("centroid_lon"),
            round(avg("lat"), 6).as("centroid_lat"))
          .orderBy("n_regionkey")
      },
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("n_nationkey")
        s"""WITH gaz AS (SELECT n_name AS place, $lonSql AS lon, $latSql AS lat
           |  FROM nation),
           |places AS (SELECT c_custkey, n_name AS place, n_regionkey
           |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
           |SELECT n_regionkey, count(*) AS n_geocoded,
           |  round(avg(lon), 6) AS centroid_lon,
           |  round(avg(lat), 6) AS centroid_lat
           |FROM places JOIN gaz USING (place)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // S6 — real GeoPackage scan (reference gpd.read_file on GPKG,
    // 实习三/…urban_road_struct_analysis.ipynb:198-202): the committed
    // fixture (tools/make_gpkg_fixture.py — 200 formulaic POIs over 1 KiB
    // SQLite pages) decodes through the from-scratch SQLite b-tree + GPB
    // reader; the oracle regenerates the rows from the generator formula.
    // Only order-free aggregates (counts, exact-quarter score sums, min/max)
    // so cross-engine FP accumulation order cannot matter.
    "s6_gpkg_scan" -> QueryDef(
      (s, dir) => graft.sources.Gpkg.readFeatures(
          s, graft.sources.Fixtures.path("fixtures/poi.gpkg"), "poi")
        .groupBy("category")
        .agg(count(lit(1)).as("n"),
          round(avg("score"), 4).as("avg_score"),
          round(min("lon"), 6).as("min_lon"),
          round(max("lat"), 6).as("max_lat"),
          min("name").as("first_name"))
        .orderBy("category"),
      Some("""WITH poi AS (SELECT i AS fid, printf('poi_%03d', i) AS name,
             |    ['hospital','school','park','cafe'][(i % 4) + 1] AS category,
             |    round(i * CAST(0.25 AS DOUBLE), 2) AS score,
             |    CAST(-74.3 AS DOUBLE) + (i % 60) * CAST(0.01 AS DOUBLE) AS lon,
             |    CAST(40.5 AS DOUBLE) + (i % 50) * CAST(0.01 AS DOUBLE) AS lat
             |  FROM generate_series(1, 200) t(i))
             |SELECT category, count(*) AS n,
             |  round(avg(score), 4) AS avg_score,
             |  round(min(lon), 6) AS min_lon,
             |  round(max(lat), 6) AS max_lat,
             |  min(name) AS first_name
             |FROM poi GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S2 — scan with date parsing (reference parse_dates at
    // 实习二/…taxi_travel_time_prediction.ipynb:106): group by parsed year/month.
    "s2_scan_dates" -> QueryDef(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("yr", "mo"),
      Some("""SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             |count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // P1 — explicit column-list projection (reference 35-feature select at
    // 实习二/…ipynb:872-884). ReadSchema must show only the 3 columns.
    "p1_projection" -> QueryDef(
      (s, dir) => Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // P2 — null-drop filter (reference dropna at test.py:47).
    "p2_null_drop" -> QueryDef(
      (s, dir) => Tables.orders(s, dir)
        .na.drop(Seq("o_totalprice", "o_orderdate", "o_custkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders
             |WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
             |  AND o_custkey IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P3 — dedup by key (reference drop_duplicates at test.py:49-50).
    // Deterministic tie-break: keep the minimal row per (orderkey, linenumber).
    "p3_dedup_by_key" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("l_orderkey", "l_linenumber")
          .orderBy("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        Tables.lineitem(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .agg(count(lit(1)).as("n_rows"), round(sum("l_quantity"), 2).as("sum_qty"))
      },
      Some("""SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty FROM (
             |  SELECT * FROM lineitem
             |  QUALIFY row_number() OVER (
             |    PARTITION BY l_orderkey, l_linenumber
             |    ORDER BY l_quantity, l_extendedprice, l_discount, l_tax) = 1
             |)""".stripMargin)),

    // P4 — equality predicate (reference test.py:52-53).
    "p4_filter_eq" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus, count(*) AS n,
             |round(sum(l_extendedprice), 2) AS revenue
             |FROM lineitem WHERE l_returnflag = 'R'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P5 — bbox range predicate (reference NYC bbox test.py:55-56) over
    // synthetic points derived from c_custkey.
    "p5_bbox_filter" -> QueryDef(
      (s, dir) => Tables.withSyntheticPoint(Tables.customer(s, dir), "c_custkey")
        .filter(col("lon").between(-74.1, -73.9) && col("lat").between(40.6, 40.9))
        .agg(count(lit(1)).as("n"),
          round(avg("lon"), 6).as("avg_lon"), round(avg("lat"), 6).as("avg_lat")),
      Some {
        val (lonSql, latSql) = Tables.syntheticPointSql("c_custkey")
        s"""SELECT count(*) AS n, round(avg(lon), 6) AS avg_lon,
           |round(avg(lat), 6) AS avg_lat FROM (
           |  SELECT $lonSql AS lon, $latSql AS lat FROM customer
           |) WHERE lon BETWEEN -74.1 AND -73.9 AND lat BETWEEN 40.6 AND 40.9""".stripMargin
      }),

    // P6 — mean±3σ outlier filter (reference 实习二/…ipynb:270-279): scalar
    // aggregate broadcast back via cross join, then filter.
    "p6_sigma_outlier" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val stats = li.agg(avg("l_extendedprice").as("m"),
          stddev_samp(col("l_extendedprice")).as("sd"))
        li.crossJoin(stats)
          .filter(col("l_extendedprice").between(
            col("m") - lit(3) * col("sd"), col("m") + lit(3) * col("sd")))
          .agg(count(lit(1)).as("n_kept"), round(sum("l_extendedprice"), 2).as("sum_price"))
      },
      Some("""SELECT count(*) AS n_kept, round(sum(l_extendedprice), 2) AS sum_price
             |FROM lineitem,
             |  (SELECT avg(l_extendedprice) m, stddev_samp(l_extendedprice) sd FROM lineitem) s
             |WHERE l_extendedprice BETWEEN m - 3*sd AND m + 3*sd""".stripMargin)),

    // P8 — value remapping CASE (reference passenger_count.replace at
    // 实习二/…ipynb:266-268, {0:1, 7:6, 8:6, 9:6}).
    "p8_case_remap" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .withColumn("ln_remap",
          when(col("l_linenumber") === 0, 1)
            .when(col("l_linenumber") >= 6, 6)
            .otherwise(col("l_linenumber")))
        .groupBy("ln_remap").agg(count(lit(1)).as("n"))
        .orderBy("ln_remap"),
      Some("""SELECT CASE WHEN l_linenumber = 0 THEN 1
             |  WHEN l_linenumber >= 6 THEN 6 ELSE l_linenumber END AS ln_remap,
             |count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P9 — substring-contains after lower/trim (reference 实习四/…ipynb:160-166).
    "p9_contains" -> QueryDef(
      (s, dir) => Tables.part(s, dir)
        .filter(lower(trim(col("p_name"))).contains("red"))
        .groupBy("p_type").agg(count(lit(1)).as("n"))
        .orderBy("p_type"),
      Some("""SELECT p_type, count(*) AS n FROM part
             |WHERE contains(lower(trim(p_name)), 'red')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P10 — keyword-any-match over a delimited string (reference restaurant
    // keywords over `categories`, 实习四/…ipynb:172-181): predicate as an
    // array `exists` over the split tokens.
    "p10_keyword_any" -> QueryDef(
      (s, dir) => Tables.part(s, dir)
        .filter(exists(split(lower(col("p_name")), " "),
          t => t.isin("red", "blue", "small")))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n FROM part
             |WHERE list_has_any(string_split(lower(p_name), ' '),
             |                   ['red', 'blue', 'small'])
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P12 — inf/NaN sanitization (reference replace([inf,-inf],nan).fillna(0)
    // at lx_lightgbmTest.py:57): guarded division + coalesce-to-0.
    "p12_sanitize" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .withColumn("ratio",
          coalesce(col("l_extendedprice") / nullif(col("l_quantity") - lit(25.0), lit(0.0)), lit(0.0)))
        .groupBy("l_linestatus")
        .agg(round(sum("ratio"), 2).as("sum_ratio"), count(lit(1)).as("n"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |round(sum(coalesce(l_extendedprice / nullif(l_quantity - 25.0, 0.0), 0.0)), 2) AS sum_ratio,
             |count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Engine-added — 2-D skyline (Pareto front): the parts no other part
    // beats on BOTH price (minimize) and size (maximize). The classic
    // nested-loop dominance test is O(n²); sorted by (price asc, size desc,
    // key), a point is on the front iff its size strictly exceeds the
    // EXCLUSIVE prefix max of size — one ops.Cumulative.runningMaxExclusive
    // pass (range-partitioned, broadcast offsets — no unpartitioned window,
    // no pair join). Duplicate dominant points keep their first
    // representative by key (deterministic variant). Integer cents/sizes,
    // so dominance is exact; the front is at most |distinct sizes| rows.
    "o6_skyline" -> QueryDef(
      (s, dir) => {
        val pts = Tables.part(s, dir).select(
          col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("price"),
          col("p_size").cast("long").as("size"))
        graft.ops.Cumulative.runningMaxExclusive(
            pts, Seq(col("price"), col("size").desc, col("p_partkey")), col("size"), "mx")
          .filter(col("size") > coalesce(col("mx"), lit(-1L)))
          .select(round(col("price").cast("double") / 100, 2).as("price_usd"),
            col("size"), col("p_partkey").as("partkey"))
          .orderBy("price_usd")
      },
      Some("""WITH p AS (SELECT p_partkey,
             |    CAST(round(p_retailprice * 100) AS BIGINT) AS price,
             |    CAST(p_size AS BIGINT) AS size
             |  FROM part),
             |m AS (SELECT p_partkey, price, size,
             |    max(size) OVER (ORDER BY price, size DESC, p_partkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
             |  FROM p)
             |SELECT round(CAST(price AS DOUBLE) / 100, 2) AS price_usd, size,
             |  p_partkey AS partkey
             |FROM m WHERE size > coalesce(mx, -1)
             |ORDER BY price_usd""".stripMargin)),

    // S17 — tolerant CSV scan with quarantine accounting (the CSV sibling
    // of S3's JSON-lines tolerance): a deterministically-poisoned CSV
    // (every orderkey ≡ 0 mod 13 writes an unparseable value in the cents
    // column) reads back under PERMISSIVE with an explicit schema +
    // _corrupt_record capture; clean rows keep their parsed fields,
    // malformed rows carry the raw line AND their parseable prefix fields —
    // so the quarantine report can still say WHICH keys went bad. Two
    // Spark CSV subtleties are load-bearing here and documented by the
    // oracle: (a) a record with FEWER tokens than the schema is padded
    // with nulls, NOT flagged corrupt; (b) required-column pruning means a
    // bad value only flags when the query actually reads that column — so
    // the poison sits in `cents`, which the aggregate reads. The oracle
    // computes the same split from the injection arithmetic, so a reader
    // that silently drops or mis-flags rows fails the hash. At scale this
    // is the ingest-edge pattern: never fail the scan, account for every
    // row.
    "s17_csv_quarantine" -> QueryDef(
      (s, dir) => {
        val lines = Tables.orders(s, dir)
          .select(when(pmod(col("o_orderkey"), lit(13L)) === 0,
              concat_ws(",", col("o_orderkey"), col("o_custkey"), lit("NOT_A_NUMBER")))
            .otherwise(concat_ws(",", col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice") * 100).cast("long"))).as("line"))
        val path = graft.ops.Staged.appRoot(s) + "/csvq-" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
        lines.select("line").as(org.apache.spark.sql.Encoders.STRING)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
        s.read
          .schema("o_orderkey LONG, o_custkey LONG, cents LONG, _corrupt_record STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(path)
          .agg(
            sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_clean"),
            sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
              .as("n_quarantined"),
            sum(when(col("_corrupt_record").isNull, col("cents"))).as("clean_cents"),
            sum(when(col("_corrupt_record").isNotNull, col("o_orderkey")))
              .as("bad_key_checksum"))
      },
      Some("""SELECT
             |  CAST(sum(CASE WHEN o_orderkey % 13 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_clean,
             |  CAST(sum(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_quarantined,
             |  CAST(sum(CASE WHEN o_orderkey % 13 <> 0
             |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
             |    AS clean_cents,
             |  CAST(sum(CASE WHEN o_orderkey % 13 = 0 THEN o_orderkey END) AS BIGINT)
             |    AS bad_key_checksum
             |FROM orders""".stripMargin))
  )
}
