package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared query surface lives in graft.queries.* catalogs; each entry
  * pairs a DataFrame program with (when SQL-expressible) a DuckDB oracle
  * statement the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private val catalogs: Seq[QueryCatalog] = Seq(
    CoreQueries,
    AggQueries,
    JoinQueries,
    FuncQueries,
    SetQueries,
    TextQueries,
    DedupQueries,
    VectorQueries,
    MLQueries,
    GraphQueries,
    MLModelQueries,
    StreamQueries,
    MediaQueries,
    PipelineQueries,
    WindowQueries)

  lazy val all: Map[String, QueryDef] = {
    val merged = catalogs.flatMap(_.defs)
    require(merged.map(_._1).distinct.size == merged.size, "duplicate query names across catalogs")
    merged.toMap
  }

  /** Names of queries timed by the Bench headline suite. */
  lazy val headline: Seq[String] =
    all.collect { case (k, d) if d.headline => k }.toSeq.sorted

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the lab-1 high-density anomaly pipeline's hourly-count stage feeding
    * the 2σ + sessionize detector (SURVEY §7.2). */
  def entry(spark: SparkSession): DataFrame =
    all("w1_hourly_counts").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, d) if d.oracle.isDefined => k -> d.oracle.get }
}
