package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a DataFrame program plus (when SQL-expressible)
  * an equivalent DuckDB oracle statement over the same parquet tables.
  *
  * Contract (driver correctness gate):
  *  - column names must match the oracle's output column names exactly;
  *  - results must be deterministic: every query ends in a total ORDER BY,
  *    ties broken by explicit keys, doubles rounded (4dp unless noted),
  *    timestamps emitted as integer epoch seconds or formatted strings.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    headline: Boolean = false)

object QueryDef {
  /** Materialize a (small) query result and release its cached build-side
    * intermediates. Returning a lazy result over unpersisted caches silently
    * re-runs the whole DAG (the round-1 DBSCAN whale); returning it over
    * still-persisted caches leaks blocks that GC-thrash later queries in a
    * suite run. Eager localCheckpoint + unpersist avoids both. */
  def materialized(df: DataFrame, caches: DataFrame*): DataFrame = {
    val out = df.localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }
}

trait QueryCatalog {
  def defs: Map[String, QueryDef]
}
