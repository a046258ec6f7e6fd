package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by salting (SURVEY.md §4 / the 100 TB posture):
  * when the join key is low-cardinality or hot-key-skewed, a plain shuffle
  * join puts each key's entire volume on one task. Salting splits every
  * fact key into `salts` sub-keys and replicates the (small) dimension side
  * across them, so parallelism becomes keys × salts regardless of skew.
  *
  * AQE's skew-join splitting covers sort-merge joins after the fact; the
  * explicit salt is for the cases AQE can't rescue — low-cardinality keys
  * where even perfectly split partitions leave most of the cluster idle,
  * and aggregations downstream of the join keyed on the same hot key.
  *
  * The salt column is derived per-row (partition-local row position), never
  * random: results are identical to the unsalted join, only partitioning
  * changes.
  */
object SkewJoin {

  /** Inner equi-join of `fact` with a much smaller `dim` on `keys`,
    * spreading each key over `salts` shuffle sub-keys. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, keys :+ "_salt").drop("_salt")
  }

  /** Convenience: per-key dimension built by aggregation (the common
    * "join stats back to facts" shape that concentrates on hot keys). */
  def joinAggBack(fact: DataFrame, keys: Seq[String], aggs: Seq[Column],
      salts: Int): DataFrame = {
    val dim = fact.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    saltedJoin(fact, dim, keys, salts)
  }
}
