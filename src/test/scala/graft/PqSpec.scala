package graft

import org.apache.spark.sql.functions._

/** Recall guard for the product-quantization ANN query: 16-bit codes (8
  * subspaces × 4 centroids) against exact L2 — ADC is an approximation, so
  * the pin is a floor on how much of the true top-5 the code-space search
  * recovers, plus the structural property that approximate distances are
  * non-negative and monotone within each probe's ranked list. */
class PqSpec extends SparkSpec {

  test("v8 PQ/ADC recall@5 vs exact L2 >= 0.3 on sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val pq = SparkEntry.queries("v8_pq_search")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    // exact L2 top-5 per probe, brute force over the same table
    val e = graft.core.Tables.embeddings(spark, dir)
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val exact = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("d2", expr(
        "aggregate(zip_with(embedding, pe, (a, b) -> CAST((a - b) * (a - b) AS DOUBLE)), 0D, (acc, x) -> acc + x)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
          .orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).toSet }
    val recalls = exact.map { case (p, ex) =>
      ex.intersect(pq.getOrElse(p, Set.empty)).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // Measured on the fixture; 0.3 guards the shape (32-bit codes + exact
    // re-rank of the ADC top-20 must beat random ~0.01) without over-fitting.
    assert(mean >= 0.3, s"mean ADC recall@5 = $mean (per-probe ${recalls.toSeq.sorted})")
    // ranked exact distances are non-negative and non-decreasing per probe
    val byProbe = SparkEntry.queries("v8_pq_search")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(3))).groupBy(_._1)
    byProbe.values.foreach { rs =>
      val ds = rs.sortBy(_._2).map(_._3)
      assert(ds.forall(_ >= 0.0))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }
}
