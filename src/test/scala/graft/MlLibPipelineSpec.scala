package graft

import org.apache.spark.sql.functions._

/** Spec home for the MLlib-backed fits (SURVEY §2.9 M3 / M4) after their
  * rows-only query twins were retired: the seeded kmeans|| init and PCA
  * eigenvector sign are solver/partitioning-dependent, so no SQL oracle can
  * hash them — the exact, oracle-checked forms of the same operators are
  * m3b_kmeans_lloyd / m4b_pca_power / v6_kmeans_embed. These tests pin the
  * model-fit invariants that ARE deterministic: partition sizes, variance
  * ordering, and projection geometry.
  */
class MlLibPipelineSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("M3 MLlib KMeans zoning partitions all customers into k zones") {
    val pts = graft.core.Tables.withSyntheticPoint(
        graft.core.Tables.customer(spark, sfDir), "c_custkey")
      .select(col("c_custkey").as("id"), col("lon").as("x"), col("lat").as("y"))
    val zoned = graft.ml.MlPipelines.kmeansZones(pts, k = 10)
    val sizes = zoned.groupBy("zone").count().collect()
    assert(sizes.length == 10, s"expected 10 zones, got ${sizes.length}")
    assert(sizes.map(_.getLong(1)).sum == pts.count(), "zone sizes must partition the input")
    assert(sizes.forall(_.getLong(1) > 0L), "no empty zones on the NYC-bbox point cloud")
  }

  test("M4 MLlib PCA projects every embedding and orders components by variance") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val (proj, explained) = graft.ml.MlPipelines.pcaProject(emb, "embedding", 2)
    assert(proj.count() == emb.count(), "projection preserves row count")
    assert(explained.length == 2 && explained.forall(v => v > 0.0 && v <= 1.0))
    assert(explained(0) >= explained(1), "PC1 explains at least as much variance as PC2")
    val v = proj.agg(variance(col("pc1")).as("v1"), variance(col("pc2")).as("v2")).head()
    assert(v.getDouble(0) >= v.getDouble(1), "projected variance follows component order")
  }
}
