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

  test("M12 seeded random-search HPO: seed-reproducible, metrics hold the m12 band") {
    // the m12 pipeline's exact inputs (MLModelQueries m12: same target,
    // features, deterministic 70/30 hash split)
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .withColumn("y", col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * (lit(1.0) + col("l_tax")))
      .withColumn("is_train", pmod(col("l_orderkey") * lit(2654435761L), lit(100L)) < 70)
    val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def run() = graft.ml.MlPipelines.gbtFitRandomSearch(
      li.filter(col("is_train")), li.filter(!col("is_train")), feats, "y",
      nTrials = 4, seed = 42L)

    val (pred1, won1, imp1) = run()
    val (_, won2, imp2) = run()
    // one seed fully reproduces the search: winner and final model agree
    assert(won1 === won2, "same seed must pick the same trial")
    assert(imp1.toSeq === imp2.toSeq, "same seed must fit the same model")
    // the winner came from the declared space
    assert(Set(3.0, 4.0, 5.0, 7.0).contains(won1("maxDepth")))
    assert(won1("stepSize") >= 0.01 && won1("stepSize") <= 0.3)
    assert(math.abs(imp1.sum - 1.0) <= 1e-6 && imp1.max > 0.0)

    // metrics hold the same relative band the oracle-checked m12 verdict
    // row pins (ml.MlBands ceilings)
    val m = pred1.withColumn("err", col("prediction") - col("y"))
      .agg(avg(abs(col("err"))).as("mae"),
        sqrt(avg(col("err") * col("err"))).as("rmse"),
        (lit(1.0) - sum(col("err") * col("err")) /
          (var_samp(col("y")) * (count(lit(1)) - 1))).as("r2"),
        avg(col("y")).as("ybar")).head()
    val (mae, rmse, r2, ybar) = (m.getDouble(0), m.getDouble(1), m.getDouble(2), m.getDouble(3))
    assert(mae <= ybar * graft.ml.MlBands.MaeRelCeil, s"mae $mae vs ybar $ybar")
    assert(rmse <= ybar * graft.ml.MlBands.RmseRelCeil, s"rmse $rmse")
    assert(r2 >= graft.ml.MlBands.R2Floor, s"r2 $r2")
  }
}
