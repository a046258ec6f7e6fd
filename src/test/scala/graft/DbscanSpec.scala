package graft

import graft.ml.Dbscan
import org.apache.spark.sql.functions._

/** DBSCAN pinned against an in-test brute-force implementation of the SAME
  * deterministic spec (min-core-label clusters; border → min-label core
  * neighbor) — SURVEY §7.4.1's required fixture validation. */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int)
      : Map[Long, Long] = {
    val n = pts.size
    val idx = pts.indices
    def d2(i: Int, j: Int) = {
      val (_, x1, y1) = pts(i); val (_, x2, y2) = pts(j)
      (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
    }
    val nbrs = idx.map(i => idx.filter(j => d2(i, j) <= eps * eps))
    val isCore = idx.map(i => nbrs(i).size >= minPts)
    // Union-find over core-core edges, min-label roots.
    val parent = Array.tabulate(n)(identity)
    def find(a: Int): Int = { var r = a; while (parent(r) != r) r = parent(r); r }
    for (i <- idx if isCore(i); j <- nbrs(i) if isCore(j)) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) {
        val (lo, hi) = if (pts(ri)._1 < pts(rj)._1) (ri, rj) else (rj, ri)
        parent(hi) = lo
      }
    }
    // Root compression to min id within component.
    val compMin = idx.filter(isCore).groupBy(find)
      .map { case (r, ms) => r -> ms.map(pts(_)._1).min }
    val labels = scala.collection.mutable.Map[Long, Long]()
    for (i <- idx if isCore(i)) labels(pts(i)._1) = compMin(find(i))
    for (i <- idx if !isCore(i)) {
      val coreNbrLabels = nbrs(i).filter(isCore).map(j => labels(pts(j)._1))
      labels(pts(i)._1) = if (coreNbrLabels.nonEmpty) coreNbrLabels.min else -1L
    }
    labels.toMap
  }

  test("matches brute force on the modular-lattice fixture (clusters, noise, every label)") {
    val pts = (0L until 300L).map(k =>
      (k, (k * 7919 % 600) / 100.0, (k * 104729 % 500) / 100.0))
    val eps = 0.3
    val minPts = 4
    val expected = bruteForce(pts, eps, minPts)
    val got = Dbscan.run(pts.toDF("id", "x", "y"), eps, minPts)
      .select("id", "label").as[(Long, Long)].collect().toMap
    assert(got.size === 300)
    assert(got === expected)
  }

  test("all-noise when eps is tiny; one cluster when eps spans everything") {
    val pts = (0L until 30L).map(k => (k, k * 1.0, 0.0))
    val noise = Dbscan.run(pts.toDF("id", "x", "y"), eps = 0.1, minPts = 3)
    assert(noise.filter(col("label") === -1).count() === 30)
    val one = Dbscan.run(pts.toDF("id", "x", "y"), eps = 2.0, minPts = 3)
      .filter(col("label") >= 0).select(countDistinct("label")).head().getLong(0)
    assert(one === 1)
  }

  test("coincident collapse handles an all-points-one-coordinate pathology without blowup") {
    // every point at the SAME coordinate: pre-collapse this was the n² pair
    // join pathology; post-collapse it is ONE weighted grid row, so even a
    // cap of 1 admits it and the result is exact (all mutually at d=0,
    // >= minPts coincident -> one cluster labeled by the min id, all core)
    val coincident = (1L to 50L).map(i => (i, 3.14, 2.71)).toDF("id", "x", "y")
    val out = Dbscan.run(coincident, eps = 0.017, minPts = 5, maxCellCount = 1)
    assert(out.count() === 50L)
    assert(out.filter(col("label") === 1L && col("is_core")).count() === 50L)
    // kNN: each point's k neighbors are its k smallest-id coincident siblings
    val nn = graft.ml.Knn.neighbors(coincident, k = 3, cellSize = 0.017, maxCellCount = 1)
    assert(nn.count() === 150L)
    assert(nn.filter(col("d2") =!= 0.0).count() === 0L)
    val nbrsOf7 = nn.filter(col("aid") === 7L).orderBy("rn")
      .select("bid").as[Long].collect().toSeq
    assert(nbrsOf7 === Seq(1L, 2L, 3L))
  }

  test("dense-cell guard fails loudly on a distinct-points-one-cell pathology") {
    // 50 DISTINCT coordinates inside one eps-cell cannot be collapsed — the
    // pair join would be genuinely quadratic; the guard must refuse first
    val pathological = (1L to 50L).map(i => (i, 3.0 + i * 1e-4, 2.71)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Dbscan.run(pathological, eps = 0.017, minPts = 5, maxCellCount = 40)
    }
    assert(e.getMessage.contains("densest grid cell"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ml.Knn.neighbors(pathological, k = 3, cellSize = 0.017, maxCellCount = 40)
    }
    assert(e2.getMessage.contains("densest grid cell"))
    // at-cap density passes: same data under a cap that admits it
    val ok = Dbscan.run(pathological, eps = 0.017, minPts = 5, maxCellCount = 50)
    assert(ok.count() === 50L)
  }
}
