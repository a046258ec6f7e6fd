package graft

/** Recall guard for the trained-quantizer IVF query: with nprobe=4 of 16
  * lists, the exact top-3 neighbors must be substantially recovered. */
class IvfSpec extends SparkSpec {

  test("v5 IVF recall@3 vs brute force >= 0.5 on sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val ivf = SparkEntry.queries("v5_ivf_trained")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    val brute = SparkEntry.queries("v1_knn_brute")(spark, dir)
      .filter("rn <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).toSet }
    val recalls = brute.map { case (p, exact) =>
      val got = ivf.getOrElse(p, Set.empty)
      exact.intersect(got).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@3 = $mean (per-probe: ${recalls.toSeq.sorted})")
  }

  test("v7 deterministic-codebook IVF recall@5 vs brute force >= 0.6 on sf0.01") {
    val dir = "/root/testdata/sf0.01"
    def pairs(name: String) = SparkEntry.queries(name)(spark, dir)
      .select("probe_id", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("v1_knn_brute")
    val ivf = pairs("v7_ivf_search")
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    // Measured 0.96 on the fixture; 0.6 guards the shape (nprobe=2 of 4
    // lists must recover well over half the true neighbors) without
    // over-fitting the floor to one dataset draw.
    assert(recall >= 0.6, s"recall@5 = $recall")
  }
}
