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
}
