package graft

import graft.queries.MLQueries

/** The 999-rep LISA option (reference esda default) against the
  * oracle-checked 49-rep default: quadrant structure must be identical
  * (quads depend only on the OBSERVED z/lag, not the permutation count) and
  * the permutation p-values must agree in aggregate — more reps only
  * refines the same null distribution. */
class LisaPermutationSpec extends SparkSpec {

  test("999-rep p-values keep the 49-rep quadrant structure and p-value scale") {
    val dir = "/root/testdata/sf0.001"
    def byQuad(reps: Int): Map[String, (Long, Long, Double)] =
      MLQueries.lisaPvalues(spark, dir, reps).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
    val d49 = byQuad(49)
    val d999 = byQuad(999)
    // quadrant sets and sizes are permutation-independent
    assert(d999.keySet === d49.keySet)
    d49.foreach { case (q, (n49, _, _)) => assert(d999(q)._1 === n49, s"quad $q size") }
    // the finer null only refines p: per-quad averages stay close, and
    // 0.05-significant counts stay in the same regime (within half the
    // quadrant, absolute slack 3 for small quads)
    d49.foreach { case (q, (n, sig49, p49)) =>
      val (_, sig999, p999) = d999(q)
      assert(math.abs(p999 - p49) < 0.1, s"quad $q avg_p $p49 vs $p999")
      assert(math.abs(sig999 - sig49) <= math.max(3L, n / 2), s"quad $q n_sig $sig49 vs $sig999")
    }
  }
}
