package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN scale-evidence harness (companion to ScaleEvidence / GeoScaleEvidence /
  * StreamScaleEvidence): measures the IVF candidate volume per probe at 1×
  * and 10× corpus under the two centroid policies, on the same relational
  * machinery the v5/v7 queries use (argmin-over-centroid-join assignment +
  * per-(cid,dim) mean recentering).
  *
  * The claim under test: with FIXED k (the oracle-frozen v5 shape, k=16),
  * candidates/probe = nprobe·n/k grows LINEARLY with the corpus — fine for
  * a verification-scale query, quadratic work if probes also scale with n.
  * The scale path is k ∝ √n (the standard IVF sizing rule): candidates/probe
  * ≈ nprobe·√n AND per-list training stays balanced, so probe cost grows
  * as √n — sublinear. Both policies run here so the 10× ratio table shows
  * the knob, not just asserts it.
  *
  * Deterministic corpus: C=64 planted cluster centers; vector i derives
  * from splitmix64(i, dim) noise around center (i mod C) — no RNG state,
  * any rerun is bit-identical.
  *
  * Usage: sbt "runMain graft.VecScaleEvidence" → prints one JSON line per
  * (policy, n) and writes VECSCALE_r06.json.
  */
object VecScaleEvidence {

  private def splitmix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** (vec_id, embedding: array<float>) with planted C-cluster structure. */
  private def corpus(spark: SparkSession, n: Int, dim: Int, clusters: Int): DataFrame = {
    import spark.implicits._
    val made = (0 until n).map { i =>
      val c = i % clusters
      val emb = Array.tabulate(dim) { d =>
        val center = (splitmix(c.toLong * 1063L + d) % 1000L) / 500.0f - 1.0f
        val noise = (splitmix(i.toLong * 7919L + d * 104729L) % 1000L) / 5000.0f
        center + noise
      }
      (i.toLong, emb)
    }
    spark.sparkContext.parallelize(made, 8).toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.core.GraftSession.local(cpus)
    val dim = 32
    val nprobe = 4
    val probes = 20

    def measure(n: Int, k: Int, policy: String): String = {
      val t0 = System.nanoTime()
      val e = corpus(spark, n, dim, clusters = 64).persist()
      e.count()
      // Real IVF training shape (v5/v7): argmin-distance assignment against
      // the center table, then per-(cid, dim) mean recentering, one round.
      // Cosine is the same argmax the queries rank by; centers broadcast.
      val init = e.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      def assign(centers: DataFrame): DataFrame = {
        val scored = e.join(broadcast(centers))
          .withColumn("cos", graft.functions.VectorExpr.vecCosine(col("embedding"), col("ce")))
        val w = Window.partitionBy("vec_id").orderBy(desc("cos"), col("cid"))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select("vec_id", "cid")
      }
      val a0 = assign(init).persist(); a0.count()
      val recentered = a0
        .join(e, "vec_id")
        .select(col("cid"), posexplode(col("embedding")))
        .groupBy("cid", "pos").agg(avg("col").as("cv"))
        .groupBy("cid").agg(
          array_sort(collect_list(struct(col("pos"), col("cv")))).as("s"))
        .select(col("cid"), transform(col("s"), x => x("cv").cast("float")).as("ce"))
      val assigned = assign(recentered).persist()
      val lists = assigned.groupBy("cid").agg(count(lit(1)).as("sz")).persist()
      val trainSec = (System.nanoTime() - t0) / 1e9

      // Candidates/probe: size of the nprobe nearest lists per probe vector.
      val t1 = System.nanoTime()
      val probeSide = e.filter(col("vec_id") < probes)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val pc = probeSide.join(broadcast(recentered))
        .withColumn("cos", graft.functions.VectorExpr.vecCosine(col("pe"), col("ce")))
      val wp = Window.partitionBy("probe_id").orderBy(desc("cos"), col("cid"))
      val probeLists = pc.withColumn("rn", row_number().over(wp))
        .filter(col("rn") <= nprobe).select("probe_id", "cid")
      val cand = probeLists.join(lists, "cid")
        .groupBy("probe_id").agg(sum("sz").as("n_cand"))
        .agg(avg("n_cand").as("mean"), max("n_cand").as("max"))
        .head()
      val searchSec = (System.nanoTime() - t1) / 1e9
      val maxList = lists.agg(max("sz")).head().getLong(0)
      val nonEmpty = lists.count()
      e.unpersist(); a0.unpersist(); assigned.unpersist(); lists.unpersist()
      f"""{"policy":"$policy","n":$n,"k":$k,"nprobe":$nprobe,"cand_per_probe":${cand.getDouble(0)}%.1f,"cand_max":${cand.getLong(1)},"max_list":$maxList,"lists_nonempty":$nonEmpty,"train_sec":$trainSec%.2f,"search_sec":$searchSec%.2f}"""
    }

    val rows = Seq(
      measure(4000, 16, "fixed_k"),
      measure(40000, 16, "fixed_k"),
      measure(4000, math.ceil(math.sqrt(4000)).toInt, "sqrt_k"),
      measure(40000, math.ceil(math.sqrt(40000)).toInt, "sqrt_k"))
    rows.foreach(println)

    val out = new java.io.PrintWriter("VECSCALE_r06.json")
    try {
      out.println("{")
      out.println(""" "round": 6,""")
      out.println(""" "harness": "graft.VecScaleEvidence",""")
      out.println(""" "note": "IVF candidate volume per probe at 1x/10x corpus (dim 32, 64 planted clusters, nprobe 4, real assignment+recenter machinery): fixed k is the oracle-frozen v5 shape and grows ~linearly; k ~ sqrt(n) is the documented 100 TB sizing rule and grows ~sqrt(n)",""")
      out.println(""" "results": [""")
      out.println(rows.mkString(",\n"))
      out.println(" ]\n}")
    } finally out.close()
    spark.stop()
  }
}
