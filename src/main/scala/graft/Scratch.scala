package graft
/** Dev scratchpad main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (round <- 1 to 2; name <- Seq("p10_keyword_any", "p3_dedup_by_key", "s1_scan_limit", "p1_projection")) {
      time(s"$name r$round") { SparkEntry.queries(name)(spark, dir).count() }
    }
    SparkEntry.queries("p10_keyword_any")(spark, dir).explain("formatted")
    spark.stop()
  }
}
