package graft.sources

/** Resolves committed fixture files (under fixtures/: tsv, gpkg, tif) to
  * absolute paths independent of the process working directory: the cwd is tried
  * first (sbt forks with cwd = repo root), then parent directories, then an
  * explicit GRAFT_REPO_DIR override — so Bench/Verify launched from a
  * different directory still find the fixtures, and oracle SQL embeds a
  * path that exists. */
object Fixtures {
  def path(rel: String): String = {
    sys.env.get("GRAFT_REPO_DIR").map(d => new java.io.File(d, rel)).toSeq ++
      Iterator.iterate(new java.io.File(".").getAbsoluteFile)(_.getParentFile)
        .takeWhile(_ != null).take(4).map(new java.io.File(_, rel)).toSeq
  }.find(_.isFile)
    .map(_.getCanonicalPath)
    .getOrElse(new java.io.File(rel).getAbsolutePath)
}
