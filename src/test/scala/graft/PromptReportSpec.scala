package graft

import graft.sources.PromptReport

/** S13 prompt-sink parity: the rendered lab-4 report prompt's numbers must
  * match the ORACLE-CHECKED lab4 query on the same inputs — a view over
  * verified aggregates, never a second computation that can drift. */
class PromptReportSpec extends SparkSpec {

  test("lab4 prompt renders engine rows and matches the oracle-checked query") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-prompt").toString
    PromptReport.writeLab4Prompt(spark, dir, out)

    val prompt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/prompt.md"))

    // oracle-checked reference numbers from the lab4 query itself
    val lab4 = SparkEntry.queries("lab4_review_sentiment")(spark, dir).head()
    val nSources = lab4.getAs[Long]("n_sources")
    val topSource = lab4.getAs[String]("top_source")

    assert(prompt.contains(s"Sources analyzed: $nSources"), prompt.take(600))
    // the lab4 winner (min_by on (-score, source)) must lead the ranked list
    val positives = prompt.split("## Highest-scored sources")(1)
      .split("## Lowest-scored sources")(0).trim.linesIterator.toSeq
    assert(positives.head === s"- $topSource", positives.mkString("|"))
    assert(positives.size === 5, positives.mkString("|"))

    // sentiment shares are percentages that sum to 100 (1dp rounding)
    val pct = "(?m)^- (Positive|Negative|Neutral) share: (-?[0-9.]+)%$".r
    val shares = pct.findAllMatchIn(prompt).map(_.group(2).toDouble).toSeq
    assert(shares.size === 3, prompt)
    assert(math.abs(shares.sum - 100.0) < 0.11, shares.toString)

    // engine-side artifact: the JSON rows hold the same document total
    val rows = spark.read.schema("section STRING, key STRING, value STRING")
      .json(s"$out/rows")
    val totalDocs = rows.filter("section = 'overview' AND key = 'total_docs'")
      .head().getString(2)
    assert(prompt.contains(s"Documents analyzed: $totalDocs"))
    assert(totalDocs.toLong ===
      graft.core.Tables.documents(spark, dir).count())
  }
}
