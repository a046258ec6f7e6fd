package graft.sources

import graft.pipelines.Pipelines
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lab-4 LLM report-prompt sink (S13 family; reference
  * 实习四/实习四代码/yelp_analysis.ipynb:6280-6360 builds an analysis-summary
  * dict and renders a markdown prompt asking an LLM to write the report).
  *
  * Same split as [[StatPanel]]: the summary NUMBERS are engine work — the
  * identical per-document polarity and per-source ranking frames the
  * oracle-checked lab4 query runs on — and the prompt DOCUMENT is driver
  * work over ≤ ~20 aggregate rows. PromptReportSpec pins the rendered
  * numbers against the lab4 query output, so the prompt can never drift
  * from the verified analysis.
  */
object PromptReport {

  /** Summary rows `(section, key, value)` (value already rendered to
    * string, Locale-free): `overview` (total_docs, total_sources),
    * `sentiment` (positive/negative/neutral pct at the ±0.1 thresholds,
    * corpus avg polarity), `top_positive` / `top_negative` (rank → source
    * by the lab-4 score, lexicographic tie-break). */
  def lab4SummaryRows(s: SparkSession, dir: String): DataFrame = {
    val perDoc = Pipelines.reviewPolarity(s, dir)
    val ranked = Pipelines.reviewSentimentRanked(s, dir)

    val sentiment = perDoc.agg(
        count(lit(1)).as("total_docs"),
        round(avg(when(col("polarity") > 0.1, 1.0).otherwise(0.0)) * 100, 1)
          .as("positive_pct"),
        round(avg(when(col("polarity") < -0.1, 1.0).otherwise(0.0)) * 100, 1)
          .as("negative_pct"),
        round(avg(coalesce(col("polarity"), lit(0.0))), 3).as("avg_polarity"))
      .withColumn("neutral_pct",
        round(lit(100.0) - col("positive_pct") - col("negative_pct"), 1))

    val overview = sentiment
      .crossJoin(broadcast(ranked.agg(count(lit(1)).as("total_sources"))))
      .select(explode(map(
        lit("total_docs"), col("total_docs").cast("string"),
        lit("total_sources"), col("total_sources").cast("string"),
        lit("positive_pct"), col("positive_pct").cast("string"),
        lit("negative_pct"), col("negative_pct").cast("string"),
        lit("neutral_pct"), col("neutral_pct").cast("string"),
        lit("avg_polarity"), col("avg_polarity").cast("string"))).as(Seq("key", "value")))
      .withColumn("section",
        when(col("key").isin("total_docs", "total_sources"), lit("overview"))
          .otherwise(lit("sentiment")))

    // top/bottom-5 sources: orderBy.limit is a TakeOrderedAndProject; the
    // 5-row rank comes from a broadcast self-count (no global window).
    def topK(desc: Boolean): DataFrame = {
      val ord = if (desc) Seq(col("score").desc, col("source"))
      else Seq(col("score").asc, col("source"))
      val k = ranked.orderBy(ord: _*).limit(5)
        .select(col("source"), col("score"))
      k.join(broadcast(k.select(col("source").as("s2"), col("score").as("sc2"))),
          if (desc) col("sc2") > col("score") ||
            (col("sc2") === col("score") && col("s2") <= col("source"))
          else col("sc2") < col("score") ||
            (col("sc2") === col("score") && col("s2") <= col("source")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("rank"))
        .select(lit(if (desc) "top_positive" else "top_negative").as("section"),
          col("rank").cast("string").as("key"), col("source").as("value"))
    }

    overview.select("section", "key", "value")
      .unionByName(topK(desc = true)).unionByName(topK(desc = false))
  }

  /** Driver-side markdown prompt over the collected summary rows — the
    * reference's create_llm_prompt shape: background, overview, sentiment
    * findings, ranked sources, report instructions. */
  def renderPrompt(rows: Seq[(String, String, String)], corpus: String): String = {
    val bySection = rows.groupBy(_._1)
    def v(section: String, key: String): String =
      bySection.getOrElse(section, Seq.empty)
        .collectFirst { case (_, k, value) if k == key => value }.getOrElse("N/A")
    def rankList(section: String): String =
      bySection.getOrElse(section, Seq.empty)
        .sortBy(_._2).map(r => s"- ${r._3}").mkString("\n")
    s"""# Review sentiment analysis — report-writing prompt
       |
       |## Background
       |Lexicon-based sentiment analysis over the `$corpus` document corpus,
       |aggregated per source. Generate a professional analysis report from
       |the findings below.
       |
       |## Overview
       |- Documents analyzed: ${v("overview", "total_docs")}
       |- Sources analyzed: ${v("overview", "total_sources")}
       |
       |## Sentiment findings
       |- Positive share: ${v("sentiment", "positive_pct")}%
       |- Negative share: ${v("sentiment", "negative_pct")}%
       |- Neutral share: ${v("sentiment", "neutral_pct")}%
       |- Mean polarity: ${v("sentiment", "avg_polarity")}
       |
       |## Highest-scored sources
       |${rankList("top_positive")}
       |
       |## Lowest-scored sources
       |${rankList("top_negative")}
       |
       |## Report requirements
       |Structure the report as summary, method, findings, and
       |recommendations; reference only the numbers above and state the
       |±0.1 polarity thresholds used for the positive/negative split.
       |""".stripMargin
  }

  /** Engine rows land as a JSON report (`rows/`), the rendered prompt as
    * `prompt.md` — both under `outDir`. */
  def writeLab4Prompt(s: SparkSession, dir: String, outDir: String,
      corpus: String = "documents"): Unit = {
    val rows = lab4SummaryRows(s, dir)
    IO.writeReportJson(rows, s"$outDir/rows")
    val collected = rows.orderBy("section", "key").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/prompt.md"),
      renderPrompt(collected, corpus)): Unit
  }
}
