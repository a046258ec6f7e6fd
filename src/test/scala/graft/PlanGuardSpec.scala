package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Suite-wide physical-plan tripwire: no declared query may plan a
  * CartesianProductExec, ever, and a BroadcastNestedLoopJoinExec is only
  * tolerated for queries on the explicit allowlist below (each entry is a
  * deliberate tiny-side cross: a broadcast 1-row aggregate frame from the
  * two-phase-agg pattern, or a k-row model side). PlanSpec pins these
  * properties for individual headline queries; this guard makes the claim
  * for ALL of them, so a future edit that silently turns an equi-join into
  * a nested loop (the classic 100x-scale killer: one dropped join key and
  * the plan still "works" at sf0.001) fails the build by name.
  */
class PlanGuardSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose plan carries a BroadcastNestedLoopJoin whose tiny build
    * side the planner can't PROVE tiny (no maxRows bound in the logical
    * plan — e.g. a k-row center/model table produced by a groupBy). Every
    * entry must say what the broadcast side is and why it is O(1)/O(k). */
  private val bnljAllowed: Map[String, String] = {
    // ops.Cumulative prefix-sum/max: the offsets frame is one row per RANGE
    // PARTITION (<= shuffle-partition count — cluster-width, never
    // data-proportional), self-joined broadcast under a `<` predicate; a
    // groupBy aggregate has no maxRows bound, so the planner can't prove it.
    val cumulative = "bounded-by-partition-count Cumulative offsets frame"
    Map(
      "a11_pareto" -> cumulative,
      "a12_cdf" -> cumulative,
      "a16_group_deciles" -> (cumulative +
        " + per-flag offsets frame (one row per l_returnflag value)"),
      "a22_weighted_median" -> cumulative,
      "a23_gini" -> cumulative,
      "m2_knn_elbow" -> cumulative,
      "m21_bias_audit" -> cumulative,
      "m27_mann_whitney" -> cumulative,
      "m29_auc" -> cumulative,
      "o6_skyline" -> cumulative,
      "u12_negative_sampling" -> cumulative,
      "u9_temperature_mix" -> (cumulative + " + per-source quota frame (one row per source)"),
      "v1_knn_brute" -> "broadcast probe frame (vec_id < 5): probes x corpus IS the brute-force oracle baseline",
      "w27_gap_detection" -> "broadcast distinct event-type dimension crossed with the hour spine")
  }

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(nodes)
  }

  /** True when the BNLJ's broadcast build side has a PROVEN small row bound:
    * the topmost logical node linked under the build plan reports
    * maxRows <= 1000 (a no-grouping aggregate reports 1 — the two-phase-agg
    * scalar frame; a limit reports its limit). */
  private def tinyBuild(b: BroadcastNestedLoopJoinExec): Boolean = {
    val build = b.buildSide match { case BuildLeft => b.left; case BuildRight => b.right }
    nodes(build).view.flatMap(_.logicalLink).flatMap(_.maxRows)
      .headOption.exists(_ <= 1000L)
  }

  /** Queries keeping a documented GLOBAL window (empty partitionSpec) over
    * rows whose bound the planner can't prove: each entry states why the
    * windowed frame is post-aggregation-bounded, never data-proportional. */
  private val globalWindowAllowed: Map[String, String] = Map.empty

  /** True when the unpartitioned WindowExec's input has a proven small row
    * bound (same maxRows proof as [[tinyBuild]]): a global window over a
    * <=1000-row frame is one task over nothing — fine at any scale. */
  private def tinyWindow(w: org.apache.spark.sql.execution.window.WindowExec): Boolean =
    nodes(w.child).view.flatMap(_.logicalLink).flatMap(_.maxRows)
      .headOption.exists(_ <= 1000L)

  test("no declared query plans a cartesian product; nested-loop joins need a tiny build side") {
    val failures = SparkEntry.all.toSeq.sortBy(_._1).flatMap { case (name, d) =>
      val r =
        try {
          val all = nodes(d.fn(spark, sfDir).queryExecution.executedPlan)
          val cart = all.exists(_.isInstanceOf[CartesianProductExec])
          val badBnlj = all.collect {
            case b: BroadcastNestedLoopJoinExec if !tinyBuild(b) => b
          }
          val badWin = all.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty && !tinyWindow(w) => w
          }
          if (cart) Some(name -> "CartesianProductExec in plan")
          else if (badBnlj.nonEmpty && !bnljAllowed.contains(name))
            Some(name -> "BroadcastNestedLoopJoinExec with unproven build-side bound")
          else if (badWin.nonEmpty && !globalWindowAllowed.contains(name))
            Some(name -> "global (unpartitioned) WindowExec with unproven input bound")
          else None
        } catch {
          case e: Throwable => Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
        }
      graft.core.GraftSession.releaseTransientBlocks(spark)
      r
    }
    assert(
      failures.isEmpty,
      s"\n${failures.size} queries tripped the plan guard:\n" +
        failures.map { case (n, m) => s"  $n — $m" }.mkString("\n"))
  }
}
