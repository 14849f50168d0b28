package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-WIDE structural anti-pattern gate: no query's physical plan
  * may sort or window DATA ROWS through a single partition. The
  * per-query `PlanSpec` asserts positive shapes for chosen queries;
  * this suite closes the complement — a future operator that sneaks in
  * a partitionless `Window.orderBy` or a `coalesce(1).sortWithinPartitions`
  * fails HERE, not at 100 TB.
  *
  * What is flagged: a `WindowExec`/`WindowGroupLimitExec`/`SortExec`
  * whose child (through projections/filters/AQE wrappers) is an
  * `Exchange SinglePartition`. What is NOT flagged: single-partition
  * exchanges feeding final single-row AGGREGATES (partial+final shape —
  * the exchange carries one row per upstream task, not data rows) and
  * `TakeOrderedAndProject` (driver-side k rows by construction).
  */
class GlobalPlanSpec extends AnyFunSuite with SparkSuite {

  import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SortExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
  import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
  import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

  private def feedsFromSingle(p: SparkPlan): Boolean = p match {
    case e: ShuffleExchangeExec => e.outputPartitioning == SinglePartition
    case _: ProjectExec | _: FilterExec | _: AQEShuffleReadExec =>
      p.children.exists(feedsFromSingle)
    case a: AdaptiveSparkPlanExec => feedsFromSingle(a.executedPlan)
    case qs: QueryStageExec => feedsFromSingle(qs.plan)
    case _ => false
  }

  private def offenders(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case w: WindowExec if w.children.exists(feedsFromSingle) => Seq(w)
      case w: WindowGroupLimitExec if w.children.exists(feedsFromSingle) => Seq(w)
      case s: SortExec if s.children.exists(feedsFromSingle) => Seq(s)
      case _ => Seq.empty
    }
    val below = p match {
      case a: AdaptiveSparkPlanExec => offenders(a.executedPlan)
      case qs: QueryStageExec => offenders(qs.plan)
      case _ => p.children.flatMap(offenders)
    }
    here ++ below
  }

  /** Queries whose single-partition sort is PROVEN metadata-scale —
    * each entry must name the bound in a comment; an unlisted hit
    * fails the gate.
    */
  private val provenBounded = Set(
    // disjoint-range proof windows over ONE ROW PER PARTITION
    // (GraftQueries.qGlobalSort:794 — the data sort itself is the
    // asserted range-partitioning Exchange)
    "q_global_sort",
    // CUSUM over the DAILY volume aggregate — one row per day
    // regardless of event volume (TimeSeries.scala:117)
    "q_changepoint")

  test("no catalog query sorts or windows data rows through a single partition") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    val boundedSeen = scala.collection.mutable.Set.empty[String]
    GraftQueries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val off = offenders(plan)
        if (off.nonEmpty) {
          if (provenBounded(name)) boundedSeen += name
          else bad += s"$name: ${off.map(_.nodeName).mkString(", ")}"
        }
      } finally graft.ops.OpCaches.releaseAll()
    }
    assert(bad.isEmpty,
      s"single-partition sort/window in:\n  ${bad.mkString("\n  ")}")
    // the allowlist must not rot: every entry still exhibits the shape
    // it documents (a stale entry would silently widen the gate)
    assert(boundedSeen == provenBounded,
      s"stale provenBounded entries: ${(provenBounded -- boundedSeen).mkString(", ")}")
  }
}
