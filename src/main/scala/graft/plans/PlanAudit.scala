package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan,
  WholeStageCodegenExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
  BroadcastNestedLoopJoinExec, CartesianProductExec,
  SortMergeJoinExec}
import org.apache.spark.sql.functions.lit

/** PLAN-SHAPE auditing as a runtime operator — the `.explain` checks
  * that keep the 100 TB story true (PlanShapeSpec's assertions),
  * liftable into any pipeline as data: a nightly job can gate its
  * own deployment on "no new shuffle regressed into this plan" the
  * way this repo's specs gate commits. Counts come from walking the
  * PRE-AQE physical plan (`sparkPlan` — deterministic under adaptive
  * execution, the PlanShapeSpec stance), not from string-matching
  * explain output.
  *
  * The audited facts are the ones that change at 100× data:
  * exchanges (every one is a corpus shuffle), join strategies (a
  * sort-merge that should broadcast pays two sorts of the corpus;
  * a cartesian/nested-loop is corpus² and almost always a bug),
  * whole-stage codegen spans (fragmented spans mean expression
  * evaluation fell off the fast path), and scans (a scan with no
  * pushed filters and no partition filters reads everything it
  * lists). */
object PlanAudit {

  final case class Audit(nShuffleExchanges: Int,
                         nBroadcastExchanges: Int,
                         nBroadcastHashJoins: Int,
                         nSortMergeJoins: Int,
                         nCartesianOrLoopJoins: Int,
                         nWholeStageSpans: Int,
                         nFileScans: Int,
                         nScansWithPushedFilters: Int,
                         nScansWithPartitionFilters: Int)

  /** Walk `df`'s FULLY-PREPARED static physical plan and count the
    * shape facts. "Prepared" matters: `sparkPlan` is the planner's
    * raw output BEFORE EnsureRequirements inserts exchanges and
    * CollapseCodegenStages fuses codegen spans — auditing it would
    * report 0 shuffles for any aggregation. So the audit re-plans
    * the logical plan with ADAPTIVE EXECUTION OFF and takes
    * `executedPlan`: exchanges and codegen present, no AQE wrapper
    * whose tree mutates at runtime — the deterministic audit
    * surface. (AQE can only improve on this static shape at runtime
    * — e.g. demote a sort-merge to broadcast on observed sizes —
    * so the audit is the conservative bound a gate should hold.)
    *
    * THREAD SAFETY (ADVICE r9): re-planning happens in a CLONED
    * session — `newSession()` with the caller's runtime SQL confs
    * copied over, AQE flipped off only there — never by mutating the
    * shared session's conf. The round-9 form set
    * spark.sql.adaptive.enabled=false on the caller's session and
    * restored it in a finally, which silently planned any CONCURRENT
    * query on that session with AQE off for the audit window. The
    * audit re-plans `df`'s ANALYZED plan (resolution already done, so
    * the clone needs no temp views), which is also why join-strategy
    * confs like autoBroadcastJoinThreshold are copied: the audited
    * shape must be the shape the caller's session would plan. */
  def auditPlan(df: DataFrame): Audit = {
    val spark = df.sparkSession
    val ns = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try ns.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    ns.conf.set("spark.sql.adaptive.enabled", "false")
    val plan: SparkPlan =
      ns.sessionState.executePlan(df.queryExecution.analyzed)
        .executedPlan
    def countIf(p: SparkPlan => Boolean): Int = plan.collect {
      case n if p(n) => 1
    }.sum
    val scans = plan.collect { case s: FileSourceScanExec => s }
    Audit(
      nShuffleExchanges = countIf(_.isInstanceOf[ShuffleExchangeExec]),
      nBroadcastExchanges =
        countIf(_.isInstanceOf[BroadcastExchangeExec]),
      nBroadcastHashJoins =
        countIf(_.isInstanceOf[BroadcastHashJoinExec]),
      nSortMergeJoins = countIf(_.isInstanceOf[SortMergeJoinExec]),
      nCartesianOrLoopJoins =
        countIf(n => n.isInstanceOf[CartesianProductExec] ||
          n.isInstanceOf[BroadcastNestedLoopJoinExec]),
      nWholeStageSpans =
        countIf(_.isInstanceOf[WholeStageCodegenExec]),
      nFileScans = scans.length,
      nScansWithPushedFilters =
        scans.count(_.metadata.get("PushedFilters")
          .exists(v => v.nonEmpty && v != "[]")),
      nScansWithPartitionFilters =
        scans.count(_.partitionFilters.nonEmpty))
  }

  /** The audit as a 1-row pane (the advisor-output idiom), for
    * oracling and for pipelines that LOG shape next to results. */
  def audit(df: DataFrame): DataFrame = {
    val a = auditPlan(df)
    df.sparkSession.range(1).select(
      lit(a.nShuffleExchanges.toLong).as("n_shuffle_exchanges"),
      lit(a.nBroadcastExchanges.toLong).as("n_broadcast_exchanges"),
      lit(a.nBroadcastHashJoins.toLong).as("n_broadcast_hash_joins"),
      lit(a.nSortMergeJoins.toLong).as("n_sort_merge_joins"),
      lit(a.nCartesianOrLoopJoins.toLong)
        .as("n_cartesian_or_loop_joins"),
      lit(a.nWholeStageSpans.toLong).as("n_wholestage_spans"),
      lit(a.nFileScans.toLong).as("n_file_scans"),
      lit(a.nScansWithPushedFilters.toLong)
        .as("n_scans_pushed_filters"),
      lit(a.nScansWithPartitionFilters.toLong)
        .as("n_scans_partition_filters"))
  }

  /** The CI-gate form: fail fast when a plan's shape regresses past
    * the caller's budget — the deployment-time twin of the repo's
    * PlanShapeSpec commit gate. A cartesian/nested-loop join is
    * refused by default (corpus² at any scale); the shuffle budget
    * is the caller's statement of how many corpus-wide exchanges
    * this pipeline is ALLOWED to cost. */
  def gate(df: DataFrame, maxShuffleExchanges: Int,
           allowCartesian: Boolean = false): DataFrame = {
    val a = auditPlan(df)
    require(allowCartesian || a.nCartesianOrLoopJoins == 0,
      s"PlanAudit.gate: plan contains ${a.nCartesianOrLoopJoins} " +
        "cartesian/nested-loop join(s) — corpus-squared work; " +
        "broadcast the small side or fix the join keys")
    require(a.nShuffleExchanges <= maxShuffleExchanges,
      s"PlanAudit.gate: plan costs ${a.nShuffleExchanges} shuffle " +
        s"exchange(s), over the declared budget " +
        s"$maxShuffleExchanges — a new shuffle regressed into this " +
        "pipeline")
    df
  }

  /** [[gate]] against a DECLARED budget map — the one refusal
    * contract both gated pipeline runners share (Medallion /
    * ReferenceWarehouse), so the messages and the undeclared-table
    * rule cannot drift between them: a table missing from `budgets`
    * is refused (an undeclared table is an ungated table — exactly
    * the regression class the runner exists to catch). */
  def gateDeclared(df: DataFrame, qualified: String,
                   budgets: Map[String, Int]): DataFrame = {
    val budget = budgets.getOrElse(qualified,
      throw new IllegalArgumentException(
        s"PlanAudit.gateDeclared: no declared shuffle budget for " +
          s"$qualified — an undeclared table is an ungated table; " +
          "declare it in the runner's shuffleBudgets"))
    gate(df, budget)
  }
}
