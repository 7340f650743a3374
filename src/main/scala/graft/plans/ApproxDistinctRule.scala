package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, NamedExpression, Round}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

import graft.functions.{ThetaEstimate, ThetaSketchAgg}

/** Opt-in approximate-distinct rewrite — extension-ladder rung (c), a
  * `Rule[LogicalPlan]` injected into the optimizer: when the session
  * sets `spark.graft.approxDistinct=true`, every single-column
  * `COUNT(DISTINCT x)` over a sketchable type is rewritten to a theta
  * sketch aggregate + estimate (rounded back to the count's LongType).
  *
  * Why a RULE and not a function: the BlinkDB-style approximate mode
  * is a session-level decision — existing SQL and DataFrame code runs
  * unchanged, and the exact↔approx switch is one conf flip. At 100 TB
  * the rewrite removes the expand/double-shuffle that exact distinct
  * aggregation pays; the theta state is a few KB per group at any
  * cardinality (~0.8% RSE at the default lgk=14).
  *
  * Semantics honesty: this CHANGES RESULTS (by design, bounded error)
  * — hence opt-in-only, default off, and the flag is read at
  * optimization time so a query materialized while the flag is on
  * keeps its approximate nature visible in its executed plan
  * (`graft_theta_agg` in place of `count(distinct)`).
  *
  * Deliberately NOT rewritten: multi-column distincts (no single
  * sketch key), non-sketchable types, and distinct-ness used inside
  * other aggregates — only the canonical Count(distinct child) form.
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  val flagKey = "spark.graft.approxDistinct"

  private def sketchable(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      case LongType | IntegerType | StringType | BinaryType => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    // lenient parse: a typo'd flag value ("1", "yes", " True") must
    // degrade to exact mode, not crash the optimizer for every query
    // in the session
    if (!conf.getConfString(flagKey, "false").trim
          .equalsIgnoreCase("true")) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case AggregateExpression(Count(Seq(c)), mode, true, filter, _)
              if sketchable(c) =>
            val theta = AggregateExpression(ThetaSketchAgg(c, 14), mode,
              isDistinct = false, filter, NamedExpression.newExprId)
            Cast(Round(ThetaEstimate(theta), Literal(0)), LongType)
        }
    }

  /** Install on an EXISTING session via the public experimental hook
    * (`injectOptimizerRule` only applies at session build time).
    * Idempotent. The rule stays dormant until the flag is set. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(ApproxDistinctRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRule
}
