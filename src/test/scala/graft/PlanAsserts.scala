package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared helper for executed-plan assertions: AQE wraps plans, so node
  * searches must flatten through AdaptiveSparkPlanExec, QueryStageExec
  * AND CommandResultExec (whose commandPhysicalPlan is a field, not a
  * child) — one definition, so the rule can't drift per suite.
  */
object PlanAsserts {
  def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case c: org.apache.spark.sql.execution.CommandResultExec =>
      c +: flatten(c.commandPhysicalPlan)
    case other => other +: other.children.flatMap(flatten)
  }
}
