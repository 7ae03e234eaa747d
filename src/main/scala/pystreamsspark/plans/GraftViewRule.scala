package pystreamsspark.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Resolution rule (extensions sessions): inline graft-catalog VIEW
  * bodies into the plan — see [[pystreamsspark.io.GraftViews]]. Inert
  * for plans without unresolved relations, so the fixpoint analyzer
  * pays one cheap scan per iteration. */
case class GraftViewRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    pystreamsspark.io.GraftViews.inline(spark, plan)
}
