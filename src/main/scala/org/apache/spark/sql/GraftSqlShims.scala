/* Shim into Spark's `private[sql]` surface — the standard extension
 * technique (a tiny object in the org.apache.spark.sql package tree) for
 * the two hooks a DML executor cannot reach through the public API:
 * turning an analyzed/unresolved LogicalPlan into a DataFrame, and the
 * active classic session. Nothing else lives here; all engine logic
 * stays in pystreamsspark.*. */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftSqlShims {
  /** `Dataset.ofRows`: analyze `plan` in `spark` and wrap it as a
    * DataFrame — how a MERGE/INSERT source subquery becomes a frame the
    * snapshot-table machinery can consume. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The active session as the classic implementation (what Spark's own
    * file-source tables take). */
  def activeClassic(): classic.SparkSession = classic.SparkSession.active
}
