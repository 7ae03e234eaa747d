package pystreamsspark.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import pystreamsspark.io.{SnapshotTable, SnapshotV2Table}

/** Analyzer rule (injected by GraftExtensions) that makes SQL READS of
  * merge-on-read snapshot tables work: a V2 catalog scan is a raw file
  * read and cannot apply the deletion-vector anti-join, so a
  * [[DataSourceV2Relation]] over a [[SnapshotV2Table]] whose snapshot
  * carries live DVs is rewritten into the DV-aware logical plan of
  * [[SnapshotTable.read]] (parquet scan + broadcast anti-join on
  * (file, pos)), exprId-aligned to the relation's output so the rest of
  * the query is untouched. DV-free snapshots keep the fully native V2
  * scan (pushdown/pruning/bucketing); on sessions WITHOUT extensions the
  * scan builder still refuses DV'd snapshots loudly.
  *
  * DML statements are skipped entirely: their target must remain a
  * relation for [[SnapshotDmlRule]] to intercept, and every DML executor
  * already reads DV-aware internally (the shared entry reader); a DML's
  * SOURCE subquery re-analyzes inside the executor as a standalone
  * SELECT, where this rule applies normally. */
object SnapshotDvReadRule extends Rule[LogicalPlan] {

  private def isDml(plan: LogicalPlan): Boolean = plan.exists {
    case _: DeleteFromTable | _: UpdateTable | _: MergeIntoTable |
         _: InsertIntoStatement | _: AppendData |
         _: OverwriteByExpression => true
    case _: SnapshotDmlCommand => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (isDml(plan)) plan
    else plan.transformUp {
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotV2Table
            if SnapshotTable.hasDeletionVectors(t.dir, t.versionAsOf) =>
          val dvPlan = SnapshotTable
            .read(SparkSession.active, t.dir, t.versionAsOf)
            .queryExecution.analyzed
          // re-key the DV-aware plan's columns onto the relation's
          // output ids so references above the relation stay valid
          Project(r.output.map { out =>
            val in = dvPlan.output.find(_.name == out.name).getOrElse(
              throw new IllegalStateException(
                s"DV-aware read of ${t.dir} misses column ${out.name}"))
            Alias(in, out.name)(exprId = out.exprId)
          }, dvPlan)
        case _ => r
      }
    }
}
