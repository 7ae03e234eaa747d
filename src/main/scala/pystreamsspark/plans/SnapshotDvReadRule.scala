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
  * A statement containing a DML whose TARGET is (or may still resolve
  * to) a graft table is skipped entirely: that target must remain a
  * relation for [[SnapshotDmlRule]] to intercept, and every graft DML
  * executor already reads DV-aware internally (the shared entry
  * reader); its SOURCE subquery re-analyzes inside the executor as a
  * standalone SELECT, where this rule applies normally. A DML whose
  * resolved target is FOREIGN (a non-graft table) gets its graft
  * source relations rewritten like any read — so `INSERT INTO
  * plain_tbl SELECT … FROM graft_mor_t` works instead of hitting the
  * scan-builder refusal. */
object SnapshotDvReadRule extends Rule[LogicalPlan] {

  private def graftTarget(plan: LogicalPlan): Boolean = plan match {
    case SubqueryAlias(_, c) => graftTarget(c)
    case r: DataSourceV2Relation => r.table.isInstanceOf[SnapshotV2Table]
    // not yet resolved — could still become a graft relation; stay out
    // of the way until the fixed point settles it
    case _: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation => true
    case _ => false
  }

  private def hasGraftDml(plan: LogicalPlan): Boolean = plan.exists {
    case d: DeleteFromTable     => graftTarget(d.table)
    case u: UpdateTable         => graftTarget(u.table)
    case m: MergeIntoTable      => graftTarget(m.targetTable)
    case i: InsertIntoStatement => graftTarget(i.table)
    case a: AppendData          => graftTarget(a.table)
    case o: OverwriteByExpression => graftTarget(o.table)
    case _: SnapshotDmlCommand  => true
    case _ => false
  }

  /** Cheap pre-check: a table that never saw a deletion vector has no
    * `dv/` directory at all — one stat call instead of a manifest
    * listing+parse per analyzer iteration (the overwhelmingly common
    * DV-free case). */
  private def mayHaveDvs(dir: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir, "dv"))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (hasGraftDml(plan)) plan
    else plan.transformUp {
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotV2Table if mayHaveDvs(t.dir) &&
            SnapshotTable.hasDeletionVectors(t.dir, t.versionAsOf) =>
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
