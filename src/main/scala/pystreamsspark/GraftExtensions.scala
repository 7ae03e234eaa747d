package pystreamsspark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import pystreamsspark.functions.{BloomFunctions, VectorExpressions}

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions for any session built with
  * `spark.sql.extensions=pystreamsspark.GraftExtensions` — the (c)-tier
  * extension mechanism of SURVEY.md §2.9, wired through the public
  * injectFunction API (no Catalyst fork).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    (VectorExpressions.functions ++ BloomFunctions.entries).foreach {
      case (name, info, builder) =>
        ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // the range-join strategy Spark lacks (no-op until
    // spark.graft.rangeJoin.binWidth is set positive)
    ext.injectOptimizerRule(_ => pystreamsspark.plans.RangeJoinBinRule)
    // the native as-of join physical operator (plans AsofJoinPlan nodes
    // built by operators.NativeAsof; inert for every other plan)
    ext.injectPlannerStrategy(_ => pystreamsspark.plans.AsofJoinStrategy)
    // SQL row-level DML (MERGE INTO / UPDATE / DELETE / INSERT) against
    // GraftCatalog snapshot tables — inert for every other relation
    ext.injectResolutionRule(_ => pystreamsspark.plans.SnapshotDmlRule)
    // graft-catalog persistent views: unresolved relations naming a
    // stored view inline their bodies (pushdown crosses the boundary);
    // inert for every other relation
    ext.injectResolutionRule(session =>
      pystreamsspark.plans.GraftViewRule(session))
    // DV-aware SQL reads of merge-on-read snapshot tables (relations
    // over DV-free snapshots keep the fully native V2 scan)
    ext.injectResolutionRule(_ => pystreamsspark.plans.SnapshotDvReadRule)
    // maintenance statements the ANSI grammar lacks (VACUUM / OPTIMIZE /
    // DESCRIBE HISTORY on snapshot tables); everything else delegates
    ext.injectParser((_, delegate) =>
      new pystreamsspark.plans.GraftSqlParser(delegate))
  }
}
