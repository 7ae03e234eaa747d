package pystreamsspark.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Catalyst optimizer rule: the range-join strategy Spark lacks.
  *
  * A pure BETWEEN theta-join between two large relations has no equi
  * keys, so Spark plans BroadcastNestedLoopJoin (one side small) or a
  * cartesian — O(n·m) row comparisons either way. This rule rewrites
  *
  *   a JOIN b ON a.p >= b.lo AND a.p <= b.hi
  *
  * at the LOGICAL level into the bin-bucketed equi-join (the same
  * rewrite `operators.RangeJoin.pointInInterval` offers as an explicit
  * API, and the one every engine with a native range-join strategy
  * performs): the interval side explodes onto every fixed-width bin it
  * overlaps, the point side computes its single bin, and the join
  * becomes `bin(a.p) = bin_replica AND p BETWEEN lo AND hi` — an
  * equi-join with a residual filter that Catalyst then plans as a
  * shuffled hash / sort-merge join, fully parallel, no nested loop.
  * Exactly-once output needs no dedup: a (point, interval) pair meets
  * only in the point's unique bin.
  *
  * Scope and safety:
  *  - fires only on INNER joins whose condition is exactly the
  *    two-sided closed range (optionally under extra conjuncts that
  *    keep to one side — left as residual);
  *  - fires only when the condition has NO equi conjunct already
  *    (hash-joinable joins don't need it; also makes the rule
  *    idempotent — its own output contains the bin equi-conjunct);
  *  - numeric keys (cast to double, binWidth in value units) and
  *    TIMESTAMP keys (epoch-µs via UnixMicros, binWidth in µs — the
  *    commonest real-world range join is a time-BETWEEN); binning only
  *    GROUPS candidates — the residual predicate re-checks exact
  *    bounds, so float rounding in the bin id cannot change results,
  *    only bucket boundaries;
  *  - enabled by setting `spark.graft.rangeJoin.binWidth` to a
  *    positive double (pick it near the typical interval width:
  *    replication stays O(1) per interval). Unset/<= 0 disables.
  *
  * Register per session via `spark.experimental.extraOptimizations` or
  * for every session through `pystreamsspark.GraftExtensions`
  * (spark.sql.extensions), which injects it into the operator-
  * optimization batch.
  */
object RangeJoinBinRule extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Double =
    try conf.getConfString(BinWidthKey, "0").toDouble
    catch { case _: NumberFormatException => 0.0 }

  private def isNumeric(e: Expression): Boolean = e.dataType match {
    case _: org.apache.spark.sql.types.NumericType => true
    case _ => false
  }

  private def isTimestamp(e: Expression): Boolean =
    e.dataType == TimestampType

  /** All three range expressions must share one binnable category —
    * numeric (binWidth in value units) or timestamp (binWidth in
    * MICROSECONDS, the epoch-µs binning every time-BETWEEN join wants).
    * Mixed categories never type-check in a real range predicate, but
    * guard anyway. */
  private def binnable(p: Expression, lo: Expression, hi: Expression): Boolean =
    (isNumeric(p) && isNumeric(lo) && isNumeric(hi)) ||
      (isTimestamp(p) && isTimestamp(lo) && isTimestamp(hi))

  /** Split a conjunction into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** (point, lo, hi, pointOnLeft) when the conjunct set contains the
    * closed two-sided range and no cross-side equi conjunct. Extra
    * conjuncts must stay single-sided (they remain as residuals). */
  private def extractRange(cs: Seq[Expression], left: LogicalPlan,
                           right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // any cross-side equi conjunct -> already hash-joinable; also the
    // idempotency guard (our own rewrite emits one)
    val hasEqui = cs.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None
    // normalize each comparison to (smaller, larger)
    val lowers = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
    val uppers = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
    cs.foreach {
      case GreaterThanOrEqual(a, b) => lowers += ((b, a)) // b <= a
      case LessThanOrEqual(a, b)    => lowers += ((a, b))
      case _                        => ()
    }
    // a range is one conjunct lo <= p and one p <= hi over the same p,
    // with p on one side and lo/hi both on the other
    val all = lowers.toSeq
    for ((lo, p1) <- all; (p2, hi) <- all if p1.semanticEquals(p2)) {
      val p = p1
      if (binnable(p, lo, hi)) {
        (sideOf(p), sideOf(lo), sideOf(hi)) match {
          case (Some(pl), Some(ll), Some(hl)) if ll == hl && pl != ll =>
            // every OTHER conjunct must be single-sided (stays residual)
            val rangeConjuncts = Set[Expression]()
            val others = cs.filterNot {
              case GreaterThanOrEqual(a, b) =>
                (b.semanticEquals(lo) && a.semanticEquals(p)) ||
                  (b.semanticEquals(p) && a.semanticEquals(hi))
              case LessThanOrEqual(a, b) =>
                (a.semanticEquals(lo) && b.semanticEquals(p)) ||
                  (a.semanticEquals(p) && b.semanticEquals(hi))
              case _ => false
            }
            if (others.forall(sideOf(_).isDefined))
              return Some((p, lo, hi, pl))
          case _ => ()
        }
      }
    }
    None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        extractRange(conjuncts(cond), left, right) match {
          case Some((p, lo, hi, pointOnLeft)) =>
            // timestamps bin on epoch-µs (UnixMicros — ANSI-safe, no
            // timestamp→numeric cast); epoch-µs ≈ 1.7e15 < 2^53 so the
            // double division is exact enough to only move BUCKET
            // boundaries — the residual predicate re-checks exact bounds
            def binOf(e: Expression): Expression = {
              val num = if (isTimestamp(e)) Cast(UnixMicros(e), DoubleType)
                        else Cast(e, DoubleType)
              Floor(Divide(num, Literal(w, DoubleType)))
            }
            val (pointSide, intervalSide) =
              if (pointOnLeft) (left, right) else (right, left)
            // point side: stamp the single bin id
            val binP = Alias(binOf(p), "__graft_bin_p")()
            val newPoint = Project(pointSide.output :+ binP, pointSide)
            // interval side: one replica per overlapped bin
            val seq = new Sequence(binOf(lo), binOf(hi), None)
              .withTimeZone(conf.sessionLocalTimeZone)
            val explode = Explode(seq)
            val binI = AttributeReference("__graft_bin_i", LongType,
              nullable = explode.elementSchema.head.nullable)()
            val gen = Generate(explode,
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binI), child = intervalSide)
            val equi = EqualTo(binP.toAttribute, binI)
            val (newLeft, newRight) =
              if (pointOnLeft) (newPoint, gen) else (gen, newPoint)
            val rewritten =
              Join(newLeft, newRight, Inner, Some(And(equi, cond)), hint)
            logInfo(s"RangeJoinBinRule: rewrote BETWEEN theta-join to " +
              s"bin-bucketed equi-join (binWidth=$w)")
            Project(j.output, rewritten)
          case None => j
        }
    }
  }
}
