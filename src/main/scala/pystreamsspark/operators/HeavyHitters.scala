package pystreamsspark.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items sketch as a mergeable Spark Aggregator.
  *
  * Guarantee (Misra & Gries 1982): with capacity m, every item whose true
  * frequency exceeds n/(m+1) is present in the summary, and each summary
  * count underestimates the true count by at most n/(m+1). Merging two
  * summaries counter-wise and then subtracting the (m+1)-th largest count
  * preserves both bounds (Agarwal et al., "Mergeable Summaries", PODS
  * 2012) — which is exactly the partial+final aggregation contract, so
  * the sketch composes with Spark's map-side combine: each task ships at
  * most m counters regardless of how many distinct items it saw.
  *
  * This is the 100 TB shape for frequent-items: a full groupBy must
  * shuffle every distinct item (fine when the dictionary fits, ruinous
  * for open vocabularies); the sketch shuffles m counters per task, and
  * [[HeavyHitters.exactTopK]] turns it into an EXACT top-k with a
  * second bounded pass.
  */
class MisraGriesAgg(val m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < m => buf.updated(item, 1L)
      case None =>
        // decrement-all step: drop counters that reach zero
        buf.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (combined.size <= m) combined
    else {
      // subtract the (m+1)-th largest count, keep strictly positive
      val th = combined.values.toSeq.sorted(Ordering[Long].reverse)(m)
      combined.flatMap { case (k, c) => if (c > th) Some(k -> (c - th)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {

  /** mg(m)(col) → map<string,long> summary column. */
  def mg(m: Int): (Column => Column) = {
    val agg = udaf(new MisraGriesAgg(m), ExpressionEncoder[String]())
    (c: Column) => agg(c)
  }

  /** EXACT global top-k by frequency in two bounded passes:
    *
    *  1. Misra–Gries sketch (one shuffle of ≤ m counters per task) — its
    *     key set is a superset of every item with frequency > n/(m+1);
    *  2. exact recount of the ≤ m candidates only (broadcast semi join +
    *     one aggregation whose key space is the candidate set).
    *
    * The result equals the full-groupBy top-k whenever the exact k-th
    * count exceeds n/(m+1) — the "certificate": no non-candidate can
    * reach it. Callers pick m to make the certificate hold (spec-checked
    * on the test corpus); at 100 TB this replaces shuffling an open
    * vocabulary with shuffling m counters plus k answer rows. No driver
    * collect anywhere: the sketch row stays a 1-row DataFrame whose
    * exploded key set broadcasts into the semi join.
    */
  def exactTopK(items: DataFrame, itemCol: String, k: Int, m: Int = 512): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val cands = items.agg(mg(m)(col(itemCol)).as("sketch"))
      .select(explode(map_keys($"sketch")).as(itemCol))
    items.join(broadcast(cands), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, col(itemCol).asc)
      .limit(k)
  }
}
