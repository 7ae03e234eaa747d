package pystreamsspark.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Top-k-per-group as a partial-aggregating UDAF (SURVEY.md §2.5/§2.9).
  *
  * The window formulation (`row_number() <= k`) must shuffle EVERY row
  * to its group's partition and sort there. This Aggregator keeps a
  * bounded k-element list per group on the MAP side, so only
  * n_groups × k rows cross the shuffle — at 100 TB with large groups
  * that is the difference between moving the table and moving the
  * answer.
  *
  * Ordering: by value DESC, tie-broken by payload ASC — a total order,
  * so results are deterministic and oracle-checkable.
  */
class TopKByValue(val k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, p) => (-v, p) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    ((buf :+ in).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    ((a ++ b).sorted(ord)).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

/** k smallest longs per group, kept bounded on the MAP side — the
  * posting-list/cap shape: a stopword-gram's full posting list is the
  * corpus, but only n_groups × k ids ever cross the shuffle. Output is
  * ascending (a total order on distinct inputs; duplicates are kept,
  * callers that need set semantics dedup upstream). */
class SmallestKLongs(val k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], in: Long): Seq[Long] =
    if (buf.length < k) (buf :+ in).sorted
    else if (in >= buf.last) buf
    else ((buf :+ in).sorted).take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    ((a ++ b).sorted).take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object TopKAgg {
  /** Column-level top-k UDAF: topK(k)(valueCol, payloadCol) — the tuple
    * input encoder flattens to two argument columns. */
  def topK(k: Int): ((Column, Column) => Column) = {
    val agg = udaf(new TopKByValue(k), ExpressionEncoder[(Double, Long)]())
    (v: Column, p: Column) => agg(v, p)
  }

  /** Bounded min-k UDAF: smallestK(k)(longCol) → ascending array. */
  def smallestK(k: Int): (Column => Column) = {
    val agg = udaf(new SmallestKLongs(k), ExpressionEncoder[Long]())
    (c: Column) => agg(c)
  }
}
