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

object TopKAgg {
  /** Column-level top-k UDAF: topK(k)(valueCol, payloadCol) — the tuple
    * input encoder flattens to two argument columns. */
  def topK(k: Int): ((Column, Column) => Column) = {
    val agg = udaf(new TopKByValue(k), ExpressionEncoder[(Double, Long)]())
    (v: Column, p: Column) => agg(v, p)
  }
}
