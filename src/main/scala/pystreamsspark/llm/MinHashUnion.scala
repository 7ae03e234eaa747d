package pystreamsspark.llm

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom UDAF (SURVEY.md §2.9): element-wise-min union of MinHash
  * signatures — aggregates per-document signatures into one signature
  * for a whole group (a source, a language, a partition of the corpus).
  *
  * MinHash property: sig(A ∪ B) = elementwise_min(sig(A), sig(B)), so
  * this Aggregator computes the signature of the UNION of all documents'
  * shingle sets — usable to estimate cross-corpus Jaccard overlap
  * without touching the raw text again.
  *
  * The merge is associative + commutative → Spark runs it as partial
  * aggregation (map-side combine) before one shuffle of numHashes longs
  * per group: the exact two-phase reduce shape of the reference's
  * parallel aggregates, at any scale.
  */
class MinHashUnion(val numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    val n = math.min(buf.length, sig.length)
    while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashUnion {
  /** Column-level UDAF: minhash_union(sigCol) for use in groupBy().agg. */
  def apply(numHashes: Int = 32): (Column => Column) = {
    val agg = udaf(new MinHashUnion(numHashes),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    (c: Column) => agg(c)
  }

  /** Estimated Jaccard between two group signatures: matching-slot
    * fraction. */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / math.min(a.length, b.length)
}
