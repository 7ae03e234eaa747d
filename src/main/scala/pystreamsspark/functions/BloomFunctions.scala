package pystreamsspark.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, BloomFilterMightContain}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter build + membership as SQL functions.
  *
  * Spark ships production Bloom machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the expressions behind AQE's injected
  * runtime filters) but does not register it in the public function
  * registry. Exposing it through our extension point gives pipelines an
  * explicit pre-filter primitive: build one compact filter over a huge
  * key set (partial aggregation — each executor builds a local filter,
  * merge is bitwise OR), broadcast the bytes, and drop non-members
  * map-side before any shuffle/join. No false negatives, tunable false
  * positives — the standard 100 TB incremental-dedup shape (see
  * `llm.Dedup.deltaWithBloom`).
  *
  *   - `bloom_agg(xxhash64(key), expectedItems)` → binary
  *   - `bloom_contains(filterBytes, xxhash64(key))` → boolean
  */
object BloomFunctions {
  val entries: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("bloom_agg",
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
      (es: Seq[Expression]) => es match {
        case Seq(child) => new BloomFilterAggregate(child)
        case Seq(child, items) => new BloomFilterAggregate(child, items)
        case Seq(child, items, bits) => new BloomFilterAggregate(child, items, bits)
        case _ => throw new IllegalArgumentException(
          "bloom_agg(hashedKey[, expectedItems[, numBits]])")
      }),
    ("bloom_contains",
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_contains"),
      (es: Seq[Expression]) => BloomFilterMightContain(es(0), es(1))))

  /** Idempotent session-level registration. */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
