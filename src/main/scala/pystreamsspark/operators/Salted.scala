package pystreamsspark.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating two-phase ("salted") aggregation.
  *
  * For a groupBy whose key distribution is heavily skewed (one key owns a
  * large fraction of all rows), a single hash shuffle sends that key's
  * entire volume to one reducer. Salting splits each key into
  * `buckets` sub-keys for the first (heavy) aggregation pass, then
  * combines the per-salt partials in a second (tiny) pass:
  *
  *   phase 1: groupBy(key, salt) agg partials   — shuffle spread over
  *            buckets × reducers, no hot partition
  *   phase 2: groupBy(key) combine partials     — buckets rows per key
  *
  * Only ALGEBRAIC aggregates (sum/count/min/max — anything with an
  * associative combine) can be salted this way; the helpers below cover
  * the common set. The salt is derived deterministically from the whole
  * row (spark_partition_id + a per-row hash would also do; determinism
  * keeps results reproducible and testable).
  *
  * Note: for MOST skew cases on Spark 3.2+, AQE's skew-join/partition
  * splitting handles this automatically; explicit salting remains the
  * tool for extreme single-key aggregation skew at 100 TB.
  */
object Salted {

  /** Deterministic per-row salt in [0, buckets). */
  def salt(buckets: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Salted sum/count/min/max over `valueCol` grouped by `keyCols`.
    * Result schema: keyCols ++ (sum_<v>, cnt_<v>, min_<v>, max_<v>). */
  def aggStats(df: DataFrame, keyCols: Seq[String], valueCol: String,
               buckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    val v = col(valueCol)
    val phase1 = df
      .withColumn("__salt", salt(buckets, df.columns.map(col).toSeq))
      .groupBy((keys :+ col("__salt")): _*)
      .agg(
        sum(v).as("__s"), count(v).as("__c"),
        min(v).as("__mn"), max(v).as("__mx"))
    phase1
      .groupBy(keys: _*)
      .agg(
        sum(col("__s")).as(s"sum_$valueCol"),
        sum(col("__c")).as(s"cnt_$valueCol"),
        min(col("__mn")).as(s"min_$valueCol"),
        max(col("__mx")).as(s"max_$valueCol"))
  }
}
