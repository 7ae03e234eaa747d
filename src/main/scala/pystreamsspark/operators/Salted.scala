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

  /** Skew-salted inner equi-join on `key`: the `big` side gets a
    * deterministic per-row salt in [0, buckets), the `small` side is
    * replicated once per salt value, and the join runs on (key, salt).
    * A key owning p% of `big`'s rows then occupies at most p/buckets of
    * any one shuffle partition instead of p — the hot reducer is gone.
    *
    * Use when BOTH of Spark's built-in skew escapes are unavailable:
    * `small` too big to broadcast, and AQE's skew-split not engaging —
    * it splits SMJ/SHJ partitions by map-output ranges (duplicating the
    * matching partition on the other side), but is skipped by default
    * whenever the split would add an exchange, e.g. precisely the common
    * shape of a groupBy on the join key right after the join. Salting
    * instead bakes the spread into the keys, so the downstream agg
    * repartitions on (key) once, hot key already diluted.
    * Cost: `small` is shuffled `buckets`× — so pick the smaller side as
    * `small` and keep `buckets` at the skew factor, not above.
    *
    * The salt is invisible in the result: every `big` row meets exactly
    * the `small` rows its key matches (each under precisely one salt),
    * so the output is row-identical to `big.join(small, key)` — which
    * is what makes the operator oracle-checkable. */
  def joinSkewed(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    val b = big.withColumn("__salt", salt(buckets, big.columns.map(col).toSeq))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

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
