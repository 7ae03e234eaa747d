package pystreamsspark.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-safe loaders for the driver's parquet test tables.
  *
  * All tables are plain `spark.read.parquet` — the vectorized parquet
  * reader plus Catalyst predicate pushdown / column pruning make this the
  * right scan for any scale; at 100 TB the same call distributes across
  * executors with `spark.sql.files.maxPartitionBytes`-sized splits.
  *
  * One genuine quirk (SURVEY.md §7.4): historically `events.ts` was parquet
  * TIMESTAMP(NANOS), which Spark 4.x rejects by default; newer drops of the
  * test data write plain TIMESTAMP(MICROS). The loader adapts to whichever
  * physical type it finds: we always read with `nanosAsLong=true` so a
  * ns-typed file resolves (as LongType nanos-since-epoch) instead of
  * throwing, then branch on the *resolved* Spark type of `ts` — LongType
  * means the ns path (truncate to µs with integer division, identical to
  * DuckDB's ns→µs truncation, so oracle hash-matches hold); any timestamp
  * type passes through untouched. Hard-coding one file's physical layout is
  * exactly the brittleness a 100 TB engine can't afford — schemas drift.
  */
object Tables {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(s"$sfDir/$n.parquet")
    }

  def region(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** events with `ts` guaranteed to be a timestamp type (µs precision),
    * whether the file stores TIMESTAMP(NANOS) or TIMESTAMP(MICROS).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Runtime-settable in Spark 4.1; must be on before the read resolves.
    // Harmless when the file is µs-typed; required when it is ns-typed.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // nanosAsLong path: ns since epoch as int64 → truncate to µs.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Parquet timestamp[us] with isAdjustedToUTC=false resolves as NTZ.
        // All sessions pin spark.sql.session.timeZone=UTC, so this cast
        // reinterprets the wall clock as UTC — epoch micros are preserved
        // bit-for-bit, matching both the ns path above and DuckDB's view
        // of the same file.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        // Already TIMESTAMP (µs, UTC-adjusted) — use as-is.
        raw
    }
  }
}
