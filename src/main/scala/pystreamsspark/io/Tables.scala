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
  * One genuine quirk (SURVEY.md §7.4): `events.ts` is parquet
  * TIMESTAMP(NANOS), which Spark 4.x rejects by default. We read it as
  * nanos-since-epoch (`nanosAsLong`) and truncate to microseconds with
  * integer division — identical to DuckDB's native ns→µs truncation, so
  * oracle hash-matches hold.
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

  /** events with `ts` converted to TimestampType (µs), truncated from ns. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Runtime-settable in Spark 4.1; must be on before the read resolves.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
