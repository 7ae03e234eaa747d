package pystreamsspark.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize an ×N-amplified COPY of a testdata directory (self-union
  * with per-replica key offsets — the [[Stress]] construction, but
  * written to parquet in the driver's table layout), so the UNCHANGED
  * Bench / Verify / tools/Jobs / check.py harnesses run at sf(0.1·N)
  * against it by just pointing SPARK_GRAFT_SF_DIR at the output
  * (VERDICT r14 "Next round #3": one rung of scale — at sf0.1/local[32]
  * the whole suite is scheduler-overhead-bound and wall deltas say
  * nothing; at ×10 the structural claims must show).
  *
  * Key offsets are FK-coherent: every table sharing a key family gets
  * the same per-replica offset (orders.o_orderkey and
  * lineitem.l_orderkey move together, customer/supplier/part with their
  * lineitem/orders references), so joins produce ×N the rows at the
  * same per-key density, graphs grow in VERTICES (not degree), and the
  * amplified directory is self-consistent — the DuckDB oracle replays
  * the same files, so every oracle-checkable key stays checkable at ×N.
  * nation/region stay unamplified (dimension tables; their keys are
  * NOT offset in the fact tables). Offsets are large decimal powers so
  * modulo-based filters (s_suppkey % 10, o_orderkey % 4) keep selecting
  * the same per-replica rows; the 1e9 step clears the +1e7 id-planting
  * some similarity keys apply (planted ids never collide with the next
  * replica's).
  *
  * Deterministic by construction: fixed offsets, no randomness, one
  * output file per (table, replica) — byte-stable across runs.
  *
  * Usage: runMain pystreamsspark.tools.Amplify <srcSfDir> <outDir> [N]
  */
object Amplify {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val mult = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match the source fixtures' µs-typed timestamps (INT96 would
      // round-trip through DuckDB as nanos and risk 1-ulp drift)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val KEY = 1000000000L // shared offset step for all fact/dim keys

    def amplified(df: DataFrame, idCols: Seq[String]): DataFrame =
      (0 until mult).map { r =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(r * KEY)))
      }.reduce(_ unionByName _)

    // (table, key columns to offset). Empty = copy verbatim.
    val plan: Seq[(String, Seq[String])] = Seq(
      "region" -> Nil,
      "nation" -> Nil,
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_suppkey", "l_partkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    plan.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val df = if (keys.isEmpty) base else amplified(base, keys)
      // one file per replica keeps scan splits proportional to N and
      // the write deterministic
      val nFiles = if (keys.isEmpty) 1 else mult
      df.coalesce(nFiles).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"AMPLIFY $t x${if (keys.isEmpty) 1 else mult} -> $out/$t.parquet")
    }
    spark.stop()
  }
}
