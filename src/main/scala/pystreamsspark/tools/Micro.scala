package pystreamsspark.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import pystreamsspark.llm.Dedup

/** Throwaway micro-bench: HOF shingle strings vs native shingle_hash —
  * isolates the gram-generation cost shared by the contamination /
  * boilerplate / inverted-index keys. */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pystreamsspark.functions.VectorExpressions.register(spark)
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"MICRO $name best=${runs.min}%.3f s (n=${f})")
    }

    val docs = Tables.documents(spark, sfDir)
    time("hof_shingle_strings") {
      docs.select(explode(Dedup.shingles($"text", 3)).as("g"))
        .agg(count(lit(1))).head.getLong(0)
    }
    time("native_shingle_strings") {
      docs.select(explode(Dedup.shinglesNative(spark, $"text", 3)).as("g"))
        .agg(count(lit(1))).head.getLong(0)
    }
    time("native_shingle_hash") {
      docs.select(explode(array_distinct(
          call_function("shingle_hash", pystreamsspark.llm.TextOps.tokens($"text"), lit(3))))
          .as("g"))
        .agg(count(lit(1))).head.getLong(0)
    }
    time("tokens_only") {
      docs.select(explode(split($"text", " ")).as("t")).filter($"t" =!= "")
        .agg(count(lit(1))).head.getLong(0)
    }
    spark.stop()
  }
}
