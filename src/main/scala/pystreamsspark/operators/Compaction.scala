package pystreamsspark.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the unglamorous operator every 100 TB lake
  * needs: streaming ingest and fine-grained partitioning leave behind
  * directories of kilobyte parquet files whose per-file open/footer
  * cost eventually dominates scans (and whose count crushes the
  * driver's listing). Compaction rewrites a directory into files near
  * a target size: total bytes come from a driver-side LISTING (file
  * metadata only — no data moves to the driver), the output file count
  * is ceil(bytes/target), and the rewrite is one round-robin
  * repartition so every output file lands near the target.
  */
object Compaction {

  /** Rewrite the parquet directory `inDir` into `outDir` with files of
    * ~`targetBytes` each. Returns the output file count it chose. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(path)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    nOut
  }
}
