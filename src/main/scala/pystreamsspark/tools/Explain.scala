package pystreamsspark.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for selected queries
  * (all, or the names given as args after the sf dir). Used to keep the
  * plans honest — scan-level filter pushdown, pruned ReadSchema,
  * broadcast sides, WholeStageCodegen coverage.
  *
  * Usage: runMain pystreamsspark.tools.Explain <sfDir> [name...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val picked: Seq[String] =
      if (names.nonEmpty) names.toSeq else qs.keys.toSeq.sorted
    picked.foreach { name =>
      println(s"\n========== $name ==========")
      qs(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
