package pystreamsspark.tools

import org.apache.spark.sql.SparkSession

/** Time selected queries (warm-up + best of 5, like Bench) without
  * running the whole suite. Honors SPARK_GRAFT_CPUS like Bench so
  * spot-check timings are directly comparable to bench rows.
  * Usage: runMain pystreamsspark.tools.Time <sfDir> <name...>
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      println(f"TIME $name ${Seq.fill(5)(run()).min}%.3f s")
    }
    spark.stop()
  }
}
