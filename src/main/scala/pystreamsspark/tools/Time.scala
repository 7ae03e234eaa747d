package pystreamsspark.tools

import org.apache.spark.sql.SparkSession

/** Time selected queries (warm-up + best of 3, like Bench) without
  * running the whole suite.
  * Usage: runMain pystreamsspark.tools.Time <sfDir> <name...>
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
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
      println(f"TIME $name ${Seq.fill(3)(run()).min}%.3f s")
    }
    spark.stop()
  }
}
