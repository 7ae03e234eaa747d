package pystreamsspark.tools

import org.apache.spark.sql.SparkSession

/** Time selected queries (warm-up + best of N, like Bench) without
  * running the whole suite. Honors SPARK_GRAFT_CPUS like Bench so
  * spot-check timings are directly comparable to bench rows.
  *
  * SPARK_GRAFT_RUNS (default 5) sets the timed-run count; besides the
  * min (the Bench-comparable number) the tool prints median and max so
  * a run-to-run variance question — "is the driver's slow number an
  * outlier or the true cost?" — is answered by one invocation. With
  * SPARK_GRAFT_BENCH_APPEND=1 the per-key stats are appended to
  * BENCH_LOCAL.json as a `"metric":"probe"` JSONL line, extending the
  * dual-config ledger the round-6 verdict asked to preserve.
  * Usage: runMain pystreamsspark.tools.Time <sfDir> <name...>
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_CONF="k1=v1;k2=v2" — extra runtime SQL confs, so an
    // A/B (e.g. wholeStage codegen on/off) runs under identical JVM,
    // warm-up and data conditions
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ => sys.error(s"SPARK_GRAFT_CONF segment '$kv' is not key=value")
      }
    })
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val stats = args.drop(1).map { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val ts = Seq.fill(runs)(run()).sorted
      val med = ts(ts.length / 2)
      println(f"TIME $name min=${ts.head}%.3f med=$med%.3f max=${ts.last}%.3f s (n=$runs)")
      name -> (ts.head, med, ts.last)
    }
    if (sys.env.get("SPARK_GRAFT_BENCH_APPEND").contains("1")) {
      val qs = stats.map { case (k, (mn, md, mx)) =>
        s"\"$k\":{\"min\":${ms(mn)},\"med\":${ms(md)},\"max\":${ms(mx)}}"
      }.mkString("{", ",", "}")
      val conf = sys.env.get("SPARK_GRAFT_CONF")
        .map(c => s""","conf":"${c.replace("\\", "\\\\").replace("\"", "\\\"")}"""")
        .getOrElse("")
      val line = s"""{"metric":"probe","runs":$runs,"cpus":"$cpus","partitions":"$cpus"$conf,"queries":$qs,"sf":"$sfDir"}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
        (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    spark.stop()
  }
}
