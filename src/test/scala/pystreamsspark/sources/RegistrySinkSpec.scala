package pystreamsspark.sources

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** The V2 sink's commit protocol, asserted: committed totals equal the
  * written relation (count AND content checksum), partials arrive from
  * every task, overwrite replaces, and a mid-write failure publishes
  * nothing.
  */
class RegistrySinkSpec extends SparkSpec {

  private def checksumOf(ids: Seq[Long]): Long =
    ids.map { v =>
      var h = v * -7046029254386353131L
      h ^= h >>> 32
      h
    }.foldLeft(0L)(_ ^ _)

  test("commit folds every task's partials into exact totals") {
    SinkRegistry.clear()
    val df = spark.range(0, 10000).select(col("id")).repartition(8)
    df.write.format("pystreamsspark.sources.RegistrySink")
      .option("target", "t1").mode("append").save()
    val c = SinkRegistry.committed("t1")
    assert(c.rows === 10000L)
    assert(c.commits === 8) // one partial per task
    assert(c.checksum === checksumOf(0L until 10000L))
  }

  test("overwrite replaces the committed entry") {
    SinkRegistry.clear()
    def write(n: Long, mode: String): Unit =
      spark.range(0, n).write.format("pystreamsspark.sources.RegistrySink")
        .option("target", "t2").mode(mode).save()
    write(100, "append")
    assert(SinkRegistry.committed("t2").rows === 100L)
    write(50, "overwrite")
    assert(SinkRegistry.committed("t2").rows === 50L)
  }

  test("a failing write publishes nothing (abort path)") {
    SinkRegistry.clear()
    val boom = udf((id: Long) =>
      if (id == 666L) throw new RuntimeException("boom") else id)
    intercept[Exception] {
      spark.range(0, 1000).select(boom(col("id")).as("id"))
        .write.format("pystreamsspark.sources.RegistrySink")
        .option("target", "t3").mode("append").save()
    }
    assert(!SinkRegistry.committed.contains("t3"))
    assert(SinkRegistry.aborted.getOrElse("t3", 0) === 1)
  }
}
