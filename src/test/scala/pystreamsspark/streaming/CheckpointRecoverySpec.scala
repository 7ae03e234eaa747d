package pystreamsspark.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import pystreamsspark.SparkSpec

/** Exactly-once across restart: a deduplicating stream with a file sink
  * is stopped mid-stream and restarted from its checkpoint; overlapping
  * input delivered after the restart must not produce duplicates in the
  * sink (state store + sink commit log both recover).
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("stateful dedup survives restart via checkpoint (exactly-once sink)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory(Paths.get("target"), "ckpt-")
    val inDir = base.resolve("in"); Files.createDirectories(inDir)
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("checkpoint").toString

    def writeBatch(ids: Range, file: String): Unit =
      ids.map(i => (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"),
          i % 7L, "click", i * 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(base.resolve(file).toString)

    def moveIn(file: String): Unit = {
      val src = base.resolve(file)
      Files.list(src).filter(_.toString.endsWith(".parquet")).forEach { p =>
        Files.move(p, inDir.resolve(file + ".parquet"))
      }
    }

    writeBatch(1 to 100, "b1"); moveIn("b1")

    def startQuery() = {
      val raw = s.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .parquet(inDir.toString)
      EventStreams.dedupWithinWatermark(raw)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // overlapping batch (50..150) arrives while the query is DOWN
    writeBatch(50 to 150, "b2"); moveIn("b2")

    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val out = s.read.parquet(outDir)
    assert(out.count() === 150L)
    assert(out.select(countDistinct($"event_id")).collect()(0).getLong(0) === 150L)
  }
}
