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

  test("transformWithState value state survives restart via checkpoint") {
    val s = spark
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Files.createTempDirectory(Paths.get("target"), "ckpt-tws-")
      val inDir = base.resolve("in"); Files.createDirectories(inDir)
      val outDir = base.resolve("out").toString
      val ckpt = base.resolve("checkpoint").toString

      def writeBatch(rows: Seq[(Long, Double)], file: String): Unit = {
        rows.map { case (id, v) =>
          (id, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 1L, "click", v)
        }.toDF("event_id", "ts", "user_id", "event_type", "value")
          .coalesce(1).write.mode("overwrite").parquet(base.resolve(file).toString)
        val src = base.resolve(file)
        Files.list(src).filter(_.toString.endsWith(".parquet")).forEach { p =>
          Files.move(p, inDir.resolve(file + ".parquet"))
        }
      }

      def startQuery() = {
        val raw = s.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .parquet(inDir.toString).as[Event]
        EventStreams.runningUserTotalsTws(raw)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append).start()
      }

      writeBatch(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)), "b1")
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      // more rows for the SAME user arrive while the query is down
      writeBatch(Seq((4L, 4.0), (5L, 5.0)), "b2")
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

      // recovered state: the post-restart batch continues from n=3/sum=6
      // (a fresh state store would emit n=2/sum=9)
      val last = s.read.parquet(outDir)
        .orderBy($"n_events".desc).limit(1)
        .select($"n_events", $"sum_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(last.head == ((5L, 15.0)), s"got ${last.head}")
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
