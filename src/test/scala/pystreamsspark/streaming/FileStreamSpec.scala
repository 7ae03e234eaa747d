package pystreamsspark.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import pystreamsspark.SparkSpec
import pystreamsspark.relational.TimeQueries

/** End-to-end file-source streaming over the REAL events parquet
  * (nanosecond timestamps and all): readStream → tumbling agg →
  * complete-mode memory sink must equal the batch result exactly.
  */
class FileStreamSpec extends SparkSpec {

  test("readStream over events.parquet: streaming agg == batch agg") {
    val s = spark
    import s.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory(Paths.get("target"), "stream-in-")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // Schema-adaptive ts handling, streaming edition: take the schema the
    // batch reader resolves for this exact file (ns → LongType under
    // nanosAsLong; µs → a timestamp type), feed it to readStream, then
    // normalize exactly like Tables.events (the batch loader).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = s.read.parquet(dir.toString).schema
    val stream = s.readStream.schema(fileSchema).parquet(dir.toString)
    val raw = fileSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        stream.withColumn("ts",
          $"ts".cast(org.apache.spark.sql.types.TimestampType))
    }

    val agg = raw
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w_start"), $"event_type", $"n")

    val q = agg.writeStream.format("memory").queryName("file_stream_out")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT * FROM file_stream_out ORDER BY w_start, event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      val batch = TimeQueries.qTumbling(s, sfDir)
        .select($"w_start", $"event_type", $"n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
