package pystreamsspark.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import pystreamsspark.SparkSpec

/** Streaming surface beyond the window/state ops: stream-static
  * enrichment, foreachBatch custom sinks (with the batchId-based
  * idempotence contract), and Trigger.AvailableNow incremental runs.
  */
class SinksAndTriggersSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    Event(id, ts(minute), user, typ, v)

  test("stream-static broadcast enrichment join") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val q = EventStreams.enrichWithDim(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out").start()
    try {
      in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 1, 2, "view", 2.0),
        ev(3, 2, 99, "click", 3.0)) // user 99 not in dim -> null tier
      q.processAllAvailable()
      val rows = s.sql("SELECT event_id, tier FROM enrich_out ORDER BY event_id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((1L, "gold"), (2L, "basic"), (3L, null)))
    } finally q.stop()
  }

  test("event-time timeout finalizes sessions and removes state") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.finalizedSessions(in.toDS())
      .writeStream.format("memory").queryName("finalized_out")
      .outputMode("append").start()
    try {
      // user 1 active at minute 0-5; user 2 at minute 6
      in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 5, 1, "click", 2.0),
        ev(3, 6, 2, "view", 5.0))
      q.processAllAvailable()
      assert(s.sql("SELECT * FROM finalized_out").count() == 0) // nothing expired yet
      // jump event time to minute 120: watermark (110) passes user 1's
      // last event (5) + 30min AND user 2's (6) + 30min -> both finalize
      in.addData(ev(4, 120, 3, "click", 0.0))
      q.processAllAvailable()
      // one more batch so the timed-out state is flushed deterministically
      in.addData(ev(5, 125, 3, "click", 0.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT user_id, n_events, sum_value FROM finalized_out ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, 2L, 3.0), (2L, 1L, 5.0)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("foreachBatch sink: batchId-keyed writes are exactly-once replayable") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // the sink contract: (batchId, data) — an idempotent sink must
    // overwrite-by-batchId so replays after failure don't double-write
    val store = new ConcurrentHashMap[Long, Seq[Long]]()
    val in = MemoryStream[Event]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val ids = batch.select($"event_id").collect().map(_.getLong(0)).toSeq
        store.put(batchId, ids) // idempotent: same batchId -> same slot
        ()
      }.start()
    try {
      in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 1, 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(ev(3, 2, 2, "click", 3.0))
      q.processAllAvailable()
      val all = store.values().toArray.flatMap(_.asInstanceOf[Seq[Long]]).toSet
      assert(all == Set(1L, 2L, 3L))
      assert(store.size() >= 2) // distinct batch ids
    } finally q.stop()
  }

  test("streaming CDC merge: foreachBatch + Upsert maintains a keyed snapshot across batches") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    import org.apache.spark.sql.functions._
    // the lakehouse MERGE pattern without a table format: each microbatch
    // of (key, seq, op, payload) changes is applied to the running
    // snapshot with the same latest-change-wins collapse as batch Upsert
    val state = new java.util.concurrent.atomic.AtomicReference(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal"))
    val in = MemoryStream[(Long, Long, String, Double)]
    val q = in.toDF().toDF("k", "seq", "op", "bal").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val changes = batch.select($"k", $"bal", $"seq", $"op")
        state.set(pystreamsspark.operators.Upsert(
          state.get(), changes, "k", "seq", "op").localCheckpoint())
        ()
      }.start()
    try {
      in.addData((2L, 1L, "U", 99.0), (3L, 1L, "U", 30.0)) // update 2, insert 3
      q.processAllAvailable()
      in.addData((1L, 2L, "D", 0.0), (3L, 2L, "U", 33.0))  // delete 1, update 3
      q.processAllAvailable()
      val got = state.get().collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((2L, 99.0), (3L, 33.0)))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains a file source then stops; second run picks up only new files") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "avnow-").toFile.getAbsolutePath
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()

    def writeFile(n: Int, ids: Range): Unit = {
      val tmp = s"$root/tmp$n"
      ids.map(i => ev(i, i, i % 3, "click", i.toDouble)).toDF()
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"batch$n.parquet"))
    }

    def runOnce(): Unit = {
      val q = s.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
        .parquet(inDir)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    writeFile(1, 1 to 10)
    runOnce() // drains file 1 and terminates by itself
    assert(s.read.parquet(outDir).count() == 10)

    writeFile(2, 11 to 15)
    runOnce() // checkpoint ensures ONLY the new file is processed
    val out = s.read.parquet(outDir)
    assert(out.count() == 15)
    assert(out.select($"event_id").distinct().count() == 15) // no re-reads
  }
}
