package pystreamsspark.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import pystreamsspark.SparkSpec

/** Streaming smoke tests: the event-time transforms from EventStreams
  * driven through MemoryStream micro-batches (deterministic; no timing
  * dependence — processAllAvailable barriers each batch).
  */
class StreamingSmokeSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    Event(id, ts(minute), user, typ, v)

  test("tumbling window streaming agg with watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(in.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: events in hour 0; batch 2: hour 2 (advances watermark past hour 0+1h)
      in.addData(ev(1, 5, 1, "click", 1.0), ev(2, 30, 1, "click", 2.0),
        ev(3, 40, 2, "view", 3.0))
      q.processAllAvailable()
      in.addData(ev(4, 150, 1, "click", 4.0))
      q.processAllAvailable()
      in.addData(ev(5, 260, 1, "click", 5.0)) // push watermark further -> hour-2 window closes
      q.processAllAvailable()
      val rows = s.sql("SELECT * FROM tumbling_out ORDER BY w_start, event_type")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L)))
      assert(rows.contains(("2024-01-01 00:00:00.0", "view", 1L)))
      assert(rows.contains(("2024-01-01 02:00:00.0", "click", 1L)))
    } finally q.stop()
  }

  test("streaming OHLC bars match the batch formulation on the same events") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.ohlcBars(in.toDF())
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode(OutputMode.Append).start()
    try {
      // day 1: open=2.0 (earliest ts), high=9.0, low=1.0, close=1.0 (latest)
      val day1 = Seq(ev(1, 10, 1, "click", 2.0), ev(2, 50, 2, "click", 9.0),
        ev(3, 200, 1, "click", 1.0))
      in.addData(day1: _*)
      q.processAllAvailable()
      // next-day event pushes the watermark past day 1 -> bar emits
      in.addData(ev(4, 60 * 26, 1, "click", 5.0))
      q.processAllAvailable()
      val got = s.sql("SELECT * FROM ohlc_out WHERE d = DATE'2024-01-01'")
        .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6)))
      assert(got.toSeq == Seq(("click", 2.0, 9.0, 1.0, 1.0, 3L)))
      // parity with the batch OHLC aggregation on the same rows
      val batch = day1.toDF()
        .groupBy(to_date($"ts").as("d"), $"event_type")
        .agg(min_by($"value", struct($"ts", $"event_id")).as("open"),
          max($"value").as("high"), min($"value").as("low"),
          max_by($"value", struct($"ts", $"event_id")).as("close"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6)))
      assert(batch.toSeq == got.toSeq)
    } finally q.stop()
  }

  test("session window streaming agg") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionCounts(in.toDF())
      .writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 0,10 (one session), then 60 (new session, 50-min gap)
      in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 10, 1, "click", 1.0),
        ev(3, 60, 1, "click", 1.0))
      q.processAllAvailable()
      in.addData(ev(4, 400, 9, "click", 1.0)) // advance watermark to close sessions
      q.processAllAvailable()
      val rows = s.sql("SELECT user_id, n FROM session_out WHERE user_id = 1 ORDER BY s_start")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((1L, 2L), (1L, 1L)))
    } finally q.stop()
  }

  test("stateful dedup within watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.dedupWithinWatermark(in.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 0, 1, "click", 1.0), ev(1, 0, 1, "click", 1.0),
        ev(2, 5, 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(ev(2, 5, 1, "view", 2.0), ev(3, 10, 2, "click", 3.0))
      q.processAllAvailable()
      val n = s.sql("SELECT count(*) FROM dedup_out").collect()(0).getLong(0)
      assert(n === 3L) // ids 1,2,3 each once
    } finally q.stop()
  }

  test("stream-stream interval join: purchases x preceding clicks") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStreams.purchaseClickJoin(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(10, 0, 1, "click", 0.0), ev(11, 8, 1, "click", 0.0),
        ev(12, 30, 1, "click", 0.0), ev(13, 5, 2, "click", 0.0))
      purchases.addData(ev(1, 9, 1, "purchase", 5.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT purchase_id, click_id FROM ssjoin_out ORDER BY click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // purchase at minute 9 joins clicks at 0 and 8 (within 10 min,
      // same user); not the click at 30 (future) or user 2's click
      assert(rows.toSeq === Seq((1L, 10L), (1L, 11L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched purchase emits nulls after watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStreams.purchaseClickJoinOuter(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssjoin_outer_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 purchase WITH a click; user 3 purchase with NO click ever
      clicks.addData(ev(10, 5, 1, "click", 0.0))
      purchases.addData(ev(1, 9, 1, "purchase", 5.0), ev(2, 9, 3, "purchase", 7.0))
      q.processAllAvailable()
      // advance BOTH watermarks far past purchase 2's join window so the
      // runtime can prove no matching click can still arrive
      clicks.addData(ev(90, 120, 9, "click", 0.0))
      purchases.addData(ev(91, 120, 9, "purchase", 0.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT purchase_id, click_id FROM ssjoin_outer_out WHERE purchase_id IN (1, 2)")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(rows === Set((1L, Some(10L)), (2L, None)))
    } finally q.stop()
  }

  test("arbitrary state: running per-user totals") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.runningUserTotals(in.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 1, 1, "click", 2.0))
      q.processAllAvailable()
      in.addData(ev(3, 2, 1, "click", 4.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT n_events, sum_value FROM running_out WHERE user_id = 1 ORDER BY n_events")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq === Seq((2L, 3.0), (3L, 7.0)))
    } finally q.stop()
  }
}
