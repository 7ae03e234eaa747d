package pystreamsspark.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import pystreamsspark.SparkSpec

/** transformWithState (Spark 4.x successor to [flat]mapGroupsWithState):
  * the TWS twins must reproduce the legacy operators' semantics —
  * running totals accumulate across micro-batches, and the event-time
  * TIMER finalizes a session once when the watermark passes it, clearing
  * the state. TWS needs the RocksDB state store provider (multiple
  * column families for named state + timers).
  */
class TransformWithStateSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    Event(id, ts(minute), user, typ, v)

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("TWS running totals accumulate across micro-batches (NoTime mode)") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext
      val in = MemoryStream[Event]
      val q = EventStreams.runningUserTotalsTws(in.toDS())
        .writeStream.format("memory").queryName("tws_running")
        .outputMode("append").start()
      try {
        in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 1, 1, "click", 2.0),
          ev(3, 2, 2, "view", 5.0))
        q.processAllAvailable()
        in.addData(ev(4, 3, 1, "click", 4.0))
        q.processAllAvailable()
        // latest emitted row per user reflects ALL rows seen so far —
        // state carried across batches
        val latest = s.sql(
          """SELECT user_id, n_events, sum_value FROM (
            |  SELECT *, row_number() OVER (PARTITION BY user_id
            |                               ORDER BY n_events DESC) rn
            |  FROM tws_running) WHERE rn = 1 ORDER BY user_id""".stripMargin)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        assert(latest.toSeq == Seq((1L, 3L, 7.0), (2L, 1L, 5.0)),
          s"got ${latest.toSeq}")
      } finally q.stop()
    }
  }

  test("TWS event-time timer finalizes sessions once and clears state") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext
      val in = MemoryStream[Event]
      val q = EventStreams.finalizedSessionsTws(in.toDS())
        .writeStream.format("memory").queryName("tws_finalized")
        .outputMode("append").start()
      try {
        in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 5, 1, "click", 2.0),
          ev(3, 6, 2, "view", 5.0))
        q.processAllAvailable()
        assert(s.sql("SELECT * FROM tws_finalized").count() == 0)
        // advance event time so the watermark passes both users' timers
        in.addData(ev(4, 120, 3, "click", 0.0))
        q.processAllAvailable()
        in.addData(ev(5, 125, 3, "click", 0.0))
        q.processAllAvailable()
        val rows = s.sql(
          "SELECT user_id, n_events, sum_value FROM tws_finalized ORDER BY user_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        assert(rows.toSeq == Seq((1L, 2L, 3.0), (2L, 1L, 5.0)),
          s"got ${rows.toSeq}")
      } finally q.stop()
    }
  }
}
