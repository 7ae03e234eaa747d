package pystreamsspark.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import pystreamsspark.SparkSpec

/** The "bounded state" claim of the streaming surface, MEASURED: a long
  * replay through the RocksDB transformWithState sessionizer must hold
  * state for the watermark-live keys only — evicted sessions leave the
  * store, so state size plateaus at the per-window working set instead
  * of accumulating one entry per key ever seen. This is the property
  * that makes a 100 TB/day stream runnable at all: state ∝ live window,
  * not ∝ history.
  *
  * Shape: 8 micro-batches, each with its OWN 400 users (disjoint across
  * batches — worst case for state growth: every batch adds brand-new
  * keys), event time advancing 60 minutes per batch against a 10-minute
  * watermark, so each batch's timers fire during the next batch and
  * clear that batch's state. If eviction were broken, state rows would
  * grow ~linearly to ~8×400; with eviction they stay ~1 batch's worth.
  */
class StreamingStateScaleSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("TWS state rows plateau under watermark eviction across a long replay") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext
      val in = MemoryStream[Event]
      val q = EventStreams.finalizedSessionsTws(in.toDS())
        .writeStream.format("memory").queryName("tws_state_scale")
        .outputMode("append").start()
      try {
        val batches = 8
        val usersPerBatch = 400
        val stateRows = (0 until batches).map { b =>
          val base = b * 60 // minutes; watermark is 10 min
          val evs = (0 until usersPerBatch).flatMap { u =>
            val uid = b * 100000L + u
            Seq(
              Event(b * 1000000L + u * 2L, ts(base), uid, "click", 1.0),
              Event(b * 1000000L + u * 2L + 1, ts(base + 2), uid, "view", 2.0))
          }
          in.addData(evs)
          q.processAllAvailable()
          val ops = q.lastProgress.stateOperators
          assert(ops.nonEmpty, "no state operator in progress")
          ops.map(_.numRowsTotal).sum
        }
        // batches 2.. see the steady state: every earlier batch's
        // sessions were finalized by its successor's watermark advance.
        // Worst-case live set = current batch's keys (+ timers); a
        // LINEAR leak would reach ~batches × that.
        val steady = stateRows.drop(2)
        assert(steady.nonEmpty)
        val perBatchCeiling = 3L * usersPerBatch // rows + timers, headroom
        steady.foreach { n =>
          assert(n <= perBatchCeiling,
            s"state rows $n exceed per-batch ceiling $perBatchCeiling " +
              s"(trajectory: ${stateRows.mkString(", ")})")
        }
        // plateau, not growth: the last steady reading must not exceed
        // the first steady reading by more than 50%
        assert(steady.last <= steady.head * 3 / 2 + 1,
          s"state grows across the replay: ${stateRows.mkString(", ")}")
        // and the sessions actually emitted (eviction = finalization,
        // not data loss): batches 0..6 finalized by their successors
        val emitted = s.sql("SELECT COUNT(*) FROM tws_state_scale")
          .collect().head.getLong(0)
        assert(emitted >= (batches - 1).toLong * usersPerBatch,
          s"only $emitted sessions finalized")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
