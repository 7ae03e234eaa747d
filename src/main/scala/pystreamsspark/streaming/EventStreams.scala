package pystreamsspark.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** One event row (mirrors the events table schema after ts conversion). */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Running per-user state for the arbitrary-state example. */
case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

/** Streaming as-of: probe-side row (asks "latest quote at-or-before my
  * time for my key"). */
case class AsofProbe(event_id: Long, user_id: Long, ts: java.sql.Timestamp)

/** Streaming as-of: quote-side row (the state timeline). */
case class AsofQuote(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Streaming as-of output; `asof_value` None = no quote at-or-before. */
case class AsofMatch(event_id: Long, user_id: Long,
                     ts: java.sql.Timestamp, asof_value: Option[Double])

/** Internal union row for the streaming as-of (side 0 = quote, 1 = probe). */
case class AsofIn(user_id: Long, ts: java.sql.Timestamp, side: Int,
                  event_id: Long, value: Double)

/** Per-key streaming as-of state: quote timeline (millis, value) and
  * probes still inside the late window. Both lists are bounded by the
  * watermark: quotes older than the carry are evicted each batch,
  * probes leave as soon as the watermark passes them. */
case class AsofKeyState(quotes: List[(Long, Double)],
                        pending: List[(Long, Long)])

/** Structured-Streaming forms of the event-time operators (SURVEY.md
  * §2.7). Each transform takes a DataFrame that can be EITHER a batch
  * frame or a `readStream` frame — the logical plan is identical; only
  * the sink differs. The batch forms are oracle-checked in
  * `relational.TimeQueries`; the streaming wiring (watermarks, state
  * store, output modes) is smoke-tested with MemoryStream in
  * `StreamingSmokeSpec`.
  *
  * Scale: streaming aggregations shuffle by (window, key) exactly like
  * their batch twins; state lives in the executor-local state store
  * (RocksDB on a real cluster), watermarks bound its size, and
  * `dropDuplicatesWithinWatermark` keeps the dedup state window-bounded
  * instead of unbounded.
  */
object EventStreams {

  /** Tumbling 1-hour counts with a 1-hour watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour/15-min windows with watermark. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** Session windows (30-min gap) per user with watermark. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n"))

  /** Streaming daily OHLC bars per event_type — the streaming twin of
    * the batch `AnalyticsQueries.qOhlc`: min_by/max_by on the
    * (ts, event_id) composite inside a watermarked daily window, so a
    * live feed downsamples to the same bars the batch query produces
    * once the watermark closes each day. */
  def ohlcBars(events: DataFrame): DataFrame = {
    val ord = struct(col("ts"), col("event_id"))
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n"))
      .select(col("window.start").cast("date").as("d"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
  }

  /** Stateful exact dedup by event_id, state bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks within the preceding 10 minutes. Watermarks on BOTH
    * sides + the time-range condition bound the join state store (Spark
    * drops buffered rows older than watermark - range). */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "20 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
    val c = clicks.withWatermark("ts", "20 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** LEFT OUTER stream-stream join — same watermarked interval
    * condition as [[purchaseClickJoin]], but purchases with NO
    * preceding click still emit (click columns null) once the
    * watermark passes their join window and the runtime can prove no
    * match can arrive. The attribution-with-unattributed-remainder
    * shape: inner drops cold-start purchases, left outer keeps them,
    * and the watermark bound is what keeps the join state finite on an
    * endless stream. */
  def purchaseClickJoinOuter(purchases: DataFrame,
                             clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "20 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
    val c = clicks.withWatermark("ts", "20 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Stream-static enrichment join: each streaming event joined to a
    * static dimension table. The static side is planned per micro-batch
    * (broadcast when small — the common dimension-enrichment shape);
    * no watermark or join state is needed because the static side never
    * changes mid-query. At 100 TB/day of events this is THE pattern for
    * attaching user/geo/experiment metadata on ingest. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Inactivity-finalized sessions with EVENT-TIME state expiry: per
    * user, accumulate (count, sum); when the watermark passes the
    * user's last event + 30 minutes, the state times out, the finished
    * session is EMITTED ONCE and the state is removed. This is the
    * pattern that keeps arbitrary keyed state bounded on an endless
    * stream — without the timeout, per-key state on 100 TB/day of
    * events grows forever. */
  def finalizedSessions(events: Dataset[Event]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            val done = state.get
            state.remove() // bounded state: expired keys leave the store
            Iterator.single(done)
          } else {
            val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
            var n = prev.n_events
            var s = prev.sum_value
            var maxTs = Long.MinValue
            batch.foreach { e =>
              n += 1; s += e.value; maxTs = math.max(maxTs, e.ts.getTime)
            }
            state.update(UserRunning(userId, n, s))
            // expire 30 min of event time after this user's latest event
            state.setTimeoutTimestamp(maxTs + 30 * 60 * 1000L)
            Iterator.empty
          }
      }
  }

  /** STREAMING as-of join (backward): every probe event picks up the
    * latest quote at-or-before its event time for its key, with
    * out-of-order arrivals handled CORRECTLY up to the watermark — the
    * streaming form of [[pystreamsspark.operators.AsofJoin]] /
    * [[pystreamsspark.plans.AsofJoinExec]], which the batch oracles
    * check; `AsofStreamSpec` proves this stream converges to the batch
    * result under adversarial arrival orders.
    *
    * Mechanics: both sides union into one keyed stream; per key,
    * `flatMapGroupsWithState` buffers quotes and probes until the
    * watermark passes a probe's time — at that point every quote
    * at-or-before that probe can no longer arrive (watermark
    * guarantee), so the match is FINAL and emits exactly once. Ties on
    * quote time resolve to the greatest value, the same deterministic
    * rule as the batch forms.
    *
    * Bounded state (the 100 TB/day property): each batch evicts every
    * quote older than the carry (the latest watermark-final quote —
    * still needed by future probes), pending probes drain as the
    * watermark moves, and an event-time timeout 30 min past the key's
    * last activity AND its latest pending probe flushes stragglers
    * whose key never sees data again (by construction the timeout can
    * only fire once the watermark proves them final). The timeout
    * KEEPS the single carry quote — a probe arriving after an idle gap
    * still matches the last state, exactly like the batch result —
    * so steady state is ONE quote row per key plus the in-flight late
    * window: the Flink temporal-join / QuestDB ASOF contract,
    * O(late window) per key, never O(history).
    *
    * All comparisons run at MICROSECOND precision (the batch
    * formulations' unit); emitted timestamps round-trip micros exactly.
    */
  def streamingAsof(
      probes: Dataset[AsofProbe],
      quotes: Dataset[AsofQuote],
      lateness: String = "10 minutes"): Dataset[AsofMatch] = {
    val spark = probes.sparkSession
    import spark.implicits._
    val unioned = probes.map(p => AsofIn(p.user_id, p.ts, 1, p.event_id, 0.0))
      .unionByName(quotes.map(q => AsofIn(q.user_id, q.ts, 0, 0L, q.value)))
      .withWatermark("ts", lateness)

    // micros-exact timestamp codec: the batch formulations compare at µs
    // resolution, so the stream must too (Timestamp.getTime alone drops
    // sub-ms digits and would both mis-match and mangle output rows)
    def toMicros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def resolve(sortedQuotes: List[(Long, Double)], uid: Long,
        ready: List[(Long, Long)]): List[AsofMatch] =
      ready.sortBy(identity).map { case (eid, pts) =>
        // greatest quote ts <= probe ts; (ts, value)-asc order makes the
        // last element of a tie run the greatest value — the batch rule
        val m = sortedQuotes.takeWhile(_._1 <= pts).lastOption
        AsofMatch(eid, uid, fromMicros(pts), m.map(_._2))
      }

    unioned
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofKeyState, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[AsofIn], state: GroupState[AsofKeyState]) =>
          if (state.hasTimedOut) {
            // idle flush: the timeout timestamp covered every pending
            // probe + 30 min, so the watermark now proves them final.
            // KEEP the latest quote as the carry — a probe arriving
            // after the idle gap must still see the last state (batch
            // convergence); one retained row per key, no re-armed timer
            // until the key speaks again.
            val st = state.get
            val sortedQuotes = st.quotes.sortBy(identity)
            val out = resolve(sortedQuotes, uid, st.pending)
            sortedQuotes.lastOption match {
              case Some(carry) => state.update(AsofKeyState(carry :: Nil, Nil))
              case None => state.remove()
            }
            out.iterator
          } else {
            val prev = state.getOption.getOrElse(AsofKeyState(Nil, Nil))
            var quotes = prev.quotes
            var pending = prev.pending
            var maxTsMs = Long.MinValue
            batch.foreach { e =>
              maxTsMs = math.max(maxTsMs, e.ts.getTime)
              if (e.side == 0) quotes = (toMicros(e.ts), e.value) :: quotes
              else pending = (e.event_id, toMicros(e.ts)) :: pending
            }
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val sortedQuotes = quotes.sortBy(identity)
            // STRICTLY before the watermark: a quote timed exactly AT
            // the watermark is not yet late and could still arrive, so
            // a probe at that instant is not final either
            val (ready, stillPending) = pending.partition(_._2 < wmUs)
            val out = resolve(sortedQuotes, uid, ready)
            // evict: quotes < wm are a final set — only the greatest
            // (the carry) can still be some future probe's answer;
            // quotes >= wm keep their full tie runs (more may arrive)
            val kept =
              sortedQuotes.takeWhile(_._1 < wmUs).lastOption.toList :::
                sortedQuotes.filter(_._1 >= wmUs)
            state.update(AsofKeyState(kept, stillPending))
            // the timer must outlive BOTH the key's last activity and
            // its latest pending probe: a later batch with an older
            // event must never drag the timeout below a pending probe
            // (that would flush it before the watermark proves it final)
            val pendingMaxMs = stillPending.foldLeft(Long.MinValue) {
              (m, p) => math.max(m, math.floorDiv(p._2, 1000L) + 1)
            }
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              math.max(maxTsMs, pendingMaxMs) + 30 * 60 * 1000L))
            out.iterator
          }
      }
  }

  // ---------------------------------------------------------------------
  // transformWithState forms (Spark 4.x successor API to
  // [flat]mapGroupsWithState): explicit StatefulProcessor lifecycle,
  // named state variables with optional TTL, first-class timers. Both
  // legacy and TWS forms are kept — the semantics are identical
  // (asserted in StreamingSmokeSpec / CheckpointRecoverySpec); TWS is
  // where Spark's state-store features (RocksDB column families, TTL,
  // multiple state vars) land. TWS requires the RocksDB state store
  // provider (tests set spark.sql.streaming.stateStore.providerClass).
  // ---------------------------------------------------------------------

  /** TWS processor: running per-user (count, sum), one output row per
    * input batch of rows per key — same semantics as
    * [[runningUserTotals]]. */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, Event, UserRunning] {
    @transient private var state: ValueState[UserRunning] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning](
        "running", Encoders.product[UserRunning], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[UserRunning] = {
      val prev = if (state.exists()) state.get() else UserRunning(key, 0L, 0.0)
      var n = prev.n_events
      var s = prev.sum_value
      rows.foreach { e => n += 1; s += e.value }
      val next = UserRunning(key, n, s)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** TWS twin of [[runningUserTotals]]. */
  def runningUserTotalsTws(events: Dataset[Event]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** TWS processor with an EVENT-TIME timer: accumulate per-user
    * (count, sum); (re-)register a timer 30 min of event time past the
    * user's latest event; when the watermark crosses it the session is
    * emitted once and the state cleared — same bounded-state semantics
    * as [[finalizedSessions]], with the timer made explicit. */
  class FinalizedSessionsProcessor
      extends StatefulProcessor[Long, Event, UserRunning] {
    @transient private var state: ValueState[UserRunning] = _
    @transient private var deadline: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[UserRunning](
        "session", Encoders.product[UserRunning], TTLConfig.NONE)
      deadline = getHandle.getValueState[Long](
        "deadline", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[UserRunning] = {
      val prev = if (state.exists()) state.get() else UserRunning(key, 0L, 0.0)
      var n = prev.n_events
      var s = prev.sum_value
      var maxTs = Long.MinValue
      rows.foreach { e =>
        n += 1; s += e.value; maxTs = math.max(maxTs, e.ts.getTime)
      }
      state.update(UserRunning(key, n, s))
      // slide the expiry timer to latest event + 30 min (delete the old
      // one — timers are not implicitly replaced like setTimeoutTimestamp)
      if (deadline.exists()) getHandle.deleteTimer(deadline.get())
      val due = maxTs + 30 * 60 * 1000L
      getHandle.registerTimer(due)
      deadline.update(due)
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[UserRunning] = {
      val done = state.get()
      state.clear()
      deadline.clear()
      Iterator.single(done)
    }
  }

  /** TWS twin of [[finalizedSessions]]. */
  def finalizedSessionsTws(events: Dataset[Event]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new FinalizedSessionsProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Arbitrary keyed state: running per-user (count, sum) emitted on
    * every update — flatMapGroupsWithState with processing-time timeout
    * disabled (the state never expires in the smoke test; production
    * would set an event-time timeout against the watermark). */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          batch.foreach { e => n += 1; s += e.value }
          val next = UserRunning(userId, n, s)
          state.update(next)
          Iterator.single(next)
      }
  }
}
