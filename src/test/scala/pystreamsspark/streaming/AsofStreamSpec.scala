package pystreamsspark.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec
import pystreamsspark.operators.AsofJoin

/** The streaming as-of must CONVERGE TO THE BATCH RESULT: once the
  * watermark finalizes a probe, its emitted match equals what the
  * (oracle-checked) batch formulation computes over the complete data —
  * under adversarial arrival orders: probes before their quotes, late
  * quotes inside the lateness window, interleaved keys, ties on quote
  * time, and idle-key timeout flushes.
  */
class AsofStreamSpec extends SparkSpec {

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("streaming as-of converges to the batch result under out-of-order arrivals") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val probes = MemoryStream[AsofProbe]
    val quotes = MemoryStream[AsofQuote]
    val q = EventStreams.streamingAsof(probes.toDS(), quotes.toDS(), "5 minutes")
      .writeStream.format("memory").queryName("asof_stream_out")
      .outputMode("append").start()
    val allProbes = scala.collection.mutable.ArrayBuffer[AsofProbe]()
    val allQuotes = scala.collection.mutable.ArrayBuffer[AsofQuote]()
    def pr(batch: AsofProbe*): Unit = { allProbes ++= batch; probes.addData(batch); q.processAllAvailable() }
    def qt(batch: AsofQuote*): Unit = { allQuotes ++= batch; quotes.addData(batch); q.processAllAvailable() }
    try {
      // probes arrive BEFORE any quote exists (must buffer, not emit null)
      pr(AsofProbe(1, 1L, ts(10)), AsofProbe(2, 1L, ts(12)),
        AsofProbe(3, 2L, ts(11)))
      // quotes catch up out of order, including a (key, time) tie —
      // greatest value must win, same rule as batch
      qt(AsofQuote(1L, ts(9), 100.0), AsofQuote(1L, ts(12), 120.0),
        AsofQuote(1L, ts(12), 125.0), AsofQuote(2L, ts(8), 50.0))
      // a LATE quote inside the 5-min lateness window that changes
      // probe 1's answer if mishandled (ts 11 > 9, still <= probe 2's 12)
      qt(AsofQuote(1L, ts(11), 110.0))
      // watermark advances: 30-5=25 finalizes probes 10/11/12
      pr(AsofProbe(4, 1L, ts(30)))
      // further advance finalizes probe 4; user 3 has no quotes at all
      pr(AsofProbe(5, 2L, ts(60)), AsofProbe(6, 3L, ts(61)))
      // push the watermark far enough that idle keys 1/2/3 time out and
      // flush their pending probes (5 and 6)
      pr(AsofProbe(7, 9L, ts(200)))
      pr(AsofProbe(8, 9L, ts(205))) // extra batch so timeouts drain
      val got = s.sql(
        """SELECT event_id, user_id, ts, asof_value
          |FROM asof_stream_out ORDER BY event_id""".stripMargin).collect()
      // probes 1-6 are finalized; 7/8 may still pend — compare the
      // finalized prefix against the batch formulation on the SAME data
      val batchExpected = AsofJoin.asofJoin(
          allProbes.toSeq.toDF("event_id", "user_id", "ts"),
          allQuotes.toSeq.toDF("user_id", "ts", "value"),
          Seq("user_id"), "ts", "ts", Seq("value"))
        .select($"event_id", $"user_id", $"ts", $"asof_value")
        .filter($"event_id" <= 6).orderBy($"event_id").collect()
      val finalized = got.filter(_.getLong(0) <= 6)
      assert(finalized.length == 6,
        s"expected probes 1-6 finalized, got ${got.mkString(", ")}")
      finalized.zip(batchExpected).foreach { case (a, b) =>
        assert(a == b, s"stream row $a != batch row $b")
      }
      // each probe emitted exactly once (append-mode finality)
      assert(got.map(_.getLong(0)).distinct.length == got.length)
    } finally q.stop()
  }

  test("timeout flush then revive: the idle flush is FINAL even when a later quote arrives (asserted divergence from batch)") {
    // THE CONTRACT UNDER TEST (EventStreams.streamingAsof scaladoc:
    // "idle data treated as complete"): a forward probe with no
    // tolerance and no candidate quote can never be proven final by the
    // watermark alone, so the 30-min idle timeout flushes it with the
    // quotes IN HAND — here none, so asof_value = NULL. If the key then
    // REVIVES with a later quote that batch semantics would have
    // matched, the stream does NOT retract or re-emit: the flushed
    // answer stands (append-mode finality), and this test pins that the
    // divergence from the batch oracle is intended, not a bug.
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val probes = MemoryStream[AsofProbe]
    val quotes = MemoryStream[AsofQuote]
    val q = EventStreams.streamingAsof(probes.toDS(), quotes.toDS(),
        "5 minutes", direction = "forward")
      .writeStream.format("memory").queryName("asof_revive_out")
      .outputMode("append").start()
    try {
      // key 1: one probe, NO quotes anywhere yet — forward has no
      // candidate and no tolerance, so only the idle timeout can flush
      probes.addData(AsofProbe(1, 1L, ts(10)))
      q.processAllAvailable()
      // a foreign key drives the watermark to 55 min (> probe+30), so
      // key 1's event-time timeout fires and flushes probe 1 as NULL
      probes.addData(AsofProbe(90, 9L, ts(60)))
      q.processAllAvailable()
      probes.addData(AsofProbe(91, 9L, ts(62))) // extra batch drains the timeout
      q.processAllAvailable()
      val flushed = s.sql(
        "SELECT event_id, asof_value FROM asof_revive_out WHERE event_id = 1").collect()
      assert(flushed.length === 1, s"probe 1 not flushed: ${flushed.mkString}")
      assert(flushed(0).isNullAt(1), s"idle flush must emit NULL, got ${flushed(0)}")
      // REVIVE: key 1 speaks again with a quote batch semantics WOULD
      // match (ts 100 >= probe ts 10), plus a fresh probe that must see
      // it. NOTE the quote itself advances the watermark to 95 min, so
      // the fresh probe sits at 97 min — above the watermark (not late)
      // and still <= the quote, the forward-match window
      quotes.addData(AsofQuote(1L, ts(100), 777.0))
      q.processAllAvailable()
      probes.addData(AsofProbe(2, 1L, ts(97)))
      q.processAllAvailable()
      // advance the watermark past the revived quote so probe 2 finalizes
      probes.addData(AsofProbe(92, 9L, ts(200)))
      q.processAllAvailable()
      probes.addData(AsofProbe(93, 9L, ts(205)))
      q.processAllAvailable()
      val got = s.sql(
        """SELECT event_id, asof_value FROM asof_revive_out
          |WHERE event_id IN (1, 2) ORDER BY event_id""".stripMargin).collect()
      // probe 1: STILL exactly one row, still NULL — no retraction, no
      // re-emit after the revive
      assert(got.count(_.getLong(0) == 1L) === 1, s"probe 1 re-emitted: ${got.mkString}")
      assert(got.find(_.getLong(0) == 1L).get.isNullAt(1))
      // probe 2: the revived key answers normally from the new quote
      assert(got.find(_.getLong(0) == 2L).exists(r => !r.isNullAt(1) &&
        r.getDouble(1) === 777.0), s"revived key broken: ${got.mkString}")
      // and the batch oracle on the COMPLETE data genuinely disagrees on
      // probe 1 (777.0, not NULL) — the divergence is the contract
      val batch = AsofJoin.asofJoin(
          Seq((1L, 1L, ts(10))).toDF("event_id", "user_id", "ts"),
          Seq((1L, ts(100), 777.0)).toDF("user_id", "ts", "value"),
          Seq("user_id"), "ts", "ts", Seq("value"), direction = "forward")
        .select($"asof_value").head()
      assert(!batch.isNullAt(0) && batch.getDouble(0) === 777.0)
    } finally q.stop()
  }

  test("per-key state stays bounded: quotes evict down to the carry") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val probes = MemoryStream[AsofProbe]
    val quotes = MemoryStream[AsofQuote]
    val q = EventStreams.streamingAsof(probes.toDS(), quotes.toDS(), "5 minutes")
      .writeStream.format("memory").queryName("asof_bounded_out")
      .outputMode("append").start()
    try {
      // 60 quotes for one key over an hour; watermark sweeps past them
      for (m <- 1 to 60) {
        quotes.addData(AsofQuote(1L, ts(m.toLong), m.toDouble))
      }
      q.processAllAvailable()
      probes.addData(AsofProbe(100, 1L, ts(90)))
      q.processAllAvailable()
      probes.addData(AsofProbe(101, 1L, ts(95)))
      q.processAllAvailable()
      // keyed state: the 60 swept-past quotes collapse into ONE
      // AsofKeyState row per key (list internally evicted to the carry)
      val stateRows = q.lastProgress.stateOperators.asScala
        .map(_.numRowsTotal).sum
      assert(stateRows <= 2,
        s"state not bounded: $stateRows rows (expected <=2 keyed states)")
      // push the watermark past key 1's idle timeout (95 + 30 = 125min)
      // so its remaining pending probes flush, then drain the timeout
      probes.addData(AsofProbe(102, 1L, ts(120)))
      q.processAllAvailable()
      probes.addData(AsofProbe(200, 9L, ts(170)))
      q.processAllAvailable()
      probes.addData(AsofProbe(201, 9L, ts(175)))
      q.processAllAvailable()
      // every finalized probe carries the LAST quote (value 60) — proof
      // the eviction kept exactly the right carry after sweeping 59
      // older quotes out of state
      val vals = s.sql(
        """SELECT event_id, asof_value FROM asof_bounded_out
          |WHERE event_id IN (100, 101, 102) ORDER BY event_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(vals.toSeq == Seq((100L, 60.0), (101L, 60.0), (102L, 60.0)),
        vals.mkString(","))
      // the idle-timeout flush must RETAIN the carry: a probe arriving
      // after the gap still matches the last quote, like the batch does
      probes.addData(AsofProbe(103, 1L, ts(300)))
      q.processAllAvailable()
      probes.addData(AsofProbe(202, 9L, ts(400)))
      q.processAllAvailable()
      probes.addData(AsofProbe(203, 9L, ts(405)))
      q.processAllAvailable()
      val late = s.sql(
        "SELECT asof_value FROM asof_bounded_out WHERE event_id = 103")
        .collect()
      assert(late.length == 1 && late(0).getDouble(0) == 60.0,
        s"post-idle probe lost the carry: ${late.mkString(",")}")
    } finally q.stop()
  }

  /** Every direction × tolerance: the finalized stream output must
    * equal the batch formulation over the complete data, under the
    * same adversarial arrival order — probes before quotes, late
    * quotes, (key, time) ties, a key whose forward match arrives 29
    * minutes later, and a key with NO in-tolerance match at all. */
  for ((direction, tolerance) <- Seq(
      ("forward", None), ("forward", Some(120e6)),
      ("nearest", None), ("nearest", Some(120e6)),
      ("backward", Some(120e6)))) {
    val tolName = tolerance.map(t => s"tol=${(t / 60e6).toLong}min").getOrElse("no tol")
    test(s"$direction ($tolName) converges to the batch result under out-of-order arrivals") {
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext
      val probes = MemoryStream[AsofProbe]
      val quotes = MemoryStream[AsofQuote]
      val sink = s"asof_${direction}_${tolerance.isDefined}_out"
      val q = EventStreams.streamingAsof(probes.toDS(), quotes.toDS(),
          "5 minutes", direction, tolerance)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      val allProbes = scala.collection.mutable.ArrayBuffer[AsofProbe]()
      val allQuotes = scala.collection.mutable.ArrayBuffer[AsofQuote]()
      def pr(batch: AsofProbe*): Unit = { allProbes ++= batch; probes.addData(batch); q.processAllAvailable() }
      def qt(batch: AsofQuote*): Unit = { allQuotes ++= batch; quotes.addData(batch); q.processAllAvailable() }
      try {
        // probes arrive BEFORE any quote exists (must buffer, not emit)
        pr(AsofProbe(1, 1L, ts(10)), AsofProbe(2, 1L, ts(12)),
          AsofProbe(3, 2L, ts(11)))
        // quotes catch up out of order, including a (key, time) tie:
        // forward/backward take the greatest value, nearest's strictly-
        // forward candidate the smallest
        qt(AsofQuote(1L, ts(9), 100.0), AsofQuote(1L, ts(12), 120.0),
          AsofQuote(1L, ts(12), 125.0), AsofQuote(2L, ts(8), 50.0))
        // a LATE quote inside the 5-min lateness window that sits
        // between probe 1 and probe 2 — changes forward/nearest answers
        qt(AsofQuote(1L, ts(11), 110.0))
        // key 2's forward match arrives 29 min after probe 3 — inside
        // no 2-min tolerance, the genuine answer without one
        qt(AsofQuote(2L, ts(40), 60.0))
        // watermark advances past every quote above (45-5=40 finalizes
        // backward sides; forward candidates are final once wm > their
        // own ts)
        pr(AsofProbe(4, 1L, ts(45)))
        pr(AsofProbe(5, 2L, ts(60)), AsofProbe(6, 3L, ts(61)))
        // push the watermark far enough that idle keys 1/2/3 time out
        // and flush their pending probes
        pr(AsofProbe(7, 9L, ts(200)))
        pr(AsofProbe(8, 9L, ts(205))) // extra batch so timeouts drain
        val got = s.sql(
          s"""SELECT event_id, user_id, ts, asof_value
             |FROM $sink ORDER BY event_id""".stripMargin).collect()
        val batchExpected = AsofJoin.asofJoin(
            allProbes.toSeq.toDF("event_id", "user_id", "ts"),
            allQuotes.toSeq.toDF("user_id", "ts", "value"),
            Seq("user_id"), "ts", "ts", Seq("value"),
            direction = direction, tolerance = tolerance)
          .select($"event_id", $"user_id", $"ts", $"asof_value")
          .filter($"event_id" <= 6).orderBy($"event_id").collect()
        val finalized = got.filter(_.getLong(0) <= 6)
        assert(finalized.length == 6,
          s"expected probes 1-6 finalized, got ${got.mkString(", ")}")
        finalized.zip(batchExpected).foreach { case (a, b) =>
          assert(a == b, s"stream row $a != batch row $b")
        }
        // each probe emitted exactly once (append-mode finality)
        assert(got.map(_.getLong(0)).distinct.length == got.length)
      } finally q.stop()
    }
  }

  test("forward probe finalizes EARLY (before the watermark reaches it) once its candidate is final") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val probes = MemoryStream[AsofProbe]
    val quotes = MemoryStream[AsofQuote]
    val q = EventStreams.streamingAsof(probes.toDS(), quotes.toDS(),
        "5 minutes", "forward")
      .writeStream.format("memory").queryName("asof_fwd_early_out")
      .outputMode("append").start()
    try {
      probes.addData(AsofProbe(1, 1L, ts(10)))
      q.processAllAvailable()
      quotes.addData(AsofQuote(1L, ts(12), 120.0))
      q.processAllAvailable()
      // a second quote @30 will lift the watermark to 30-5=25 at the
      // NEXT batch: probe 1's candidate (ts 12 < 25) becomes final
      quotes.addData(AsofQuote(1L, ts(30), 300.0))
      q.processAllAvailable()
      // this batch runs at wm=25: probe 1 emits with the @12 quote —
      // no quote can arrive in [10, 12] anymore — while probe 2's own
      // candidate is the @30 quote, which is NOT watermark-final yet
      // (25 < 30), so probes 2 and 3 must both still pend
      probes.addData(AsofProbe(2, 1L, ts(24)))
      q.processAllAvailable()
      probes.addData(AsofProbe(3, 1L, ts(28)))
      q.processAllAvailable()
      val got = s.sql(
        """SELECT event_id, asof_value FROM asof_fwd_early_out
          |ORDER BY event_id""".stripMargin).collect()
      val ids = got.map(_.getLong(0)).toSet
      assert(ids.contains(1L), s"probe 1 not finalized early: ${got.mkString(",")}")
      assert(got.find(_.getLong(0) == 1L).get.getDouble(1) == 120.0)
      assert(!ids.contains(3L),
        s"probe 3 emitted before its candidate was watermark-final: ${got.mkString(",")}")
    } finally q.stop()
  }

  test("streaming as-of (nearest) state survives restarts via checkpoint") {
    val s = spark
    import s.implicits._
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory(Paths.get("target"), "ckpt-asof-")
    val pDir = base.resolve("probes"); Files.createDirectories(pDir)
    val qDir = base.resolve("quotes"); Files.createDirectories(qDir)
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("checkpoint").toString

    val allProbes = scala.collection.mutable.ArrayBuffer[AsofProbe]()
    val allQuotes = scala.collection.mutable.ArrayBuffer[AsofQuote]()
    var n = 0
    def addFile(dir: java.nio.file.Path, df: org.apache.spark.sql.DataFrame): Unit = {
      n += 1
      val tmp = base.resolve(s"stage$n")
      df.coalesce(1).write.parquet(tmp.toString)
      Files.list(tmp).filter(_.toString.endsWith(".parquet")).forEach { p =>
        Files.move(p, dir.resolve(s"b$n.parquet"))
      }
    }
    def addProbes(rows: AsofProbe*): Unit = {
      allProbes ++= rows
      addFile(pDir, rows.toSeq.toDF())
    }
    def addQuotes(rows: AsofQuote*): Unit = {
      allQuotes ++= rows
      addFile(qDir, rows.toSeq.toDF())
    }

    def startQuery() = {
      val probes = s.readStream
        .schema("event_id LONG, user_id LONG, ts TIMESTAMP")
        .parquet(pDir.toString).as[AsofProbe]
      val quotes = s.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .parquet(qDir.toString).as[AsofQuote]
      EventStreams.streamingAsof(probes, quotes, "5 minutes", "nearest")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // run 1: probes arrive BEFORE any quote — they must buffer in state
    // and survive the stop
    addProbes(AsofProbe(1, 1L, ts(10)), AsofProbe(2, 1L, ts(12)),
      AsofProbe(3, 2L, ts(11)))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

    // delivered while DOWN: the quote timelines incl. a (key, time) tie
    // and the in-window @11 quote that changes nearest answers
    addQuotes(AsofQuote(1L, ts(9), 100.0), AsofQuote(1L, ts(12), 120.0),
      AsofQuote(1L, ts(12), 125.0), AsofQuote(2L, ts(8), 50.0),
      AsofQuote(1L, ts(11), 110.0))
    // run 2 absorbs the quotes (watermark still behind the probes), then
    // stops again — quote state must survive this restart too
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    // delivered while DOWN again: key 2's far quote + the wm-advancing probe
    addQuotes(AsofQuote(2L, ts(40), 60.0))
    addProbes(AsofProbe(4, 1L, ts(45)))
    val q3 = startQuery(); q3.processAllAvailable()
    addProbes(AsofProbe(5, 2L, ts(60)), AsofProbe(6, 3L, ts(61)))
    q3.processAllAvailable()
    addProbes(AsofProbe(7, 9L, ts(200)))
    q3.processAllAvailable()
    addProbes(AsofProbe(8, 9L, ts(205))) // drain idle-key timeouts
    q3.processAllAvailable()
    q3.stop()

    val got = s.read.parquet(outDir)
      .select($"event_id", $"user_id", $"ts", $"asof_value")
      .filter($"event_id" <= 6).orderBy($"event_id").collect()
    val want = AsofJoin.asofJoin(
        allProbes.toSeq.toDF("event_id", "user_id", "ts"),
        allQuotes.toSeq.toDF("user_id", "ts", "value"),
        Seq("user_id"), "ts", "ts", Seq("value"), direction = "nearest")
      .select($"event_id", $"user_id", $"ts", $"asof_value")
      .filter($"event_id" <= 6).orderBy($"event_id").collect()
    assert(got.length == 6, s"probes 1-6 not all finalized: ${got.mkString(", ")}")
    got.zip(want).foreach { case (a, b) =>
      assert(a == b, s"recovered stream row $a != batch row $b")
    }
  }

  private def tsU(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  test("sub-millisecond timestamps compare at microsecond precision") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val probes = MemoryStream[AsofProbe]
    val quotes = MemoryStream[AsofQuote]
    val q = EventStreams.streamingAsof(probes.toDS(), quotes.toDS(), "5 minutes")
      .writeStream.format("memory").queryName("asof_us_out")
      .outputMode("append").start()
    try {
      val m10 = 10L * 60000000L // minute 10 in micros
      // two quotes and a probe inside the SAME millisecond: backward
      // must match the 400µs quote (1.0), not the 900µs one — a
      // millis-resolution compare would see a 3-way tie and emit 2.0
      quotes.addData(AsofQuote(1L, tsU(m10 + 400), 1.0),
        AsofQuote(1L, tsU(m10 + 900), 2.0))
      q.processAllAvailable()
      probes.addData(AsofProbe(1, 1L, tsU(m10 + 500)))
      q.processAllAvailable()
      // fire the idle timeout to flush (watermark-only advance would
      // need minutes of spread; timeout covers pending by construction)
      probes.addData(AsofProbe(900, 9L, ts(120)))
      q.processAllAvailable()
      probes.addData(AsofProbe(901, 9L, ts(125)))
      q.processAllAvailable()
      val got = s.sql(
        """SELECT event_id, user_id, ts, asof_value FROM asof_us_out
          |WHERE event_id = 1""".stripMargin).collect()
      assert(got.length == 1, s"probe 1 not finalized: ${got.mkString(",")}")
      assert(got(0).getDouble(3) == 1.0, s"µs compare broken: ${got(0)}")
      // the emitted timestamp must round-trip the microseconds exactly
      assert(got(0).getTimestamp(2) == tsU(m10 + 500), s"ts mangled: ${got(0)}")
    } finally q.stop()
  }

  private implicit class ArrOps[A](a: Array[A]) {
    def asScala: Seq[A] = a.toSeq
  }
}
