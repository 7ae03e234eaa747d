package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import Det._

/** Event-time windowing (SURVEY.md §2.7), batch-equivalent forms.
  *
  * Spark's `window()` / `session_window()` produce epoch-aligned (UTC)
  * window structs; each query is oracle-checked against the equivalent
  * bucketing SQL in DuckDB. The identical expressions run unchanged under
  * Structured Streaming (`readStream` + `withWatermark`) — see
  * `pystreamsspark.streaming.StreamingSmoke` for that wiring; the batch
  * forms here are the verifiable contract.
  *
  * Scale: tumbling/sliding windows are plain hash aggregations on
  * (window_start, keys) — partial aggregation map-side, one shuffle,
  * no skew beyond the key's own. Session windows shuffle once on user_id.
  */
object TimeQueries {

  /** Tumbling 1-hour windows per event_type. */
  def qTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select($"window.start".as("w_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"w_start", $"event_type")
  }

  val qTumblingSql: String =
    s"""SELECT date_trunc('hour', ts) AS w_start, event_type,
       |  COUNT(*) AS n, ${sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY w_start, event_type""".stripMargin

  /** Sliding windows: 1 hour long, every 15 minutes — each event lands in
    * exactly 4 windows. Spark expands via the window() generator before
    * the aggregation shuffle. */
  def qSliding(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select($"window.start".as("w_start"), $"n", $"sum_value")
      .orderBy($"w_start")
  }

  // Epoch-aligned 15-min slide: the k-th (k=0..3) containing window starts
  // at floor_15min(ts) - k*15min. 900000000 µs = 15 min.
  val qSlidingSql: String =
    s"""SELECT make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000) AS w_start,
       |  COUNT(*) AS n, ${sqlSum("value")} AS sum_value
       |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS offs(k)
       |GROUP BY 1
       |ORDER BY w_start""".stripMargin

  /** Session windows (30-min gap) via the native session_window generator;
    * the oracle is the gaps-and-islands formulation (new session when the
    * gap is >= 30 min — session_window's [start, last+gap) semantics). */
  def qSessionWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select($"user_id", $"session_window.start".as("s_start"),
        $"session_window.end".as("s_end"), $"n", $"sum_value")
      .orderBy($"user_id", $"s_start")
  }

  val qSessionWindowSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sess AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged)
       |SELECT user_id, MIN(ts) AS s_start,
       |  MAX(ts) + INTERVAL 30 MINUTE AS s_end,
       |  COUNT(*) AS n, ${sqlSum("value")} AS sum_value
       |FROM sess
       |GROUP BY user_id, sid
       |ORDER BY user_id, s_start""".stripMargin

  /** DYNAMIC-GAP session windows (Spark 3.2+ feature: the gap is a
    * per-event EXPRESSION, not a constant — here engagement-dependent:
    * 'view' events only hold a session open 10 minutes, everything else
    * 30) — the adaptive sessionization a product-analytics pipeline
    * actually wants. Semantics are interval-union: each event
    * contributes [ts, ts+gap); a session's end is the RUNNING MAX of
    * contributed ends, and a new session starts when an event's ts
    * clears it. The oracle replays exactly that with a cumulative-max
    * window + gaps-and-islands cumsum. Exactness: all boundaries are
    * integer µs; the value sum exits via the §7.5 route. */
  def qSessionDyngap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // gap must resolve to CalendarIntervalType: string durations do
    // (DayTimeIntervalType literals are rejected by the generator)
    val gap = when($"event_type" === "view", lit("10 minutes"))
      .otherwise(lit("30 minutes"))
    Tables.events(spark, sfDir)
      .groupBy(session_window($"ts", gap), $"user_id")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select($"user_id", $"session_window.start".as("s_start"),
        $"session_window.end".as("s_end"), $"n", $"sum_value")
      .orderBy($"user_id", $"s_start")
  }

  val qSessionDyngapSql: String =
    s"""WITH g AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN event_type = 'view' THEN 600000000
       |         ELSE 1800000000 END AS gap_us
       |  FROM events
       |), flagged AS (
       |  SELECT user_id, ts, event_id, value, gap_us,
       |    MAX(epoch_us(ts) + gap_us) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM g
       |), marked AS (
       |  SELECT user_id, ts, event_id, value, gap_us,
       |    CASE WHEN prev_end IS NULL OR epoch_us(ts) >= prev_end
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM flagged
       |), sess AS (
       |  SELECT user_id, ts, value, gap_us,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM marked)
       |SELECT user_id, MIN(ts) AS s_start,
       |  make_timestamp(MAX(epoch_us(ts) + gap_us)) AS s_end,
       |  COUNT(*) AS n, ${sqlSum("value")} AS sum_value
       |FROM sess
       |GROUP BY user_id, sid
       |ORDER BY user_id, s_start""".stripMargin

  /** Conversion funnel: per user, first 'view' and the earliest
    * 'purchase' within 1 hour of it. The per-user range join shuffles
    * both sides once on user_id (sort-merge with the range as a join
    * residual) — the standard funnel/attribution shape; converted is an
    * INT flag so the schema is engine-neutral. */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val firstView = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("first_view"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"))
    firstView.join(purchases,
        purchases("user_id") === firstView("user_id") &&
          $"p_ts" >= $"first_view" &&
          $"p_ts" <= $"first_view" + expr("INTERVAL 1 HOUR"),
        "left")
      .groupBy(firstView("user_id").as("user_id"), $"first_view")
      .agg(min($"p_ts").as("conv_ts"))
      .select($"user_id", $"first_view", $"conv_ts",
        when($"conv_ts".isNotNull, 1).otherwise(0).as("converted"))
      .orderBy($"user_id")
  }

  val qFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS first_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), p AS (
      |  SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
      |)
      |SELECT v.user_id, v.first_view, MIN(p.p_ts) AS conv_ts,
      |  CAST(CASE WHEN MIN(p.p_ts) IS NOT NULL THEN 1 ELSE 0 END AS INT) AS converted
      |FROM v LEFT JOIN p
      |  ON p.user_id = v.user_id
      | AND p.p_ts >= v.first_view
      | AND p.p_ts <= v.first_view + INTERVAL 1 HOUR
      |GROUP BY v.user_id, v.first_view
      |ORDER BY v.user_id""".stripMargin

  /** Exponentially-weighted moving average (half-life decay, α = 1/2)
    * of each user's event values — the time-series smoothing primitive,
    * truncated to the last 8 observations and renormalized over the
    * weights actually present. Cross-engine EXACT on doubles by
    * construction: every weight is a power of two (128..1, scaled by
    * 2^7), so each product is exact; the numerator/denominator sums are
    * written as the same left-associated IEEE op tree in both engines
    * (the q_bm25 trick); and the single final division of identical
    * operands is correctly rounded in both. Shape: all 8 lags share one
    * window spec → ONE sort within the user_id shuffle, no join, no
    * second exchange; the orderBy is presentation-only. */
  def qEwma(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    // scaled weights 2^(7-k) for lag k; k=0 is the current row (no lag)
    val wts = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)
    val num = wts.zipWithIndex.map {
      case (wt, 0) => $"value" * lit(wt.toDouble)
      case (wt, k) => coalesce(lag($"value", k).over(w), lit(0.0)) * lit(wt.toDouble)
    }.reduceLeft(_ + _)
    val den = wts.zipWithIndex.map {
      case (wt, 0) => lit(wt)
      case (wt, k) => when(lag($"value", k).over(w).isNotNull, lit(wt)).otherwise(lit(0L))
    }.reduceLeft(_ + _)
    Tables.events(spark, sfDir)
      .withColumn("ewma", num / den.cast("double"))
      .select($"event_id", $"user_id", $"ts", $"value", $"ewma")
      .orderBy($"event_id")
  }

  val qEwmaSql: String =
    """SELECT event_id, user_id, ts, value,
      |  (value * 128
      |   + COALESCE(lag(value, 1) OVER w, 0.0) * 64
      |   + COALESCE(lag(value, 2) OVER w, 0.0) * 32
      |   + COALESCE(lag(value, 3) OVER w, 0.0) * 16
      |   + COALESCE(lag(value, 4) OVER w, 0.0) * 8
      |   + COALESCE(lag(value, 5) OVER w, 0.0) * 4
      |   + COALESCE(lag(value, 6) OVER w, 0.0) * 2
      |   + COALESCE(lag(value, 7) OVER w, 0.0) * 1) /
      |  CAST(128
      |   + CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN 64 ELSE 0 END
      |   + CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN 32 ELSE 0 END
      |   + CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN 16 ELSE 0 END
      |   + CASE WHEN lag(value, 4) OVER w IS NOT NULL THEN 8 ELSE 0 END
      |   + CASE WHEN lag(value, 5) OVER w IS NOT NULL THEN 4 ELSE 0 END
      |   + CASE WHEN lag(value, 6) OVER w IS NOT NULL THEN 2 ELSE 0 END
      |   + CASE WHEN lag(value, 7) OVER w IS NOT NULL THEN 1 ELSE 0 END
      |   AS DOUBLE) AS ewma
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** Daily new users + running distinct-user count — the growth-metrics
    * primitive. Spark has no COUNT(DISTINCT) over a window; the
    * SCALE-TRUE formulation is first-touch attribution: min(date) per
    * user (one partial+final agg over users), count first-touches per
    * day, then a running sum over the DATE-level table — the only
    * single-partition window, |days| rows, constant-size. The oracle is
    * the INDEPENDENT quadratic formulation (a correlated COUNT(DISTINCT)
    * subquery per day), so the first-touch identity itself is
    * value-verified. Days with events but no new users stay present with
    * new_users = 0 via the distinct-days spine. */
  def qRunningDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val days = ev.select(to_date($"ts").as("d")).distinct()
    val newPerDay = ev.groupBy($"user_id").agg(min(to_date($"ts")).as("d"))
      .groupBy($"d").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy($"d").rowsBetween(Window.unboundedPreceding, 0)
    days.join(newPerDay, Seq("d"), "left")
      .withColumn("new_users", coalesce($"new_users", lit(0L)))
      .withColumn("cum_users", sum($"new_users").over(w))
      .orderBy($"d")
  }

  val qRunningDistinctSql: String =
    """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
      |f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fd FROM events GROUP BY user_id)
      |SELECT d.d,
      |  CAST((SELECT COUNT(*) FROM f WHERE f.fd = d.d) AS BIGINT) AS new_users,
      |  CAST((SELECT COUNT(DISTINCT e.user_id) FROM events e
      |        WHERE CAST(e.ts AS DATE) <= d.d) AS BIGINT) AS cum_users
      |FROM days d
      |ORDER BY d.d""".stripMargin

  /** Time-series RESAMPLE with linear interpolation — the gap-filling
    * sibling of [[pystreamsspark.relational.PipelineQueries.qGapfill]]
    * that reconstructs a VALUE (not a zero count) for missing slots:
    * per event_type, the hourly series of max(value), with empty hours
    * linearly interpolated between the nearest present neighbors
    * (leading/trailing gaps stay NULL). The sensor-data resample every
    * telemetry pipeline needs.
    *
    * Scale shape: the spine is types × hour sequence (tiny, broadcast);
    * the series itself is one partial+final max-aggregate; prev/next
    * neighbor discovery is two frame-bounded window passes partitioned
    * by event_type — no self-join, no point lookup per gap. Float
    * parity: max(double) is order-independent, and the interpolation
    * formula is one fixed IEEE op sequence (sub, div, mul, add) on both
    * engines — bit-identical without decimal casts.
    */
  def qInterp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val bounds = ev.agg(
      date_trunc("hour", min($"ts")).as("lo"),
      date_trunc("hour", max($"ts")).as("hi"))
    val hours = bounds.select(
      explode(sequence($"lo", $"hi", expr("INTERVAL 1 HOUR"))).as("hour"))
    val types = ev.select($"event_type").distinct()
    val series = ev
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(max($"value").as("v"))
    val spine = types.crossJoin(broadcast(hours))
      .join(series, Seq("event_type", "hour"), "left")
      .withColumn("idx", expr("unix_micros(hour) div 3600000000"))
    val before = Window.partitionBy($"event_type").orderBy($"idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window.partitionBy($"event_type").orderBy($"idx")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine
      .withColumn("pv", last($"v", ignoreNulls = true).over(before))
      .withColumn("pi", last(when($"v".isNotNull, $"idx"), ignoreNulls = true).over(before))
      .withColumn("nv", first($"v", ignoreNulls = true).over(after))
      .withColumn("ni", first(when($"v".isNotNull, $"idx"), ignoreNulls = true).over(after))
      .select($"event_type", $"hour",
        $"v".isNull.as("filled"),
        when($"v".isNotNull, $"v")
          .otherwise($"pv" + ($"nv" - $"pv") *
            (($"idx" - $"pi").cast("double") / ($"ni" - $"pi").cast("double")))
          .as("v_out"))
      .orderBy($"event_type", $"hour")
  }

  val qInterpSql: String =
    """WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
      |                  date_trunc('hour', max(ts)) AS hi FROM events),
      |h AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
      |ty AS (SELECT DISTINCT event_type FROM events),
      |s AS (SELECT event_type, date_trunc('hour', ts) AS hour, MAX(value) AS v
      |      FROM events GROUP BY 1, 2),
      |sp AS (
      |  SELECT ty.event_type, h.hour, s.v,
      |    epoch_us(h.hour) // 3600000000 AS idx
      |  FROM ty CROSS JOIN h
      |  LEFT JOIN s ON s.event_type = ty.event_type AND s.hour = h.hour
      |), n AS (
      |  SELECT event_type, hour, v, idx,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
      |    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY idx
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY idx
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
      |  FROM sp
      |)
      |SELECT event_type, hour, v IS NULL AS filled,
      |  CASE WHEN v IS NOT NULL THEN v
      |       ELSE pv + (nv - pv) *
      |         (CAST(idx - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE)) END AS v_out
      |FROM n
      |ORDER BY event_type, hour""".stripMargin

  /** Time-weighted average of `value` per event type — the metric a
    * billing/monitoring pipeline needs when samples arrive at IRREGULAR
    * intervals and a plain mean over-weights bursts: each reading is
    * weighted by how long it was current (Δt to the next event in the
    * same group), TWA = Σ v·Δt / Σ Δt. The last reading per group has
    * no successor and is dropped (standard right-open treatment).
    *
    * Exactness: v is 2-decimal → DECIMAL(12,2) exact; Δt is integer µs;
    * the product stays DECIMAL(31,2) — inside precision 38 in BOTH
    * engines (wider operands would silently promote to double in
    * DuckDB) — so both sums are order-independent exact, exit through
    * the Det string route, and the single division is correctly
    * rounded. Shape: one lead() window partitioned by type (never
    * SinglePartition), one partial+final agg. */
  def qTwa(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val DV = org.apache.spark.sql.types.DecimalType(12, 2)
    val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .withColumn("nxt", lead($"ts", 1).over(w))
      .filter($"nxt".isNotNull)
      .select($"event_type",
        (unix_micros($"nxt") - unix_micros($"ts")).as("dt"),
        $"value".cast(DV).as("v"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        d2d(sum($"v" * $"dt")).as("wsum"), sum($"dt").as("tsum"))
      .select($"event_type", $"n",
        ($"wsum" / $"tsum".cast("double")).as("twa"))
      .orderBy($"event_type")
  }

  val qTwaSql: String =
    """WITH d AS (
      |  SELECT event_type, ts, CAST(value AS DECIMAL(12,2)) AS v,
      |    lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)
      |      AS nxt
      |  FROM events),
      |f AS (
      |  SELECT event_type, epoch_us(nxt) - epoch_us(ts) AS dt, v
      |  FROM d WHERE nxt IS NOT NULL)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(CAST(SUM(v * dt) AS STRING) AS DOUBLE)
      |    / CAST(CAST(SUM(dt) AS BIGINT) AS DOUBLE) AS twa
      |FROM f GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Multi-level time-constrained funnel (the windowFunnel shape): how
    * far each user gets through view → click → purchase when every NEXT
    * step must land within 1 hour of the PREVIOUS step's time — not one
    * global window like [[qFunnel]], but a per-step chain, which is
    * what separates "engaged then converted" from coincidental events a
    * day apart. Levels are chained per-user min-aggregates: t1 = first
    * view, t2 = first qualifying click after t1, t3 = first qualifying
    * purchase after t2; each stage is a user-keyed join against a
    * user-keyed aggregate (co-partitioned, no windows, no theta
    * explosion). Output: users per reached level, level 0 = active
    * users who never viewed. Timestamps are µs integers, so every
    * comparison is exact cross-engine. */
  def qWindowFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val hour = expr("INTERVAL 1 HOUR")
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val t2 = ev.filter($"event_type" === "click")
      .join(t1, "user_id")
      .filter($"ts" > $"t1" && $"ts" <= $"t1" + hour)
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val t3 = ev.filter($"event_type" === "purchase")
      .join(t2, "user_id")
      .filter($"ts" > $"t2" && $"ts" <= $"t2" + hour)
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    ev.select($"user_id").distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(when($"t3".isNotNull, 3L).when($"t2".isNotNull, 2L)
        .when($"t1".isNotNull, 1L).otherwise(0L).as("level"))
      .groupBy($"level").agg(count(lit(1)).as("n_users"))
      .orderBy($"level")
  }

  val qWindowFunnelSql: String =
    """WITH t1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM events e JOIN t1 ON t1.user_id = e.user_id
      |  WHERE e.event_type = 'click'
      |    AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL 1 HOUR
      |  GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN t2 ON t2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND e.ts > t2.t2 AND e.ts <= t2.t2 + INTERVAL 1 HOUR
      |  GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM events)
      |SELECT level, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
      |  SELECT CASE WHEN t3.t3 IS NOT NULL THEN 3
      |              WHEN t2.t2 IS NOT NULL THEN 2
      |              WHEN t1.t1 IS NOT NULL THEN 1
      |              ELSE 0 END AS level
      |  FROM u
      |  LEFT JOIN t1 ON t1.user_id = u.user_id
      |  LEFT JOIN t2 ON t2.user_id = u.user_id
      |  LEFT JOIN t3 ON t3.user_id = u.user_id)
      |GROUP BY level
      |ORDER BY level""".stripMargin

  /** Rolling 24-point correlation between the hourly click and view
    * revenue series — the co-movement monitor a metrics pipeline runs
    * to catch decoupling (a tracking bug on one surface shows up as a
    * correlation collapse long before either series alone alarms).
    *
    * Exactness discipline: the hourly values stay DECIMAL through the
    * rolling frame — per-hour sums, the frame sums Σx Σy Σxy Σx² Σy²
    * (products are DECIMAL(29,4), inside precision 38 in both engines)
    * — every input to the closing Pearson formula is order-independent
    * exact, exits via the Det string route, and the formula itself is
    * one fixed IEEE tree (sub/mul/div/sqrt). Frames with fewer than 24
    * observed hours or a zero-variance side are excluded rather than
    * emitting engine-dependent NaN.
    *
    * Scale: the windowed relation is HOURS (bounded by the time span,
    * not the corpus size) after one partial+final agg over the raw
    * stream — same bounded-domain argument as q_ks_test. */
  def qRollingCorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val DV = org.apache.spark.sql.types.DecimalType(14, 2)
    val hourly = Tables.events(spark, sfDir)
      .filter($"event_type".isin("click", "view"))
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(
        coalesce(sum(when($"event_type" === "click", $"value".cast(DV))),
          lit(0).cast(DV)).cast(DV).as("x"),
        coalesce(sum(when($"event_type" === "view", $"value".cast(DV))),
          lit(0).cast(DV)).cast(DV).as("y"))
    val w = Window.orderBy($"hour").rowsBetween(-23, 0)
    val framed = hourly
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("sx", d2d(sum($"x").over(w)))
      .withColumn("sy", d2d(sum($"y").over(w)))
      .withColumn("sxy", d2d(sum($"x" * $"y").over(w)))
      .withColumn("sxx", d2d(sum($"x" * $"x").over(w)))
      .withColumn("syy", d2d(sum($"y" * $"y").over(w)))
      .filter($"m" === 24)
    val nD = lit(24.0)
    val vx = nD * $"sxx" - $"sx" * $"sx"
    val vy = nD * $"syy" - $"sy" * $"sy"
    framed
      .filter(vx > 0.0 && vy > 0.0)
      .select($"hour", d2d($"x").as("x"), d2d($"y").as("y"),
        ((nD * $"sxy" - $"sx" * $"sy") / (sqrt(vx) * sqrt(vy)))
          .as("corr24"))
      .orderBy($"hour")
  }

  val qRollingCorrSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour,
      |    CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
      |      THEN CAST(value AS DECIMAL(14,2)) END), 0) AS DECIMAL(14,2)) AS x,
      |    CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
      |      THEN CAST(value AS DECIMAL(14,2)) END), 0) AS DECIMAL(14,2)) AS y
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY 1),
      |f AS (
      |  SELECT hour, x, y,
      |    COUNT(*) OVER w AS m,
      |    CAST(CAST(SUM(x) OVER w AS STRING) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(y) OVER w AS STRING) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(x * y) OVER w AS STRING) AS DOUBLE) AS sxy,
      |    CAST(CAST(SUM(x * x) OVER w AS STRING) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(y * y) OVER w AS STRING) AS DOUBLE) AS syy
      |  FROM hourly
      |  WINDOW w AS (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
      |SELECT hour,
      |  CAST(CAST(x AS STRING) AS DOUBLE) AS x,
      |  CAST(CAST(y AS STRING) AS DOUBLE) AS y,
      |  (24.0 * sxy - sx * sy) /
      |    (sqrt(24.0 * sxx - sx * sx) * sqrt(24.0 * syy - sy * sy)) AS corr24
      |FROM f
      |WHERE m = 24
      |  AND (24.0 * sxx - sx * sx) > 0.0 AND (24.0 * syy - sy * sy) > 0.0
      |ORDER BY hour""".stripMargin

  /** Inter-event dwell time: for each event TYPE, the distribution of
    * seconds until the same user's next event (any type) — the
    * time-on-step metric a product-analytics pipeline derives from a
    * raw event stream. Gaps are exact integer seconds (µs difference
    * with integer division — timestamps are stored values, never
    * arithmetic); the median/p90 ride the q_percentile-proven
    * percentile ↔ quantile_cont parity (interpolation on exact integer
    * inputs). Shape: one per-user window (partitioned — scales across
    * users), then one partial+final agg into the 5-type domain. */
  def qDwell(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .withColumn("next_ts", lead($"ts", 1).over(w))
      .filter($"next_ts".isNotNull)
      .withColumn("gap_s",
        expr("(unix_micros(next_ts) - unix_micros(ts)) div 1000000"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap_s, 0.5)").as("p50_s"),
        expr("percentile(gap_s, 0.9)").as("p90_s"),
        max($"gap_s").as("max_s"))
      .orderBy($"event_type")
  }

  val qDwellSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    (epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
      |       ORDER BY ts, event_id)) - epoch_us(ts)) // 1000000 AS gap_s
      |  FROM events)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  quantile_cont(gap_s, 0.5) AS p50_s,
      |  quantile_cont(gap_s, 0.9) AS p90_s,
      |  CAST(MAX(gap_s) AS BIGINT) AS max_s
      |FROM g
      |WHERE gap_s IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Rolling 24-hour MEDIAN (and IQR edges) of the hourly revenue
    * series — the robust-trend monitor that ignores the spikes a
    * rolling MEAN chases. Spark 4 allows the exact `percentile`
    * aggregate as a WINDOW function, so this is declarative on both
    * engines (quantile_cont OVER in DuckDB). Inputs are decimal-exact
    * hourly sums exported through the §7.5 string route; interpolation
    * on identical sorted doubles is bit-identical cross-engine (the
    * q_percentile-proven parity). The windowed relation is HOURS —
    * bounded by the time span, not corpus size (q_rolling_corr's
    * bounded-domain argument). */
  def qRollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val DV = org.apache.spark.sql.types.DecimalType(14, 2)
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(d2d(sum($"value".cast(DV))).as("x"))
      .selectExpr("hour", "x",
        "count(*) OVER (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS m",
        "percentile(x, 0.25) OVER (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS p25_24h",
        "percentile(x, 0.5) OVER (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS med_24h",
        "percentile(x, 0.75) OVER (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS p75_24h")
      .filter($"m" === 24)
      .select($"hour", $"x", $"p25_24h", $"med_24h", $"p75_24h")
      .orderBy($"hour")
  }

  val qRollingMedianSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(14,2))) AS STRING) AS DOUBLE)
      |      AS x
      |  FROM events GROUP BY 1),
      |f AS (
      |  SELECT hour, x,
      |    COUNT(*) OVER w AS m,
      |    quantile_cont(x, 0.25) OVER w AS p25_24h,
      |    quantile_cont(x, 0.5) OVER w AS med_24h,
      |    quantile_cont(x, 0.75) OVER w AS p75_24h
      |  FROM hourly
      |  WINDOW w AS (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
      |SELECT hour, x, p25_24h, med_24h, p75_24h
      |FROM f WHERE m = 24
      |ORDER BY hour""".stripMargin

  /** Timestamp BETWEEN range join — the commonest real-world range join
    * (events falling inside per-entity time windows), planned as a
    * bin-bucketed EQUI-join by [[pystreamsspark.plans.RangeJoinBinRule]]
    * rather than the BroadcastNestedLoopJoin vanilla Spark would pick.
    * Intervals are a 1/997 sample of events opened for 10 minutes; the
    * point side is the full events table. binWidth = 6e8 µs (10 min),
    * so each interval lands on ≤2 bins — bounded replication, and the
    * whole join is one shuffle on the bin key instead of |iv|·|events|
    * comparisons. At 100 TB the nested loop is quadratic death; the bin
    * join scales with data volume. The rule is registered idempotently
    * here (Verify's plain session has no extensions), and the rewrite
    * is semantics-preserving, so conf leakage to later keys is benign —
    * it only fires on closed two-sided BETWEEN joins with no equi
    * conjunct. RangeJoinRuleSpec asserts the no-nested-loop plan shape.
    */
  def qTimeRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import pystreamsspark.plans.RangeJoinBinRule
    if (!spark.experimental.extraOptimizations.contains(RangeJoinBinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinBinRule
    spark.conf.set(RangeJoinBinRule.BinWidthKey, 6e8.toString)
    val ev = Tables.events(spark, sfDir)
    val iv = ev.filter($"event_id" % 997 === 0)
      .select($"event_id".as("iv_id"), $"ts".as("lo"),
        ($"ts" + expr("INTERVAL 10 MINUTES")).as("hi"))
    val pts = ev.select($"ts", $"value")
    pts.join(iv, $"ts" >= $"lo" && $"ts" <= $"hi")
      .groupBy($"iv_id")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"iv_id")
  }

  val qTimeRangeJoinSql: String =
    s"""WITH iv AS (
       |  SELECT event_id AS iv_id, ts AS lo,
       |    ts + INTERVAL 10 MINUTE AS hi
       |  FROM events WHERE event_id % 997 = 0)
       |SELECT iv_id, COUNT(*) AS n, ${sqlSum("e.value")} AS sum_value
       |FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts <= iv.hi
       |GROUP BY iv_id
       |ORDER BY iv_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rolling_median" -> (qRollingMedian _),
    "q_dwell"          -> (qDwell _),
    "q_session_dyngap" -> (qSessionDyngap _),
    "q_window_funnel"  -> (qWindowFunnel _),
    "q_rolling_corr"   -> (qRollingCorr _),
    "q_twa"            -> (qTwa _),
    "q_running_distinct" -> (qRunningDistinct _),
    "q_tumbling"       -> (qTumbling _),
    "q_sliding"        -> (qSliding _),
    "q_session_window" -> (qSessionWindow _),
    "q_ewma"           -> (qEwma _),
    "q_interp"         -> (qInterp _),
    "q_funnel"         -> (qFunnel _),
    "q_time_range_join" -> (qTimeRangeJoin _))

  val oracle: Map[String, String] = Map(
    "q_rolling_median" -> qRollingMedianSql,
    "q_dwell"          -> qDwellSql,
    "q_session_dyngap" -> qSessionDyngapSql,
    "q_window_funnel"  -> qWindowFunnelSql,
    "q_rolling_corr"   -> qRollingCorrSql,
    "q_twa"            -> qTwaSql,
    "q_running_distinct" -> qRunningDistinctSql,
    "q_tumbling"       -> qTumblingSql,
    "q_sliding"        -> qSlidingSql,
    "q_session_window" -> qSessionWindowSql,
    "q_ewma"           -> qEwmaSql,
    "q_interp"         -> qInterpSql,
    "q_funnel"         -> qFunnelSql,
    "q_time_range_join" -> qTimeRangeJoinSql)
}
