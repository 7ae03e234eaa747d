package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import pystreamsspark.io.Tables
import Det._

/** Distribution-drift monitors and behavioral aggregates — the checks a
  * production data pipeline runs between ingestion batches: "did this
  * week's data come from the same distribution as last week's?", "which
  * contingency cells shifted?", "how long do users stay active?",
  * "which touchpoint deserves conversion credit?".
  *
  * Exactness discipline (SURVEY.md §7.5, same rules as the rest of the
  * repo): counts stay integer end-to-end; every float is produced by a
  * FIXED-SHAPE tree of correctly-rounded IEEE ops (+ − × ÷ sqrt abs) on
  * bit-identical operands, or exits decimal aggregation through the Det
  * string route. No libm transcendentals (ln/exp) anywhere — that is why
  * the drift statistic here is total-variation distance and per-cell
  * chi-square contributions, not PSI/KL whose ln() is not correctly
  * rounded in either engine.
  */
object DriftQueries {

  /** Autocorrelation (ACF) of the hourly revenue series at lags 1–3 —
    * the seasonality/self-similarity probe a forecasting pipeline runs
    * before choosing model order (a high lag-24 would mean daily cycle;
    * lags 1–3 measure short-range momentum).
    *
    * Exactness: hourly sums stay DECIMAL(14,2); the lagged pair sums
    * Σx Σy Σxy Σx² Σy² are decimal-exact (products DECIMAL(29,4),
    * within precision 38 in both engines — the q_rolling_corr-proven
    * path) and exit via the Det string route; the closing Pearson
    * formula is one fixed IEEE tree. Zero-variance lags are excluded
    * rather than emitting engine-dependent NaN.
    *
    * Scale: one partial+final agg over the raw stream reduces to HOURS
    * (bounded by the time span, not corpus size); the lag window and
    * the 3-row output are bounded-domain. At 100 TB the only unbounded
    * cost is the first scan. */
  def qAutocorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val DV = DecimalType(14, 2)
    val hourly = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(coalesce(sum($"value".cast(DV)), lit(0).cast(DV)).cast(DV).as("x"))
    val w = Window.orderBy($"hour")
    val lagged = hourly
      .withColumn("y1", lag($"x", 1).over(w))
      .withColumn("y2", lag($"x", 2).over(w))
      .withColumn("y3", lag($"x", 3).over(w))
      .selectExpr("stack(3, 1, x, y1, 2, x, y2, 3, x, y3) AS (lag_h, x, y)")
      .filter($"y".isNotNull)
    val a = lagged.groupBy($"lag_h")
      .agg(count(lit(1)).as("n_pairs"),
        d2d(sum($"x")).as("sx"), d2d(sum($"y")).as("sy"),
        d2d(sum($"x" * $"y")).as("sxy"),
        d2d(sum($"x" * $"x")).as("sxx"),
        d2d(sum($"y" * $"y")).as("syy"))
    val nD = $"n_pairs".cast("double")
    val vx = nD * $"sxx" - $"sx" * $"sx"
    val vy = nD * $"syy" - $"sy" * $"sy"
    a.filter(vx > 0.0 && vy > 0.0)
      .select($"lag_h", $"n_pairs",
        ((nD * $"sxy" - $"sx" * $"sy") / (sqrt(vx) * sqrt(vy))).as("acf"))
      .orderBy($"lag_h")
  }

  val qAutocorrSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour,
      |    CAST(COALESCE(SUM(CAST(value AS DECIMAL(14,2))), 0)
      |      AS DECIMAL(14,2)) AS x
      |  FROM events GROUP BY 1),
      |l AS (
      |  SELECT hour, x,
      |    lag(x, 1) OVER (ORDER BY hour) AS y1,
      |    lag(x, 2) OVER (ORDER BY hour) AS y2,
      |    lag(x, 3) OVER (ORDER BY hour) AS y3
      |  FROM hourly),
      |p AS (
      |  SELECT 1 AS lag_h, x, y1 AS y FROM l WHERE y1 IS NOT NULL
      |  UNION ALL
      |  SELECT 2 AS lag_h, x, y2 AS y FROM l WHERE y2 IS NOT NULL
      |  UNION ALL
      |  SELECT 3 AS lag_h, x, y3 AS y FROM l WHERE y3 IS NOT NULL),
      |a AS (
      |  SELECT lag_h, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(CAST(SUM(x) AS STRING) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(y) AS STRING) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(x * y) AS STRING) AS DOUBLE) AS sxy,
      |    CAST(CAST(SUM(x * x) AS STRING) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(y * y) AS STRING) AS DOUBLE) AS syy
      |  FROM p GROUP BY lag_h)
      |SELECT lag_h, n_pairs,
      |  (CAST(n_pairs AS DOUBLE) * sxy - sx * sy) /
      |    (sqrt(CAST(n_pairs AS DOUBLE) * sxx - sx * sx) *
      |     sqrt(CAST(n_pairs AS DOUBLE) * syy - sy * sy)) AS acf
      |FROM a
      |WHERE (CAST(n_pairs AS DOUBLE) * sxx - sx * sx) > 0.0
      |  AND (CAST(n_pairs AS DOUBLE) * syy - sy * sy) > 0.0
      |ORDER BY lag_h""".stripMargin

  /** Per-cell chi-square contributions of the event_type × day-of-week
    * contingency table — the drill-down a drift monitor shows when the
    * independence test fires: WHICH cells are over/under-represented,
    * not just that the table shifted. (The summed statistic is a
    * float-addition order hazard; the per-cell terms are each one fixed
    * IEEE tree and carry strictly more information.)
    *
    * Day-of-week is computed as days-since-epoch mod 7 (a fixed Monday
    * anchor) rather than either engine's dayofweek() — those disagree
    * on week start across engines, the subtraction never does.
    *
    * Shape: one partial+final agg to the 35-cell table; the row/column
    * marginals are aggregates OF THE CELLS (35 rows, not a rescan) and
    * broadcast back. At 100 TB the only unbounded cost is the first
    * scan; everything after is bounded by the category domain. */
  def qChisqCells(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the 35-row cell table is referenced four times (cells + three
    // marginals) — materialize it once so the events scan runs ONCE,
    // not once per reference (at 100 TB the scan IS the query's cost)
    val cells = pystreamsspark.operators.Lineage.truncate(
      Tables.events(spark, sfDir)
        .select($"event_type",
          pmod(datediff($"ts", lit("1995-01-02")), lit(7)).as("dow"))
        .groupBy($"event_type", $"dow")
        .agg(count(lit(1)).as("o")))
    val rowT = cells.groupBy($"event_type").agg(sum($"o").as("rt"))
    val colT = cells.groupBy($"dow").agg(sum($"o").as("ct"))
    val tot = cells.agg(sum($"o").as("n"))
    val j = cells
      .join(broadcast(rowT), Seq("event_type"))
      .join(broadcast(colT), Seq("dow"))
      .crossJoin(broadcast(tot))
    val e = ($"rt" * $"ct").cast("double") / $"n".cast("double")
    val od = $"o".cast("double")
    j.select($"event_type", $"dow", $"o", e.as("expected"),
        (((od - e) * (od - e)) / e).as("chi2_term"))
      .orderBy($"event_type", $"dow")
  }

  val qChisqCellsSql: String =
    """WITH cells AS (
      |  SELECT event_type,
      |    (CAST(ts AS DATE) - DATE '1995-01-02') % 7 AS dow,
      |    CAST(COUNT(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt
      |       FROM cells GROUP BY 1),
      |ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
      |j AS (
      |  SELECT c.event_type, c.dow, c.o,
      |    CAST(rt.rt * ct.ct AS DOUBLE) / CAST(tot.n AS DOUBLE) AS expected
      |  FROM cells c
      |  JOIN rt ON c.event_type = rt.event_type
      |  JOIN ct ON c.dow = ct.dow
      |  CROSS JOIN tot)
      |SELECT event_type, CAST(dow AS INT) AS dow, o, expected,
      |  ((CAST(o AS DOUBLE) - expected) * (CAST(o AS DOUBLE) - expected))
      |    / expected AS chi2_term
      |FROM j
      |ORDER BY event_type, dow""".stripMargin

  /** Histogram drift between two order cohorts (1996 vs 1999) over fixed
    * o_totalprice bins — the PSI-style bin table with an EXACT
    * total-variation distance instead of PSI's ln(): per-bin shares p1
    * p2, their signed drift, and the global TVD = ½·Σ|p1−p2| computed in
    * pure integers (½·Σ|n1ᵢ·N2 − n2ᵢ·N1| / (N1·N2) — the float division
    * happens ONCE, after the exact integer sum, so there is no
    * float-addition order hazard anywhere).
    *
    * Shape: single scan with conditional aggregation into the bounded
    * bin domain (no per-cohort rescan), then bounded-size broadcasts;
    * the bin edges are fixed so the output schema is static. */
  def qPsiBins(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the 9-row bin table feeds three consumers (rows, totals, TVD
    // numerator) — materialize it so the orders scan runs once
    val bins = pystreamsspark.operators.Lineage.truncate(
      Tables.orders(spark, sfDir)
        .filter(year($"o_orderdate").isin(1996, 1999))
        .select(least(floor($"o_totalprice" / 50000.0), lit(8.0))
          .cast("int").as("bin"),
          year($"o_orderdate").as("y"))
        .groupBy($"bin")
        .agg(sum(when($"y" === 1996, 1L).otherwise(0L)).as("n1"),
          sum(when($"y" === 1999, 1L).otherwise(0L)).as("n2")))
    val tot = bins.agg(sum($"n1").as("t1"), sum($"n2").as("t2"))
    val num = bins.crossJoin(broadcast(tot))
      .agg(sum(abs($"n1" * $"t2" - $"n2" * $"t1")).as("numer"))
    val p1 = $"n1".cast("double") / $"t1".cast("double")
    val p2 = $"n2".cast("double") / $"t2".cast("double")
    bins.crossJoin(broadcast(tot)).crossJoin(broadcast(num))
      .select($"bin", $"n1", $"n2", p1.as("p1"), p2.as("p2"),
        (p1 - p2).as("drift"),
        (lit(0.5) * ($"numer".cast("double") /
          ($"t1" * $"t2").cast("double"))).as("tvd"))
      .orderBy($"bin")
  }

  val qPsiBinsSql: String =
    """WITH b AS (
      |  SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 8.0) AS INT) AS bin,
      |    CAST(SUM(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN year(o_orderdate) = 1999 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n2
      |  FROM orders
      |  WHERE year(o_orderdate) IN (1996, 1999)
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
      |               CAST(SUM(n2) AS BIGINT) AS t2 FROM b),
      |nm AS (
      |  SELECT CAST(SUM(ABS(n1 * t2 - n2 * t1)) AS BIGINT) AS numer
      |  FROM b CROSS JOIN tot)
      |SELECT bin, n1, n2,
      |  CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS p1,
      |  CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE) AS p2,
      |  CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
      |    - CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE) AS drift,
      |  0.5 * (CAST(numer AS DOUBLE) / CAST(t1 * t2 AS DOUBLE)) AS tvd
      |FROM b CROSS JOIN tot CROSS JOIN nm
      |ORDER BY bin""".stripMargin

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands shape (day − row_number is constant within a run
    * of consecutive days), the engagement metric every activity
    * dashboard ships. Integer-exact end to end.
    *
    * Shape: distinct (user, day) → per-user window (partitioned, so it
    * scales across users) → two bounded aggs. Top-50 with a total
    * tie-break. */
  def qStreaks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, sfDir)
      .select($"user_id", datediff($"ts", lit("1995-01-01")).as("d"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"d")
    val streaks = days
      .withColumn("grp", $"d" - row_number().over(w))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"))
    streaks.groupBy($"user_id")
      .agg(max($"len").as("best_streak"),
        count(lit(1)).as("n_streaks"),
        sum($"len").as("active_days"))
      .orderBy($"best_streak".desc, $"user_id")
      .limit(50)
  }

  val qStreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(ts AS DATE) - DATE '1995-01-01' AS d
      |  FROM events),
      |s AS (
      |  SELECT user_id,
      |    d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      |  FROM days),
      |runs AS (
      |  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      |  FROM s GROUP BY user_id, grp)
      |SELECT user_id, CAST(MAX(len) AS BIGINT) AS best_streak,
      |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(SUM(len) AS BIGINT) AS active_days
      |FROM runs
      |GROUP BY user_id
      |ORDER BY best_streak DESC, user_id
      |LIMIT 50""".stripMargin

  /** First-touch vs last-touch conversion attribution: for each user
    * who purchased, credit the event_type of the FIRST and of the LAST
    * event strictly before their first purchase (strict order on
    * (ts, event_id), the repo's standard total order on events). The
    * two models' credit counts per touchpoint, side by side — the
    * comparison every marketing-analytics pipeline ships.
    *
    * Shape: ONE scan — the first-purchase key is a conditional min over
    * a user-partitioned window (no self-join back onto the stream),
    * then per-user min_by/max_by on the prior slice and a bounded
    * credit agg: one window shuffle + one agg shuffle total, both on
    * user_id (AQE coalesces them). Integer counts — exact. */
  def qAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val uw = Window.partitionBy($"user_id")
    val prior = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", struct($"ts", $"event_id").as("k"))
      .withColumn("pk",
        min(when($"event_type" === "purchase", $"k")).over(uw))
      .filter($"pk".isNotNull && $"k" < $"pk")
    val perUser = prior.groupBy($"user_id")
      .agg(min_by($"event_type", $"k").as("first_touch"),
        max_by($"event_type", $"k").as("last_touch"))
    perUser
      .selectExpr(
        "stack(2, 'first_touch', first_touch, 'last_touch', last_touch)" +
          " AS (model, touchpoint)")
      .groupBy($"model", $"touchpoint")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"model", $"touchpoint")
  }

  val qAttributionSql: String =
    """WITH fp AS (
      |  SELECT user_id, MIN(ROW(ts, event_id)) AS pk
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY user_id),
      |prior AS (
      |  SELECT e.user_id, e.event_type, e.ts, e.event_id
      |  FROM events e JOIN fp ON e.user_id = fp.user_id
      |  WHERE ROW(e.ts, e.event_id) < fp.pk),
      |ranked AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM prior),
      |pu AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
      |    MAX(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch
      |  FROM ranked GROUP BY user_id)
      |SELECT model, touchpoint, CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM (
      |  SELECT 'first_touch' AS model, first_touch AS touchpoint FROM pu
      |  UNION ALL
      |  SELECT 'last_touch' AS model, last_touch AS touchpoint FROM pu)
      |GROUP BY model, touchpoint
      |ORDER BY model, touchpoint""".stripMargin

  /** Delete-one-block JACKKNIFE of the mean (Quenouille/Tukey; the
    * block form is the standard distributed-data variant): hash rows
    * into G=32 blocks, then each block's leave-one-out mean and
    * pseudovalue G·x̄ − (G−1)·x̄₍₋g₎ — the resampling machinery for
    * bias/variance estimation that, unlike the bootstrap, is fully
    * deterministic and relational (no with-replacement sampling).
    *
    * Exactness: block sums stay DECIMAL; every leave-one-out mean is
    * (S − s_g) exact-decimal → string-route double → ONE division;
    * pseudovalues are fixed IEEE trees over those. The per-block rows
    * ARE the deliverable (a variance of the pseudovalues would be a
    * float-sum order hazard — left to the consumer, who has exact
    * inputs). Shape: one partial+final agg into 32 blocks, broadcast
    * totals — the scan is the whole cost at any scale. */
  def qJackknife(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val D = DecimalType(38, 6)
    val blocks = Tables.orders(spark, sfDir)
      .select(
        pmod(conv(substring(md5($"o_orderkey".cast("string").cast("binary")),
          1, 10), 16, 10).cast("long"), lit(32)).as("block"),
        $"o_totalprice")
      .groupBy($"block")
      .agg(count(lit(1)).as("n_b"),
        sum($"o_totalprice".cast(D)).as("s_b"))
    val tot = blocks.agg(sum($"n_b").as("n"), sum($"s_b").as("s"))
    val g = lit(32.0)
    val meanAll = d2d($"s") / $"n".cast("double")
    val meanLoo = d2d($"s" - $"s_b") / ($"n" - $"n_b").cast("double")
    blocks.crossJoin(broadcast(tot))
      .select($"block", $"n_b",
        meanAll.as("mean_all"),
        meanLoo.as("mean_loo"),
        (g * meanAll - (g - lit(1.0)) * meanLoo).as("pseudovalue"))
      .orderBy($"block")
  }

  val qJackknifeSql: String =
    """WITH b AS (
      |  SELECT CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR)),
      |      1, 10)) AS BIGINT) % 32 AS block,
      |    CAST(COUNT(*) AS BIGINT) AS n_b,
      |    SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS s_b
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n, SUM(s_b) AS s FROM b)
      |SELECT block, n_b,
      |  CAST(CAST(s AS STRING) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_all,
      |  CAST(CAST(s - s_b AS STRING) AS DOUBLE) / CAST(n - n_b AS DOUBLE)
      |    AS mean_loo,
      |  32.0 * (CAST(CAST(s AS STRING) AS DOUBLE) / CAST(n AS DOUBLE))
      |    - (32.0 - 1.0) * (CAST(CAST(s - s_b AS STRING) AS DOUBLE)
      |        / CAST(n - n_b AS DOUBLE)) AS pseudovalue
      |FROM b CROSS JOIN tot
      |ORDER BY block""".stripMargin

  /** Cumulative GAINS / LIFT table — the model-eval classic: rank users
    * by a propensity score (here the deterministic click share
    * n_click/n_events), cut into score deciles, and report how much of
    * the positive class (purchasers) the top deciles capture vs random.
    *
    * Scale-true decile assignment: score decile BOUNDS come from one
    * exact distributed `percentile` aggregate and broadcast back — the
    * q_eqdepth_hist two-pass shape, NO global sort/ntile over users.
    * The cumulative walk runs over the ≤10 bin rows (bounded domain).
    * Exactness: counts are integers; capture and lift are single
    * divisions of exact integer products ((cum_pos·N)/(cum_n·P) — both
    * < 2^53), score is one division per user with identical IEEE
    * semantics in both engines. */
  def qGains(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val users = Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("n_click"),
        max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("pos"))
      .select($"user_id", $"pos",
        ($"n_click".cast("double") / $"n_ev".cast("double")).as("score"))
    val mat = pystreamsspark.operators.Lineage.truncate(users)
    val bounds = mat.agg(expr("percentile(score, array(0.1,0.2,0.3,0.4," +
      "0.5,0.6,0.7,0.8,0.9))").as("bs"))
    val binned = mat.crossJoin(broadcast(bounds))
      .select($"pos",
        aggregate(transform($"bs",
            b => when($"score" > b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_users"), sum($"pos").as("n_pos"))
    val tot = binned.agg(sum($"n_users").as("nt"), sum($"n_pos").as("pt"))
    val w = Window.orderBy($"bin".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned.crossJoin(broadcast(tot))
      .withColumn("cum_users", sum($"n_users").over(w))
      .withColumn("cum_pos", sum($"n_pos").over(w))
      .select($"bin", $"n_users", $"n_pos", $"cum_users", $"cum_pos",
        (($"cum_pos" * $"nt").cast("double") /
          ($"cum_users" * $"pt").cast("double")).as("lift"),
        ($"cum_pos".cast("double") / $"pt".cast("double")).as("capture"))
      .orderBy($"bin".desc)
  }

  val qGainsSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pos,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS score
      |  FROM events GROUP BY user_id),
      |b AS (
      |  SELECT [quantile_cont(score, 0.1), quantile_cont(score, 0.2),
      |          quantile_cont(score, 0.3), quantile_cont(score, 0.4),
      |          quantile_cont(score, 0.5), quantile_cont(score, 0.6),
      |          quantile_cont(score, 0.7), quantile_cont(score, 0.8),
      |          quantile_cont(score, 0.9)] AS bs
      |  FROM u),
      |binned AS (
      |  SELECT CAST(len(list_filter(bs, x -> score > x)) AS INT) AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos
      |  FROM u CROSS JOIN b
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS nt,
      |               CAST(SUM(n_pos) AS BIGINT) AS pt FROM binned),
      |c AS (
      |  SELECT bin, n_users, n_pos,
      |    CAST(SUM(n_users) OVER w AS BIGINT) AS cum_users,
      |    CAST(SUM(n_pos) OVER w AS BIGINT) AS cum_pos,
      |    nt, pt
      |  FROM binned CROSS JOIN tot
      |  WINDOW w AS (ORDER BY bin DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT bin, n_users, n_pos, cum_users, cum_pos,
      |  CAST(cum_pos * nt AS DOUBLE) / CAST(cum_users * pt AS DOUBLE)
      |    AS lift,
      |  CAST(cum_pos AS DOUBLE) / CAST(pt AS DOUBLE) AS capture
      |FROM c
      |ORDER BY bin DESC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gains"       -> (qGains _),
    "q_jackknife"   -> (qJackknife _),
    "q_autocorr"    -> (qAutocorr _),
    "q_chisq_cells" -> (qChisqCells _),
    "q_psi_bins"    -> (qPsiBins _),
    "q_streaks"     -> (qStreaks _),
    "q_attribution" -> (qAttribution _))

  val oracle: Map[String, String] = Map(
    "q_gains"       -> qGainsSql,
    "q_jackknife"   -> qJackknifeSql,
    "q_autocorr"    -> qAutocorrSql,
    "q_chisq_cells" -> qChisqCellsSql,
    "q_psi_bins"    -> qPsiBinsSql,
    "q_streaks"     -> qStreaksSql,
    "q_attribution" -> qAttributionSql)
}
