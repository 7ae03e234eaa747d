package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import Det._

/** Window-function surface (SURVEY.md §2.6). Every window orders by a
  * unique (key, tiebreak) combination so frames are deterministic.
  */
object WindowQueries {

  /** Top-3 orders per customer by row_number — the per-group top-k pattern
    * (one shuffle on the partition key, in-partition sort, early filter). */
  def qWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  val qWindowSql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Ranking family: rank / dense_rank / ntile / percent_rank over the
    * same deterministic ordering. percent_rank is (rank-1)/(n-1) in both
    * engines — one exact IEEE division, safe to compare. */
  def qRankFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(spark, sfDir)
      .select(
        $"c_mktsegment", $"c_custkey", $"c_acctbal",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("prnk"))
      .filter($"rnk" <= 20)
      .orderBy($"c_mktsegment", $"rnk", $"c_custkey")
  }

  val qRankFuncsSql: String =
    """SELECT * FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    RANK() OVER w AS rnk,
      |    DENSE_RANK() OVER w AS drnk,
      |    NTILE(4) OVER w AS quartile,
      |    PERCENT_RANK() OVER w AS prnk
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC))
      |WHERE rnk <= 20
      |ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin

  /** lag/lead analytics: gap to previous/next event per user. */
  def qLagLead(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, sfDir)
      .select(
        $"event_id", $"user_id", $"ts",
        lag($"ts", 1).over(w).as("prev_ts"),
        lead($"ts", 1).over(w).as("next_ts"),
        (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))).as("gap_us"))
      .orderBy($"event_id")
  }

  val qLagLeadSql: String =
    """SELECT event_id, user_id, ts,
      |  lag(ts, 1) OVER w AS prev_ts,
      |  lead(ts, 1) OVER w AS next_ts,
      |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  /** Moving aggregate over a rows frame; the mean is computed as exact
    * decimal frame-sum / frame-count (Det discipline) because windowed
    * avg(double) is reduction-order dependent. */
  def qMovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(-3, 0)
    Tables.events(spark, sfDir)
      .select(
        $"event_id", $"user_id", $"ts", $"value",
        (sum($"value".cast("decimal(38,6)")).over(w).cast("double") /
          count(lit(1)).over(w)).as("moving_avg"),
        max($"value").over(w).as("moving_max"))
      .orderBy($"event_id")
  }

  val qMovingAvgSql: String =
    """SELECT event_id, user_id, ts, value,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
      |    / COUNT(*) OVER w AS moving_avg,
      |  MAX(value) OVER w AS moving_max
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Gap-based sessionization (30-min inactivity): lag + conditional
    * cumulative sum, then per-session stats — two window passes over one
    * shuffle on user_id, then a hash agg. */
  def qSession(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("new_session",
        when((unix_micros($"ts") - unix_micros(lag($"ts", 1).over(wOrd))) > 1800L * 1000000L ||
             lag($"ts", 1).over(wOrd).isNull, 1).otherwise(0))
      .withColumn("session_id", sum($"new_session").over(wRun))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        (unix_micros(max($"ts")) - unix_micros(min($"ts"))).as("duration_us"))
      .orderBy($"user_id", $"session_id")
  }

  val qSessionSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800 * 1000000
      |           OR lag(ts, 1) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), sessions AS (
  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** The same top-3-per-customer answer as [[qWindow]], computed by the
    * bounded-buffer UDAF ([[pystreamsspark.operators.TopKAgg]]) instead
    * of a window sort: partial top-k on the map side, only
    * n_groups × k rows shuffle. Oracle = the window formulation. */
  def qTopkAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val topk = pystreamsspark.operators.TopKAgg.topK(3)
    Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(topk($"o_totalprice", $"o_orderkey").as("top"))
      .select($"o_custkey", posexplode($"top"))
      .select($"o_custkey", ($"pos" + 1).as("rn"),
        $"col._2".as("o_orderkey"), $"col._1".as("o_totalprice"))
      .orderBy($"o_custkey", $"rn")
  }

  val qTopkAggSql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** RANGE frame keyed on event time: per event, stats over the same
    * user's trailing 1-hour window (value-based frame, not row-count) —
    * ordered on epoch µs so the range arithmetic is integer-exact and
    * identical in both engines. */
  def qRangeWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(
        $"event_id", $"user_id", $"ts",
        count(lit(1)).over(w).as("n_last_hour"),
        (sum($"value".cast("decimal(38,6)")).over(w)).cast("double").as("sum_last_hour"),
        max($"value").over(w).as("max_last_hour"))
      .orderBy($"event_id")
  }

  val qRangeWindowSql: String =
    """SELECT event_id, user_id, ts,
      |  COUNT(*) OVER w AS n_last_hour,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_last_hour,
      |  MAX(value) OVER w AS max_last_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** The remaining analytic-function surface in one key: cume_dist
    * (cumulative distribution — exact, a single division of identical
    * integer operands under a TOTAL order, so ties can't skew it),
    * nth_value and first/last_value over the full-partition frame
    * (frame pinned ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING on
    * both engines — nth_value under the default growing frame is null
    * until n rows have arrived, a classic cross-engine trap). One
    * exchange, two window passes over the same sort. */
  def qCumeDist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(spark, sfDir)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
        cume_dist().over(w).as("cd"),
        nth_value($"c_acctbal", 3).over(wf).as("third_bal"),
        first($"c_custkey").over(wf).as("top_key"),
        last($"c_custkey").over(wf).as("bottom_key"))
      .filter($"c_custkey" % 20 === 0)
      .orderBy($"c_mktsegment", $"c_custkey")
  }

  val qCumeDistSql: String =
    """SELECT * FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    cume_dist() OVER w AS cd,
      |    nth_value(c_acctbal, 3) OVER wf AS third_bal,
      |    first_value(c_custkey) OVER wf AS top_key,
      |    last_value(c_custkey) OVER wf AS bottom_key
      |  FROM customer
      |  WINDOW
      |    w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC),
      |    wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |WHERE c_custkey % 20 = 0
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cume_dist"    -> (qCumeDist _),
    "q_window"       -> (qWindow _),
    "q_topk_agg"     -> (qTopkAgg _),
    "q_rank_funcs"   -> (qRankFuncs _),
    "q_lag_lead"     -> (qLagLead _),
    "q_moving_avg"   -> (qMovingAvg _),
    "q_range_window" -> (qRangeWindow _),
    "q_session"      -> (qSession _))

  val oracle: Map[String, String] = Map(
    "q_cume_dist"    -> qCumeDistSql,
    "q_window"       -> qWindowSql,
    "q_topk_agg"     -> qTopkAggSql,
    "q_rank_funcs"   -> qRankFuncsSql,
    "q_lag_lead"     -> qLagLeadSql,
    "q_moving_avg"   -> qMovingAvgSql,
    "q_range_window" -> qRangeWindowSql,
    "q_session"      -> qSessionSql)
}
