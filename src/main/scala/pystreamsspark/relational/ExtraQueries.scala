package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import Det._

/** Coverage extras: map-typed columns, bag-semantics set ops,
  * min_by/max_by, and exact manual variance/stddev.
  */
object ExtraQueries {

  /** Map functions: build a map column, then key/value/size/extract ops.
    * The oracle computes the provably-equal values directly (DuckDB's MAP
    * extraction dialect differs; the CONTRACT is on output equality). */
  def qMapFns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .withColumn("m", map(
        lit("priority"), $"o_orderpriority",
        lit("status"), $"o_orderstatus"))
      .select(
        $"o_orderkey",
        element_at($"m", "status").as("status_val"),
        element_at($"m", "priority").as("priority_val"),
        size($"m").as("m_size"),
        concat_ws(",", sort_array(map_keys($"m"))).as("keys_sorted"),
        concat_ws(",", sort_array(map_values($"m"))).as("values_sorted"))
      .orderBy($"o_orderkey")
  }

  val qMapFnsSql: String =
    """SELECT o_orderkey,
      |  o_orderstatus AS status_val,
      |  o_orderpriority AS priority_val,
      |  2 AS m_size,
      |  'priority,status' AS keys_sorted,
      |  CASE WHEN o_orderpriority <= o_orderstatus
      |       THEN o_orderpriority || ',' || o_orderstatus
      |       ELSE o_orderstatus || ',' || o_orderpriority END AS values_sorted
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** EXCEPT ALL / INTERSECT ALL — bag semantics with multiplicities. */
  def qExceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val a = li.filter($"l_quantity" >= 25.0).select($"l_orderkey")
    val b = li.filter($"l_returnflag" === "R").select($"l_orderkey")
    val ex = a.exceptAll(b).groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
      .withColumn("tag", lit("except_all"))
    val in = a.intersectAll(b).groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
      .withColumn("tag", lit("intersect_all"))
    ex.unionByName(in)
      .select($"tag", $"l_orderkey", $"n")
      .orderBy($"tag", $"l_orderkey")
  }

  val qExceptAllSql: String =
    """WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25.0),
      |b AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
      |SELECT 'except_all' AS tag, l_orderkey, COUNT(*) AS n
      |FROM (SELECT l_orderkey FROM a EXCEPT ALL SELECT l_orderkey FROM b)
      |GROUP BY l_orderkey
      |UNION ALL
      |SELECT 'intersect_all' AS tag, l_orderkey, COUNT(*) AS n
      |FROM (SELECT l_orderkey FROM a INTERSECT ALL SELECT l_orderkey FROM b)
      |GROUP BY l_orderkey
      |ORDER BY tag, l_orderkey""".stripMargin

  /** min_by/max_by keyed on the UNIQUE o_orderkey so winners are
    * deterministic (arg-extremum over a column with duplicates would be
    * engine-dependent). */
  def qMinmaxBy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(
        max_by($"o_totalprice", $"o_orderkey").as("price_of_max_key"),
        min_by($"o_totalprice", $"o_orderkey").as("price_of_min_key"),
        max($"o_orderkey").as("max_key"),
        min($"o_orderkey").as("min_key"))
      .orderBy($"o_orderstatus")
  }

  val qMinmaxBySql: String =
    """SELECT o_orderstatus,
      |  max_by(o_totalprice, o_orderkey) AS price_of_max_key,
      |  min_by(o_totalprice, o_orderkey) AS price_of_min_key,
      |  MAX(o_orderkey) AS max_key,
      |  MIN(o_orderkey) AS min_key
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Variance / stddev via the explicit decimal-exact formula
    * (sumsq - sum²/n)/(n-1): built-in stddev uses engine-specific
    * accumulation (Welford vs naive) that never hash-matches across
    * engines; exact decimal sums + one fixed IEEE expression do. */
  def qStatsManual(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.supplier(spark, sfDir)
      .groupBy($"s_nationkey")
      .agg(
        count(lit(1)).as("n"),
        dsum($"s_acctbal").as("sum_bal"),
        dsum($"s_acctbal" * $"s_acctbal").as("sumsq_bal"))
      .filter($"n" > 1)
      .select(
        $"s_nationkey", $"n", $"sum_bal",
        (($"sumsq_bal" - $"sum_bal" * $"sum_bal" / $"n") / ($"n" - 1)).as("var_bal"),
        sqrt(($"sumsq_bal" - $"sum_bal" * $"sum_bal" / $"n") / ($"n" - 1)).as("std_bal"))
      .orderBy($"s_nationkey")
  }

  val qStatsManualSql: String =
    s"""WITH t AS (
       |  SELECT s_nationkey, COUNT(*) AS n,
       |    ${sqlSum("s_acctbal")} AS sum_bal,
       |    ${sqlSum("s_acctbal * s_acctbal")} AS sumsq_bal
       |  FROM supplier
       |  GROUP BY s_nationkey)
       |SELECT s_nationkey, n, sum_bal,
       |  (sumsq_bal - sum_bal * sum_bal / n) / (n - 1) AS var_bal,
       |  sqrt((sumsq_bal - sum_bal * sum_bal / n) / (n - 1)) AS std_bal
       |FROM t
       |WHERE n > 1
       |ORDER BY s_nationkey""".stripMargin

  /** 2-D Pareto frontier (skyline) of parts: cheapest-for-their-size
    * parts, i.e. p survives iff no part is strictly cheaper with size >=
    * p's. The naive plan is the quadratic dominance anti-join; this is
    * the SCALE-TRUE sort-based form: (1) collapse to price levels
    * (partial agg), (2) per price-BUCKET running max — parallel window,
    * one task per integer price bucket, (3) cross-bucket prefix max over
    * the tiny bucket table (|buckets| rows — the only single-partition
    * window, constant-size), (4) broadcast both back and filter. Exact
    * because bucket ranges are disjoint and ordered, so "strictly
    * cheaper" = strictly-earlier-in-bucket ∪ any-earlier-bucket. The
    * oracle is the INDEPENDENT quadratic NOT EXISTS formulation, so the
    * decomposition itself is value-verified. */
  def qSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, sfDir)
    val pl = parts.groupBy($"p_retailprice".as("price"))
      .agg(max($"p_size").as("msize"))
      .withColumn("b", floor($"price").cast("long"))
    val wIn = Window.partitionBy($"b").orderBy($"price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inb = pl.withColumn("prior_in", max($"msize").over(wIn))
    val wB = Window.orderBy($"b").rowsBetween(Window.unboundedPreceding, -1)
    val bm = pl.groupBy($"b").agg(max($"msize").as("bmax"))
      .withColumn("prior_b", max($"bmax").over(wB))
    val prior = inb.join(broadcast(bm.select($"b", $"prior_b")), Seq("b"))
      .select($"price", greatest($"prior_in", $"prior_b").as("prior"))
    parts.join(prior, parts("p_retailprice") === prior("price"))
      .filter($"p_size" > coalesce($"prior", lit(-1)))
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .orderBy($"p_retailprice", $"p_partkey")
  }

  val qSkylineSql: String =
    """SELECT p.p_partkey, p.p_retailprice, p.p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
      |ORDER BY p.p_retailprice, p.p_partkey""".stripMargin

  /** `DataFrameStatFunctions.crosstab` — the contingency-table API:
    * event_type × ISO day-of-week counts. Crosstab pivots distinct
    * right-column values into columns (here the fixed 1..7 weekday set,
    * so the schema is static); under the hood it is one partial+final
    * count aggregate + a pivot on the aggregated (|types|·7)-row table —
    * the same scale shape as q_pivot. Output rows ordered by the key
    * column; the oracle is a FILTER-based manual pivot. */
  def qCrosstab(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_type",
        // ISO weekday (Mon=1..Sun=7): dayofweek is Sun=1, shift it
        (pmod(dayofweek($"ts") + lit(5), lit(7)) + 1).as("dow"))
      .stat.crosstab("event_type", "dow")
      .orderBy($"event_type_dow")
  }

  val qCrosstabSql: String =
    """SELECT event_type AS event_type_dow,
      |  COUNT(*) FILTER (WHERE isodow(ts) = 1) AS "1",
      |  COUNT(*) FILTER (WHERE isodow(ts) = 2) AS "2",
      |  COUNT(*) FILTER (WHERE isodow(ts) = 3) AS "3",
      |  COUNT(*) FILTER (WHERE isodow(ts) = 4) AS "4",
      |  COUNT(*) FILTER (WHERE isodow(ts) = 5) AS "5",
      |  COUNT(*) FILTER (WHERE isodow(ts) = 6) AS "6",
      |  COUNT(*) FILTER (WHERE isodow(ts) = 7) AS "7"
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type_dow""".stripMargin

  /** Spark 4 `Dataset.transpose` (SPARK-47081): rows↔columns flip of a
    * small aggregated table — the metric-summary presentation shape
    * (one row per metric, one column per segment). Inputs are the
    * 3-row per-status aggregate; transpose makes the index column's
    * values (F/O/P) the new columns. All transposed cells must share a
    * type, so the aggregates are all BIGINT. This is a driver-safe op
    * ONLY on aggregated (segment-count-sized) relations — the engine
    * applies it strictly post-aggregation, never to raw tables (the
    * column count equals the row count of the input). The oracle
    * hand-transposes with scalar subqueries. */
  def qTranspose(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val agg = Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_custs"),
        max($"o_orderkey").as("max_key"))
    // Left-join against the full status domain so the transposed column
    // set is always {F,O,P} even at a scale factor where one status has
    // zero orders — the oracle's scalar subqueries hard-code all three
    // (yielding NULL for an absent status, which the join matches).
    val statuses = Seq("F", "O", "P").toDF("o_orderstatus")
    statuses.join(agg, Seq("o_orderstatus"), "left")
      .transpose($"o_orderstatus")
      .orderBy($"key")
  }

  val qTransposeSql: String =
    """WITH s AS (
      |  SELECT o_orderstatus AS st, COUNT(*) AS n1,
      |    COUNT(DISTINCT o_custkey) AS n2, MAX(o_orderkey) AS n3
      |  FROM orders GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 'n_orders' AS key,
      |    (SELECT n1 FROM s WHERE st='F') AS F,
      |    (SELECT n1 FROM s WHERE st='O') AS O,
      |    (SELECT n1 FROM s WHERE st='P') AS P
      |  UNION ALL
      |  SELECT 'n_custs',
      |    (SELECT n2 FROM s WHERE st='F'),
      |    (SELECT n2 FROM s WHERE st='O'),
      |    (SELECT n2 FROM s WHERE st='P')
      |  UNION ALL
      |  SELECT 'max_key',
      |    (SELECT n3 FROM s WHERE st='F'),
      |    (SELECT n3 FROM s WHERE st='O'),
      |    (SELECT n3 FROM s WHERE st='P'))
      |ORDER BY key""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_transpose"    -> (qTranspose _),
    "q_map_fns"      -> (qMapFns _),
    "q_except_all"   -> (qExceptAll _),
    "q_minmax_by"    -> (qMinmaxBy _),
    "q_skyline"      -> (qSkyline _),
    "q_crosstab"     -> (qCrosstab _),
    "q_stats_manual" -> (qStatsManual _))

  val oracle: Map[String, String] = Map(
    "q_transpose"    -> qTransposeSql,
    "q_map_fns"      -> qMapFnsSql,
    "q_except_all"   -> qExceptAllSql,
    "q_minmax_by"    -> qMinmaxBySql,
    "q_skyline"      -> qSkylineSql,
    "q_crosstab"     -> qCrosstabSql,
    "q_stats_manual" -> qStatsManualSql)
}
