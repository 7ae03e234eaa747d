package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import Det._

/** Pure-SQL entry path: the engine's tables registered as temp views and
  * queried with `spark.sql` — the same ANSI text runs verbatim in DuckDB
  * (dialect-shared subset), so these oracles are literally the Spark
  * query strings. Covers the multi-table join pipeline (TPC-H Q5 shape)
  * and GROUPING SETS.
  */
object SqlQueries {

  /** Register ONLY the tables a query actually reads. Registering every
    * table eagerly meant one broken loader took down all 8 SQL keys at
    * once (round 4: the events remount failed Q5 even though Q5 never
    * touches events). Per-query registration confines a loader fault to
    * the keys that genuinely depend on that table.
    */
  private def views(spark: SparkSession, sfDir: String, tables: String*): Unit =
    tables.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Adapted TPC-H Q5: revenue per nation for one region + one year —
    * 6-table join, dimension chains broadcast, one agg shuffle. The SQL
    * text IS the oracle (decimal-exact revenue both sides). */
  val sqlQ5: String =
    s"""SELECT n_name, ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey
       |  AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  def qSqlQ5(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    spark.sql(sqlQ5)
  }

  /** Adapted TPC-H Q7: shipping volume between two nation pairs by ship
    * year — double self-role of the nation dim (n1 supplier-side, n2
    * customer-side), both broadcast; one agg shuffle on the 3-part key.
    * Shared SQL text; decimal-exact revenue. */
  val sqlQ7: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  ${sqlSum("volume")} AS revenue, COUNT(*) AS n_items
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    year(l_shipdate) AS l_year,
       |    l_extendedprice * (1.0 - l_discount) AS volume
       |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |  WHERE s_suppkey = l_suppkey
       |    AND o_orderkey = l_orderkey
       |    AND c_custkey = o_custkey
       |    AND s_nationkey = n1.n_nationkey
       |    AND c_nationkey = n2.n_nationkey
       |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
       |) shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  def qSqlQ7(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "supplier", "lineitem", "orders", "customer", "nation")
    spark.sql(sqlQ7)
  }

  /** Adapted TPC-H Q10: top-20 customers by revenue lost to returned
    * items in one quarter — 4-table join, agg on the customer key, global
    * top-k by the decimal-exact revenue with an id tie-break. */
  val sqlQ10: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
       |  AND l_returnflag = 'R'
       |  AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey ASC
       |LIMIT 20""".stripMargin

  def qSqlQ10(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "customer", "orders", "lineitem", "nation")
    spark.sql(sqlQ10)
  }

  /** Adapted TPC-H Q4: order counts by priority where at least one line
    * item was returned — correlated EXISTS, decorrelated by Catalyst
    * into a LEFT SEMI join on the order key (the testdata lacks
    * commit/receipt dates, so the inner predicate adapts to
    * `l_returnflag = 'R'`; the semi-join plan shape is the point).
    * Shared dialect text. */
  val sqlQ4: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def qSqlQ4(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders", "lineitem")
    spark.sql(sqlQ4)
  }

  /** TPC-H Q6 verbatim shape: the forecasting-revenue-change scan —
    * single-table, every predicate pushed to the parquet scan, one
    * partial+final agg, zero joins/shuffles beyond the 1-row final.
    * The float literals parse to identical doubles in both engines, so
    * the pushed comparisons agree bit-for-bit. */
  val sqlQ6: String =
    s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07
       |  AND l_quantity < 24""".stripMargin

  def qSqlQ6(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "lineitem")
    spark.sql(sqlQ6)
  }

  /** Adapted TPC-H Q12: shipping-priority split — one fact join plus
    * TWO conditional aggregates (CASE inside SUM), the canonical
    * pivot-by-predicate shape (the testdata lacks l_shipmode, so the
    * group key adapts to l_linestatus and the CASE tests
    * o_orderpriority). Integer CASE sums cast to BIGINT on both sides
    * (DuckDB SUM(int) is HUGEINT). */
  val sqlQ12: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  def qSqlQ12(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders", "lineitem")
    spark.sql(sqlQ12)
  }

  /** Adapted TPC-H Q14: promo revenue share — conditional numerator
    * over total, one month of lineitem against the part dim (p_type
    * 'PROMO' replaces the LIKE; this corpus's p_type is a closed
    * 6-value domain). Both sums are decimal-exact doubles, so the
    * single division (then ×100, left-assoc in both parsers) is
    * bit-identical. */
  val sqlQ14: String =
    s"""SELECT 100.00 * ${sqlSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |  / ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  def qSqlQ14(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "lineitem", "part")
    spark.sql(sqlQ14)
  }

  /** TPC-H Q15 shape: top supplier(s) by quarterly revenue — a CTE
    * referenced twice (once as the join input, once under MAX), the
    * view-plus-argmax pattern. Revenue is decimal-exact, so the MAX
    * threshold and the equality against it are deterministic in both
    * engines (ties would ALL surface, ordered by s_suppkey). */
  val sqlQ15: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier, revenue
       |WHERE s_suppkey = supplier_no
       |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  def qSqlQ15(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "supplier", "lineitem")
    spark.sql(sqlQ15)
  }

  /** Adapted TPC-H Q17: small-quantity-order revenue — a CORRELATED
    * scalar subquery (per-part average quantity) gating the fact scan;
    * Catalyst decorrelates it into an aggregate + join. Quantities are
    * whole numbers stored as doubles, so their sums are EXACT in both
    * engines at any parallelism and the 0.2×avg threshold is
    * deterministic without decimal routing (the q_corr_manual rule:
    * only inexact float reductions need Det). p_container doesn't
    * exist in this corpus; (p_brand, p_size<15) stands in. */
  val sqlQ17: String =
    s"""SELECT ${sqlSum("l_extendedprice")} / 7.0 AS avg_yearly,
       |  COUNT(*) AS n_items
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey
       |  AND p_brand = 'Brand#13'
       |  AND p_size < 15
       |  AND l_quantity < (
       |    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
       |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  def qSqlQ17(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "lineitem", "part")
    spark.sql(sqlQ17)
  }

  /** Adapted TPC-H Q19: discounted revenue under a DISJUNCTION of
    * brand × size × quantity windows — the classic
    * can't-push-one-predicate shape: each disjunct alone is selective,
    * the OR of three crosses the join, and the optimizer must derive
    * the common `p_partkey = l_partkey` join plus a residual OR filter
    * instead of a cartesian fallback. */
  val sqlQ19: String =
    s"""SELECT ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey
       |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |        AND l_quantity >= 1 AND l_quantity <= 11)
       |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       |        AND l_quantity >= 10 AND l_quantity <= 20)
       |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       |        AND l_quantity >= 20 AND l_quantity <= 30))""".stripMargin

  def qSqlQ19(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "lineitem", "part")
    spark.sql(sqlQ19)
  }

  /** Explicit GROUPING SETS — finer than rollup/cube; same shared text. */
  val sqlGroupingSets: String =
    s"""SELECT
       |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
       |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
       |  COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
       |ORDER BY rf, ls""".stripMargin

  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "lineitem")
    spark.sql(sqlGroupingSets)
  }

  /** Subquery forms — scalar subquery (decimal-exact global average so
    * the threshold is bit-identical in both engines), uncorrelated IN,
    * and correlated EXISTS — Catalyst decorrelates all three; shared
    * dialect text is its own oracle. */
  val sqlSubqueries: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > (
      |    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
      |    FROM orders)
      |  AND o_custkey IN (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.05)
      |ORDER BY o_orderkey""".stripMargin

  def qSubqueries(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders", "customer", "lineitem")
    spark.sql(sqlSubqueries)
  }

  /** Pivot: per-user event counts spread across fixed event_type columns
    * (explicit value list keeps the output schema static — required for
    * a deterministic contract, and at scale avoids a values-discovery
    * pass). Oracle = CASE-based manual pivot. */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_id")
  }

  val qPivotSql: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Recursive CTE (Spark 4 + DuckDB both support WITH RECURSIVE; same
    * text): a synthetic 10-ary tree over the REAL customer keys
    * (parent = key div 10), walked from the single-digit roots to
    * compute every key's depth and root ancestor. Each level is one
    * semi-join iteration — Spark executes the recursion as a loop of
    * distributed joins (UnionLoop), ~5 levels deep here, which is
    * exactly how a 100 TB hierarchy (org charts, reply chains,
    * category trees) resolves: O(depth) joins, never a driver loop. */
  val sqlRecursive: String =
    """WITH RECURSIVE anc(key, root, depth) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
      |  UNION ALL
      |  SELECT c.c_custkey, a.root, a.depth + 1
      |  FROM customer c JOIN anc a
      |    ON CAST(FLOOR(c.c_custkey / 10.0) AS BIGINT) = a.key
      |  WHERE c.c_custkey >= 10)
      |SELECT depth, COUNT(*) AS n, MIN(key) AS min_key, MAX(key) AS max_key,
      |  COUNT(DISTINCT root) AS n_roots
      |FROM anc
      |GROUP BY depth
      |ORDER BY depth""".stripMargin

  def qRecursive(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "customer")
    spark.sql(sqlRecursive)
  }

  /** Correlated LATERAL subquery (same text both engines): top-2
    * customers per nation — the per-row dependent-subquery form; Spark
    * decorrelates it into the windowed top-k plan, so it scales like
    * `q_window`, not like a nested loop. */
  val sqlLateral: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name ASC LIMIT 2) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  def qLateral(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "nation", "customer")
    spark.sql(sqlLateral)
  }

  /** VARIANT as a GENERATOR (Spark 4): `LATERAL variant_explode` turns
    * each order's variant array into (pos, value) rows — the
    * semi-structured flatten every telemetry pipeline needs (the scalar
    * variant path is `q_variant_extract`). Per-row generate then one
    * partial+final count agg; the oracle is the positional ground truth
    * (pos 0 = status, pos 1 = priority) as a UNION ALL. */
  val sqlVariantExplode: String =
    """SELECT v.pos, CAST(v.value AS STRING) AS val, COUNT(*) AS n
      |FROM orders o,
      |  LATERAL variant_explode(parse_json(
      |    concat('["', o_orderstatus, '","', o_orderpriority, '"]'))) v
      |GROUP BY v.pos, CAST(v.value AS STRING)
      |ORDER BY pos, val""".stripMargin

  def qVariantExplode(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders")
    spark.sql(sqlVariantExplode)
  }

  val qVariantExplodeOracleSql: String =
    """SELECT pos, val, n FROM (
      |  SELECT 0 AS pos, o_orderstatus AS val, COUNT(*) AS n
      |  FROM orders GROUP BY 2
      |  UNION ALL
      |  SELECT 1 AS pos, o_orderpriority AS val, COUNT(*) AS n
      |  FROM orders GROUP BY 2)
      |ORDER BY pos, val""".stripMargin

  /** SQL scalar UDF (Spark 4 `CREATE FUNCTION … RETURN expr`): a
    * declarative user function whose BODY is an expression, so Catalyst
    * inlines it into the plan — codegen'd like any built-in, none of a
    * JVM closure UDF's serialization wall (the repo's zero-UDF rule is
    * about opaque closures; a SQL UDF is transparent to the optimizer).
    * Oracle inlines the same CASE by hand. */
  def qSqlUdf(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_band(p DOUBLE)
        |RETURNS STRING
        |RETURN CASE WHEN p >= 300000 THEN 'high'
        |            WHEN p >= 100000 THEN 'mid'
        |            ELSE 'low' END""".stripMargin)
    spark.sql(
      """SELECT graft_band(o_totalprice) AS band, COUNT(*) AS n,
        |  MIN(o_orderkey) AS min_key
        |FROM orders
        |GROUP BY graft_band(o_totalprice)
        |ORDER BY band""".stripMargin)
  }

  val qSqlUdfOracleSql: String =
    """SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
      |            WHEN o_totalprice >= 100000 THEN 'mid'
      |            ELSE 'low' END AS band,
      |  COUNT(*) AS n, MIN(o_orderkey) AS min_key
      |FROM orders
      |GROUP BY 1
      |ORDER BY band""".stripMargin

  /** Adapted TPC-H Q18 (large-volume customers): the
    * aggregate-IN-subquery shape — a HAVING-filtered aggregate feeds an
    * IN predicate over the fact table, then a 3-table join re-aggregates
    * the survivors. Spark plans the IN as a LeftSemi join against the
    * aggregated subquery (no correlated re-execution); the qualifying-
    * order set is small (HAVING prunes hard) so it broadcasts — the
    * classic "filter the fact by an aggregate of itself" pattern at
    * 100 TB. Threshold 250 qualifies ~1% of orders at every SF.
    * l_quantity is integer-valued, so SUM(double) is exact at any
    * reduction order and the shared SQL text is its own oracle. */
  val sqlQ18: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem
      |    GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
      |  AND c_custkey = o_custkey
      |  AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      |LIMIT 100""".stripMargin

  def qSqlQ18(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "customer", "orders", "lineitem")
    spark.sql(sqlQ18)
  }

  /** Adapted TPC-H Q16 (no partsupp table in this schema, so lineitem is
    * the part↔supplier bridge): distinct-supplier counts per brand/type,
    * excluding one brand and a NOT IN ban list of suppliers. The NOT IN
    * subquery is the *null-aware* anti-join shape — semantically stricter
    * than NOT EXISTS (one NULL in the list empties the result), and Spark
    * plans it as LeftAnti(null-aware) against the broadcast ban list.
    * COUNT(DISTINCT) rides a two-phase partial/final agg. s_suppkey is
    * never NULL here so both engines agree; the text is its own oracle. */
  val sqlQ16: String =
    """SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part, lineitem
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#1'
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type
      |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin

  def qSqlQ16(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "part", "lineitem", "supplier")
    spark.sql(sqlQ16)
  }

  /** Adapted TPC-H Q21 (suppliers who kept orders waiting — here: the
    * only supplier with returns on a shared finished order): correlated
    * EXISTS **and** NOT EXISTS against the same fact table, the classic
    * double-decorrelation stress. Spark rewrites them into a LeftSemi
    * then LeftAnti join on l_orderkey — two shuffles on the fact's join
    * key, no per-row re-execution, which is the only shape that survives
    * 100 TB. Counts are integers → exact; text is its own oracle. */
  val sqlQ21: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey
      |  AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  def qSqlQ21(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "supplier", "lineitem", "orders")
    spark.sql(sqlQ21)
  }

  /** Adapted TPC-H Q22 (dormant high-balance customers; this schema has
    * no c_phone, so "country code" is c_nationkey mod 10): a scalar
    * subquery computes the positive-balance mean (decimal-exact via the
    * §7.5 route so the threshold is bit-identical in both engines), and
    * NOT EXISTS prunes customers with any recent order — an anti join
    * against a date-filtered fact slice that Spark broadcasts when
    * small. sqlSum keeps the balance total order-independent. */
  val sqlQ22: String =
    s"""SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode,
       |  COUNT(*) AS numcust, ${sqlSum("c_acctbal")} AS totacctbal
       |FROM customer c
       |WHERE c_acctbal > (
       |    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS STRING) AS DOUBLE) / COUNT(*)
       |    FROM customer WHERE c_acctbal > 0)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders o
       |    WHERE o.o_custkey = c.c_custkey
       |      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       |GROUP BY CAST(c_nationkey % 10 AS INT)
       |ORDER BY cntrycode""".stripMargin

  def qSqlQ22(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "customer", "orders")
    spark.sql(sqlQ22)
  }

  /** CTE referenced twice (revenue share per nation): the
    * common-table-expression REUSE shape — `nat_rev` feeds both the
    * per-nation rows and the grand total, so the optimizer can compute
    * the aggregation once and reuse the exchange instead of rescanning
    * the join. The decimal sum stays DECIMAL through both references
    * and exits via the §7.5 string route on each side of the share
    * division (one fixed IEEE division per row). Dialect-shared text =
    * its own oracle. */
  val sqlCte: String =
    """WITH nat_rev AS (
      |  SELECT c_nationkey AS nk,
      |    SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev_d,
      |    COUNT(*) AS n_orders
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_nationkey),
      |tot AS (SELECT SUM(rev_d) AS tot_d FROM nat_rev)
      |SELECT nk, CAST(CAST(rev_d AS STRING) AS DOUBLE) AS revenue, n_orders,
      |  CAST(CAST(rev_d AS STRING) AS DOUBLE)
      |    / CAST(CAST(tot_d AS STRING) AS DOUBLE) AS share
      |FROM nat_rev CROSS JOIN tot
      |ORDER BY nk""".stripMargin

  def qSqlCte(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "customer", "orders")
    spark.sql(sqlCte)
  }

  /** SQL TABLE function (Spark 4 `CREATE FUNCTION … RETURNS TABLE`):
    * a parameterized relation — the body is a query with the argument
    * inlined, so Catalyst plans each invocation like a view (full
    * pushdown through it; nothing opaque). Two invocations at
    * different thresholds are unioned and aggregated; the oracle
    * inlines the same bodies by hand. */
  def qSqlTvf(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_big_orders(thresh DOUBLE)
        |RETURNS TABLE(o_orderkey BIGINT, o_totalprice DOUBLE, band STRING)
        |RETURN SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_totalprice > 2 * thresh THEN 'xl' ELSE 'l' END
        |FROM orders WHERE o_totalprice > thresh""".stripMargin)
    spark.sql(
      """SELECT src, band, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(o_orderkey) AS min_key
        |FROM (
        |  SELECT 'hi' AS src, band, o_orderkey
        |  FROM graft_big_orders(400000.0)
        |  UNION ALL
        |  SELECT 'lo' AS src, band, o_orderkey
        |  FROM graft_big_orders(250000.0))
        |GROUP BY src, band
        |ORDER BY src, band""".stripMargin)
  }

  val qSqlTvfOracleSql: String =
    """SELECT src, band, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(o_orderkey) AS BIGINT) AS min_key
      |FROM (
      |  SELECT 'hi' AS src,
      |    CASE WHEN o_totalprice > 800000.0 THEN 'xl' ELSE 'l' END AS band,
      |    o_orderkey
      |  FROM orders WHERE o_totalprice > 400000.0
      |  UNION ALL
      |  SELECT 'lo' AS src,
      |    CASE WHEN o_totalprice > 500000.0 THEN 'xl' ELSE 'l' END AS band,
      |    o_orderkey
      |  FROM orders WHERE o_totalprice > 250000.0)
      |GROUP BY src, band
      |ORDER BY src, band""".stripMargin

  /** SQL pipe syntax (Spark 4 `|>` operators, SPARK-49555 — the
    * GoogleSQL-style linear query form): one chain exercising WHERE →
    * JOIN → EXTEND → AGGREGATE…GROUP BY → post-agg WHERE (pipe's
    * HAVING) → ORDER BY. Catalyst lowers each `|>` stage onto the same
    * logical operators as the nested form — `EliminatePipeOperators`
    * strips the markers before optimization, so pushdown/broadcast
    * planning is unchanged and there is no scale cost to the linear
    * style. DuckDB has no pipe dialect, so the oracle is the
    * equivalent ANSI nesting (decimal-exact revenue both sides). */
  val sqlPipe: String =
    s"""FROM orders
       ||> WHERE o_orderstatus = 'F'
       ||> JOIN customer ON o_custkey = c_custkey
       ||> EXTEND year(o_orderdate) AS o_year
       ||> AGGREGATE ${sqlSum("o_totalprice")} AS revenue,
       |     COUNT(*) AS n_orders
       |   GROUP BY c_mktsegment, o_year
       ||> WHERE n_orders > 5
       ||> ORDER BY c_mktsegment, o_year""".stripMargin

  def qSqlPipe(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders", "customer")
    // runtime-settable; defaults on in Spark 4 but pin it so the key
    // doesn't silently depend on the session's conf
    spark.conf.set("spark.sql.operatorPipeSyntaxEnabled", "true")
    spark.sql(sqlPipe)
  }

  val qSqlPipeOracleSql: String =
    s"""SELECT c_mktsegment, o_year, revenue, n_orders FROM (
       |  SELECT c_mktsegment, year(o_orderdate) AS o_year,
       |    ${sqlSum("o_totalprice")} AS revenue,
       |    COUNT(*) AS n_orders
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE o_orderstatus = 'F'
       |  GROUP BY 1, 2) t
       |WHERE n_orders > 5
       |ORDER BY c_mktsegment, o_year""".stripMargin

  /** `GROUP BY ALL` / `ORDER BY ALL` (the DuckDB-originated shorthand
    * Spark 4 adopted): grouping keys inferred as every non-aggregate
    * select item, ordering over the full select list. Dialect-shared —
    * the SQL text IS the oracle, so both engines must infer the same
    * keys from the same text. */
  val sqlGroupAll: String =
    s"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       |  ${sqlSum("o_totalprice")} AS revenue
       |FROM orders
       |WHERE o_totalprice > 150000.0
       |GROUP BY ALL
       |ORDER BY ALL""".stripMargin

  def qSqlGroupAll(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders")
    spark.sql(sqlGroupAll)
  }

  /** Adapted TPC-H Q2 (min-cost supplier per part in a region; this
    * schema has no partsupp, so lineitem is the part↔supplier bridge
    * and unit price `l_extendedprice / l_quantity` stands in for
    * ps_supplycost): the classic CORRELATED-MIN shape — the outer
    * 5-table join keeps only rows whose unit price equals a correlated
    * scalar MIN over the same region's offers for that part. Catalyst
    * decorrelates the subquery into a per-part aggregate joined back on
    * p_partkey (one extra agg shuffle, no per-row re-execution — the
    * only shape that survives 100 TB). Per-row IEEE division and MIN
    * over doubles are order-independent, so the equality threshold is
    * bit-identical in both engines and the shared text is its own
    * oracle. */
  val sqlQ2: String =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part, lineitem, supplier, nation, region
      |WHERE p_partkey = l_partkey
      |  AND s_suppkey = l_suppkey
      |  AND p_size = 15
      |  AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND l_extendedprice / l_quantity = (
      |    SELECT MIN(l2.l_extendedprice / l2.l_quantity)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey
      |      AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  def qSqlQ2(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "part", "lineitem", "supplier", "nation", "region")
    spark.sql(sqlQ2)
  }

  /** Adapted TPC-H Q8 (national market share): one nation's share of a
    * region's PROMO-part import volume by order year — the
    * share-of-aggregate shape where the numerator is a CASE inside the
    * same SUM pass as the denominator (one scan, one agg, never two
    * queries). The 8-way star join broadcasts every dim chain; nation
    * appears in two roles (n1 market-side via customer, n2
    * supplier-side). Both sums ride the §7.5 decimal route so the
    * single share division is bit-identical in both engines. */
  val sqlQ8: String =
    s"""SELECT o_year,
       |  ${sqlSum("CASE WHEN nation = 'NATION_7' THEN volume ELSE 0.0 END")}
       |    / ${sqlSum("volume")} AS mkt_share,
       |  COUNT(*) AS n_items
       |FROM (
       |  SELECT year(o_orderdate) AS o_year,
       |    l_extendedprice * (1.0 - l_discount) AS volume,
       |    n2.n_name AS nation
       |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
       |  WHERE p_partkey = l_partkey
       |    AND s_suppkey = l_suppkey
       |    AND l_orderkey = o_orderkey
       |    AND o_custkey = c_custkey
       |    AND c_nationkey = n1.n_nationkey
       |    AND n1.n_regionkey = r_regionkey
       |    AND r_name = 'ASIA'
       |    AND s_nationkey = n2.n_nationkey
       |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |    AND p_type = 'PROMO') all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin

  def qSqlQ8(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "part", "supplier", "lineitem", "orders", "customer", "nation", "region")
    spark.sql(sqlQ8)
  }

  /** Adapted TPC-H Q9 (product-type profit; no ps_supplycost here, so
    * cost = p_retailprice × l_quantity): profit per supplier nation per
    * order year over a part-name LIKE slice — the nested-agg-over-
    * 5-way-join shape whose point is that the LIKE prunes part FIRST
    * (the most selective dim) and the profit expression is evaluated
    * per fact row before the group shuffle. Per-row multiply/subtract
    * are IEEE-identical in both engines; the sum is decimal-exact. */
  val sqlQ9: String =
    s"""SELECT nation, o_year, ${sqlSum("amount")} AS sum_profit,
       |  COUNT(*) AS n_items
       |FROM (
       |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |    l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity AS amount
       |  FROM part, supplier, lineitem, orders, nation
       |  WHERE s_suppkey = l_suppkey
       |    AND p_partkey = l_partkey
       |    AND o_orderkey = l_orderkey
       |    AND s_nationkey = n_nationkey
       |    AND p_name LIKE '%red%') profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC""".stripMargin

  def qSqlQ9(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "part", "supplier", "lineitem", "orders", "nation")
    spark.sql(sqlQ9)
  }

  /** Adapted TPC-H Q11 (important stock; lineitem bridges part↔supplier
    * and shipped value `l_extendedprice × l_quantity` stands in for
    * supplycost × availqty): per-part value held by one nation's
    * suppliers, HAVING greater than a FRACTION OF THE GLOBAL TOTAL — the
    * aggregate-vs-scalar-subquery-of-the-same-aggregate shape. Spark
    * computes the scalar total once (subquery reuse, not per-group) and
    * broadcasts it into the HAVING filter. Both the per-group sums and
    * the total ride the decimal route, and the 0.001 scaling of a
    * bit-identical double is bit-identical, so the > threshold agrees in
    * both engines. */
  val sqlQ11: String =
    s"""SELECT l_partkey, ${sqlSum("l_extendedprice * l_quantity")} AS value
       |FROM lineitem, supplier, nation
       |WHERE l_suppkey = s_suppkey
       |  AND s_nationkey = n_nationkey
       |  AND n_name = 'NATION_3'
       |GROUP BY l_partkey
       |HAVING ${sqlSum("l_extendedprice * l_quantity")} > (
       |  SELECT ${sqlSum("l_extendedprice * l_quantity")} * 0.001
       |  FROM lineitem, supplier, nation
       |  WHERE l_suppkey = s_suppkey
       |    AND s_nationkey = n_nationkey
       |    AND n_name = 'NATION_3')
       |ORDER BY value DESC, l_partkey""".stripMargin

  def qSqlQ11(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "lineitem", "supplier", "nation")
    spark.sql(sqlQ11)
  }

  /** Adapted TPC-H Q13 (customer distribution; the order filter adapts
    * from the comment LIKE to o_orderpriority): LEFT OUTER join with the
    * predicate IN THE ON CLAUSE (so zero-order customers survive with
    * count 0 — a WHERE would silently drop them), then a histogram of
    * the per-customer counts. Two agg shuffles chained on different
    * keys (custkey then count) — the outer-join-then-histogram optimizer
    * shape the round-8 verdict called out as not otherwise exercised.
    * COUNT is exact; the shared text is its own oracle. */
  val sqlQ13: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  def qSqlQ13(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "customer", "orders")
    spark.sql(sqlQ13)
  }

  /** Adapted TPC-H Q20 (part promotion candidates): suppliers who moved
    * more than a threshold quantity of name-matched parts in one year —
    * an IN over a grouped-HAVING subquery that itself contains a nested
    * IN over the part dim. Spark decorrelates both IN levels into semi
    * joins: part-keys semi-join prunes lineitem at the scan, the
    * (suppkey, partkey) agg runs partial+final, and the surviving
    * supplier keys broadcast into the outer semi join — three joins,
    * zero re-executions. SUM(l_quantity) sums whole numbers stored as
    * doubles, exact at any reduction order, so the HAVING agrees
    * without decimal routing. */
  val sqlQ20: String =
    """SELECT s_name, s_acctbal
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (
      |        SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
      |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING SUM(l_quantity) > 40)
      |  AND s_nationkey = n_nationkey
      |  AND n_name = 'NATION_3'
      |ORDER BY s_name""".stripMargin

  def qSqlQ20(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "supplier", "nation", "lineitem", "part")
    spark.sql(sqlQ20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_q2"        -> (qSqlQ2 _),
    "q_sql_q8"        -> (qSqlQ8 _),
    "q_sql_q9"        -> (qSqlQ9 _),
    "q_sql_q11"       -> (qSqlQ11 _),
    "q_sql_q13"       -> (qSqlQ13 _),
    "q_sql_q20"       -> (qSqlQ20 _),
    "q_sql_group_all" -> (qSqlGroupAll _),
    "q_sql_pipe"      -> (qSqlPipe _),
    "q_sql_tvf"       -> (qSqlTvf _),
    "q_sql_cte"       -> (qSqlCte _),
    "q_sql_q16"       -> (qSqlQ16 _),
    "q_sql_q21"       -> (qSqlQ21 _),
    "q_sql_q22"       -> (qSqlQ22 _),
    "q_sql_q18"       -> (qSqlQ18 _),
    "q_sql_udf"       -> (qSqlUdf _),
    "q_variant_explode" -> (qVariantExplode _),
    "q_lateral_topn"  -> (qLateral _),
    "q_sql_q5"        -> (qSqlQ5 _),
    "q_sql_q7"        -> (qSqlQ7 _),
    "q_sql_q10"       -> (qSqlQ10 _),
    "q_sql_q4"        -> (qSqlQ4 _),
    "q_sql_q6"        -> (qSqlQ6 _),
    "q_sql_q12"       -> (qSqlQ12 _),
    "q_sql_q14"       -> (qSqlQ14 _),
    "q_sql_q15"       -> (qSqlQ15 _),
    "q_sql_q17"       -> (qSqlQ17 _),
    "q_sql_q19"       -> (qSqlQ19 _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_subqueries"    -> (qSubqueries _),
    "q_recursive_cte" -> (qRecursive _),
    "q_pivot"         -> (qPivot _))

  val oracle: Map[String, String] = Map(
    "q_sql_q2"        -> sqlQ2,
    "q_sql_q8"        -> sqlQ8,
    "q_sql_q9"        -> sqlQ9,
    "q_sql_q11"       -> sqlQ11,
    "q_sql_q13"       -> sqlQ13,
    "q_sql_q20"       -> sqlQ20,
    "q_sql_group_all" -> sqlGroupAll,
    "q_sql_pipe"      -> qSqlPipeOracleSql,
    "q_sql_tvf"       -> qSqlTvfOracleSql,
    "q_sql_cte"       -> sqlCte,
    "q_sql_q16"       -> sqlQ16,
    "q_sql_q21"       -> sqlQ21,
    "q_sql_q22"       -> sqlQ22,
    "q_sql_q18"       -> sqlQ18,
    "q_sql_udf"       -> qSqlUdfOracleSql,
    "q_variant_explode" -> qVariantExplodeOracleSql,
    "q_lateral_topn"  -> sqlLateral,
    "q_sql_q5"        -> sqlQ5,
    "q_sql_q7"        -> sqlQ7,
    "q_sql_q10"       -> sqlQ10,
    "q_sql_q4"        -> sqlQ4,
    "q_sql_q6"        -> sqlQ6,
    "q_sql_q12"       -> sqlQ12,
    "q_sql_q14"       -> sqlQ14,
    "q_sql_q15"       -> sqlQ15,
    "q_sql_q17"       -> sqlQ17,
    "q_sql_q19"       -> sqlQ19,
    "q_grouping_sets" -> sqlGroupingSets,
    "q_subqueries"    -> sqlSubqueries,
    "q_recursive_cte" -> sqlRecursive,
    "q_pivot"         -> qPivotSql)
}
