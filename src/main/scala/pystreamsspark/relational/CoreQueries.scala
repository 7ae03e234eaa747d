package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import Det._

/** Core stream/RDD surface re-expressed relationally (SURVEY.md §2.1, §2.3).
  *
  * Every query: (a) declarative DataFrame ops only — stays inside
  * WholeStageCodegen, filters/projections push into the parquet scan;
  * (b) ends with a total ORDER BY over a unique key set so the DuckDB
  * oracle hash-match is deterministic (§7.5).
  */
object CoreQueries {

  /** TPC-H Q1 shape: scan-side filter → 2-key hash agg (partial+final
    * around one shuffle) → small sort. At 100 TB this is the canonical
    * map-side-combine pattern: 6 output groups mean the shuffle moves only
    * n_partitions × 6 partial rows.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  ${sqlAvg("l_extendedprice")} AS avg_price,
       |  ${sqlAvg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** map/projection: computed columns only, no shuffle — one codegen'd
    * ProjectExec over the scan with column pruning to 5 of 11 columns. */
  def qMapProject(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select(
        $"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("disc_price"),
        (year($"l_shipdate") * 100 + month($"l_shipdate")).as("ship_ym"),
        concat($"l_returnflag", lit("|"), $"l_linestatus").as("flag_status"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val qMapProjectSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) AS disc_price,
      |  year(l_shipdate) * 100 + month(l_shipdate) AS ship_ym,
      |  l_returnflag || '|' || l_linestatus AS flag_status
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** filter: compound predicate — pushed into the parquet scan
    * (PushedFilters), zero shuffles. */
  def qFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter(
        $"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) &&
        $"l_quantity" < 24.0 &&
        ($"l_returnflag" === "N" || $"l_linestatus" === "F"))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val qFilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24.0
      |  AND (l_returnflag = 'N' OR l_linestatus = 'F')
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** flatMap (one→many): explode tokenized text, then count per token.
    * Generator + hash agg; the explode happens before the shuffle so only
    * (token, partial count) rows move. */
  def qFlatmapTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"token")
  }

  val qFlatmapTokensSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> ''
      |GROUP BY token
      |ORDER BY token""".stripMargin

  /** groupByKey + count — the reference's chunk_by_key move. */
  def qGroupbyCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        dsum($"o_totalprice").as("sum_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  val qGroupbyCountSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${sqlSum("o_totalprice")} AS sum_price,
       |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
       |FROM orders
       |GROUP BY o_orderstatus, o_orderpriority
       |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** distinct over a projection (shuffle on all selected cols) plus exact
    * count-distinct per group. */
  def qDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  val qDistinctSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** total sort (range-partitioned SortExec at scale) with tie-breaking to
    * a unique key so row order is fully deterministic. */
  def qSort(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(100)
  }

  val qSortSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin

  /** any/all short-circuit terminals as grouped boolean aggregates. */
  def qAnyAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        max($"l_quantity" > 49.0).as("any_big_qty"),
        min($"l_discount" <= 0.1).as("all_low_disc"),
        max($"l_tax" === 0.0).as("any_zero_tax"))
      .orderBy($"l_returnflag")
  }

  val qAnyAllSql: String =
    """SELECT l_returnflag,
      |  bool_or(l_quantity > 49.0) AS any_big_qty,
      |  bool_and(l_discount <= 0.1) AS all_low_disc,
      |  bool_or(l_tax = 0.0) AS any_zero_tax
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Outer flatmap — `explode_outer` keeps rows whose array is EMPTY as a
    * single null-element row, where plain explode silently drops them
    * (the flatmap-vs-outer-flatmap distinction every ETL framework
    * carries). Exercised non-vacuously: long tokens (len >= 7) exist in
    * 394/500 docs at sf0.01, so both the exploded and the null-preserved
    * branches appear. Null row ordering is pinned NULLS FIRST on both
    * engines (DuckDB defaults NULLS LAST — silent hash mismatch
    * otherwise). Zero shuffle: generator + presentation sort only. */
  def qExplodeOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        explode_outer(filter(split($"text", " "), t => length(t) >= 7))
          .as("token"))
      .orderBy($"doc_id", $"token".asc_nulls_first)
  }

  val qExplodeOuterSql: String =
    """SELECT d.doc_id, t.token
      |FROM documents d LEFT JOIN LATERAL (
      |  SELECT unnest(list_filter(string_split(d.text, ' '),
      |                            x -> len(x) >= 7)) AS token) t ON TRUE
      |ORDER BY d.doc_id, t.token ASC NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"          -> (q1Agg _),
    "q_map_project"   -> (qMapProject _),
    "q_filter"        -> (qFilter _),
    "q_flatmap_tokens" -> (qFlatmapTokens _),
    "q_explode_outer" -> (qExplodeOuter _),
    "q_groupby_count" -> (qGroupbyCount _),
    "q_distinct"      -> (qDistinct _),
    "q_sort"          -> (qSort _),
    "q_any_all"       -> (qAnyAll _))

  val oracle: Map[String, String] = Map(
    "q1_agg"          -> q1AggSql,
    "q_map_project"   -> qMapProjectSql,
    "q_filter"        -> qFilterSql,
    "q_flatmap_tokens" -> qFlatmapTokensSql,
    "q_explode_outer" -> qExplodeOuterSql,
    "q_groupby_count" -> qGroupbyCountSql,
    "q_distinct"      -> qDistinctSql,
    "q_sort"          -> qSortSql,
    "q_any_all"       -> qAnyAllSql)
}
