package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import Det._

/** Scalar expression surface (SURVEY.md §2.3): string / date / math /
  * conditional / JSON / array functions. All stay in WholeStageCodegen —
  * no UDFs anywhere. Only cross-engine-exact functions appear in compared
  * columns (e.g. no libm-dependent exp/ln: JVM and C runtimes differ in
  * ulps; sqrt is IEEE-exact so it's fine).
  */
object ScalarQueries {

  def qStringFns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .select(
        $"p_partkey",
        lower($"p_name").as("name_lower"),
        upper($"p_name").as("name_upper"),
        length($"p_name").as("name_len"),
        substring($"p_type", 1, 4).as("type_prefix"),
        trim(lit(" x ")).as("trimmed"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        regexp_extract($"p_name", "^([a-z]+)", 1).as("first_word"),
        $"p_name".like("%r%").as("has_r"),
        replace($"p_name", lit(" "), lit("_")).as("name_snake"))
      .orderBy($"p_partkey")
  }

  val qStringFnsSql: String =
    """SELECT p_partkey,
      |  lower(p_name) AS name_lower,
      |  upper(p_name) AS name_upper,
      |  length(p_name) AS name_len,
      |  substring(p_type, 1, 4) AS type_prefix,
      |  trim(' x ') AS trimmed,
      |  p_brand || '-' || p_type AS brand_type,
      |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
      |  p_name LIKE '%r%' AS has_r,
      |  replace(p_name, ' ', '_') AS name_snake
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  def qDateFns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        date_add($"o_orderdate".cast("date"), 30).as("due_date"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date")).as("age_days"),
        // o_orderdate reads as TIMESTAMP_NTZ; cast to TIMESTAMP (session
        // tz = UTC, so the instant is unchanged) for unix_micros.
        expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").as("epoch_s"))
      .orderBy($"o_orderkey")
  }

  val qDateFnsSql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS yr,
      |  month(o_orderdate) AS mo,
      |  day(o_orderdate) AS dom,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days,
      |  epoch_us(o_orderdate) // 1000000 AS epoch_s
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  def qMathFns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.supplier(spark, sfDir)
      .select(
        $"s_suppkey",
        abs($"s_acctbal").as("abs_bal"),
        round($"s_acctbal", 1).as("round_bal"),
        floor($"s_acctbal").as("floor_bal"),
        ceil($"s_acctbal").as("ceil_bal"),
        sqrt(abs($"s_acctbal")).as("sqrt_bal"),
        ($"s_acctbal" * $"s_acctbal").as("sq_bal"),
        pmod($"s_suppkey", lit(7)).as("mod7"),
        signum($"s_acctbal").as("sign_bal"),
        greatest($"s_acctbal", lit(0.0)).as("pos_part"),
        least($"s_acctbal", lit(0.0)).as("neg_part"))
      .orderBy($"s_suppkey")
  }

  val qMathFnsSql: String =
    """SELECT s_suppkey,
      |  abs(s_acctbal) AS abs_bal,
      |  round(s_acctbal, 1) AS round_bal,
      |  CAST(floor(s_acctbal) AS BIGINT) AS floor_bal,
      |  CAST(ceil(s_acctbal) AS BIGINT) AS ceil_bal,
      |  sqrt(abs(s_acctbal)) AS sqrt_bal,
      |  s_acctbal * s_acctbal AS sq_bal,
      |  s_suppkey % 7 AS mod7,
      |  CAST(CASE WHEN s_acctbal > 0 THEN 1.0 WHEN s_acctbal < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sign_bal,
      |  greatest(s_acctbal, 0.0) AS pos_part,
      |  least(s_acctbal, 0.0) AS neg_part
      |FROM supplier
      |ORDER BY s_suppkey""".stripMargin

  def qCaseWhen(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select(
        $"o_orderkey",
        when($"o_totalprice" >= 300000, "high")
          .when($"o_totalprice" >= 100000, "mid")
          .otherwise("low").as("price_band"),
        coalesce(nullif($"o_orderstatus", lit("P")), lit("NOT_PENDING")).as("status_np"),
        when($"o_orderpriority".startsWith("1"), 1).otherwise(0).as("is_urgent"))
      .orderBy($"o_orderkey")
  }

  val qCaseWhenSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice >= 300000 THEN 'high'
      |       WHEN o_totalprice >= 100000 THEN 'mid'
      |       ELSE 'low' END AS price_band,
      |  COALESCE(NULLIF(o_orderstatus, 'P'), 'NOT_PENDING') AS status_np,
      |  CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Semi-structured column: parse the JSON `props` payload and aggregate
    * the extracted field — get_json_object stays codegen'd. */
  def qJsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(
        count($"k").as("n"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val qJsonExtractSql: String =
    """SELECT event_type,
      |  COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Array functions over the embedding column (no arithmetic that could
    * reorder float reductions — element access and extrema only). */
  def qArrayFns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select(
        $"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).as("first_elem"),
        element_at($"embedding", 64).as("last_elem"),
        array_max($"embedding").as("max_elem"),
        array_min($"embedding").as("min_elem"),
        array_contains($"embedding", 0.0f).as("has_zero"))
      .orderBy($"vec_id")
  }

  val qArrayFnsSql: String =
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  embedding[1] AS first_elem,
      |  embedding[64] AS last_elem,
      |  list_max(embedding) AS max_elem,
      |  list_min(embedding) AS min_elem,
      |  list_contains(embedding, 0.0) AS has_zero
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  /** Spark 4 VARIANT path: serialize each order into a nested JSON
    * document, parse it into an open `VariantType` value, and extract
    * typed fields back out with `variant_get` paths (nested object,
    * array index, double leaf) — the semi-structured access pattern a
    * 100 TB telemetry/config column needs (binary variant encoding is
    * read-efficient: field access doesn't re-parse text, and Catalyst
    * pushes variant_get into the scan for shredded storage). The oracle
    * is ground truth: the extracted values must equal the base columns
    * they were built from, aggregated decimal-exact. */
  def qVariantExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val doc = to_json(struct(
      $"o_orderkey".as("id"),
      struct($"o_custkey".as("key"), $"o_orderpriority".as("pri")).as("cust"),
      $"o_totalprice".as("price"),
      array($"o_orderstatus", $"o_orderpriority").as("tags")))
    Tables.orders(spark, sfDir)
      .select(parse_json(doc).as("v"))
      .select(
        variant_get($"v", "$.cust.pri", "string").as("pri"),
        variant_get($"v", "$.price", "double").as("price"),
        variant_get($"v", "$.tags[0]", "string").as("tag0"))
      .groupBy($"pri")
      .agg(count(lit(1)).as("n"),
        Det.dsum($"price").as("sum_price"),
        max($"tag0").as("max_tag"))
      .orderBy($"pri")
  }

  // ground truth: extraction must reproduce the source columns exactly
  // (to_json renders doubles with Java's round-trip-exact shortest form,
  // so price survives the text round trip bit-for-bit)
  val qVariantExtractSql: String =
    s"""SELECT o_orderpriority AS pri, COUNT(*) AS n,
       |  ${Det.sqlSum("o_totalprice")} AS sum_price,
       |  MAX(o_orderstatus) AS max_tag
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY pri""".stripMargin

  /** Built-in XML source functions (Spark 4): render each order as an
    * XML fragment, parse it back with `from_xml` + an explicit schema,
    * and aggregate the extracted fields. Numeric leaves are integers
    * only — doubles are never round-tripped through XML text (no
    * cross-engine float-format contract there). */
  def qXmlExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val xml = concat(
      lit("<order><id>"), $"o_orderkey".cast("string"),
      lit("</id><status>"), $"o_orderstatus",
      lit("</status><pri>"), $"o_orderpriority",
      lit("</pri></order>"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("pri", StringType)))
    Tables.orders(spark, sfDir)
      .select(from_xml(xml, schema).as("x"))
      .groupBy($"x.pri".as("pri"), $"x.status".as("status"))
      .agg(count(lit(1)).as("n"),
        min($"x.id").as("min_id"), max($"x.id").as("max_id"))
      .orderBy($"pri", $"status")
  }

  val qXmlExtractSql: String =
    """SELECT o_orderpriority AS pri, o_orderstatus AS status, COUNT(*) AS n,
      |  MIN(o_orderkey) AS min_id, MAX(o_orderkey) AS max_id
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY pri, status""".stripMargin

  /** URL parsing for web-corpus curation (domain-level dedup / source
    * filtering): synthesize each document's canonical URL, then extract
    * HOST / PATH / a QUERY parameter with `parse_url` and aggregate per
    * host. Oracle = ground truth from the base columns. parse_url is a
    * codegen'd expression — no UDF — so the extraction stays inside
    * whole-stage codegen at any scale. */
  def qUrlParse(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val url = concat(
      lit("https://"), $"source", lit(".example.com/"), $"lang",
      lit("/doc/"), $"doc_id".cast("string"),
      lit("?ref=r"), ($"doc_id" % 7).cast("string"), lit("&utm=x"))
    Tables.documents(spark, sfDir)
      .select(
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY"), lit("ref")).as("ref"))
      .groupBy($"host", $"ref")
      .agg(count(lit(1)).as("n"), min($"path").as("min_path"))
      .orderBy($"host", $"ref")
  }

  val qUrlParseSql: String =
    """SELECT source || '.example.com' AS host,
      |  'r' || CAST(doc_id % 7 AS VARCHAR) AS ref,
      |  COUNT(*) AS n,
      |  MIN('/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)) AS min_path
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY host, ref""".stripMargin

  /** regexp_extract_all + generator: pull every digit run out of the
    * semi-structured props payload, explode to one row per match, and
    * aggregate the value distribution — the "mine numbers out of messy
    * strings" primitive (log scraping, malformed-JSON salvage). The
    * extraction is codegen'd; the explode is a generator before the
    * aggregation shuffle, so only matches move. */
  def qRegexAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(explode(expr("regexp_extract_all(props, '[0-9]+', 0)")).as("num"))
      .groupBy(length($"num").as("n_digits"))
      .agg(count(lit(1)).as("n"),
        min($"num".cast("long")).as("min_val"),
        max($"num".cast("long")).as("max_val"))
      .orderBy($"n_digits")
  }

  val qRegexAllSql: String =
    """SELECT length(num) AS n_digits, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(CAST(num AS BIGINT)) AS BIGINT) AS min_val,
      |  CAST(MAX(CAST(num AS BIGINT)) AS BIGINT) AS max_val
      |FROM (
      |  SELECT unnest(regexp_extract_all(props, '[0-9]+')) AS num
      |  FROM events)
      |GROUP BY 1
      |ORDER BY n_digits""".stripMargin

  /** Higher-order-function breadth over the embedding arrays: filter /
    * exists / forall / transform∘aggregate / position — the lambda
    * surface §2.3's array row promises, all codegen-friendly built-ins
    * (no Scala closures). The only numeric reduction (L1 norm) runs in
    * floor(1024·x) integer space, so the left-fold is order-proof and
    * DuckDB's list_sum replays it exactly; everything else is counting
    * and comparison on identical float→double promotions. */
  def qHofFns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select(
        $"vec_id",
        size(filter($"embedding", x => x > lit(0.0f))).as("n_pos"),
        exists($"embedding", x => x > lit(0.25)).as("any_gt"),
        forall($"embedding", x => abs(x) < lit(0.45)).as("all_small"),
        aggregate(
          transform($"embedding",
            x => abs(floor(x.cast("double") * 1024.0).cast("long"))),
          lit(0L), (acc, x) => acc + x).as("l1_q"),
        array_position($"embedding", array_max($"embedding"))
          .cast("int").as("argmax_idx"))
      .orderBy($"vec_id")
  }

  val qHofFnsSql: String =
    """SELECT vec_id,
      |  CAST(len(list_filter(embedding, x -> x > 0.0)) AS INT) AS n_pos,
      |  len(list_filter(embedding, x -> x > 0.25)) > 0 AS any_gt,
      |  len(list_filter(embedding, x -> abs(x) < 0.45)) = len(embedding)
      |    AS all_small,
      |  CAST(list_sum(list_transform(embedding,
      |    x -> abs(CAST(FLOOR(CAST(x AS DOUBLE) * 1024.0) AS BIGINT))))
      |    AS BIGINT) AS l1_q,
      |  CAST(list_position(embedding, list_max(embedding)) AS INT)
      |    AS argmax_idx
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hof_fns"         -> (qHofFns _),
    "q_regex_all"       -> (qRegexAll _),
    "q_string_fns"      -> (qStringFns _),
    "q_date_fns"        -> (qDateFns _),
    "q_math_fns"        -> (qMathFns _),
    "q_case_when"       -> (qCaseWhen _),
    "q_json_extract"    -> (qJsonExtract _),
    "q_variant_extract" -> (qVariantExtract _),
    "q_xml_extract"     -> (qXmlExtract _),
    "q_url_parse"       -> (qUrlParse _),
    "q_array_fns"       -> (qArrayFns _))

  val oracle: Map[String, String] = Map(
    "q_hof_fns"         -> qHofFnsSql,
    "q_regex_all"       -> qRegexAllSql,
    "q_string_fns"      -> qStringFnsSql,
    "q_date_fns"        -> qDateFnsSql,
    "q_math_fns"        -> qMathFnsSql,
    "q_case_when"       -> qCaseWhenSql,
    "q_json_extract"    -> qJsonExtractSql,
    "q_variant_extract" -> qVariantExtractSql,
    "q_xml_extract"     -> qXmlExtractSql,
    "q_url_parse"       -> qUrlParseSql,
    "q_array_fns"       -> qArrayFnsSql)
}
