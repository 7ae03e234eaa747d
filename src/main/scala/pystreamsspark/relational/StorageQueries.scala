package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables

/** CSV / JSON source+sink round-trip queries (SURVEY.md §2.2).
  *
  * Each query WRITES a table out through the format under test, reads it
  * back with an explicit schema, and aggregates — while the oracle reads
  * the original PARQUET table. A green row therefore proves byte-exact
  * round-trip fidelity of the writer+reader pair, not just that the scan
  * API exists. Standard RFC-4180 quoting (`escape = "`) is set explicitly
  * on the CSV side so embedded commas/quotes survive.
  *
  * The scratch dir is per-SF under java.io.tmpdir; nation is 25 rows, so
  * the side write is negligible in Bench runs.
  */
object StorageQueries {

  // per-process unique component: two concurrent runs (Bench + test
  // suite) on one machine must not overwrite each other's scratch files
  // mid-read; the oracle reads the original parquet, so uniqueness of
  // this path costs nothing.
  private val runTag: String = java.util.UUID.randomUUID().toString.take(8)

  private def scratch(sfDir: String, fmt: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_roundtrip/${runTag}/${tag}_$fmt"
  }

  def qCsvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nation = Tables.nation(spark, sfDir)
    val dir = scratch(sfDir, "csv")
    nation.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(dir)
    spark.read.option("header", "true").option("escape", "\"")
      .schema(nation.schema).csv(dir)
      .select($"n_nationkey", $"n_name", $"n_regionkey",
        length($"n_name").as("name_len"))
      .orderBy($"n_nationkey")
  }

  // oracle reads the ORIGINAL parquet — equality proves the CSV round-trip
  val qCsvRoundtripSql: String =
    """SELECT n_nationkey, n_name, n_regionkey, len(n_name) AS name_len
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  def qJsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val supplier = Tables.supplier(spark, sfDir)
    val dir = scratch(sfDir, "json")
    supplier.coalesce(1).write.mode("overwrite").json(dir)
    spark.read.schema(supplier.schema).json(dir)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_supp"),
        pystreamsspark.relational.Det.dsum($"s_acctbal").as("sum_bal"))
      .orderBy($"s_nationkey")
  }

  val qJsonRoundtripSql: String =
    s"""SELECT s_nationkey, COUNT(*) AS n_supp,
       |  ${Det.sqlSum("s_acctbal")} AS sum_bal
       |FROM supplier
       |GROUP BY s_nationkey
       |ORDER BY s_nationkey""".stripMargin

  /** ORC round-trip (the third columnar-adjacent format Spark ships
    * natively): part written to ORC, read back, aggregated; the oracle
    * reads the original parquet — equality proves writer+reader
    * fidelity including the decimal/double and string columns. */
  def qOrcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, sfDir)
    val dir = scratch(sfDir, "orc")
    part.coalesce(1).write.mode("overwrite").orc(dir)
    spark.read.schema(part.schema).orc(dir)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"),
        pystreamsspark.relational.Det.dsum($"p_retailprice").as("sum_price"),
        max(length($"p_name")).as("max_name_len"))
      .orderBy($"p_brand")
  }

  val qOrcRoundtripSql: String =
    s"""SELECT p_brand, COUNT(*) AS n_parts,
       |  ${Det.sqlSum("p_retailprice")} AS sum_price,
       |  CAST(MAX(len(p_name)) AS INT) AS max_name_len
       |FROM part
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_csv_roundtrip"  -> (qCsvRoundtrip _),
    "q_json_roundtrip" -> (qJsonRoundtrip _),
    "q_orc_roundtrip"  -> (qOrcRoundtrip _))

  val oracle: Map[String, String] = Map(
    "q_csv_roundtrip"  -> qCsvRoundtripSql,
    "q_json_roundtrip" -> qJsonRoundtripSql,
    "q_orc_roundtrip"  -> qOrcRoundtripSql)
}
