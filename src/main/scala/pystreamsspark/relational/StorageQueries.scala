package pystreamsspark.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Plain-text source round-trip: one LINE per region rendered as a
    * pipe-delimited record, written through the `text` format, read back
    * as raw lines and re-parsed with codegen'd split/cast — the
    * log-file-ingestion shape (at 100 TB the text scan splits by line
    * ranges exactly like any other file source, and the parse is per-row
    * projection work). Oracle reads the original parquet. */
  def qTextRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, sfDir)
    val dir = scratch(sfDir, "text")
    region
      .select(concat_ws("|", $"r_regionkey", $"r_name").as("value"))
      .coalesce(1).write.mode("overwrite").text(dir)
    spark.read.text(dir)
      .select(split($"value", "\\|").as("f"))
      .select(element_at($"f", 1).cast("int").as("r_regionkey"),
        element_at($"f", 2).as("r_name"),
        length(element_at($"f", 2)).as("name_len"))
      .orderBy($"r_regionkey")
  }

  val qTextRoundtripSql: String =
    """SELECT r_regionkey, r_name, len(r_name) AS name_len
      |FROM region
      |ORDER BY r_regionkey""".stripMargin

  /** `binaryFile` source — the multimodal INGESTION path: opaque files
    * on disk become (path, length, content) rows. Spark synthesizes one
    * real PNG per nation (spec-correct IHDR bytes, written as loose
    * files via the text-free binary write below), reads the directory
    * back through format("binaryFile"), and runs the REAL header parser
    * over the content column. The oracle recomputes the expected
    * dimensions arithmetically from the ids encoded in the file names.
    * At 100 TB this is how a crawl of image/audio files enters the
    * engine: file-granular splits, no pre-conversion pass. */
  def qBinaryfileScan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = scratch(sfDir, "binfiles")
    val w = (k: Column) => pmod(k, lit(4096)) + 1
    val h = (k: Column) => pmod(k * 13, lit(2160)) + 1
    val png = (k: Column) => unhex(concat(
      lit("89504E470D0A1A0A0000000D49484452"),
      lpad(hex(w(k)), 8, "0"), lpad(hex(h(k)), 8, "0"),
      lit("0806000000")))
    // write each payload as its own loose file (binaryFile is a
    // directory-of-files source, not a table format); 25 dimension rows
    // — the driver-side write is fixture setup, not a data path
    new java.io.File(dir).mkdirs()
    Tables.nation(spark, sfDir)
      .select($"n_nationkey".cast("long").as("k"), png($"n_nationkey").as("p"))
      .as[(Long, Array[Byte])].collect()
      .foreach { case (k, bytes) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/img_$k.png"), bytes)
      }
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(element_at(split($"path", "/"), -1),
          "img_(\\d+)\\.png", 1).cast("long").as("k"),
        $"length", $"content")
      .as[(Long, Long, Array[Byte])]
      .map { case (k, len, bytes) =>
        val m = pystreamsspark.llm.Multimodal.decodeHeader(bytes)
          .getOrElse(MediaMetaMissing)
        (k, len, m.width, m.height, m.format)
      }
      .toDF("k", "n_bytes", "width", "height", "format")
      .orderBy($"k")
  }

  private val MediaMetaMissing =
    pystreamsspark.llm.MediaMeta(-1, -1, -1, "none")

  val qBinaryfileScanSql: String =
    """SELECT CAST(n_nationkey AS BIGINT) AS k,
      |  CAST(29 AS BIGINT) AS n_bytes,
      |  CAST(n_nationkey % 4096 + 1 AS INT) AS width,
      |  CAST((n_nationkey * 13) % 2160 + 1 AS INT) AS height,
      |  'png' AS format
      |FROM nation
      |ORDER BY k""".stripMargin

  /** Custom DataSource V2 scan (`sources/SynthSource.scala`): read the
    * deterministic generated table through the connector API with an
    * id-range filter (pushed down — the scan GENERATES only the
    * surviving range; plan- and spec-asserted) and aggregate per id mod
    * 10. The oracle regenerates the identical table from the same LCG
    * arithmetic over `generate_series` — so a green row proves the
    * whole V2 read path (provider → scan builder → pushdown → partition
    * planning → readers) delivers exactly the declared relation. */
  def qDsv2Scan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("pystreamsspark.sources.SynthSource")
      .option("rows", "100000").option("partitions", "8").load()
      .filter($"id" >= 25000L && $"id" < 75000L)
      .groupBy(($"id" % 10).as("m10"))
      .agg(count(lit(1)).as("n"),
        sum($"value").as("sum_v"),
        min($"value").as("min_v"),
        max($"value").as("max_v"),
        countDistinct($"bucket").as("n_buckets"))
      .orderBy($"m10")
  }

  val qDsv2ScanSql: String =
    """SELECT id % 10 AS m10, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM((id * 1103515245 + 12345) % 1000000) AS BIGINT) AS sum_v,
      |  CAST(MIN((id * 1103515245 + 12345) % 1000000) AS BIGINT) AS min_v,
      |  CAST(MAX((id * 1103515245 + 12345) % 1000000) AS BIGINT) AS max_v,
      |  CAST(COUNT(DISTINCT id % 32) AS BIGINT) AS n_buckets
      |FROM generate_series(25000, 74999) t(id)
      |GROUP BY 1
      |ORDER BY m10""".stripMargin

  /** V2 AGGREGATE pushdown over the same custom source: a global
    * COUNT/MIN/MAX is answered from one closed-form partial row per
    * range split (`SynthAggScan`) — 8 rows reach Spark's merge
    * aggregate instead of 100k (the connector analogue of answering
    * from parquet footer stats). The executed plan's scan is asserted
    * to be the agg scan in SynthSourceSpec; the oracle recomputes the
    * same aggregates from the generated relation. */
  def qDsv2Agg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("pystreamsspark.sources.SynthSource")
      .option("rows", "100000").option("partitions", "8").load()
      .agg(count(lit(1)).as("n"),
        min($"id").as("min_id"), max($"id").as("max_id"),
        min($"bucket").as("min_b"), max($"bucket").as("max_b"))
  }

  val qDsv2AggSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(id) AS min_id, MAX(id) AS max_id,
      |  CAST(MIN(id % 32) AS INT) AS min_b,
      |  CAST(MAX(id % 32) AS INT) AS max_b
      |FROM generate_series(0, 99999) t(id)""".stripMargin

  /** GROUPED V2 aggregate pushdown: GROUP BY bucket COUNT/MIN/MAX(id)
    * is answered from ≤32 arithmetic-progression partial rows per range
    * split (ids ≡ b mod 32 in a contiguous range have O(1) count and
    * endpoints) — Spark's final aggregate merges `32 × partitions`
    * rows instead of scanning the relation. */
  def qDsv2Grouped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("pystreamsspark.sources.SynthSource")
      .option("rows", "100000").option("partitions", "8").load()
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        min($"id").as("min_id"), max($"id").as("max_id"))
      .orderBy($"bucket")
  }

  val qDsv2GroupedSql: String =
    """SELECT CAST(id % 32 AS INT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(id) AS min_id, MAX(id) AS max_id
      |FROM generate_series(0, 99999) t(id)
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  /** STORAGE-PARTITIONED JOIN (SPARK-37375) over the custom source:
    * both sides are read `keyedBy=bucket`, so each scan reports
    * `KeyGroupedPartitioning(identity(bucket), 32)` and every input
    * partition carries its bucket value via `HasPartitionKey`. With V2
    * bucketing enabled Spark plans the bucket equi-join with ZERO
    * shuffle exchanges — both sides are already grouped by the join
    * key at the source, the exchange-free co-located join that
    * `q_bucket_join`'s bucketed tables approximate on files. The
    * per-bucket aggregate after the join also reuses the partitioning
    * (no exchange until the 32-row presentation sort; asserted in
    * SynthSourceSpec). The oracle regenerates both relations from LCG
    * arithmetic and replays the join. */
  def qSpjJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    def keyedSynth(rows: Long) = spark.read
      .format("pystreamsspark.sources.SynthSource")
      .option("rows", rows.toString).option("keyedBy", "bucket").load()
    val a = keyedSynth(6400L)
      .select($"bucket", $"id".as("id_a"), $"value".as("v_a"))
    val b = keyedSynth(3200L)
      .select($"bucket", $"id".as("id_b"), $"value".as("v_b"))
    a.hint("merge").join(b, Seq("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"v_a" + $"v_b").as("sum_v"),
        max($"id_a" + $"id_b").as("max_ids"))
      .orderBy($"bucket")
  }

  val qSpjJoinSql: String =
    """WITH a AS (
      |  SELECT CAST(id % 32 AS INT) AS bucket, id AS id_a,
      |    (id * 1103515245 + 12345) % 1000000 AS v_a
      |  FROM generate_series(0, 6399) t(id)),
      |b AS (
      |  SELECT CAST(id % 32 AS INT) AS bucket, id AS id_b,
      |    (id * 1103515245 + 12345) % 1000000 AS v_b
      |  FROM generate_series(0, 3199) t(id))
      |SELECT a.bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(v_a + v_b) AS BIGINT) AS sum_v,
      |  MAX(id_a + id_b) AS max_ids
      |FROM a JOIN b ON a.bucket = b.bucket
      |GROUP BY a.bucket
      |ORDER BY a.bucket""".stripMargin

  /** V2 TopN pushdown over the custom source: ORDER BY id DESC LIMIT 7
    * is answered from range arithmetic in O(1) (`SynthTopNScan` —
    * 7 generated rows, no Sort and no Limit in the executed plan; both
    * asserted in SynthSourceSpec). The trailing ASC orderBy is the
    * oracle presentation order and runs over the 7 surviving rows. */
  def qDsv2Topn(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("pystreamsspark.sources.SynthSource")
      .option("rows", "100000").option("partitions", "8").load()
      .filter($"id" < 90000L)
      .orderBy($"id".desc).limit(7)
      .select($"id", $"value", $"bucket")
      .orderBy($"id")
  }

  val qDsv2TopnSql: String =
    """WITH topn AS (
      |  SELECT id FROM generate_series(0, 99999) t(id)
      |  WHERE id < 90000 ORDER BY id DESC LIMIT 7)
      |SELECT id, (id * 1103515245 + 12345) % 1000000 AS value,
      |  CAST(id % 32 AS INT) AS bucket
      |FROM topn ORDER BY id""".stripMargin

  /** V2 OFFSET pushdown (pagination): `ORDER BY id LIMIT 10 OFFSET
    * 5000` over the filtered range is answered from range arithmetic in
    * O(1) — Spark pushes TopN(k+m) then Offset(m), the scan's surviving
    * range is exactly result rows [m, m+k), and BOTH the Sort/Limit and
    * the Offset nodes are removed from the executed plan (asserted in
    * SynthSourceSpec). The 100 TB story: page N of a generated/
    * range-keyed relation costs k rows, not a prefix scan. */
  def qDsv2Offset(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("pystreamsspark.sources.SynthSource")
      .option("rows", "100000").option("partitions", "8").load()
      .filter($"id" >= 10000L)
      .orderBy($"id").offset(5000).limit(10)
      .select($"id", $"value", $"bucket")
      .orderBy($"id")
  }

  val qDsv2OffsetSql: String =
    """WITH page AS (
      |  SELECT id FROM generate_series(0, 99999) t(id)
      |  WHERE id >= 10000 ORDER BY id LIMIT 10 OFFSET 5000)
      |SELECT id, (id * 1103515245 + 12345) % 1000000 AS value,
      |  CAST(id % 32 AS INT) AS bucket
      |FROM page ORDER BY id""".stripMargin

  /** V2 RUNTIME (dynamic) filtering, SPARK-35779: the dim side's ~20
    * surviving join keys are evaluated FIRST and delivered to the fact
    * scan as an `In("id", …)` runtime filter, which the generator turns
    * into exact point seeks — the executed plan's fact scan emits ~20
    * rows, not the 10^6-row relation (both asserted in
    * SynthSourceSpec). The dim filter is on `value`, so no static rule
    * could push it onto `id`; only join-time filtering can. The oracle
    * replays the identical join over `generate_series`. */
  def qDsv2Runtime(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val synth = () => spark.read
      .format("pystreamsspark.sources.SynthSource")
      .option("rows", "1000000").option("partitions", "16").load()
    val dim = synth().filter($"value" < 20L)
      .select($"id".as("k"), $"bucket".as("dim_bucket"))
    synth().join(broadcast(dim), $"id" === $"k")
      .select($"id", $"value", $"dim_bucket")
      .orderBy($"id")
  }

  val qDsv2RuntimeSql: String =
    """SELECT id, (id * 1103515245 + 12345) % 1000000 AS value,
      |  CAST(id % 32 AS INT) AS dim_bucket
      |FROM generate_series(0, 999999) t(id)
      |WHERE (id * 1103515245 + 12345) % 1000000 < 20
      |ORDER BY id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dsv2_offset"    -> (qDsv2Offset _),
    "q_dsv2_runtime"   -> (qDsv2Runtime _),
    "q_spj_join"       -> (qSpjJoin _),
    "q_dsv2_topn"      -> (qDsv2Topn _),
    "q_dsv2_grouped"   -> (qDsv2Grouped _),
    "q_dsv2_agg"       -> (qDsv2Agg _),
    "q_dsv2_scan"      -> (qDsv2Scan _),
    "q_csv_roundtrip"  -> (qCsvRoundtrip _),
    "q_json_roundtrip" -> (qJsonRoundtrip _),
    "q_text_roundtrip" -> (qTextRoundtrip _),
    "q_binaryfile_scan" -> (qBinaryfileScan _),
    "q_orc_roundtrip"  -> (qOrcRoundtrip _))

  val oracle: Map[String, String] = Map(
    "q_dsv2_offset"    -> qDsv2OffsetSql,
    "q_dsv2_runtime"   -> qDsv2RuntimeSql,
    "q_spj_join"       -> qSpjJoinSql,
    "q_dsv2_topn"      -> qDsv2TopnSql,
    "q_dsv2_grouped"   -> qDsv2GroupedSql,
    "q_dsv2_agg"       -> qDsv2AggSql,
    "q_dsv2_scan"      -> qDsv2ScanSql,
    "q_csv_roundtrip"  -> qCsvRoundtripSql,
    "q_json_roundtrip" -> qJsonRoundtripSql,
    "q_text_roundtrip" -> qTextRoundtripSql,
    "q_binaryfile_scan" -> qBinaryfileScanSql,
    "q_orc_roundtrip"  -> qOrcRoundtripSql)
}
