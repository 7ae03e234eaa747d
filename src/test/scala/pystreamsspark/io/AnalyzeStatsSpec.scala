package pystreamsspark.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import pystreamsspark.SparkSpec

/** `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS` (round-11): one
  * distributed pass records per-column NDV (HLL++, approximate) /
  * exact null counts / min-max renders / string lengths in the
  * manifest header, and the V2 scan serves them as connector
  * `columnStats` so a CBO-enabled session estimates joins from real
  * NDVs instead of sizes. Laws: recorded values match ground truth
  * (nulls exact, NDV within HLL tolerance), the scan's Statistics
  * carries them (and withholds under pushdown, where they would
  * overestimate), the header survives later commits, and both SQL
  * routes parse the statement. */
class AnalyzeStatsSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_an_").toString

  test("analyzeColumns records NDV/nulls/min-max/lengths; survives " +
    "later commits; staleness version recorded") {
    val dir = tmp()
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("grp", pmod(col("id"), lit(10)))
      .withColumn("tag", when(col("id") % 4 === 0, lit(null))
        .otherwise(concat(lit("t"), pmod(col("id"), lit(100)))))
    SnapshotTable.create(spark, dir, df)
    SnapshotTable.analyzeColumns(spark, dir)
    val (stats, atV) = SnapshotTable.columnStatsOf(dir)
    assert(atV.contains(1))
    assert(stats("id").nulls === 0L && stats("grp").nulls === 0L)
    assert(stats("tag").nulls === 250L) // exact
    // HLL tolerance: default rsd 5%
    assert(math.abs(stats("id").ndv - 1000L) <= 60)
    assert(math.abs(stats("grp").ndv - 10L) <= 2)
    assert(stats("id").min.contains("0") && stats("id").max.contains("999"))
    assert(stats("tag").min.isEmpty, "string min/max not recorded")
    assert(stats("tag").maxLen.exists(_ >= 2L))
    // the header carries through a later append
    SnapshotTable.append(spark, dir, Seq((5000L, 1L, "x"))
      .toDF("id", "grp", "tag"))
    val (after, afterV) = SnapshotTable.columnStatsOf(dir)
    assert(after("grp").ndv === stats("grp").ndv && afterV.contains(1))
  }

  test("the V2 scan serves columnStats to the CBO; withheld under " +
    "pushdown") {
    val dir = tmp()
    SnapshotTable.create(spark, dir,
      spark.range(0, 500).toDF("id")
        .withColumn("k", pmod(col("id"), lit(7))))
    SnapshotTable.analyzeColumns(spark, dir)
    val noOpts = new CaseInsensitiveStringMap(
      java.util.Collections.emptyMap())
    def scanStats(withFilter: Boolean) = {
      val b = new SnapshotV2Table("t", dir, None).newScanBuilder(noOpts)
      if (withFilter) {
        import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
        import org.apache.spark.sql.types.LongType
        // the file-scan builder takes catalyst filters (Spark 4 API)
        b.asInstanceOf[org.apache.spark.sql.internal.connector
          .SupportsPushDownCatalystFilters]
          .pushFilters(Seq(EqualTo(
            AttributeReference("k", LongType)(), Literal(3L))))
      }
      b.build().asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
    }
    val st = scanStats(withFilter = false)
    assert(st.numRows().getAsLong === 500L)
    val cs = st.columnStats()
    assert(!cs.isEmpty, "analyzed columns must surface as columnStats")
    val kStats = cs.entrySet().iterator()
    var found = false
    cs.forEach { (ref, c) =>
      if (ref.fieldNames().toSeq == Seq("k")) {
        found = true
        assert(math.abs(c.distinctCount().getAsLong - 7L) <= 1)
        assert(c.nullCount().getAsLong === 0L)
      }
    }
    assert(found, s"no columnStats entry for k: $cs")
    // a pushed filter makes the whole-snapshot stats overestimates —
    // they are withheld (base size-only estimate)
    assert(scanStats(withFilter = true).columnStats().isEmpty)
  }

  test("colstats follow a RENAME and die with a DROP (a re-added " +
    "name must not inherit the dead column's NDV)") {
    val dir = tmp()
    SnapshotTable.create(spark, dir,
      spark.range(0, 200).toDF("id")
        .withColumn("s", pmod(col("id"), lit(3)).cast("string")))
    SnapshotTable.analyzeColumns(spark, dir)
    SnapshotTable.renameColumn(dir, "s", "status")
    val (renamed, _) = SnapshotTable.columnStatsOf(dir)
    assert(renamed.contains("status") && !renamed.contains("s"))
    SnapshotTable.dropColumn(dir, "status")
    assert(!SnapshotTable.columnStatsOf(dir)._1.contains("status"))
    SnapshotTable.evolveSchema(dir, org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("status",
        org.apache.spark.sql.types.StringType))))
    assert(!SnapshotTable.columnStatsOf(dir)._1.contains("status"),
      "a re-added column must not inherit the dropped column's stats")
  }

  test("SQL routes: ANALYZE TABLE … COMPUTE STATISTICS on both parsers") {
    val wh = tmp()
    SnapshotSql.register(spark, wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.an")
    val t = "t_" + java.util.UUID.randomUUID().toString.take(8)
    spark.sql(s"CREATE TABLE graft.an.$t (id BIGINT, k BIGINT)")
    SnapshotSql.sql(spark, s"INSERT INTO graft.an.$t " +
      "SELECT id, id % 5 FROM range(0, 100)")
    val dir = SnapshotSql.resolveTable(spark, Seq("graft", "an", t)).get
    SnapshotSql.sql(spark,
      s"ANALYZE TABLE graft.an.$t COMPUTE STATISTICS FOR COLUMNS k")
    val (stats, _) = SnapshotTable.columnStatsOf(dir)
    assert(stats.keySet === Set("k"))
    assert(math.abs(stats("k").ndv - 5L) <= 1)
    // FOR ALL COLUMNS form
    SnapshotSql.sql(spark,
      s"ANALYZE TABLE graft.an.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    assert(SnapshotTable.columnStatsOf(dir)._1.keySet === Set("id", "k"))
    // with CBO on, the logical plan sees the row count (the stats
    // plumbing end-to-end; attribute-level use is Spark's estimator)
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val st = spark.table(s"graft.an.$t")
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.exists(_.toLong == 100L))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }
}
