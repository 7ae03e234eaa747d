package pystreamsspark.io

import org.apache.spark.sql.SparkSession
import pystreamsspark.SparkSpec

/** `COPY INTO` — idempotent file ingestion (round-10 cont.): fresh
  * files load, already-loaded files skip (identity = path+size+mtime,
  * recorded in a ledger batch that commits ATOMICALLY with the data),
  * incremental staging loads only the new file, vacuum keeps referenced
  * ledger batches so idempotence survives it, CSV with options works,
  * and unknown source columns fail loudly. */
class CopyIntoSpec extends SparkSpec {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_copy_wh_").toString
    SnapshotSql.register(spark, d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cp")
    d
  }

  private def freshName(prefix: String): String =
    prefix + java.util.UUID.randomUUID().toString.take(8)

  private def dirOf(t: String): String =
    SnapshotSql.resolveTable(spark, Seq("graft", "cp", t)).getOrElse(
      fail(s"graft.cp.$t did not resolve"))

  private def stage(): String =
    java.nio.file.Files.createTempDirectory("graft_copy_stage_").toString

  test("COPY INTO loads fresh parquet files once; re-run is a no-op; " +
    "a newly staged file loads incrementally") {
    import spark.implicits._
    wh
    val t = freshName("cp_")
    spark.sql(s"CREATE TABLE graft.cp.$t (id BIGINT, v DOUBLE)")
    val stg = stage()
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$stg/b1")
    Seq((3L, 3.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$stg/b2")
    val r1 = SnapshotSql.sql(spark,
      s"COPY INTO graft.cp.$t FROM '$stg/*/*.parquet'").head
    assert(r1.getInt(1) === 2) // two part files loaded
    assert(spark.sql(s"SELECT count(*) FROM graft.cp.$t").head.getLong(0) === 3L)
    // idempotent re-run: zero files, no new version
    val dir = dirOf(t)
    val v1 = SnapshotTable.latestVersion(dir)
    val r2 = SnapshotSql.sql(spark,
      s"COPY INTO graft.cp.$t FROM '$stg/*/*.parquet'").head
    assert(r2.getInt(1) === 0)
    assert(SnapshotTable.latestVersion(dir) === v1)
    // stage one more file: only IT loads
    Seq((4L, 4.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$stg/b3")
    val r3 = SnapshotSql.sql(spark,
      s"COPY INTO graft.cp.$t FROM '$stg/*/*.parquet'").head
    assert(r3.getInt(1) === 1)
    assert(spark.sql(s"SELECT count(*), CAST(sum(id) AS BIGINT) " +
      s"FROM graft.cp.$t").head.toSeq === Seq(4L, 10L))
    // history records the op
    val hist = SnapshotSql.sql(spark, s"DESCRIBE HISTORY graft.cp.$t")
      .collect().map(_.getString(1)).toSeq
    assert(hist.count(_ == "copy") === 2)
  }

  test("idempotence survives VACUUM (referenced ledger batches kept)") {
    import spark.implicits._
    wh
    val t = freshName("cpv_")
    spark.sql(s"CREATE TABLE graft.cp.$t (id BIGINT, v DOUBLE)")
    val stg = stage()
    Seq((1L, 1.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$stg/b1")
    SnapshotSql.sql(spark, s"COPY INTO graft.cp.$t FROM '$stg/b1'")
    val dir = dirOf(t)
    SnapshotSql.sql(spark, s"VACUUM graft.cp.$t RETAIN 1 VERSIONS")
    val r = SnapshotSql.sql(spark,
      s"COPY INTO graft.cp.$t FROM '$stg/b1'").head
    assert(r.getInt(1) === 0)
    assert(spark.sql(s"SELECT count(*) FROM graft.cp.$t").head.getLong(0) === 1L)
    // and the ledger batch is still on disk (referenced → kept)
    val copyRoot = java.nio.file.Paths.get(dir, "copy")
    assert(java.nio.file.Files.isDirectory(copyRoot))
  }

  test("CSV with FILEFORMAT + header option path (programmatic), " +
    "missing table columns null-fill, unknown source columns fail") {
    import spark.implicits._
    wh
    val t = freshName("cpc_")
    spark.sql(s"CREATE TABLE graft.cp.$t (id BIGINT, v DOUBLE, " +
      "note STRING)")
    val stg = stage()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(stg, "a.csv"), "id,v\n7,7.5\n8,8.5\n")
    val (_, n) = SnapshotTable.copyInto(spark, dirOf(t), s"$stg/a.csv",
      format = "csv", options = Map("header" -> "true",
        "inferSchema" -> "true"))
    assert(n === 1)
    val rows = spark.sql(s"SELECT id, v, note FROM graft.cp.$t " +
      "ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((7L, 7.5), (8L, 8.5)))
    assert(rows.forall(_.isNullAt(2))) // note null-fills
    // unknown source column → loud failure (schema drift signal)
    val stg2 = stage()
    Seq((1L, 1.0, "x")).toDF("id", "v", "mystery")
      .coalesce(1).write.parquet(s"$stg2/b")
    val e = intercept[Exception] {
      SnapshotTable.copyInto(spark, dirOf(t), s"$stg2/b")
    }
    assert(e.getMessage.contains("mystery"))
  }

  test("COPY INTO a clustered table records stats (appended batch " +
    "prunes) and works via plain spark.sql on an extensions session") {
    import spark.implicits._
    wh
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-copy")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new pystreamsspark.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      SnapshotSql.register(ext, wh)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.cp")
      val t = freshName("cpx_")
      ext.sql(s"CREATE TABLE graft.cp.$t (id BIGINT, v DOUBLE) " +
        "TBLPROPERTIES('clustercols'='id')")
      val stg = stage()
      import ext.implicits._
      (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
        .coalesce(2).write.parquet(s"$stg/b1")
      // the injected parser serves COPY INTO on plain ext.sql
      val r = ext.sql(s"COPY INTO graft.cp.$t FROM '$stg/b1' " +
        "FILEFORMAT = PARQUET").head
      assert(r.getInt(1) === 2)
      val dir = SnapshotSql.resolveTable(ext, Seq("graft", "cp", t)).get
      // the copied batch carries cluster stats → a narrow read prunes
      val cand = SnapshotTable.readCandidates(dir, "id", "1", "5")
      assert(cand.size < SnapshotTable.filePaths(dir).size)
      assert(ext.sql(s"SELECT count(*) FROM graft.cp.$t WHERE id <= 5")
        .head.getLong(0) === 5L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevActive.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
