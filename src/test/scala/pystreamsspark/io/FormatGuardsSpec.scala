package pystreamsspark.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** Round-13 format/namespace guards (the r12 ADVICE items):
  *  - cluster-spec evolution must NOT stamp `statsfmt=micros-v2` in a
  *    metadata-only commit over a legacy table whose file entries still
  *    carry pre-micros timestamp stats (the stamp would defeat the
  *    tsStatsAreMicros prune guard → wrongly skipped files); tables
  *    with no timestamp stats at risk stamp as before;
  *  - delta manifests lead with a BARE `graft-reader-2` protocol token
  *    a pre-delta header parser fails loudly on, and this binary
  *    refuses future reader versions with an explicit upgrade error;
  *  - a graft VIEW and a graft TABLE cannot shadow each other in either
  *    creation order;
  *  - CREATE VIEW rejects bodies referencing session temp views (the
  *    vanilla-Spark law), while CTEs shadowing a temp name stay legal.
  */
class FormatGuardsSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("fmtguard").toString

  private def manifestLines(dir: String, v: Int): Seq[String] =
    Files.readAllLines(
      Paths.get(dir, "_manifests", f"v$v%08d.manifest"),
      StandardCharsets.UTF_8).asScala.toSeq

  private def writeManifest(dir: String, v: Int, lines: Seq[String]): Unit = {
    Files.write(Paths.get(dir, "_manifests", f"v$v%08d.manifest"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Strip the `statsfmt=` field from a manifest's header line —
    * simulates a table written by a pre-micros-v2 binary. */
  private def stripStatsFmt(dir: String, v: Int): Unit = {
    val lines = manifestLines(dir, v)
    val hdr = lines.head.split("\t")
      .filterNot(_.startsWith("statsfmt=")).mkString("\t")
    writeManifest(dir, v, hdr +: lines.tail)
  }

  test("clustercols evolution leaves a legacy timestamp-stats table " +
    "unstamped; compact restores the marker") {
    import spark.implicits._
    val dir = freshDir()
    val df = (0 until 200).map(i => (i.toLong, 1577836800L + i * 3600L))
      .toDF("id", "s")
      .withColumn("ts", timestamp_seconds(col("s"))).drop("s")
    SnapshotTable.createClustered(spark, dir, df, Seq("ts"))
    assert(manifestLines(dir, 1).head.contains("statsfmt=micros-v2"))
    stripStatsFmt(dir, 1) // now a legacy table: ts stats, no marker
    SnapshotTable.setProperties(spark, dir, Map("clustercols" -> "ts"))
    val hdr2 = manifestLines(dir, 2).head
    assert(!hdr2.contains("statsfmt="),
      "metadata-only ALTER must not re-label legacy timestamp stats as micros")
    // reads stay conservative-correct: every row survives a bound that
    // micros-labeled stats would have pruned on
    assert(SnapshotTable.readWhere(spark, dir,
      Map("ts" -> ("0", Long.MaxValue.toString))).count() === 200)
    // a compact REWRITES stats under the current binary → marker returns
    SnapshotTable.compact(spark, dir, 2)
    val hdr3 = manifestLines(dir, SnapshotTable.latestVersion(dir)).head
    assert(hdr3.contains("statsfmt=micros-v2"))
  }

  test("clustercols evolution still stamps statsfmt when no timestamp " +
    "stats are at risk") {
    import spark.implicits._
    val dir = freshDir()
    val df = (0 until 100).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    SnapshotTable.createClustered(spark, dir, df, Seq("id"))
    stripStatsFmt(dir, 1)
    SnapshotTable.setProperties(spark, dir, Map("clustercols" -> "id"))
    assert(manifestLines(dir, 2).head.contains("statsfmt=micros-v2"))
  }

  test("delta manifests lead with the bare reader token; future reader " +
    "versions are refused with an upgrade error") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotTable.create(spark, dir, (0 until 50).map(i =>
      (i.toLong, i * 2L)).toDF("id", "v"))
    SnapshotTable.append(spark, dir, (50 until 60).map(i =>
      (i.toLong, i * 2L)).toDF("id", "v"))
    val hdr = manifestLines(dir, 2).head
    val first = hdr.split("\t").head
    assert(first === "graft-reader-2",
      s"delta manifest must LEAD with the bare protocol token, got $first")
    assert(!first.contains("="),
      "the token must be bare so a pre-delta k=v destructure fails loudly")
    assert(hdr.contains("delta=1"))
    // forge a future-format manifest: this binary must refuse, not guess
    writeManifest(dir, 3,
      Seq("graft-reader-99\top=append\tparent=2\tts=0\tnfiles=0\t" +
        "delta=1\tckdist=2"))
    val e = intercept[IllegalStateException] {
      SnapshotTable.read(spark, dir).count()
    }
    assert(e.getMessage.contains("reader version 99"))
    // header-only consumers (vacuum's chain walk, HISTORY) refuse too
    val e2 = intercept[IllegalStateException] {
      SnapshotTable.history(spark, dir).collect()
    }
    assert(e2.getMessage.contains("reader version 99"))
  }

  // ---- view/table shadow + temp-view guards (catalog tier) ----

  private lazy val wh = {
    val d = Files.createTempDirectory("fmtguard_wh_").toString
    SnapshotSql.register(spark, d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fg")
    d
  }

  private def fresh(prefix: String): String =
    prefix + java.util.UUID.randomUUID().toString.take(8)

  test("CREATE TABLE refuses a name already held by a graft view") {
    wh
    val v = fresh("shadow_")
    SnapshotSql.sql(spark,
      s"CREATE VIEW graft.fg.$v AS SELECT 1 AS a")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.fg.$v (id BIGINT)")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("graft VIEW")),
      s"expected a view-shadow error, got: ${messages(e).mkString(" | ")}")
    SnapshotSql.sql(spark, s"DROP VIEW graft.fg.$v")
    // once the view is gone the table name is free again
    spark.sql(s"CREATE TABLE graft.fg.$v (id BIGINT)")
    assert(SnapshotSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM graft.fg.$v").head().getLong(0) === 0L)
  }

  test("CREATE VIEW rejects temp-view references; a CTE shadowing the " +
    "temp name stays legal") {
    wh
    val tv = fresh("tv_")
    spark.range(10).createOrReplaceTempView(tv)
    val e = intercept[IllegalArgumentException] {
      SnapshotSql.sql(spark,
        s"CREATE VIEW graft.fg.${fresh("bad_")} AS SELECT * FROM $tv")
    }
    assert(e.getMessage.contains("temporary view"))
    // the same name bound by a CTE is the CTE's, not the temp's
    val ok = fresh("ok_")
    SnapshotSql.sql(spark, s"CREATE VIEW graft.fg.$ok AS " +
      s"WITH $tv AS (SELECT 7 AS a) SELECT a FROM $tv")
    assert(SnapshotSql.sql(spark,
      s"SELECT a FROM graft.fg.$ok").head().getInt(0) === 7)
    // a temp reference hiding inside a SUBQUERY EXPRESSION is the same
    // latent bomb — the guard must walk IN/EXISTS/scalar subqueries
    // (r13 review fix: plain foreach never descends into them)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotSql.sql(spark,
        s"CREATE VIEW graft.fg.${fresh("bad2_")} AS " +
          s"SELECT 1 AS a WHERE 1 IN (SELECT id FROM $tv)")
    }
    assert(e2.getMessage.contains("temporary view"))
    spark.catalog.dropTempView(tv)
  }

  test("view inlining reaches subquery expressions: a graft view " +
    "referenced inside IN (...) resolves on the SnapshotSql route") {
    wh
    val inner = fresh("vin_")
    SnapshotSql.sql(spark,
      s"CREATE VIEW graft.fg.$inner AS SELECT 2 AS k")
    val n = SnapshotSql.sql(spark,
      "SELECT COUNT(*) AS n FROM (SELECT 2 AS x) " +
        s"WHERE x IN (SELECT k FROM graft.fg.$inner)").head().getLong(0)
    assert(n === 1L)
  }
}
