package pystreamsspark.io

import org.apache.spark.sql.SparkSession
import pystreamsspark.SparkSpec

/** Persistent VIEWS through the graft catalog (round-12, r11 verdict
  * #7). Laws:
  *  - CREATE [OR REPLACE] VIEW / DROP VIEW [IF EXISTS] on graft
  *    identifiers store/drop a body; reads through [[SnapshotSql.sql]]
  *    and through a GraftExtensions session both inline it;
  *  - PUSHDOWN CROSSES the view boundary: a filtered read of a view
  *    over a snapshot table shows PushedFilters beneath (the view
  *    disappears before optimization);
  *  - nesting works (a view over a view), cycles fail loudly;
  *  - context-relative names inside the body keep resolving from other
  *    sessions'/namespaces' contexts;
  *  - TEMP views and session-catalog views keep stock behavior;
  *  - a view cannot shadow a table; a table read of a view name on a
  *    plain session fails with a pointed error.
  */
class GraftViewSpec extends SparkSpec {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_vw_wh_").toString
    SnapshotSql.register(spark, d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vw")
    d
  }

  private def fresh(prefix: String): String =
    prefix + java.util.UUID.randomUUID().toString.take(8)

  /** The warehouse the session's graft catalog ACTUALLY uses — the
    * JVM-wide instance pins its first-registered warehouse, so in a
    * full-suite run this differs from this spec's own `wh` (the
    * standing suite-order gotcha); every cross-session register must
    * use this. */
  private def effectiveWh(t: String): String =
    java.nio.file.Paths.get(SnapshotSql.resolveTable(spark,
      Seq("graft", "vw", t)).getOrElse(fail(s"graft.vw.$t unresolved")))
      .getParent.getParent.toString

  private def mkTable(): String = {
    wh
    val t = fresh("vt_")
    spark.sql(s"CREATE TABLE graft.vw.$t (id BIGINT, grp STRING, " +
      "v DOUBLE) TBLPROPERTIES('clustercols'='id')")
    SnapshotSql.sql(spark, s"INSERT INTO graft.vw.$t SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, id * 1.0 " +
      "FROM range(1000)")
    t
  }

  test("create, read through SnapshotSql.sql, replace, drop") {
    val t = mkTable()
    val v = fresh("v_")
    SnapshotSql.sql(spark, s"CREATE VIEW graft.vw.$v AS " +
      s"SELECT id, v FROM graft.vw.$t WHERE grp = 'a'")
    val n = SnapshotSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM graft.vw.$v").head().getLong(0)
    assert(n === 500)
    // no OR REPLACE -> refuse; with it -> new body
    intercept[Exception] {
      SnapshotSql.sql(spark, s"CREATE VIEW graft.vw.$v AS SELECT 1 AS x")
    }
    SnapshotSql.sql(spark, s"CREATE OR REPLACE VIEW graft.vw.$v AS " +
      s"SELECT id FROM graft.vw.$t WHERE grp = 'b'")
    assert(SnapshotSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM graft.vw.$v").head().getLong(0) === 500)
    SnapshotSql.sql(spark, s"DROP VIEW graft.vw.$v")
    intercept[Exception] {
      SnapshotSql.sql(spark, s"SELECT * FROM graft.vw.$v").collect()
    }
    // IF EXISTS on a gone view is a no-op
    SnapshotSql.sql(spark, s"DROP VIEW IF EXISTS graft.vw.$v")
  }

  test("pushdown crosses the view boundary (PushedFilters beneath a " +
    "filtered view read); nesting works; cycles refuse") {
    val t = mkTable()
    val v = fresh("v_")
    SnapshotSql.sql(spark, s"CREATE VIEW graft.vw.$v AS " +
      s"SELECT id, grp, v FROM graft.vw.$t")
    val df = SnapshotSql.sql(spark,
      s"SELECT id, v FROM graft.vw.$v WHERE id BETWEEN 10 AND 20")
    assert(df.count() === 11)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(id,10)"),
      s"filter must push through the view into the scan:\n$physical")
    // nested view
    val v2 = fresh("v2_")
    SnapshotSql.sql(spark, s"CREATE VIEW graft.vw.$v2 AS " +
      s"SELECT grp, SUM(v) AS sv FROM graft.vw.$v GROUP BY grp")
    val agg = SnapshotSql.sql(spark,
      s"SELECT * FROM graft.vw.$v2 WHERE grp = 'a'").collect()
    assert(agg.length === 1 && agg.head.getDouble(1) === (0 until 1000)
      .filter(_ % 2 == 0).map(_.toDouble).sum)
  }

  test("extensions session: plain spark.sql reads inline the view via " +
    "the resolution rule") {
    val t = mkTable()
    val v = fresh("v_")
    SnapshotSql.sql(spark, s"CREATE VIEW graft.vw.$v AS " +
      s"SELECT id FROM graft.vw.$t WHERE id < 100")
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-views")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new pystreamsspark.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      SnapshotSql.register(ext, effectiveWh(t))
      assert(ext.sql(s"SELECT COUNT(*) AS n FROM graft.vw.$v")
        .head().getLong(0) === 100)
      // the injected parser route: CREATE VIEW itself via ext.sql
      val v2 = fresh("v2_")
      ext.sql(s"CREATE VIEW graft.vw.$v2 AS " +
        s"SELECT id FROM graft.vw.$t WHERE id >= 900")
      assert(ext.sql(s"SELECT COUNT(*) AS n FROM graft.vw.$v2")
        .head().getLong(0) === 100)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevActive.foreach(SparkSession.setActiveSession)
      prevActive.foreach(SparkSession.setDefaultSession)
    }
  }

  test("context-relative body names resolve from other contexts; temp " +
    "views stay vanilla; views cannot shadow tables; plain table reads " +
    "of a view point at the SQL tier") {
    val t = mkTable()
    val v = fresh("v_")
    // body references the table RELATIVE to the creation context
    spark.sql("USE graft.vw")
    try {
      SnapshotSql.sql(spark, s"CREATE VIEW $v AS SELECT id FROM $t " +
        "WHERE id < 10")
    } finally spark.sql("USE spark_catalog")
    // read from a completely different context
    assert(SnapshotSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM graft.vw.$v").head().getLong(0) === 10)
    // temp views keep stock behavior on both routes
    spark.range(5).createOrReplaceTempView("vw_tmp_probe")
    assert(SnapshotSql.sql(spark,
      "SELECT COUNT(*) AS n FROM vw_tmp_probe").head().getLong(0) === 5)
    spark.sql("DROP VIEW vw_tmp_probe")
    // a view cannot shadow an existing table
    val e = intercept[Exception] {
      SnapshotSql.sql(spark, s"CREATE VIEW graft.vw.$t AS SELECT 1 AS x")
    }
    assert(e.getMessage.contains("TABLE"))
    // plain-session V2 read of the view name: a clean table-miss (the
    // analyzer must see NoSuchTable so extensions sessions can fall
    // through to the inline rule — asserted in the extensions test)
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.vw.$v").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("cannot be found") ||
      e2.getMessage.toLowerCase.contains("not found"))
  }

  test("r12 review: CTE and TEMP-view names are never hijacked by the " +
    "view store; explicit non-graft targets delegate under a graft " +
    "current catalog") {
    val t = mkTable()
    // a stored graft view whose name a CTE will shadow
    SnapshotSql.sql(spark, s"CREATE OR REPLACE VIEW graft.vw.shadow_x AS " +
      s"SELECT id FROM graft.vw.$t")
    spark.sql("USE graft.vw")
    try {
      // the CTE must win over the same-named stored view
      val r = SnapshotSql.sql(spark,
        "WITH shadow_x AS (SELECT 1 AS one) SELECT * FROM shadow_x")
        .collect()
      assert(r.length === 1 && r.head.getInt(0) === 1,
        "a CTE reference must not inline the same-named stored view")
      // a TEMP view must win over the same-named stored view
      spark.range(3).createOrReplaceTempView("shadow_x")
      assert(SnapshotSql.sql(spark,
        "SELECT COUNT(*) AS n FROM shadow_x").head().getLong(0) === 3,
        "temp-view precedence must survive a graft current catalog")
      // DROP VIEW of the TEMP view drops the temp view, not ours
      SnapshotSql.sql(spark, "DROP VIEW shadow_x")
      assert(SnapshotSql.sql(spark,
        "SELECT COUNT(*) AS n FROM shadow_x").head().getLong(0) === 1000,
        "after the temp drop the stored view must serve again")
      // explicitly-qualified NON-graft target under a graft current
      // catalog: vanilla route, no .view file in the graft warehouse
      SnapshotSql.sql(spark,
        "CREATE VIEW spark_catalog.default.vw_probe AS SELECT 42 AS x")
      try {
        assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
          effectiveWh(t), "vw", "spark_catalog")),
          "a session-catalog view must not land in the graft warehouse")
      } finally SnapshotSql.sql(spark,
        "DROP VIEW spark_catalog.default.vw_probe")
    } finally spark.sql("USE spark_catalog")
  }

  test("r13 advice: a CTE defined only inside a subquery must not " +
    "mask a same-named OUTER temp-view reference at CREATE time") {
    val t = mkTable()
    spark.range(5).toDF("id").createOrReplaceTempView("tmp_mask")
    try {
      val v = fresh("v_")
      // outer FROM references the TEMP view; an IN-subquery defines a
      // CTE named tmp_mask — the old plan-wide CTE-name union masked
      // the outer reference and ACCEPTED this latent-bomb view
      val bomb =
        s"SELECT id FROM tmp_mask WHERE id IN " +
          s"(WITH tmp_mask AS (SELECT id FROM graft.vw.$t) " +
          s"SELECT id FROM tmp_mask)"
      val e = intercept[Exception] {
        SnapshotSql.sql(spark, s"CREATE VIEW graft.vw.$v AS $bomb")
      }
      assert(e.getMessage.contains("temporary view"),
        s"expected the temp-view guard, got: ${e.getMessage}")
      // a CTE at the OUTER scope legitimately shadows the temp name:
      // still accepted, and the body reads the CTE
      SnapshotSql.sql(spark, s"CREATE VIEW graft.vw.$v AS " +
        s"WITH tmp_mask AS (SELECT id FROM graft.vw.$t) " +
        s"SELECT id FROM tmp_mask WHERE id < 10")
      assert(SnapshotSql.sql(spark,
        s"SELECT COUNT(*) AS n FROM graft.vw.$v").head().getLong(0) === 10)
      SnapshotSql.sql(spark, s"DROP VIEW graft.vw.$v")
    } finally spark.catalog.dropTempView("tmp_mask")
  }

  test("SHOW VIEWS lists stored views (+ temp views); non-graft " +
    "contexts delegate to vanilla") {
    val t = mkTable()
    val v = fresh("sv_")
    SnapshotSql.sql(spark, s"CREATE VIEW graft.vw.$v AS " +
      s"SELECT id FROM graft.vw.$t")
    spark.range(1).createOrReplaceTempView("sv_tmp_probe")
    try {
      val rows = SnapshotSql.sql(spark, "SHOW VIEWS IN graft.vw")
        .collect().map(r => (r.getString(1), r.getBoolean(2)))
      assert(rows.contains((v, false)), s"stored view missing: ${rows.toSeq}")
      assert(rows.contains(("sv_tmp_probe", true)),
        s"temp view missing: ${rows.toSeq}")
      // vanilla delegation outside graft: same statement under
      // spark_catalog lists only the temp view (3-col vanilla shape)
      val vrows = SnapshotSql.sql(spark, "SHOW VIEWS")
        .collect().map(_.getString(1))
      assert(vrows.contains("sv_tmp_probe"))
    } finally spark.sql("DROP VIEW sv_tmp_probe")
  }
}
