package pystreamsspark.io

import org.apache.spark.sql.SparkSession
import pystreamsspark.SparkSpec

/** General MERGE (round-10 cont.): the full ANSI clause surface over
  * the copy-on-write snapshot layer — conditional matched actions with
  * first-clause-wins ordering, matched DELETE alongside UPDATE,
  * non-star assignments, conditional/non-star INSERT clauses, `WHEN NOT
  * MATCHED BY SOURCE` UPDATE/DELETE, the ANSI cardinality rule failing
  * loudly, side-classification errors for cross-side references, file
  * granularity (untouched files carried by reference through a general
  * merge), and the analyzer-rule route on a GraftExtensions session
  * producing the same result as the parsed-plan route. */
class GeneralMergeSpec extends SparkSpec {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_gm_wh_").toString
    SnapshotSql.register(spark, d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.gm")
    d
  }

  private def freshName(prefix: String): String =
    prefix + java.util.UUID.randomUUID().toString.take(8)

  private def dirOf(t: String): String =
    SnapshotSql.resolveTable(spark, Seq("graft", "gm", t)).getOrElse(
      fail(s"graft.gm.$t did not resolve"))

  /** id 1..5: (1,'A',10) (2,'B',20) (3,'A',30) (4,'B',40) (5,'C',50) */
  private def mkTable(clustered: Boolean = false): String = {
    wh
    val t = freshName("gm_")
    val props = if (clustered) " TBLPROPERTIES('clustercols'='id')" else ""
    spark.sql(s"CREATE TABLE graft.gm.$t (id BIGINT, status STRING, " +
      s"price DOUBLE)$props")
    SnapshotSql.sql(spark, s"INSERT INTO graft.gm.$t VALUES " +
      "(1,'A',10.0),(2,'B',20.0),(3,'A',30.0),(4,'B',40.0),(5,'C',50.0)")
    t
  }

  private def rowsOf(t: String): Seq[(Long, String, Double)] =
    spark.sql(s"SELECT id, status, price FROM graft.gm.$t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq

  private def mkSource(spark: SparkSession, name: String,
                       rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "status", "price").createOrReplaceTempView(name)
  }

  test("conditional matched UPDATE with non-star assignments; " +
    "unmatched-by-clause rows carry") {
    val t = mkTable()
    // source matches ids 1,2,3; clause condition keeps only status='A'
    mkSource(spark, "gm_src1",
      Seq((1L, "x", 100.0), (2L, "x", 200.0), (3L, "x", 300.0)))
    SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src1 s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND t.status = 'A' THEN " +
      "  UPDATE SET price = s.price + t.price, status = 'M'")
    assert(rowsOf(t) === Seq((1L, "M", 110.0), (2L, "B", 20.0),
      (3L, "M", 330.0), (4L, "B", 40.0), (5L, "C", 50.0)))
  }

  test("multiple matched clauses: first applicable wins, DELETE beside " +
    "UPDATE") {
    val t = mkTable()
    mkSource(spark, "gm_src2",
      Seq((1L, "x", 0.0), (2L, "x", 0.0), (3L, "x", 0.0)))
    // id 1 and 3 are 'A' → deleted by clause 1; id 2 falls to clause 2
    SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src2 s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND t.status = 'A' THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET status = 'M2'")
    assert(rowsOf(t) === Seq((2L, "M2", 20.0), (4L, "B", 40.0),
      (5L, "C", 50.0)))
  }

  test("conditional + non-star INSERT clauses (second clause catches " +
    "the rest); matched rows untouched without a matched clause") {
    val t = mkTable()
    mkSource(spark, "gm_src3",
      Seq((5L, "x", 0.0), (6L, "n", 60.0), (7L, "h", 700.0)))
    SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src3 s " +
      "ON t.id = s.id " +
      "WHEN NOT MATCHED AND s.price > 100.0 THEN " +
      "  INSERT (id, status, price) VALUES (s.id, 'HI', s.price / 10) " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(rowsOf(t) === Seq((1L, "A", 10.0), (2L, "B", 20.0),
      (3L, "A", 30.0), (4L, "B", 40.0), (5L, "C", 50.0),
      (6L, "n", 60.0), (7L, "HI", 70.0)))
  }

  test("NOT MATCHED BY SOURCE: conditional DELETE and UPDATE") {
    val t = mkTable()
    mkSource(spark, "gm_src4", Seq((1L, "x", 100.0), (2L, "x", 200.0)))
    // ids 3..5 are not matched by source: 'A' rows delete, rest flag
    SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src4 s " +
      "ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET price = s.price " +
      "WHEN NOT MATCHED BY SOURCE AND t.status = 'A' THEN DELETE " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'STALE'")
    assert(rowsOf(t) === Seq((1L, "A", 100.0), (2L, "B", 200.0),
      (4L, "STALE", 40.0), (5L, "STALE", 50.0)))
  }

  test("ANSI cardinality rule: two applicable source matches for one " +
    "target row fail loudly") {
    val t = mkTable()
    mkSource(spark, "gm_src5", Seq((1L, "d1", 1.0), (1L, "d2", 2.0)))
    val e = intercept[Exception] {
      SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src5 s " +
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET price = s.price")
    }
    assert(e.getMessage.contains("cardinality"))
    // duplicate matches where only ONE is applicable are fine
    SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src5 s " +
      "ON t.id = s.id WHEN MATCHED AND s.status = 'd2' THEN " +
      "UPDATE SET price = s.price")
    assert(rowsOf(t).head === ((1L, "A", 2.0)))
  }

  test("cross-side references in one-sided clauses throw") {
    val t = mkTable()
    mkSource(spark, "gm_src6", Seq((1L, "x", 1.0)))
    val e1 = intercept[Exception] {
      SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src6 s " +
        "ON t.id = s.id " +
        "WHEN NOT MATCHED BY SOURCE AND s.status = 'x' THEN DELETE")
    }
    assert(e1.getMessage.contains("TARGET"))
    val e2 = intercept[Exception] {
      SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src6 s " +
        "ON t.id = s.id " +
        "WHEN NOT MATCHED THEN INSERT (id, status, price) " +
        "VALUES (s.id, t.status, 0.0)")
    }
    assert(e2.getMessage.contains("SOURCE"))
  }

  test("general merge on a clustered table is file-granular: untouched " +
    "files carried by reference, and stays key-clustered") {
    val t = mkTable(clustered = true)
    val dir = dirOf(t)
    // spread the table over several key-ranged files first
    SnapshotTable.compact(spark, dir, 3)
    val before = SnapshotTable.filePaths(dir).toSet
    mkSource(spark, "gm_src7", Seq((1L, "x", 111.0)))
    // narrow-key conditional merge → only id=1's covering file rewrites
    SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src7 s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND s.price > t.price THEN UPDATE SET price = s.price")
    val after = SnapshotTable.filePaths(dir).toSet
    val carried = before.intersect(after)
    assert(carried.nonEmpty,
      s"expected untouched files carried by reference; before=$before after=$after")
    assert(rowsOf(t).head === ((1L, "A", 111.0)))
  }

  test("no-op general merge (no clause applies anywhere) commits " +
    "nothing") {
    val t = mkTable()
    val dir = dirOf(t)
    val v0 = SnapshotTable.latestVersion(dir)
    mkSource(spark, "gm_src8", Seq((1L, "x", 1.0)))
    SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src8 s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND t.status = 'ZZZ' THEN DELETE " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(SnapshotTable.latestVersion(dir) === v0)
    assert(rowsOf(t).size === 5)
  }

  test("one-sided clause scope disambiguates unqualified columns: " +
    "INSERT VALUES naming columns present on BOTH sides resolves to " +
    "the source (ANSI scope), not an ambiguity error") {
    val t = mkTable()
    mkSource(spark, "gm_src9", Seq((7L, "n", 70.0)))
    SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_src9 s " +
      "ON t.id = s.id " +
      "WHEN NOT MATCHED THEN INSERT (id, status, price) " +
      "VALUES (id, status, price)")
    assert(rowsOf(t).last === ((7L, "n", 70.0)))
  }

  test("marker-name collisions fail loudly instead of silently " +
    "clobbering (source column named `exists`)") {
    val t = mkTable()
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "exists").createOrReplaceTempView("gm_srcx")
    val e = intercept[Exception] {
      SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_srcx s " +
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET status = 'X'")
    }
    assert(e.getMessage.contains("marker"))
  }

  test("MERGE WITH SCHEMA EVOLUTION compensates the evolve commit when " +
    "the merge itself fails (r11 ADVICE atomicity)") {
    val t = mkTable()
    val before = SnapshotTable.schemaOf(dirOf(t)).fieldNames.toSeq
    // duplicate source keys -> ANSI cardinality violation AFTER the
    // evolve commit would have landed
    mkSource(spark, "src_ev_fail", Seq((1L, "X", 1.0), (1L, "Y", 2.0)))
    spark.sql("CREATE OR REPLACE TEMP VIEW src_ev_fail2 AS " +
      "SELECT id, status, price, price * 2 AS bonus FROM src_ev_fail")
    val e = intercept[Exception] {
      SnapshotSql.sql(spark,
        s"MERGE WITH SCHEMA EVOLUTION INTO graft.gm.$t t " +
          "USING src_ev_fail2 s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e.getMessage.toLowerCase.contains("cardinality") ||
      e.getMessage.toLowerCase.contains("more than one"),
      s"expected the cardinality violation, got: ${e.getMessage}")
    // the evolve commit was compensated: schema is back to pre-merge
    assert(SnapshotTable.schemaOf(dirOf(t)).fieldNames.toSeq === before,
      "a failed MERGE WITH SCHEMA EVOLUTION must not leave the schema " +
        "widened")
    // and the table still merges fine afterwards (fresh physical names)
    mkSource(spark, "src_ev_ok", Seq((1L, "Z", 9.0)))
    spark.sql("CREATE OR REPLACE TEMP VIEW src_ev_ok2 AS " +
      "SELECT id, status, price, price * 2 AS bonus FROM src_ev_ok")
    SnapshotSql.sql(spark,
      s"MERGE WITH SCHEMA EVOLUTION INTO graft.gm.$t t " +
        "USING src_ev_ok2 s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET *")
    val r = spark.sql(s"SELECT bonus FROM graft.gm.$t WHERE id = 1")
      .collect()
    assert(r.map(_.getDouble(0)).toSeq === Seq(18.0))
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns evolve the " +
    "target, star clauses carry them (parsed-plan route)") {
    val t = mkTable()
    import spark.implicits._
    // source carries `tag`, which the target lacks
    Seq((2L, "U", 200.0, "hot"), (9L, "N", 90.0, "new"))
      .toDF("id", "status", "price", "tag")
      .createOrReplaceTempView("gm_evo_src")
    // WITHOUT the clause the general path ignores the unknown column
    SnapshotSql.sql(spark, s"MERGE INTO graft.gm.$t t USING gm_evo_src s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND s.price > 100.0 THEN UPDATE SET *")
    assert(!spark.table(s"graft.gm.$t").columns.contains("tag"))
    // WITH the clause: one evolve commit + the merge; old rows null-fill
    SnapshotSql.sql(spark,
      s"MERGE WITH SCHEMA EVOLUTION INTO graft.gm.$t t " +
        "USING gm_evo_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED AND s.id > 8 THEN INSERT *")
    val rows = spark.sql(s"SELECT id, status, price, tag FROM graft.gm.$t " +
      "ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        Option(r.getString(3)))).toSeq
    assert(rows === Seq(
      (1L, "A", 10.0, None), (2L, "U", 200.0, Some("hot")),
      (3L, "A", 30.0, None), (4L, "B", 40.0, None),
      (5L, "C", 50.0, None), (9L, "N", 90.0, Some("new"))))
    // the evolve is its own metadata commit in the history
    assert(SnapshotTable.history(spark, dirOf(t)).collect()
      .map(_.getString(1)).contains("evolve"))
  }

  test("analyzer-rule route: plain spark.sql general MERGE on a " +
    "GraftExtensions session matches the parsed-plan route") {
    wh
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-gm")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new pystreamsspark.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      SnapshotSql.register(ext, wh)
      // the JVM-wide catalog instance pins its first-registered
      // warehouse per SESSION — build the fixture inside the ext
      // session so name resolution is self-contained
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.gm")
      val t = freshName("gmext_")
      ext.sql(s"CREATE TABLE graft.gm.$t (id BIGINT, status STRING, " +
        "price DOUBLE)")
      ext.sql(s"INSERT INTO graft.gm.$t VALUES " +
        "(1,'A',10.0),(2,'B',20.0),(3,'A',30.0),(4,'B',40.0),(5,'C',50.0)")
      import ext.implicits._
      Seq((2L, "x", 999.0), (9L, "n", 90.0))
        .toDF("id", "status", "price").createOrReplaceTempView("gm_ext_src")
      ext.sql(s"MERGE INTO graft.gm.$t t USING gm_ext_src s ON t.id = s.id " +
        "WHEN MATCHED AND s.price > 100.0 THEN UPDATE SET price = s.price " +
        "WHEN NOT MATCHED AND s.id > 8 THEN INSERT * " +
        "WHEN NOT MATCHED BY SOURCE AND t.status = 'C' THEN DELETE")
      val rows = ext.sql(s"SELECT id, status, price FROM graft.gm.$t " +
        "ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(rows === Seq((1L, "A", 10.0), (2L, "B", 999.0),
        (3L, "A", 30.0), (4L, "B", 40.0), (9L, "n", 90.0)))
      // MERGE WITH SCHEMA EVOLUTION through the rule route: the evolve
      // commit fires at command run time, then the star update carries
      // the new column
      Seq((2L, "E", 222.0, 7L))
        .toDF("id", "status", "price", "weight")
        .createOrReplaceTempView("gm_ext_evo_src")
      ext.sql(s"MERGE WITH SCHEMA EVOLUTION INTO graft.gm.$t t " +
        "USING gm_ext_evo_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET *")
      val evolved = ext.sql(s"SELECT id, weight FROM graft.gm.$t " +
        "ORDER BY id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(evolved.toSeq === Seq((1L, -1L), (2L, 7L), (3L, -1L),
        (4L, -1L), (9L, -1L)))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevActive.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
