package pystreamsspark.io

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** ANSI column DEFAULT values on snapshot tables (round-11): the
  * two-marker law Spark itself uses — EXISTS_DEFAULT (frozen at ADD
  * COLUMNS) fills pre-ADD files NATIVELY at read through the manifest
  * schema's field metadata; CURRENT_DEFAULT (movable via ALTER COLUMN
  * SET DEFAULT) is MATERIALIZED by writes that omit the column, so a
  * later SET DEFAULT never re-interprets existing rows. Laws:
  *  - ADD COLUMNS … DEFAULT e: pre-ADD rows read e, zero files touched;
  *  - INSERT omitting the column materializes the CURRENT default;
  *    an explicit NULL stays NULL;
  *  - SET DEFAULT affects only FUTURE omitting writes; DROP DEFAULT
  *    reverts to NULL fill;
  *  - CREATE TABLE (… DEFAULT e) works through the catalog capability;
  *  - MERGE INSERT clauses that do not assign the column take its
  *    default. */
class DefaultValueSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_def_").toString

  private lazy val wh = {
    val d = tmp()
    SnapshotSql.register(spark, d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    d
  }

  private def fresh(): String =
    "t_" + java.util.UUID.randomUUID().toString.take(8)

  test("ADD COLUMNS DEFAULT: pre-ADD rows read the default metadata-" +
    "only; omitting inserts materialize it; explicit NULL stays") {
    wh
    val t = fresh()
    spark.sql(s"CREATE TABLE graft.dv.$t (id BIGINT, v DOUBLE)")
    SnapshotSql.sql(spark,
      s"INSERT INTO graft.dv.$t VALUES (1, 1.0), (2, 2.0)")
    val dir = SnapshotSql.resolveTable(spark, Seq("graft", "dv", t)).get
    val preFiles = SnapshotTable.filePaths(dir).toSet
    spark.sql(s"ALTER TABLE graft.dv.$t ADD COLUMNS (qty INT DEFAULT 42)")
    assert(SnapshotTable.filePaths(dir).toSet === preFiles,
      "ADD COLUMNS DEFAULT must be metadata-only")
    // pre-ADD rows read 42 (native EXISTS_DEFAULT fill), no rewrite
    val pre = spark.sql(s"SELECT id, qty FROM graft.dv.$t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(pre.toSeq === Seq((1L, 42), (2L, 42)))
    // an INSERT omitting the column materializes the default
    SnapshotSql.sql(spark,
      s"INSERT INTO graft.dv.$t (id, v) VALUES (3, 3.0)")
    // an explicit NULL stays NULL
    SnapshotSql.sql(spark,
      s"INSERT INTO graft.dv.$t VALUES (4, 4.0, NULL)")
    val rows = spark.sql(s"SELECT id, qty FROM graft.dv.$t ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(rows.toSeq === Seq((1L, 42), (2L, 42), (3L, 42), (4L, -1)))
  }

  test("SET DEFAULT moves only future omitting writes; DROP DEFAULT " +
    "reverts to NULL fill") {
    wh
    val t = fresh()
    spark.sql(s"CREATE TABLE graft.dv.$t (id BIGINT)")
    SnapshotSql.sql(spark, s"INSERT INTO graft.dv.$t VALUES (1)")
    spark.sql(s"ALTER TABLE graft.dv.$t ADD COLUMNS (qty INT DEFAULT 3)")
    SnapshotSql.sql(spark, s"INSERT INTO graft.dv.$t (id) VALUES (2)")
    spark.sql(s"ALTER TABLE graft.dv.$t ALTER COLUMN qty SET DEFAULT 7")
    SnapshotSql.sql(spark, s"INSERT INTO graft.dv.$t (id) VALUES (3)")
    spark.sql(s"ALTER TABLE graft.dv.$t ALTER COLUMN qty DROP DEFAULT")
    SnapshotSql.sql(spark, s"INSERT INTO graft.dv.$t (id) VALUES (4)")
    val rows = spark.sql(s"SELECT id, qty FROM graft.dv.$t ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1)))
    // id=1: pre-ADD file, frozen EXISTS fill 3; id=2: materialized 3;
    // id=3: materialized 7; id=4: default dropped -> NULL
    assert(rows.toSeq === Seq((1L, 3), (2L, 3), (3L, 7), (4L, -1)))
  }

  test("CREATE TABLE with a DEFAULT column (catalog capability); " +
    "MERGE INSERT takes the default for unassigned columns") {
    wh
    val t = fresh()
    spark.sql(s"CREATE TABLE graft.dv.$t (id BIGINT, status STRING, " +
      "prio INT DEFAULT 5)")
    SnapshotSql.sql(spark,
      s"INSERT INTO graft.dv.$t (id, status) VALUES (1, 'A')")
    import spark.implicits._
    Seq((1L, "U"), (9L, "N")).toDF("id", "status")
      .createOrReplaceTempView("def_merge_src")
    // conditional clause forces the general executor; the INSERT leg
    // assigns only (id, status) -> prio takes its declared default
    SnapshotSql.sql(spark, s"MERGE INTO graft.dv.$t t USING def_merge_src s " +
      "ON t.id = s.id " +
      "WHEN MATCHED AND s.status = 'U' THEN UPDATE SET status = s.status " +
      "WHEN NOT MATCHED THEN INSERT (id, status) VALUES (s.id, s.status)")
    val rows = spark.sql(s"SELECT id, status, prio FROM graft.dv.$t " +
      "ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(rows.toSeq === Seq((1L, "U", 5), (9L, "N", 5)))
  }

  test("EXISTS_DEFAULT freezes to a folded literal at ADD time " +
    "(a raw current_date() would drift per read)") {
    wh
    val t = fresh()
    spark.sql(s"CREATE TABLE graft.dv.$t (id BIGINT)")
    SnapshotSql.sql(spark, s"INSERT INTO graft.dv.$t VALUES (1)")
    spark.sql(s"ALTER TABLE graft.dv.$t ADD COLUMNS " +
      "(d DATE DEFAULT current_date())")
    val dir = SnapshotSql.resolveTable(spark, Seq("graft", "dv", t)).get
    val f = SnapshotTable.schemaOf(dir).fields.find(_.name == "d").get
    // CURRENT keeps the raw expression (re-evaluated per write),
    // EXISTS froze to a DATE literal at ADD time
    assert(f.metadata.getString("CURRENT_DEFAULT")
      .toLowerCase.contains("current_date"))
    assert(f.metadata.getString("EXISTS_DEFAULT").startsWith("DATE '"),
      s"EXISTS_DEFAULT not folded: ${f.metadata.getString("EXISTS_DEFAULT")}")
    assert(!spark.sql(s"SELECT d FROM graft.dv.$t").head.isNullAt(0))
  }

  test("programmatic setColumnDefault laws: parse-time validation, " +
    "history op, read-back through SnapshotTable.read") {
    import spark.implicits._
    val dir = tmp()
    SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "tag"))
    SnapshotTable.evolveSchema(dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType, nullable = true,
          metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .putString("CURRENT_DEFAULT", "1.5")
            .putString("EXISTS_DEFAULT", "1.5").build()))))
    assert(SnapshotTable.read(spark, dir).select("score")
      .head.getDouble(0) === 1.5)
    intercept[Exception] {
      SnapshotTable.setColumnDefault(spark, dir, "score",
        Some("not a ( valid"))
    }
    // resolution/castability is validated too, not just parsing
    intercept[Exception] {
      SnapshotTable.setColumnDefault(spark, dir, "score",
        Some("no_such_column + 1"))
    }
    SnapshotTable.setColumnDefault(spark, dir, "score", Some("2.5"))
    SnapshotTable.append(spark, dir, Seq((2L, "b")).toDF("id", "tag"))
    val rows = SnapshotTable.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // id=1 pre-ADD file: frozen EXISTS fill 1.5; id=2 appended
    // PROGRAMMATICALLY omitting the column after SET DEFAULT: the
    // shared batch funnel materializes the CURRENT default (2.5) —
    // every write path, not just SQL INSERT
    assert(rows.toSeq === Seq((1L, 1.5), (2L, 2.5)))
    assert(SnapshotTable.history(spark, dir).collect()
      .map(_.getString(1)).contains("setdefault"))
  }
}
