package pystreamsspark.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import pystreamsspark.SparkSpec

/** COLUMN MAPPING (round-11): RENAME/DROP COLUMN and safe type
  * widening as METADATA-ONLY commits on [[SnapshotTable]] — the
  * field-id idea carried by stable PHYSICAL file-column names (public
  * design space of Delta column mapping / Iceberg field ids; original
  * implementation). Laws proven here:
  *  - rename touches no data file; old and new files read through the
  *    mapping; appends after the rename keep working;
  *  - STATS PRUNING SURVIVES renaming a cluster column (the verdict's
  *    named done-criterion);
  *  - drop retires the physical name: re-adding the same logical name
  *    binds to a fresh physical column, so dropped values can NEVER
  *    resurrect;
  *  - widening int→long / float→double is one metadata commit; the
  *    parquet reader promotes old pages natively; refusals for lossy
  *    changes and for bucket columns;
  *  - merge/DML machinery composes with the mapping (reads project,
  *    writes rename — one shared funnel);
  *  - compact() MATERIALIZES the mapping away (plain V2 scans resume);
  *  - SQL routes: ALTER TABLE … RENAME/DROP/ALTER COLUMN through the
  *    catalog, SELECT through the extensions rewrite, loud refusal on
  *    plain sessions.
  */
class ColumnMappingSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cmap_").toString

  import spark.implicits._

  test("rename is metadata-only; old+new files read through the mapping") {
    val dir = tmp()
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "tag", "value")
    SnapshotTable.create(spark, dir, df, numFiles = 1)
    val preFiles = SnapshotTable.filePaths(dir).toSet
    SnapshotTable.renameColumn(dir, "value", "amount")
    assert(SnapshotTable.filePaths(dir).toSet === preFiles,
      "rename must not touch data files")
    assert(SnapshotTable.hasColumnMapping(dir))
    assert(SnapshotTable.mayHaveColumnMapping(dir))
    assert(SnapshotTable.schemaOf(dir).fieldNames.toSeq ===
      Seq("id", "tag", "amount"))
    // old files project through the mapping
    val r1 = SnapshotTable.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(r1.toSeq === Seq((1L, "a", 10.0), (2L, "b", 20.0)))
    // appends speak the NEW logical name and land as physical
    SnapshotTable.append(spark, dir,
      Seq((3L, "c", 30.0)).toDF("id", "tag", "amount"))
    val r2 = SnapshotTable.read(spark, dir).orderBy("id")
      .select(sum(col("amount"))).head.getDouble(0)
    assert(r2 === 60.0)
    // time travel to the pre-rename version sees the OLD name
    assert(SnapshotTable.read(spark, dir, versionAsOf = Some(1))
      .columns.toSeq === Seq("id", "tag", "value"))
  }

  test("stats pruning survives renaming a CLUSTER column") {
    val dir = tmp()
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") * 2.0)
      .repartitionByRange(4, col("id"))
    SnapshotTable.createClustered(spark, dir, df, Seq("id"))
    val all = SnapshotTable.filePaths(dir).size
    assert(SnapshotTable.readCandidates(dir, "id", "0", "10").size < all)
    SnapshotTable.renameColumn(dir, "id", "key")
    // statscols header AND per-file stats keys renamed with the column
    assert(SnapshotTable.statsColsOfPublic(dir) === Seq("key"))
    val pruned = SnapshotTable.readCandidates(dir, "key", "0", "10")
    assert(pruned.size < all, "pruning must survive the rename")
    // pruned READ equals the filtered full read
    val got = SnapshotTable.readWhere(spark, dir, Map("key" -> ("0", "10")))
      .orderBy("key").select("key").as[Long].collect().toSeq
    assert(got === (0L to 10L))
    // the old name is gone — bounds on it fail loudly
    intercept[IllegalArgumentException] {
      SnapshotTable.readCandidates(dir, "id", "0", "10")
    }
    // a post-rename append still records stats under the new name and
    // a narrow merge still prunes
    SnapshotTable.append(spark, dir,
      Seq((2000L, 1.0)).toDF("key", "v"), numFiles = 1)
    val cand = SnapshotTable.discoveryCandidates(spark, dir,
      Seq((2000L, 9.0)).toDF("key", "v"), Seq("key"))
    assert(cand.size < SnapshotTable.filePaths(dir).size)
    SnapshotTable.merge(spark, dir, Seq((2000L, 9.0)).toDF("key", "v"),
      Seq("key"))
    assert(SnapshotTable.read(spark, dir).filter(col("key") === 2000L)
      .head.getDouble(1) === 9.0)
  }

  test("drop retires the physical name; re-add cannot resurrect values") {
    val dir = tmp()
    SnapshotTable.create(spark, dir,
      Seq((1L, "x", 5.0), (2L, "y", 6.0)).toDF("id", "tag", "score"),
      numFiles = 1)
    val preFiles = SnapshotTable.filePaths(dir).toSet
    SnapshotTable.dropColumn(dir, "score")
    assert(SnapshotTable.filePaths(dir).toSet === preFiles)
    assert(SnapshotTable.schemaOf(dir).fieldNames.toSeq === Seq("id", "tag"))
    assert(SnapshotTable.read(spark, dir).columns.toSeq === Seq("id", "tag"))
    // re-add the same logical name: binds to a FRESH physical column —
    // the old file bytes must NOT come back
    SnapshotTable.evolveSchema(dir,
      StructType(Seq(StructField("score", DoubleType))))
    val rows = SnapshotTable.read(spark, dir).orderBy("id").collect()
    assert(rows.forall(_.isNullAt(2)),
      s"dropped values resurrected: ${rows.mkString(",")}")
    // new appends fill the new column; old rows stay null
    SnapshotTable.append(spark, dir,
      Seq((3L, "z", 9.0)).toDF("id", "tag", "score"), numFiles = 1)
    val byId = SnapshotTable.read(spark, dir).orderBy("id").collect()
    assert(byId.count(_.isNullAt(2)) === 2 && byId.last.getDouble(2) === 9.0)
    // an implicit (append-side) evolution of a retired name refuses
    val e = intercept[Exception] {
      SnapshotTable.dropColumn(dir, "score")
      SnapshotTable.append(spark, dir,
        Seq((4L, "w", 1.0)).toDF("id", "tag", "score"), numFiles = 1)
    }
    assert(e.getMessage.contains("retired"),
      s"expected the retired-name refusal, got: ${e.getMessage}")
  }

  test("widening int->long / float->double is metadata-only; refusals") {
    val dir = tmp()
    SnapshotTable.create(spark, dir,
      Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f"), numFiles = 1)
    val preFiles = SnapshotTable.filePaths(dir).toSet
    SnapshotTable.widenColumn(dir, "i", LongType)
    SnapshotTable.widenColumn(dir, "f", DoubleType)
    assert(SnapshotTable.filePaths(dir).toSet === preFiles)
    val sch = SnapshotTable.schemaOf(dir)
    assert(sch("i").dataType === LongType && sch("f").dataType === DoubleType)
    // old (narrow) pages read through the widened schema natively
    val r = SnapshotTable.read(spark, dir).orderBy("i").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(r.map(_.getDouble(1)).toSeq === Seq(1.5, 2.5))
    // appends beyond the old range work
    SnapshotTable.append(spark, dir,
      Seq((1L << 40, 3.5)).toDF("i", "f"), numFiles = 1)
    assert(SnapshotTable.read(spark, dir).agg(max(col("i")))
      .head.getLong(0) === (1L << 40))
    // lossy / nonsense changes refuse
    intercept[IllegalArgumentException] {
      SnapshotTable.widenColumn(dir, "i", IntegerType)
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.widenColumn(dir, "f", StringType)
    }
    // bucket columns refuse (int32/int64 hash differently)
    val bdir = tmp()
    SnapshotTable.createEmpty(bdir,
      StructType(Seq(StructField("k", IntegerType),
        StructField("v", DoubleType))), bucketSpec = Some(("k", 4)))
    intercept[IllegalArgumentException] {
      SnapshotTable.widenColumn(bdir, "k", LongType)
    }
  }

  test("float->double widening of a CLUSTER column strips its stats " +
    "(narrow renders understate promoted doubles) until a compact") {
    val dir = tmp()
    val df = spark.range(0, 100).selectExpr("CAST(id AS FLOAT) AS p",
      "id AS x").repartitionByRange(4, col("p"))
    SnapshotTable.createClustered(spark, dir, df, Seq("p"))
    assert(SnapshotTable.readCandidates(dir, "p", "0", "10").size < 4)
    SnapshotTable.widenColumn(dir, "p", DoubleType)
    // stats stripped -> every file a candidate (conservative-correct)
    assert(SnapshotTable.readCandidates(dir, "p", "0", "10").size === 4)
    // …and the filtered read is still exact
    assert(SnapshotTable.readWhere(spark, dir, Map("p" -> ("0", "10")))
      .count() === 11L)
    // a compact re-records stats at double precision; pruning resumes
    SnapshotTable.compact(spark, dir, target = 4)
    assert(SnapshotTable.readCandidates(dir, "p", "0", "10").size < 4)
  }

  test("refusals: rename collisions, layout columns, CHECK references") {
    val dir = tmp()
    SnapshotTable.createClustered(spark, dir,
      Seq((1L, "a", 2.0)).toDF("id", "tag", "v"), Seq("id"))
    intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(dir, "tag", "v") // exists
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(dir, "id") // cluster column
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(dir, "missing", "x")
    }
    SnapshotTable.setProperties(spark, dir, Map("check" -> "v > 0"))
    intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(dir, "v", "w") // CHECK-referenced
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(dir, "v") // CHECK-referenced
    }
    // dropping the constraint un-blocks the rename
    SnapshotTable.setProperties(spark, dir, Map("check" -> "true"))
    SnapshotTable.renameColumn(dir, "v", "w")
    assert(SnapshotTable.schemaOf(dir).fieldNames.contains("w"))
  }

  test("rename composes with deletion vectors and generalMerge") {
    val dir = tmp()
    SnapshotTable.create(spark, dir,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "value"),
      numFiles = 1)
    SnapshotTable.renameColumn(dir, "value", "amount")
    // MoR delete on the mapped table: the tagged/DV-aware reader and
    // the mapping projection compose in one entry reader
    SnapshotTable.deleteVectors(spark, dir, "amount = 20.0")
    assert(SnapshotTable.read(spark, dir).orderBy("id")
      .select("id").as[Long].collect().toSeq === Seq(1L, 3L))
    // generalMerge with a renamed target column (case-variant SET key
    // exercises the r11 assignment normalization too)
    SnapshotTable.generalMerge(spark, dir,
      Seq((3L, 99.0)).toDF("id", "amount"), Seq("id"),
      "id = _s_id",
      matched = Seq(SnapshotTable.MergeClause("update", None,
        Seq("AMOUNT" -> "_s_amount"))),
      notMatched = Seq(SnapshotTable.MergeClause("insert", None)),
      notMatchedBySource = Nil)
    val got = SnapshotTable.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((1L, 10.0), (3L, 99.0)))
    // and a typo'd SET key fails loudly (the ADVICE medium, proven on
    // the mapped table)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.generalMerge(spark, dir,
        Seq((1L, 0.0)).toDF("id", "amount"), Seq("id"), "id = _s_id",
        matched = Seq(SnapshotTable.MergeClause("update", None,
          Seq("amout" -> "_s_amount"))),
        notMatched = Nil, notMatchedBySource = Nil)
    }
    assert(e.getMessage.contains("unknown column"))
  }

  test("compact materializes the mapping away") {
    val dir = tmp()
    SnapshotTable.create(spark, dir,
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "value"), numFiles = 2)
    SnapshotTable.renameColumn(dir, "value", "amount")
    assert(SnapshotTable.hasColumnMapping(dir))
    SnapshotTable.compact(spark, dir, target = 1)
    assert(!SnapshotTable.hasColumnMapping(dir),
      "compact must materialize renames into plain files")
    val r = SnapshotTable.read(spark, dir).orderBy("id").collect()
    assert(r.map(x => (x.getLong(0), x.getDouble(1))).toSeq ===
      Seq((1L, 1.0), (2L, 2.0)))
    // the written files now store the logical name directly
    val raw = spark.read.parquet(SnapshotTable.filePaths(dir): _*)
    assert(raw.columns.toSeq === Seq("id", "amount"))
    // old snapshots keep their own mapping (still readable)
    assert(SnapshotTable.read(spark, dir, versionAsOf = Some(2))
      .columns.contains("amount"))
  }

  test("SQL: ALTER RENAME/DROP/WIDEN through the catalog; ext SELECT " +
    "rewrite; plain-session scan refusal") {
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-cmap")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new pystreamsspark.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      val wh = tmp()
      SnapshotSql.register(ext, wh)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.cm")
      val t = "t_" + java.util.UUID.randomUUID().toString.take(8)
      ext.sql(s"CREATE TABLE graft.cm.$t (id INT, status STRING, " +
        "price DOUBLE)")
      SnapshotSql.sql(ext, s"INSERT INTO graft.cm.$t VALUES " +
        "(1,'A',10.0),(2,'B',20.0)")
      ext.sql(s"ALTER TABLE graft.cm.$t RENAME COLUMN price TO amount")
      ext.sql(s"ALTER TABLE graft.cm.$t ALTER COLUMN id TYPE BIGINT")
      // plain ext.sql SELECT takes the mapped-read rewrite
      val rows = ext.sql(s"SELECT id, status, amount FROM graft.cm.$t " +
        "ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(rows.toSeq === Seq((1L, "A", 10.0), (2L, "B", 20.0)))
      // filters/aggregates compose above the swapped-in plan
      assert(ext.sql(s"SELECT sum(amount) FROM graft.cm.$t " +
        "WHERE id = 2").head.getDouble(0) === 20.0)
      // DROP COLUMN + DESCRIBE
      ext.sql(s"ALTER TABLE graft.cm.$t DROP COLUMN status")
      assert(ext.sql(s"SELECT * FROM graft.cm.$t").columns.toSeq ===
        Seq("id", "amount"))
      // DML through the rule route on the mapped table
      ext.sql(s"UPDATE graft.cm.$t SET amount = amount + 1 WHERE id = 1")
      assert(ext.sql(s"SELECT amount FROM graft.cm.$t WHERE id = 1")
        .head.getDouble(0) === 11.0)
      // WITHOUT the extensions rewrite, the raw V2 scan refuses the
      // mapped snapshot loudly (the DV refusal law, extended)
      val dir = SnapshotSql.resolveTable(ext, Seq("graft", "cm", t)).get
      val noOpts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())
      val err = intercept[UnsupportedOperationException] {
        new SnapshotV2Table("graft.cm." + t, dir, None)
          .newScanBuilder(noOpts)
      }
      assert(err.getMessage.contains("column mapping"),
        s"expected the mapped-scan refusal, got: ${err.getMessage}")
      // OPTIMIZE materializes; the raw scan builds again
      SnapshotSql.sql(ext, s"OPTIMIZE graft.cm.$t")
      assert(!SnapshotTable.hasColumnMapping(dir))
      new SnapshotV2Table("graft.cm." + t, dir, None).newScanBuilder(noOpts)
      assert(ext.sql(s"SELECT count(*) FROM graft.cm.$t")
        .head.getLong(0) === 2L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevActive.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
