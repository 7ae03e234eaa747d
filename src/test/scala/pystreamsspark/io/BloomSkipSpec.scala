package pystreamsspark.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import pystreamsspark.SparkSpec

/** Per-file BLOOM FILTERS (round-11): point-predicate file skipping for
  * NON-cluster columns — min/max stats cannot prune a round-robin id
  * column (every file spans the full range), so a `bloomcols` table
  * declaration records one small blob per (file, column) at the shared
  * batch-write funnel and the point readers consult it before opening
  * files. Laws:
  *  - NO FALSE NEGATIVES: every file actually holding a probe value
  *    stays a candidate, and the pruned read equals the full filter;
  *  - real skipping on a needle-in-haystack lookup (each key lives in
  *    one of many round-robin files);
  *  - files written BEFORE the property (or before a SET TBLPROPERTIES
  *    arming) carry no blob and are never pruned — conservative;
  *  - the property carries through later commits and composes with
  *    cluster stats (bloom on one column, stats on another);
  *  - SQL CREATE TABLE TBLPROPERTIES route works.
  */
class BloomSkipSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bloom_").toString

  /** 0..n-1 ids round-robined into `files` files, bloom on id. */
  private def fixture(n: Int, files: Int): String = {
    val dir = tmp()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    SnapshotTable.createEmpty(dir, schema, bloomCols = Seq("id"))
    SnapshotTable.append(spark, dir,
      spark.range(0, n).toDF("id").withColumn("v", col("id") * 2.0),
      numFiles = files)
    dir
  }

  test("needle lookups skip files; no false negatives; result exact") {
    val dir = fixture(20000, 16)
    val all = SnapshotTable.filePaths(dir).size
    assert(all === 16)
    val probes = Seq("17", "4242", "19999")
    val cand = SnapshotTable.readCandidatesIn(dir, "id", probes)
    assert(cand.size < all, s"bloom pruned nothing: ${cand.size} of $all")
    // no false negatives: the pruned candidate set covers every file
    // that truly holds a probe value
    val truth = spark.read.parquet(SnapshotTable.filePaths(dir): _*)
      .filter(col("id").isin(probes.map(_.toLong): _*))
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(truth.forall(uri => cand.exists(rel => uri.endsWith(rel))),
      "bloom pruning dropped a file that holds a probe value")
    // the pruned read is value-exact
    val got = SnapshotTable.readWhereIn(spark, dir, "id", probes)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === probes.map(_.toLong).sorted.map(k => (k, k * 2.0)))
    // an absent value prunes (near) everything and reads empty
    val none = SnapshotTable.readCandidatesIn(dir, "id", Seq("999999"))
    assert(none.size < all)
    assert(SnapshotTable.readWhereIn(spark, dir, "id", Seq("999999"))
      .count() === 0L)
  }

  test("equality bounds in readWhere consult the bloom; ranges do not") {
    val dir = fixture(20000, 16)
    val all = SnapshotTable.filePaths(dir).size
    // a point bound (lo == hi) on the bloom column prunes
    val eq = SnapshotTable.readWhere(spark, dir, Map("id" -> ("4242", "4242")))
    assert(eq.collect().map(_.getLong(0)).toSeq === Seq(4242L))
    // the observable skip: candidates for the point set are < all files
    assert(SnapshotTable.readCandidatesIn(dir, "id", Seq("4242")).size < all)
    // a genuine range keeps every file (bloom is equality-only) but
    // still answers exactly
    assert(SnapshotTable.readWhere(spark, dir, Map("id" -> ("10", "14")))
      .count() === 5L)
  }

  test("review fixes: widening a bloom column refuses (hash would " +
    "change); a rename carries the declaration AND the blobs") {
    val dir = fixture(2000, 4)
    // int64 blobs would no longer match int32->int64-widened probes…
    // (our fixture is already long; build an INT-keyed table)
    val idir = tmp()
    SnapshotTable.createEmpty(idir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))),
      bloomCols = Seq("k"))
    SnapshotTable.append(spark, idir,
      spark.range(0, 100).selectExpr("CAST(id AS INT) k",
        "CAST(id AS DOUBLE) v"),
      numFiles = 2)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.widenColumn(idir, "k",
        org.apache.spark.sql.types.LongType)
    }
    assert(e.getMessage.contains("bloom"))
    // rename: bloomcols header, per-file blobs and pruning all follow
    SnapshotTable.renameColumn(dir, "id", "key")
    val all = SnapshotTable.filePaths(dir).size
    assert(SnapshotTable.readCandidatesIn(dir, "key", Seq("42")).size < all,
      "bloom pruning must survive the rename")
    assert(SnapshotTable.readWhereIn(spark, dir, "key", Seq("42"))
      .count() === 1L)
    // post-rename appends keep recording blobs under the new name
    SnapshotTable.append(spark, dir,
      spark.range(50000, 52000).toDF("key")
        .withColumn("v", org.apache.spark.sql.functions.lit(1.0)),
      numFiles = 4)
    assert(SnapshotTable.readCandidatesIn(dir, "key", Seq("50005")).size <
      SnapshotTable.filePaths(dir).size)
  }

  test("SET TBLPROPERTIES arms blobs for future batches only; " +
    "pre-arming files never prune away") {
    val dir = tmp()
    SnapshotTable.create(spark, dir,
      spark.range(0, 1000).toDF("id").withColumn("v", lit(1.0)),
      numFiles = 4)
    SnapshotTable.setProperties(spark, dir, Map("bloomcols" -> "id"))
    SnapshotTable.append(spark, dir,
      spark.range(1000, 2000).toDF("id").withColumn("v", lit(2.0)),
      numFiles = 4)
    val all = SnapshotTable.filePaths(dir).size
    assert(all === 8)
    // a probe in the NEW range: the 4 un-bloomed files always stay,
    // most of the 4 bloomed ones drop
    val cand = SnapshotTable.readCandidatesIn(dir, "id", Seq("1500"))
    assert(cand.size >= 4 && cand.size < all)
    assert(SnapshotTable.readWhereIn(spark, dir, "id", Seq("1500"))
      .count() === 1L)
    // a probe in the OLD range keeps all old files (no blobs there)
    assert(SnapshotTable.readWhereIn(spark, dir, "id", Seq("500"))
      .count() === 1L)
  }

  test("bloom composes with cluster stats and survives later commits; " +
    "SQL TBLPROPERTIES route") {
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    val wh = tmp()
    SnapshotSql.register(spark, wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bl")
    val t = "t_" + java.util.UUID.randomUUID().toString.take(8)
    spark.sql(s"CREATE TABLE graft.bl.$t (k BIGINT, fk BIGINT, v DOUBLE) " +
      "TBLPROPERTIES('clustercols'='k','bloomcols'='fk')")
    val dir = SnapshotSql.resolveTable(spark, Seq("graft", "bl", t))
      .getOrElse(fail(s"graft.bl.$t did not resolve"))
    spark.range(0, 10000).toDF("k")
      // fk deliberately NOT correlated with k: stats on fk would never
      // prune; the bloom is the only skipping path
      .withColumn("fk", pmod(col("k") * 2654435761L, lit(10000L)))
      .withColumn("v", col("k") * 1.0)
      .createOrReplaceTempView("bloom_src")
    SnapshotSql.sql(spark, s"INSERT INTO graft.bl.$t " +
      "SELECT * FROM bloom_src")
    SnapshotSql.sql(spark, s"INSERT INTO graft.bl.$t " +
      "SELECT k + 10000, fk, v FROM bloom_src")
    val all = SnapshotTable.filePaths(dir).size
    val probe = Seq("4242")
    assert(SnapshotTable.readCandidatesIn(dir, "fk", probe).size < all,
      "bloom must skip files for a point fk probe")
    // exact vs the full filter
    val expect = SnapshotTable.read(spark, dir)
      .filter(col("fk") === 4242L).count()
    assert(SnapshotTable.readWhereIn(spark, dir, "fk", probe)
      .count() === expect)
    // SHOW TBLPROPERTIES surfaces the declaration
    val props = spark.sql(s"SHOW TBLPROPERTIES graft.bl.$t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("bloomcols").contains("fk"))
    prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }
}
