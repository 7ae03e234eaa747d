package pystreamsspark.io

import org.apache.spark.sql.SparkSession
import pystreamsspark.SparkSpec

/** TIME-BASED retention (round-11): `VACUUM … RETAIN n HOURS` and
  * `EXPIRE SNAPSHOTS … [OLDER THAN n HOURS]` — retention expressed in
  * COMMIT TIME instead of version counts, on the recorded `ts` headers.
  * Laws (mirroring the RETAIN n VERSIONS suite):
  *  - versions older than the horizon are dropped, the latest ALWAYS
  *    survives (a table never vacuums itself unreadable);
  *  - expired versions are unreadable afterwards; kept ones read fine;
  *  - the carried epoch range-set and COPY ledger survive, so
  *    exactly-once and COPY idempotence outlive the expiry;
  *  - both SQL routes parse the statements (shared
  *    SnapshotMaintenance.parse: SnapshotSql.sql + the injected
  *    GraftSqlParser). */
class TimeRetentionSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ret_").toString

  private def commitTs(dir: String, v: Int): Long =
    SnapshotTable.history(spark, dir)
      .filter(s"version = $v").head.getAs[Long]("ts")

  test("vacuumRetain keeps versions inside the horizon plus the latest") {
    val dir = tmp()
    SnapshotTable.create(spark, dir, Seq((1L, 1.0)).toDF("id", "v")) // v1
    SnapshotTable.append(spark, dir, Seq((2L, 2.0)).toDF("id", "v")) // v2
    SnapshotTable.append(spark, dir, Seq((3L, 3.0)).toDF("id", "v")) // v3
    SnapshotTable.append(spark, dir, Seq((4L, 4.0)).toDF("id", "v")) // v4
    val now = commitTs(dir, 4) + 10
    // horizon at v3's commit: v3, v4 kept
    SnapshotTable.vacuumRetain(dir, now - commitTs(dir, 3), now)
    assert(SnapshotTable.existingVersions(dir) === Seq(3, 4))
    // kept versions read fine; expired ones are unreadable
    assert(SnapshotTable.read(spark, dir, Some(3)).count() === 3L)
    intercept[Exception] { SnapshotTable.read(spark, dir, Some(2)) }
    // zero horizon: only the latest survives — never zero versions
    SnapshotTable.vacuumRetain(dir, 0L, now + 1000000L)
    assert(SnapshotTable.existingVersions(dir) === Seq(4))
    assert(SnapshotTable.read(spark, dir).count() === 4L)
  }

  test("epoch range-set and COPY ledger survive time-based expiry") {
    val dir = tmp()
    SnapshotTable.create(spark, dir, Seq((1L, 1.0)).toDF("id", "v")) // v1
    SnapshotTable.appendEpoch(spark, dir,
      Seq((2L, 2.0)).toDF("id", "v"), epochId = 17L) // v2
    val staging = tmp()
    Seq((3L, 3.0)).toDF("id", "v").write.parquet(s"$staging/batch1")
    val (_, loaded) =
      SnapshotTable.copyInto(spark, dir, s"$staging/batch1") // v3
    assert(loaded === 1)
    SnapshotTable.append(spark, dir, Seq((4L, 4.0)).toDF("id", "v")) // v4
    // expire everything but the latest
    SnapshotTable.vacuumRetain(dir, 0L,
      System.currentTimeMillis + 1000000L)
    assert(SnapshotTable.existingVersions(dir) === Seq(4))
    // a replayed epoch is STILL recognized (carried range-set)
    val v = SnapshotTable.appendEpoch(spark, dir,
      Seq((99L, 99.0)).toDF("id", "v"), epochId = 17L)
    assert(v === 4, "replayed epoch must be skipped after expiry")
    // a re-run COPY of the same files loads nothing (carried ledger)
    val (_, reloaded) =
      SnapshotTable.copyInto(spark, dir, s"$staging/batch1")
    assert(reloaded === 0, "COPY idempotence must survive expiry")
    assert(SnapshotTable.read(spark, dir).count() === 4L)
  }

  test("SQL routes: VACUUM RETAIN n HOURS and EXPIRE SNAPSHOTS") {
    val wh = tmp()
    SnapshotSql.register(spark, wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ret")
    val t = "t_" + java.util.UUID.randomUUID().toString.take(8)
    spark.sql(s"CREATE TABLE graft.ret.$t (id BIGINT, v DOUBLE)")
    SnapshotSql.sql(spark, s"INSERT INTO graft.ret.$t VALUES (1, 1.0)")
    SnapshotSql.sql(spark, s"INSERT INTO graft.ret.$t VALUES (2, 2.0)")
    SnapshotSql.sql(spark, s"INSERT INTO graft.ret.$t VALUES (3, 3.0)")
    // a huge horizon keeps everything
    assert(SnapshotSql.sql(spark,
      s"VACUUM graft.ret.$t RETAIN 1000 HOURS").head.getInt(0) === 4)
    // EXPIRE SNAPSHOTS with a zero horizon keeps only the latest
    assert(SnapshotSql.sql(spark,
      s"EXPIRE SNAPSHOTS graft.ret.$t OLDER THAN 0 HOURS")
      .head.getInt(0) === 1)
    assert(spark.sql(s"SELECT count(*) FROM graft.ret.$t")
      .head.getLong(0) === 3L)
    // the version-count form still parses beside the hours form
    assert(SnapshotSql.sql(spark,
      s"VACUUM graft.ret.$t RETAIN 5 VERSIONS").head.getInt(0) === 1)
  }

  test("injected-parser route (GraftExtensions session) parses the " +
    "hours forms") {
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-ret")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new pystreamsspark.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      val wh = tmp()
      SnapshotSql.register(ext, wh)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ret")
      val t = "t_" + java.util.UUID.randomUUID().toString.take(8)
      ext.sql(s"CREATE TABLE graft.ret.$t (id BIGINT)")
      ext.sql(s"INSERT INTO graft.ret.$t VALUES (1)")
      ext.sql(s"INSERT INTO graft.ret.$t VALUES (2)")
      // plain ext.sql — the INJECTED parser recognizes the statement
      assert(ext.sql(s"VACUUM graft.ret.$t RETAIN 1000 HOURS")
        .head.getInt(0) === 3)
      assert(ext.sql(s"EXPIRE SNAPSHOTS graft.ret.$t OLDER THAN 0 HOURS")
        .head.getInt(0) === 1)
      assert(ext.sql(s"SELECT count(*) FROM graft.ret.$t")
        .head.getLong(0) === 2L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevActive.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
