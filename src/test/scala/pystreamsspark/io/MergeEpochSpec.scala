package pystreamsspark.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** Exactly-once STREAMING UPSERT (round-10 cont.):
  * [[SnapshotTable.mergeEpoch]] — the epoch-guarded merge that makes
  * `writeStream.foreachBatch` upserts idempotent across micro-batch
  * replays. The epoch commits in the SAME manifest as the merged files
  * under the carried range-set, so a replay is a version-stable no-op;
  * foreign commits interleave via rebase. */
class MergeEpochSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_me_").toString

  private def rowsOf(dir: String): Seq[(Long, String, Double)] =
    SnapshotTable.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "status", "price")
  }

  test("mergeEpoch applies once: a replayed epoch is a version-stable " +
    "no-op, a new epoch merges normally") {
    val dir = freshDir()
    SnapshotTable.create(spark, dir, df((1L, "A", 1.0), (2L, "B", 2.0)))
    val v1 = SnapshotTable.mergeEpoch(spark, dir,
      df((2L, "U", 20.0), (3L, "N", 3.0)), Seq("id"), epochId = 0L)
    assert(rowsOf(dir) === Seq((1L, "A", 1.0), (2L, "U", 20.0),
      (3L, "N", 3.0)))
    // replay of epoch 0 (restart / speculative re-run): NO new version,
    // even with different (stale) content — the epoch is the identity
    val vReplay = SnapshotTable.mergeEpoch(spark, dir,
      df((2L, "stale", 999.0)), Seq("id"), epochId = 0L)
    assert(vReplay === v1)
    assert(SnapshotTable.latestVersion(dir) === v1)
    assert(rowsOf(dir)(1) === ((2L, "U", 20.0)))
    // the next epoch lands
    val v2 = SnapshotTable.mergeEpoch(spark, dir,
      df((1L, "U2", 10.0)), Seq("id"), epochId = 1L)
    assert(v2 === v1 + 1)
    assert(rowsOf(dir).head === ((1L, "U2", 10.0)))
  }

  test("foreign commits interleave: mergeEpoch rebases past an append " +
    "and still applies exactly once") {
    val dir = freshDir()
    SnapshotTable.create(spark, dir, df((1L, "A", 1.0)))
    SnapshotTable.mergeEpoch(spark, dir, df((2L, "N", 2.0)), Seq("id"), 0L)
    // a foreign append between epochs
    SnapshotTable.append(spark, dir, df((5L, "X", 5.0)))
    SnapshotTable.mergeEpoch(spark, dir, df((2L, "U", 22.0)), Seq("id"), 1L)
    assert(rowsOf(dir) === Seq((1L, "A", 1.0), (2L, "U", 22.0),
      (5L, "X", 5.0)))
    // both epochs recorded in the carried set: replays of either no-op
    val v = SnapshotTable.latestVersion(dir)
    SnapshotTable.mergeEpoch(spark, dir, df((9L, "Z", 9.0)), Seq("id"), 0L)
    SnapshotTable.mergeEpoch(spark, dir, df((9L, "Z", 9.0)), Seq("id"), 1L)
    assert(SnapshotTable.latestVersion(dir) === v)
  }

  test("end-to-end streaming upsert: MemoryStream -> foreachBatch " +
    "mergeEpoch; a manual replay of the last epoch does not double-apply") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = freshDir()
    SnapshotTable.create(spark, dir, df((1L, "A", 1.0), (2L, "B", 2.0)))
    val in = MemoryStream[Long]
    val upserts = in.toDF().select(col("value").as("id"),
      lit("S").as("status"), (col("value") * 10.0).as("price"))
    val q = upserts.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_me_ck_").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], epoch: Long) =>
        SnapshotTable.mergeEpoch(batch.sparkSession, dir, batch.toDF(),
          Seq("id"), epoch)
        ()
      }
      .start()
    try {
      in.addData(2L, 3L)
      q.processAllAvailable()
      in.addData(4L)
      q.processAllAvailable()
    } finally q.stop()
    assert(rowsOf(dir) === Seq((1L, "A", 1.0), (2L, "S", 20.0),
      (3L, "S", 30.0), (4L, "S", 40.0)))
    // simulate the restart replay of the LAST committed micro-batch:
    // same epoch id, same (or stale) data — version must not move
    val v = SnapshotTable.latestVersion(dir)
    SnapshotTable.mergeEpoch(spark, dir, df((4L, "stale", 0.0)), Seq("id"),
      epochId = 1L)
    assert(SnapshotTable.latestVersion(dir) === v)
    assert(rowsOf(dir)(3) === ((4L, "S", 40.0)))
  }
}
