package pystreamsspark.io

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import pystreamsspark.SparkSpec

/** Streaming CHANGE DATA FEED over snapshot tables (round-11):
  * [[GraftCdcSource]] turns EVERY commit kind — append, CoW merge,
  * deletion-vector delete, CoW update, compact — into per-commit netted
  * `_change_type` rows with version offsets. Laws:
  *  - stream ≡ batch: the drained feed equals the union of
  *    [[SnapshotTable.changesBetween]](v-1, v) per version (the spec's
  *    oracle is the already-proven batch CDC);
  *  - exactly-once across restart: a checkpointed feed resumed after
  *    more commits emits ONLY the new versions;
  *  - a compact emits nothing (rewritten-but-identical rows net away);
  *  - batch range reads (fromVersion, toVersion] match;
  *  - vacuumed versions fail the feed loudly instead of silently
  *    skipping commits. */
class SnapshotCdcStreamSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private val FMT = "pystreamsspark.io.GraftCdcSource"

  /** (commit_version, change_type, id, v) tuples, sorted. */
  private type Chg = (Long, String, Long, Double)

  private def sortKey(c: Chg) = (c._1, c._2, c._3, c._4)

  private def drain(dir: String, ckpt: String,
                    opts: Map[String, String] = Map.empty): Seq[Chg] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Chg]()
    val reader = opts.foldLeft(
      spark.readStream.format(FMT).option("path", dir)) {
      case (r, (k, v)) => r.option(k, v) }
    val q = reader.load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        df.collect().foreach { r =>
          got.add((r.getAs[Long]("_commit_version"),
            r.getAs[String]("_change_type"),
            r.getAs[Long]("id"), r.getAs[Double]("v")))
        }: Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "CDC stream run did not finish")
    got.toArray(Array.empty[Chg]).toSeq.sortBy(sortKey)
  }

  /** The batch oracle: per-version changesBetween (+ the first version
    * as pure inserts), stamped like the source stamps. */
  private def expected(dir: String, fromV: Int, toV: Int): Seq[Chg] =
    ((fromV + 1) to toV).flatMap { v =>
      val df =
        if (v == SnapshotTable.existingVersions(dir).head)
          SnapshotTable.read(spark, dir, Some(v))
            .withColumn("_change_type", lit("insert"))
        else SnapshotTable.changesBetween(spark, dir, v - 1, v)
      df.collect().map(r => (v.toLong, r.getAs[String]("_change_type"),
        r.getAs[Long]("id"), r.getAs[Double]("v")))
    }.sortBy(sortKey)

  /** v1 create(1..4), v2 append(5,6), v3 merge upsert(2->20, +7),
    * v4 DV delete(id=3), v5 CoW update(id=5 -> v=50). */
  private def fixture(): String = {
    val dir = tmp("graft_cdc_")
    SnapshotTable.createClustered(spark, dir,
      (1L to 4L).map(i => (i, i.toDouble)).toDF("id", "v"), Seq("id"))
    SnapshotTable.append(spark, dir,
      Seq((5L, 5.0), (6L, 6.0)).toDF("id", "v"), numFiles = 1)
    SnapshotTable.merge(spark, dir,
      Seq((2L, 20.0), (7L, 7.0)).toDF("id", "v"), Seq("id"))
    SnapshotTable.deleteVectors(spark, dir, "id = 3")
    SnapshotTable.update(spark, dir, "id = 5", Seq("v" -> "50.0"))
    dir
  }

  test("CDC stream emits per-commit netted changes for every commit " +
    "kind; stream equals the batch oracle; exactly-once across restart") {
    val dir = fixture()
    val ckpt = tmp("cdc_ckpt_")
    val got = drain(dir, ckpt)
    val want = expected(dir, 0, 5)
    assert(got === want)
    // sanity on the semantics themselves, not just self-consistency:
    // the DV delete surfaces as exactly one delete row for id=3
    assert(got.count(c => c._1 == 4L) === 1)
    assert(got.filter(_._1 == 4L) === Seq((4L, "delete", 3L, 3.0)))
    // the CoW merge nets to one delete + two inserts
    assert(got.filter(_._1 == 3L).map(c => (c._2, c._3, c._4)).toSet ===
      Set(("delete", 2L, 2.0), ("insert", 2L, 20.0), ("insert", 7L, 7.0)))
    // restart: only versions committed since the checkpoint arrive
    SnapshotTable.append(spark, dir, Seq((8L, 8.0)).toDF("id", "v"),
      numFiles = 1)
    assert(drain(dir, ckpt) === Seq((6L, "insert", 8L, 8.0)))
    // and an idle restart emits nothing
    assert(drain(dir, ckpt) === Seq.empty)
  }

  test("compact emits nothing (identical rows net away); " +
    "startingVersion skips history") {
    val dir = fixture()
    SnapshotTable.compact(spark, dir, target = 1) // v6
    val ckpt = tmp("cdc_ckpt2_")
    // start at v6: ONLY the compact version is in range — zero rows
    assert(drain(dir, ckpt, Map("startingVersion" -> "6")) === Seq.empty)
    val ckpt2 = tmp("cdc_ckpt3_")
    // start at v5: exactly the CoW update's delete+insert pair
    assert(drain(dir, ckpt2, Map("startingVersion" -> "5"))
      .map(c => (c._2, c._3, c._4)).toSet ===
      Set(("delete", 5L, 5.0), ("insert", 5L, 50.0)))
  }

  test("batch CDC range read equals the per-version oracle") {
    val dir = fixture()
    val got = spark.read.format(FMT).option("path", dir)
      .option("fromVersion", 2).option("toVersion", 4).load()
      .collect().map(r => (r.getAs[Long]("_commit_version"),
        r.getAs[String]("_change_type"),
        r.getAs[Long]("id"), r.getAs[Double]("v")))
      .toSeq.sortBy(sortKey)
    assert(got === expected(dir, 2, 4))
    // default range = everything up to latest
    val all = spark.read.format(FMT).option("path", dir).load()
    assert(all.count() === expected(dir, 0, 5).size.toLong)
  }

  test("after a vacuum the oldest SURVIVOR does not replay as a " +
    "full-snapshot insert batch (only a true first commit does)") {
    val dir = fixture() // v1..v5
    SnapshotTable.vacuum(dir, keepVersions = 2) // keeps v4, v5
    // v4's parent (v3) is gone: a resuming consumer asking for v4 must
    // fail loudly, NOT receive the whole table as inserts
    val e = intercept[Exception] {
      spark.read.format(FMT).option("path", dir)
        .option("fromVersion", 3).option("toVersion", 4).load().count()
    }
    assert(e.getMessage.contains("vacuumed"),
      s"expected the vacuumed-adjacency refusal, got: ${e.getMessage}")
  }

  test("a vacuumed, un-materialized version fails the feed loudly; " +
    "a pre-materialized cache outlives the manifests") {
    val dir = fixture()
    // materialize v1..v3 by reading the range once
    spark.read.format(FMT).option("path", dir)
      .option("fromVersion", 0).option("toVersion", 3).load().count()
    SnapshotTable.vacuum(dir, keepVersions = 2) // keeps v4, v5
    // vacuum reclaimed the _cdc batches of dropped versions too, so a
    // feed from the beginning fails loudly (no silent skipping)
    val e = intercept[Exception] {
      spark.read.format(FMT).option("path", dir)
        .option("fromVersion", 0).option("toVersion", 3).load().count()
    }
    assert(e.getMessage.contains("vacuum"),
      s"expected the vacuumed-version refusal, got: ${e.getMessage}")
    // the kept range still serves: v5 = the CoW update pair
    val tail = spark.read.format(FMT).option("path", dir)
      .option("fromVersion", 4).option("toVersion", 5).load()
    assert(tail.count() === 2L)
  }
}
