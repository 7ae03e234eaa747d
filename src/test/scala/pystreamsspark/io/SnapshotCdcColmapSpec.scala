package pystreamsspark.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import pystreamsspark.SparkSpec

/** CDC × COLUMN MAPPING (round-12, the r11 ADVICE medium): the change
  * feed's materialized batches must speak the CURRENT logical names —
  * each column follows its PHYSICAL identity through rename/drop
  * history — so:
  *  - a RENAMED column serves pre-rename versions' values under the
  *    NEW name (never silent nulls);
  *  - after DROP + re-ADD of the same name, the old column's values
  *    never resurrect into the new column (fresh physical identity);
  *  - evolution commits drop the cache, so stale-name batches are
  *    re-materialized under the reader's names.
  */
class SnapshotCdcColmapSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cdccm_").toString

  private def feed(dir: String) = spark.read
    .format("pystreamsspark.io.GraftCdcSource")
    .option("path", dir).option("fromVersion", 0).load()

  test("pre-rename versions serve values under the CURRENT name") {
    val dir = tmp()
    SnapshotTable.create(spark, dir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "val"), numFiles = 1)
    SnapshotTable.append(spark, dir, Seq((3L, 30.0)).toDF("k", "val"),
      numFiles = 1)
    SnapshotTable.renameColumn(dir, "val", "metric")
    SnapshotTable.append(spark, dir, Seq((4L, 40.0)).toDF("k", "metric"),
      numFiles = 1)
    val rows = feed(dir)
      .select($"k", $"metric", $"_change_type", $"_commit_version")
      .orderBy($"_commit_version", $"k")
      .collect().map(r => (r.getLong(0), r.get(1), r.getString(2),
        r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1L, 10.0, "insert", 1L), (2L, 20.0, "insert", 1L),
      (3L, 30.0, "insert", 2L), (4L, 40.0, "insert", 4L)),
      s"pre-rename versions must carry data under the new name: " +
        rows.mkString(", "))
  }

  test("DROP + re-ADD never resurrects the dropped column's values") {
    val dir = tmp()
    SnapshotTable.create(spark, dir,
      Seq((1L, "old1"), (2L, "old2")).toDF("k", "tag"), numFiles = 1)
    SnapshotTable.dropColumn(dir, "tag")
    SnapshotTable.evolveSchema(dir,
      StructType(Seq(StructField("tag", StringType))))
    SnapshotTable.append(spark, dir, Seq((3L, "new3")).toDF("k", "tag"),
      numFiles = 1)
    val rows = feed(dir)
      .select($"k", $"tag", $"_commit_version")
      .orderBy($"_commit_version", $"k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2)))
    assert(rows.toSeq === Seq(
      (1L, None, 1L), (2L, None, 1L), (3L, Some("new3"), 4L)),
      s"dropped values must not resurrect into the re-added column: " +
        rows.mkString(", "))
  }

  test("a streaming CDC consumer restarted across a rename sees current " +
    "names for replayed versions") {
    val dir = tmp()
    SnapshotTable.create(spark, dir, Seq((1L, 1.0)).toDF("k", "v"),
      numFiles = 1)
    // materialize v1's batch under the OLD name, then rename
    assert(feed(dir).count() === 1)
    SnapshotTable.renameColumn(dir, "v", "w")
    // the cache was dropped; a fresh read re-materializes under `w`
    val r = feed(dir).select($"k", $"w").orderBy($"k").collect()
    assert(r.map(x => (x.getLong(0), x.getDouble(1))).toSeq ===
      Seq((1L, 1.0)))
  }
}
