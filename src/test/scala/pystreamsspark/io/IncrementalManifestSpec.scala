package pystreamsspark.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import pystreamsspark.SparkSpec

/** INCREMENTAL MANIFESTS (round-12, the r11 verdict's top item): hot
  * write paths commit O(delta) `-path`/`+entry` action lines against
  * the parent instead of re-serializing the full live file list, with
  * a full materialization every CHECKPOINT_INTERVAL commits and vacuum
  * writing `.checkpoint` sidecars before dropping a surviving delta's
  * ancestors. Laws:
  *  - RESOLUTION EXACTNESS: a long mixed chain (appends, merge, DV
  *    delete, metadata ops) reads identically to the row-level truth at
  *    every surviving version (time travel included);
  *  - O(delta) BYTES: a 1-row append into a many-file table writes a
  *    manifest orders of magnitude smaller than the full file list;
  *    metadata-only ops (ALTER/ANALYZE/SET DEFAULT) add no entry lines;
  *  - CHECKPOINTING: the interval bound holds (no delta chain longer
  *    than CHECKPOINT_INTERVAL), so resolution cost is bounded;
  *  - VACUUM SAFETY: dropping a surviving delta version's ancestors
  *    materializes it first; epochs and reads survive;
  *  - BLOOM SIDECARS: blobs live beside the batch, manifests stay slim,
  *    pruning + vacuum + shallow clone all keep working.
  */
class IncrementalManifestSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_incr_").toString

  private def manifestBytes(dir: String, v: Int): Long =
    Files.size(Paths.get(dir, "_manifests", f"v$v%08d.manifest"))

  private def manifestText(dir: String, v: Int): String =
    new String(Files.readAllBytes(
      Paths.get(dir, "_manifests", f"v$v%08d.manifest")), "UTF-8")

  test("a mixed delta chain resolves exactly at every version") {
    val dir = tmp()
    val base = (0L until 200L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "score")
    SnapshotTable.createClustered(spark, dir,
      base.repartitionByRange(4, col("id")), clusterCols = Seq("id"))
    // 20 single-row appends — crosses CHECKPOINT_INTERVAL (16)
    (0 until 20).foreach { i =>
      SnapshotTable.append(spark, dir,
        Seq((1000L + i, s"x$i", -1.0)).toDF("id", "name", "score"),
        numFiles = 1)
    }
    // a narrow merge, a DV delete and two metadata-only commits
    SnapshotTable.merge(spark, dir,
      Seq((5L, "UPD", 99.0)).toDF("id", "name", "score"), Seq("id"))
    SnapshotTable.deleteVectors(spark, dir, "id = 7")
    SnapshotTable.evolveSchema(dir,
      StructType(Seq(StructField("tag", StringType))))
    SnapshotTable.analyzeColumns(spark, dir, Seq("id"))
    val latest = SnapshotTable.latestVersion(dir)
    assert(latest === 25)
    // interval law: no resolution chain longer than the interval
    val dists = (1 to latest).map { v =>
      manifestText(dir, v).linesIterator.next().split("\t")
        .map(_.split("=", 2)).collectFirst {
          case Array("ckdist", d) => d.toInt
        }.getOrElse(0)
    }
    assert(dists.max <= SnapshotTable.CHECKPOINT_INTERVAL)
    assert(dists.count(_ == 0) >= 2, "expected a materialized checkpoint")
    // the final state is exact
    val got = SnapshotTable.read(spark, dir)
      .select("id", "name", "score").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want = ((0L until 200L).filterNot(_ == 7L).map(i =>
      (i, if (i == 5L) "UPD" else s"n$i", if (i == 5L) 99.0 else i * 1.0)) ++
      (0 until 20).map(i => (1000L + i, s"x$i", -1.0))).sortBy(_._1)
    assert(got.toSeq === want)
    // time travel into the middle of the delta chain is exact
    assert(SnapshotTable.read(spark, dir, Some(11)).count() === 210)
    assert(SnapshotTable.read(spark, dir, Some(1)).count() === 200)
    // stats pruning still works through the chain (clustered base)
    assert(SnapshotTable.readCandidates(dir, "id", "5", "5", None).size
      < SnapshotTable.filePaths(dir).size)
    // DESCRIBE HISTORY answers from HEADERS only (the r12 nfiles
    // header): per-version n_files must equal the resolved file counts
    val hist = SnapshotTable.history(spark, dir)
      .select("version", "n_files").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    (1 to latest).foreach { v =>
      assert(hist(v) === SnapshotTable.filePaths(dir, Some(v)).size,
        s"header nfiles must match the resolved count at v$v")
    }
  }

  test("commit bytes are O(delta), metadata ops are entry-free") {
    val dir = tmp()
    SnapshotTable.createClustered(spark, dir,
      spark.range(0, 40000).toDF("id")
        .withColumn("v", col("id") * 2.0)
        .repartitionByRange(40, col("id")), clusterCols = Seq("id"))
    val full = manifestBytes(dir, 1) // 40 entries with stats
    SnapshotTable.append(spark, dir,
      Seq((90000L, 1.0)).toDF("id", "v"), numFiles = 1)
    val delta = manifestBytes(dir, 2)
    assert(delta * 5 < full,
      s"append manifest must be O(delta): $delta vs full $full")
    val body = manifestText(dir, 2).linesIterator.toSeq.tail
    assert(body.count(_.startsWith("+")) === 1)
    assert(!body.exists(_.startsWith("-")))
    // metadata-only commit: header only, zero entry lines
    SnapshotTable.setProperties(spark, dir,
      Map("delete.mode" -> "merge-on-read"))
    val metaBody = manifestText(dir, 3).linesIterator.toSeq.tail
    assert(metaBody.isEmpty, s"metadata commit carried entries: $metaBody")
    // a narrow merge removes+adds only the covering file(s)
    SnapshotTable.merge(spark, dir,
      Seq((5L, -1.0)).toDF("id", "v"), Seq("id"), numFiles = 1)
    val mergeBody = manifestText(dir, 4).linesIterator.toSeq.tail
    assert(mergeBody.count(_.startsWith("-")) === 1,
      s"narrow merge must remove 1 covering file: $mergeBody")
    assert(SnapshotTable.read(spark, dir).count() === 40001)
  }

  test("vacuum materializes surviving delta versions before dropping " +
    "their ancestors; epochs survive") {
    val dir = tmp()
    SnapshotTable.create(spark, dir, spark.range(0, 10).toDF("id"),
      numFiles = 2)
    (0 until 6).foreach { i =>
      SnapshotTable.appendEpoch(spark, dir,
        Seq(100L + i).toDF("id"), epochId = i, numFiles = 1)
    }
    val latest = SnapshotTable.latestVersion(dir) // 7, v2..v7 are deltas
    SnapshotTable.vacuum(dir, keepVersions = 3)
    val kept = SnapshotTable.existingVersions(dir)
    assert(kept === Seq(latest - 2, latest - 1, latest))
    // the oldest kept version resolved through dropped ancestors — a
    // checkpoint sidecar must exist and reads must stay exact
    assert(Files.exists(Paths.get(dir, "_manifests",
      f"v${latest - 2}%08d.checkpoint")))
    assert(SnapshotTable.read(spark, dir).count() === 16)
    assert(SnapshotTable.read(spark, dir, Some(latest - 2)).count() === 14)
    // exactly-once law survives: re-applying an old epoch is a no-op
    SnapshotTable.appendEpoch(spark, dir, Seq(999L).toDF("id"), epochId = 2)
    assert(SnapshotTable.read(spark, dir).count() === 16)
    // and vacuum reclaimed the dropped versions' manifests+checkpoints
    assert(!Files.exists(Paths.get(dir, "_manifests", f"v${1}%08d.manifest")))
  }

  test("bloom blobs live in per-batch sidecars: slim manifests, pruning, " +
    "vacuum and shallow clone all hold") {
    val dir = tmp()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    SnapshotTable.createEmpty(dir, schema, bloomCols = Seq("id"))
    SnapshotTable.append(spark, dir,
      spark.range(0, 20000).toDF("id").withColumn("v", col("id") * 2.0),
      numFiles = 16)
    // the manifest holds no inline blobs — only the sidecar reference
    val text = manifestText(dir, 2)
    assert(!text.contains("bloom="), "blobs must not inline in the manifest")
    assert(text.contains("bloomref="))
    assert(manifestBytes(dir, 2) < 4096,
      s"bloomed manifest must stay slim, got ${manifestBytes(dir, 2)}")
    val sidecars = SnapshotTable.filePaths(dir).map(p =>
      Paths.get(p).getParent.resolve("_blooms")).distinct
    assert(sidecars.forall(Files.exists(_)))
    // pruning works off the sidecar
    val cand = SnapshotTable.readCandidatesIn(dir, "id", Seq("4242"))
    assert(cand.size < 16, s"sidecar bloom pruned nothing: ${cand.size}")
    assert(SnapshotTable.readWhereIn(spark, dir, "id", Seq("4242"))
      .collect().map(_.getLong(0)).toSeq === Seq(4242L))
    // vacuum keeps the referenced sidecar, drops the orphaned one
    SnapshotTable.overwrite(spark, dir,
      spark.range(0, 100).toDF("id").withColumn("v", lit(0.0)), numFiles = 2)
    SnapshotTable.vacuum(dir, keepVersions = 1)
    assert(sidecars.forall(p => !Files.exists(p)),
      "orphaned sidecar must be reclaimed with its batch")
    val cand2 = SnapshotTable.readCandidatesIn(dir, "id", Seq("42"))
    assert(cand2.nonEmpty)
    // shallow clone: sidecar hardlinks along, pruning works in the clone
    val dst = tmp() + "/clone"
    SnapshotTable.shallowClone(spark, dir, dst)
    val cloneCand = SnapshotTable.readCandidatesIn(dst, "id", Seq("42"))
    assert(cloneCand.size <= 2)
    assert(SnapshotTable.readWhereIn(spark, dst, "id", Seq("42"))
      .collect().map(_.getLong(0)).toSeq === Seq(42L))
  }

  test("bloom pruning survives RENAME through the physical-keyed sidecar " +
    "as a pure-metadata commit") {
    val dir = tmp()
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType)))
    SnapshotTable.createEmpty(dir, schema, bloomCols = Seq("k"))
    SnapshotTable.append(spark, dir,
      spark.range(0, 8000).toDF("k").withColumn("v", col("k") * 1.0),
      numFiles = 8)
    val before = SnapshotTable.readCandidatesIn(dir, "k", Seq("77")).size
    assert(before < 8)
    SnapshotTable.renameColumn(dir, "k", "key")
    // rename of a sidecar-bloomed, unclustered column is metadata-only
    val v = SnapshotTable.latestVersion(dir)
    val body = manifestText(dir, v).linesIterator.toSeq.tail
    assert(body.isEmpty, s"rename must be a metadata-only delta: $body")
    val after = SnapshotTable.readCandidatesIn(dir, "key", Seq("77"))
    assert(after.size === before, "pruning must survive the rename")
    assert(SnapshotTable.readWhereIn(spark, dir, "key", Seq("77"))
      .collect().map(_.getLong(0)).toSeq === Seq(77L))
  }
}
