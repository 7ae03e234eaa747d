package pystreamsspark.io

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** WRITE-CONFLICT SEMANTICS MATRIX (round 13, r12 verdict #6): the
  * non-commuting commit races, each forced deterministically through an
  * injected [[CommitStore]] that lands the competitor INSIDE the
  * victim's publish attempt. The pinned laws (the WriteSerializable
  * contract — no acknowledged row change is ever lost):
  *
  *  | loser (rebases)   | winner        | law                         |
  *  |-------------------|---------------|-----------------------------|
  *  | DV delete         | compact       | positions RE-RESOLVED against
  *  |                   |               | the rewritten files (stale
  *  |                   |               | positions would delete the
  *  |                   |               | wrong rows)                 |
  *  | CoW merge         | compact       | discovery+rewrite re-execute
  *  |                   |               | on the compacted layout     |
  *  | CoW merge         | DV update     | merge re-reads DV-aware: the
  *  |                   |               | update's values feed the
  *  |                   |               | rewrite; both changes land  |
  *  | DV delete         | DV delete     | old ∪ new positions union   |
  *  | compact           | anything      | compact has NO rebase — it
  *  |                   |               | throws, state unchanged
  *  |                   |               | (maintenance must lose to
  *  |                   |               | data, never the reverse)    |
  *
  * Every loser's law holds because commitWithRebase RE-EXECUTES the
  * whole body (scan included) against the fresh manifest — no state is
  * cached across attempts except append's immutable batch (which
  * commutes). These specs pin that, so a future "optimization" that
  * caches discovery results across attempts fails here first. */
class ConflictMatrixSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("conflict").toString

  /** A store that, on the victim's FIRST publish attempt, lands
    * `competitor` through the real store and reports the loss. */
  private def raceOnce(competitor: => Unit): CommitStore = new CommitStore {
    private val fired = new AtomicInteger(0)
    override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean =
      synchronized {
        if (fired.compareAndSet(0, 1)) {
          SnapshotTable.commitStore = LocalCommitStore
          try competitor
          finally SnapshotTable.commitStore = this
          false
        } else LocalCommitStore.putIfAbsent(path, bytes)
      }
  }

  private def withStore[A](s: CommitStore)(body: => A): A =
    try { SnapshotTable.commitStore = s; body }
    finally SnapshotTable.commitStore = LocalCommitStore

  private def mkClustered(dir: String, n: Long = 1000L): Unit = {
    import spark.implicits._
    val df = spark.range(0, n)
      .select(col("id"), (col("id") * 10).as("score"))
      .repartitionByRange(8, col("id"))
    SnapshotTable.createClustered(spark, dir, df.toDF, Seq("id"))
    ()
  }

  test("DV delete racing compact: positions re-resolve against the " +
    "rewritten files — the right rows die, no resurrection") {
    val dir = freshDir()
    mkClustered(dir)
    withStore(raceOnce { SnapshotTable.compact(spark, dir, 3) }) {
      SnapshotTable.deleteVectors(spark, dir, "id >= 100 AND id < 120")
    }
    assert(SnapshotTable.latestVersion(dir) === 3) // compact v2, DV v3
    val out = SnapshotTable.read(spark, dir)
    assert(out.count() === 980)
    assert(out.filter(col("id") >= 100 && col("id") < 120).count() === 0)
    // the LIVE manifest's DVs reference the COMPACTED layout's files,
    // not the dead pre-compact ones (an orphaned first-attempt DV batch
    // may exist on disk — vacuum's problem, not the manifest's)
    val liveRel = SnapshotTable.filePaths(dir)
      .map(p => p.split("/").takeRight(3).mkString("/")).toSet
    val v = SnapshotTable.latestVersion(dir)
    val manifestText = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifests", f"v$v%08d.manifest")),
      java.nio.charset.StandardCharsets.UTF_8)
    val dvDirs = "dv=([^\\t\\n]+)".r.findAllMatchIn(manifestText)
      .map(_.group(1)).toSet
    assert(dvDirs.nonEmpty)
    val dvFiles = spark.read.parquet(dvDirs.toSeq.map(d =>
      java.nio.file.Paths.get(dir, d).toString): _*)
      .select("file").distinct().collect().map(_.getString(0)).toSet
    assert(dvFiles.subsetOf(liveRel),
      s"DV must key the rewritten files: $dvFiles vs $liveRel")
  }

  test("CoW merge racing compact: discovery and rewrite re-execute on " +
    "the compacted layout; updates apply exactly once") {
    import spark.implicits._
    val dir = freshDir()
    mkClustered(dir)
    withStore(raceOnce { SnapshotTable.compact(spark, dir, 3) }) {
      SnapshotTable.merge(spark, dir,
        Seq((10L, 111L), (20L, 222L), (2000L, 999L))
          .toDF("id", "score"), Seq("id"))
    }
    assert(SnapshotTable.latestVersion(dir) === 3)
    val out = SnapshotTable.read(spark, dir)
    assert(out.count() === 1001) // 1000 + 1 inserted
    assert(out.filter(col("id") === 10).head.getLong(1) === 111L)
    assert(out.filter(col("id") === 20).head.getLong(1) === 222L)
    assert(out.filter(col("id") === 2000).head.getLong(1) === 999L)
    assert(out.filter(col("id") === 30).head.getLong(1) === 300L)
  }

  test("CoW merge racing DV update over OVERLAPPING rows: the rebased " +
    "merge reads DV-aware, both writers' changes land") {
    import spark.implicits._
    val dir = freshDir()
    mkClustered(dir)
    // competitor: MoR update doubles score for id < 50 (overlaps the
    // merge's keys 10, 20)
    withStore(raceOnce {
      SnapshotTable.updateVectors(spark, dir, "id < 50",
        Seq("score" -> "score * 2"))
    }) {
      SnapshotTable.merge(spark, dir,
        Seq((10L, 111L), (20L, 222L)).toDF("id", "score"), Seq("id"))
    }
    val out = SnapshotTable.read(spark, dir)
    assert(out.count() === 1000)
    // merge keys: the MERGE's values (it rebased on top of the update)
    assert(out.filter(col("id") === 10).head.getLong(1) === 111L)
    assert(out.filter(col("id") === 20).head.getLong(1) === 222L)
    // non-merge keys under the update predicate: the UPDATE's values
    assert(out.filter(col("id") === 30).head.getLong(1) === 600L)
    assert(out.filter(col("id") === 49).head.getLong(1) === 980L)
    // outside both: untouched
    assert(out.filter(col("id") === 500).head.getLong(1) === 5000L)
  }

  test("DV delete racing DV delete: the rebased loser unions old and " +
    "new positions — both deletes stick") {
    val dir = freshDir()
    mkClustered(dir)
    withStore(raceOnce {
      SnapshotTable.deleteVectors(spark, dir, "id >= 0 AND id < 10")
    }) {
      SnapshotTable.deleteVectors(spark, dir, "id >= 5 AND id < 15")
    }
    val out = SnapshotTable.read(spark, dir)
    assert(out.count() === 985)
    assert(out.filter(col("id") < 15).count() === 0)
  }

  test("compact racing an append: compact LOSES loudly (no rebase), " +
    "table state unchanged by the failed attempt") {
    import spark.implicits._
    val dir = freshDir()
    mkClustered(dir)
    val before = SnapshotTable.filePaths(dir).toSet
    val e = intercept[Exception] {
      withStore(raceOnce {
        SnapshotTable.append(spark, dir,
          Seq((5000L, 1L)).toDF("id", "score"), numFiles = 1)
      }) {
        SnapshotTable.compact(spark, dir, 2)
      }
    }
    assert(e.getMessage.contains("committed concurrently"))
    val out = SnapshotTable.read(spark, dir)
    assert(out.count() === 1001) // the append landed; compact did not
    assert(before.subsetOf(SnapshotTable.filePaths(dir).toSet),
      "the failed compact must not replace any live file")
  }
}
