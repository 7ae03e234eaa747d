package pystreamsspark.io

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import pystreamsspark.SparkSpec

/** Streaming reads of catalog snapshot tables (round 10):
  * `spark.readStream.table("graft.ns.t")` consumes APPENDS with
  * version-number offsets — exactly-once across restarts (checkpointed
  * offsets + deterministic manifest replay), append-only enforcement
  * with an explicit ignoreChanges opt-out, and startingVersion. */
class SnapshotStreamSpec extends SparkSpec {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_swh_").toString
    SnapshotSql.register(spark, d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ns")
    d
  }

  private def freshName(p: String): String =
    p + java.util.UUID.randomUUID().toString.take(8)

  private def mk(name: String): String = {
    spark.sql(s"CREATE TABLE graft.ns.$name (id BIGINT, v DOUBLE)")
    name
  }

  private def ins(t: String, ids: Long*): Unit =
    SnapshotSql.sql(spark, s"INSERT INTO graft.ns.$t VALUES " +
      ids.map(i => s"($i, $i.0)").mkString(", "))

  private def drain(t: String, ckpt: String,
                    opts: Map[String, String] = Map.empty): Seq[Long] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val reader = opts.foldLeft(spark.readStream) {
      case (r, (k, v)) => r.option(k, v) }
    val q = reader.table(s"graft.ns.$t")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        df.collect().foreach(r => got.add(r.getLong(0))): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "stream run did not finish")
    got.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq.sorted
  }

  test("readStream.table consumes appends exactly-once across restarts") {
    wh
    val t = mk(freshName("st_"))
    val ckpt = java.nio.file.Files.createTempDirectory("st_ckpt_").toString
    ins(t, 1L, 2L)
    assert(drain(t, ckpt) === Seq(1L, 2L))
    // two more versions land while the stream is down
    ins(t, 3L)
    ins(t, 4L, 5L)
    assert(drain(t, ckpt) === Seq(3L, 4L, 5L)) // ONLY the new versions
    // nothing new: an empty run emits nothing
    assert(drain(t, ckpt) === Seq.empty)
  }

  test("non-append changes fail the stream; ignoreChanges emits added " +
    "files only") {
    wh
    val t = mk(freshName("stc_"))
    val ckpt = java.nio.file.Files.createTempDirectory("stc_ckpt_").toString
    ins(t, 1L, 2L, 3L)
    assert(drain(t, ckpt) === Seq(1L, 2L, 3L))
    // a CoW DELETE rewrites the covering file — not an append
    SnapshotSql.sql(spark, s"DELETE FROM graft.ns.$t WHERE id = 1")
    val e = intercept[Exception] { drain(t, ckpt) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("APPENDS")), s"got $e")
    // opting in re-emits the rewritten file's surviving rows
    val ckpt2 = java.nio.file.Files.createTempDirectory("stc_ck2_").toString
    val got = drain(t, ckpt2, Map("ignoreChanges" -> "true"))
    assert(got === Seq(2L, 3L)) // the whole current state, one version set
  }

  test("startingVersion skips history") {
    wh
    val t = mk(freshName("stv_"))
    val ckpt = java.nio.file.Files.createTempDirectory("stv_ckpt_").toString
    ins(t, 1L) // v2
    ins(t, 2L) // v3
    assert(drain(t, ckpt, Map("startingVersion" -> "3")) === Seq(2L))
  }
}
