package pystreamsspark.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import pystreamsspark.SparkSpec
import pystreamsspark.llm.Dedup

/** Streaming near-dup detection must surface THE SAME pairs as the
  * batch signature-verify path over the complete corpus — the banding
  * and signatures are bit-identical by construction, so the stream is
  * the batch funnel evaluated incrementally. */
class NearDupStreamSpec extends SparkSpec {

  private def corpus: Seq[(Long, String)] = {
    val base = (1L to 30L).map { i =>
      (i, (0 until 14).map(j => s"w${(i * 11 + j * 5) % 83}").mkString(" "))
    }
    // planted near-dups: same text with a 1-2 token tail change
    val mutants = Seq(
      (101L, base(0)._2 + " zz1"),
      (102L, base(4)._2.split(" ").dropRight(1).mkString(" ") + " zz2"),
      (103L, base(9)._2) // exact copy
    )
    base ++ mutants
  }

  private def unordered(p: (Long, Long)): (Long, Long) =
    if (p._1 < p._2) p else p.swap

  test("streaming near-dup over two batches equals the batch signature-verify pairs") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[NearDupDoc]
    val q = EventStreams.streamingNearDup(in.toDS(), threshold = 0.6)
      .writeStream.format("memory").queryName("neardup_stream_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = corpus.splitAt(20) // mutants arrive in batch 2
      in.addData(b1.map { case (id, t) => NearDupDoc(id, t) })
      q.processAllAvailable()
      in.addData(b2.map { case (id, t) => NearDupDoc(id, t) })
      q.processAllAvailable()
      val got = s.sql("SELECT id_a, id_b, est FROM neardup_stream_out")
        .collect()
        .map(r => unordered((r.getLong(0), r.getLong(1))) -> r.getDouble(2))
        .toMap // cross-bucket duplicates collapse; est identical per pair
      val batch = Dedup.minHashLsh(
          corpus.toDF("doc_id", "text"), "doc_id", "text",
          threshold = 0.6, verify = "signature")
        .collect()
        .map(r => unordered((r.getLong(0), r.getLong(1))) -> r.getDouble(2))
        .toMap
      assert(got.keySet === batch.keySet,
        s"stream-only=${got.keySet -- batch.keySet} batch-only=${batch.keySet -- got.keySet}")
      for ((p, est) <- got)
        assert(est === batch(p), s"estimate differs for $p: $est vs ${batch(p)}")
      // the planted dups actually surfaced
      assert(got.keySet.contains((1L, 101L)))
      assert(got.keySet.contains((10L, 103L)))
      assert(got((10L, 103L)) === 1.0) // exact copy: every position agrees
    } finally q.stop()
  }

  test("pairs emit with the earlier-seen doc first; re-sent docs don't self-pair") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[NearDupDoc]
    val q = EventStreams.streamingNearDup(in.toDS(), threshold = 0.6)
      .writeStream.format("memory").queryName("neardup_order_out")
      .outputMode("append").start()
    try {
      val text = (0 until 14).map(j => s"t${j * 3 % 17}").mkString(" ")
      // the HIGHER id arrives first: the emitted pair must lead with it
      in.addData(NearDupDoc(500L, text))
      q.processAllAvailable()
      in.addData(NearDupDoc(7L, text + " tail"))
      q.processAllAvailable()
      // replay of an already-seen doc: no self-pair, no duplicate growth
      in.addData(NearDupDoc(500L, text))
      q.processAllAvailable()
      val rows = s.sql("SELECT id_a, id_b FROM neardup_order_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(rows.toSet === Set((500L, 7L)), s"got ${rows.mkString(",")}")
      assert(!rows.exists(p => p._1 == p._2))
    } finally q.stop()
  }

  test("file-source near-dup + SnapshotTable epoch sink: stream ≡ batch " +
    "across a mid-run restart, exactly-once epochs") {
    // VERDICT r9 #2: streamingNearDup was MemoryStream-proven only. This
    // runs the ingestion filter the way a real job does: checkpointed
    // file-source offsets over parquet splits, a stop/restart in the
    // middle (bucket state must recover — the post-restart mutants pair
    // against PRE-restart documents), and the hits landed in a
    // SnapshotTable through the exactly-once appendEpoch sink.
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ckpt-neardup-")
    val inDir = base.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val tableDir = base.resolve("table").toString
    val ckpt = base.resolve("checkpoint").toString

    var nFile = 0
    def addDocs(docs: Seq[(Long, String)]): Unit = {
      nFile += 1
      val stage = base.resolve(s"stage$nFile")
      docs.map { case (id, t) => NearDupDoc(id, t) }.toDF()
        .coalesce(1).write.parquet(stage.toString)
      java.nio.file.Files.list(stage)
        .filter(_.toString.endsWith(".parquet")).forEach { p =>
          java.nio.file.Files.move(p, inDir.resolve(s"b$nFile.parquet")): Unit
        }
    }

    pystreamsspark.io.SnapshotTable.create(s, tableDir,
      s.emptyDataset[NearDupHit].toDF(), numFiles = 1)

    def startQuery() = {
      val docs = s.readStream.schema("doc_id LONG, text STRING")
        .parquet(inDir.toString).as[NearDupDoc]
      EventStreams.streamingNearDup(docs, threshold = 0.6)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[NearDupHit],
                         epochId: Long) =>
          pystreamsspark.io.SnapshotTable.appendEpoch(
            s, tableDir, df.toDF(), epochId): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    val (b1, b2) = corpus.splitAt(20) // mutants arrive after the restart
    addDocs(b1)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // while the query is DOWN: the mutant batch — its pairs exist only
    // if the buckets holding batch-1 signatures survived the restart
    addDocs(b2)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val landed = pystreamsspark.io.SnapshotTable.read(s, tableDir)
    val got = landed.collect()
      .map(r => unordered((r.getLong(0), r.getLong(1))) -> r.getDouble(2))
      .toMap
    val batch = Dedup.minHashLsh(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.6, verify = "signature")
      .collect()
      .map(r => unordered((r.getLong(0), r.getLong(1))) -> r.getDouble(2))
      .toMap
    assert(got.keySet === batch.keySet,
      s"stream-only=${got.keySet -- batch.keySet} batch-only=${batch.keySet -- got.keySet}")
    for ((p, est) <- got)
      assert(est === batch(p), s"estimate differs for $p: $est vs ${batch(p)}")
    assert(got.keySet.contains((1L, 101L)))
    assert(got((10L, 103L)) === 1.0)
    // exactly-once sink across the restart: epoch markers distinct
    val epochs = pystreamsspark.io.SnapshotTable.history(s, tableDir)
      .select($"epoch").collect().flatMap(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(epochs.distinct.length === epochs.length,
      s"epoch replayed into the table: ${epochs.mkString(",")}")
    assert(epochs.nonEmpty)
  }

  test("stateTtl evicts idle buckets (sliding-window coverage, bounded state)") {
    // NOTE: a ProcessingTimeTimeout query never quiesces on its own (the
    // engine keeps scheduling timeout batches — processAllAvailable
    // livelocks and AvailableNow spins hundreds of no-data epochs, both
    // observed), so each phase is a single-batch Trigger.Once RUN over a
    // shared checkpoint: run 1 stores doc 1's buckets (1 ms TTL), run 2
    // (after the TTL lapsed) carries only an UNRELATED doc — its batch
    // evicts the idle timed-out buckets — and run 3's near-dup of doc 1
    // therefore finds nothing to pair with. A bucket receiving data in
    // the same batch as its expiry keeps its members by design (data
    // takes precedence over timeout — the deadline slides).
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ttl-neardup-")
    val ckpt = base.resolve("ckpt").toString
    val in = MemoryStream[NearDupDoc]
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def runOnce(name: String): Unit = {
      val q = EventStreams.streamingNearDup(in.toDS(), threshold = 0.6,
          stateTtl = "1 milliseconds")
        .writeStream
        // foreachBatch: the memory sink cannot recover from a checkpoint
        .foreachBatch { (df: org.apache.spark.sql.Dataset[NearDupHit],
                         _: Long) =>
          df.collect().foreach(h => hits.add((h.id_a, h.id_b))): Unit
        }
        .option("checkpointLocation", ckpt)
        // Trigger.Once is deprecated for data-completeness reasons that
        // don't apply here: ONE batch per run is exactly the semantics
        // this test needs (AvailableNow cannot terminate under PT timers)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .outputMode("append").start()
      assert(q.awaitTermination(60000), s"run $name did not finish")
    }
    val text = (0 until 14).map(j => s"e${j * 5 % 23}").mkString(" ")
    val other = (0 until 14).map(j => s"x${j * 7 % 29}").mkString(" ")
    in.addData(NearDupDoc(1L, text))
    runOnce("neardup_ttl_r1")
    Thread.sleep(50) // let the 1 ms TTL lapse in processing time
    in.addData(NearDupDoc(2L, other)) // unrelated: triggers the eviction
    runOnce("neardup_ttl_r2")
    in.addData(NearDupDoc(3L, text + " tail")) // doc 1's buckets are gone
    runOnce("neardup_ttl_r3")
    val rows = hits.toArray(Array.empty[(Long, Long)]).toSet
    assert(rows.isEmpty, s"expected TTL eviction, got pairs $rows")
  }

  test("per-bucket state is capped: maxPerBucket bounds detection memory, not correctness of stored members") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[NearDupDoc]
    // cap of 2: the 3rd+ member of any bucket is checked but not stored
    val q = EventStreams.streamingNearDup(in.toDS(), threshold = 0.6,
        maxPerBucket = 2)
      .writeStream.format("memory").queryName("neardup_cap_out")
      .outputMode("append").start()
    try {
      val text = (0 until 14).map(j => s"c${j * 7 % 19}").mkString(" ")
      in.addData((1L to 5L).map(i => NearDupDoc(i, text))) // 5 exact copies
      q.processAllAvailable()
      val rows = s.sql("SELECT id_a, id_b FROM neardup_cap_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
      // members stored: 1, 2. Docs 3,4,5 each pair with both
      // representatives (detection intact) but are not stored, so no
      // (3,4)/(3,5)/(4,5) pairs — the representative-set policy
      assert(rows === Set((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
        (1L, 5L), (2L, 5L), (1L, 2L)), s"got $rows")
    } finally q.stop()
  }
}
