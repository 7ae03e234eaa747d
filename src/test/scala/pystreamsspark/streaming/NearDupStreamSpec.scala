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
