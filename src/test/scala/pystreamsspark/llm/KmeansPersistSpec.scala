package pystreamsspark.llm

import pystreamsspark.SparkSpec

/** r14 intra-fit persist laws: the Lloyd-loop persist in
  * kmeansFit/kmeansAssign/semanticDedup is strictly operation-scoped —
  * results are unchanged (the oracle pins that end-to-end; here a direct
  * equality against a persist-free replay) and the explicit input persist
  * does not outlive the call (the "no result caching across runs" rule: a
  * leaked persist would be exactly the cross-invocation memo the round
  * brief forbids). localCheckpoint blocks (the Lloyd rounds) and Pregel's
  * final persisted round are excluded from the inventory — both predate
  * this change and are released by LRU/GC, not by the operator. */
class KmeansPersistSpec extends SparkSpec {

  private def mkEmb(n: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong, Array.fill(8)((rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
  }

  /** Cached, non-locally-checkpointed RDD ids currently registered (other
    * suites share the JVM session, so laws compare deltas, not zero;
    * localCheckpoint entries are round snapshots, not input caches). */
  private def cachedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs
      .filter { case (_, rdd) => !rdd.isCheckpointed }
      .keySet.toSet

  test("kmeansAssign's input persist does not outlive the call") {
    val emb = mkEmb(200)
    val before = cachedIds
    val out = Similarity.kmeansAssign(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    out.count() // consume the lazy tail (assignMin over the unpersisted e)
    val leaked = cachedIds -- before
    assert(leaked.isEmpty, s"kmeansAssign leaked cached RDDs: $leaked")
  }

  test("semanticDedup results are invocation-deterministic under the persist") {
    val emb = mkEmb(120)
    val ids = Similarity.semanticDedup(emb, "vec_id", "embedding",
      k = 4, iters = 1, threshold = 0.8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // a second invocation recomputes from scratch (nothing reused) and
    // must return the identical survivor set
    val ids2 = Similarity.semanticDedup(emb, "vec_id", "embedding",
      k = 4, iters = 1, threshold = 0.8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids === ids2)
    assert(ids.nonEmpty && ids.size <= 120)
  }

  test("kmeansFit centroids match a fresh-lineage replay bit-for-bit") {
    val s = spark
    import s.implicits._
    val emb = mkEmb(150)
    val fit = Similarity.kmeansFit(emb, "vec_id", "embedding",
      k = 3, iters = 2)
    // replay the identical pipeline over an already-materialized copy of
    // the input: same values, fresh lineage — persist-induced drift (a
    // reordered scan, a cached stale projection) would show here
    val fit2 = Similarity.kmeansFit(
      emb.localCheckpoint(true), "vec_id", "embedding", k = 3, iters = 2)
    val a = fit.orderBy($"cid").collect().map(r =>
      (r.getInt(0), r.getSeq[Double](1)))
    val b = fit2.orderBy($"cid").collect().map(r =>
      (r.getInt(0), r.getSeq[Double](1)))
    assert(a.toSeq === b.toSeq)
  }
}
