package pystreamsspark.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** The signature-verify MinHash-LSH path (`verify = "signature"` /
  * `Dedup.lshPairsFromSigs`): estimator accuracy against the exact
  * path, candidate-set equality, and the plan contract that no
  * variable-width shingle array crosses any shuffle — the property that
  * makes it the 100 TB form. */
class DedupSigSpec extends SparkSpec {

  /** Corpus with planted near-dups at several similarity levels: 40
    * distinct base docs plus mutants sharing most of each base text. */
  private def corpus: DataFrame = {
    val s = spark
    import s.implicits._
    val base = (1L to 40L).map { i =>
      (i, (0 until 14).map(j => s"w${(i * 13 + j * 7) % 97}").mkString(" "))
    }
    val mutants = (1L to 20L).map { i =>
      val toks = base((i - 1).toInt)._2.split(" ")
      // mutate the tail: higher i = more tokens replaced = lower Jaccard
      val kept = toks.dropRight((i % 5).toInt + 1)
      (1000L + i, (kept ++ (0 until (i % 5).toInt + 1).map(j => s"m${i}_$j")).mkString(" "))
    }
    (base ++ mutants).toDF("doc_id", "text")
  }

  private def pairsOf(df: DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("signature verify surfaces the same candidate pairs as exact verify") {
    // threshold 0 disables the post-verify filter, so both modes emit
    // exactly the band-collision candidate set — must be identical
    val exact = pairsOf(Dedup.minHashLsh(corpus, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.0))
    val sig = pairsOf(Dedup.minHashLsh(corpus, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.0, verify = "signature"))
    assert(exact.keySet === sig.keySet,
      s"candidate sets diverged: only-exact=${exact.keySet -- sig.keySet} " +
        s"only-sig=${sig.keySet -- exact.keySet}")
    assert(exact.nonEmpty, "corpus planted near-dups but no candidates surfaced")
  }

  test("|estimate - exact| bounded by the MinHash estimator error (nH=32)") {
    val exact = pairsOf(Dedup.minHashLsh(corpus, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.0))
    val sig = pairsOf(Dedup.minHashLsh(corpus, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.0, verify = "signature"))
    val diffs = exact.map { case (k, j) => math.abs(sig(k) - j) }
    // sd(est) = sqrt(J(1-J)/32) <= 0.0884; candidates that shared a band
    // skew high-J where the sd is smaller still. Bound max at ~4 sd and
    // the mean tighter — estimator bias is zero.
    assert(diffs.max <= 0.35, s"max |est-exact| = ${diffs.max}")
    assert(diffs.sum / diffs.size <= 0.10,
      s"mean |est-exact| = ${diffs.sum / diffs.size}")
  }

  test("threshold filters on the estimate in signature mode") {
    val all = pairsOf(Dedup.minHashLsh(corpus, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.0, verify = "signature"))
    val thr = pairsOf(Dedup.minHashLsh(corpus, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.7, verify = "signature"))
    assert(thr === all.filter(_._2 >= 0.7))
    assert(thr.nonEmpty && thr.size < all.size)
  }

  /** Output columns of every Exchange (shuffle AND broadcast) in the
    * finalized AQE plan — at test scale the band-bucket join broadcasts
    * its small side, so "what crosses the wire" means both kinds. */
  private def exchangeOutputs(df: DataFrame): Seq[Seq[String]] = {
    df.count() // materialize so AQE finalizes the physical plan
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    root.collect { case e: Exchange => e.output.map(_.name).toSeq }
  }

  test("signature mode ships no shingle array through any exchange; exact mode does") {
    val shCols = Set("sh", "sh_a", "sh_b")
    val sigExchanges = exchangeOutputs(Dedup.minHashLsh(corpus, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.7, verify = "signature"))
    assert(sigExchanges.nonEmpty, "expected at least the bucket-join exchanges")
    for (cols <- sigExchanges)
      assert(cols.forall(c => !shCols(c)),
        s"shingle array crossed an exchange in signature mode: $cols")
    // contrast: the exact path genuinely carries the arrays (this is the
    // cost the signature mode removes, so pin that it exists)
    val exactExchanges = exchangeOutputs(Dedup.minHashLsh(corpus, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.7))
    assert(exactExchanges.exists(_.exists(shCols)),
      s"exact mode no longer ships shingle arrays — update the scale docs: $exactExchanges")
  }

  test("sig_agree native matches the HOF zip_with count bit-for-bit") {
    pystreamsspark.functions.VectorExpressions.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      val n = 32
      val a = Array.fill(n)(rnd.nextLong() % 8) // small range forces agreements
      val b = Array.fill(n)(rnd.nextLong() % 8)
      (a.toSeq, b.toSeq)
    }
    val df = rows.toDF("a", "b")
    val out = df.select(
        call_function("sig_agree", $"a", $"b").as("native"),
        aggregate(zip_with($"a", $"b",
            (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
          lit(0), (acc, v) => acc + v).as("hof"))
      .collect()
    for (r <- out) assert(r.getInt(0) === r.getInt(1))
  }

  test("sig_agree handles unequal lengths and rejects non-long arrays") {
    pystreamsspark.functions.VectorExpressions.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 9L))).toDF("a", "b")
    val n = df.select(call_function("sig_agree", $"a", $"b")).collect()(0).getInt(0)
    assert(n === 1) // only position 0 compared and agreed
    val bad = Seq((Seq("x"), Seq(1L))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(call_function("sig_agree", $"a", $"b")).collect()
    }
  }

  test("empty documents: BOTH verify modes report the pair at jaccard 1.0 (and neither crashes)") {
    val s = spark
    import s.implicits._
    // two empty/whitespace docs: empty shingle sets. The naive exact
    // form divides 0/0 — under ANSI mode that THROWS and one degenerate
    // pair bricks the whole dedup job (found + fixed round 9); the
    // guard defines it as 1.0, matching the signature mode's
    // all-sentinel agreement. Two empty documents ARE duplicates.
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real text here with words"))
      .toDF("doc_id", "text")
    val exact = pairsOf(Dedup.minHashLsh(docs, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.0))
    val sig = pairsOf(Dedup.minHashLsh(docs, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.0, verify = "signature"))
    assert(exact.get((1L, 2L)).contains(1.0), s"exact should report 1.0: $exact")
    assert(sig.get((1L, 2L)).contains(1.0), s"sig should report 1.0: $sig")
    // the real doc pairs with neither empty in either mode
    assert(!exact.keySet.exists(p => p._2 == 3L || p._1 == 3L))
    assert(!sig.keySet.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("empty documents never crash the exact-set funnels (ANSI 0/0 guard class)") {
    val s = spark
    import s.implicits._
    // one empty, one whitespace-only, two real docs sharing a block —
    // every exact-set operator must survive the degenerate rows
    val docs = Seq((1L, "", "b0"), (2L, "   ", "b0"),
      (3L, "shared words here kept", "b0"), (4L, "shared words here too", "b0"))
      .toDF("doc_id", "text", "blk")
    // block Jaccard: the empty pair reports 1.0, real pairs unaffected
    val jp = Dedup.jaccardPairsBlock(docs, "doc_id", "text", Seq("blk"), 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(jp((1L, 2L)) === 1.0)
    assert(jp((3L, 4L)) > 0.0 && jp((3L, 4L)) < 1.0)
    // containment: the empty set is contained in everything
    val cp = Dedup.containmentPairsBlock(docs, "doc_id", "text", Seq("blk"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cp.contains((1L, 3L)) && cp.contains((2L, 4L)))
    // incremental delta with empty docs on both sides
    val hits = Dedup.neardupDelta(
        docs.filter($"doc_id" <= 2), docs.filter($"doc_id" >= 3)
          .unionByName(Seq((5L, "", "b0")).toDF("doc_id", "text", "blk")),
        "doc_id", "text", Seq("blk"), 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(hits === Set(5L)) // the empty incoming doc matches the empty existing ones
    // quality features on an empty doc: defined zeros, no crash
    val q = docs.filter($"doc_id" === 1L)
      .select(TextOps.qualityFeatures($"text").map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(q.getAs[Double]("uniq_ratio") === 0.0)
    assert(q.getAs[Double]("mean_token_len") === 0.0)
  }

  test("minHashLsh rejects an unknown verify mode") {
    intercept[IllegalArgumentException] {
      Dedup.minHashLsh(corpus, "doc_id", "text", verify = "bogus")
    }
  }
}
