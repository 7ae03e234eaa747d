package pystreamsspark.relational

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec
import pystreamsspark.io.Tables

/** Semantic invariants for the analytics/utility batch: cohort retention,
  * OHLC bars, Markov transitions, table diff, BPE pair counts, and int8
  * embedding quantization. (Value-level correctness is the DuckDB oracle's
  * job; these pin the properties the oracle can't state.)
  */
class AnalyticsOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("retention: offset-0 cell of each cohort counts every cohort user") {
    val s = spark
    import s.implicits._
    val r = AnalyticsQueries.qRetention(spark, sf).cache()
    // every user is active in their own cohort week, so the offset-0 cell
    // per cohort equals the cohort's size, and offsets are non-negative
    assert(r.filter($"week_offset" < 0).count() == 0)
    val cohortSizes = Tables.events(spark, sf)
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
      .groupBy($"user_id").agg(min($"wk").as("cohort"))
      .groupBy($"cohort").count()
    val zeroCells = r.filter($"week_offset" === 0)
      .select($"cohort", $"n_users".as("count"))
    assert(zeroCells.except(cohortSizes).isEmpty &&
      cohortSizes.except(zeroCells).isEmpty)
    // retention never exceeds the cohort size in any later week
    val joined = r.join(cohortSizes.withColumnRenamed("count", "size"), "cohort")
    assert(joined.filter($"n_users" > $"size").count() == 0)
    r.unpersist()
  }

  test("ohlc: low <= open/close <= high and bar counts sum to all events") {
    val s = spark
    import s.implicits._
    val b = AnalyticsQueries.qOhlc(spark, sf).cache()
    assert(b.filter($"low" > $"open" || $"low" > $"close" ||
      $"high" < $"open" || $"high" < $"close").count() == 0)
    assert(b.agg(sum($"n")).head.getLong(0) == Tables.events(spark, sf).count())
    b.unpersist()
  }

  test("event bigrams: shares sum to 1 per source state, n sums to rows-users") {
    val s = spark
    import s.implicits._
    val t = AnalyticsQueries.qEventBigrams(spark, sf).cache()
    // each user's sequence of length L contributes L-1 transitions
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(t.agg(sum($"n")).head.getLong(0) == expected)
    val shareSums = t.groupBy($"prev_type").agg(sum($"share").as("ss"))
      .select(abs($"ss" - 1.0).as("err")).agg(max($"err")).head.getDouble(0)
    assert(shareSums < 1e-9, s"share rows don't sum to 1: max err $shareSums")
    t.unpersist()
  }

  test("table diff: classes partition the key universe and checksum adds up") {
    val s = spark
    import s.implicits._
    val d = AnalyticsQueries.qTableDiff(spark, sf).cache()
    val m = d.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.keySet == Set("added", "removed", "changed", "same"))
    val orders = Tables.orders(spark, sf).count()
    // old keys = removed + changed + same; every added key is old-key + 1e12
    assert(m("removed")._1 + m("changed")._1 + m("same")._1 == orders)
    // md5 first hex char is ~uniform over 16 values: removed ~ 1/16 of rows,
    // changed ~ 2/16 (loose 3x bounds, deterministic data so never flaky)
    assert(m("removed")._1 > orders / 48 && m("removed")._1 < orders / 5)
    assert(m("changed")._1 > orders / 24 && m("changed")._1 < orders / 3)
    assert(m("added")._1 > 0)
    d.unpersist()
  }

  test("bpe merges: pair counts bounded by total char-pair mass, top-20 sorted") {
    val s = spark
    import s.implicits._
    val p = AnalyticsQueries.qBpeMerges(spark, sf).collect()
    assert(p.length == 20)
    val counts = p.map(_.getLong(1))
    assert(counts.toSeq == counts.sortBy(-_).toSeq)
    // total adjacent-pair occurrences across the corpus bounds any single pair
    val totalPairs = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") >= 2)
      .agg(sum(length($"tok") - 1)).head.getLong(0)
    assert(counts.head <= totalPairs && counts.head > 0)
  }

  test("activity bitmap: popcount consistent and mask bits match active days") {
    val s = spark
    import s.implicits._
    val b = AnalyticsQueries.qActivityBitmap(spark, sf).cache()
    assert(b.filter($"n_days" < 1 || $"n_days" > 31).count() == 0)
    // Σ n_days over (user, month) == |distinct (user, month, day)| —
    // the bitmap loses nothing and never aliases across months
    val userDays = Tables.events(spark, sf)
      .select($"user_id", date_trunc("month", $"ts"), dayofmonth($"ts"))
      .distinct().count()
    assert(b.agg(sum($"n_days".cast("long"))).head.getLong(0) == userDays)
    b.unpersist()
  }

  test("concurrency: cross-midnight sessions carry into the next day's sweep") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("conc").toString
    def ns(day: Int, h: Int, m: Int): Long =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")
        .getTime * 1000000L
    // intervals [23:50,00:20) [23:55,00:25) day 1; [00:05,00:35) day 2
    Seq((1L, ns(1, 23, 50), 10L, "view", 1.0, "{}"),
        (2L, ns(1, 23, 55), 11L, "view", 1.0, "{}"),
        (3L, ns(2, 0, 5), 12L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.qConcurrency(spark, dir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // day 1 peaks at 2 (both late sessions open); day 2 peaks at 3
    // (both carried-over sessions still open when the 00:05 one starts)
    assert(got == Map("2024-01-01" -> 2L, "2024-01-02" -> 3L))
  }

  test("bigram LM familiarity: exact scores on a planted twin + unique doc") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("blm").toString
    Seq((1L, "a b c d", "en", "src0", 7L),
        (2L, "a b c d", "en", "src0", 7L),
        (3L, "x y z w", "en", "src0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmQueries.qBigramLm(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // twins: each of 3 bigrams occurs twice corpus-wide -> avg 2.0
    assert(got.toSeq == Seq((1L, 3L, 6L, 2.0), (2L, 3L, 6L, 2.0),
      (3L, 3L, 3L, 1.0)))
  }

  test("dup spans: planted copy pair fully flagged, unique doc clean") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dspan").toString
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val other = (1 to 10).map(i => s"u$i").mkString(" ")
    Seq((1L, ten, "en", "src0", 30L), (2L, ten, "en", "src0", 30L),
        (3L, other, "en", "src0", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmQueries.qDupSpans(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 10 tokens -> 3 distinct 8-gram spans; copies share all, unique none
    assert(got.toSeq == Seq((1L, 3L, 3L, 1.0), (2L, 3L, 3L, 1.0),
      (3L, 3L, 0L, 0.0)))
  }

  test("wau: bounded below by that day's DAU and above by total users") {
    val s = spark
    import s.implicits._
    val w = AnalyticsQueries.qWauSliding(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    val dau = ev.select($"user_id", to_date($"ts").as("e")).distinct()
      .groupBy($"e").agg(count(lit(1)).as("dau"))
    val total = ev.select($"user_id").distinct().count()
    val joined = w.join(dau, Seq("e"))
    assert(joined.filter($"wau" < $"dau").count() == 0)
    assert(w.filter($"wau" > total).count() == 0)
    // the spine covers every active day
    assert(w.count() == dau.count())
    w.unpersist()
  }

  test("pmi lift: positive scores, min-count filter respected, top-50 sorted") {
    val s = spark
    import s.implicits._
    val p = LlmQueries.qPmiLift(spark, sf).collect()
    assert(p.length <= 50 && p.nonEmpty)
    assert(p.forall(_.getLong(2) >= 5))
    assert(p.forall(_.getDouble(3) > 0.0))
    val lifts = p.map(_.getDouble(3))
    assert(lifts.toSeq == lifts.sortBy(-_).toSeq)
  }

  test("oov rate: bounded, token totals preserved, top-vocab docs score low") {
    val s = spark
    import s.implicits._
    val o = LlmQueries.qOovRate(spark, sf).cache()
    assert(o.filter($"oov_rate" < 0 || $"oov_rate" > 1).count() == 0)
    val corpusTokens = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t")).filter($"t" =!= "").count()
    assert(o.agg(sum($"n_tokens")).head.getLong(0) == corpusTokens)
    // 20 of ~31 vocabulary words in-vocab -> mean OOV rate well below 1
    val meanRate = o.agg(avg($"oov_rate")).head.getDouble(0)
    assert(meanRate > 0.0 && meanRate < 0.8, s"mean oov $meanRate")
    o.unpersist()
  }

  test("funnel3: stage counts monotone non-increasing and non-vacuous") {
    val s = spark
    import s.implicits._
    val f = AnalyticsQueries.qFunnel3(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("1_signup") >= f("2_view") && f("2_view") >= f("3_purchase"))
    assert(f("3_purchase") > 0) // the funnel actually converts on this data
  }

  test("path trigrams: counts bounded by total transitions, sorted desc") {
    val s = spark
    import s.implicits._
    val p = AnalyticsQueries.qPathTrigrams(spark, sf).collect()
    assert(p.length == 25)
    val counts = p.map(_.getLong(1))
    assert(counts.toSeq == counts.sortBy(-_).toSeq)
    val ev = Tables.events(spark, sf)
    // exact trigram total: a user with L events contributes max(L-2, 0)
    // trigrams (count - 2*users would UNDERstate it when any user has
    // L < 2, turning the bound spuriously tight on sparse fixtures)
    val transitions = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .agg(sum(greatest($"n" - 2, lit(0L)))).head.getLong(0)
    assert(counts.sum <= transitions)
  }

  test("period change: delta/pct consistent with revenue and prev") {
    val s = spark
    import s.implicits._
    val pc = AnalyticsQueries.qPeriodChange(spark, sf).cache()
    // reconstructible: delta == revenue - prev wherever prev exists
    assert(pc.filter($"prev".isNotNull && $"delta" =!= $"revenue" - $"prev")
      .count() == 0)
    assert(pc.filter($"prev".isNull).count() == 1) // only the first day
    pc.unpersist()
  }

  test("bounce rate: bounded and session counts match the gap sessionizer") {
    val s = spark
    import s.implicits._
    val b = AnalyticsQueries.qBounceRate(spark, sf).cache()
    assert(b.filter($"bounce_rate" < 0 || $"bounce_rate" > 1).count() == 0)
    assert(b.filter($"n_bounces" > $"n_sessions").count() == 0)
    assert(b.filter($"n_bounces" > 0).count() > 0) // non-vacuous
    b.unpersist()
  }

  test("fk audit: child totals match tables, planted orphans are counted") {
    val s = spark
    import s.implicits._
    val rows = AnalyticsQueries.qFkAudit(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 6)
    assert(rows.values.forall(_._2 == 0L)) // consistent generator: no orphans
    assert(rows("lineitem.orderkey->orders")._1 ==
      Tables.lineitem(spark, sf).count())
    // planted: 2 of 5 children point at a missing parent
    val child = Seq(1L, 2L, 3L, 99L, 98L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = AnalyticsQueries.fkAudit("t", child, "k", parent, "pk")
      .head
    assert(got.getLong(1) == 5L && got.getLong(2) == 2L)
  }

  test("benford: digits 1-9, shares sum to 1, counts match orders") {
    val s = spark
    import s.implicits._
    val b = AnalyticsQueries.qBenford(spark, sf).collect()
    assert(b.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 9))
    assert(math.abs(b.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    val expected = Tables.orders(spark, sf).filter($"o_totalprice" >= 1.0).count()
    assert(b.map(_.getLong(1)).sum == expected)
  }

  test("assoc rules: confidence in (0,1], lift positive, pair support <= item support") {
    val s = spark
    import s.implicits._
    val r = AnalyticsQueries.qAssocRules(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 25)
    assert(r.forall(x => x.getDouble(3) > 0 && x.getDouble(3) <= 1.0))
    assert(r.forall(_.getDouble(4) > 0))
    val sups = r.map(_.getLong(2))
    assert(sups.toSeq == sups.sortBy(-_).toSeq)
  }

  test("rfm: scores in 1..5, quintiles roughly balanced, rfm digit-consistent") {
    val s = spark
    import s.implicits._
    val m = AnalyticsQueries.qRfm(spark, sf).cache()
    for (c <- Seq("r_score", "f_score", "m_score"))
      assert(m.filter(col(c) < 1 || col(c) > 5).count() == 0, c)
    assert(m.filter($"rfm" =!=
      $"r_score" * 100 + $"f_score" * 10 + $"m_score").count() == 0)
    // monetary quintiles from exact boundaries: each bucket holds 10-30%
    val total = m.count().toDouble
    val byM = m.groupBy($"m_score").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((1 to 5).forall(q => byM.getOrElse(q, 0L) / total > 0.10 &&
      byM.getOrElse(q, 0L) / total < 0.30), byM.toString)
    m.unpersist()
  }

  test("seasonality: ISO weekday grid, shares sum to 1, counts to all events") {
    val s = spark
    import s.implicits._
    val g = AnalyticsQueries.qSeasonality(spark, sf).cache()
    assert(g.filter($"dow" < 1 || $"dow" > 7 || $"hr" < 0 || $"hr" > 23).count() == 0)
    assert(math.abs(g.agg(sum($"share")).head.getDouble(0) - 1.0) < 1e-9)
    assert(g.agg(sum($"n")).head.getLong(0) == Tables.events(spark, sf).count())
    g.unpersist()
  }

  test("revenue concentration: top decile is ~10% of customers, share in (0.1, 1)") {
    val s = spark
    import s.implicits._
    val r = AnalyticsQueries.qRevenueConc(spark, sf).head
    val (nCust, nTop, share) = (r.getLong(0), r.getLong(1), r.getDouble(4))
    assert(nTop <= nCust / 8 && nTop >= nCust / 12, s"$nTop of $nCust")
    // the top decile must carry MORE than a tenth of revenue
    assert(share > 0.1 && share < 1.0, share)
  }

  test("ab test: arms partition users, rates reconstruct, z matches hand formula") {
    val s = spark
    import s.implicits._
    val r = AnalyticsQueries.qAbTest(spark, sf).head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(na + nb == users)
    assert(r.getDouble(4) == ca.toDouble / na && r.getDouble(5) == cb.toDouble / nb)
    val pool = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(6) - (ca.toDouble / na - cb.toDouble / nb) / se) < 1e-12)
  }

  test("clustering coefficient in [0,1]; assortativity in [-1,1]") {
    val s = spark
    import s.implicits._
    val cc = GraphQueries.qClusteringCoef(spark, sf)
    assert(cc.filter($"coef" < 0 || $"coef" > 1).count() == 0)
    // a node with a triangle must have degree >= 2
    assert(cc.filter($"n_triangles" > 0 && $"deg" < 2).count() == 0)
    val r = GraphQueries.qDegreeCorr(spark, sf).head
    val a = r.getDouble(1)
    assert(a >= -1.0 && a <= 1.0, s"assortativity $a")
  }

  test("embed quant: values land in [-128, 127] and reconstruct within 1/127") {
    val s = spark
    import s.implicits._
    val q = AnalyticsQueries.qEmbedQuant(spark, sf).cache()
    assert(q.filter($"qmin" < -128 || $"qmax" > 127).count() == 0)
    // a vector's max-|x| dimension quantizes to 127 (positive max) or
    // -128/-127 (negative): qmax or |qmin| must reach 126+ for every row
    assert(q.filter($"maxabs" > 0 && $"qmax" < 126 && $"qmin" > -127).count() == 0)
    // dequantized qsum approximates the true coordinate sum within n*step
    val truth = Tables.embeddings(spark, sf).select($"vec_id",
      aggregate(transform($"embedding", _.cast("double")), lit(0.0),
        (a, x) => a + x).as("true_sum"))
    val err = q.join(truth, "vec_id")
      .filter($"maxabs" > 0)
      .select(abs($"qsum" * $"maxabs" / 127.0 - $"true_sum").as("e"),
        ($"maxabs" / 127.0 * 64.0).as("bound")) // 64 dims, 1 step each
      .filter($"e" > $"bound").count()
    assert(err == 0)
    q.unpersist()
  }
}
