package pystreamsspark.relational

import pystreamsspark.SparkSpec

/** Behavioral checks for the data-QA key family added in round 5:
  * Wilson-bound ranking, bottom-k sampled quantiles, per-label
  * embedding outliers, and k-means cluster purity. The DuckDB oracle
  * pins exact values; these tests pin the SEMANTICS (shrinkage,
  * sampling error bounds, outlier-ness, purity algebra) that a
  * hash-match alone doesn't explain.
  */
class QaKeysSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q_wilson: lower bound strictly shrinks the raw rate, never below 0") {
    val rows = AnalyticsQueries.qWilson(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val k = r.getAs[Long]("k")
      val lb = r.getAs[Double]("wilson_lb")
      val p = k.toDouble / n.toDouble
      assert(lb >= 0.0, s"lb=$lb")
      if (k > 0 && k < n) assert(lb < p, s"lb=$lb !< p=$p (n=$n k=$k)")
    }
    // ranking is by the bound, descending
    val lbs = rows.map(_.getAs[Double]("wilson_lb")).toSeq
    assert(lbs == lbs.sorted.reverse)
  }

  test("q_wilson: the bound is sample-size-aware (same rate, smaller n => smaller bound)") {
    // pure function check on the closed form the key uses: p=0.5 at
    // n=10 must get a weaker (lower) bound than p=0.5 at n=1000
    def wilson(k: Long, n: Long): Double = {
      val z = 1.96; val p = k.toDouble / n
      ((p + z * z / (2.0 * n)) -
        z * math.sqrt((p * (1 - p) + z * z / (4.0 * n)) / n)) /
        (1.0 + z * z / n)
    }
    assert(wilson(5, 10) < wilson(500, 1000))
    assert(wilson(500, 1000) < 0.5)
  }

  test("q_quantile_sample: 128-point bottom-k median lands near the exact median") {
    val rows = AggQueries.qQuantileSample(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val exact = r.getAs[Double]("exact_p50")
      val est = r.getAs[Double]("sample_p50")
      // quantity is ~uniform on 1..50; the k=128 sample median's 3-sigma
      // band is ~ 3 * 50 * sqrt(0.25/128) ≈ 6.6
      assert(math.abs(est - exact) <= 8.0,
        s"flag=${r.getString(0)} exact=$exact est=$est")
      assert(r.getAs[Long]("n") > 128L) // the sketch actually subsampled
    }
  }

  test("q_embed_outlier: top-20 are genuine tail points of their label clouds") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val out = AnalyticsQueries.qEmbedOutlier(spark, sf).collect()
    assert(out.length == 20)
    val d = out.map(_.getAs[Double]("dist2")).toSeq
    assert(d == d.sorted.reverse && d.forall(_ >= 0.0))
    // mean within-label squared distance (same quantized arithmetic)
    // must sit well below the flagged outliers
    val q = pystreamsspark.io.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label",
        posexplode(transform($"embedding",
          x => floor(x.cast("double") * lit(1024.0)).cast("long"))))
      .withColumnRenamed("col", "q")
    val cent = q.groupBy($"label", $"pos")
      .agg(sum($"q").as("sc"), count(lit(1)).as("n"))
    val stats = q.join(broadcast(cent), Seq("label", "pos"))
      .groupBy($"vec_id", $"label", $"n")
      .agg(sum(($"n" * $"q" - $"sc") * ($"n" * $"q" - $"sc")).as("d2n2"))
      .select(($"d2n2".cast("double") /
        ($"n" * $"n" * lit(1048576L)).cast("double")).as("dist2"))
      .agg(avg($"dist2"), max($"dist2")).head
    val (meanD2, maxD2) = (stats.getDouble(0), stats.getDouble(1))
    // the reported #1 outlier IS the global argmax, and it sits above
    // the average point (the synthetic clouds are diffuse, so only a
    // modest margin is guaranteed — exact separation is data-dependent)
    assert(d.head == maxD2, s"top outlier ${d.head} != global max $maxD2")
    assert(d.head > meanD2,
      s"top outlier ${d.head} not above mean $meanD2")
  }

  test("q_span_mask: exactly one sentinel, and unmasking reconstructs the document") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val masked = PipelineQueries.qSpanMask(spark, sf)
    val orig = pystreamsspark.io.Tables.documents(spark, sf)
      .select($"doc_id",
        concat_ws(" ", filter(split($"text", " "), t => t =!= "")).as("norm"))
    val joined = masked.join(orig, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val m = r.getAs[String]("masked_text")
      val t = r.getAs[String]("target_text")
      val n = r.getAs[Long]("n")
      assert("<extra_id_0>".r.findAllIn(m).size == 1, s"doc ${r.get(0)}")
      // target is 5 tokens (or the whole doc when shorter)
      val tlen = if (t.isEmpty) 0 else t.split(" ").length
      assert(tlen == math.min(5L, n), s"doc ${r.get(0)}: target len $tlen n=$n")
      // splicing the target back over the sentinel restores the original
      val rebuilt = m.replace("<extra_id_0>", t).replace("  ", " ").trim
      assert(rebuilt == r.getAs[String]("norm"), s"doc ${r.get(0)} mismatch")
    }
  }

  test("q_ks_test: the windowed D statistic equals a direct two-ECDF recomputation") {
    val s = spark
    import s.implicits._
    val r = AnalyticsQueries.qKsTest(spark, sf).head
    val d = r.getAs[Double]("d_stat")
    assert(d >= 0.0 && d <= 1.0)
    // independent recomputation: collect both samples, walk the merged
    // value set in plain Scala
    val ev = pystreamsspark.io.Tables.events(spark, sf)
      .filter($"event_type".isin("click", "view"))
      .select($"event_type", $"value").collect()
    val a = ev.filter(_.getString(0) == "click").map(_.getDouble(1)).sorted
    val b = ev.filter(_.getString(0) == "view").map(_.getDouble(1)).sorted
    val dRef = (a ++ b).distinct.map { x =>
      val fa = a.count(_ <= x).toDouble / a.length
      val fb = b.count(_ <= x).toDouble / b.length
      math.abs(fa - fb)
    }.max
    assert(math.abs(d - dRef) < 1e-12, s"key=$d ref=$dRef")
  }

  test("q_auc: rank-sum AUC equals the direct pairwise probability") {
    val s = spark
    import s.implicits._
    val r = AnalyticsQueries.qAuc(spark, sf).head
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    val ev = pystreamsspark.io.Tables.events(spark, sf)
      .select(($"event_type" === "purchase").as("p"), $"value").collect()
    val pos = ev.filter(_.getBoolean(0)).map(_.getDouble(1)).sorted
    val neg = ev.filterNot(_.getBoolean(0)).map(_.getDouble(1)).sorted
    // P(score_pos > score_neg) + 0.5 P(tie), via binary search on the
    // sorted negative side — O(n log n), no 16M-pair loop
    def lower(xs: Array[Double], x: Double): Int = {
      var lo = 0; var hi = xs.length
      while (lo < hi) { val m = (lo + hi) / 2; if (xs(m) < x) lo = m + 1 else hi = m }
      lo
    }
    def upper(xs: Array[Double], x: Double): Int = {
      var lo = 0; var hi = xs.length
      while (lo < hi) { val m = (lo + hi) / 2; if (xs(m) <= x) lo = m + 1 else hi = m }
      lo
    }
    val num = pos.map { x =>
      lower(neg, x).toDouble + 0.5 * (upper(neg, x) - lower(neg, x))
    }.sum
    val ref = num / (pos.length.toDouble * neg.length.toDouble)
    assert(math.abs(auc - ref) < 1e-12, s"key=$auc ref=$ref")
  }

  test("q_gini: coefficient matches a plain sorted-array recomputation") {
    val s = spark
    import s.implicits._
    val r = AnalyticsQueries.qGini(spark, sf).head
    val g = r.getAs[Double]("gini")
    assert(g > 0.0 && g < 1.0)
    val per = pystreamsspark.io.Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions.sum($"o_totalprice").as("m"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
      .sortBy { case (ck, m) => (m, ck) }.map(_._2)
    val n = per.length
    val t = per.sum
    val w = per.zipWithIndex.map { case (m, i) => (i + 1).toDouble * m }.sum
    val ref = (2.0 * w - (n + 1).toDouble * t) / (n.toDouble * t)
    assert(math.abs(g - ref) < 1e-9, s"key=$g ref=$ref")
  }

  test("q_ivf_recall: hits are bounded by the cell and the answer set, recall is hits/10") {
    val rows = PipelineQueries.qIvfRecall(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val nCell = r.getAs[Long]("n_cell")
      val hits = r.getAs[Long]("hits")
      val rec = r.getAs[Double]("recall_at10")
      assert(hits >= 1L, "the probe itself is in its own cell and in gt")
      assert(hits <= 10L && hits <= nCell)
      assert(rec == hits.toDouble / 10.0)
    }
    // nprobe=1 on a diffuse synthetic cloud must lose SOME neighbors —
    // if recall were 1.0 everywhere the harsh setting isn't being tested
    assert(rows.map(_.getAs[Long]("hits")).sum < 50L)
  }

  test("q_lsh_eval: weak bands trade precision for recall, metrics are consistent") {
    val r = LlmQueries.qLshEval(spark, sf).head
    val (nT, nC, nH) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_hit"))
    assert(nT > 0L && nC > 0L)
    assert(nH <= nT && nH <= nC)
    assert(r.getAs[Double]("precision") == nH.toDouble / nC)
    assert(r.getAs[Double]("recall") == nH.toDouble / nT)
    // the planted near-exact dups agree on every band => full recall,
    // and 2-row bands must also admit SOME false candidates
    assert(r.getAs[Double]("recall") == 1.0)
    assert(nC > nH, "weak banding should surface false candidates")
  }

  test("q_twa: time-weighted mean matches a plain-Scala replay and stays in range") {
    val s = spark
    import s.implicits._
    val rows = TimeQueries.qTwa(spark, sf).collect()
    assert(rows.length == 5)
    val ev = pystreamsspark.io.Tables.events(spark, sf)
      .select($"event_type", $"ts", $"event_id", $"value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getDouble(3)))
    rows.foreach { r =>
      val et = r.getString(0)
      val twa = r.getAs[Double]("twa")
      val series = ev.filter(_._1 == et).sortBy(t => (t._2, t._3))
      val vals = series.map(_._4)
      assert(twa >= vals.min && twa <= vals.max)
      val (wsum, tsum) = series.zip(series.tail).map { case (a, b) =>
        (a._4 * (b._2 - a._2), b._2 - a._2)
      }.foldLeft((0.0, 0L)) { case ((w, t), (dw, dt)) => (w + dw, t + dt) }
      assert(math.abs(twa - wsum / tsum.toDouble) < 1e-9,
        s"$et: key=$twa ref=${wsum / tsum.toDouble}")
      assert(r.getAs[Long]("n") == series.length - 1L)
    }
  }

  test("q_scale_norm: minmax lands in [0,1], z-scores have zero mean and unit variance") {
    val rows = PipelineQueries.qScaleNorm(spark, sf).collect()
    assert(rows.length == 10000)
    val byType = rows.groupBy(_.getString(1))
    assert(byType.size == 5)
    byType.foreach { case (et, rs) =>
      val mm = rs.map(_.getAs[Double]("minmax"))
      assert(mm.min == 0.0 && mm.max == 1.0, s"$et minmax range")
      val z = rs.map(_.getAs[Double]("zscore"))
      val mz = z.sum / z.length
      val vz = z.map(x => (x - mz) * (x - mz)).sum / (z.length - 1)
      assert(math.abs(mz) < 1e-9, s"$et z mean $mz")
      assert(math.abs(vz - 1.0) < 1e-9, s"$et z var $vz")
    }
  }

  test("q_rolling_corr: coefficients stay in [-1,1] and match a plain-Scala frame replay") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rows = TimeQueries.qRollingCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("corr24")) <= 1.0 + 1e-12))
    // replay the last frame in plain Scala from the hourly series
    val hourly = pystreamsspark.io.Tables.events(spark, sf)
      .filter($"event_type".isin("click", "view"))
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(coalesce(sum(when($"event_type" === "click", $"value")), lit(0.0)).as("x"),
        coalesce(sum(when($"event_type" === "view", $"value")), lit(0.0)).as("y"))
      .orderBy($"hour").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val frame = hourly.takeRight(24)
    val n = frame.length.toDouble
    val (sx, sy) = (frame.map(_._1).sum, frame.map(_._2).sum)
    val sxy = frame.map(t => t._1 * t._2).sum
    val sxx = frame.map(t => t._1 * t._1).sum
    val syy = frame.map(t => t._2 * t._2).sum
    val ref = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(rows.last.getAs[Double]("corr24") - ref) < 1e-9,
      s"key=${rows.last.getAs[Double]("corr24")} ref=$ref")
  }

  test("q_window_funnel: levels partition the active users, chain is consistent") {
    val s = spark
    import s.implicits._
    val rows = TimeQueries.qWindowFunnel(spark, sf).collect()
    val levels = rows.map(r => r.getAs[Long]("level") -> r.getAs[Long]("n_users")).toMap
    assert(levels.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    val total = pystreamsspark.io.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(levels.values.sum == total, s"levels $levels must partition $total users")
    // a level-k user had a qualifying step k, so some users must reach 1+
    assert(levels.collect { case (k, n) if k >= 1L => n }.sum > 0L)
  }

  test("q_dataset_card: the card's counts match independent recomputation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val r = LlmQueries.qDatasetCard(spark, sf).head
    val docs = pystreamsspark.io.Tables.documents(spark, sf)
    assert(r.getAs[Long]("n_docs") == docs.count())
    val nTok = docs.select(explode(filter(split($"text", " "), x => x =!= "")))
      .count()
    assert(r.getAs[Long]("n_tokens") == nTok)
    assert(r.getAs[Double]("mean_doc_tokens") ==
      nTok.toDouble / r.getAs[Long]("n_docs"))
    val dr = r.getAs[Double]("dup_rate")
    assert(dr >= 0.0 && dr < 1.0)
  }

  test("q_cluster_purity: purity algebra holds and every point is accounted for") {
    val rows = PipelineQueries.qClusterPurity(spark, sf).collect()
    assert(rows.length == 8) // k=8, empty-cell guard keeps all seeds
    var total = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val topN = r.getAs[Long]("top_n")
      val purity = r.getAs[Double]("purity")
      assert(topN >= 1L && topN <= n)
      assert(math.abs(purity - topN.toDouble / n.toDouble) == 0.0)
      assert(purity > 0.0 && purity <= 1.0)
      total += n
    }
    val all = pystreamsspark.io.Tables.embeddings(spark, sf).count()
    assert(total == all, s"cells cover $total of $all points")
  }
}
