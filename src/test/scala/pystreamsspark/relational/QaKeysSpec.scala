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
