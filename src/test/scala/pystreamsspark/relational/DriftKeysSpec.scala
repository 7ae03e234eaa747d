package pystreamsspark.relational

import pystreamsspark.SparkSpec

/** Behavioral checks for the round-5 continuation-2 drift/behavior and
  * eval keys. The DuckDB oracle pins exact values; these pin the
  * SEMANTICS — bounds, conservation laws, and cross-key consistency a
  * hash-match alone doesn't explain.
  */
class DriftKeysSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q_autocorr: coefficients are valid correlations in [-1, 1]") {
    val rows = DriftQueries.qAutocorr(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("lag_h")).toSeq == Seq(1, 2, 3))
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 && acf <= 1.0, s"acf=$acf")
    }
    // lag-k pair count = hours − k (one contiguous hourly series)
    val n1 = rows.find(_.getAs[Int]("lag_h") == 1).get.getAs[Long]("n_pairs")
    val n3 = rows.find(_.getAs[Int]("lag_h") == 3).get.getAs[Long]("n_pairs")
    assert(n1 - n3 == 2)
  }

  test("q_chisq_cells: observed counts conserve the total; expectations do too") {
    val rows = DriftQueries.qChisqCells(spark, sf).collect()
    val total = pystreamsspark.io.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("o")).sum == total)
    val eSum = rows.map(_.getAs[Double]("expected")).sum
    assert(math.abs(eSum - total.toDouble) < 1e-6 * total,
      s"sum(expected)=$eSum != $total")
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0.0))
  }

  test("q_psi_bins: shares sum to 1 per cohort, TVD = half the absolute drift sum") {
    val rows = DriftQueries.qPsiBins(spark, sf).collect()
    val p1s = rows.map(_.getAs[Double]("p1")).sum
    val p2s = rows.map(_.getAs[Double]("p2")).sum
    assert(math.abs(p1s - 1.0) < 1e-12 && math.abs(p2s - 1.0) < 1e-12)
    val tvd = rows.head.getAs[Double]("tvd")
    assert(rows.forall(r => r.getAs[Double]("tvd") == tvd)) // one global value
    val half = rows.map(r => math.abs(r.getAs[Double]("drift"))).sum / 2.0
    assert(math.abs(tvd - half) < 1e-12, s"tvd=$tvd vs 0.5*sum|drift|=$half")
    assert(tvd >= 0.0 && tvd <= 1.0)
  }

  test("q_streaks: best streak is bounded by active days; runs partition the days") {
    DriftQueries.qStreaks(spark, sf).collect().foreach { r =>
      val best = r.getAs[Long]("best_streak")
      val days = r.getAs[Long]("active_days")
      val runs = r.getAs[Long]("n_streaks")
      assert(best >= 1 && best <= days)
      assert(runs >= 1 && runs <= days)
      // n runs of total length `days`, the longest at least the mean
      assert(best * runs >= days)
    }
  }

  test("q_attribution: both models credit the same converting-user population") {
    val rows = DriftQueries.qAttribution(spark, sf).collect()
    val byModel = rows.groupBy(_.getAs[String]("model"))
      .view.mapValues(_.map(_.getAs[Long]("n_users")).sum).toMap
    assert(byModel.keySet == Set("first_touch", "last_touch"))
    assert(byModel("first_touch") == byModel("last_touch"))
    // purchases can never take credit: only events strictly BEFORE the
    // first purchase qualify... unless an earlier purchase exists — but
    // the window anchors at the FIRST purchase, so none can precede it
    assert(!rows.exists(_.getAs[String]("touchpoint") == "purchase"))
  }

  test("q_sketch_overlap: estimates track the exact overlap within KMV error") {
    val rows = AggQueries.qSketchOverlap(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_inter").toDouble
      val est = r.getAs[Double]("inter_est")
      val union = r.getAs[Double]("union_est")
      val nA = r.getAs[Long]("n_a"); val nB = r.getAs[Long]("n_b")
      assert(est >= 0.0 && est <= union + 1e-9)
      // k=64 ⇒ relative σ ≈ 1/√62 ≈ 13 %; allow 4σ + small-count slack
      val tol = math.max(10.0, 0.52 * math.max(exact, est))
      assert(math.abs(est - exact) <= tol,
        s"inter est=$est exact=$exact (n_a=$nA n_b=$nB)")
    }
  }

  test("q_modularity / q_conductance agree on the communities' edge totals") {
    val mod = GraphQueries.qModularity(spark, sf).collect()
    val m2 = mod.head.getAs[Long]("m2")
    assert(mod.map(_.getAs[Long]("vol")).sum == m2) // degrees partition 2m
    // global numerator consistent with the per-community columns
    val qScaled = mod.head.getAs[Long]("q_scaled")
    val recomputed = mod.map(r =>
      r.getAs[Long]("intra") * m2 - r.getAs[Long]("vol") * r.getAs[Long]("vol")).sum
    assert(qScaled == recomputed)
    val cond = GraphQueries.qConductance(spark, sf).collect()
    cond.foreach { r =>
      val c = r.getAs[Double]("conductance")
      assert(c >= 0.0 && c <= 1.0, s"conductance=$c")
    }
  }
}
