package pystreamsspark.relational

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec
import pystreamsspark.io.Tables

/** Property checks for the round-3 layout/series/corpus batch beyond the
  * oracle compare: the skyline bucket decomposition vs the naive
  * dominance anti-join, EWMA vs a scalar reference, Morton-key locality,
  * inverted-index posting-list invariants, Simpson-index bounds.
  */
class LayoutAndSeriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("skyline bucket decomposition equals the naive dominance anti-join") {
    val s = spark
    import s.implicits._
    val fast = ExtraQueries.qSkyline(spark, sf)
      .select($"p_partkey").as[Long].collect().toSet
    val parts = Tables.part(spark, sf)
      .select($"p_partkey", $"p_retailprice", $"p_size")
    val dom = parts.as("p").join(parts.as("q"),
      $"q.p_retailprice" < $"p.p_retailprice" &&
        $"q.p_size" >= $"p.p_size", "left_anti")
    val naive = dom.select($"p_partkey").as[Long].collect().toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("skyline contains the global cheapest and no dominated pair") {
    val s = spark
    import s.implicits._
    val sky = ExtraQueries.qSkyline(spark, sf)
      .select($"p_retailprice", $"p_size")
      .as[(Double, Int)].collect()
    // pairwise: no member strictly-cheaper-and-at-least-as-large as another
    for (a <- sky; b <- sky)
      assert(!(a._1 < b._1 && a._2 >= b._2),
        s"$a dominates $b inside the skyline")
    val minPrice = Tables.part(spark, sf)
      .agg(min($"p_retailprice")).head.getDouble(0)
    assert(sky.exists(_._1 == minPrice))
  }

  test("ewma matches a scalar reference on one user's series") {
    val s = spark
    import s.implicits._
    val uid = Tables.events(spark, sf).select($"user_id").as[Long].head()
    val series = Tables.events(spark, sf).filter($"user_id" === uid)
      .orderBy($"ts", $"event_id")
      .select($"event_id", $"value").as[(Long, Double)].collect()
    val got = TimeQueries.qEwma(spark, sf).filter($"user_id" === uid)
      .select($"event_id", $"ewma").as[(Long, Double)].collect().toMap
    val wts = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)
    series.indices.foreach { i =>
      val terms = wts.zipWithIndex.flatMap { case (w, k) =>
        if (i - k >= 0) Some((series(i - k)._2, w)) else None
      }
      // same left-assoc order as the query: k ascending
      val num = terms.map { case (v, w) => v * w }.reduceLeft(_ + _)
      val den = terms.map(_._2).sum.toDouble
      val expect = num / den
      assert(got(series(i)._1) == expect,
        s"row $i: ${got(series(i)._1)} != $expect")
    }
  }

  test("morton key preserves 2-D locality better than lexicographic sort") {
    val s = spark
    import s.implicits._
    // adjacent-in-order rows should be close in BOTH dims under z-order;
    // quantify via mean Chebyshev distance between order-neighbors on the
    // full part table (not the top-200 oracle slice)
    val px = $"p_size".cast("long")
    val py = pmod(floor($"p_retailprice").cast("long"), lit(64L))
    val z = (0 until 6).map { b =>
      (shiftright(px, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b))) +
        (shiftright(py, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }.reduceLeft(_ + _)
    val rows = Tables.part(spark, sf)
      .select(px.as("x"), py.as("y"), z.as("z"))
      .as[(Long, Long, Long)].collect()
    def meanNeighborCheb(sorted: Array[(Long, Long)]): Double = {
      val ds = sorted.sliding(2).map { case Array(a, b) =>
        math.max(math.abs(a._1 - b._1), math.abs(a._2 - b._2)).toDouble
      }.toSeq
      ds.sum / ds.size
    }
    val byZ = meanNeighborCheb(rows.sortBy(_._3).map(r => (r._1, r._2)))
    val byLex = meanNeighborCheb(
      rows.sortBy(r => (r._2, r._1)).map(r => (r._1, r._2)))
    assert(byZ < byLex,
      s"z-order neighbor distance $byZ not below lexicographic $byLex")
  }

  test("inverted index postings are sorted, distinct, df-consistent") {
    val s = spark
    import s.implicits._
    val rows = LlmQueries.qInvertedIndex(spark, sf)
      .select($"df", $"postings").as[(Long, String)].collect()
    assert(rows.length == 200)
    rows.foreach { case (df, postings) =>
      val ids = postings.split(",").map(_.toLong)
      assert(ids.length == math.min(df, 10L),
        s"df=$df but ${ids.length} postings")
      assert(ids.sorted.sameElements(ids) && ids.distinct.length == ids.length)
    }
    // descending df with gram tiebreak => df column itself is sorted desc
    assert(rows.map(_._1).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("smallestK UDAF equals sort-take under repartitioning") {
    val s = spark
    import s.implicits._
    val data = (1 to 997).map(i => ((i * 7919) % 13, ((i * 104729) % 4999).toLong))
    val df = data.toDF("g", "v").repartition(7)
    val got = df.groupBy($"g")
      .agg(pystreamsspark.operators.TopKAgg.smallestK(10)($"v").as("ks"))
      .select($"g", $"ks").as[(Int, Seq[Long])].collect().toMap
    val expect = data.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).sorted.take(10).toSeq
    }
    assert(got == expect)
  }

  test("simpson index is in [0,1] and 1 exactly for single-token docs") {
    val s = spark
    import s.implicits._
    val stats = LlmQueries.qTokenDiversity(spark, sf)
      .select($"n_tokens", $"n_distinct", $"simpson")
      .as[(Long, Long, Double)].collect()
    stats.foreach { case (n, d, simp) =>
      assert(simp >= 0.0 && simp <= 1.0)
      if (d == 1L && n > 1L) assert(simp == 1.0) // all tokens equal
      if (d == n && n > 1L) assert(simp == 0.0)  // all tokens distinct
    }
  }
}
