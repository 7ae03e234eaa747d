package pystreamsspark.operators

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** Misra–Gries guarantees on an adversarial vocabulary ≫ capacity —
  * the regime the registered token key (31-word vocab < m) can't reach:
  * planted heavy items inside uniform noise, distinct ≈ 5000 vs m = 64.
  */
class HeavyHittersSpec extends SparkSpec {

  // 10 planted heavy items (1000 occurrences each) + 40k noise items
  // over ~5000 distinct values; n = 50k, n/(m+1) with m=64 is ~770, so
  // the MG guarantee must retain every planted item.
  private def skewed = {
    val s = spark
    import s.implicits._
    val heavy = (0 until 10).flatMap(h => Seq.fill(1000)(s"heavy_$h"))
    val noise = (0 until 40000).map(i => s"noise_${(i * 7919) % 5000}")
    val mixed = (heavy ++ noise).zipWithIndex
      .sortBy { case (v, i) => (i * 104729) % 50000 } // deterministic shuffle
      .map(_._1)
    mixed.toDF("item").repartition(11)
  }

  test("MG summary retains every item with freq > n/(m+1)") {
    val s = spark
    import s.implicits._
    val sketch = skewed.agg(HeavyHitters.mg(64)($"item").as("sk"))
      .select(explode(map_keys($"sk")).as("k"))
      .as[String].collect().toSet
    (0 until 10).foreach { h =>
      assert(sketch.contains(s"heavy_$h"), s"heavy_$h evicted from sketch")
    }
    assert(sketch.size <= 64)
  }

  test("exactTopK equals the full groupBy top-k when the certificate holds") {
    val s = spark
    import s.implicits._
    val df = skewed
    val got = HeavyHitters.exactTopK(df, "item", 10, m = 64)
      .as[(String, Long)].collect().toSeq
    val expect = df.groupBy($"item").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"item".asc).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(got == expect)
    // certificate: the exact 10th count must beat the MG threshold
    val n = df.count()
    assert(got.last._2 > n / 65, s"certificate violated: ${got.last._2} <= ${n / 65}")
  }

  test("sketch counts underestimate true counts by at most n/(m+1)") {
    val s = spark
    import s.implicits._
    val sk = skewed.agg(HeavyHitters.mg(64)($"item").as("sk"))
      .select(explode($"sk").as(Seq("k", "c")))
      .as[(String, Long)].collect().toMap
    val truth = skewed.groupBy($"item").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val n = truth.values.sum
    sk.foreach { case (k, c) =>
      assert(c <= truth(k), s"$k overestimated: $c > ${truth(k)}")
      assert(c >= truth(k) - n / 65, s"$k underestimated beyond bound")
    }
  }
}
