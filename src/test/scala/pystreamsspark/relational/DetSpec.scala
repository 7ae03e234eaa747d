package pystreamsspark.relational

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** The determinism contract behind every oracle comparison: decimal-cast
  * aggregation is bit-identical at ANY partition count, while raw
  * double summation is not (in general). */
class DetSpec extends SparkSpec {

  test("dsum/davg are invariant under repartitioning") {
    val s = spark
    import s.implicits._
    // values chosen to exercise rounding: large magnitudes + tiny ones
    val rnd = new scala.util.Random(3)
    val data = (1 to 20000).map(i =>
      (i % 7, rnd.nextDouble() * 1e9 + rnd.nextDouble() * 1e-3))
    val df = data.toDF("k", "v")
    def run(parts: Int): Map[Int, (Double, Double)] =
      df.repartition(parts)
        .groupBy($"k")
        .agg(Det.dsum($"v").as("s"), Det.davg($"v").as("a"))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val r1 = run(1)
    val r4 = run(4)
    val r32 = run(32)
    // bit-exact equality, not approximate
    assert(r1 === r4)
    assert(r4 === r32)
  }

  test("dsum equals exact BigDecimal reference") {
    val s = spark
    import s.implicits._
    val data = Seq(0.1, 0.2, 0.3, 1e9, -1e9, 1e-4, 2.5, -0.7)
    val got = data.toDF("v").agg(Det.dsum($"v")).collect()(0).getDouble(0)
    val want = data.map(v =>
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    assert(got === want)
  }
}
