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

  test("decimal->double stays correctly rounded on >2^53 unscaled values") {
    val s = spark
    import s.implicits._
    // 17-significant-digit decimals whose unscaled value exceeds 2^53 —
    // the range where a naive (double)unscaled / (double)10^scale
    // conversion double-rounds 1 ulp off. Spark's cast AND Det.d2d must
    // both equal the correctly-rounded parse. (The engine that DOES
    // misround here is DuckDB's direct decimal->double cast — verified
    // on q_corr_manual's syy sum, 7096786968835.8685 -> 1 ulp high —
    // which is why every float ORACLE casts its decimal aggregates
    // through STRING; see Det.sqlSum and the verify skill.)
    val cases = Seq("7096786968835.8685", "6470832125744.2331",
      "8030755418172.1740", "4838227780133.8157", "8967546369622.3508")
    cases.foreach { str =>
      val dec = new java.math.BigDecimal(str)
      val row = Seq(1).toDF("x")
        .select(
          lit(dec).cast("double").as("plain"),
          Det.d2d(lit(dec)).as("viaString"))
        .head
      val correct = java.lang.Double.parseDouble(str)
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(correct), s"plain cast wrong for $str")
      assert(java.lang.Double.doubleToLongBits(row.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(correct), s"d2d wrong for $str")
    }
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
