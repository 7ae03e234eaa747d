package pystreamsspark.relational

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** Bounds check for the HLL++ approximate distinct (its sketch differs
  * from DuckDB's, so it's excluded from the oracle set — correctness
  * here means staying within the documented error bound). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within rsd bounds of exact") {
    val s = spark
    import s.implicits._
    val data = (1 to 50000).map(i => (i % 4, (i * 2654435761L) % 9973))
    val df = data.toDF("grp", "v")
    val rows = df.groupBy($"grp")
      .agg(countDistinct($"v").as("exact"),
        approx_count_distinct($"v", rsd = 0.05).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.15,
        s"grp=${r.getInt(0)} exact=$exact approx=$approx")
    }
  }

  test("approx result is deterministic across partitionings") {
    val s = spark
    import s.implicits._
    val df = (1 to 20000).map(i => (i % 3, i % 4999)).toDF("grp", "v")
    def run(parts: Int) = df.repartition(parts).groupBy($"grp")
      .agg(approx_count_distinct($"v").as("a"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // HLL merge is commutative/idempotent: same registers whatever the layout
    assert(run(2) === run(16))
  }
}
