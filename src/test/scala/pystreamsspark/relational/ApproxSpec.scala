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

  test("KMV estimate within error bounds; exact below k; layout-independent") {
    val s = spark
    import s.implicits._
    // estimator branch at sf0.1 (1500 distinct users per type, k=64):
    // KMV relative std error ~ 1/sqrt(k-2) ~ 12.7%; assert 4 sigma
    val rows = AggQueries.qKmvDistinct(spark, "/root/testdata/sf0.1")
      .select($"n_exact", $"kmv_estimate").as[(Long, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (exact, est) =>
      assert(math.abs(est - exact) / exact < 0.51,
        s"exact=$exact kmv=$est off by ${math.abs(est - exact) / exact}")
    }
    // exact branch at sf0.001 (15 distinct < k): estimate IS the count
    AggQueries.qKmvDistinct(spark, "/root/testdata/sf0.001")
      .select($"n_exact", $"kmv_estimate").as[(Long, Double)].collect()
      .foreach { case (exact, est) => assert(est == exact.toDouble) }
    // merge-order independence: the sketch is a bounded sorted list,
    // same k-mins whatever the partitioning
    val a = AggQueries.qKmvDistinct(spark, "/root/testdata/sf0.01")
      .select($"event_type", $"kmv_estimate").as[(String, Double)].collect().toMap
    assert(a.size == 5 && a.values.forall(_ > 0))
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
