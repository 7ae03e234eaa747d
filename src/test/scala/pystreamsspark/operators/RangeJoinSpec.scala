package pystreamsspark.operators

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** The bin-bucketed range join must be pair-identical to the theta join
  * it replaces — including intervals spanning many bins, points exactly
  * on closed bounds, negative domains, and degenerate (empty) intervals
  * — and its plan must contain no nested loop.
  */
class RangeJoinSpec extends SparkSpec {

  test("pointInInterval equals the theta join pair-for-pair") {
    val s = spark
    import s.implicits._
    // points over a negative-to-positive domain, many on bin edges
    val pts = (-200 to 200).map(i => (i.toLong, i * 2.5)).toDF("pid", "p")
    // widths from 0 (single-point) to 40x the bin width, plus one
    // inverted (empty) interval that must match nothing
    val iv = Seq(
      (1L, -100.0, -100.0), (2L, -55.0, 45.0), (3L, 0.0, 400.0),
      (4L, 17.5, 17.5), (5L, -500.0, -499.0), (6L, 10.0, -10.0),
      (7L, 399.0, 500.0), (8L, -1.0, 1.0))
      .toDF("iid", "lo", "hi")
    val binned = RangeJoin.pointInInterval(pts, "p", iv, "lo", "hi",
        binWidth = 10.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted
    val theta = pts.join(iv, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted
    assert(binned.sameElements(theta))
    assert(theta.nonEmpty)
    // closed bounds: the single-point interval (4) caught its point
    assert(theta.exists(_._2 == 4L))
    // empty interval matched nothing
    assert(!binned.exists(_._2 == 6L))
  }

  test("intervalOverlap equals the theta join, exactly once per pair") {
    val s = spark
    import s.implicits._
    // dense overlapping mesh: many pairs share SEVERAL bins, so any
    // failure of the bin-ownership rule shows up as duplicate rows and
    // breaks the multiset comparison
    val a = (0 until 120).map { i =>
      (i.toLong, (i * 7 % 50).toDouble, (i * 7 % 50 + i % 37).toDouble)
    }.toDF("aid", "a_lo", "a_hi")
    val b = (0 until 90).map { i =>
      (i.toLong, (i * 11 % 60 - 10).toDouble, (i * 11 % 60 - 10 + i % 29).toDouble)
    }.toDF("bid", "b_lo", "b_hi")
    val binned = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
        binWidth = 5.0)
      .select($"aid", $"bid").as[(Long, Long)].collect().sorted
    val theta = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select($"aid", $"bid").as[(Long, Long)].collect().sorted
    assert(binned.sameElements(theta))
    assert(theta.length > 1000) // the mesh is genuinely dense
    // exactly-once: no duplicates in the binned output
    assert(binned.distinct.length == binned.length)
  }

  test("q_interval_join plan has no nested loop or cartesian") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = pystreamsspark.relational.JoinQueries
      .qIntervalJoin(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }).toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
