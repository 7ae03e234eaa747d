package pystreamsspark.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec
import pystreamsspark.io.Tables

/** The injected range-join optimizer rule: a BETWEEN theta-join that
  * vanilla Spark can only plan as BroadcastNestedLoopJoin / cartesian
  * must, with the rule enabled, execute as a bin-bucketed EQUI-join —
  * and produce row-identical results.
  */
class RangeJoinRuleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): String = {
    df.collect()
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    finalPlan(df.queryExecution.executedPlan).toString
  }

  private def thetaJoin(): DataFrame = {
    val s = spark
    import s.implicits._
    val points = Tables.lineitem(s, sf).select($"l_extendedprice", $"l_orderkey")
    val intervals = Tables.orders(s, sf)
      .filter($"o_orderkey" % 50 === 0)
      .select($"o_orderkey".as("iv_id"),
        ($"o_totalprice" - 5.0).as("lo"), ($"o_totalprice" + 5.0).as("hi"))
    points.join(intervals,
        $"l_extendedprice" >= $"lo" && $"l_extendedprice" <= $"hi")
      .groupBy($"iv_id")
      .agg(count(lit(1)).as("n"), sum($"l_orderkey").as("key_sum"))
      .orderBy($"iv_id")
  }

  private def withRule[A](binWidth: Double)(body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinBinRule
    spark.conf.set(RangeJoinBinRule.BinWidthKey, binWidth.toString)
    try body finally {
      spark.conf.unset(RangeJoinBinRule.BinWidthKey)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("rule off: BETWEEN join falls back to a nested-loop plan") {
    val p = executed(thetaJoin())
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"), p)
  }

  test("rule on: same join plans as a bin equi-join, no nested loop, same results") {
    val expected = thetaJoin().collect().toSeq
    withRule(10.0) {
      val df = thetaJoin()
      val p = executed(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), p)
      assert(p.contains("__graft_bin"), p) // the rewrite's equi key
      assert(df.collect().toSeq === expected)
    }
  }

  test("rule does not fire on equi-joins or one-sided ranges") {
    val s = spark
    import s.implicits._
    withRule(10.0) {
      // plain equi-join: untouched (no bin columns anywhere)
      val eq = Tables.orders(s, sf).join(
        Tables.customer(s, sf), $"o_custkey" === $"c_custkey")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
      assert(!executed(eq).contains("__graft_bin"))
      // one-sided range (p >= lo only): not a two-sided range, untouched
      val oneSided = Tables.lineitem(s, sf).select($"l_extendedprice")
        .join(Tables.orders(s, sf).filter($"o_orderkey" % 500 === 0)
          .select(($"o_totalprice" - 5.0).as("lo")),
          $"l_extendedprice" >= $"lo")
        .agg(count(lit(1)).as("n"))
      assert(!executed(oneSided).contains("__graft_bin"))
    }
  }

  private def timestampThetaJoin(): DataFrame = {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, sf)
    val iv = ev.filter($"event_id" % 97 === 0)
      .select($"event_id".as("iv_id"), $"ts".as("lo"),
        ($"ts" + expr("INTERVAL 10 MINUTES")).as("hi"))
    ev.select($"ts", $"value")
      .join(iv, $"ts" >= $"lo" && $"ts" <= $"hi")
      .groupBy($"iv_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .orderBy($"iv_id")
  }

  test("timestamp BETWEEN join: rule bins on epoch-µs, no nested loop, same results") {
    val expected = timestampThetaJoin().collect().toSeq
    assert(expected.nonEmpty)
    withRule(6e8) { // 10 minutes in µs — each interval on ≤2 bins
      val df = timestampThetaJoin()
      val p = executed(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("__graft_bin"), p)
      assert(df.collect().toSeq === expected)
    }
  }
}
