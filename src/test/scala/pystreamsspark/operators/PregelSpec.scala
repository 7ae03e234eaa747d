package pystreamsspark.operators

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** The Pregel iteration operator (round-10 task: ONE owner for the loop
  * plumbing the graph algorithms hand-rolled): superstep plan shape,
  * fixpoint policies, and convergence failure modes. The re-expressed
  * algorithms' VALUES stay pinned by their own oracle keys
  * (q_pagerank/q_bfs_hops/q_label_prop/q_kcore/q_sssp/q_cc_*). */
class PregelSpec extends SparkSpec {

  import Pregel._

  private def edgesDf = {
    import spark.implicits._
    // a 6-chain plus a triangle: two components
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("a", "b")
  }

  test("aggregateMessages keeps the one-join + one-agg round shape") {
    import spark.implicits._
    val adj = edgesDf.select($"a".as("src"), $"b".as("dst"))
      .unionAll(edgesDf.select($"b".as("src"), $"a".as("dst")))
    // literal state frame: the asserted plan must contain ONLY the
    // superstep's nodes, not state-derivation artifacts
    val state = Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L, 12L)
      .toDF("id").select($"id", lit(1L).as("x"))
    val round = aggregateMessages(adj, state,
      msgs = Seq($"x".as("m")), aggs = Seq(sum($"m").as("s")))
    val plan = round.queryExecution.executedPlan.toString
    // exactly one join...
    val joins = "(?i)(sortmergejoin|broadcasthashjoin|shuffledhashjoin)".r
      .findAllIn(plan).size
    assert(joins === 1, s"expected 1 join, plan:\n$plan")
    // ...and one partial+final hash aggregate pair (2 HashAggregate
    // nodes), nothing else — no windows, no extra aggs
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs === 2, s"expected partial+final agg, plan:\n$plan")
    assert(!plan.contains("Window"))
    // values: each node receives the count of its neighbors
    val got = round.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 1L && got(2L) === 2L && got(10L) === 2L)
  }

  test("iterate: fixed rounds without a fingerprint run exactly maxRounds") {
    import spark.implicits._
    val (st, rounds) = iterate(Seq(0L).toDF("v"), 3) { (s, _) =>
      s.select(($"v" + 1).as("v"))
    }
    assert(rounds === 3)
    assert(st.head.getLong(0) === 3L)
  }

  test("iterate: a monotone fingerprint stops the loop at the fixpoint") {
    import spark.implicits._
    // state converges after 2 steps: v -> max(v-1, 0) from 2
    val (st, rounds) = iterate(Seq(2L, 0L).toDF("v"), 10,
      Policy(fingerprint = Some(df =>
        df.agg(coalesce(sum($"v"), lit(0L))).head.getLong(0)))) { (s, _) =>
      s.select(greatest($"v" - 1, lit(0L)).as("v"))
    }
    // rounds: step1 sum 1, step2 sum 0, step3 sum 0 == converged
    assert(rounds === 3)
    assert(st.agg(sum($"v")).head.getLong(0) === 0L)
  }

  test("iterate: requireConverged fails loudly when rounds run out") {
    import spark.implicits._
    intercept[IllegalStateException] {
      iterate(Seq(1L).toDF("v"), 2,
        Policy(fingerprint = Some(df => df.head.getLong(0)),
          requireConverged = true)) { (s, _) =>
        s.select(($"v" + 1).as("v")) // never converges
      }
    }
  }

  test("iterate: persistRounds + truncateEvery policies preserve results") {
    import spark.implicits._
    val init = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val (a, _) = iterate(init, 7,
      Policy(truncateEvery = 2, persistRounds = true)) { (s, _) =>
      s.select($"id", ($"v" + $"id").as("v"))
    }
    val got = a.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 17L), (2L, 34L)))
  }

  test("re-expressed algorithms agree on a known graph") {
    import spark.implicits._
    // chain 1-..-6 and triangle 10,11,12: CC labels = component minimum
    val cc = pystreamsspark.llm.Dedup.connectedComponents(
      edgesDf.select($"a".as("id_a"), $"b".as("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    val ccStar = pystreamsspark.llm.Dedup.connectedComponentsStar(
      edgesDf.select($"a".as("id_a"), $"b".as("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both variants agree on every node they both label
    for ((id, lab) <- ccStar if cc.contains(id))
      assert(cc(id) === lab, s"variants disagree on $id")
    assert((1L to 6L).forall(i => ccStar.getOrElse(i, 1L) == 1L))
    assert(Seq(10L, 11L, 12L).forall(i => ccStar.getOrElse(i, 10L) == 10L))
    // BFS from node 1: hop = position in the chain; triangle unreachable
    val hops = pystreamsspark.relational.GraphQueries.bfsHops(
      edgesDf, Seq(1L).toDF("id"), maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hops === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 4L, 6L -> 5L))
  }
}
