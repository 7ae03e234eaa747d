package pystreamsspark.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pregel-style iteration for DataFrame graph algorithms — ONE owner for
  * the loop plumbing every iterative graph operator in this engine was
  * hand-rolling (pageRank / bfsHops / labelPropagation / kCore /
  * ssspBounded in GraphQueries; both connected-components variants in
  * llm.Dedup):
  *
  *  - [[materializeOnce]]: the iteration-INVARIANT frame (adjacency) is
  *    lineage-truncated exactly once, optionally pre-hash-partitioned on
  *    the per-round join key so every round's edges⋈state join reuses
  *    that partitioning instead of re-shuffling the big side;
  *  - [[aggregateMessages]]: the canonical superstep — messages flow
  *    over edges from each vertex's state and aggregate per destination
  *    in ONE join + ONE partial+final aggregate (the plan shape a round
  *    must keep at 100 TB: no windows, no driver data, O(1) shuffles per
  *    round — asserted in PregelSpec);
  *  - [[iterate]]: the round driver owning lineage policy (truncate
  *    every N rounds, eager or lazy), optional persist-per-round
  *    chaining, and the scalar-aggregate FIXPOINT discipline (a
  *    convergence probe is one tiny aggregate per round — sum for
  *    monotone labels, count+hash fingerprints for edge rewrites —
  *    never a join-and-count or a driver-side diff).
  *
  * The knobs exist because the right policy is ALGORITHM-specific and
  * was measured, not guessed (comments at the call sites): min-label CC
  * wants persist-per-round + lazy truncation every 5 rounds (the
  * fixpoint aggregate doubles as the materializing job); star CC wants a
  * lazy truncate every round under its fingerprint; label propagation
  * wants NO per-round materialization at all (AQE stage reuse dedupes
  * the repeated exchanges; eager checkpointing measured 3.5× slower at
  * ×10); k-core re-materializes its shrinking edge set every round.
  */
object Pregel {

  /** Iteration policy — see object scaladoc for why each knob exists.
    *
    * @param truncateEvery  lineage-truncate the state every N rounds
    *                       (0 = never inside the loop)
    * @param eagerTruncate  eager checkpoint vs lazy (lazy lets the
    *                       fixpoint probe be the materializing job)
    * @param persistRounds  persist each round's state and unpersist the
    *                       previous one (the cache-chain style)
    * @param fingerprint    scalar-aggregate convergence probe; the loop
    *                       stops when two consecutive rounds produce the
    *                       same value. Runs once per round (and once on
    *                       the initial state).
    * @param requireConverged throw if maxRounds elapse without the
    *                       fingerprint converging (for algorithms whose
    *                       non-converged state is semantically WRONG to
    *                       read, e.g. star-CC's edge forest)
    */
  final case class Policy(
      truncateEvery: Int = 0,
      eagerTruncate: Boolean = true,
      persistRounds: Boolean = false,
      fingerprint: Option[DataFrame => Any] = None,
      requireConverged: Boolean = false)

  /** Materialize an iteration-invariant frame ONCE — every round
    * re-reads it, and without truncation each round would replay the
    * whole upstream pipeline (at 100 TB: rounds × full re-reads of the
    * biggest input). `partitionOn` pre-hash-partitions on the per-round
    * join key (numShufflePartitions) so the recurring join reuses one
    * shuffle instead of paying it per round. */
  def materializeOnce(df: DataFrame,
                      partitionOn: Option[String] = None): DataFrame = {
    val shaped = partitionOn.map { c =>
      val n = df.sparkSession.sessionState.conf.numShufflePartitions
      df.repartition(n, col(c))
    }.getOrElse(df)
    labeled(df, "pregel:materializeOnce") { Lineage.truncate(shaped) }
  }

  /** Run `body` with a job description so the UI / Jobs probes can
    * attribute the actions this operator itself triggers (guide §1.5);
    * restores the caller's description after. Label-only — no behavior
    * change. */
  private def labeled[A](df: DataFrame, desc: String)(body: => A): A = {
    val sc = df.sparkSession.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** The canonical superstep: join vertex `state` onto `adj`'s source
    * endpoint, project one message per edge, aggregate per destination —
    * one equi-join + one partial+final aggregate, nothing else. `adj`
    * must carry `srcCol`/`dstCol`; `state` is keyed by `stateKey`. The
    * result is keyed by `stateKey` (the destination), holding `aggs`. */
  def aggregateMessages(adj: DataFrame, state: DataFrame,
                        msgs: Seq[Column], aggs: Seq[Column],
                        srcCol: String = "src", dstCol: String = "dst",
                        stateKey: String = "id"): DataFrame =
    adj.join(state.withColumnRenamed(stateKey, srcCol), srcCol)
      .select(col(dstCol).as(stateKey) +: msgs: _*)
      .groupBy(col(stateKey))
      .agg(aggs.head, aggs.tail: _*)

  /** Run the fixpoint loop: `step(state, round)` produces the next
    * state (round is 0-based); the policy owns materialization and
    * convergence. Returns (finalState, roundsRun). */
  def iterate(init: DataFrame, maxRounds: Int, policy: Policy = Policy())
             (step: (DataFrame, Int) => DataFrame): (DataFrame, Int) = {
    var state = if (policy.persistRounds) init.persist() else init
    var fp = policy.fingerprint.map(f =>
      labeled(state, "pregel:round-0-fp") { f(state) })
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      var next = step(state, round)
      round += 1
      if (policy.truncateEvery > 0 && round % policy.truncateEvery == 0)
        next = labeled(next, s"pregel:round-$round-truncate") {
          Lineage.truncate(next, policy.eagerTruncate)
        }
      if (policy.persistRounds) next = next.persist()
      policy.fingerprint.foreach { f =>
        val nfp = labeled(next, s"pregel:round-$round-fp") { f(next) }
        converged = fp.contains(nfp)
        fp = Some(nfp)
      }
      if (policy.persistRounds) state.unpersist(blocking = false)
      state = next
    }
    if (policy.requireConverged && !converged)
      throw new IllegalStateException(
        s"Pregel.iterate did not converge within $maxRounds rounds")
    (state, round)
  }
}
