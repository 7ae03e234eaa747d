package pystreamsspark.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Big-big range joins as bin-bucketed EQUI-joins.
  *
  * Spark has no native range-join strategy: a non-equi join between two
  * large tables falls back to BroadcastNestedLoopJoin (if one side fits)
  * or a cartesian — both O(n·m) row comparisons. The standard rewrite
  * (used by every engine that does optimize this, and by the interval-
  * join literature) buckets the value domain into fixed-width bins:
  * each interval is replicated onto every bin it overlaps, each point
  * lands in exactly ONE bin, and the join becomes an equi-join on the
  * bin id with the range predicate left as a cheap residual filter.
  * Catalyst then shuffles both sides by bin — fully parallel, no
  * nested loop anywhere in the plan.
  *
  * Output multiplicity needs NO dedup: a (point, interval) pair meets
  * exactly once, in the point's unique bin (the interval's replica for
  * that bin), so the result is row-identical to the theta join.
  *
  * Cost model: each interval produces `width/binWidth + 1` replicas, so
  * pick `binWidth` near the TYPICAL interval width — replication stays
  * O(1) per interval while each bin's candidate set stays local. At
  * 100 TB the bin key is as shuffle-friendly as any groupBy key; skew
  * only appears if intervals pile onto one bin, which the residual
  * filter bounds to true matches (and [[Salted.joinSkewed]] covers the
  * pathological case).
  */
object RangeJoin {

  /** Inner join of `points` to `intervals` on
    * `equiKeys` ∧ `lo <= p <= hi` (closed bounds), executed as a
    * bin-bucketed equi-join. Column names must be disjoint apart from
    * `equiKeys` (standard join hygiene). */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    points.withColumn("__bin", bin(col(pCol)))
      .join(iv, equiKeys :+ "__bin")
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Inner join of two interval sets on
    * `equiKeys` ∧ intervals-overlap (closed bounds: llo ≤ rhi ∧ rlo ≤ lhi),
    * bin-bucketed like [[pointInInterval]]. Both sides replicate onto
    * their overlapped bins, so a pair can share SEVERAL bins; exactly-
    * once output comes from the standard ownership rule — a pair is
    * emitted only in the bin where the overlap STARTS,
    * `max(bin(llo), bin(rlo))` (= `bin(max(llo, rlo))`, floor being
    * monotone), which both replica ranges are guaranteed to contain
    * whenever the intervals overlap. No dedup, no window. */
  def intervalOverlap(left: DataFrame, lloCol: String, lhiCol: String,
                      right: DataFrame, rloCol: String, rhiCol: String,
                      binWidth: Double, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val l = left.withColumn("__bin",
      explode(sequence(bin(col(lloCol)), bin(col(lhiCol)))))
    val r = right.withColumn("__bin",
      explode(sequence(bin(col(rloCol)), bin(col(rhiCol)))))
    l.join(r, equiKeys :+ "__bin")
      .filter(col(lloCol) <= col(rhiCol) && col(rloCol) <= col(lhiCol) &&
        col("__bin") === greatest(bin(col(lloCol)), bin(col(rloCol))))
      .drop("__bin")
  }
}
