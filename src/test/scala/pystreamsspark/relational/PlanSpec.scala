package pystreamsspark.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import pystreamsspark.SparkSpec

/** Automated plan-shape regression guards — the SCALE.md claims as
  * assertions, not prose. Each test pins the physical property that
  * makes the operator scale; if a refactor ever reintroduces a stray
  * shuffle, loses a pushed filter, or drops a broadcast, these fail
  * before any benchmark notices.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Final (post-AQE if adaptive) physical plan string. */
  private def plan(df: DataFrame): String = {
    df.collect() // drive execution so AQE finalizes the plan
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    finalPlan(df.queryExecution.executedPlan).toString
  }

  private def countOf(s: String, needle: String): Int =
    s.sliding(needle.length).count(_ == needle)

  test("q_filter: compound predicate pushed to the parquet scan") {
    val p = plan(graft.SparkEntry.queries("q_filter")(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual") || p.contains("LessThan"), p)
  }

  test("q1_agg: partial+final hash aggregate around exactly one data shuffle") {
    val p = plan(graft.SparkEntry.queries("q1_agg")(spark, sf))
    assert(countOf(p, "HashAggregate") == 2, p)
    // one exchange for the agg + one for the final orderBy sort, no more
    assert(countOf(p, "Exchange") <= 2, p)
  }

  test("q3_join_topk: dimension joins broadcast; top-k is TakeOrdered, not a full sort") {
    val p = plan(graft.SparkEntry.queries("q3_join_topk")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_sql_q18: aggregate-IN plans as a broadcast LeftSemi, top-100 is TakeOrdered") {
    val p = plan(graft.SparkEntry.queries("q_sql_q18")(spark, sf))
    assert(p.contains("LeftSemi"), p)        // IN-subquery never re-executes per row
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("NestedLoop"), p)
  }

  test("q_lateral_topn: correlated LATERAL decorrelates to WindowGroupLimit") {
    val p = plan(graft.SparkEntry.queries("q_lateral_topn")(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_sample_hash: md5 filter evaluated scan-side before the aggregate shuffle") {
    val df = graft.SparkEntry.queries("q_sample_hash")(spark, sf)
    val p = plan(df)
    // the sampling predicate must sit under the partial aggregate:
    // Filter -> partial HashAggregate -> Exchange (never Exchange first)
    val iFilter = p.indexOf("Filter")
    val iExchange = p.indexOf("Exchange")
    assert(iFilter >= 0 && iExchange >= 0, p)
    // plan strings print top-down: the Exchange must appear BEFORE (above)
    // the Filter, i.e. the filter runs below/before the shuffle
    assert(iExchange < iFilter, p)
  }

  test("q_knn_cosine: probe broadcast, corpus never shuffled") {
    val p = plan(graft.SparkEntry.queries("q_knn_cosine")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_window: single exchange for the partitionBy, rank limit pushed down") {
    val p = plan(graft.SparkEntry.queries("q_window")(spark, sf))
    assert(p.contains("WindowGroupLimit"), p) // row_number<=k prunes in-shuffle
  }

  test("q_contamination: df-cap is partial-agg + broadcast ban list — NO gram window") {
    val p = plan(graft.SparkEntry.queries("q_contamination")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the skew-safe shape: a raw-gram-partitioned Window would put every
    // occurrence of the hottest gram in ONE task; instead the df count
    // must be a map-side-combined partial aggregate (at sf0.001 the ban
    // list is empty and AQE's empty-relation propagation correctly
    // erases the anti-join itself — the LeftAnti shape is asserted below
    // on a corpus that actually HAS an over-cap gram)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count"), p)
  }

  test("contamination with a planted hot gram: ban list broadcasts into a LEFT ANTI join") {
    val s = spark
    import s.implicits._
    val common = "the quick brown fox" // in EVERY train doc -> over any cap
    val train = (1L to 40L).map(i =>
      (i, s"$common unique$i phrase$i tail$i")).toDF("doc_id", "text")
    val test = (101L to 110L).map(i =>
      (i, s"unique${i - 100} phrase${i - 100} tail${i - 100}")).toDF("doc_id", "text")
    val p = plan(pystreamsspark.llm.Contamination.contaminationPairs(
      train, test, "doc_id", "text", n = 3, minShared = 1, maxDf = 10L))
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_containment_prefix: candidates join on prefix tokens, never a cartesian") {
    val p = plan(graft.SparkEntry.queries("q_containment_prefix")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the funnel's signature: the equi-join key set includes the exploded
    // prefix token (ptok) alongside the block columns — the |block|²
    // all-pairs join has no such key
    assert(p.contains("ptok"), p)
    // while the dispatched key on this pruning-hostile corpus takes the
    // block join (no prefix machinery in its plan)
    val dispatched = plan(graft.SparkEntry.queries("q_containment")(spark, sf))
    assert(!dispatched.contains("ptok"), dispatched)
  }

  test("q_knn_batch: bounded top-k via partial+final aggregate — no per-probe window sort") {
    val p = plan(graft.SparkEntry.queries("q_knn_batch")(spark, sf))
    // the UDAF aggregates map-side (partial) then merges (final): at most
    // |probes|*k rows per task cross the shuffle, vs the retired window
    // form's full |probes|*|corpus| shuffle-and-sort
    assert(p.contains("ObjectHashAggregate") || countOf(p, "HashAggregate") >= 2, p)
    assert(p.contains("partial_topkbyvalue") || p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_weighted_sample: global top-k is TakeOrdered, never a full sort") {
    val p = plan(graft.SparkEntry.queries("q_weighted_sample")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_bm25_topk: bounded per-query top-k aggregate, no window; one broadcast stats row") {
    val p = plan(graft.SparkEntry.queries("q_bm25_topk")(spark, sf))
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("partial_topkbyvalue"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q_kmeans_cells: assignment is min-struct partial agg — no per-point window") {
    val p = plan(graft.SparkEntry.queries("q_kmeans_cells")(spark, sf))
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("q_fuzzy_join: segment equi-join, no cartesian / nested-loop fallback") {
    val p = plan(graft.SparkEntry.queries("q_fuzzy_join")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q_minhash_oracle: signature build is a partial-aggregated hash agg (no window)") {
    val p = plan(graft.SparkEntry.queries("q_minhash_oracle")(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("Window"), p)
  }

  test("AQE coalesces post-shuffle partitions on small data") {
    val s = spark
    import s.implicits._
    val df = spark.range(0, 10000).select(($"id" % 100).as("k"), $"id")
      .groupBy($"k").count()
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead") || p.contains("coalesced"), p)
  }

  test("AQE splits a skewed sort-merge join partition") {
    val s = spark
    import s.implicits._
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // allow the split even though the downstream agg re-shuffles
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // key 0 holds ~100x the rows of every other key; carry the wide
      // payload through the join so the skewed partition has real bytes
      val skewed = spark.range(0, 200000)
        .select(when($"id" < 150000, 0L).otherwise($"id" % 50).as("k"),
          concat(lit("payload-payload-payload-"), $"id").as("v"))
      val dim = spark.range(0, 50).select($"id".as("k"),
        concat(lit("d"), $"id").as("d"))
      val j = skewed.join(dim, "k").groupBy($"k")
        .agg(count(lit(1)).as("n"), max($"v").as("vmax"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(4000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_ewma: all 8 lags fuse into one Window operator (one sort pass)") {
    val p = plan(graft.SparkEntry.queries("q_ewma")(spark, sf))
    assert(countOf(p, "Window [") == 1, p)
  }

  test("q_skyline: broadcast joins only — no cartesian, no nested loop") {
    val p = plan(graft.SparkEntry.queries("q_skyline")(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_inverted_index: partial+final agg then TakeOrdered — no window, no full sort") {
    val p = plan(graft.SparkEntry.queries("q_inverted_index")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window ["), p)
    // collect_set aggregates partial+final around one gram shuffle
    assert(countOf(p, "Exchange") <= 1, p)
  }

  test("q_zorder: pure scan-project into TakeOrdered — zero data shuffles") {
    val p = plan(graft.SparkEntry.queries("q_zorder")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Sort ["), p) // top-k never materializes a full sort
  }

  test("q_multi_distinct: Expand-based rewrite — distinct sets dedup in parallel") {
    val p = plan(graft.SparkEntry.queries("q_multi_distinct")(spark, sf))
    assert(p.contains("Expand"), p)
    assert(countOf(p, "HashAggregate") >= 3, p) // per-gid partial + merge + final
  }

  test("q_chunk_overlap / q_explode_outer: map-only generators, no data shuffle") {
    for (k <- Seq("q_chunk_overlap", "q_explode_outer")) {
      val p = plan(graft.SparkEntry.queries(k)(spark, sf))
      assert(p.contains("Generate"), s"$k: $p")
      assert(!p.contains("Exchange hashpartitioning"), s"$k: $p")
    }
  }

  test("q_bloom_semijoin: bloom prefilter evaluated below the semi join") {
    val p = plan(graft.SparkEntry.queries("q_bloom_semijoin")(spark, sf))
    assert(p.contains("might_contain"), p) // bloom_contains prints as might_contain
    assert(p.contains("LeftSemi"), p)
    // the probe-side filter must run under the join, not above it:
    // plan prints top-down, so the join appears before the filter line
    val iJoin = p.indexOf("LeftSemi")
    val iBloom = p.indexOf("might_contain")
    assert(iJoin < iBloom, p)
  }

  test("native vec expressions stay inside WholeStageCodegen") {
    val s = spark
    import s.implicits._
    pystreamsspark.functions.VectorExpressions.register(spark)
    val df = pystreamsspark.io.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "vec_cosine(embedding, embedding) AS c")
    val p = plan(df)
    // toString marks WholeStageCodegen stages with the "*(n)" prefix
    assert(p.contains("*("), p)
    assert(p.contains("vec_cosine"), p)
  }

  test("q_activity_bitmap: one partial+final agg pair, no window, no join") {
    val p = plan(graft.SparkEntry.queries("q_activity_bitmap")(spark, sf))
    assert(countOf(p, "HashAggregate") == 2, p)
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("q_embed_quant: map-only quantization — zero data shuffles") {
    val p = plan(graft.SparkEntry.queries("q_embed_quant")(spark, sf))
    // the only exchange allowed is the presentation orderBy's range part
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q_bpe_merges: pair fan-out above the vocabulary aggregate, top-k TakeOrdered") {
    val p = plan(graft.SparkEntry.queries("q_bpe_merges")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    // generation over the AGGREGATED vocabulary: Generate sits above the
    // first HashAggregate pair in the plan text (plans print top-down)
    val iGen = p.indexOf("Generate")
    val iAgg = p.lastIndexOf("HashAggregate")
    assert(iGen >= 0 && iAgg > iGen, p)
  }

  test("q_sparse_cosine (auto=dense here): no token-keyed shuffle join; vec_dot pairs") {
    val p = plan(graft.SparkEntry.queries("q_sparse_cosine")(spark, sf))
    assert(p.contains("vec_dot"), p)
    assert(!p.contains("SortMergeJoin"), p) // the index join's signature shape
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_table_diff: single full-outer hash/sort join on the key, no nested loop") {
    val p = plan(graft.SparkEntry.queries("q_table_diff")(spark, sf))
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_concurrency: both windows bucket-bounded — no global (empty-partition) sort") {
    val p = plan(graft.SparkEntry.queries("q_concurrency")(spark, sf))
    // every Window must carry a partition spec; a scale-hostile global
    // window would print "Window [...] , [t ASC" with no PARTITION columns,
    // planned as a SinglePartition exchange — forbid that shape
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("q_wau_sliding: expansion dedups via aggregate — no windowed COUNT DISTINCT") {
    val p = plan(graft.SparkEntry.queries("q_wau_sliding")(spark, sf))
    assert(!p.contains("Window"), p) // pure partial+final aggs + tiny spine join
    assert(p.contains("HashAggregate"), p)
  }

  test("q_pmi_lift: totals broadcast as 1-row sides, top-50 is TakeOrdered") {
    val p = plan(graft.SparkEntry.queries("q_pmi_lift")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoop"), p)
  }

  test("q_fk_audit: every FK check joins key-aggregated parents — no cartesian") {
    val p = plan(graft.SparkEntry.queries("q_fk_audit")(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftOuter") || p.contains("BroadcastHashJoin"), p)
  }

  test("q_benford / q_period_change: date-or-digit-level finals, fact scanned once") {
    val pb = plan(graft.SparkEntry.queries("q_benford")(spark, sf))
    assert(!pb.contains("CartesianProduct"), pb) // 1-row total joins broadcast
    val pc = plan(graft.SparkEntry.queries("q_period_change")(spark, sf))
    // the only window runs over the ~30-row daily aggregate (post-agg),
    // like q_running_distinct — the fact table itself is never windowed
    assert(pc.contains("Window"), pc)
    assert(countOf(pc, "HashAggregate") >= 2, pc)
  }

  test("q_shuffle_shard: groupBy reuses the window's shard partitioning — one data shuffle") {
    val p = plan(graft.SparkEntry.queries("q_shuffle_shard")(spark, sf))
    // one hashpartitioning(shard) exchange feeds BOTH the window and the
    // aggregate; the only other exchange is the final orderBy's range
    // partitioning — a second hash exchange means the reuse broke
    assert(countOf(p, "hashpartitioning") == 1, p)
    assert(p.contains("Window"), p)
  }

  test("q_epoch_upsample: copies explode BEFORE the aggregation shuffle") {
    val p = plan(graft.SparkEntry.queries("q_epoch_upsample")(spark, sf))
    // Generate (the sequence explode) must be the DEEPEST non-scan op:
    // the tree prints parents first, so every Exchange must appear
    // before it — an Exchange after it would be a pre-explode shuffle
    val gen = p.indexOf("Generate")
    assert(gen >= 0, p)
    assert(p.lastIndexOf("Exchange") < gen, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_cms_freq: counter table broadcasts; probe keys are TakeOrdered, not full sort") {
    val p = plan(graft.SparkEntry.queries("q_cms_freq")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p) // 256-cell counters broadcast
    assert(p.contains("TakeOrderedAndProject"), p) // top-20 probe keys
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_leak_split: cluster labels broadcast back to the doc list — no cartesian") {
    val p = plan(graft.SparkEntry.queries("q_leak_split")(spark, sf))
    assert(p.contains("LeftOuter"), p) // singleton docs are their own group
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_neg_sample: groupBy reuses the ring window's partitioning — one data shuffle") {
    val p = plan(graft.SparkEntry.queries("q_neg_sample")(spark, sf))
    assert(countOf(p, "hashpartitioning") == 1, p)
    assert(p.contains("Window"), p)
  }

  test("q_sql_q16: NOT IN plans as an anti join against the broadcast ban list") {
    // sf0.01: the ban list (s_acctbal < 0) is EMPTY at sf0.001 and AQE's
    // empty-relation propagation erases the anti join from the executed
    // plan (the round-3 documented behavior) — assert on populated data
    val p = plan(graft.SparkEntry.queries("q_sql_q16")(spark, "/root/testdata/sf0.01"))
    assert(p.contains("LeftAnti"), p)   // null-aware NOT IN, never re-executed per row
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_sql_q21: double correlation decorrelates to one semi + one anti join") {
    val p = plan(graft.SparkEntry.queries("q_sql_q21")(spark, sf))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_sql_q2: correlated scalar MIN decorrelates to an aggregate + join-back — no per-row re-execution") {
    val p = plan(graft.SparkEntry.queries("q_sql_q2")(spark, sf))
    // the correlated subquery must become a grouped MIN joined on the
    // part key; a CartesianProduct or nested loop would mean the
    // decorrelation failed and every outer row re-scans lineitem
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("min("), p)
  }

  test("q_sql_q13: the ON-clause predicate stays inside a LEFT OUTER join; two chained agg phases") {
    val p = plan(graft.SparkEntry.queries("q_sql_q13")(spark, sf))
    // an optimizer that pushed the o_orderpriority predicate into a
    // WHERE would silently turn the outer join inner and drop
    // zero-order customers from the histogram
    assert(p.contains("LeftOuter"), p)
    // per-customer count then count-histogram: at least two aggregate
    // phases on different keys
    assert(countOf(p, "HashAggregate") >= 4, p) // 2 logical aggs x partial+final
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_sql_q20: the nested-IN chain decorrelates to semi joins only") {
    val p = plan(graft.SparkEntry.queries("q_sql_q20")(spark, sf))
    assert(countOf(p, "LeftSemi") >= 2, p) // both IN levels
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_eqdepth_hist: two-pass percentile binning — no global-sort window") {
    val p = plan(graft.SparkEntry.queries("q_eqdepth_hist")(spark, sf))
    assert(!p.contains("Window"), p)  // the single-partition ntile trap
    assert(p.contains("HashAggregate"), p)
  }

  test("q_chisq_cells: marginals derive from the materialized cell table — one events scan") {
    val df = graft.SparkEntry.queries("q_chisq_cells")(spark, sf)
    val p = plan(df)
    // post-materialization the plan reads the checkpointed 35-row cells;
    // the events parquet appears at most once in the executed plan
    assert(countOf(p, "Scan parquet") <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_attribution: single-scan conditional-window form — no self-join on events") {
    val p = plan(graft.SparkEntry.queries("q_attribution")(spark, sf))
    assert(countOf(p, "Scan parquet") == 1, p)
    assert(p.contains("Window"), p)
  }

  test("q_kcore / q_sssp: bounded-round peeling/relaxation — no cartesian, no window") {
    val pk = plan(graft.SparkEntry.queries("q_kcore")(spark, sf))
    assert(!pk.contains("CartesianProduct") && !pk.contains("Window"), pk)
    val ps = plan(graft.SparkEntry.queries("q_sssp")(spark, sf))
    assert(!ps.contains("CartesianProduct") && !ps.contains("Window"), ps)
  }

  test("q_sketch_overlap: bounded-k sketch agg over the materialized audience table") {
    val p = plan(graft.SparkEntry.queries("q_sketch_overlap")(spark, sf))
    assert(p.contains("ObjectHashAggregate"), p) // smallestK UDAF path
    assert(countOf(p, "Scan parquet") <= 1, p)   // d1 materialized once
  }

  test("join strategy hints are honored: merge/shuffle_hash/broadcast pick their joins") {
    val s2 = spark
    import s2.implicits._
    val a = pystreamsspark.io.Tables.orders(s2, sf).select($"o_orderkey", $"o_custkey")
    val b = pystreamsspark.io.Tables.customer(s2, sf).select($"c_custkey")
    def joined(hint: String) =
      a.join(b.hint(hint), $"o_custkey" === $"c_custkey").select(count(lit(1)).as("n"))
    val merge = plan(joined("merge"))
    assert(merge.contains("SortMergeJoin"), merge)
    val sh = plan(joined("shuffle_hash"))
    assert(sh.contains("ShuffledHashJoin"), sh)
    val bc = plan(joined("broadcast"))
    assert(bc.contains("BroadcastHashJoin"), bc)
  }

  test("q_dpp_join: runtime-only dim filter prunes fact partitions via DPP") {
    // the kept langs come from a filtered aggregate, not a literal, so
    // static pruning CANNOT fire — the partitioned scan must carry a
    // dynamicpruning subquery in its PartitionFilters instead
    val df = graft.SparkEntry.queries("q_dpp_join")(spark, sf)
    val p = plan(df)
    assert(p.contains("dynamicpruning"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("q_runtime_filter: bloom filter from the selective side gates the fact scan") {
    // InjectRuntimeFilter: with broadcast disabled the join is
    // sort-merge, and the filtered orders keys must appear as a
    // might_contain(bloom subquery) condition on the LINEITEM side
    // BEFORE its shuffle — the row-level sibling of DPP
    val df = graft.SparkEntry.queries("q_runtime_filter")(spark, sf)
    val p = plan(df)
    assert(p.contains("might_contain"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("q_degree_corr: pair funnel materialized once — final plan reads the checkpoint") {
    // round-5 snapshot showed 12 parquet scans: the jaccard funnel
    // re-executed for each of the 4 edge-list references; after the
    // Lineage.truncate the executed plan touches no parquet at all
    val p = plan(graft.SparkEntry.queries("q_degree_corr")(spark, sf))
    assert(countOf(p, "Scan parquet") == 0, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_lsh_eval: cand/truth pair lists materialized once each") {
    val p = plan(graft.SparkEntry.queries("q_lsh_eval")(spark, sf))
    assert(countOf(p, "Scan parquet") == 0, p)
  }
}
