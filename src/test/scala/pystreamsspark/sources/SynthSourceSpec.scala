package pystreamsspark.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** The custom DataSource V2 contract, asserted end to end: correct
  * relation, filter pushdown that narrows the GENERATED range, and
  * source-side column pruning.
  */
class SynthSourceSpec extends SparkSpec {

  private def synth(rows: Long, parts: Int = 4): DataFrame =
    spark.read.format("pystreamsspark.sources.SynthSource")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  private def scanOf(df: DataFrame): SynthScan = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    // AQE wraps finished stages in QueryStageExec whose children are not
    // visible to plain collect — recurse through them explicitly
    def scans(p: SparkPlan): Seq[SynthScan] = {
      val here = p match {
        case b: BatchScanExec => b.scan match {
          case s: SynthScan => Seq(s)
          case _            => Nil
        }
        case _ => Nil
      }
      val below = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec        => scans(q.plan)
        case other                    => other.children.flatMap(scans)
      }
      here ++ below
    }
    scans(df.queryExecution.executedPlan).headOption
      .getOrElse(fail("no SynthScan in plan:\n" +
        df.queryExecution.executedPlan.toString))
  }

  test("full scan delivers exactly the declared relation") {
    val df = synth(1000)
    assert(df.count() === 1000)
    val row = df.filter(col("id") === 7L).collect().head
    assert(row.getLong(1) === SynthTable.valueOf(7L))
    assert(row.getInt(2) === (7 % 32))
  }

  test("id-range filters push down and narrow the generated range") {
    val df = synth(100000, parts = 8)
      .filter(col("id") >= 25000L && col("id") < 75000L)
    assert(df.count() === 50000)
    val scan = scanOf(df)
    assert(scan.lo === 25000L && scan.hi === 74999L, scan.description())
    // partition planning happens AFTER pushdown: 8 splits of the
    // narrowed range, not of the full table
    assert(scan.planInputPartitions().length === 8)
  }

  test("equality filter collapses the range to one row") {
    val df = synth(100000).filter(col("id") === 42L)
    assert(df.count() === 1)
    val scan = scanOf(df)
    assert(scan.lo === 42L && scan.hi === 42L)
  }

  test("column pruning reaches the reader (source-side projection)") {
    val df = synth(1000).agg(sum(col("value")).as("s"))
    val expected = (0L until 1000L).map(SynthTable.valueOf).sum
    assert(df.collect().head.getLong(0) === expected)
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq === Seq("value"),
      scan.description())
  }

  test("contradictory range yields an empty scan with zero partitions") {
    val df = synth(1000).filter(col("id") > 500L && col("id") < 100L)
    assert(df.count() === 0)
  }

  test("micro-batch stream: offsets advance by batchRows and drain the table") {
    val dir = java.nio.file.Files.createTempDirectory("synthstream").toString
    val stream = spark.readStream
      .format("pystreamsspark.sources.SynthSource")
      .option("rows", "250").option("partitions", "4")
      .option("batchrows", "100")
      .load()
    val q = stream.writeStream
      .format("memory").queryName("synth_sink")
      .option("checkpointLocation", s"$dir/cp")
      .start()
    try {
      // 250 rows at 100/batch = 3 micro-batches (100, 100, 50)
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM synth_sink").collect()
      assert(got.length === 250)
      assert(got.map(_.getLong(0)).sorted.toSeq === (0L until 250L))
      val r7 = got.find(_.getLong(0) == 7L).get
      assert(r7.getLong(1) === SynthTable.valueOf(7L))
      assert(q.recentProgress.map(_.numInputRows).filter(_ > 0).max <= 100)
    } finally q.stop()
  }

  test("micro-batch stream with pushed id-range filter emits base-shifted ids") {
    // regression: toMicroBatchStream used to drop the pushed-down `lo`,
    // generating ids [0, hi-lo] that the post-scan re-evaluation of the
    // same predicate then silently discarded (missing data, no error)
    val dir = java.nio.file.Files.createTempDirectory("synthstreamf").toString
    val stream = spark.readStream
      .format("pystreamsspark.sources.SynthSource")
      .option("rows", "500").option("partitions", "4")
      .option("batchrows", "100")
      .load()
      .filter(col("id") >= 200L && col("id") < 450L)
    val q = stream.writeStream
      .format("memory").queryName("synth_sink_filtered")
      .option("checkpointLocation", s"$dir/cp")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM synth_sink_filtered").collect()
      assert(got.map(_.getLong(0)).sorted.toSeq === (200L until 450L))
      val r300 = got.find(_.getLong(0) == 300L).get
      assert(r300.getLong(1) === SynthTable.valueOf(300L))
      assert(r300.getInt(2) === SynthTable.bucketOf(300L))
    } finally q.stop()
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered from closed-form partials") {
    // rows=40 deliberately not a multiple of 32 or of the partition
    // count: split [28,39] wraps the bucket ring (buckets 28..31,0..7),
    // exercising the modular min/max closed form
    val agg = synth(40L, parts = 3)
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"), min(col("bucket")).as("min_b"),
        max(col("bucket")).as("max_b"))
    val row = agg.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getInt(3), row.getInt(4)) === ((40L, 0L, 39L, 0, 31)))
    // the executed plan must read the AGG scan (one partial row per
    // split), not the row scan
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("SynthAggScan"), p)
    assert(p.contains("pushedAggs="), p)

    // narrow single split, no ring wrap: min/max(bucket) from offsets
    val one = synth(10L, parts = 1)
      .agg(min(col("bucket")).as("a"), max(col("bucket")).as("b"))
      .collect().head
    assert((one.getInt(0), one.getInt(1)) === ((0, 9)))
  }

  test("aggregate pushdown declines unsupported aggs and falls back to the row scan") {
    // SUM over the LCG value has no closed form -> pushAggregation
    // returns false and the normal scan + Spark aggregate answers
    val df = synth(1000L, parts = 4)
      .agg(sum(col("value")).as("sv"), count(lit(1)).as("n"))
    val row = df.collect().head
    val expected = (0L until 1000L).map(SynthTable.valueOf).sum
    assert(row.getLong(0) === expected)
    assert(row.getLong(1) === 1000L)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SynthAggScan"), p)

    // group-by on a non-bucket column has no closed form -> declined
    val byId = synth(100L, parts = 4)
      .groupBy(col("id")).agg(count(lit(1)).as("n"))
    assert(byId.collect().length === 100)
    assert(!byId.queryExecution.executedPlan.toString.contains("SynthAggScan"))
  }

  test("TopN pushdown: ORDER BY id LIMIT answered from range arithmetic, no Sort/Limit above the scan") {
    // DESC with a pushed filter: range narrows first, then the TopN
    // clamps to the top of the range
    val desc = synth(100000, parts = 8)
      .filter(col("id") < 90000L)
      .orderBy(col("id").desc).limit(7)
    val got = desc.collect().map(_.getLong(0)).toSeq
    assert(got === (89999L to 89993L by -1L).toSeq)
    val p = desc.queryExecution.executedPlan.toString
    assert(p.contains("SynthTopNScan"), p)
    assert(!p.contains("TakeOrderedAndProject") && !p.contains("Sort"), p)
    assert(!p.contains("GlobalLimit"), p)

    // ASC plain
    val asc = synth(1000, parts = 4).orderBy(col("id")).limit(5)
    assert(asc.collect().map(_.getLong(0)).toSeq === (0L to 4L).toSeq)
    assert(asc.queryExecution.executedPlan.toString.contains("SynthTopNScan"))

    // k larger than the relation: all rows, still fully pushed
    val all = synth(3, parts = 4).orderBy(col("id").desc).limit(10)
    assert(all.collect().map(_.getLong(0)).toSeq === Seq(2L, 1L, 0L))

    // sort on a non-id column must NOT push: Spark keeps its own TopN
    val byValue = synth(1000, parts = 4).orderBy(col("value")).limit(5)
    val pv = byValue.queryExecution.executedPlan.toString
    assert(!pv.contains("SynthTopNScan"), pv)
    assert(byValue.collect().length === 5)
  }

  test("Offset pushdown: LIMIT k OFFSET m is answered from range arithmetic, no Offset/Limit nodes") {
    // ASC with a pushed filter: TopN(k+m) clamps, then the offset
    // advances lo — the surviving range is exactly result rows [m, m+k)
    val page = synth(100000, parts = 8)
      .filter(col("id") >= 10000L)
      .orderBy(col("id")).offset(5000).limit(10)
    assert(page.collect().map(_.getLong(0)).toSeq === (15000L to 15009L).toSeq)
    val p = page.queryExecution.executedPlan.toString
    assert(p.contains("SynthTopNScan"), p)
    assert(p.contains("range=[15000,15009]"), p)
    assert(!p.contains("GlobalLimit") && !p.contains("Offset"), p)

    // DESC: the emitted order starts at hi, so the drop comes off the top
    val desc = synth(100, parts = 4)
      .orderBy(col("id").desc).offset(3).limit(4)
    assert(desc.collect().map(_.getLong(0)).toSeq === Seq(96L, 95L, 94L, 93L))
    assert(desc.queryExecution.executedPlan.toString.contains("range=[93,96]"))

    // bare OFFSET with no sort: any n-m rows satisfy the semantics
    val bare = synth(1000, parts = 4).offset(990)
    assert(bare.count() === 10)
    assert(!bare.queryExecution.executedPlan.toString.contains("Offset"))

    // offset past the end of the range: empty, not an error
    assert(synth(50, parts = 4).orderBy(col("id")).offset(60).limit(5)
      .collect().isEmpty)
  }

  test("runtime (DPP) filtering: the build side's join-key set turns the scan into point seeks") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val big = synth(1000000, parts = 8)
    // ~20 scattered ids — the filter is on `value`, so it is NOT a
    // pushable id-range and cannot be statically inferred onto `id`
    val dim = synth(1000000, parts = 4)
      .filter(col("value") < 20L).select(col("id").as("k"))
    val joined = big.join(dim.hint("broadcast"), col("id") === col("k"))
      .select(col("id"), col("value"))
    val got = joined.collect().map(_.getLong(0)).sorted.toSeq
    val expected = (0L until 1000000L).filter(SynthTable.valueOf(_) < 20L)
    assert(got === expected && got.nonEmpty)
    // the big-side scan carries the runtime In filter in the executed plan
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("RuntimeFilters: [dynamicpruningexpression(id"), p)
    // and emitted ONLY the seeked ids, not the 1M-row relation
    def bigScans(sp: SparkPlan): Seq[BatchScanExec] = {
      val here = sp match {
        case b: BatchScanExec if b.scan.isInstanceOf[SynthScan] &&
          b.runtimeFilters.nonEmpty => Seq(b)
        case _ => Nil
      }
      here ++ (sp match {
        case a: AdaptiveSparkPlanExec => bigScans(a.executedPlan)
        case q: QueryStageExec        => bigScans(q.plan)
        case other                    => other.children.flatMap(bigScans)
      })
    }
    val scans = bigScans(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty, p)
    assert(scans.head.metrics("numOutputRows").value === expected.length.toLong)
  }

  test("storage-partitioned join: keyedBy=bucket scans join with ZERO shuffle exchanges") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    def keyedSynth(rows: Long) = spark.read
      .format("pystreamsspark.sources.SynthSource")
      .option("rows", rows.toString).option("keyedBy", "bucket").load()
    val a = keyedSynth(640L)
      .select(col("bucket"), col("id").as("id_a"), col("value").as("v_a"))
    val b = keyedSynth(320L)
      .select(col("bucket"), col("id").as("id_b"), col("value").as("v_b"))
    val joined = a.hint("merge").join(b, Seq("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("v_a") + col("v_b")).as("s"))
    val rows = joined.collect()
    // correctness vs a plain in-memory replay
    val expected = (0 until 32).map { bkt =>
      val as = (0L until 640L).filter(_ % 32 == bkt)
      val bs = (0L until 320L).filter(_ % 32 == bkt)
      bkt -> ((as.size.toLong * bs.size,
        as.map(SynthTable.valueOf).sum * bs.size
          + bs.map(SynthTable.valueOf).sum * as.size))
    }.toMap
    rows.foreach { r =>
      val (n, s) = expected(r.getInt(0))
      assert(r.getLong(1) === n, s"bucket ${r.getInt(0)}")
      assert(r.getLong(2) === s, s"bucket ${r.getInt(0)}")
    }
    assert(rows.length === 32)
    // THE point: no exchange anywhere — the join consumes the sources'
    // KeyGroupedPartitioning, and the per-bucket agg reuses it
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("SynthKeyedScan"), p)
  }

  test("keyedBy=bucket composes with pushed id-range filters") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val df = spark.read.format("pystreamsspark.sources.SynthSource")
      .option("rows", "1000").option("keyedBy", "bucket").load()
      .filter(col("id") >= 100L && col("id") < 200L)
    val got = df.collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (100L until 200L).toSeq)
    assert(df.queryExecution.executedPlan.toString.contains("SynthKeyedScan"))
  }

  test("Limit pushdown: bare LIMIT clamps the generated range, Limit node removed") {
    val df = synth(100000, parts = 8).limit(9)
    assert(df.collect().length === 9)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("GlobalLimit"), p)
    // the scan's surviving range is 9 rows — visible in the description
    assert(p.contains("range=[0,8]"), p)
  }

  test("aggregate pushdown declines on an empty range: COUNT(*) stays 0, not NULL") {
    // With hi < lo the agg scan would plan ZERO partitions, so Spark's
    // final SUM over no partial rows yields NULL where the unpushed
    // plan yields 0 — build() must fall back to the row scan
    val df = synth(1000L, parts = 4)
      .filter(col("id") > 500L && col("id") < 100L)
      .agg(count(lit(1)).as("n"))
    val row = df.collect().head
    assert(!row.isNullAt(0), "pushed-down COUNT over empty range returned NULL")
    assert(row.getLong(0) === 0L)
    assert(!df.queryExecution.executedPlan.toString.contains("SynthAggScan"))
  }

  test("grouped aggregate pushdown: GROUP BY bucket from arithmetic-progression partials") {
    // rows=100 over 3 splits: residues land unevenly across splits, so
    // the per-split partial rows must merge correctly in Spark's final
    // aggregate; cross-check against the row-scan (fallback) answer
    val pushed = synth(100L, parts = 3)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
        max(col("id")).as("hi"))
      .orderBy(col("bucket"))
    val rows = pushed.collect()
    assert(pushed.queryExecution.executedPlan.toString.contains("SynthAggScan"))
    val expected = (0L until 100L).groupBy(_ % 32).toSeq.sortBy(_._1)
      .map { case (b, ids) => (b.toInt, ids.length.toLong, ids.min, ids.max) }
    assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === expected)
  }
}
