package pystreamsspark.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import pystreamsspark.SparkSpec
import pystreamsspark.io.Tables
import pystreamsspark.operators.Salted

/** Physical-property checks for the data-layout batch: the oracle proves
  * the ANSWERS match, these prove the layouts actually deliver what they
  * exist for — partition pruning at the scan, an exchange-free bucketed
  * join, and a salted join that both spreads the hot key and cancels out
  * of the result.
  */
class LayoutQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.collect()
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    finalPlan(df.queryExecution.executedPlan).toString
  }

  test("q_partition_prune: lang filter becomes a partition filter, not a row filter") {
    val p = plan(LayoutQueries.qPartitionPrune(spark, sf))
    // pruned at the directory level: the scan carries a PartitionFilters
    // entry on lang and needs no pushed DATA filter for it
    assert(p.contains("PartitionFilters: [isnotnull(lang"), p)
    assert(!p.contains("PushedFilters: [IsNotNull(lang)"), p)
  }

  test("bucketed join is exchange-free on the bucket key") {
    val s = spark
    import s.implicits._
    // the query itself lets Catalyst broadcast (also correct); to prove
    // the layout property force the shuffle path and count exchanges
    withBroadcastOff {
      val df = LayoutQueries.qBucketJoin(spark, sf)
      val p = plan(df)
      val joinIdx =
        math.max(p.indexOf("SortMergeJoin"), p.indexOf("ShuffledHashJoin"))
      assert(joinIdx >= 0, p)
      // the plan prints top-down, so everything after the join node is its
      // subtree: both bucketed scans, and NO exchange between them and the
      // join. (The two exchanges above it — groupBy hash, orderBy range —
      // are the aggregation's, not the join's.)
      assert(!p.substring(joinIdx).contains("Exchange"),
        s"exchange below the bucketed join:\n$p")
      assert(p.contains("SelectedBucketsCount"), p)
    }
  }

  private def withBroadcastOff[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  test("joinSkewed equals the plain join row-for-row") {
    val s = spark
    import s.implicits._
    // hot-key profile: 90% of the big side on key 0
    val big = (1 to 5000).map { i =>
      (if (i % 10 != 0) 0L else i.toLong, i.toLong)
    }.toDF("k", "v").repartition(7)
    val small = (0 to 500 by 10).map(i => (i.toLong, s"d$i"))
      .toDF("k", "tag")
    val salted = Salted.joinSkewed(big, small, "k", buckets = 16)
      .select($"k", $"v", $"tag").as[(Long, Long, String)].collect().sorted
    val plain = big.join(small, "k")
      .select($"k", $"v", $"tag").as[(Long, Long, String)].collect().sorted
    assert(salted.sameElements(plain))
    assert(plain.nonEmpty)
  }

  test("sorted-write layout skips most of the table at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // sf0.1 so the sorted copy spans many 512 KiB row groups
    val df = LayoutQueries.qSortedSkip(spark, "/root/testdata/sf0.1")
    df.collect()
    // QueryStageExec nodes are leaves to collect(); descend explicitly
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val scanned = scans.map(_.metrics("numOutputRows").value).sum
    val total = 150000L // orders rows at sf0.1
    val matching = pystreamsspark.io.Tables.orders(spark, "/root/testdata/sf0.1")
      .filter(col("o_totalprice") >= 100000.0 && col("o_totalprice") < 110000.0)
      .count()
    // file-level range partitioning + row-group min/max: the scan must
    // surface a small multiple of the true matches, nowhere near the table
    assert(scanned < total / 4,
      s"scan surfaced $scanned of $total rows — layout not skipping")
    assert(scanned >= matching, s"scan lost rows: $scanned < $matching")
  }

  test("compaction hits the target file count and preserves every row") {
    val s = spark
    import s.implicits._
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_compact_spec_" +
      java.util.UUID.randomUUID().toString.take(8)
    def parquetFiles(dir: String): Array[java.io.File] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    try {
      Tables.documents(spark, sf).repartition(32)
        .write.mode("overwrite").parquet(s"$base/frag")
      assert(parquetFiles(s"$base/frag").length == 32)
      val totalBytes = parquetFiles(s"$base/frag").map(_.length).sum
      val target = totalBytes / 4 // force a known 32 -> ~5 compaction
      val nOut = pystreamsspark.operators.Compaction.compactParquet(
        spark, s"$base/frag", s"$base/comp", target)
      assert(nOut == math.ceil(totalBytes.toDouble / target).toInt)
      assert(parquetFiles(s"$base/comp").length == nOut)
      assert(nOut < 32)
      // row-level parity, not just counts
      val orig = Tables.documents(spark, sf)
        .select($"doc_id").as[Long].collect().sorted
      val comp = spark.read.parquet(s"$base/comp")
        .select($"doc_id").as[Long].collect().sorted
      assert(comp.sameElements(orig))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("compaction sizes Hive-partitioned layouts recursively") {
    val s = spark
    import s.implicits._
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_compact_part_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      // k=v subdirectories: the parquet files live one level down, so a
      // flat listing would see 0 bytes and collapse everything to 1 file
      Tables.documents(spark, sf).repartition(8)
        .write.partitionBy("lang").mode("overwrite").parquet(s"$base/frag")
      var totalBytes = 0L
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet")) totalBytes += f.length
      walk(new java.io.File(s"$base/frag"))
      assert(totalBytes > 0)
      val target = totalBytes / 4
      val nOut = pystreamsspark.operators.Compaction.compactParquet(
        spark, s"$base/frag", s"$base/comp", target)
      assert(nOut == math.ceil(totalBytes.toDouble / target).toInt)
      assert(nOut > 1, "partitioned layout sized as zero bytes")
      // partition column survives as a data column with correct values
      val orig = Tables.documents(spark, sf)
        .select($"doc_id", $"lang").as[(Long, String)].collect().sortBy(_._1)
      val comp = spark.read.parquet(s"$base/comp")
        .select($"doc_id", $"lang".cast("string")).as[(Long, String)]
        .collect().sortBy(_._1)
      assert(comp.sameElements(orig))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("joinSkewed spreads the hot key over all salt buckets") {
    val s = spark
    import s.implicits._
    val big = (1 to 5000).map(i => (0L, i.toLong)).toDF("k", "v")
    val salts = big
      .withColumn("__salt", Salted.salt(16, big.columns.map(col).toSeq))
      .select($"__salt").distinct().as[Int].collect()
    assert(salts.length == 16, s"hot key hit only ${salts.length}/16 salts")
    assert(salts.forall(sv => sv >= 0 && sv < 16))
  }
}
