package pystreamsspark.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec
import pystreamsspark.llm.MinHashUnion

/** Sources/sinks (SURVEY.md §2.2), bucketing, skew salting, UDAF. */
class StorageAndSkewSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "spec-io-").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("CSV source round-trip with schema") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25), (3L, "c,d", 0.0))
      .toDF("id", "name", "x")
    val dir = tmpDir() + "/csv"
    df.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("id LONG, name STRING, x DOUBLE").csv(dir)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("JSON source round-trip") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f), "x"), (2L, Seq(3.0f), null))
      .toDF("id", "vec", "tag")
    val dir = tmpDir() + "/json"
    df.write.json(dir)
    val back = spark.read.schema("id LONG, vec ARRAY<FLOAT>, tag STRING").json(dir)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "E" else "O", i * 1.0))
      .toDF("id", "par", "x")
    val dir = tmpDir() + "/part"
    df.write.partitionBy("par").parquet(dir)
    val back = spark.read.parquet(dir).filter($"par" === "E")
    assert(back.count() === 50)
    val planStr = back.queryExecution.executedPlan.toString
    // partition filter applied at scan, not as a post-scan Filter
    assert(planStr.contains("PartitionFilters: [isnotnull(par"), planStr)
  }

  test("bucketed tables co-locate an equi-join without a shuffle") {
    val s = spark
    import s.implicits._
    // unique names per JVM run: a stale managed-table dir from an earlier
    // test run would otherwise collide (in-memory catalog forgets tables,
    // the filesystem doesn't)
    val suffix = System.nanoTime()
    val (t1, t2) = (s"b1_$suffix", s"b2_$suffix")
    val left = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "x")
    val right = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    left.write.bucketBy(4, "k").sortBy("k").saveAsTable(t1)
    right.write.bucketBy(4, "k").sortBy("k").saveAsTable(t2)
    try {
      val joined = s.table(t1).join(s.table(t2), "k").withColumn("y", $"x" * 2)
      assert(joined.count() === 1000)
      // force a merge join so the decision under test is about shuffles
      val plan = s.sql(
        s"SELECT /*+ MERGE($t1, $t2) */ * FROM $t1 JOIN $t2 USING (k)")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"), plan)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $t1")
      s.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }

  test("salted aggregation equals direct aggregation (skewed key)") {
    val s = spark
    import s.implicits._
    // 90% of rows on one key — the skew shape salting is for
    val rows = (1 to 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"k${i % 7}"
      (k, i.toLong)
    }
    val df = rows.toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(sum($"v").as("sum_v"), count($"v").as("cnt_v"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val salted = Salted.aggStats(df, Seq("key"), "v", buckets = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted === direct)
  }

  test("MinHashUnion UDAF: group signature = elementwise min; union property") {
    val s = spark
    import s.implicits._
    pystreamsspark.functions.VectorExpressions.register(s)
    val docs = Seq(
      (1L, "g1", "a b c d e f"), (2L, "g1", "c d e f g h"),
      (3L, "g2", "x y z w q r")).toDF("id", "grp", "text")
    val sigs = docs.select($"id", $"grp",
      call_function("minhash_sig",
        array_distinct(call_function("shingle_hash",
          filter(split($"text", " "), t => t =!= ""), lit(2))),
        lit(16)).as("sig"))
    val mhu = MinHashUnion(16)
    val grouped = sigs.groupBy($"grp").agg(mhu($"sig").as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val bySig = sigs.collect().map(r => (r.getLong(0), r.getSeq[Long](2)))
    // group g1 signature must be the element-wise min of docs 1 and 2
    val expected = bySig(0)._2.zip(bySig(1)._2).map { case (a, b) => math.min(a, b) }
    assert(grouped("g1") === expected)
    assert(grouped("g2") === bySig(2)._2)
    // disjoint corpora -> estimated jaccard near 0; identical -> 1
    assert(MinHashUnion.estJaccard(grouped("g1"), grouped("g1")) === 1.0)
    assert(MinHashUnion.estJaccard(grouped("g1"), grouped("g2")) < 0.2)
  }

  test("observe(): in-flight data-quality metrics without a second pass") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.Observation
    // production shape: count rows / nulls / bad values WHILE writing,
    // instead of re-scanning the output afterwards
    val obs = Observation("quality")
    val docs = pystreamsspark.io.Tables.documents(spark, "/root/testdata/sf0.01")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(when($"text".isNull || length($"text") === 0, 1)).as("n_empty"),
        count(when($"n_chars" < 0, 1)).as("n_bad_len"))
    val n = docs.count() // one action drives both the job and the metrics
    val m = obs.get
    assert(m("n_rows") == n)
    assert(m("n_empty") == 0L)
    assert(m("n_bad_len") == 0L)
  }

  test("dynamic partition overwrite replaces only the re-run partitions") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/dynpart"
    Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-02"))
      .toDF("id", "day").write.partitionBy("day").parquet(dir)
    // idempotent daily re-run: rewrite ONLY day=2024-01-01
    Seq((10L, "2024-01-01")).toDF("id", "day")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(dir)
    val back = spark.read.parquet(dir)
      .select($"id", $"day".cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // day-02 intact, day-01 replaced (static overwrite would drop day-02)
    assert(back == Set((10L, "2024-01-01"), (3L, "2024-01-02")))
  }

  test("small-file compaction: repartition-write shrinks file count, keeps rows") {
    val s = spark
    import s.implicits._
    val src = tmpDir() + "/fragmented"
    val dst = tmpDir() + "/compacted"
    spark.range(0, 1000).repartition(64).write.parquet(src) // 64 tiny files
    def parts(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts(src) == 64)
    spark.read.parquet(src).repartition(2).write.parquet(dst)
    assert(parts(dst) == 2)
    assert(spark.read.parquet(dst).count() == 1000)
    assert(spark.read.parquet(dst).agg(sum($"id")).head.getLong(0) == 499500L)
  }

  test("corrupt JSON records: PERMISSIVE captures, FAILFAST throws") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/badjson"
    Seq("""{"id": 1, "x": 1.5}""", """{"id": 2, "x": }""", """{"id": 3, "x": 3.0}""")
      .toDF("value").coalesce(1).write.text(dir)
    // PERMISSIVE (default): bad row lands in _corrupt_record, good rows survive
    val permissive = spark.read
      .schema("id LONG, x DOUBLE, _corrupt_record STRING")
      .json(dir).cache()
    assert(permissive.filter($"_corrupt_record".isNotNull).count() == 1)
    assert(permissive.filter($"id".isNotNull).count() == 2)
    permissive.unpersist()
    // FAILFAST: the pipeline stops on the first malformed row
    val ex = intercept[Exception] {
      spark.read.option("mode", "FAILFAST")
        .schema("id LONG, x DOUBLE").json(dir).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      ex.getCause != null)
  }

  test("parquet schema evolution: mergeSchema unions columns across files") {
    val s = spark
    import s.implicits._
    val dir = tmpDir() + "/evolve"
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir + "/batch=1")
    Seq((2L, 0.5)).toDF("id", "score").write.parquet(dir + "/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score", "batch"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).getAs[String]("name") == "a" && rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getAs[Double]("score") == 0.5 && rows(1).isNullAt(rows(1).fieldIndex("name")))
  }

  test("ORC source round-trip incl. array column") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f), "x"), (2L, Seq(3.0f), "y"))
      .toDF("id", "vec", "tag")
    val dir = tmpDir() + "/orc"
    df.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }
}
