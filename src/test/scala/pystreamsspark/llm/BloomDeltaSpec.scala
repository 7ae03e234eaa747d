package pystreamsspark.llm

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** Bloom-prefiltered incremental dedup: result equivalence with the
  * plain anti-join, no-false-negative guarantee, and shuffle-shrink
  * accounting (how many rows actually reach the join).
  */
class BloomDeltaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("deltaWithBloom == plain anti-join on real documents") {
    val s = spark
    import s.implicits._
    val docs = pystreamsspark.io.Tables.documents(spark, sf)
      .select($"doc_id", Dedup.normText($"text").as("norm"))
    val existing = docs.filter($"doc_id" % 2 === 0).select($"norm")
    val incoming = docs.filter($"doc_id" % 2 === 1)
    val expected = incoming.join(existing, Seq("norm"), "left_anti")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val got = Dedup.deltaWithBloom(existing, incoming, "norm")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("deltaWithBloom with EMPTY existing returns all of incoming (bootstrap run)") {
    val s = spark
    import s.implicits._
    val docs = pystreamsspark.io.Tables.documents(spark, sf)
      .select($"doc_id", Dedup.normText($"text").as("norm"))
    val existing = docs.filter(lit(false)).select($"norm") // zero rows
    val incoming = docs.limit(100)
    // BloomFilterAggregate yields NULL over zero rows; an unguarded
    // bloom_contains(NULL, h) would silently drop EVERY row here
    assert(Dedup.deltaWithBloom(existing, incoming, "norm").count() == 100)
  }

  test("bloom filter has no false negatives; fp rate is small") {
    val s = spark
    import s.implicits._
    pystreamsspark.functions.BloomFunctions.register(spark)
    val existing = spark.range(0, 10000).select(($"id" * 2).as("k"))
    val bytes = existing
      .select(call_function("bloom_agg", xxhash64($"k"), lit(20000L)).as("bf"))
      .head.getAs[Array[Byte]](0)
    val probe = spark.range(0, 10000)
      .select(($"id" * 2).as("member"), ($"id" * 2 + 1).as("nonmember"))
    val mc = (c: String) =>
      call_function("bloom_contains", lit(bytes), xxhash64(col(c)))
    // every true member must hit
    assert(probe.filter(!mc("member")).count() == 0)
    // false-positive rate on disjoint keys stays low (default fpp 3%)
    val fp = probe.filter(mc("nonmember")).count()
    assert(fp < 1000, s"fp=$fp out of 10000 is implausibly high")
  }

  test("prefilter shrinks the join input to dups + fp fraction") {
    val s = spark
    import s.implicits._
    pystreamsspark.functions.BloomFunctions.register(spark)
    // 5% overlap: 500 of incoming's 10000 keys exist already
    val existing = spark.range(0, 500).select($"id".as("k"))
    val incoming = spark.range(0, 10000).select($"id".as("k"))
    val bytes = existing
      .select(call_function("bloom_agg", xxhash64($"k"), lit(1000L)).as("bf"))
      .head.getAs[Array[Byte]](0)
    val candidates = incoming.filter(
      call_function("bloom_contains", lit(bytes), xxhash64($"k"))).count()
    assert(candidates >= 500)   // all true dups are candidates
    assert(candidates < 2000, s"candidates=$candidates — prefilter not selective")
  }

  test("neardupDelta flags planted cross-split near-dups and nothing else") {
    val sp = spark
    import sp.implicits._
    val existing = Seq(
      (10L, "alpha beta gamma delta epsilon", "en", "web"),
      (11L, "one two three four five six", "en", "web"),
      (12L, "alpha beta gamma delta epsilon", "en", "books") // other block
    ).toDF("doc_id", "text", "lang", "source")
    val incoming = Seq(
      // 4/6 token overlap with doc 10 -> jaccard 4/7 >= 0.5, same block
      (100L, "alpha beta gamma delta zeta eta", "en", "web"),
      // identical text but different block (books vs web): matches 12 only
      (101L, "alpha beta gamma delta epsilon", "en", "books"),
      // disjoint tokens: never flagged
      (102L, "seven eight nine ten", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val out = pystreamsspark.llm.Dedup
      .neardupDelta(existing, incoming, "doc_id", "text",
        Seq("lang", "source"), threshold = 0.5)
      .orderBy($"id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out === Array(
      (100L, 1L, 10L, 4.0 / 7.0),
      (101L, 1L, 12L, 1.0)))
  }
}
