package pystreamsspark.relational

import java.nio.file.Files
import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** Mergeable-sketch operators — the pre-aggregation pattern that makes
  * 100 TB dashboards cheap: persist small sketch BINARIES per segment
  * (day, source, …), then merge sketches instead of re-scanning raw
  * data. Spark 4 ships DataSketches HLL (hll_sketch_agg / hll_union_agg
  * / hll_sketch_estimate) and CountMinSketch natively.
  */
class SketchesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("per-day HLL sketches persisted, re-read and merged == global estimate") {
    val s = spark
    import s.implicits._
    val ev = pystreamsspark.io.Tables.events(spark, sf)
      .select($"user_id", to_date($"ts").as("day"))
    // per-segment sketches (what a daily job would persist)
    val daily = ev.groupBy($"day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "hll-").toFile.getAbsolutePath
    daily.write.mode("overwrite").parquet(dir) // sketch binaries round-trip parquet
    val merged = spark.read.parquet(dir)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head.getLong(0)
    val direct = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .head.getLong(0)
    val exact = ev.select($"user_id").distinct().count()
    assert(merged == direct) // merge-then-estimate == estimate-over-all
    val err = math.abs(merged.toDouble - exact) / exact
    assert(err < 0.05, s"merged=$merged exact=$exact err=$err")
  }

  test("multi-band sign-LSH: planted cosine-0.72 pairs recalled where one band is luck") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 32
    val target = 0.72 // just above the 0.7 verify threshold
    // 60 planted pairs at EXACT cosine 0.72: partner = t*v̂ + sqrt(1-t²)*û
    // with û ⊥ v̂ — deterministic geometry, fixed seed
    val rows = (0 until 60).flatMap { i =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nv = math.sqrt(v.map(x => x * x).sum)
      val vh = v.map(_ / nv)
      val u0 = Array.fill(dim)(rnd.nextGaussian())
      val d = u0.zip(vh).map { case (a, b) => a * b }.sum
      val u1 = u0.zip(vh).map { case (a, b) => a - d * b }
      val nu = math.sqrt(u1.map(x => x * x).sum)
      val w = vh.zip(u1).map { case (a, b) =>
        (target * a + math.sqrt(1 - target * target) * b / nu).toFloat }
      Seq((i.toLong, vh.map(_.toFloat)), (1000L + i, w))
    }
    val emb = rows.toDF("vec_id", "embedding")
    def recallOf(pairs: org.apache.spark.sql.DataFrame): Double =
      pairs.filter($"id_b" === $"id_a" + 1000L).count().toDouble / 60
    val multi = recallOf(pystreamsspark.llm.Similarity.annPairsMultiband(
      emb, "vec_id", "embedding", planesPerBand = 4, bands = 8, threshold = 0.7))
    val single = recallOf(pystreamsspark.llm.Similarity.annPairs(
      emb, "vec_id", "embedding", planes = 8, threshold = 0.7))
    assert(multi >= 0.8, s"multiband recall=$multi")
    assert(multi > single, s"multi=$multi single=$single — amplification must help")
  }

  test("simhash banded pairs: planted near-dups recalled, no id-order dups, dist bounded") {
    val s = spark
    import s.implicits._
    import pystreamsspark.llm.Dedup
    val docs = pystreamsspark.io.Tables.documents(spark, sf)
      .select($"doc_id", $"text").limit(200)
    val mutated = docs.select(($"doc_id" + 10000000L).as("doc_id"),
      expr("concat_ws(' ', slice(filter(split(text, ' '), t -> t != ''), 1, " +
        "greatest(size(filter(split(text, ' '), t -> t != '')) - 1, 1)))").as("text"))
    val pairs = Dedup.simHashPairs(docs.unionByName(mutated), "doc_id", "text", maxDist = 6)
      .persist()
    val found = pairs
      .filter($"id_b" === $"id_a" + 10000000L).count()
    // dropping one of ~100+ tokens rarely flips >6 of 64 bits; banding
    // guarantees recall only for dist<=3, so assert a strong majority
    assert(found >= 150, s"planted recall $found/200 too low")
    assert(pairs.filter($"dist" > 6 || $"id_a" >= $"id_b").count() == 0)
    pairs.unpersist()
  }

  test("count-min sketch: estimates never undercount, overcount bounded") {
    val s = spark
    import s.implicits._
    val toks = pystreamsspark.io.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val eps = 0.001
    val bytes = toks
      .agg(expr(s"count_min_sketch(token, ${eps}d, 0.99d, 42)").as("cms"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val truth = toks.groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc).limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = cms.totalCount()
    truth.foreach { case (tok, n) =>
      val est = cms.estimateCount(tok)
      assert(est >= n, s"CMS undercounted $tok: $est < $n")
      assert(est <= n + (eps * total).toLong,
        s"CMS overcount for $tok beyond eps bound: $est vs $n (+${(eps * total).toLong})")
    }
  }

  test("approx_top_k surfaces the true heavy hitters") {
    val s = spark
    import s.implicits._
    val toks = pystreamsspark.io.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val approx = toks.agg(expr("approx_top_k(token, 10)").as("tk"))
      .selectExpr("explode(tk) AS e").select($"e.item".cast("string"))
      .collect().map(_.getString(0)).toSet
    val exactTop5 = toks.groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token".asc).limit(5)
      .collect().map(_.getString(0)).toSet
    assert(exactTop5.subsetOf(approx),
      s"missing heavy hitters: ${exactTop5 -- approx}")
  }

  test("listagg WITHIN GROUP == sort_array+concat_ws formulation") {
    val s = spark
    import s.implicits._
    pystreamsspark.io.Tables.customer(spark, sf).createOrReplaceTempView("customer_la")
    val la = s.sql(
      """SELECT c_nationkey,
        |  listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
        |FROM customer_la WHERE c_custkey % 97 = 0
        |GROUP BY c_nationkey""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val manual = pystreamsspark.io.Tables.customer(spark, sf)
      .filter($"c_custkey" % 97 === 0)
      .groupBy($"c_nationkey")
      .agg(concat_ws(",", array_sort(collect_list($"c_name"))).as("names"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(la == manual)
  }
}
