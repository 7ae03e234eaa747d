package pystreamsspark.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import pystreamsspark.llm.Dedup

/** Throwaway micro-bench: HOF shingle strings vs native shingle_hash —
  * isolates the gram-generation cost shared by the contamination /
  * boilerplate / inverted-index keys. */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional probe filter: `runMain ... Micro <sfDir> index_build`
    // runs only the named probe (old no-arg behavior: run everything)
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pystreamsspark.functions.VectorExpressions.register(spark)
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"MICRO $name best=${runs.min}%.3f s (n=${f})")
    }

    // r13-verdict #6 probe: cold `.ckindex` build (segmentize fold) on a
    // synthetic 20k-entry anchor — pure driver CPU, no Spark jobs. Each
    // iteration deletes the sidecar and bumps the anchor mtime so
    // loadCkIndex re-builds from scratch.
    if (only.contains("index_build")) {
      import java.nio.file.{Files, Paths}
      import org.apache.spark.sql.types.{StructType, LongType, DoubleType}
      val dir = Files.createTempDirectory("graft_idxprobe").toString
      val mdir = Paths.get(dir, "_manifests"); Files.createDirectories(mdir)
      val n = 20000
      val schema = new StructType().add("k", LongType).add("p", DoubleType)
      val header = Seq("op=create", "parent=0", "ts=0", s"nfiles=$n",
        "statscols=k,p", "statsfmt=micros-v2",
        "schema=" + schema.json).mkString("\t")
      val lines = (0 until n).map(i =>
        s"data/b/part-$i.parquet\tk=${i * 10L},${i * 10L + 9}" +
          s";p=${i * 1.5},${i * 1.5 + 0.7}")
      val mp = mdir.resolve("v00000001.manifest")
      Files.write(mp, (header +: lines).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var tick = 0L
      time(s"index_build_${n}_entries_x20") {
        var acc = 0L
        (0 until 20).foreach { _ =>
          Files.deleteIfExists(mdir.resolve("v00000001.ckindex"))
          tick += 2000
          Files.setLastModifiedTime(mp,
            java.nio.file.attribute.FileTime.fromMillis(
              System.currentTimeMillis() + tick))
          acc += pystreamsspark.io.SnapshotTable.readCandidates(
            dir, "k", "5", "5").size
        }
        acc
      }
      spark.stop()
      return
    }

    val docs = Tables.documents(spark, sfDir)
    time("hof_shingle_strings") {
      docs.select(explode(Dedup.shingles($"text", 3)).as("g"))
        .agg(count(lit(1))).head.getLong(0)
    }
    time("native_shingle_strings") {
      docs.select(explode(Dedup.shinglesNative(spark, $"text", 3)).as("g"))
        .agg(count(lit(1))).head.getLong(0)
    }
    time("native_shingle_hash") {
      docs.select(explode(array_distinct(
          call_function("shingle_hash", pystreamsspark.llm.TextOps.tokens($"text"), lit(3))))
          .as("g"))
        .agg(count(lit(1))).head.getLong(0)
    }
    time("tokens_only") {
      docs.select(explode(split($"text", " ")).as("t")).filter($"t" =!= "")
        .agg(count(lit(1))).head.getLong(0)
    }

    // skyline: naive quadratic dominance anti-join vs the bucketed
    // prefix-max decomposition registered as q_skyline
    val parts = Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_retailprice", $"p_size")
    time("skyline_naive_antijoin") {
      parts.as("p").join(parts.as("q"),
          col("q.p_retailprice") < col("p.p_retailprice") &&
            col("q.p_size") >= col("p.p_size"), "left_anti")
        .agg(count(lit(1))).head.getLong(0)
    }
    time("skyline_bucketed") {
      pystreamsspark.relational.ExtraQueries.qSkyline(spark, sfDir)
        .agg(count(lit(1))).head.getLong(0)
    }

    // heavy hitters: full groupBy top-k vs the MG sketch funnel (tiny
    // closed vocabulary here, so the funnel's win is memory shape, not
    // local wall time — record both honestly)
    val toks = docs.select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    time("topk_full_groupby") {
      toks.groupBy($"token").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token".asc).limit(20)
        .agg(count(lit(1))).head.getLong(0)
    }
    time("topk_mg_funnel") {
      pystreamsspark.operators.HeavyHitters.exactTopK(toks, "token", 20, m = 64)
        .agg(count(lit(1))).head.getLong(0)
    }
    // hash-family cost contrast: the xxhash64 production path (native
    // fused minhash_sig over 8-byte gram hashes) vs the md5-derived
    // family the oracle-checked keys use (one md5 per gram STRING,
    // split into two 40-bit halves, h_i = a + i*b mod 2^40, 16
    // partial-agg mins). Records why the md5 form is verification-only:
    // same banding logic, strictly more expensive hashing.
    val nH = 16
    time("minhash_xxhash64_native") {
      docs.select($"doc_id",
          call_function("minhash_sig",
            array_distinct(call_function("shingle_hash",
              pystreamsspark.llm.TextOps.tokens($"text"), lit(3))),
            lit(nH)).as("sig"))
        .select($"doc_id", explode($"sig").as("m"))
        .agg(count(lit(1))).head.getLong(0)
    }
    time("minhash_md5_family") {
      val M = 1099511627776L // 2^40
      val hashed = docs
        .select($"doc_id", explode(Dedup.shinglesNative(spark, $"text", 3)).as("g"))
        .select($"doc_id",
          conv(substring(md5($"g".cast("binary")), 1, 10), 16, 10).cast("long").as("a"),
          conv(substring(md5($"g".cast("binary")), 11, 10), 16, 10).cast("long").as("b"))
      val minCols = (0 until nH).map(i => min(($"a" + $"b" * i) % M).as(s"m$i"))
      hashed.groupBy($"doc_id").agg(minCols.head, minCols.tail: _*)
        .select($"doc_id", explode(array((0 until nH).map(i => col(s"m$i")): _*)).as("m"))
        .agg(count(lit(1))).head.getLong(0)
    }

    // crossover probe: TRADE-OFF data (price up, size up — the classic
    // skyline hard case for (min price, max size) dominance: no point
    // dominates another, the whole set is the frontier, so the naive
    // anti-join's early-exit never fires and it degenerates to true
    // O(n^2); on dominated-heavy random data it short-circuits and
    // stays fast, measured above). 50k rows = 2.5e9 comparisons.
    if (args.length > 1 && args(1) == "crossover") {
      val nRows = if (args.length > 2) args(2).toLong else 50000L
      val big = spark.range(0, nRows).select(
        $"id".as("p_partkey"),
        ($"id".cast("double") / 100).as("p_retailprice"),
        $"id".cast("int").as("p_size")).localCheckpoint()
      time("skyline10x_bucketed") {
        val pl = big.groupBy($"p_retailprice".as("price"))
          .agg(max($"p_size").as("msize"))
          .withColumn("b", floor($"price").cast("long"))
        val wIn = org.apache.spark.sql.expressions.Window
          .partitionBy($"b").orderBy($"price")
          .rowsBetween(Long.MinValue, -1)
        val inb = pl.withColumn("prior_in", max($"msize").over(wIn))
        val wB = org.apache.spark.sql.expressions.Window
          .orderBy($"b").rowsBetween(Long.MinValue, -1)
        val bm = pl.groupBy($"b").agg(max($"msize").as("bmax"))
          .withColumn("prior_b", max($"bmax").over(wB))
        val prior = inb.join(broadcast(bm.select($"b", $"prior_b")), Seq("b"))
          .select($"price", greatest($"prior_in", $"prior_b").as("prior"))
        big.join(prior, big("p_retailprice") === prior("price"))
          .filter($"p_size" > coalesce($"prior", lit(-1)))
          .agg(count(lit(1))).head.getLong(0)
      }
      time("skyline10x_naive_antijoin") {
        big.as("p").join(big.as("q"),
            col("q.p_retailprice") < col("p.p_retailprice") &&
              col("q.p_size") >= col("p.p_size"), "left_anti")
          .agg(count(lit(1))).head.getLong(0)
      }
    }
    spark.stop()
  }
}
