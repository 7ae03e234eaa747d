package pystreamsspark.llm

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** End-to-end multimodal near-dup pipeline: binary payloads →
  * partition-wise frame sampling → mean-pooled per-asset embedding →
  * LSH ANN pair detection. Planted byte-identical duplicates must
  * surface with cosine 1.0 — exercises the full chain the stub
  * decoders exist for (swap the stubs for codecs, nothing else moves).
  */
class MultimodalPipelineSpec extends SparkSpec {

  test("planted duplicate payloads found via frame-feature ANN") {
    val s = spark
    import s.implicits._
    // 40 deterministic synthetic payloads + 5 byte-identical dups (id+1000)
    def payload(i: Int): Array[Byte] =
      Array.tabulate(64 + i)(j => ((i * 31 + j * 7) % 251).toByte)
    val originals = (0 until 40).map(i => (i.toLong, payload(i)))
    val dups = (0 until 5).map(i => (i.toLong + 1000L, payload(i)))
    val df = (originals ++ dups).toDF("id", "payload")

    val frames = Multimodal.sampleFrames(df, "id", "payload", everyN = 3)
    assert(frames.count() > 0)

    // mean-pool the frame features into one embedding per asset
    val pooled = frames.groupByKey(_.id).mapGroups { (id, it) =>
      val fs = it.toSeq
      val dim = fs.head.feature.length
      val acc = new Array[Float](dim)
      fs.foreach(f => (0 until dim).foreach(d => acc(d) += f.feature(d)))
      (id, acc.map(_ / fs.size))
    }.toDF("vec_id", "embedding")

    val pairs = Similarity.annPairs(pooled, "vec_id", "embedding",
        planes = 6, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every planted dup pairs with its original at cosine ~1
    (0 until 5).foreach { i =>
      val hit = pairs.find(p => p._1 == i.toLong && p._2 == i.toLong + 1000L)
      assert(hit.isDefined, s"planted dup $i not found; pairs=${pairs.take(10).toSeq}")
      assert(math.abs(hit.get._3 - 1.0) < 1e-12)
    }
  }

  test("payload binary column is pruned when only metadata is selected") {
    val s = spark
    import s.implicits._
    val df = (0 until 10).map(i =>
      (i.toLong, Array.tabulate(100)(_.toByte), s"asset$i")).toDF("id", "payload", "name")
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "mm-").toFile.getAbsolutePath + "/assets"
    df.write.parquet(dir)
    val scan = spark.read.parquet(dir).select($"id", $"name")
    scan.collect()
    val read = scan.queryExecution.executedPlan.toString
    assert(read.contains("ReadSchema"), read)
    assert(!read.contains("payload"), s"binary column not pruned from scan: $read")
  }
}
