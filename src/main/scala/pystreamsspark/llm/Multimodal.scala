package pystreamsspark.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media metadata produced by the (stubbed) decoder. */
case class MediaMeta(width: Int, height: Int, nFrames: Int, format: String)

/** A decoded/sampled frame reference: which payload, which frame index,
  * and the (stub) per-frame feature vector. */
case class FrameSample(id: Long, frameIdx: Int, feature: Array[Float])

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns + typed metadata structs.
  *
  * The actual byte-level decoders (JPEG/PNG/audio codecs) are STUBBED —
  * this container ships no media libraries — behind [[decodeStub]], a
  * deterministic fake keyed on payload bytes, so the Spark-side plumbing
  * (schema, partition-wise batch processing, explode shape, shuffle
  * behavior) is real and tested. Swap `decodeStub`/`frameFeatureStub`
  * for real codecs and nothing else changes.
  *
  * Scale notes: decode runs inside `mapPartitions` — per-partition
  * batches, no driver involvement, no shuffle. Frame sampling is a
  * generator (`explode`) BEFORE any shuffle, so only sampled frames ever
  * move. Payload bytes stay columnar parquet `binary`; pushdown prunes
  * them unless explicitly selected.
  */
object Multimodal {

  /** STUB decoder — deterministic fake metadata derived from the payload
    * bytes (a real implementation would parse the container header). */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    val first = if (n > 0) payload(0) & 0xff else 0
    MediaMeta(
      width = 640 + n % 1280,
      height = 360 + first % 720,
      nFrames = n % 100 + 1,
      format = (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  /** STUB per-frame feature extractor — deterministic 8-dim fake. */
  def frameFeatureStub(payload: Array[Byte], frameIdx: Int): Array[Float] = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(payload, frameIdx)
    Array.tabulate(8)(i => ((h >>> (i * 4)) & 0xf).toFloat / 15f)
  }

  /** Attach decoded metadata to every row: partition-wise batch decode
    * via mapPartitions (the Dataset analogue of an Arrow-batch UDF). */
  def withMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, decodeStub(bytes)) })
      .toDF(idCol, "meta")
      .select(col(idCol), col("meta.width"), col("meta.height"),
        col("meta.nFrames").as("n_frames"), col("meta.format"))
  }

  /** Sample every `everyN`-th frame of each payload and extract the
    * (stub) feature vector — one row per sampled frame. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   everyN: Int): Dataset[FrameSample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val meta = decodeStub(bytes)
        (0 until meta.nFrames by everyN).map(f =>
          FrameSample(id, f, frameFeatureStub(bytes, f)))
      }
  }

  /** Resize stub: metadata-only transform (real impl would re-encode the
    * payload); keeps the binary column intact through the projection. */
  def resizeMeta(df: DataFrame, idCol: String, binCol: String,
                 maxDim: Int): DataFrame =
    withMeta(df, idCol, binCol)
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxDim, lit(1.0))
          .otherwise(lit(maxDim).cast("double") / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
}
