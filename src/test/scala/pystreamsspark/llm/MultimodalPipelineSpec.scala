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

  test("real PNG IHDR header parse: a genuine 1x1 PNG decodes for real, not via stub") {
    val s = spark
    import s.implicits._
    // a complete, real 1x1 transparent PNG file (67 bytes)
    val png1x1 = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(Multimodal.decodeHeader(png1x1) === Some(MediaMeta(1, 1, 1, "png")))
    // a wider synthetic-but-spec-correct IHDR: 640x360
    val ihdr = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, 0, 0, 1, 0x68, 8, 6, 0, 0, 0).map(_.toByte)
    assert(Multimodal.decodeHeader(ihdr) === Some(MediaMeta(640, 360, 1, "png")))
    // end-to-end: the mapPartitions path must route the real payload
    // through the header parser, and non-container bytes through the stub
    val stubBytes = Array.tabulate(10)(_.toByte)
    val df = Seq((1L, png1x1), (2L, stubBytes)).toDF("id", "payload")
    val meta = Multimodal.withMeta(df, "id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(4))).toMap
    assert(meta(1L) === ((1, 1, "png")))
    val st = Multimodal.decodeStub(stubBytes)
    assert(meta(2L) === ((st.width, st.height, st.format)))
  }

  test("real JPEG SOF marker walk: skips APP segments, reads the frame header") {
    // SOI + APP0(JFIF, len 16) + DQT-ish filler skipped + SOF0 (8-bit,
    // h=2, w=3, 1 component) + EOI — structurally correct per ITU-T T.81
    val jpeg = Array[Int](
      0xff, 0xd8,                               // SOI
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0, // APP0
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x02, 0x00, 0x03, 0x01, 0x01, 0x11, 0x00, // SOF0
      0xff, 0xd9).map(_.toByte)                 // EOI
    assert(Multimodal.decodeHeader(jpeg) === Some(MediaMeta(3, 2, 1, "jpeg")))
    // progressive (SOF2) also counts as a frame header
    val sof2 = jpeg.updated(21, 0xc2.toByte)
    assert(Multimodal.decodeHeader(sof2) === Some(MediaMeta(3, 2, 1, "jpeg")))
    // DHT (C4) in the Cx range is NOT a frame header: stream with only
    // DHT then EOI yields None (falls back to stub via decode())
    val noSof = Array[Int](0xff, 0xd8, 0xff, 0xc4, 0x00, 0x04, 0, 0,
      0xff, 0xd9).map(_.toByte)
    assert(Multimodal.decodeHeader(noSof) === None)
    assert(Multimodal.decode(noSof) === Multimodal.decodeStub(noSof))
    // truncated garbage and empty payloads never throw
    assert(Multimodal.decodeHeader(Array[Byte]()) === None)
    assert(Multimodal.decodeHeader(Array[Byte](0xff.toByte, 0xd8.toByte)) === None)
    assert(Multimodal.decodeHeader("plain text".getBytes) === None)
    // payload ending inside marker FILL bytes (FF FF...) must return
    // None, not read past the array: the fill-byte walk consumes the
    // outer loop's bounds headroom before the length-field read
    assert(Multimodal.decodeHeader(
      Array[Int](0xff, 0xd8, 0xff, 0xff, 0xff, 0xff).map(_.toByte)) === None)
    assert(Multimodal.decodeHeader(
      Array[Int](0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0).map(_.toByte)) === None)
    // truncated right after a non-standalone marker code (no length field)
    assert(Multimodal.decodeHeader(
      Array[Int](0xff, 0xd8, 0xff, 0xe0, 0x00).map(_.toByte)) === None)
  }

  test("real WAV RIFF header parse: genuine little-endian bytes decode; malformed reject") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-built 2-channel 16-bit 16 kHz WAV with a LIST chunk BEFORE
    // fmt (chunk-walk exercise) and a 400-byte data chunk -> 100 samples
    def wav(withData: Boolean): Array[Byte] = {
      val bb = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(120); bb.put("WAVE".getBytes)
      bb.put("LIST".getBytes); bb.putInt(4); bb.put("INFO".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(2); bb.putInt(16000); bb.putInt(64000)
      bb.putShort(4); bb.putShort(16)
      if (withData) { bb.put("data".getBytes); bb.putInt(400) }
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val m = Multimodal.decodeWavHeader(wav(withData = true))
    assert(m === Some(Multimodal.AudioMeta(2, 16000, 16, 100L)))
    // no data chunk -> not a playable WAV
    assert(Multimodal.decodeWavHeader(wav(withData = false)) === None)
    // wrong magic
    assert(Multimodal.decodeWavHeader("RIFX1234WAVE".getBytes) === None)
    // truncated before the fmt payload
    assert(Multimodal.decodeWavHeader(
      "RIFF\u0000\u0000\u0000\u0000WAVEfmt ".getBytes("ISO-8859-1")) === None)
    // JPEG/PNG parsers must NOT claim a WAV and vice versa
    assert(Multimodal.decodeHeader(wav(withData = true)) === None)
  }

  test("real MP4 ISO-BMFF box walk: mvhd v0 and v1 decode; malformed reject") {
    import java.nio.ByteBuffer // ISO-BMFF is big-endian (ByteBuffer default)
    // hand-built minimal MP4: ftyp(isom) + free (walked over) + moov
    // containing mvhd (v0 or v1, timescale 600, duration 3000 ticks)
    // and two empty trak boxes
    def mp4(v1: Boolean, corruptChildSize: Boolean = false): Array[Byte] = {
      val bb = ByteBuffer.allocate(256)
      bb.putInt(20); bb.put("ftyp".getBytes)
      bb.put("isom".getBytes); bb.putInt(0); bb.put("mp42".getBytes)
      bb.putInt(8); bb.put("free".getBytes) // unknown top-level box, skipped
      val mvhdSz = if (v1) 120 else 108
      bb.putInt(8 + mvhdSz + 16); bb.put("moov".getBytes)
      bb.putInt(if (corruptChildSize) 4 else mvhdSz); bb.put("mvhd".getBytes)
      if (v1) {
        bb.putInt(0x01000000)                 // version 1 + flags
        bb.putLong(0L); bb.putLong(0L)        // creation/modification u64
        bb.putInt(600); bb.putLong(3000L)     // timescale u32, duration u64
        (0 until (mvhdSz - 40) / 4).foreach(_ => bb.putInt(0))
      } else {
        bb.putInt(0)                          // version 0 + flags
        bb.putInt(0); bb.putInt(0)            // creation/modification u32
        bb.putInt(600); bb.putInt(3000)       // timescale, duration u32
        (0 until (mvhdSz - 28) / 4).foreach(_ => bb.putInt(0))
      }
      bb.putInt(8); bb.put("trak".getBytes)
      bb.putInt(8); bb.put("trak".getBytes)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    assert(Multimodal.decodeMp4Header(mp4(v1 = false)) ===
      Some(Multimodal.VideoMeta("isom", 600, 3000L, 2)))
    assert(Multimodal.decodeMp4Header(mp4(v1 = true)) ===
      Some(Multimodal.VideoMeta("isom", 600, 3000L, 2)))
    // child box size below the 8-byte header minimum -> malformed
    assert(Multimodal.decodeMp4Header(mp4(v1 = false,
      corruptChildSize = true)) === None)
    // truncated mid-box: declared size runs past the payload
    assert(Multimodal.decodeMp4Header(
      mp4(v1 = false).take(40)) === None)
    // no moov/mvhd -> not a movie
    assert(Multimodal.decodeMp4Header(mp4(v1 = false).take(20)) === None)
    // the image/audio parsers must not claim an MP4 and vice versa
    assert(Multimodal.decodeHeader(mp4(v1 = false)) === None)
    assert(Multimodal.decodeWavHeader(mp4(v1 = false)) === None)
    assert(Multimodal.decodeMp4Header("RIFF0000WAVE".getBytes) === None)
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
