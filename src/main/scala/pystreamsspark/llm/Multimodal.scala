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
  * Decode dispatch ([[decode]]): payloads whose bytes carry a REAL
  * container header are parsed for real — dependency-free PNG IHDR and
  * JPEG SOF marker-walk parsers ([[decodeHeader]]), both public file
  * formats (PNG: RFC 2083 / ISO 15948 §5.3; JPEG: ITU-T T.81 §B.2.2) —
  * and everything else falls back to [[decodeStub]], a deterministic
  * fake keyed on payload bytes. Pixel/frame DECODING (vs header
  * metadata) stays stubbed — this container ships no media libraries —
  * but the Spark-side plumbing (schema, partition-wise batch
  * processing, explode shape, shuffle behavior) is real and tested, and
  * so is the header path. Swap `frameFeatureStub` for a real codec and
  * nothing else changes.
  *
  * Scale notes: decode runs inside `mapPartitions` — per-partition
  * batches, no driver involvement, no shuffle. Frame sampling is a
  * generator (`explode`) BEFORE any shuffle, so only sampled frames ever
  * move. Payload bytes stay columnar parquet `binary`; pushdown prunes
  * them unless explicitly selected.
  */
object Multimodal {

  /** Real, dependency-free container-header parse. Returns None when the
    * bytes are not a recognized container (caller falls back to the
    * stub).
    *
    *  - PNG: 8-byte signature, then the IHDR chunk (always first, per
    *    spec): width/height are the two big-endian u32s at offsets
    *    16/20.
    *  - JPEG: SOI marker FF D8, then a walk over FF-prefixed marker
    *    segments (each carrying a big-endian u16 length that includes
    *    itself) until the first SOF0..SOF15 frame header (excluding
    *    DHT/JPG/DAC at C4/C8/CC, which reuse the Cx range but are not
    *    frame headers): height/width are the u16s after the precision
    *    byte. Stops at SOS/EOI — a frameless stream is not an image.
    */
  def decodeHeader(p: Array[Byte]): Option[MediaMeta] = {
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int) = (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toInt)
    if (p.length >= 24 && (0 until 8).forall(i => u8(i) == pngSig(i)) &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R') {
      val w = u32(16); val h = u32(20)
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some(MediaMeta(w.toInt, h.toInt, 1, "png"))
      else None
    } else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < p.length) {
        if (u8(i) != 0xff) return None // marker desync: not a JPEG stream
        var m = u8(i + 1)
        while (m == 0xff && i + 2 < p.length) { i += 1; m = u8(i + 1) } // fill bytes
        if (m == 0xff) return None // payload ends inside marker fill bytes
        if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
        if (m >= 0xd0 && m <= 0xd7) i += 2 // RSTn: standalone, no length
        else {
          // the fill-byte walk may have consumed the outer loop's i+3
          // headroom — re-check before reading the 2-byte length field
          if (i + 3 >= p.length) return None
          val len = u16(i + 2)
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (len < 7 || i + 8 >= p.length) return None
            val h = u16(i + 5); val w = u16(i + 7)
            return if (w > 0 && h > 0) Some(MediaMeta(w, h, 1, "jpeg")) else None
          }
          if (len < 2) return None // lengths include themselves; <2 is corrupt
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Parsed WAV (RIFF/WAVE) audio metadata. */
  case class AudioMeta(channels: Int, sampleRate: Int, bitsPerSample: Int,
                       nSamples: Long)

  /** Real, dependency-free WAV header parse (RIFF container, little-
    * endian — deliberately the opposite byte order of the PNG/JPEG
    * parsers above, so an endianness bug in either direction fails its
    * oracle). Layout per the public RIFF/WAVE spec (Microsoft/IBM 1991,
    * mirrored in RFC 2361): "RIFF" + u32le size + "WAVE", then a chunk
    * walk ("fmt " carries channels/rate/bits/blockAlign at fixed
    * offsets; "data" carries the payload size; chunks are word-aligned).
    * nSamples = dataSize / blockAlign. Returns None for anything that
    * is not a well-formed WAV. */
  def decodeWavHeader(p: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int) = p(i) & 0xff
    def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (p.length < 12 ||
        p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
        p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E')
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // ch, rate, blockAlign, bits
    var dataSize = -1L
    var malformed = false
    while (!malformed && i + 8 <= p.length && (fmt.isEmpty || dataSize < 0)) {
      val sz = u32le(i + 4)
      val isFmt = p(i) == 'f' && p(i + 1) == 'm' && p(i + 2) == 't' &&
        p(i + 3) == ' '
      val isData = p(i) == 'd' && p(i + 1) == 'a' && p(i + 2) == 't' &&
        p(i + 3) == 'a'
      if (isFmt && sz >= 16 && i + 8 + 16 <= p.length)
        fmt = Some((u16le(i + 10), u32le(i + 12).toInt, u16le(i + 20),
          u16le(i + 22)))
      else if (isData) dataSize = sz
      // a data chunk's payload bytes need not be present (header-only
      // payloads) — but any FURTHER chunk walk needs the skip. A
      // declared size past Int.MaxValue-ish would overflow the cursor
      // and walk BACKWARDS into a negative index (found by
      // ParserFuzzSpec on adversarially mutated bytes) — stop the walk
      // instead; whatever fmt/data was already parsed still stands.
      if (sz > p.length.toLong) malformed = true
      else {
        // advance in Long: for a near-2GB payload, i+8+sz can exceed
        // Int.MaxValue even when sz <= p.length, wrapping the cursor
        // negative and indexing out of bounds.
        val next = i.toLong + 8L + sz + (sz & 1L)
        if (next > Int.MaxValue) malformed = true else i = next.toInt
      }
    }
    fmt match {
      case Some((ch, rate, ba, bits))
          if dataSize >= 0 && ba > 0 && ch > 0 && rate > 0 =>
        Some(AudioMeta(ch, rate, bits, dataSize / ba))
      case _ => None
    }
  }

  /** Attach decoded AUDIO metadata per row — same partition-wise batch
    * decode shape as [[withMeta]]; non-WAV payloads yield zero rows
    * (flatMap), the filter-on-decode shape a mixed-modality corpus
    * needs. duration_ms is exact integer math: nSamples·1000 div rate. */
  def withAudioMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeWavHeader(bytes).map(m =>
          (id, m.channels, m.sampleRate, m.bitsPerSample, m.nSamples,
            m.nSamples * 1000L / m.sampleRate))
      }
      .toDF(idCol, "channels", "sample_rate", "bits", "n_samples",
        "duration_ms")
  }

  /** REAL sample-level WAV decode — the codec-free modality where leaf
    * feature extraction needs no external library: 16-bit PCM is just
    * little-endian shorts after the data-chunk header (RIFF/WAVE spec as
    * in [[decodeWavHeader]]). Returns the raw interleaved samples,
    * bounds-safe on truncated/adversarial bytes (only bytes actually
    * present are read; a declared-but-absent data payload yields the
    * present prefix). None for anything that is not 16-bit PCM WAV. */
  def decodeWavSamples(p: Array[Byte]): Option[Array[Int]] = {
    def u8(i: Int) = p(i) & 0xff
    def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (p.length < 12 ||
        p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
        p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E')
      return None
    var i = 12
    var bits = -1
    var dataOff = -1; var dataLen = -1L
    var malformed = false
    while (!malformed && i + 8 <= p.length && (bits < 0 || dataOff < 0)) {
      val sz = u32le(i + 4)
      if (p(i) == 'f' && p(i + 1) == 'm' && p(i + 2) == 't' &&
          p(i + 3) == ' ' && sz >= 16 && i + 8 + 16 <= p.length)
        bits = u16le(i + 22)
      else if (p(i) == 'd' && p(i + 1) == 'a' && p(i + 2) == 't' &&
          p(i + 3) == 'a') { dataOff = i + 8; dataLen = sz }
      val next = i.toLong + 8L + sz + (sz & 1L)
      if (next > Int.MaxValue) malformed = true else i = next.toInt
    }
    if (bits != 16 || dataOff < 0) None
    else {
      // only bytes actually present: header-only payloads decode to the
      // empty sample array rather than reading past the buffer
      val avail = math.max(0L, math.min(dataLen, (p.length - dataOff).toLong))
      val n = (avail / 2).toInt
      val out = new Array[Int](n)
      var k = 0
      while (k < n) {
        // sign-extended little-endian int16
        out(k) = (u8(dataOff + 2 * k) | (p(dataOff + 2 * k + 1).toInt << 8))
        k += 1
      }
      Some(out)
    }
  }

  /** REAL per-payload audio features from the decoded PCM samples — the
    * leaf-extraction tier [[frameFeatureStub]] stubs for codec-bound
    * formats, here real end-to-end for WAV: peak amplitude, exact
    * integer energy (Σv², order-free), strict zero crossings
    * (v·prev < 0), and RMS (exact double division of sub-2^53 integers +
    * correctly-rounded sqrt — cross-engine exact, so an oracle can
    * replay it arithmetically). Partition-wise flatMap, zero shuffle;
    * non-WAV / non-16-bit / empty payloads yield no row. */
  def withWavStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeWavSamples(bytes).filter(_.nonEmpty).map { s =>
          var peak = 0; var sumSq = 0L; var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i)
            if (math.abs(v) > peak) peak = math.abs(v)
            sumSq += v.toLong * v
            if (i > 0 && s(i - 1) * v < 0) zc += 1
            i += 1
          }
          (id, s.length.toLong, peak, sumSq, zc,
            math.sqrt(sumSq.toDouble / s.length))
        }
      }
      .toDF(idCol, "n_samples", "peak", "sum_sq", "zero_cross", "rms")
  }

  /** Decoded uncompressed BMP: pixels as 0xRRGGBB ints in TOP-DOWN
    * row-major order (the natural image order), whatever the stored
    * row direction was. */
  case class BmpPixels(width: Int, height: Int, rgb: Array[Int])

  /** REAL pixel-level BMP decode — the IMAGE twin of
    * [[decodeWavSamples]], closing the second codec-free modality:
    * an uncompressed 24-bit BI_RGB bitmap is just BGR byte triples
    * under a fixed header (BITMAPFILEHEADER + BITMAPINFOHEADER), rows
    * padded to 4 bytes and stored bottom-up for positive heights
    * (top-down for negative — both handled; the position-sensitive
    * checksum downstream breaks on any flip or stride bug).
    * Bounds-safe: truncated/adversarial bytes return None rather than
    * reading past the buffer. None for compressed/paletted variants —
    * those genuinely need a codec and stay stubbed. */
  def decodeBmpPixels(p: Array[Byte]): Option[BmpPixels] = {
    def u8(i: Int) = p(i) & 0xff
    def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def s32le(i: Int) = u32le(i).toInt
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val off = u32le(10).toInt
    if (u32le(14) < 40) return None // DIB header older than BITMAPINFO
    val w = s32le(18)
    val hRaw = s32le(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || u16le(26) != 1 || u16le(28) != 24 ||
      u32le(30) != 0L) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * h > p.length ||
      w.toLong * h > Int.MaxValue / 8) return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val base = off + srcRow * stride
      var x = 0
      while (x < w) {
        val b = u8(base + 3 * x)
        val g = u8(base + 3 * x + 1)
        val r = u8(base + 3 * x + 2)
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Some(BmpPixels(w, h, out))
  }

  /** REAL per-payload image features from the decoded pixels: exact
    * per-channel sums and min/max (means derive exactly from sum/n_px),
    * plus a POSITION-SENSITIVE integer checksum
    * `Σ (k+1)·(3r + 5g + 7b)` over the top-down row-major index k —
    * row order, stride padding and BGR→RGB bugs all break it, and it
    * is sub-2^53 exact so an oracle replays it arithmetically.
    * Partition-wise flatMap, zero shuffle; non-BMP payloads yield no
    * row. */
  def withBmpStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeBmpPixels(bytes).map { bp =>
          var sumR = 0L; var sumG = 0L; var sumB = 0L
          var minR = 255; var maxR = 0
          var minG = 255; var maxG = 0
          var minB = 255; var maxB = 0
          var checksum = 0L
          var k = 0
          while (k < bp.rgb.length) {
            val px = bp.rgb(k)
            val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff
            val b = px & 0xff
            sumR += r; sumG += g; sumB += b
            if (r < minR) minR = r; if (r > maxR) maxR = r
            if (g < minG) minG = g; if (g > maxG) maxG = g
            if (b < minB) minB = b; if (b > maxB) maxB = b
            checksum += (k + 1).toLong * (3L * r + 5L * g + 7L * b)
            k += 1
          }
          (id, bp.width, bp.height, bp.rgb.length.toLong,
            sumR, sumG, sumB, minR, maxR, minG, maxG, minB, maxB, checksum)
        }
      }
      .toDF(idCol, "width", "height", "n_px", "sum_r", "sum_g", "sum_b",
        "min_r", "max_r", "min_g", "max_g", "min_b", "max_b", "checksum")
  }

  /** Parsed MP4 (ISO base-media / ISO 14496-12) video metadata. */
  case class VideoMeta(brand: String, timescale: Int, durationTicks: Long,
                       nTracks: Int)

  /** Real, dependency-free MP4/ISO-BMFF box walk (big-endian, the VIDEO
    * companion of the PNG/JPEG and WAV parsers — the three cover both
    * byte orders and both flat-chunk and nested-box container styles).
    * Layout per the public ISO/IEC 14496-12 spec: a file is a sequence
    * of boxes (u32be size incl. header + 4cc type); `ftyp` carries the
    * major brand at offset 8; `moov` is a pure container whose children
    * include exactly one `mvhd` FullBox (version 0: u32 creation/
    * modification, u32 timescale, u32 duration at offsets 12/16/20/24;
    * version 1: u64 creation/modification, u32 timescale, u64 duration
    * at 12/20/28/32) and one `trak` container per track. Both mvhd
    * versions are parsed — the differential key synthesizes v0 for even
    * ids and v1 for odd ids so a version-offset bug fails the oracle.
    * Returns None for truncated/inconsistent box sizes or a missing
    * ftyp/moov/mvhd. */
  def decodeMp4Header(p: Array[Byte]): Option[VideoMeta] = {
    def u8(i: Int) = p(i) & 0xff
    def u32(i: Int) = (u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Int) = (u32(i) << 32) | u32(i + 4)
    def fourcc(i: Int) = new String(p, i, 4, "US-ASCII")
    var i = 0
    var brand: Option[String] = None
    var ts = -1L; var dur = -1L; var tracks = 0; var sawMvhd = false
    while (i + 8 <= p.length) {
      val sz = u32(i)
      if (sz < 8 || i + sz > p.length) return None // malformed box size
      fourcc(i + 4) match {
        case "ftyp" if sz >= 12 => brand = Some(fourcc(i + 8))
        case "moov" =>
          var j = i + 8
          while (j + 8 <= i + sz) {
            val csz = u32(j)
            if (csz < 8 || j + csz > i + sz) return None
            fourcc(j + 4) match {
              // FullBox minimum is 12 bytes (size+type+version+flags); a
              // bare 8-byte 'mvhd' ending at end-of-file must not read
              // the version byte — that's one past the array.
              case "mvhd" if csz >= 12 =>
                val v = u8(j + 8)
                if (v == 0 && csz >= 28) {
                  ts = u32(j + 20); dur = u32(j + 24); sawMvhd = true
                } else if (v == 1 && csz >= 40) {
                  ts = u32(j + 28); dur = u64(j + 32); sawMvhd = true
                }
              case "trak" => tracks += 1
              case _ => ()
            }
            j += csz.toInt
          }
        case _ => ()
      }
      i += sz.toInt
    }
    brand match {
      case Some(b) if sawMvhd && ts > 0 && dur >= 0 =>
        Some(VideoMeta(b, ts.toInt, dur, tracks))
      case _ => None
    }
  }

  /** Attach decoded VIDEO metadata per row — same partition-wise
    * flatMap decode shape as [[withAudioMeta]]; non-MP4 payloads yield
    * zero rows. duration_ms is exact integer math (ticks·1000 div
    * timescale) so the DuckDB oracle replays it without float drift. */
  def withVideoMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeMp4Header(bytes).map(m =>
          (id, m.brand, m.timescale, m.durationTicks, m.nTracks,
            m.durationTicks * 1000L / m.timescale))
      }
      .toDF(idCol, "brand", "timescale", "duration_ticks", "n_tracks",
        "duration_ms")
  }

  /** STUB decoder — deterministic fake metadata derived from the payload
    * bytes; the fallback for payloads with no recognized real header. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    val first = if (n > 0) payload(0) & 0xff else 0
    MediaMeta(
      width = 640 + n % 1280,
      height = 360 + first % 720,
      nFrames = n % 100 + 1,
      format = (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  /** Decode dispatch: real header parse when the bytes carry one, stub
    * otherwise. */
  def decode(payload: Array[Byte]): MediaMeta =
    decodeHeader(payload).getOrElse(decodeStub(payload))

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
      .mapPartitions(_.map { case (id, bytes) => (id, decode(bytes)) })
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
        val meta = decode(bytes)
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
