package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables

/** Set operators (SURVEY.md §2.6): union / union all / intersect / except. */
object SetQueries {

  /** UNION ALL of two tagged slices + per-tag counts after a distinct
    * union — exercises both bag and set semantics in one result. */
  def qUnion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hi = Tables.orders(spark, sfDir).filter($"o_totalprice" > 400000.0)
      .select($"o_custkey".as("custkey"))
    val urgent = Tables.orders(spark, sfDir).filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("custkey"))
    hi.union(urgent)                    // UNION ALL
      .groupBy($"custkey").agg(count(lit(1)).as("n_all"))
      .join(hi.union(urgent).distinct().withColumn("in_set", lit(1)), Seq("custkey"))
      .select($"custkey", $"n_all", $"in_set")
      .orderBy($"custkey")
  }

  val qUnionSql: String =
    """WITH u AS (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
      |  UNION ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT custkey, COUNT(*) AS n_all, 1 AS in_set
      |FROM u
      |GROUP BY custkey
      |ORDER BY custkey""".stripMargin

  /** INTERSECT and EXCEPT between nations-with-customers and
    * nations-with-suppliers, tagged and stacked. */
  def qIntersectExcept(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val custNations = Tables.customer(spark, sfDir).select($"c_nationkey".as("nationkey"))
    val suppNations = Tables.supplier(spark, sfDir).select($"s_nationkey".as("nationkey"))
    val both = custNations.intersect(suppNations).withColumn("tag", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly)
      .select($"tag", $"nationkey")
      .orderBy($"tag", $"nationkey")
  }

  val qIntersectExceptSql: String =
    """SELECT 'both' AS tag, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT
      |  SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'cust_only' AS tag, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT
      |  SELECT s_nationkey FROM supplier)
      |ORDER BY tag, nationkey""".stripMargin

  /** Multimodal column plumbing: documents carried as opaque binary
    * payloads with a deterministic metadata "decode" (the real decoder is
    * stubbed — see pystreamsspark.llm.Multimodal — but the schema,
    * partitioning and batch shape are real). */
  def qMultimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"text".cast("binary").as("payload"),
        ascii(substring($"text", 1, 1)).as("first_byte"))
      .select(
        $"doc_id",
        length($"payload").as("n_bytes"),
        (lit(640) + pmod(length($"payload"), lit(1280))).as("width"),
        (lit(360) + pmod($"first_byte", lit(720))).as("height"),
        (pmod(length($"payload"), lit(100)) + 1).as("n_frames"),
        when(pmod(length($"payload"), lit(3)) === 0, "jpeg")
          .when(pmod(length($"payload"), lit(3)) === 1, "png")
          .otherwise("webp").as("format"))
      .orderBy($"doc_id")
  }

  /** REAL container-header decode, oracle-checked differentially: Spark
    * synthesizes spec-correct PNG IHDR / JPEG SOF0 payload BYTES from
    * each doc's id (unhex of the exact header layout), then parses them
    * back with the dependency-free byte parsers
    * ([[pystreamsspark.llm.Multimodal.decodeHeader]]) inside the
    * mapPartitions decode path; the oracle recomputes the expected
    * dimensions arithmetically. A parser bug (endianness, offset, marker
    * walk) breaks the hash match — this is the key that makes the
    * multimodal decode row real rather than stubbed. */
  def qMediaHeader(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = pmod($"doc_id", lit(4096)) + 1
    val h = pmod($"doc_id" * 7, lit(2160)) + 1
    val png = unhex(concat(
      lit("89504E470D0A1A0A0000000D49484452"), // signature + IHDR len/type
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
      lit("0806000000")))                      // bit depth/color/etc
    val jpeg = unhex(concat(
      lit("FFD8"),                             // SOI
      lit("FFE000104A46494600010100000100010000"), // APP0 (walked over)
      lit("FFC0000B08"),                       // SOF0, len 11, 8-bit
      lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
      lit("01011100"),                         // 1 component
      lit("FFD9")))                            // EOI
    val payloads = Tables.documents(spark, sfDir)
      .select($"doc_id",
        when(pmod($"doc_id", lit(2)) === 0, png).otherwise(jpeg).as("payload"))
    pystreamsspark.llm.Multimodal.withMeta(payloads, "doc_id", "payload")
      .select($"doc_id", $"width", $"height", $"format")
      .orderBy($"doc_id")
  }

  /** REAL WAV (RIFF) header decode, oracle-checked differentially —
    * the AUDIO companion of [[qMediaHeader]]: Spark synthesizes
    * spec-correct little-endian WAV headers (RIFF + fmt + data chunks)
    * byte-for-byte from each doc's id, parses them back with
    * [[pystreamsspark.llm.Multimodal.decodeWavHeader]] inside the
    * flatMap decode path, and the oracle recomputes channels / sample
    * rate / sample count / duration arithmetically. Endianness, chunk
    * offsets and the blockAlign division all break the hash on any
    * parser bug. */
  def qAudioMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ch = (pmod($"doc_id", lit(2)) + 1).cast("int")          // 1..2
    val rate = ((pmod($"doc_id", lit(5)) + 1) * 8000).cast("int") // 8k..40k
    val blockAlign = (ch * 2).cast("int")                        // 16-bit PCM
    val nSamples = (pmod($"doc_id" * 31, lit(48000)) + 1).cast("int")
    val dataSize = (nSamples * blockAlign).cast("int")
    def u32le(c: org.apache.spark.sql.Column) = {
      val h = lpad(hex(c), 8, "0")
      concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2))
    }
    def u16le(c: org.apache.spark.sql.Column) = {
      val h = lpad(hex(c), 4, "0")
      concat(substring(h, 3, 2), substring(h, 1, 2))
    }
    val wav = unhex(concat(
      lit("52494646"), u32le(dataSize + 36), lit("57415645"), // RIFF/WAVE
      lit("666D7420"), u32le(lit(16)),                        // fmt , len 16
      u16le(lit(1)), u16le(ch),                               // PCM, channels
      u32le(rate), u32le(rate * blockAlign),                  // rate, byteRate
      u16le(blockAlign), u16le(lit(16)),                      // align, bits
      lit("64617461"), u32le(dataSize)))                      // data header
    val payloads = Tables.documents(spark, sfDir)
      .select($"doc_id", wav.as("payload"))
    pystreamsspark.llm.Multimodal.withAudioMeta(payloads, "doc_id", "payload")
      .orderBy($"doc_id")
  }

  /** REAL sample-level WAV feature extraction, oracle-checked — the
    * round-10 upgrade of multimodal leaf features from stub to real for
    * the codec-free modality: Spark synthesizes complete 16-bit mono PCM
    * WAV payloads (header + actual little-endian sample bytes, sample k
    * of doc d = (d·7 + k·13) % 2001 − 1000), decodes them back with
    * [[pystreamsspark.llm.Multimodal.decodeWavSamples]], and computes
    * REAL audio features per payload (peak, exact integer energy, strict
    * zero crossings, RMS). The oracle regenerates the same samples
    * arithmetically (lateral generate_series) and recomputes every
    * feature — any byte-packing, sign-extension, offset or feature bug
    * breaks the hash. RMS is cross-engine exact: sub-2^53 integer
    * division in double + correctly-rounded sqrt. */
  def qWavStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n = (pmod($"doc_id", lit(50)) + 4).cast("int")
    def u32le(c: org.apache.spark.sql.Column) = {
      val h = lpad(hex(c), 8, "0")
      concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2))
    }
    def u16le(c: org.apache.spark.sql.Column) = {
      val h = lpad(hex(c), 4, "0")
      concat(substring(h, 3, 2), substring(h, 1, 2))
    }
    val dataSize = (n * 2).cast("int")
    // sample k = (doc_id*7 + k*13) % 2001 - 1000 ∈ [-1000, 1000], packed
    // as two's-complement little-endian int16 hex
    val sampleHex = array_join(
      transform(sequence(lit(0), n - 1), k => {
        val v = pmod($"doc_id" * 7 + k * 13, lit(2001)) - 1000
        val h = lpad(hex(pmod(v + 65536, lit(65536))), 4, "0")
        concat(substring(h, 3, 2), substring(h, 1, 2))
      }), "")
    val wav = unhex(concat(
      lit("52494646"), u32le(dataSize + 36), lit("57415645"), // RIFF/WAVE
      lit("666D7420"), u32le(lit(16)),                        // fmt , len 16
      u16le(lit(1)), u16le(lit(1)),                           // PCM, mono
      u32le(lit(8000)), u32le(lit(16000)),                    // rate, byteRate
      u16le(lit(2)), u16le(lit(16)),                          // align, bits
      lit("64617461"), u32le(dataSize),                       // data header
      sampleHex))                                             // REAL samples
    val payloads = Tables.documents(spark, sfDir)
      .select($"doc_id", wav.as("payload"))
    pystreamsspark.llm.Multimodal.withWavStats(payloads, "doc_id", "payload")
      .orderBy($"doc_id")
  }

  /** REAL pixel-level BMP decode + feature extraction, oracle-checked
    * — the IMAGE twin of [[qWavStats]], closing the second codec-free
    * modality (uncompressed bitmaps need no codec): Spark synthesizes
    * complete 24-bit BI_RGB BMP payloads — real header, BOTTOM-UP row
    * storage, 4-byte stride padding, BGR byte order; pixel (x, y) of
    * doc d has r=(d+3x+7y)%256, g=(2d+5x+11y)%256, b=(3d+13x+17y)%256 —
    * decodes them back with
    * [[pystreamsspark.llm.Multimodal.decodeBmpPixels]], and computes
    * exact per-channel sums/min/max plus the POSITION-SENSITIVE
    * checksum Σ(k+1)(3r+5g+7b) over the top-down index k. The oracle
    * regenerates every pixel arithmetically: any stride, row-flip or
    * BGR-order bug breaks the hash. */
  def qBmpStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = (pmod($"doc_id", lit(5)) + 2).cast("int")   // 2..6
    val h = (pmod($"doc_id", lit(3)) + 2).cast("int")   // 2..4
    val pad = pmod(lit(4) - pmod(w * 3, lit(4)), lit(4))
    val imgSize = ((w * 3 + pad) * h).cast("int")
    def u32le(c: org.apache.spark.sql.Column) = {
      val x = lpad(hex(c), 8, "0")
      concat(substring(x, 7, 2), substring(x, 5, 2),
        substring(x, 3, 2), substring(x, 1, 2))
    }
    def u16le(c: org.apache.spark.sql.Column) = {
      val x = lpad(hex(c), 4, "0")
      concat(substring(x, 3, 2), substring(x, 1, 2))
    }
    def byteHex(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
    // rows stored BOTTOM-UP (positive height), BGR, stride-padded
    val rowsHex = array_join(
      transform(sequence(lit(0), h - 1), i => {
        val y = h - 1 - i
        concat(
          array_join(transform(sequence(lit(0), w - 1), x => {
            val r = pmod($"doc_id" + x * 3 + y * 7, lit(256))
            val g = pmod($"doc_id" * 2 + x * 5 + y * 11, lit(256))
            val b = pmod($"doc_id" * 3 + x * 13 + y * 17, lit(256))
            concat(byteHex(b), byteHex(g), byteHex(r))
          }), ""),
          // sequence(1, 0) would step BACKWARD — guard the pad=0 case
          when(pad === 0, lit("")).otherwise(array_join(
            transform(sequence(lit(1), pad), _ => lit("00")), "")))
      }), "")
    val bmp = unhex(concat(
      lit("424D"), u32le(imgSize + 54), lit("00000000"), u32le(lit(54)),
      u32le(lit(40)), u32le(w), u32le(h),                 // BITMAPINFO
      u16le(lit(1)), u16le(lit(24)),                      // planes, 24bpp
      u32le(lit(0)), u32le(imgSize),                      // BI_RGB, size
      u32le(lit(2835)), u32le(lit(2835)),                 // 72 dpi
      u32le(lit(0)), u32le(lit(0)),                       // palette
      rowsHex))
    val payloads = Tables.documents(spark, sfDir)
      .select($"doc_id", bmp.as("payload"))
    pystreamsspark.llm.Multimodal.withBmpStats(payloads, "doc_id", "payload")
      .orderBy($"doc_id")
  }

  val qBmpStatsSql: String =
    """WITH xs AS (SELECT UNNEST(range(0, 6)) AS x),
      |ys AS (SELECT UNNEST(range(0, 4)) AS y),
      |px AS (
      |  SELECT d.doc_id,
      |    d.doc_id % 5 + 2 AS w, d.doc_id % 3 + 2 AS h, xs.x, ys.y,
      |    (d.doc_id + xs.x * 3 + ys.y * 7) % 256 AS r,
      |    (d.doc_id * 2 + xs.x * 5 + ys.y * 11) % 256 AS g,
      |    (d.doc_id * 3 + xs.x * 13 + ys.y * 17) % 256 AS b
      |  FROM documents d CROSS JOIN xs CROSS JOIN ys
      |  WHERE xs.x < d.doc_id % 5 + 2 AND ys.y < d.doc_id % 3 + 2)
      |SELECT doc_id,
      |  CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
      |  COUNT(*) AS n_px,
      |  CAST(SUM(r) AS BIGINT) AS sum_r,
      |  CAST(SUM(g) AS BIGINT) AS sum_g,
      |  CAST(SUM(b) AS BIGINT) AS sum_b,
      |  CAST(MIN(r) AS INT) AS min_r, CAST(MAX(r) AS INT) AS max_r,
      |  CAST(MIN(g) AS INT) AS min_g, CAST(MAX(g) AS INT) AS max_g,
      |  CAST(MIN(b) AS INT) AS min_b, CAST(MAX(b) AS INT) AS max_b,
      |  CAST(SUM((y * w + x + 1) * (3 * r + 5 * g + 7 * b)) AS BIGINT)
      |    AS checksum
      |FROM px
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  val qWavStatsSql: String =
    """WITH ks AS (SELECT UNNEST(range(0, 54)) AS k),
      |s AS (
      |  SELECT d.doc_id, ks.k,
      |    CAST((d.doc_id * 7 + ks.k * 13) % 2001 - 1000 AS INT) AS v
      |  FROM documents d CROSS JOIN ks
      |  WHERE ks.k <= d.doc_id % 50 + 3
      |), z AS (
      |  SELECT doc_id, v,
      |    lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv
      |  FROM s
      |)
      |SELECT doc_id, COUNT(*) AS n_samples,
      |  CAST(MAX(ABS(v)) AS INT) AS peak,
      |  CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq,
      |  CAST(SUM(CASE WHEN pv IS NOT NULL AND pv * v < 0
      |                THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
      |  sqrt(CAST(SUM(CAST(v AS BIGINT) * v) AS DOUBLE) / COUNT(*)) AS rms
      |FROM z
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** REAL MP4 (ISO-BMFF) box-walk decode, oracle-checked differentially
    * — the VIDEO companion of [[qMediaHeader]] (image) and
    * [[qAudioMeta]] (audio), completing the multimodal triple: Spark
    * synthesizes spec-correct `ftyp` + `moov(mvhd, trak…)` box BYTES
    * from each doc's id — mvhd **version 0** for even ids and
    * **version 1** (64-bit times) for odd ids, so both spec layouts are
    * exercised on every run — then parses them back with
    * [[pystreamsspark.llm.Multimodal.decodeMp4Header]] inside the
    * flatMap decode path. The oracle recomputes brand / timescale /
    * duration / track count arithmetically; any box-size, offset or
    * version-dispatch bug in the walk breaks the hash match. */
  def qVideoMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val brandHex = when(pmod($"doc_id", lit(3)) === 0, "69736F6D") // isom
      .when(pmod($"doc_id", lit(3)) === 1, "6D703432")             // mp42
      .otherwise("61766331")                                       // avc1
    val timescale = ((pmod($"doc_id", lit(4)) + 1) * 600).cast("int")
    val durTicks = (pmod($"doc_id" * 13, lit(720000)) + 1).cast("long")
    val nTracks = (pmod($"doc_id" * 11, lit(3)) + 1).cast("int")
    def u32be(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
    def u64be(c: org.apache.spark.sql.Column) = lpad(hex(c), 16, "0")
    val ftyp = concat(lit("00000014"), lit("66747970"), brandHex,
      lit("00000000"), brandHex)                 // size 20, one compat brand
    // the 80 bytes after duration, identical in v0/v1: rate 1.0, volume
    // 1.0, reserved, unity matrix, 6x4 predefined, next_track_id
    val tail80 = lit("00010000" + "0100" + "0000" + "0" * 16 +
      "000100000000000000000000" + "000000000001000000000000" +
      "000000000000000040000000" + "0" * 48 + "00000002")
    val mvhdV0 = concat(u32be(lit(108)), lit("6D766864"), lit("00000000"),
      u32be(lit(0)), u32be(lit(0)), u32be(timescale), u32be(durTicks), tail80)
    val mvhdV1 = concat(u32be(lit(120)), lit("6D766864"), lit("01000000"),
      u64be(lit(0)), u64be(lit(0)), u32be(timescale), u64be(durTicks), tail80)
    val even = pmod($"doc_id", lit(2)) === 0
    val mvhdSize = when(even, lit(108)).otherwise(lit(120))
    val trakHex = "000000087472616B"             // minimal empty trak box
    val traks = concat(lit(trakHex),
      when(nTracks >= 2, lit(trakHex)).otherwise(lit("")),
      when(nTracks >= 3, lit(trakHex)).otherwise(lit("")))
    val moov = concat(u32be(mvhdSize + nTracks * 8 + 8), lit("6D6F6F76"),
      when(even, mvhdV0).otherwise(mvhdV1), traks)
    val payloads = Tables.documents(spark, sfDir)
      .select($"doc_id", unhex(concat(ftyp, moov)).as("payload"))
    pystreamsspark.llm.Multimodal.withVideoMeta(payloads, "doc_id", "payload")
      .orderBy($"doc_id")
  }

  val qVideoMetaSql: String =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
      |    ELSE 'avc1' END AS brand,
      |  CAST((doc_id % 4 + 1) * 600 AS INT) AS timescale,
      |  CAST((doc_id * 13) % 720000 + 1 AS BIGINT) AS duration_ticks,
      |  CAST((doc_id * 11) % 3 + 1 AS INT) AS n_tracks,
      |  ((doc_id * 13) % 720000 + 1) * 1000
      |    // ((doc_id % 4 + 1) * 600) AS duration_ms
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val qAudioMetaSql: String =
    """SELECT doc_id,
      |  CAST(doc_id % 2 + 1 AS INT) AS channels,
      |  CAST((doc_id % 5 + 1) * 8000 AS INT) AS sample_rate,
      |  16 AS bits,
      |  CAST((doc_id * 31) % 48000 + 1 AS BIGINT) AS n_samples,
      |  ((doc_id * 31) % 48000 + 1) * 1000
      |    // ((doc_id % 5 + 1) * 8000) AS duration_ms
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val qMediaHeaderSql: String =
    """SELECT doc_id,
      |  CAST(doc_id % 4096 + 1 AS INT) AS width,
      |  CAST((doc_id * 7) % 2160 + 1 AS INT) AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val qMultimodalMetaSql: String =
    """SELECT doc_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  640 + octet_length(CAST(text AS BLOB)) % 1280 AS width,
      |  360 + ascii(substr(text, 1, 1)) % 720 AS height,
      |  octet_length(CAST(text AS BLOB)) % 100 + 1 AS n_frames,
      |  CASE octet_length(CAST(text AS BLOB)) % 3
      |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union"            -> (qUnion _),
    "q_intersect_except" -> (qIntersectExcept _),
    "q_multimodal_meta"  -> (qMultimodalMeta _),
    "q_media_header"     -> (qMediaHeader _),
    "q_audio_meta"       -> (qAudioMeta _),
    "q_wav_stats"        -> (qWavStats _),
    "q_bmp_stats"        -> (qBmpStats _),
    "q_video_meta"       -> (qVideoMeta _))

  val oracle: Map[String, String] = Map(
    "q_union"            -> qUnionSql,
    "q_intersect_except" -> qIntersectExceptSql,
    "q_multimodal_meta"  -> qMultimodalMetaSql,
    "q_media_header"     -> qMediaHeaderSql,
    "q_audio_meta"       -> qAudioMetaSql,
    "q_wav_stats"        -> qWavStatsSql,
    "q_bmp_stats"        -> qBmpStatsSql,
    "q_video_meta"       -> qVideoMetaSql)
}
