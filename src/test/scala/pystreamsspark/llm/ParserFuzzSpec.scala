package pystreamsspark.llm

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz laws for the binary container-header parsers. The decode path
  * runs inside executors over UNTRUSTED crawl payloads at corpus scale,
  * so the contract is total: for ANY byte input each parser returns
  * `Some(meta)` or `None` — it never throws, never loops, never reads
  * out of bounds. ScalaCheck generators with a fixed seed (the
  * scalatestplus bridge isn't in the offline cache — sampling is driven
  * manually, same pattern as StreamLawsSpec).
  */
class ParserFuzzSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(1234L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private val parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    ("png/jpeg", Multimodal.decodeHeader _),
    ("wav", Multimodal.decodeWavHeader _),
    ("wav-samples", Multimodal.decodeWavSamples _),
    ("bmp-pixels", Multimodal.decodeBmpPixels _),
    ("mp4", Multimodal.decodeMp4Header _))

  private val randomBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  test("arbitrary bytes: every parser returns without throwing") {
    samples(randomBytes, 300) { bytes =>
      parsers.foreach { case (name, p) =>
        try p(bytes)
        catch {
          case e: Throwable =>
            fail(s"$name parser threw ${e.getClass.getSimpleName} on " +
              s"${bytes.take(32).map(b => f"$b%02x").mkString} (len ${bytes.length})")
        }
      }
    }
  }

  test("valid headers with mutated bytes: parse totally, never throw") {
    // seed corpora: one well-formed instance per container
    val png = {
      val hex = "89504E470D0A1A0A0000000D49484452" +
        "00000400" + "00000300" + "0806000000"
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    val wav = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(56); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(2); bb.putInt(16000); bb.putInt(64000)
      bb.putShort(4); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(400)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val mp4 = {
      val bb = java.nio.ByteBuffer.allocate(200)
      bb.putInt(20); bb.put("ftyp".getBytes)
      bb.put("isom".getBytes); bb.putInt(0); bb.put("mp42".getBytes)
      bb.putInt(8 + 108 + 8); bb.put("moov".getBytes)
      bb.putInt(108); bb.put("mvhd".getBytes); bb.putInt(0)
      bb.putInt(0); bb.putInt(0); bb.putInt(600); bb.putInt(3000)
      (0 until 20).foreach(_ => bb.putInt(0))
      bb.putInt(8); bb.put("trak".getBytes)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    // a well-formed 3x2 bottom-up 24-bit BMP (stride pad 3 bytes/row)
    val bmp = {
      val bb = java.nio.ByteBuffer.allocate(78)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(78)
      bb.putInt(0); bb.putInt(54)
      bb.putInt(40); bb.putInt(3); bb.putInt(2)
      bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(24)
      bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
      (0 until 24).foreach(i => bb.put((i * 11).toByte))
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val mutation: Gen[(Int, Int, Byte)] = for {
      which <- Gen.chooseNum(0, 3)
      pos <- Gen.chooseNum(0, 200)
      b <- Gen.chooseNum(-128, 127).map(_.toByte)
    } yield (which, pos, b)
    val corpora = Array(png, wav, mp4, bmp)
    samples(mutation, 400) { case (which, pos, b) =>
      val base = corpora(which)
      val mutated = base.clone()
      mutated(pos % base.length) = b
      parsers.foreach { case (name, p) =>
        try p(mutated)
        catch {
          case e: Throwable =>
            fail(s"$name parser threw ${e.getClass.getSimpleName} on mutated " +
              s"corpus $which (pos ${pos % base.length} -> $b)")
        }
      }
      // truncations of valid headers must also be total
      val cut = mutated.take(pos % (base.length + 1))
      parsers.foreach { case (_, p) => p(cut) }
    }
  }

  test("bmp decode: bottom-up and top-down storage yield the SAME " +
    "top-down pixels; truncation is total") {
    def mk(topDown: Boolean): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(54 + 2 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(70)
      bb.putInt(0); bb.putInt(54)
      bb.putInt(40); bb.putInt(2); bb.putInt(if (topDown) -2 else 2)
      bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(16)
      bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
      // logical image rows (top-down): row0 = px(1,2,3)(4,5,6),
      // row1 = px(7,8,9)(10,11,12); stored BGR with 2-byte stride pad
      val rows = Seq(Seq(1, 2, 3, 4, 5, 6), Seq(7, 8, 9, 10, 11, 12))
      val stored = if (topDown) rows else rows.reverse
      stored.foreach { r =>
        // BGR per pixel: (b,g,r) = (v3, v2, v1)
        Seq(r(2), r(1), r(0), r(5), r(4), r(3))
          .foreach(v => bb.put(v.toByte))
        bb.put(0.toByte); bb.put(0.toByte) // stride pad to 8
      }
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val up = Multimodal.decodeBmpPixels(mk(topDown = false)).get
    val down = Multimodal.decodeBmpPixels(mk(topDown = true)).get
    assert(up.width === 2 && up.height === 2)
    assert(up.rgb.toSeq === down.rgb.toSeq,
      "storage direction must not change the decoded pixel order")
    // decoded top-down row-major, 0xRRGGBB with r the FIRST logical value
    assert(up.rgb.toSeq === Seq(0x010203, 0x040506, 0x070809, 0x0a0b0c))
    // truncated pixel data: total, refuses rather than reads past
    assert(Multimodal.decodeBmpPixels(mk(false).take(60)).isEmpty)
  }

  test("regression: bare 8-byte mvhd ending at end-of-file is total") {
    // 36-byte payload single-byte fuzzing can't reach: ftyp(16) + a
    // moov whose last child is a bare mvhd header (csz=8) ending at
    // end-of-file. Reading the FullBox version byte at j+8 == length
    // threw ArrayIndexOutOfBoundsException before the csz >= 12 guard.
    val bb = java.nio.ByteBuffer.allocate(36)
    bb.putInt(20); bb.put("ftyp".getBytes)
    bb.put("isom".getBytes); bb.putInt(0); bb.put("mp42".getBytes)
    bb.putInt(16); bb.put("moov".getBytes)
    bb.putInt(8); bb.put("mvhd".getBytes)
    val payload = java.util.Arrays.copyOf(bb.array(), bb.position())
    assert(payload.length == 36)
    assert(Multimodal.decodeMp4Header(payload).isEmpty)
  }
}
