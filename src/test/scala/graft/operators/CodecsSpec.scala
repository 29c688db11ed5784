package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The codecs are exercised against HAND-BUILT byte fixtures (not just
  * encoder round trips), so the parser is pinned to the public format
  * spec rather than to whatever the encoder happens to emit.
  */
class CodecsSpec extends AnyFunSuite {

  // A 2×2 24bpp BMP, bottom-up, rows padded from 6 to 8 bytes, written
  // out longhand from the format spec. Logical pixels (y=0 top):
  //   (0,0)=RGB(1,2,3)   (1,0)=RGB(4,5,6)
  //   (0,1)=RGB(7,8,9)   (1,1)=RGB(10,11,12)
  private val bmp2x2: Array[Byte] = {
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, // info, w=2, h=2 (bottom-up)
      1, 0, 24, 0, 0, 0, 0, 0, 16, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val rows = Array[Int](
      9, 8, 7, 12, 11, 10, 0, 0, // stored first = bottom row (y=1), BGR
      3, 2, 1, 6, 5, 4, 0, 0) // stored second = top row (y=0), BGR
    (header ++ rows).map(_.toByte)
  }

  test("decodeBmp: hand-built fixture — bottom-up rows and padding honored") {
    val img = Codecs.decodeBmp(bmp2x2)
    assert(img.width === 2 && img.height === 2)
    assert(img.pixels.toSeq === Seq(0x010203, 0x040506, 0x070809, 0x0a0b0c))
  }

  test("decodeBmp: top-down (negative height) variant reads rows in order") {
    val neg = bmp2x2.clone()
    neg(22) = (-2 & 0xff).toByte; neg(23) = 0xff.toByte
    neg(24) = 0xff.toByte; neg(25) = 0xff.toByte // height = -2
    val img = Codecs.decodeBmp(neg)
    // same bytes now mean: first stored row IS the top row
    assert(img.pixels.toSeq === Seq(0x070809, 0x0a0b0c, 0x010203, 0x040506))
  }

  test("decodeBmp: rejects wrong magic, bpp, compression, truncation") {
    val bad = bmp2x2.clone(); bad(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](Codecs.decodeBmp(bad))
    val bpp = bmp2x2.clone(); bpp(28) = 8
    assertThrows[IllegalArgumentException](Codecs.decodeBmp(bpp))
    val comp = bmp2x2.clone(); comp(30) = 1
    assertThrows[IllegalArgumentException](Codecs.decodeBmp(comp))
    assertThrows[IllegalArgumentException](Codecs.decodeBmp(bmp2x2.take(60)))
  }

  test("encodeBmp/decodeBmp round trip over asymmetric dims (padding paths)") {
    for (w <- Seq(1, 2, 3, 5); h <- Seq(1, 3, 4)) {
      val img = Codecs.decodeBmp(
        Codecs.encodeBmp(w, h, (x, y) => (x * 40 % 256, y * 70 % 256, (x + y) % 256)))
      assert(img.width === w && img.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) ===
          ((x * 40 % 256) << 16 | (y * 70 % 256) << 8 | (x + y) % 256))
    }
  }

  // A minimal 44-byte canonical WAV (no junk chunk) with 2 samples —
  // parsers must accept plain fixed-layout files too.
  private val wavCanonical: Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(40).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(4).putShort(1000).putShort(-2000)
    b.array()
  }

  test("decodeWav: canonical fixed-layout file") {
    val w = Codecs.decodeWav(wavCanonical)
    assert(w.sampleRate === 8000)
    assert(w.samples.toSeq === Seq(1000.toShort, -2000.toShort))
  }

  test("decodeWav: walks past non-audio chunks (encoder inserts one)") {
    val bytes = Codecs.encodeWav(11000, Array[Short](5, -5, 30000, -30000))
    // the encoder put a 'junk' chunk before 'data'; a fixed-44-byte
    // parser would misread this file
    assert(new String(bytes, 36, 4) === "junk")
    val w = Codecs.decodeWav(bytes)
    assert(w.sampleRate === 11000)
    assert(w.samples.toSeq === Seq[Short](5, -5, 30000, -30000))
  }

  test("decodeWav: odd-sized chunks are 2-byte aligned") {
    // RIFF with a 3-byte odd chunk (padded to 4) before fmt/data
    val tail = Codecs.encodeWav(9000, Array[Short](7)).drop(12)
    val b = java.nio.ByteBuffer.allocate(12 + 8 + 4 + tail.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(4 + 8 + 4 + tail.length).put("WAVE".getBytes)
    b.put("odd ".getBytes).putInt(3).put(Array[Byte](1, 2, 3, 0))
    b.put(tail)
    val w = Codecs.decodeWav(b.array())
    assert(w.sampleRate === 9000 && w.samples.toSeq === Seq(7.toShort))
  }

  test("decodeWav: rejects non-RIFF, truncated, and dataless input") {
    assertThrows[IllegalArgumentException](Codecs.decodeWav("nope".getBytes))
    assertThrows[IllegalArgumentException](Codecs.decodeWav(wavCanonical.take(40)))
    val noData = wavCanonical.take(36)
    val b = java.nio.ByteBuffer.allocate(36).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(noData)
    assertThrows[IllegalArgumentException](Codecs.decodeWav(b.array()))
  }
}
