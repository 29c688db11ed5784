package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal path: a 24-bit uncompressed
  * BMP writer/parser and a 16-bit PCM WAV writer/parser. No Spark, no
  * external codec libraries — both formats are simple enough to implement
  * from their public specs, which makes the decode step REAL (magic
  * check, header-field reads, bottom-up row order, 4-byte row padding,
  * RIFF chunk traversal) rather than a stub.
  *
  * The writer and the parser are independent code paths on purpose: the
  * parser trusts only the bytes (offsets, dims, bpp from the header), so
  * an encoding bug in either side shows up as an oracle mismatch — not a
  * silently self-consistent round trip.
  */
object Codecs {

  /** Decoded image: packed 0xRRGGBB pixels in LOGICAL row-major order
    * (y = 0 is the top row), regardless of on-disk row direction.
    */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int])

  /** Write a 24bpp BI_RGB BMP (BITMAPINFOHEADER, bottom-up rows, rows
    * padded to 4 bytes). `px(x, y)` returns (r, g, b) for the logical
    * pixel at column x, row y (y = 0 = top).
    */
  def encodeBmp(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = (width * 3 + 3) / 4 * 4
    val data = rowSize * height
    val buf = ByteBuffer.allocate(54 + data).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + data) // file size
    buf.putShort(0).putShort(0) // reserved
    buf.putInt(54) // pixel-array offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, +h = bottom-up
    buf.putShort(1).putShort(24) // planes, bpp
    buf.putInt(0).putInt(data) // BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, palette
    var y = height - 1
    while (y >= 0) { // bottom-up storage
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
        x += 1
      }
      var p = width * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24bpp uncompressed BMP. Honors the header's pixel-array
    * offset, signed height (negative = top-down), and row padding.
    */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val off = buf.getInt(10)
    require(buf.getInt(14) >= 40, "unsupported DIB header")
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(buf.getShort(28) == 24, "only 24bpp supported")
    require(buf.getInt(30) == 0, "only uncompressed BI_RGB supported")
    // dims are untrusted header ints: bound them and size-check in Long
    // arithmetic so overflow can't defeat the validation (w*3 wraps Int
    // for w > 2^29, which would both pass the check and corrupt indexing)
    require(w > 0 && h > 0 && w <= (1 << 16) && h <= (1 << 16),
      s"implausible dimensions ${w}x$h")
    val rowSize = (w * 3 + 3) / 4 * 4
    require(off >= 54 && bytes.length >= off + rowSize.toLong * h,
      "truncated pixel array")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val base = off + (if (bottomUp) h - 1 - y else y) * rowSize
      var x = 0
      while (x < w) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Bmp(w, h, out)
  }

  final case class Wav(sampleRate: Int, samples: Array[Short])

  /** Write a 16-bit PCM mono WAV. A non-audio "junk" chunk is placed
    * before "data" on purpose, so any parser of these files must walk
    * the RIFF chunk list instead of assuming a fixed 44-byte layout.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val junk = 6
    val riff = 4 + (8 + 16) + (8 + junk) + (8 + dataSize)
    val buf = ByteBuffer.allocate(8 + riff).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riff).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(1) // PCM, mono
    buf.putInt(sampleRate).putInt(sampleRate * 2) // byte rate
    buf.putShort(2).putShort(16) // block align, bits
    buf.put("junk".getBytes("US-ASCII")).putInt(junk).put(new Array[Byte](junk))
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Parse a PCM WAV by walking RIFF chunks (skipping unknown ones,
    * honoring the 2-byte chunk alignment rule).
    */
  def decodeWav(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12 && new String(bytes, 0, 4, "US-ASCII") == "RIFF"
      && new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1
    var bits = -1
    var channels = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length, s"truncated chunk '$id'")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short ($size bytes)")
          require(buf.getShort(pos + 8) == 1, "only PCM supported")
          channels = buf.getShort(pos + 10)
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
        case "data" =>
          require(bits == 16 && channels == 1,
            "only 16-bit mono supported (fmt must precede data)")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
        case _ => () // junk / LIST / fact — skip
      }
      pos += 8 + size + (size & 1)
    }
    require(samples != null && rate > 0, "no data chunk")
    Wav(rate, samples)
  }
}
