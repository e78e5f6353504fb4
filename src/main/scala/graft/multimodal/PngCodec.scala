package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — closes the last labeled stub on the multimodal
  * boundary (see [[Media.StubCodec]]): compressed-image decode with no
  * native libraries, built on `java.util.zip` (the DEFLATE stream PNG
  * mandates) plus hand-rolled scanline unfiltering.
  *
  * Coverage is the training-corpus subset of the spec (RFC 2083):
  * 8-bit-per-sample truecolor, with or without alpha (color types 2
  * and 6), non-interlaced, all five scanline filters (None/Sub/Up/
  * Average/Paeth — decoders MUST handle all five because encoders pick
  * per row; the JDK's ImageIO writer uses adaptive filtering, which is
  * exactly what the cross-check spec exercises). Everything else —
  * palette, 16-bit, grayscale, Adam7 interlace — fails loudly: a
  * silent misdecode poisons a corpus, a loud one routes the asset to
  * the quarantine path. Chunk CRCs are verified for the same reason.
  *
  * Scale shape: decode is per-row O(bytes) work inside mapPartitions
  * (see [[Media.decodeBmpFeatures]] for the batch idiom) — no shuffle,
  * no driver involvement; one Inflater per image, allocated inside the
  * call so partition-level reuse needs no pooling discipline.
  */
object PngCodec {

  private val Sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  private def crcOf(typ: Array[Byte], data: Array[Byte], len: Int): Long = {
    val c = new CRC32
    c.update(typ)
    c.update(data, 0, len)
    c.getValue
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val t = typ.getBytes("US-ASCII")
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    out.write(t)
    out.write(data)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crcOf(t, data, data.length).toInt).array())
  }

  /** Encode row-major top-down RGB pixels as an 8-bit truecolor PNG
    * (color type 2, filter 0 on every scanline, one IDAT). Filter 0 is
    * always legal — adaptive filtering only changes the compressed
    * size, never the decoded pixels. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"need $w*$h*3 RGB bytes, got ${rgb.length}")
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      raw(y * (1 + stride)) = 0 // filter type None
      System.arraycopy(rgb, y * stride, raw, y * (1 + stride) + 1, stride)
      y += 1
    }
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw)
    d.finish()
    val zBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) zBuf.write(tmp, 0, d.deflate(tmp))
    d.end()
    val out = new java.io.ByteArrayOutputStream(zBuf.size() + 64)
    out.write(Sig)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", zBuf.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode an 8-bit truecolor PNG (color type 2 or 6; alpha, if
    * present, is dropped) to (width, height, top-down RGB). Chunk CRCs
    * are verified; any unsupported flavor (palette, 16-bit, grayscale,
    * interlaced) raises. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length > Sig.length + 12 &&
      Sig.indices.forall(i => bytes(i) == Sig(i)), "not a PNG payload")
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    var off = Sig.length
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      require(off + 12 <= bytes.length, "truncated PNG (chunk header)")
      val len = bb.getInt(off)
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"truncated PNG (chunk of $len bytes at $off)")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val tBytes = java.util.Arrays.copyOfRange(bytes, off + 4, off + 8)
      val crc = bb.getInt(off + 8 + len) & 0xFFFFFFFFL
      val c = new CRC32
      c.update(tBytes)
      c.update(bytes, off + 8, len)
      require(c.getValue == crc, s"PNG chunk $typ fails CRC — corrupt payload")
      typ match {
        case "IHDR" =>
          require(len == 13, "malformed IHDR")
          w = bb.getInt(off + 8)
          h = bb.getInt(off + 12)
          val bitDepth = bytes(off + 16) & 0xFF
          colorType = bytes(off + 17) & 0xFF
          val interlace = bytes(off + 20) & 0xFF
          require(w > 0 && h > 0, s"unsupported dims ${w}x$h")
          require(bitDepth == 8, s"only 8-bit PNG supported (got $bitDepth)")
          require(colorType == 2 || colorType == 6,
            s"only truecolor(+alpha) PNG supported (got color type $colorType)")
          require(interlace == 0, "interlaced (Adam7) PNG not supported")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _      => () // ancillary chunks (tEXt, pHYs, …) are skippable
      }
      off += 12 + len
    }
    require(colorType >= 0, "PNG has no IHDR")
    val bpp = if (colorType == 6) 4 else 3
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || inf.finished(), "PNG inflate stalled — corrupt IDAT")
      got += n
    }
    inf.end()
    require(got == raw.length,
      s"PNG pixel data truncated: got $got of ${raw.length} bytes")
    // unfilter in place: prev-row bytes are already reconstructed
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val filter = raw(y * (1 + stride)) & 0xFF
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val rawV = raw(rowIn + x) & 0xFF
        val a = if (x >= bpp) px(rowOut + x - bpp) & 0xFF else 0
        val b = if (y > 0) px(rowOut - stride + x) & 0xFF else 0
        val cD = if (y > 0 && x >= bpp) px(rowOut - stride + x - bpp) & 0xFF else 0
        val v = filter match {
          case 0 => rawV
          case 1 => rawV + a
          case 2 => rawV + b
          case 3 => rawV + (a + b) / 2
          case 4 => rawV + paeth(a, b, cD)
          case f => throw new IllegalArgumentException(
            s"PNG scanline filter $f is not in the spec — corrupt payload")
        }
        px(rowOut + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    if (bpp == 3) (w, h, px)
    else {
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        rgb(p * 3) = px(p * 4)
        rgb(p * 3 + 1) = px(p * 4 + 1)
        rgb(p * 3 + 2) = px(p * 4 + 2)
        p += 1
      }
      (w, h, rgb)
    }
  }
}
