package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.TiffCodec

/** TIFF codec: exact round-trips across strip layouts and the LZW
  * width thresholds, both-direction cross-checks against the JDK's
  * independent ImageIO TIFF plugin (incl. its LZW), and loud failure
  * on the undecoded subset. The LZW here is TIFF's own variant
  * (MSB-first, 9-bit start, EARLY CHANGE) — deliberately distinct
  * from GifSpec's LSB-first variant. */
class TiffSpec extends AnyFunSuite {

  private def noise(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 56).toByte
    }
  }

  private def imageioDecode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the TIFF")
    val (w, h) = (img.getWidth, img.getHeight)
    (w, h, Array.tabulate(w * h)(i => img.getRGB(i % w, i / w) & 0xFFFFFF))
  }

  private def imageioEncode(w: Int, h: Int, rgb: Array[Byte],
      compression: Option[String]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (i <- 0 until w * h)
      img.setRGB(i % w, i / w,
        ((rgb(3 * i) & 0xFF) << 16) | ((rgb(3 * i + 1) & 0xFF) << 8) | (rgb(3 * i + 2) & 0xFF))
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    wr.setOutput(ios)
    val p = wr.getDefaultWriteParam
    compression.foreach { c =>
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(c)
    }
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose(); ios.close()
    out.toByteArray
  }

  private def rgbOf(w: Int, h: Int, seed: Long): Array[Byte] = noise(w * h * 3, seed)

  test("encode→decode round-trips exactly, uncompressed and LZW") {
    for {
      (w, h) <- Seq((1, 1), (7, 3), (16, 16), (33, 9))
      lzw <- Seq(false, true)
    } {
      val rgb = rgbOf(w, h, w * 31L + h)
      val (dw, dh, back) = TiffCodec.decode(TiffCodec.encode(w, h, rgb, lzw))
      assert(dw == w && dh == h && back.sameElements(rgb), s"${w}x$h lzw=$lzw")
    }
  }

  test("predictor-2 and multi-strip encodes round-trip, ImageIO agrees, and the predictor earns its keep") {
    val (w, h) = (31, 23)
    val rgb = rgbOf(w, h, 0xD1FF)
    for {
      rps <- Seq(0, 1, 5, 23, 100)
      (lzw, pred) <- Seq((false, 1), (true, 1), (true, 2))
    } {
      val tif = TiffCodec.encode(w, h, rgb, lzw, pred, rps)
      val (dw, dh, back) = TiffCodec.decode(tif)
      assert(dw == w && dh == h && back.sameElements(rgb), s"rps=$rps lzw=$lzw pred=$pred")
      val (iw, ih, px) = imageioDecode(tif)
      assert(iw == w && ih == h, s"rps=$rps lzw=$lzw pred=$pred ImageIO dims")
      for (i <- 0 until w * h)
        assert(px(i) == (((rgb(3 * i) & 0xFF) << 16) | ((rgb(3 * i + 1) & 0xFF) << 8) | (rgb(3 * i + 2) & 0xFF)),
          s"rps=$rps lzw=$lzw pred=$pred ImageIO pixel $i")
    }
    // the predictor's POINT: on a smooth gradient, differencing turns
    // the LZW stream dramatically smaller (this is why scanned-doc
    // TIFFs ship predictor 2)
    val grad = Array.tabulate[Byte](64 * 64 * 3)(i => ((i / 3) % 256).toByte)
    val plain = TiffCodec.encode(64, 64, grad, lzw = true, predictor = 1).length
    val diffd = TiffCodec.encode(64, 64, grad, lzw = true, predictor = 2).length
    assert(diffd < plain / 2, s"predictor-2 $diffd should beat plain LZW $plain on a gradient")
    // predictor without LZW is a spec violation our encoder refuses
    intercept[IllegalArgumentException](
      TiffCodec.encode(2, 2, rgbOf(2, 2, 1), lzw = false, predictor = 2))
  }

  test("LZW width thresholds (9→10→11→12 bits, early change) round-trip and ImageIO agrees") {
    // 128×128 of noise: >4094 distinct strings — crosses every width
    // threshold AND the clear-at-4094 reset
    val (w, h) = (128, 128)
    val rgb = rgbOf(w, h, 0xC0FFEE)
    val tif = TiffCodec.encode(w, h, rgb, lzw = true)
    val (dw, dh, back) = TiffCodec.decode(tif)
    assert(dw == w && dh == h && back.sameElements(rgb))
    val (iw, ih, px) = imageioDecode(tif)
    assert(iw == w && ih == h)
    for (i <- 0 until w * h)
      assert(px(i) == (((back(3 * i) & 0xFF) << 16) | ((back(3 * i + 1) & 0xFF) << 8) | (back(3 * i + 2) & 0xFF)),
        s"ImageIO pixel $i")
  }

  test("ImageIO-written TIFFs decode pixel-identically: uncompressed, LZW, and grayscale") {
    val (w, h) = (29, 17)
    val rgb = rgbOf(w, h, 99)
    for (c <- Seq(None, Some("LZW"))) {
      val (dw, dh, back) = TiffCodec.decode(imageioEncode(w, h, rgb, c))
      assert(dw == w && dh == h, s"compression $c")
      assert(back.sameElements(rgb), s"compression $c pixels")
    }
    // grayscale (photometric 1, 1 sample) expands to canonical RGB
    val gimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val gray = noise(w * h, 7)
    for (i <- 0 until w * h) gimg.getRaster.setSample(i % w, i / w, 0, gray(i) & 0xFF)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gimg, "tiff", out))
    val (gw, gh, grgb) = TiffCodec.decode(out.toByteArray)
    assert(gw == w && gh == h)
    for (i <- 0 until w * h) {
      val v = gray(i)
      assert(grgb(3 * i) == v && grgb(3 * i + 1) == v && grgb(3 * i + 2) == v,
        s"gray pixel $i")
    }
  }

  test("multi-strip layouts reassemble correctly") {
    // ImageIO's writer picks its own RowsPerStrip for large images;
    // force the multi-strip path by height (its default strips at
    // ~8KB) and verify reassembly
    val (w, h) = (64, 200)
    val rgb = rgbOf(w, h, 1234)
    val (dw, dh, back) = TiffCodec.decode(imageioEncode(w, h, rgb, Some("LZW")))
    assert(dw == w && dh == h && back.sameElements(rgb))
  }

  /** Hand-assemble a minimal grayscale single-strip LZW TIFF around raw
    * bytes — lets the LZW end-of-stream alignment be controlled to the
    * exact byte (encode() only writes RGB, i.e. multiples of 3). */
  private def grayLzwTiff(data: Array[Byte]): Array[Byte] = {
    val strip = TiffCodec.lzwEncode(data)
    val out = new java.io.ByteArrayOutputStream(strip.length + 128)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF) }
    val ifdAt = 8 + strip.length + (strip.length & 1)
    out.write('I'); out.write('I'); u16(42); u32(ifdAt)
    out.write(strip); if ((strip.length & 1) == 1) out.write(0)
    u16(9)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      u16(tag); u16(typ); u32(count); u32(value)
    }
    entry(256, 4, 1, data.length) // ImageWidth = n, one row
    entry(257, 4, 1, 1)
    entry(258, 3, 1, 8)
    entry(259, 3, 1, 5)           // LZW
    entry(262, 3, 1, 1)           // grayscale, black-is-zero
    entry(273, 4, 1, 8)
    entry(277, 3, 1, 1)
    entry(278, 4, 1, 1)
    entry(279, 4, 1, strip.length)
    u32(0)
    out.toByteArray
  }

  test("LZW end-of-stream early change: final-insert-on-threshold pins and an exhaustive length scan") {
    // Deterministic pin of the 9→10 edge: 254 bytes with all pairs
    // distinct → the decoder's insert at the FINAL data code lands
    // exactly on table size 511, so it widens before reading EOI; the
    // encoder must emit EOI at 10 bits (the LZWPostEncode rule).
    val edge = Array.tabulate(254)(_.toByte)
    assert(TiffCodec.lzwDecode(TiffCodec.lzwEncode(edge), 0,
      TiffCodec.lzwEncode(edge).length, 254).sameElements(edge))
    // Exhaustive end-alignment scan: the decoder's final table size is
    // nondecreasing in n with +0/+1 steps, so n = 1..2200 provably
    // crosses EVERY end-of-stream width threshold (511, 1023, 2047).
    for (n <- 1 to 2200) {
      val data = noise(n, 0xEDDE + n)
      val enc = TiffCodec.lzwEncode(data)
      assert(TiffCodec.lzwDecode(enc, 0, enc.length, n).sameElements(data), s"n=$n")
    }
    // The JDK's independent decoder agrees across windows around each
    // edge (hand-assembled 1-row grayscale TIFFs give byte-exact n).
    for (n <- (460 to 560) ++ (970 to 1080) ++ (1990 to 2110)) {
      val data = noise(n, 0xA11CE + n)
      val (w, h, rgb) = TiffCodec.decode(grayLzwTiff(data))
      assert(w == n && h == 1)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(grayLzwTiff(data)))
      assert(img != null, s"n=$n ImageIO parse")
      for (i <- 0 until n) {
        val v = data(i) & 0xFF
        assert((rgb(3 * i) & 0xFF) == v, s"n=$n our pixel $i")
        // raw raster sample — getRGB would run the JDK's nonlinear
        // gray→sRGB color-space conversion and no longer be identity
        assert(img.getRaster.getSample(i, 0, 0) == v, s"n=$n ImageIO pixel $i")
      }
    }
    // And the exact-254 pin cross-checked against the JDK too.
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(grayLzwTiff(edge)))
    assert(img != null)
    for (i <- 0 until 254)
      assert(img.getRaster.getSample(i, 0, 0) == (edge(i) & 0xFF), s"edge pixel $i")
  }

  test("multi-page TIFFs: structural every-nth sampling, page count, and ImageIO reads every page") {
    val (w, h) = (9, 7)
    val pages = (0 until 5).map(f =>
      Array.tabulate[Byte](w * h * 3)(i => ((11 * f + i) % 256).toByte))
    for {
      (lzw, pred) <- Seq((false, 1), (true, 1), (true, 2))
      rps <- Seq(0, 2)
    } {
      val tif = TiffCodec.encodePages(w, h, pages, lzw, pred, rps)
      assert(TiffCodec.pageCount(tif) == 5, s"lzw=$lzw pred=$pred rps=$rps")
      val kept = TiffCodec.decodeEveryNth(tif, 2)
      assert(kept.map(_.pageNo) == Vector(0, 2, 4))
      for (p <- kept)
        assert(p.w == w && p.h == h && p.rgb.sameElements(pages(p.pageNo)),
          s"page ${p.pageNo} lzw=$lzw pred=$pred rps=$rps")
      val (dw, dh, first) = TiffCodec.decode(tif)
      assert(dw == w && dh == h && first.sameElements(pages(0)), "decode() = page 0")
    }
    // the JDK's reader agrees on every page of our hardest variant
    val tif = TiffCodec.encodePages(w, h, pages, lzw = true, predictor = 2, rowsPerStrip = 3)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(tif))
    val rd = javax.imageio.ImageIO.getImageReaders(iis).next()
    rd.setInput(iis)
    assert(rd.getNumImages(true) == 5, "ImageIO page count")
    for (f <- 0 until 5; i <- 0 until w * h) {
      val exp = ((pages(f)(3 * i) & 0xFF) << 16) |
        ((pages(f)(3 * i + 1) & 0xFF) << 8) | (pages(f)(3 * i + 2) & 0xFF)
      assert((rd.read(f).getRGB(i % w, i / w) & 0xFFFFFF) == exp, s"ImageIO page $f pixel $i")
    }
    rd.dispose(); iis.close()
    // stride 1 keeps all; stride past the count keeps only page 0
    assert(TiffCodec.decodeEveryNth(tif, 1).map(_.pageNo) == Vector(0, 1, 2, 3, 4))
    assert(TiffCodec.decodeEveryNth(tif, 7).map(_.pageNo) == Vector(0))
  }

  // LE readers for patching encoded fixtures in place
  private def rdU16(b: Array[Byte], p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def rdU32(b: Array[Byte], p: Int): Int = rdU16(b, p) | (rdU16(b, p + 2) << 16)
  private def wrU16(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = (v & 0xFF).toByte; b(p + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def wrU32(b: Array[Byte], p: Int, v: Int): Unit = {
    wrU16(b, p, v & 0xFFFF); wrU16(b, p + 2, (v >>> 16) & 0xFFFF)
  }

  test("undecoded subsets fail loudly, never silently misdecode") {
    val good = TiffCodec.encode(3, 2, rgbOf(3, 2, 5))
    intercept[IllegalArgumentException](TiffCodec.decode("NOTATIFF".getBytes))
    intercept[IllegalArgumentException](TiffCodec.decode(good.take(6)))
    // PackBits-compressed (ImageIO writes it; we quarantine it)
    val pb = imageioEncode(4, 4, rgbOf(4, 4, 8), Some("PackBits"))
    val e = intercept[IllegalArgumentException](TiffCodec.decode(pb))
    assert(e.getMessage.contains("compression"))
    intercept[IllegalArgumentException](
      TiffCodec.encode(2, 2, Array[Byte](0, 1, 2))) // wrong byte count
    // interpretation-CHANGING tags quarantine rather than silently
    // misdecode: rewrite the encoder's Predictor entry (tag 317,
    // entry index 9, value 1) into each hazard tag with a non-default
    // value — the pixels would come out "fine" but WRONG
    for ((tag, value, word) <- Seq(
        (274, 3, "Orientation"),   // rotate-180 raster order
        (266, 2, "FillOrder"),     // bit-reversed LZW stream
        (339, 2, "SampleFormat"))) { // signed samples
      val t = TiffCodec.encode(3, 2, rgbOf(3, 2, 5)).clone()
      val ifdAt = rdU32(t, 4)
      val entryAt = ifdAt + 2 + 9 * 12
      assert(rdU16(t, entryAt) == 317, "fixture layout drifted: expected Predictor last")
      wrU16(t, entryAt, tag)
      wrU32(t, entryAt + 8, value)
      val ex = intercept[IllegalArgumentException](TiffCodec.decode(t))
      assert(ex.getMessage.contains(word), s"tag $tag must quarantine loudly")
    }
  }

  test("a cyclic next-IFD chain fails loudly instead of hanging") {
    val (w, h) = (3, 2)
    val pages = (0 until 2).map(f => rgbOf(w, h, 70 + f))
    val t = TiffCodec.encodePages(w, h, pages).clone()
    val ifd1 = rdU32(t, 4)
    val next1At = ifd1 + 2 + rdU16(t, ifd1) * 12
    val ifd2 = rdU32(t, next1At)
    assert(ifd2 != 0, "fixture must have a second IFD")
    // point page 2's next-IFD pointer back at page 1
    wrU32(t, ifd2 + 2 + rdU16(t, ifd2) * 12, ifd1)
    val e1 = intercept[IllegalArgumentException](TiffCodec.pageCount(t))
    assert(e1.getMessage.contains("cycles"))
    val e2 = intercept[IllegalArgumentException](TiffCodec.decodeEveryNth(t, 1))
    assert(e2.getMessage.contains("cycles"))
  }

  test("big-endian (MM) TIFFs decode pixel-identically") {
    // hand-assemble an MM grayscale single-strip uncompressed TIFF —
    // our encoder and ImageIO both write II, so this is the only
    // coverage the MM branches (byte-swapped reads, inline SHORT
    // left-justification) get
    val (w, h) = (5, 3)
    val gray = noise(w * h, 42)
    val out = new java.io.ByteArrayOutputStream()
    def b16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def b32(v: Int): Unit = { b16((v >>> 16) & 0xFFFF); b16(v & 0xFFFF) }
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      b16(tag); b16(typ); b32(count); b32(value)
    }
    val ifdAt = 8 + gray.length + (gray.length & 1)
    out.write('M'); out.write('M'); b16(42); b32(ifdAt)
    out.write(gray); if ((gray.length & 1) == 1) out.write(0)
    b16(8)
    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    entry(258, 3, 1, 8 << 16)  // inline SHORT: left-justified in BE
    entry(259, 3, 1, 1 << 16)
    entry(262, 3, 1, 1 << 16)
    entry(273, 4, 1, 8)
    entry(278, 4, 1, h)
    entry(279, 4, 1, gray.length)
    b32(0)
    val tif = out.toByteArray
    val (dw, dh, rgb) = TiffCodec.decode(tif)
    assert(dw == w && dh == h)
    for (i <- 0 until w * h) {
      val v = gray(i) & 0xFF
      assert((rgb(3 * i) & 0xFF) == v && (rgb(3 * i + 1) & 0xFF) == v &&
        (rgb(3 * i + 2) & 0xFF) == v, s"MM pixel $i")
    }
    // the JDK agrees the file is well-formed MM
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tif))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (i <- 0 until w * h)
      assert(img.getRaster.getSample(i % w, i / w, 0) == (gray(i) & 0xFF), s"ImageIO MM pixel $i")
  }

  test("property: arbitrary images round-trip both compressions and ImageIO reads ours (fixed seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
      lzw <- Gen.oneOf(true, false)
    } yield (w, h, lzw)
    for (i <- 0 until 40) {
      val (w, h, lzw) = gen.apply(Gen.Parameters.default, Seed(2000L + i)).get
      val rgb = rgbOf(w, h, 5000L + i)
      val tif = TiffCodec.encode(w, h, rgb, lzw)
      val (dw, dh, back) = TiffCodec.decode(tif)
      assert(dw == w && dh == h && back.sameElements(rgb), s"case $i ${w}x$h lzw=$lzw")
      val (iw, ih, px) = imageioDecode(tif)
      assert(iw == w && ih == h, s"case $i ImageIO dims")
      for (j <- 0 until w * h)
        assert(px(j) == (((rgb(3 * j) & 0xFF) << 16) | ((rgb(3 * j + 1) & 0xFF) << 8) | (rgb(3 * j + 2) & 0xFF)),
          s"case $i ImageIO pixel $j")
    }
  }
}
