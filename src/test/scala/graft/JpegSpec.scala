package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.JpegCodec

/** Baseline JPEG codec: exact round-trip on the block-constant
  * subspace, both-direction cross-checks against the JDK's independent
  * ImageIO JPEG plugin (the PNG/BMP precedent), subsampled-color
  * decode, and loud failure on progressive streams. */
class JpegSpec extends AnyFunSuite {

  private def imageioDecodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    // raster samples, NOT getRGB: TYPE_BYTE_GRAY getRGB passes through
    // a linear-gray→sRGB transform that would skew the comparison
    val out = Array.tabulate(w * h)(i => img.getRaster.getSample(i % w, i / w, 0))
    (w, h, out)
  }

  private def imageioEncode(img: java.awt.image.BufferedImage,
      progressive: Boolean = false): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    out.toByteArray
  }

  private def grayImage(w: Int, h: Int, f: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y))
    img
  }

  test("block-constant even-valued grayscale round-trips EXACTLY (the mm_jpeg subspace)") {
    // 8×8-aligned constant blocks with even values: DC = 8·(v−128) is a
    // multiple of the Annex K luma DC step 16 at q50, ACs are exactly 0
    // ⇒ quantize∘dequantize = id and the IDCT reconstructs v
    val (w, h) = (32, 24)
    val gray = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((bx * 34 + by * 58 + 16) % 128 * 2).toByte // even, 0..254
    }
    val jpg = JpegCodec.encodeGray(w, h, gray, quality = 50)
    val (dw, dh, rgb) = JpegCodec.decode(jpg)
    assert((dw, dh) == (w, h))
    for (i <- 0 until w * h)
      assert((rgb(3 * i) & 0xFF) == (gray(i) & 0xFF),
        s"pixel $i: ${rgb(3 * i) & 0xFF} != ${gray(i) & 0xFF}")
    // and the gray decode replicates into all three channels
    assert(rgb.grouped(3).forall(c => c(0) == c(1) && c(1) == c(2)))
  }

  test("our gray encoding decodes identically (±1 IDCT rounding) in ImageIO") {
    val (w, h) = (21, 13) // non-multiple-of-8: exercises edge replication
    val gray = Array.tabulate(w * h)(i => ((i * 7 + 3) % 256).toByte)
    val jpg = JpegCodec.encodeGray(w, h, gray, quality = 75)
    val (dw, dh, ours) = JpegCodec.decode(jpg)
    val (iw, ih, ref) = imageioDecodeGray(jpg)
    assert((dw, dh) == (w, h) && (iw, ih) == (w, h))
    for (i <- 0 until w * h) {
      val d = math.abs((ours(3 * i) & 0xFF) - ref(i))
      assert(d <= 1, s"pixel $i: ours ${ours(3 * i) & 0xFF} vs ImageIO ${ref(i)}")
    }
  }

  test("ImageIO's gray encoding decodes identically (±1) in our decoder") {
    val (w, h) = (40, 25)
    val jpg = imageioEncode(grayImage(w, h, (x, y) => (x * 11 + y * 5) % 256))
    val (dw, dh, ours) = JpegCodec.decode(jpg)
    val (_, _, ref) = imageioDecodeGray(jpg)
    assert((dw, dh) == (w, h))
    for (i <- 0 until w * h) {
      val d = math.abs((ours(3 * i) & 0xFF) - ref(i))
      assert(d <= 1, s"pixel $i: ours ${ours(3 * i) & 0xFF} vs ImageIO ${ref(i)}")
    }
  }

  test("ImageIO's default COLOR encoding (4:2:0 subsampled) decodes in our decoder") {
    // constant-color image: any legal chroma upsampling reconstructs
    // the constant, so the check is implementation-agnostic
    val (w, h) = (33, 18)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(180, 90, 40)); g2.fillRect(0, 0, w, h)
    g2.dispose()
    val jpg = imageioEncode(img)
    val (dw, dh, rgb) = JpegCodec.decode(jpg)
    assert((dw, dh) == (w, h))
    for (i <- 0 until w * h) {
      assert(math.abs((rgb(3 * i) & 0xFF) - 180) <= 3 &&
        math.abs((rgb(3 * i + 1) & 0xFF) - 90) <= 3 &&
        math.abs((rgb(3 * i + 2) & 0xFF) - 40) <= 3,
        s"pixel $i: (${rgb(3 * i) & 0xFF},${rgb(3 * i + 1) & 0xFF},${rgb(3 * i + 2) & 0xFF})")
    }
  }

  test("4:2:0 with VARYING luma: our MCU walk places all four Y blocks correctly") {
    // gray-valued RGB: Y varies per pixel, Cb/Cr stay flat — any
    // Y-block misplacement in the 2x2-luma interleaved MCU layout
    // shifts whole 8x8 tiles and fails loudly; chroma upsampling
    // differences can't hide it because chroma is constant
    val (w, h) = (35, 21) // crosses MCU boundaries on both axes
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 3 + y * 7) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val jpg = imageioEncode(img)
    val (dw, dh, ours) = JpegCodec.decode(jpg)
    assert((dw, dh) == (w, h))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val argb = ref.getRGB(x, y)
      for ((c, shift) <- Seq(0 -> 16, 1 -> 8, 2 -> 0)) {
        val d = math.abs(((argb >> shift) & 0xFF) - (ours(o + c) & 0xFF))
        assert(d <= 2, s"pixel ($x,$y) channel $c: ours ${ours(o + c) & 0xFF} " +
          s"vs ImageIO ${(argb >> shift) & 0xFF}")
      }
    }
  }

  test("our 4:4:4 color encoding: ImageIO and our decoder agree within color-convert rounding") {
    val (w, h) = (16, 16)
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      ((p % w) * 16 + (i % 3) * 40 % 256).toByte
    }
    val jpg = JpegCodec.encode(w, h, rgb, quality = 90)
    val (_, _, ours) = JpegCodec.decode(jpg)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(math.abs(((argb >> 16) & 0xFF) - (ours(o) & 0xFF)) <= 2 &&
        math.abs(((argb >> 8) & 0xFF) - (ours(o + 1) & 0xFF)) <= 2 &&
        math.abs((argb & 0xFF) - (ours(o + 2) & 0xFF)) <= 2,
        s"pixel ($x,$y) diverged beyond YCbCr rounding")
    }
  }

  test("restart markers: DRI/RSTn streams decode identically in both decoders") {
    val (w, h) = (48, 24) // 6x3 = 18 MCUs; interval 4 → RST0..RST3 emitted
    val gray = Array.tabulate(w * h)(i => ((i * 13 + 5) % 256).toByte)
    val jpg = JpegCodec.encodeGray(w, h, gray, quality = 80, restartInterval = 4)
    assert(jpg.sliding(2).exists(p => (p(0) & 0xFF) == 0xFF &&
      (p(1) & 0xFF) >= 0xD0 && (p(1) & 0xFF) <= 0xD7),
      "encoder must actually emit RST markers")
    val plain = JpegCodec.encodeGray(w, h, gray, quality = 80)
    val (_, _, withRst) = JpegCodec.decode(jpg)
    val (_, _, without) = JpegCodec.decode(plain)
    assert(java.util.Arrays.equals(withRst, without),
      "restart segmentation must not change decoded pixels")
    val (_, _, ref) = imageioDecodeGray(jpg)
    for (i <- 0 until w * h)
      assert(math.abs((withRst(3 * i) & 0xFF) - ref(i)) <= 1,
        s"pixel $i diverges from ImageIO on the DRI stream")
  }

  test("progressive streams fail loudly (quarantine, never misdecode)") {
    val jpg = imageioEncode(grayImage(16, 16, (x, y) => (x * y) % 256),
      progressive = true)
    val e = intercept[RuntimeException](JpegCodec.decode(jpg))
    assert(e.getMessage.contains("progressive"))
  }

  test("non-JPEG and truncated payloads fail loudly") {
    intercept[IllegalArgumentException](JpegCodec.decode(Array[Byte](1, 2, 3)))
    val good = JpegCodec.encodeGray(8, 8, Array.fill(64)(100.toByte))
    intercept[Exception](JpegCodec.decode(good.take(good.length / 2)))
  }
}
