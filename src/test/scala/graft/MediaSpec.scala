package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Media, PngCodec}
import graft.multimodal.Media.{MediaFile, StubCodec}

/** Exercises the multimodal plumbing end to end: binary columns through
  * mapPartitions feature extraction and frame sampling. The codec is a
  * deterministic stub (see Media.StubCodec); everything around it —
  * schema, batching, outputs — is asserted for real.
  */
class MediaSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  val files = Seq(
    MediaFile(1L, "image/fake", Array.tabulate(300)(i => (i % 251).toByte), 1920, 1080, 0),
    MediaFile(2L, "image/fake", "hello world".getBytes("UTF-8"), 100, 400, 0),
    MediaFile(3L, "audio/fake", Array.fill(1024)(7.toByte), 0, 0, 44100),
    MediaFile(4L, "video/fake", Array.tabulate(1000)(_.toByte), 640, 480, 0))

  test("feature extraction: checksum, histogram, thumbnail dims") {
    val out = Media.extractFeatures(files.toDS()).collect()
      .map(f => f.media_id -> f).toMap
    assert(out.size == 4)
    assert(out(1L).n_bytes == 300)
    assert(out(1L).histogram.sum == 300)      // every byte lands in a bucket
    assert(out(1L).thumb_w == 64 && out(1L).thumb_h == 36)  // 16:9 bound
    assert(out(2L).thumb_w == 16 && out(2L).thumb_h == 64)  // portrait
    assert(out(2L).checksum ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out(3L).histogram(0) == 1024)      // all 0x07 → bucket 0
  }

  test("frame sampling: every Nth fixed-size chunk") {
    val frames = Media.sampleFrames(files.filter(_.media_id == 4L).toDS(),
      frameSize = 100, everyN = 2).collect()
    assert(frames.length == 5)                // 10 chunks, every 2nd
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4))
    assert(frames.forall(_.getInt(2) == 100))
  }

  test("stub codec boundary cases") {
    assert(StubCodec.thumbDims(0, 0) == (0, 0))
    assert(StubCodec.thumbDims(64, 64) == (64, 64))
    assert(StubCodec.sampleFrames(Array[Byte](), 10, 2).isEmpty)
  }

  /** Deterministic RGB test image: a w×h gradient with per-pixel values
    * a JDK ImageIO cross-check can verify independently. */
  private def gradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      (i % 3 match {
        case 0 => (p * 7) % 256       // r
        case 1 => (p * 13 + 5) % 256  // g
        case 2 => (p * 29 + 11) % 256 // b
      }).toByte
    }

  test("bmp codec: decode agrees pixel-for-pixel with the JDK's independent ImageIO reader") {
    // 5 wide forces 1 byte of row padding (stride 16); 101 exercises a
    // non-trivial bottom-up row walk
    for ((w, h) <- Seq((5, 3), (101, 7), (64, 64))) {
      val rgb = gradient(w, h)
      val bmp = Media.BmpCodec.encode(w, h, rgb)
      val (dw, dh, drgb) = Media.BmpCodec.decode(bmp)
      assert((dw, dh) == (w, h))
      assert(drgb.sameElements(rgb), s"round trip must be lossless at ${w}x$h")
      // independent oracle: the JDK's own BMP plugin reads our encoding
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert(((argb >> 16) & 0xFF) == (rgb(p) & 0xFF) &&
               ((argb >> 8) & 0xFF) == (rgb(p + 1) & 0xFF) &&
               (argb & 0xFF) == (rgb(p + 2) & 0xFF),
          s"pixel ($x,$y) mismatch vs ImageIO")
      }
    }
    // top-down (negative height) BMPs decode to the same pixels —
    // build one by flipping the bottom-up payload's rows and negating h
    {
      val (w, h) = (5, 3)
      val rgb = gradient(w, h)
      val up = Media.BmpCodec.encode(w, h, rgb)
      val stride = (w * 3 + 3) & ~3
      val down = up.clone()
      val bb = java.nio.ByteBuffer.wrap(down)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(22, -h)
      for (y <- 0 until h; k <- 0 until stride)
        down(54 + y * stride + k) = up(54 + (h - 1 - y) * stride + k)
      val (dw, dh, drgb) = Media.BmpCodec.decode(down)
      assert((dw, dh) == (w, h) && drgb.sameElements(rgb))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(down))
      assert(img.getWidth == w && (img.getRGB(2, 1) & 0xFFFFFF) ==
        (((rgb((1 * w + 2) * 3) & 0xFF) << 16) |
         ((rgb((1 * w + 2) * 3 + 1) & 0xFF) << 8) |
          (rgb((1 * w + 2) * 3 + 2) & 0xFF)),
        "ImageIO agrees on the top-down variant")
    }
    // non-BMP and unsupported flavors fail loudly
    intercept[IllegalArgumentException] {
      Media.BmpCodec.decode("not a bitmap".getBytes)
    }
  }

  test("bmp decode features: real pixel work through the mapPartitions shape") {
    val (w, h) = (160, 90)
    val rgb = gradient(w, h)
    val files = Seq(
      MediaFile(10L, "image/bmp", Media.BmpCodec.encode(w, h, rgb), w, h, 0),
      MediaFile(11L, "image/bmp", Media.BmpCodec.encode(3, 9, gradient(3, 9)), 3, 9, 0))
    val out = Media.decodeBmpFeatures(files.toDS()).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r10 = out(10L)
    assert(r10.getInt(1) == w && r10.getInt(2) == h)
    // channel sums against the raw fixture
    def chanSum(a: Array[Byte], c: Int) =
      a.indices.collect { case i if i % 3 == c => a(i) & 0xFF }.map(_.toLong).sum
    assert(r10.getLong(3) == chanSum(rgb, 0))
    assert(r10.getLong(4) == chanSum(rgb, 1))
    assert(r10.getLong(5) == chanSum(rgb, 2))
    assert(r10.getInt(6) == 64 && r10.getInt(7) == 36) // 16:9 thumb
    // thumbnail md5 matches an independently computed nearest-neighbor
    val thumb = Media.BmpCodec.resizeNearest(w, h, rgb, 64, 36)
    assert(r10.getString(8) ==
      java.security.MessageDigest.getInstance("MD5")
        .digest(thumb).map("%02x".format(_)).mkString)
    assert(out(11L).getInt(6) == 21 && out(11L).getInt(7) == 64) // portrait
  }

  test("png codec: round trip is lossless and the JDK's independent ImageIO reader agrees") {
    for ((w, h) <- Seq((1, 1), (5, 3), (33, 17), (64, 64))) {
      val rgb = gradient(w, h)
      val png = PngCodec.encode(w, h, rgb)
      val (dw, dh, drgb) = PngCodec.decode(png)
      assert((dw, dh) == (w, h))
      assert(drgb.sameElements(rgb), s"round trip must be lossless at ${w}x$h")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert(((argb >> 16) & 0xFF) == (rgb(p) & 0xFF) &&
               ((argb >> 8) & 0xFF) == (rgb(p + 1) & 0xFF) &&
               (argb & 0xFF) == (rgb(p + 2) & 0xFF),
          s"pixel ($x,$y) mismatch vs ImageIO at ${w}x$h")
      }
    }
  }

  test("png codec: decodes the JDK encoder's adaptive-filter output, RGB and RGBA") {
    // ImageIO's PNG writer picks scanline filters adaptively (Sub/Up/
    // Average/Paeth on real image data), so this is the cross-check
    // that our unfilter path handles what encoders in the wild emit
    val (w, h) = (47, 29)
    val rgb = gradient(w, h)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xFF) << 16) | ((rgb(p + 1) & 0xFF) << 8) |
        (rgb(p + 2) & 0xFF))
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val (dw, dh, drgb) = PngCodec.decode(buf.toByteArray)
    assert((dw, dh) == (w, h) && drgb.sameElements(rgb),
      "JDK-encoded truecolor PNG must decode pixel-for-pixel")
    // RGBA source (color type 6): alpha is dropped, channels survive
    val argbImg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val a = 0x80 + ((x + y) % 0x7F)
      argbImg.setRGB(x, y, (a << 24) | ((rgb(p) & 0xFF) << 16) |
        ((rgb(p + 1) & 0xFF) << 8) | (rgb(p + 2) & 0xFF))
    }
    val buf2 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(argbImg, "png", buf2))
    val (aw, ah, argb) = PngCodec.decode(buf2.toByteArray)
    assert((aw, ah) == (w, h) && argb.sameElements(rgb),
      "RGBA PNG decodes to the same RGB with alpha dropped")
  }

  test("png codec: corrupt and unsupported payloads fail loudly") {
    intercept[IllegalArgumentException] {
      PngCodec.decode("definitely not a png".getBytes)
    }
    val png = PngCodec.encode(4, 4, gradient(4, 4))
    // flip one IDAT byte → the chunk CRC check must catch it
    val corrupt = png.clone()
    corrupt(png.length - 20) = (corrupt(png.length - 20) ^ 0x55).toByte
    intercept[IllegalArgumentException] { PngCodec.decode(corrupt) }
    // mark the IHDR as Adam7-interlaced (byte 28) with a VALID crc →
    // the unsupported-flavor check, not the crc check, must fire
    val inter = png.clone()
    inter(28) = 1
    val crc = new java.util.zip.CRC32
    crc.update(inter, 12, 17) // "IHDR" + 13 data bytes
    java.nio.ByteBuffer.wrap(inter).putInt(29, crc.getValue.toInt)
    val e = intercept[IllegalArgumentException] { PngCodec.decode(inter) }
    assert(e.getMessage.contains("interlaced"))
  }

  test("mm_png gate: channel sums of the decoded pixels match the analytic formula") {
    val d = java.nio.file.Files.createTempDirectory("graft-mmpng").toString
    Seq((0L, "alpha", "en", "s", 5L), (7L, "beta-gamma", "en", "s", 10L),
        (23L, "x" * 40, "de", "s", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Media.mmPng(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 7L, 23L))
    for ((id, r) <- out) {
      val (w, h) = (r.getInt(1), r.getInt(2))
      def s(c: Int) = (for (y <- 0 until h; x <- 0 until w)
        yield (id + 3L * x + 5L * y + 7L * c) % 256L).sum
      assert(r.getLong(3) == s(0) && r.getLong(4) == s(1) && r.getLong(5) == s(2),
        s"channel sums for media $id")
    }
    assert(out(23L).getInt(1) == (40 % 13 + 1) && out(23L).getInt(2) == (23 % 11 + 1))
  }

  test("mm_dedup: byte-identical payloads collapse to the min-id canonical; one changed byte is a different asset") {
    val d = java.nio.file.Files.createTempDirectory("graft-mmdedup").toString
    // 0 == 2 byte-for-byte; 1 differs from 0 by ONE byte; 3 is distinct
    Seq((0L, "payload-A", "en", "s", 9L), (1L, "payload-B", "en", "s", 9L),
        (2L, "payload-A", "de", "s", 9L), (3L, "other", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val m = Media.mmDedup(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getInt(5))).toMap
    assert(m(0L) == ((0L, 0)) && m(2L) == ((0L, 1)), "exact copy collapses")
    assert(m(1L) == ((1L, 0)), "a one-byte difference is NOT a duplicate")
    assert(m(3L) == ((3L, 0)))
  }
}
