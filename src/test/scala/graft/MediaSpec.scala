package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media
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
