package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.GifCodec

/** GIF codec: exact LZW round-trips (lossless format — equality, not
  * tolerance), both-direction cross-checks against the JDK's
  * independent ImageIO GIF plugin (the JPEG/PNG precedent), the
  * interlaced wire order, the 4096-entry table-overflow path, and loud
  * failure on malformed streams. */
class GifSpec extends AnyFunSuite {

  /** Deterministic pseudo-random byte stream (no Random: repeatable). */
  private def noise(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 56).toByte
    }
  }

  private def pal(n: Int): Array[Int] =
    Array.tabulate(n)(i => (i << 16) | ((3 * i % 256) << 8) | (7 * i % 256))

  private def imageioDecode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the GIF")
    val (w, h) = (img.getWidth, img.getHeight)
    (w, h, Array.tabulate(w * h)(i => img.getRGB(i % w, i / w) & 0xFFFFFF))
  }

  test("encode→decode round-trips exactly across dims, palettes, interlace") {
    for {
      (w, h) <- Seq((1, 1), (7, 3), (16, 16), (15, 1), (1, 13), (40, 9))
      palSize <- Seq(2, 5, 16, 256)
      interlaced <- Seq(false, true)
    } {
      val p = pal(palSize)
      val idx = noise(w * h, seed = w * 1000L + h * 7L + palSize)
        .map(b => ((b & 0xFF) % palSize).toByte)
      val gif = GifCodec.encode(w, h, idx, p, interlaced)
      val (dw, dh, back, dp) = GifCodec.decode(gif)
      assert(dw == w && dh == h, s"dims ${w}x$h palette $palSize")
      assert(back.sameElements(idx), s"pixels ${w}x$h palette $palSize interlaced=$interlaced")
      // palette pads to the next power of two; the used prefix must match
      assert(dp.take(palSize).sameElements(p), s"palette $palSize")
    }
  }

  test("LZW table overflow (>4096 entries): clear/reset path round-trips and ImageIO agrees") {
    // 160×160 of 8-bit noise: distinct strings blow past 4096 fast, so
    // the encoder's mid-stream CLEAR and the decoder's full-table stall
    // are both on the executed path
    val (w, h) = (160, 160)
    val p = pal(256)
    val idx = noise(w * h, seed = 0xC0FFEE)
    val gif = GifCodec.encode(w, h, idx, p)
    val (dw, dh, back, _) = GifCodec.decode(gif)
    assert(dw == w && dh == h && back.sameElements(idx))
    val (iw, ih, rgb) = imageioDecode(gif)
    assert(iw == w && ih == h)
    for (i <- 0 until w * h)
      assert(rgb(i) == p(idx(i) & 0xFF), s"ImageIO pixel $i")
  }

  test("our encoder is read pixel-identically by ImageIO (non-interlaced and interlaced)") {
    val (w, h) = (23, 17)
    val p = pal(256)
    val idx = Array.tabulate(w * h)(i => ((i % w) * 3 + (i / w) * 5).toByte)
    for (interlaced <- Seq(false, true)) {
      val (iw, ih, rgb) = imageioDecode(GifCodec.encode(w, h, idx, p, interlaced))
      assert(iw == w && ih == h, s"interlaced=$interlaced")
      for (i <- 0 until w * h)
        assert(rgb(i) == p(idx(i) & 0xFF), s"pixel $i interlaced=$interlaced")
    }
  }

  test("ImageIO-written GIFs (with their extension blocks) decode to the same pixels") {
    val (w, h) = (31, 14)
    val p = pal(256)
    val idx = noise(w * h, seed = 42)
    val cm = new java.awt.image.IndexColorModel(8, 256,
      Array.tabulate(256)(i => ((p(i) >> 16) & 0xFF).toByte),
      Array.tabulate(256)(i => ((p(i) >> 8) & 0xFF).toByte),
      Array.tabulate(256)(i => (p(i) & 0xFF).toByte))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, idx(y * w + x) & 0xFF)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    // compare through the palette (the writer may permute/prune table
    // entries; the pixels' COLORS are the contract)
    val (dw, dh, back, dp) = GifCodec.decode(out.toByteArray)
    assert(dw == w && dh == h)
    for (i <- 0 until w * h)
      assert(dp(back(i) & 0xFF) == p(idx(i) & 0xFF), s"pixel $i")
  }

  test("extension blocks before the frame are skipped structurally") {
    val p = pal(4)
    val idx = Array[Byte](0, 1, 2, 3, 2, 1)
    val gif = GifCodec.encode(3, 2, idx, p)
    // splice a comment extension (0x21 0xFE, sub-blocks, terminator)
    // between the color table and the image descriptor
    val descAt = gif.indexOf(0x2C.toByte)
    val ext = Array[Byte](0x21, 0xFE.toByte, 3, 'h', 'i', '!', 0)
    val spliced = gif.take(descAt) ++ ext ++ gif.drop(descAt)
    val (dw, dh, back, _) = GifCodec.decode(spliced)
    assert(dw == 3 && dh == 2 && back.sameElements(idx))
  }

  test("malformed streams fail loudly, never silently misdecode") {
    val p = pal(16)
    val idx = noise(64, 7).map(b => ((b & 0xFF) % 16).toByte)
    val gif = GifCodec.encode(8, 8, idx, p)
    intercept[IllegalArgumentException](GifCodec.decode("NOTGIF".getBytes ++ gif.drop(6)))
    intercept[IllegalArgumentException](GifCodec.decode(gif.take(gif.length / 2)))
    intercept[IllegalArgumentException](GifCodec.decode(gif.take(6))) // sig only
    // trailer with no frame
    intercept[IllegalArgumentException](
      GifCodec.decode(gif.take(13 + 16 * 3) :+ 0x3B.toByte))
    // encode-side: index outside the palette
    intercept[IllegalArgumentException](
      GifCodec.encode(2, 1, Array[Byte](0, 16), p))
    intercept[IllegalArgumentException](
      GifCodec.encode(3, 1, Array[Byte](0, 1), p)) // wrong pixel count
  }

  test("animation: encodeAnimated → decodeFrames round-trips every frame + GCE state") {
    val (w, h) = (9, 6)
    val p = pal(32)
    val frames = (0 until 4).map(f =>
      noise(w * h, seed = 100 + f).map(b => ((b & 0xFF) % 32).toByte))
    val gif = GifCodec.encodeAnimated(w, h, frames, p, delaysCs = Seq(3, 5, 7, 9))
    val (sw, sh, out) = GifCodec.decodeFrames(gif)
    assert(sw == w && sh == h && out.size == 4)
    out.zipWithIndex.foreach { case (fr, i) =>
      assert(fr.frameNo == i && fr.left == 0 && fr.top == 0 && fr.w == w && fr.h == h)
      assert(fr.indices.sameElements(frames(i)), s"frame $i pixels")
      assert(fr.delayCs == Seq(3, 5, 7, 9)(i) && fr.disposal == 1 && fr.transparent == -1)
    }
    // maxFrames stops early; decode() is frame 0
    assert(GifCodec.decodeFrames(gif, maxFrames = 2)._3.map(_.frameNo) == Vector(0, 1))
    assert(GifCodec.decode(gif)._3.sameElements(frames(0)))
  }

  test("animation: every-nth sampling keeps 0,n,2n… and skips dropped frames' LZW data") {
    val (w, h) = (12, 12)
    val p = pal(256)
    val frames = (0 until 7).map(f => noise(w * h, seed = 1000 + f))
    val gif = GifCodec.encodeAnimated(w, h, frames, p, delaysCs = Seq.fill(7)(2))
    for (n <- Seq(1, 2, 3, 7)) {
      val (_, _, kept) = GifCodec.decodeEveryNth(gif, n)
      assert(kept.map(_.frameNo) == (0 until 7 by n).toVector, s"stride $n")
      kept.foreach(fr => assert(fr.indices.sameElements(frames(fr.frameNo)),
        s"stride $n frame ${fr.frameNo}"))
    }
  }

  test("animation: ImageIO's reader sees our frames pixel-identically") {
    val (w, h) = (14, 11)
    val p = pal(256)
    val frames = (0 until 3).map(f => noise(w * h, seed = 50 + f))
    val gif = GifCodec.encodeAnimated(w, h, frames, p, delaysCs = Seq(1, 2, 3))
    val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rd.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif)))
    assert(rd.getNumImages(true) == 3)
    for (f <- 0 until 3) {
      val img = rd.read(f)
      assert(img.getWidth == w && img.getHeight == h, s"frame $f dims")
      for (i <- 0 until w * h)
        assert((img.getRGB(i % w, i / w) & 0xFFFFFF) == p(frames(f)(i) & 0xFF),
          s"frame $f pixel $i")
    }
    rd.dispose()
  }

  test("property: arbitrary indexed images round-trip and ImageIO agrees (raw Gen sampling, fixed seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.chooseNum(1, 48)
      h <- Gen.chooseNum(1, 48)
      palSize <- Gen.chooseNum(2, 256)
      interlaced <- Gen.oneOf(true, false)
      pixels <- Gen.listOfN(w * h, Gen.chooseNum(0, palSize - 1))
    } yield (w, h, palSize, interlaced, pixels.map(_.toByte).toArray)
    for (i <- 0 until 60) {
      val (w, h, ps, il, idx) =
        gen.apply(Gen.Parameters.default, Seed(1000L + i)).get
      val p = pal(ps)
      val gif = GifCodec.encode(w, h, idx, p, il)
      val (dw, dh, back, _) = GifCodec.decode(gif)
      assert(dw == w && dh == h && back.sameElements(idx),
        s"case $i: ${w}x$h pal=$ps interlaced=$il")
      val (iw, ih, rgb) = imageioDecode(gif)
      assert(iw == w && ih == h, s"case $i ImageIO dims")
      for (j <- 0 until w * h)
        assert(rgb(j) == p(idx(j) & 0xFF), s"case $i ImageIO pixel $j")
    }
  }

  test("single-color and single-pixel images (degenerate LZW) round-trip") {
    for ((w, h) <- Seq((1, 1), (200, 1), (64, 64))) {
      val idx = Array.fill[Byte](w * h)(3)
      val gif = GifCodec.encode(w, h, idx, pal(8))
      val (dw, dh, back, _) = GifCodec.decode(gif)
      assert(dw == w && dh == h && back.sameElements(idx), s"${w}x$h")
      val (iw, ih, rgb) = imageioDecode(gif)
      assert(iw == w && ih == h && rgb.forall(_ == pal(8)(3)), s"ImageIO ${w}x$h")
    }
  }
}
