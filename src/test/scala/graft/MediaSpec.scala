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

  test("stub codec CONTRACT: natively-compressed payloads fail loudly, never fake-decode") {
    // the r10 verdict's "close the last stub honestly" item, the
    // tested-contract branch: the stub refuses bytes it recognizably
    // cannot decode instead of flowing them through as features
    val native = Seq(
      "ID3\u0004\u0000junk".getBytes("ISO-8859-1")            -> "MP3",
      Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte)             -> "MPEG audio sync",
      (Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("US-ASCII")) -> "ISO-BMFF",
      Array[Byte](0, 0, 0, 1, 0x67)                           -> "Annex-B",
      "OggS\u0000rest".getBytes("ISO-8859-1")                 -> "Ogg")
    for ((bytes, label) <- native) {
      assert(StubCodec.sniffNative(bytes).isDefined, s"$label must sniff")
      intercept[UnsupportedOperationException](StubCodec.decode(bytes))
      intercept[UnsupportedOperationException](StubCodec.sampleFrames(bytes, 4, 1))
    }
    // UTF-8 text (the gates' stand-in payloads) passes clean: no text
    // byte sequence starts with the NUL/size prefixes the probes need
    val text = "the quick brown fox".getBytes("UTF-8")
    assert(StubCodec.sniffNative(text).isEmpty)
    assert(StubCodec.decode(text).sameElements(text))
    // …including text that merely STARTS with an ASCII magic: the
    // probes also check the structural byte after it (version /
    // syncsafe-size / block-type), which no printable text satisfies
    for (t <- Seq("ID3 tags explained", "OggS is the page magic"))
      assert(StubCodec.sniffNative(t.getBytes("UTF-8")).isEmpty,
        s"text false-positive: $t")
    // FLAC left the quarantine list in r12: a real fLaC payload now
    // routes to the real decoder, not the stub rejection
    val flacReal = graft.multimodal.FlacCodec.encode(8000, 1,
      Array.tabulate[Short](32)(i => (i * 100).toShort), blockSize = 16)
    assert(StubCodec.sniffNative(flacReal).isEmpty,
      "FLAC must no longer sniff as natively-compressed")
    // and the contract holds THROUGH the gate path: a native payload
    // landing in a corpus makes the distributed operator fail loudly,
    // not emit garbage frames
    val poisoned = Seq(MediaFile(9L, "video/mp4",
      Array[Byte](0, 0, 0, 24) ++ "ftypisom0123456789".getBytes("US-ASCII"),
      0, 0, 0))
    val e = intercept[org.apache.spark.SparkException] {
      Media.sampleFrames(poisoned.toDS(), frameSize = 4, everyN = 1).collect()
    }
    assert(e.getCause.isInstanceOf[UnsupportedOperationException] ||
      String.valueOf(e.getMessage).contains("StubCodec"),
      s"gate path must surface the stub rejection: $e")
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

  test("wav codec: round trip is lossless and the JDK's independent javax.sound reader agrees") {
    import graft.multimodal.WavCodec
    // stereo + negatives + a non-trivial length
    val samples = Array.tabulate(1234)(i =>
      ((i * 37 - 600) % 32768).toShort) // mixed-sign PCM
    val wav = WavCodec.encode(44100, 2, samples)
    val (rate, ch, back) = WavCodec.decode(wav)
    assert(rate == 44100 && ch == 2 && back.sameElements(samples))
    // independent oracle: the JDK's own WAV reader parses our encoding
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 44100f && fmt.getChannels == 2 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val raw = ais.readAllBytes()
    assert(raw.length == samples.length * 2)
    val jdkSamples = java.nio.ByteBuffer.wrap(raw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    assert(samples.indices.forall(i => jdkSamples.get(i) == samples(i)),
      "JDK reader must see the same PCM frames")
    // reverse direction: decode a JDK-written WAV
    val jfmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](400)
    java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(Array.tabulate(200)(i => (i * 91 - 5000).toShort))
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), jfmt, 200),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val (r2, c2, s2) = WavCodec.decode(buf.toByteArray)
    assert(r2 == 8000 && c2 == 1 &&
      s2.sameElements(Array.tabulate(200)(i => (i * 91 - 5000).toShort)),
      "JDK-written WAV must decode frame-for-frame")
  }

  test("wav codec: integer linear resample is exact; unsupported payloads fail loudly") {
    import graft.multimodal.WavCodec
    // hand-checked case: [0, 1000, 2000, 3000] at 4 Hz → 3 Hz
    // out i reads p = i*4/3, r = (i*4)%3:
    //  i=0: p=0 r=0 → 0; i=1: p=1 r=1 → (1000*2+2000*1)/3 = 1333;
    //  i=2: p=2 r=2 → (2000*1+3000*2)/3 = 2666
    val out = WavCodec.resampleLinear(
      Array[Short](0, 1000, 2000, 3000), 1, 4, 3)
    assert(out.toSeq == Seq[Short](0, 1333, 2666))
    // upsample doubles frames, interpolating midpoints (incl. negatives)
    val up = WavCodec.resampleLinear(Array[Short](-100, 100), 1, 1, 2)
    assert(up.toSeq == Seq[Short](-100, 0, 100, 100))
    // identity rate is a copy
    val id = WavCodec.resampleLinear(Array[Short](5, -5, 7), 1, 8000, 8000)
    assert(id.toSeq == Seq[Short](5, -5, 7))
    intercept[IllegalArgumentException] {
      WavCodec.decode("RIFFxxxxNOPE".getBytes ++ new Array[Byte](40))
    }
    // non-PCM format tag (IEEE float = 3) must be rejected, not misread
    val wav = WavCodec.encode(8000, 1, Array[Short](1, 2, 3))
    wav(20) = 3
    val e = intercept[IllegalArgumentException] { WavCodec.decode(wav) }
    assert(e.getMessage.contains("PCM"))
    // truncated data chunk
    val cut = WavCodec.encode(8000, 1, Array[Short](1, 2, 3)).dropRight(2)
    intercept[IllegalArgumentException] { WavCodec.decode(cut) }
  }

  test("mm_wav gate: resampled sums match the analytic interpolation formula") {
    val d = java.nio.file.Files.createTempDirectory("graft-mmwav").toString
    Seq((3L, "abc", "en", "s", 3L), (11L, "x" * 27, "en", "s", 27L),
        (40L, "y" * 49, "de", "s", 49L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Media.mmWav(spark, d).collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(3L, 11L, 40L))
    for ((id, r) <- out) {
      val n = r.getInt(1)
      def sample(t: Int) = (id * 31 + t * 17) % 32768
      val nOut = n * Media.WavDstRate / Media.WavSrcRate
      val expect = (0 until nOut).map { i =>
        val num = i.toLong * Media.WavSrcRate
        val p = (num / Media.WavDstRate).toInt
        val rr = (num % Media.WavDstRate).toInt
        val p1 = math.min(p + 1, n - 1)
        (sample(p) * (Media.WavDstRate - rr) + sample(p1) * rr) / Media.WavDstRate
      }.sum
      assert(r.getInt(2) == nOut && r.getLong(3) == expect,
        s"resample mismatch for media $id")
    }
  }

  test("audio fingerprint: gain-invariant, offset- and shape-sensitive") {
    // the robustness claim that justifies fingerprinting over
    // checksumming: a uniformly re-amplified copy (every byte changed)
    // keeps the fingerprint; a genuinely different energy shape does not
    val pcm = Array.tabulate(37)(t => ((t * t * 7) % 150 + 3).toShort)
    val (nf, fp, ones) = Media.audioFpBits(pcm)
    assert(nf == (37 + Media.FpFrame - 1) / Media.FpFrame)
    assert(ones > 0 && ones < nf - 1, "fixture must have a mixed profile")
    val gained = pcm.map(v => (v * 3).toShort) // no clipping: max 459
    assert(Media.audioFpBits(gained) == ((nf, fp, ones)),
      "uniform gain must not move the fingerprint")
    // reversing the clip reverses the energy ramp -> different bits
    val (nfR, fpR, _) = Media.audioFpBits(pcm.reverse)
    assert(nfR == nf && fpR != fp, "a different energy shape must differ")
  }

  test("mm_audio_pairs: pigeonhole-complete within the bucket cap at sf0.001") {
    // every same-length pair within Hamming <= AudioMaxHam whose BOTH
    // endpoints survive the band caps must be found (1 differing bit
    // cannot touch both bands); no pair beyond the radius may appear
    val sf = "/root/testdata/sf0.001"
    val fps = Media.mmAudioFp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val got = Media.mmAudioPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.forall(p => p._3 <= Media.AudioMaxHam))
    // brute-force truth, restricted to cap survivors per (nf, band, key)
    val mask = (1L << Media.AudioBandBits) - 1
    val surv = fps.toSeq.flatMap { case (id, nf, fp) =>
      Seq((nf, 0, fp & mask) -> id, (nf, 1, fp >>> Media.AudioBandBits) -> id)
    }.groupBy(_._1).toSeq.flatMap { case (k, xs) =>
      xs.map(_._2).sorted.take(Media.AudioMaxBucket).map(k -> _)
    }.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val byNf = fps.groupBy(_._2)
    for ((_, xs) <- byNf; i <- xs.indices; j <- (i + 1) until xs.length) {
      val (a, _, fa) = xs(i); val (b, _, fb) = xs(j)
      val ham = java.lang.Long.bitCount(fa ^ fb)
      if (ham <= Media.AudioMaxHam &&
          surv.getOrElse(a, Set.empty).exists(surv.getOrElse(b, Set.empty))) {
        val (lo, hi) = if (a < b) (a, b) else (b, a)
        assert(got.contains((lo, hi, ham.toLong)),
          s"missed pair ($lo, $hi) at hamming $ham")
      }
    }
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

  test("mm_pack_pairs: per-stream spans are contiguous and chunk-exact; image tokens follow the patch grid") {
    val rows = Media.mmPackPairs(spark, "/root/testdata/sf0.001")
      .orderBy("fmt", "doc_id").collect()
    assert(rows.nonEmpty && rows.map(_.getString(1)).toSet == Set("gif", "png", "jpeg", "tiff"))
    // the running-cursor contract, replayed per stream: cursor advances
    // by exactly n_tokens and the reported span is the cursor's
    val cursor = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val C = graft.operators.Cleaning.ChunkTokens
    rows.foreach { r =>
      val (fmt, n) = (r.getString(1), r.getLong(2))
      val cb = cursor(fmt)
      assert(n >= 3L, s"pair cost must include both modalities + separators: $n")
      assert(r.getLong(3) == cb / C, s"first_chunk for ${r.getLong(0)}")
      assert(r.getLong(4) == (cb + n - 1) / C, s"last_chunk for ${r.getLong(0)}")
      assert(r.getLong(5) == (cb + n - 1) / C - cb / C + 1, s"n_chunks for ${r.getLong(0)}")
      cursor(fmt) = cb + n
    }
  }

  test("mm_pack_bpe: running-cursor contract holds and the manifest genuinely diverges from the whitespace packer") {
    val sf = "/root/testdata/sf0.001"
    val rows = Media.mmPackBpe(spark, sf).orderBy("fmt", "doc_id").collect()
    graft.Graft.releaseState(spark) // the BPE trainer's round checkpoints
    assert(rows.nonEmpty && rows.map(_.getString(1)).toSet == Set("gif", "png", "jpeg", "tiff"))
    val cursor = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val C = graft.operators.Cleaning.ChunkTokens
    rows.foreach { r =>
      val (fmt, n) = (r.getString(1), r.getLong(2))
      val cb = cursor(fmt)
      assert(n >= 3L, s"pair cost must include the patch grid + separators: $n")
      assert(r.getLong(3) == cb / C && r.getLong(4) == (cb + n - 1) / C &&
        r.getLong(5) == (cb + n - 1) / C - cb / C + 1,
        s"span mismatch for ${r.getLong(0)}")
      cursor(fmt) = cb + n
    }
    // divergence vs the surrogate-counted packer: same pair set, but
    // token costs AND at least one chunk span must differ — otherwise
    // the BPE composition would be a relabeling on this fixture
    val surrogate = Media.mmPackPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val keyed = rows.map(r => (r.getLong(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(keyed.keySet == surrogate.keySet, "pair set must not change")
    assert(keyed.count { case (k, v) => surrogate(k)._1 != v._1 } > 0,
      "BPE text costs never differ from whitespace costs on this fixture")
    assert(keyed.count { case (k, v) =>
      (surrogate(k)._2, surrogate(k)._3) != ((v._2, v._3)) } > 0,
      "costs differ but every span coincides — the cuts must move")
  }
}
