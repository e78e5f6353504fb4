package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.FlacCodec

/** FLAC codec verification, the GifSpec/TiffSpec discipline adapted to
  * audio. Two independent anchors:
  *
  *  1. Hand-built spec vectors — every bitstream below is constructed by
  *     THIS file's own bit-writer and bit-at-a-time CRC implementations
  *     (deliberately different code from the codec's table-driven CRCs
  *     and streaming writer), straight from the RFC 9639 field layout.
  *     The codec never sees its own serialization here, so a mis-read
  *     field or CRC polynomial cannot self-cancel.
  *  2. The container's own MD5: STREAMINFO carries the JDK-computed MD5
  *     of the raw PCM, and FlacCodec.decode recomputes it over its
  *     DECODED output — encode-side and decode-side bugs cannot pair up.
  */
class FlacSpec extends AnyFunSuite {

  // ---- independent bit-writer (one Int per bit, grouped at the end)
  private class BitW {
    val bits = scala.collection.mutable.ArrayBuffer[Int]()
    def b(v: Long, n: Int): this.type = {
      for (i <- (n - 1) to 0 by -1) bits += ((v >> i) & 1L).toInt
      this
    }
    def s(v: Int, n: Int): this.type = b(v.toLong & ((1L << n) - 1), n)
    def unary(q: Int): this.type = { for (_ <- 0 until q) bits += 0; bits += 1; this }
    def align(): this.type = { while (bits.size % 8 != 0) bits += 0; this }
    def bytes: Array[Byte] = {
      require(bits.size % 8 == 0)
      bits.grouped(8).map(g => g.foldLeft(0)((a, x) => (a << 1) | x).toByte).toArray
    }
  }

  // ---- independent CRCs: bit-at-a-time over the message bits
  private def crc8Slow(bs: Array[Byte]): Int = {
    var r = 0
    for (byte <- bs; i <- 7 to 0 by -1) {
      val bit = (byte >> i) & 1
      val top = (r >> 7) & 1
      r = ((r << 1) & 0xFF) | bit
      if (top == 1) r ^= 0x07 // wrong placement would fail the codec diff
    }
    // standard MSB-first CRC: shift 8 zero bits through after the message
    var k = 0
    while (k < 8) {
      val top = (r >> 7) & 1
      r = (r << 1) & 0xFF
      if (top == 1) r ^= 0x07
      k += 1
    }
    r
  }
  private def crc16Slow(bs: Array[Byte]): Int = {
    var r = 0
    for (byte <- bs; i <- 7 to 0 by -1) {
      val bit = (byte >> i) & 1
      val top = (r >> 15) & 1
      r = ((r << 1) & 0xFFFF) | bit
      if (top == 1) r ^= 0x8005
    }
    var k = 0
    while (k < 16) {
      val top = (r >> 15) & 1
      r = (r << 1) & 0xFFFF
      if (top == 1) r ^= 0x8005
      k += 1
    }
    r
  }

  private def md5le16(samples: Seq[Int]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    samples.foreach { s => md.update((s & 0xFF).toByte); md.update(((s >> 8) & 0xFF).toByte) }
    md.digest()
  }

  /** fLaC magic + last-block STREAMINFO for 16-bit audio. */
  private def streamInfo(rate: Int, ch: Int, total: Long, md5: Array[Byte]): BitW = {
    val w = new BitW
    "fLaC".foreach(c => w.b(c.toLong, 8))
    w.b(1, 1).b(0, 7).b(34, 24)
    w.b(16, 16).b(16, 16)   // min/max block size
    w.b(0, 24).b(0, 24)     // min/max frame size unknown
    w.b(rate, 20).b(ch - 1, 3).b(16 - 1, 5).b(total, 36)
    md5.foreach(x => w.b(x & 0xFF, 8))
    w
  }

  /** Frame header bits through the block-size byte (8-bit form), then
    * CRC-8; body(w) writes the subframes; closes with CRC-16. */
  private def frame(w: BitW, bs: Int, rateCode: Int, chanCode: Int,
      frameNo: Int)(body: BitW => Unit): Unit = {
    val start = w.bits.size / 8
    w.b(0x3FFE, 14).b(0, 1).b(0, 1)
    w.b(6, 4)               // 8-bit block size follows
    w.b(rateCode, 4)
    w.b(chanCode, 4)
    w.b(4, 3).b(0, 1)       // 16-bit samples
    w.b(frameNo, 8)         // coded number (< 0x80)
    w.b(bs - 1, 8)
    val headerBytes = w.align().bytes.drop(start)
    w.b(crc8Slow(headerBytes), 8)
    body(w)
    w.align()
    val frameBytes = w.bytes.drop(start)
    w.b(crc16Slow(frameBytes), 16)
  }

  test("hand vector: constant subframe, table sample-rate code") {
    val w = streamInfo(8000, 1, 4, md5le16(Seq(7, 7, 7, 7)))
    frame(w, bs = 4, rateCode = 4 /* 8000 Hz from the table */ ,
        chanCode = 0, frameNo = 0) { b =>
      b.b(0, 1).b(0, 6).b(0, 1) // subframe: constant, no wasted bits
      b.s(7, 16)
    }
    val (rate, ch, bps, pcm) = FlacCodec.decode(w.bytes)
    assert((rate, ch, bps) == ((8000, 1, 16)))
    assert(pcm.toSeq == Seq(7, 7, 7, 7))
  }

  test("hand vector: LPC subframe (order 1, coeff 1, shift 0)") {
    val w = streamInfo(8000, 1, 3, md5le16(Seq(5, 6, 8)))
    frame(w, bs = 3, rateCode = 0, chanCode = 0, frameNo = 0) { b =>
      b.b(0, 1).b(32, 6).b(0, 1) // LPC order 1
      b.s(5, 16)                 // warmup
      b.b(3, 4)                  // precision 4
      b.s(0, 5)                  // shift 0
      b.s(1, 4)                  // coefficient 1
      b.b(0, 2).b(0, 4).b(0, 4)  // rice method 0, po 0, param 0
      b.unary(2)                 // residual 1 → zigzag 2
      b.unary(4)                 // residual 2 → zigzag 4
    }
    val (_, _, _, pcm) = FlacCodec.decode(w.bytes)
    assert(pcm.toSeq == Seq(5, 6, 8)) // s1 = 1 + 5, s2 = 2 + 6
  }

  test("hand vector: verbatim subframe with 2 wasted bits") {
    val samples = Seq(4, 8, -12, 0)
    val w = streamInfo(8000, 1, 4, md5le16(samples))
    frame(w, bs = 4, rateCode = 0, chanCode = 0, frameNo = 0) { b =>
      b.b(0, 1).b(1, 6)          // verbatim
      b.b(1, 1).unary(1)         // wasted-bits flag, k−1=1 unary → k=2
      Seq(1, 2, -3, 0).foreach(v => b.s(v, 14))
    }
    val (_, _, _, pcm) = FlacCodec.decode(w.bytes)
    assert(pcm.toSeq == samples)
  }

  test("hand vector: fixed order 2, partition order 1, 5-bit rice2 params") {
    val samples = Seq(3, 5, 8, 12, 17, 23) // 2nd-order residuals all 1
    val w = streamInfo(8000, 1, 6, md5le16(samples))
    frame(w, bs = 6, rateCode = 0, chanCode = 0, frameNo = 0) { b =>
      b.b(0, 1).b(8 + 2, 6).b(0, 1) // fixed order 2
      b.s(3, 16).s(5, 16)           // warmup
      b.b(1, 2)                     // residual method 1 (rice2)
      b.b(1, 4)                     // partition order 1 → two partitions
      b.b(0, 5).unary(2)            // p0: param 0, one residual (zig 2)
      b.b(1, 5)                     // p1: param 1
      for (_ <- 0 until 3) { b.unary(1).b(0, 1) } // zig 2 = q1·2 + 0
    }
    val (_, _, _, pcm) = FlacCodec.decode(w.bytes)
    assert(pcm.toSeq == samples)
  }

  test("hand vector: mid-side decorrelation at full scale") {
    val l = Seq(-32768, 100); val r = Seq(32767, -50)
    val mid = l.zip(r).map { case (a, b) => (a + b) >> 1 }
    val side = l.zip(r).map { case (a, b) => a - b }
    val inter = Seq(l(0), r(0), l(1), r(1))
    val w = streamInfo(8000, 2, 2, md5le16(inter))
    frame(w, bs = 2, rateCode = 0, chanCode = 10, frameNo = 0) { b =>
      b.b(0, 1).b(1, 6).b(0, 1)
      mid.foreach(v => b.s(v, 16))
      b.b(0, 1).b(1, 6).b(0, 1)
      side.foreach(v => b.s(v, 17)) // side channel carries the extra bit
    }
    val (_, ch, _, pcm) = FlacCodec.decode(w.bytes)
    assert(ch == 2 && pcm.toSeq == inter)
  }

  test("hand vectors: left-side and right-side decorrelation") {
    val l = Seq(1000, -2000); val r = Seq(990, -1980)
    val side = l.zip(r).map { case (a, b) => a - b }
    val inter = Seq(l(0), r(0), l(1), r(1))
    for ((code, ch0, d0, ch1, d1) <- Seq(
        (8, l, 16, side, 17),   // left-side: left + side
        (9, side, 17, r, 16))) { // right-side: side + right
      val w = streamInfo(8000, 2, 2, md5le16(inter))
      frame(w, bs = 2, rateCode = 0, chanCode = code, frameNo = 0) { b =>
        b.b(0, 1).b(1, 6).b(0, 1); ch0.foreach(v => b.s(v, d0))
        b.b(0, 1).b(1, 6).b(0, 1); ch1.foreach(v => b.s(v, d1))
      }
      val (_, _, _, pcm) = FlacCodec.decode(w.bytes)
      assert(pcm.toSeq == inter, s"assignment $code")
    }
  }

  test("hand vector: rice escape code (raw 5-bit residuals)") {
    val samples = Seq(10, 3, 17, 2) // order-0 "residuals" = the samples
    val w = streamInfo(8000, 1, 4, md5le16(samples))
    frame(w, bs = 4, rateCode = 0, chanCode = 0, frameNo = 0) { b =>
      b.b(0, 1).b(8, 6).b(0, 1)  // fixed order 0
      b.b(0, 2).b(0, 4)
      b.b(15, 4)                 // escape
      b.b(6, 5)                  // raw width 6
      samples.foreach(v => b.s(v, 6))
    }
    val (_, _, _, pcm) = FlacCodec.decode(w.bytes)
    assert(pcm.toSeq == samples)
  }

  // ---------------------------------------------------- round trips

  private def lcg(seed: Long, n: Int, bound: Int): Array[Short] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % bound - bound / 2).toShort
    }
  }

  test("round trip: mono, assorted lengths incl. sub-block and multi-frame") {
    for (n <- Seq(1, 15, 16, 100, 1000, 4099)) {
      val pcm = lcg(n * 7 + 1, n, 65536)
      val enc = FlacCodec.encode(44100, 1, pcm, blockSize = 256)
      val (rate, ch, bps, dec) = FlacCodec.decode(enc)
      assert((rate, ch, bps) == ((44100, 1, 16)))
      assert(dec.toSeq == pcm.map(_.toInt).toSeq, s"n=$n")
    }
  }

  test("round trip: stereo with correlated channels (exercises side coding)") {
    val n = 600
    val l = lcg(11, n, 60000)
    val pcm = new Array[Short](2 * n)
    for (i <- 0 until n) {
      pcm(2 * i) = l(i)
      pcm(2 * i + 1) = (l(i) + (i % 7) - 3).toShort // near-identical right
    }
    val enc = FlacCodec.encode(16000, 2, pcm, blockSize = 64)
    val (_, ch, _, dec) = FlacCodec.decode(enc)
    assert(ch == 2 && dec.toSeq == pcm.map(_.toInt).toSeq)
    // correlated stereo must actually compress vs 16-bit raw
    assert(enc.length < pcm.length * 2,
      s"no compression on a predictable signal: ${enc.length} vs ${pcm.length * 2}")
  }

  test("round trip: extremes, constants, wasted bits, zeros") {
    val cases = Seq[Array[Short]](
      Array.fill(40)(Short.MinValue),
      Array.fill(40)(Short.MaxValue),
      Array.tabulate(50)(i => if (i % 2 == 0) Short.MinValue else Short.MaxValue),
      Array.fill(33)(0.toShort),
      Array.tabulate(64)(i => (i * 8 - 256).toShort), // common low zero bits
      Array.tabulate(100)(i => (i * i % 32768 - 16384).toShort))
    for ((pcm, i) <- cases.zipWithIndex) {
      val enc = FlacCodec.encode(8000, 1, pcm, blockSize = 16)
      val (_, _, _, dec) = FlacCodec.decode(enc)
      assert(dec.toSeq == pcm.map(_.toInt).toSeq, s"case $i")
    }
  }

  test("round trip: anticorrelated stereo (mid-side territory) at full scale") {
    val n = 200
    val pcm = new Array[Short](2 * n)
    for (i <- 0 until n) {
      val v = ((i * 997) % 65536 - 32768).toShort
      pcm(2 * i) = v
      pcm(2 * i + 1) = (-v - 1).toShort // keeps −32768 in range
    }
    val enc = FlacCodec.encode(8000, 2, pcm, blockSize = 32)
    val (_, _, _, dec) = FlacCodec.decode(enc)
    assert(dec.toSeq == pcm.map(_.toInt).toSeq)
  }

  test("round trip: 4-channel independent") {
    val pcm = lcg(99, 4 * 50, 65536)
    val enc = FlacCodec.encode(8000, 4, pcm, blockSize = 16)
    val (_, ch, _, dec) = FlacCodec.decode(enc)
    assert(ch == 4 && dec.toSeq == pcm.map(_.toInt).toSeq)
  }

  test("ramp signal compresses hard (fixed predictors earn their keep)") {
    val pcm = Array.tabulate(4000)(i => (i % 8192).toShort) // order-1 flat
    val enc = FlacCodec.encode(8000, 1, pcm)
    assert(enc.length < pcm.length, // < 0.5 bytes/sample vs 2 raw
      s"ramp should compress >4x: ${enc.length} bytes for ${pcm.length * 2} raw")
  }

  // ------------------------------------------------- loud failures

  test("corruption fails loudly: frame byte, MD5, truncation") {
    val pcm = lcg(5, 300, 65536)
    val enc = FlacCodec.encode(8000, 1, pcm, blockSize = 64)
    val flip = enc.clone
    flip(flip.length - 10) = (flip(flip.length - 10) ^ 0x40).toByte
    intercept[Exception](FlacCodec.decode(flip))       // CRC-16
    val mdflip = enc.clone
    mdflip(30) = (mdflip(30) ^ 0x01).toByte            // inside STREAMINFO MD5
    intercept[Exception](FlacCodec.decode(mdflip))     // MD5 anchor
    intercept[Exception](FlacCodec.decode(enc.take(enc.length - 3)))
    intercept[Exception](FlacCodec.decode("fLaCnope".getBytes("ISO-8859-1")))
  }

  test("mm_flac gate: every clip round-trips through a genuine FLAC stream") {
    val spark = TestSpark.session
    val rows = graft.multimodal.Media.mmFlac(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(r.getInt(1) == ((n + 15) / 16).toInt, s"frame count for ${r.getLong(0)}")
    }
  }

  test("audio dispatch: sniff routes every real container home, quarantines the rest") {
    import graft.multimodal.{Media, WavCodec, UlawCodec, AlawCodec}
    val pcm = Array.tabulate[Short](40)(i => (i * 123 - 2000).toShort)
    assert(Media.sniffAudio(WavCodec.encode(8000, 1, pcm)).contains("wav"))
    assert(Media.sniffAudio(UlawCodec.encodeWav(8000, 1, pcm)).contains("ulaw"))
    assert(Media.sniffAudio(AlawCodec.encodeWav(8000, 1, pcm)).contains("alaw"))
    assert(Media.sniffAudio(FlacCodec.encode(8000, 1, pcm, 16)).contains("flac"))
    // decode lands in uniform PCM; FLAC/WAV routes are bit-exact
    val (fmt, rate, ch, out) = Media.decodeCanonicalPcm(FlacCodec.encode(8000, 1, pcm, 16))
    assert(fmt == "flac" && rate == 8000 && ch == 1 &&
      out.toSeq == pcm.map(_.toInt).toSeq)
    // a RIFF with an unsupported format tag (ADPCM = 2) must sniff None
    val adpcm = WavCodec.encode(8000, 1, pcm).clone
    adpcm(20) = 2 // format tag low byte inside "fmt "
    assert(Media.sniffAudio(adpcm).isEmpty)
    intercept[RuntimeException](Media.decodeCanonicalPcm(adpcm))
    // a corrupt RIFF whose fmt chunk declares a near-2^31 length must
    // quarantine: the truncation bound is checked in Long — the Int
    // form `off + 8 + len` wraps negative here and would sniff "wav"
    val hugeFmt = Array.concat(
      "RIFF".getBytes("ISO-8859-1"), Array[Byte](36, 0, 0, 0),
      "WAVEfmt ".getBytes("ISO-8859-1"),
      Array[Byte](0xF0.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F), // len = 0x7FFFFFF0
      Array[Byte](1, 0, 1, 0)) // PCM tag that the wrapped walk would read
    assert(Media.sniffAudio(hugeFmt).isEmpty,
      "near-2^31 chunk length must not bypass the truncation guard")
    assert(Media.sniffAudio("not audio at all".getBytes("UTF-8")).isEmpty)
    // text that merely starts with the magic must NOT mis-route into
    // the decoder: the probe checks the STREAMINFO structural byte
    assert(Media.sniffAudio("fLaC streams are lossless".getBytes("UTF-8")).isEmpty)
  }

  test("audio dispatch: high-depth FLAC quarantines instead of truncating to 16-bit digests") {
    // hand-build a 24-bit constant stream: FlacCodec.decode handles it,
    // but the canonical-PCM seam must refuse (its digests are 16-bit)
    val v = 0x123456 // a 24-bit sample
    val md = java.security.MessageDigest.getInstance("MD5")
    for (_ <- 0 until 4) { // 4 samples, 3-byte LE each
      md.update((v & 0xFF).toByte)
      md.update(((v >> 8) & 0xFF).toByte)
      md.update(((v >> 16) & 0xFF).toByte)
    }
    val w = new BitW
    "fLaC".foreach(c => w.b(c.toLong, 8))
    w.b(1, 1).b(0, 7).b(34, 24)
    w.b(16, 16).b(16, 16).b(0, 24).b(0, 24)
    w.b(8000, 20).b(0, 3).b(24 - 1, 5).b(4, 36)
    md.digest().foreach(x => w.b(x & 0xFF, 8))
    val start = w.bits.size / 8
    w.b(0x3FFE, 14).b(0, 1).b(0, 1)
    w.b(6, 4).b(0, 4).b(0, 4)
    w.b(6, 3).b(0, 1)      // sample size code 110 = 24-bit
    w.b(0, 8).b(4 - 1, 8)  // frame 0, bs 4
    val hdr = w.align().bytes.drop(start)
    w.b(crc8Slow(hdr), 8)
    w.b(0, 1).b(0, 6).b(0, 1) // constant subframe
    w.s(v, 24)
    w.align()
    w.b(crc16Slow(w.bytes.drop(start)), 16)
    val (_, _, bps, pcm) = FlacCodec.decode(w.bytes) // full decoder: fine
    assert(bps == 24 && pcm.toSeq == Seq(v, v, v, v))
    val e = intercept[IllegalArgumentException](
      graft.multimodal.Media.decodeCanonicalPcm(w.bytes))
    assert(e.getMessage.contains("24-bit"))
  }

  test("mm_audio_dispatch gate: all four formats route and round-trip") {
    val spark = TestSpark.session
    val rows = graft.multimodal.Media.mmAudioDispatch(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val byFmt = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byFmt.keySet == Set("wav", "ulaw", "alaw", "flac"),
      s"all four formats must appear: $byFmt")
    rows.foreach(r => assert(r.getString(1) ==
      Seq("wav", "ulaw", "alaw", "flac")((r.getLong(0) % 4).toInt)))
  }

  test("mm_audio_xdedup gate: WAV and FLAC twins of one recording collapse to one keeper") {
    val spark = TestSpark.session
    val rows = graft.multimodal.Media.mmAudioXdedup(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // every full pair must have collapsed ACROSS containers: 2 members,
    // 2 formats, even keeper
    val pairs = rows.filter(_.getLong(1) == 2L)
    assert(pairs.length >= rows.length - 1, "at most the odd tail group is a singleton")
    pairs.foreach { r =>
      assert(r.getLong(2) == 2L, s"pair ${r.getLong(0)} must span both containers")
      assert(r.getLong(0) % 2 == 0L, "keeper must be the even (WAV) twin")
    }
  }

  test("header CRC-8 failure is caught before subframe parsing") {
    val pcm = lcg(6, 100, 65536)
    val enc = FlacCodec.encode(8000, 1, pcm, blockSize = 64)
    // STREAMINFO ends at byte 4+4+34 = 42; frame header starts there
    val bad = enc.clone
    bad(45) = (bad(45) ^ 0x04).toByte // inside the first frame header
    val e = intercept[Exception](FlacCodec.decode(bad))
    assert(e.getMessage != null)
  }
}
