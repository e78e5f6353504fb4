package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{AlawCodec, UlawCodec}

/** G.711 A-law codec + WAV format-6 container: round-trip identities,
  * the cross-check against the JDK's independent javax.sound ALAW
  * converter, and loud failure on the wrong WAV flavors. */
class AlawSpec extends AnyFunSuite {

  test("codeword identity: encode(decode(a)) == a for EVERY codeword (no ±0 pair in A-law)") {
    for (a <- 0 to 255) {
      val pcm = AlawCodec.decodeSample(a.toByte)
      assert(pcm != 0, s"A-law never decodes to 0 (codeword $a did)")
      assert((AlawCodec.encodeSample(pcm) & 0xFF) == a,
        s"codeword $a decoded to $pcm, re-encoded to ${AlawCodec.encodeSample(pcm) & 0xFF}")
    }
  }

  test("decode table matches the JDK's independent javax.sound ALAW converter") {
    val codes = Array.tabulate(256)(_.toByte)
    val pcm = codes.map(AlawCodec.decodeSample)
    val wav = AlawCodec.encodeWav(8000, 1, pcm)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.ALAW,
      s"JDK must read our container as ALAW, got ${in.getFormat.getEncoding}")
    val pcmFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val conv = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, in)
    val buf = conv.readAllBytes()
    assert(buf.length == 512, s"expected 256 16-bit samples, got ${buf.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until 256) {
      val jdk = bb.getShort(2 * i)
      assert(jdk == pcm(i),
        s"codeword $i: JDK expands to $jdk, our table says ${pcm(i)}")
    }
  }

  test("sign convention is A-law's (top untoggled bit SET = positive, opposite µ-law)") {
    // 0xD5 ^ 0x55 = 0x80: chord 0, mantissa 0, positive → +8
    assert(AlawCodec.decodeSample(0xD5.toByte) == 8)
    // 0x55 ^ 0x55 = 0x00: same magnitude, negative → −8
    assert(AlawCodec.decodeSample(0x55.toByte) == -8)
    // extremes: chord 7, mantissa 15 → ±(16·15+264)·2^6 = ±32256
    assert(AlawCodec.decodeSample(0xAA.toByte) == 32256)  // 0xAA^0x55=0xFF
    assert(AlawCodec.decodeSample(0x2A.toByte) == -32256) // 0x2A^0x55=0x7F
    // encode saturates to the max codeword, both signs
    assert((AlawCodec.encodeSample(32767) & 0xFF) == 0xAA)
    assert((AlawCodec.encodeSample(-32768) & 0xFF) == 0x2A)
  }

  test("container round-trip: rate/channels/codewords survive; odd lengths pad") {
    for (n <- Seq(10, 11)) {
      val pcm = Array.tabulate(n)(t => AlawCodec.decodeSample((t * 23 + 130).toByte))
      val wav = AlawCodec.encodeWav(16000, 1, pcm)
      val (rate, ch, codes) = AlawCodec.decodeWav(wav)
      assert(rate == 16000 && ch == 1 && codes.length == n)
      assert(codes.toSeq == pcm.map(AlawCodec.encodeSample).toSeq)
    }
  }

  test("wrong WAV flavors are refused in every direction") {
    val pcmWav = graft.multimodal.WavCodec.encode(8000, 1, Array[Short](1, 2, 3))
    val e = intercept[IllegalArgumentException](AlawCodec.decodeWav(pcmWav))
    assert(e.getMessage.contains("format tag"))
    // µ-law WAV (format 7) is not A-law (format 6), and vice versa
    val uWav = UlawCodec.encodeWav(8000, 1, Array[Short](100, 200))
    intercept[IllegalArgumentException](AlawCodec.decodeWav(uWav))
    val aWav = AlawCodec.encodeWav(8000, 1, Array[Short](100, 200))
    intercept[IllegalArgumentException](UlawCodec.decodeWav(aWav))
  }
}
