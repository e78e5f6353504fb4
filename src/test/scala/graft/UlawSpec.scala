package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{AviCodec, JpegCodec, UlawCodec}

/** G.711 µ-law codec + WAV format-7 container, and the MJPEG/AVI
  * container walk: round-trip identities, cross-checks against the
  * JDK's independent javax.sound ULAW converter, and loud failure on
  * the unsupported flavors. */
class UlawSpec extends AnyFunSuite {

  test("codeword identity: encode(decode(u)) == u for every non-degenerate codeword") {
    // 0x7F (negative zero) legitimately re-encodes to 0xFF (positive
    // zero) — both decode to 0; every other codeword is a fixpoint
    for (u <- 0 to 255 if u != 0x7F) {
      val pcm = UlawCodec.decodeSample(u.toByte)
      assert((UlawCodec.encodeSample(pcm) & 0xFF) == u,
        s"codeword $u decoded to $pcm, re-encoded to ${UlawCodec.encodeSample(pcm) & 0xFF}")
    }
    assert(UlawCodec.decodeSample(0x7F.toByte) == 0 &&
      UlawCodec.decodeSample(0xFF.toByte) == 0)
  }

  test("decode table matches the JDK's independent javax.sound ULAW converter") {
    // write a µ-law WAV of all 256 codewords, let javax.sound convert
    // it to 16-bit PCM, and compare sample-for-sample with our table
    val codes = Array.tabulate(256)(_.toByte)
    val pcm = codes.map(UlawCodec.decodeSample)
    val wav = UlawCodec.encodeWav(8000, 1, pcm)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.ULAW,
      s"JDK must read our container as ULAW, got ${in.getFormat.getEncoding}")
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

  test("container round-trip: rate/channels/codewords survive; odd lengths pad") {
    for (n <- Seq(10, 11)) { // odd length exercises RIFF word padding
      val pcm = Array.tabulate(n)(t => UlawCodec.decodeSample((t * 23 + 130).toByte))
      val wav = UlawCodec.encodeWav(16000, 1, pcm)
      val (rate, ch, codes) = UlawCodec.decodeWav(wav)
      assert(rate == 16000 && ch == 1 && codes.length == n)
      assert(codes.toSeq == pcm.map(UlawCodec.encodeSample).toSeq)
    }
  }

  test("16-bit PCM WAVs are refused here (they belong to WavCodec), and vice versa") {
    val pcmWav = graft.multimodal.WavCodec.encode(8000, 1, Array[Short](1, 2, 3))
    val e = intercept[IllegalArgumentException](UlawCodec.decodeWav(pcmWav))
    assert(e.getMessage.contains("format tag"))
    val uWav = UlawCodec.encodeWav(8000, 1, Array[Short](100, 200))
    intercept[IllegalArgumentException](graft.multimodal.WavCodec.decode(uWav))
  }

  test("AVI container: frame payloads survive bit-exactly, odd lengths pad, dims parse") {
    val frames = Seq(
      Array.tabulate(101)(i => (i * 7).toByte),  // odd length
      Array.tabulate(64)(i => (i * 3 + 1).toByte),
      Array.tabulate(33)(i => (255 - i).toByte)) // odd again
    val avi = AviCodec.encode(32, 16, 25, frames)
    val (w, h, got) = AviCodec.decodeFrames(avi)
    assert((w, h) == (32, 16) && got.length == 3)
    for ((a, b) <- frames.zip(got))
      assert(java.util.Arrays.equals(a, b), "frame payload must survive bit-exactly")
    assert(AviCodec.sampleFrames(got, 2).length == 2)
    assert(AviCodec.sampleFrames(got, 2).head eq got.head)
  }

  test("AVI end-to-end: MJPEG frames decode through JpegCodec after the container walk") {
    val (w, h) = (16, 8)
    val gray = Array.tabulate(w * h)(i => (2 * (((i % w) / 8) * 50 + 20)).toByte)
    val jpg = JpegCodec.encodeGray(w, h, gray, quality = 50)
    val avi = AviCodec.encode(w, h, 30, Seq(jpg, jpg))
    val (_, _, got) = AviCodec.decodeFrames(avi)
    val (dw, dh, rgb) = JpegCodec.decode(got(1))
    assert((dw, dh) == (w, h))
    for (i <- 0 until w * h)
      assert((rgb(3 * i) & 0xFF) == (gray(i) & 0xFF))
  }

  test("non-MJPG video streams and non-AVI payloads fail loudly") {
    val frames = Seq(Array[Byte](1, 2, 3))
    val avi = AviCodec.encode(8, 8, 25, frames)
    // corrupt the stream handler fourcc MJPG → H264
    val idx = avi.indexOfSlice("MJPG".getBytes("US-ASCII"))
    assert(idx > 0)
    val bad = avi.clone()
    System.arraycopy("H264".getBytes("US-ASCII"), 0, bad, idx, 4)
    val e = intercept[IllegalArgumentException](AviCodec.decodeFrames(bad))
    assert(e.getMessage.contains("MJPG"))
    intercept[IllegalArgumentException](
      AviCodec.decodeFrames("RIFFxxxxWAVE".getBytes("US-ASCII")))
  }
}
