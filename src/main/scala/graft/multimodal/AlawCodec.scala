package graft.multimodal

/** Pure-JVM G.711 A-law codec (+ WAV format-6 container) — the OTHER
  * half of the G.711 telephony pair next to [[UlawCodec]]: the
  * companding European/international PSTN trunks ship, implemented
  * from the public G.711 definition (the classic CCITT reference
  * `linear2alaw`/`alaw2linear` arithmetic: 13-bit input, 0x55 toggle
  * mask, 8 chord segments), cross-checked against the JDK's
  * independent `javax.sound.sampled` ALAW converter (AlawSpec, the
  * UlawSpec discipline).
  *
  * Same lossy-but-exact oracle trick as µ-law: A-law is a fixed
  * 256-codeword quantizer and encode∘decode is the IDENTITY on the
  * codeword image — for A-law on ALL 256 codewords (unlike µ-law
  * there is no ±0 degeneracy: the smallest chord decodes to ±8,
  * never 0). The mm_alaw gate synthesizes samples as decoded
  * codewords, round-trips container + both table directions, and
  * hash-checks the expanded PCM against a DuckDB twin evaluating the
  * same expansion in pure integer SQL.
  *
  * Scale shape: per-row O(samples) arithmetic inside mapPartitions —
  * no shuffle, no driver traffic.
  */
object AlawCodec {

  /** Chord upper bounds on the 13-bit magnitude (CCITT seg_aend). */
  private val SegEnd = Array(0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)

  /** Compress one 16-bit sample to its A-law codeword (G.711):
    * 13-bit magnitude (>> 3), chord search, 4-bit mantissa, with the
    * even-bit 0x55 toggle A-law transmits for clock recovery. */
  def encodeSample(pcm0: Short): Byte = {
    var pcm = pcm0.toInt >> 3 // arithmetic: to the 13-bit domain
    val mask = if (pcm >= 0) 0xD5 else { pcm = -pcm - 1; 0x55 }
    var seg = 0
    while (seg < 8 && pcm > SegEnd(seg)) seg += 1
    if (seg >= 8) (0x7F ^ mask).toByte // beyond the table: max magnitude
    else {
      val mant = if (seg < 2) (pcm >> 1) & 0x0F else (pcm >> seg) & 0x0F
      (((seg << 4) | mant) ^ mask).toByte
    }
  }

  /** Expand one A-law codeword to its 16-bit sample (G.711): toggle
    * 0x55, then chord 0 → 16·q + 8, chord 1 → 16·q + 264, chord s ≥ 2
    * → (16·q + 264) << (s − 1); sign POSITIVE when the (untoggled)
    * top bit is set — A-law's convention, opposite µ-law's. */
  def decodeSample(a: Byte): Short = {
    val ac = (a ^ 0x55) & 0xFF
    val q = ac & 0x0F
    val seg = (ac >> 4) & 0x07
    val t = seg match {
      case 0 => (q << 4) + 8
      case 1 => (q << 4) + 0x108
      case s => ((q << 4) + 0x108) << (s - 1)
    }
    (if ((ac & 0x80) != 0) t else -t).toShort
  }

  /** Encode 16-bit PCM as an A-law WAV (format tag 6, 8 bits/sample,
    * with the fact chunk non-PCM WAVs carry). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0,
      s"need whole frames: ${samples.length} samples, $channels channels")
    val dataLen = samples.length // one byte per sample
    val b = java.nio.ByteBuffer.allocate(12 + 26 + 12 + 8 + dataLen + (dataLen & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 26 + 12 + 8 + dataLen + (dataLen & 1))
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(6)                   // WAVE_FORMAT_ALAW
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels) // byte rate: 1 byte/sample
      .putShort(channels.toShort)    // block align
      .putShort(8)                   // bits per sample
      .putShort(0)                   // cbSize
    b.put("fact".getBytes("US-ASCII")).putInt(4)
      .putInt(samples.length / channels)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => b.put(encodeSample(s)))
    if ((dataLen & 1) == 1) b.put(0.toByte) // RIFF word alignment
    b.array()
  }

  /** Decode an A-law WAV to (sampleRate, channels, codewords) — the
    * [[UlawCodec.decodeWav]] walk requiring format tag 6. */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV payload")
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var rate = -1; var channels = -1
    var data: Array[Byte] = null
    while (off + 8 <= bytes.length && (rate < 0 || data == null)) {
      val typ = new String(bytes, off, 4, "US-ASCII")
      val len = b.getInt(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"truncated WAV ($typ chunk of $len bytes at $off)")
      typ match {
        case "fmt " =>
          require(len >= 16, "malformed fmt chunk")
          val fmt = b.getShort(off + 8)
          channels = b.getShort(off + 10)
          rate = b.getInt(off + 12)
          val bits = b.getShort(off + 22)
          require(fmt == 6, s"only A-law WAV supported here (got format tag $fmt)")
          require(bits == 8, s"A-law is 8 bits/sample (got $bits)")
          require(channels > 0 && rate > 0, s"bad fmt: $channels ch @ $rate Hz")
        case "data" =>
          require(rate > 0, "WAV data chunk before fmt")
          data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case _ => () // fact, LIST, …
      }
      off += 8 + len + (len & 1)
    }
    require(data != null, "WAV has no data chunk")
    (rate, channels, data)
  }
}
