package graft.multimodal

/** Pure-JVM G.711 μ-law codec (+ WAV format-7 container) — makes the
  * "compressed audio" entry behind the multimodal boundary REAL, the
  * audio sibling of [[JpegCodec]]: an actual lossy telephony codec
  * (the µ-law companding every PSTN/VoIP stack ships), implemented
  * from the public G.711 definition, cross-checked against the JDK's
  * independent `javax.sound.sampled` ULAW converter (MediaSpec-style,
  * in UlawSpec).
  *
  * Lossy-but-exact oracle trick, same shape as [[JpegCodec]]'s
  * block-constant subspace: µ-law is a fixed 256-codeword quantizer,
  * and encode∘decode is the IDENTITY on the codeword image (decode
  * any codeword, re-encode, get the same codeword back). The mm_ulaw
  * gate therefore synthesizes samples AS decoded codewords, round
  * trips them through the WAV container + both table directions, and
  * hash-checks against a DuckDB twin that evaluates the same G.711
  * expansion formula in pure integer SQL.
  *
  * Scale shape: per-row O(samples) table lookups inside
  * mapPartitions — no shuffle, no driver traffic.
  */
object UlawCodec {

  private val Bias = 0x84   // 132, the G.711 µ-law bias
  private val Clip = 32635

  /** Compress one 16-bit sample to its µ-law codeword (G.711). */
  def encodeSample(pcm0: Short): Byte = {
    var pcm = pcm0.toInt
    val sign = if (pcm < 0) { pcm = -pcm; 0x80 } else 0
    if (pcm > Clip) pcm = Clip
    pcm += Bias
    var exp = 7; var mask = 0x4000
    while (exp > 0 && (pcm & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (pcm >> (exp + 3)) & 0x0F
    (~(sign | (exp << 4) | mant)).toByte
  }

  /** Expand one µ-law codeword to its 16-bit sample (G.711):
    * ((mant·8 + 132) << exp) − 132, sign from the top bit. */
  def decodeSample(u: Byte): Short = {
    val uc = (~u) & 0xFF
    val exp = (uc >> 4) & 7
    val mant = uc & 0x0F
    val t = (((mant << 3) + Bias) << exp) - Bias
    (if ((uc & 0x80) != 0) -t else t).toShort
  }

  /** Encode 16-bit PCM as a µ-law WAV (format tag 7, 8 bits/sample,
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
      .putShort(7)                   // WAVE_FORMAT_MULAW
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

  /** Decode a µ-law WAV to (sampleRate, channels, codewords). The
    * PCM expansion is [[decodeSample]] per codeword; returning the
    * codewords keeps the container parse and the table separable
    * (the gate asserts both). Anything but format-7/8-bit raises —
    * 16-bit PCM belongs to [[WavCodec]]. */
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
          require(fmt == 7, s"only µ-law WAV supported here (got format tag $fmt)")
          require(bits == 8, s"µ-law is 8 bits/sample (got $bits)")
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
