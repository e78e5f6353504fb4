package graft.multimodal

/** Pure-JVM WAV/PCM audio codec — the audio sibling of [[PngCodec]]:
  * closes the "audio resample" stub with a real implementation needing
  * no native libraries. RIFF/WAVE container, 16-bit signed
  * little-endian PCM (the interchange baseline every audio tool
  * emits), any channel count; every other encoding (float, ADPCM,
  * 8/24-bit, big-endian AIFF…) fails loudly — same
  * quarantine-don't-poison policy as the image codecs.
  *
  * Resampling is integer-exact linear interpolation: output frame i
  * sits at source position i·srcRate/dstRate, and the interpolation
  * `(s0·(dst−frac) + s1·frac) / dst` uses only integer arithmetic —
  * deterministic across JVMs AND replayable in SQL, which is what lets
  * the mm_wav gate hash-check resampled samples against an analytic
  * DuckDB twin (no float rounding to diverge on).
  *
  * Scale shape: identical to the image path — per-row O(samples) work
  * inside mapPartitions, zero shuffle, zero driver traffic.
  */
object WavCodec {

  private val HeaderLen = 44 // RIFF(12) + fmt(24) + data header(8)

  /** Encode interleaved 16-bit PCM frames as a canonical WAV file. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0,
      s"need whole frames: ${samples.length} samples, $channels channels")
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(HeaderLen + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Decode a 16-bit PCM WAV to (sampleRate, channels, interleaved
    * samples). Walks RIFF chunks (so padding/ancillary chunks like
    * LIST are skipped), requires PCM/16-bit, rejects truncation. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    require(bytes.length >= HeaderLen &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV payload")
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var rate = -1; var channels = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (rate < 0 || samples == null)) {
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
          require(fmt == 1, s"only PCM WAV supported (got format tag $fmt)")
          require(bits == 16, s"only 16-bit PCM supported (got $bits)")
          require(channels > 0 && rate > 0, s"bad fmt: $channels ch @ $rate Hz")
        case "data" =>
          require(rate > 0, "WAV data chunk before fmt")
          require(len % 2 == 0, "odd data chunk length for 16-bit PCM")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = b.getShort(off + 8 + i * 2); i += 1 }
        case _ => () // ancillary chunk (LIST, fact, …)
      }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(samples != null, "WAV has no data chunk")
    (rate, channels, samples)
  }

  /** Integer-exact linear resample of interleaved frames. Output frame
    * i reads source position p = i·src/dst (integer part) with
    * fractional remainder r = (i·src) mod dst, interpolating
    * (s[p]·(dst−r) + s[p+1]·r) / dst per channel — pure integer ops,
    * truncating division, clamped at the final frame. */
  def resampleLinear(samples: Array[Short], channels: Int,
      srcRate: Int, dstRate: Int): Array[Short] = {
    require(channels > 0 && samples.length % channels == 0)
    require(srcRate > 0 && dstRate > 0)
    val nIn = samples.length / channels
    if (nIn == 0) return Array.empty
    val nOut = (nIn.toLong * dstRate / srcRate).toInt
    val out = new Array[Short](nOut * channels)
    var i = 0
    while (i < nOut) {
      val num = i.toLong * srcRate
      val p = (num / dstRate).toInt
      val r = (num % dstRate).toInt
      val p1 = math.min(p + 1, nIn - 1)
      var c = 0
      while (c < channels) {
        val s0 = samples(p * channels + c).toLong
        val s1 = samples(p1 * channels + c).toLong
        out(i * channels + c) = ((s0 * (dstRate - r) + s1 * r) / dstRate).toShort
        c += 1
      }
      i += 1
    }
    out
  }
}
