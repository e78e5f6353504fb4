package graft.multimodal

/** Pure-JVM AVI (RIFF) container codec for MJPEG video — makes the
  * "video frame extraction" entry behind the multimodal boundary REAL:
  * Motion-JPEG is just a sequence of baseline JPEG frames in an AVI
  * container, and [[JpegCodec]] already decodes the frames, so the
  * only missing piece was the container walk. The writer exists for
  * fixtures and the gate; corpus work is the frame-extraction side.
  *
  * Reader coverage: RIFF 'AVI ' with a 'hdrl' header (frame dims read
  * from avih) and a 'movi' LIST whose '..dc'/'..db' chunks are the
  * frame payloads; an OpenDML 'movi' split across RIFF 'AVIX'
  * extensions fails loudly, as does any non-MJPG fourcc in the stream
  * header — quarantine, never a silent misparse (the [[PngCodec]]
  * stance). The index ('idx1') is deliberately ignored: frame order on
  * the wire IS the play order for the sequential-extract use case.
  *
  * Frame SAMPLING (every-nth for feature extraction) happens on the
  * extracted payload list before any pixel work, so a 1-in-30 sample
  * of a 100 TB video corpus Huffman-decodes 1/30th of the frames —
  * the reason extraction and decode are separate steps.
  *
  * Scale shape: per-row O(bytes) container walk + O(sampled pixels)
  * decode inside mapPartitions, zero shuffle.
  */
object AviCodec {

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Write an MJPG AVI: `frames` are ready-made baseline JPEG payloads
    * of a single `w`×`h` video stream at `fps`. */
  def encode(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0 && frames.nonEmpty, "need dims, fps, frames")
    val out = new java.io.ByteArrayOutputStream(frames.map(_.length + 9).sum + 512)
    val le = java.nio.ByteOrder.LITTLE_ENDIAN
    def u32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).order(le).putInt(v).array()
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(payload.length + 9)
      b.write(fourcc(id)); b.write(u32(payload.length)); b.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) b.write(0) // RIFF word alignment
      b.toByteArray
    }
    def list(typ: String, inner: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(typ) ++ inner)
    val avih = java.nio.ByteBuffer.allocate(56).order(le)
      .putInt(1000000 / fps)        // µs per frame
      .putInt(0).putInt(0)          // max bytes/sec, padding
      .putInt(0x10)                 // AVIF_HASINDEX off; 0x10 = AVIF_ISINTERLEAVED? keep simple flags
      .putInt(frames.length)
      .putInt(0)                    // initial frames
      .putInt(1)                    // streams
      .putInt(frames.map(_.length).max)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val strh = java.nio.ByteBuffer.allocate(56).order(le)
      .put(fourcc("vids")).put(fourcc("MJPG"))
      .putInt(0).putShort(0).putShort(0) // flags, priority, language
      .putInt(0)                    // initial frames
      .putInt(1).putInt(fps)        // scale, rate → fps
      .putInt(0).putInt(frames.length)
      .putInt(frames.map(_.length).max)
      .putInt(-1)                   // quality: default
      .putInt(0)                    // sample size: varies
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      .array()
    val strf = java.nio.ByteBuffer.allocate(40).order(le)
      .putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)     // planes, bit count
      .put(fourcc("MJPG"))
      .putInt(w * h * 3)            // size image (nominal)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.iterator.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    out.write(fourcc("RIFF")); out.write(u32(body.length)); out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Extract (width, height, frame payloads in wire order) from an
    * MJPG AVI. */
  def decodeFrames(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    require(bytes.length > 24 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not an AVI payload")
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var w = -1; var h = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk chunks at [off, end): RIFF/LIST recurse, leaves get handled
    def walk(off0: Int, end: Int, ctx: String): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val len = b.getInt(off + 4)
        require(len >= 0 && off + 8 + len <= end,
          s"truncated AVI ($id chunk of $len bytes at $off in $ctx)")
        id match {
          case "LIST" =>
            val typ = new String(bytes, off + 8, 4, "US-ASCII")
            walk(off + 12, off + 8 + len, typ)
          case "avih" =>
            require(len >= 40, "malformed avih")
            w = b.getInt(off + 8 + 32); h = b.getInt(off + 8 + 36)
          case "strh" =>
            val fcc = new String(bytes, off + 8, 4, "US-ASCII")
            if (fcc == "vids") {
              val handler = new String(bytes, off + 12, 4, "US-ASCII")
              require(handler == "MJPG",
                s"only MJPG video streams supported (got $handler) — quarantine")
            }
          case _ if ctx == "movi" && id.length == 4 &&
              (id.endsWith("dc") || id.endsWith("db")) =>
            frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
          case _ => () // strf, idx1, JUNK, vedt, …
        }
        off += 8 + len + (len & 1)
      }
    }
    walk(12, math.min(bytes.length, 8 + b.getInt(4)), "AVI ")
    require(w > 0 && h > 0, "AVI has no avih header")
    require(frames.nonEmpty, "AVI has no movi frames")
    (w, h, frames.toSeq)
  }

  /** Every-`everyN`-th frame payload (sampling BEFORE decode — the
    * cost lever at scale; see object scaladoc). */
  def sampleFrames(frames: Seq[Array[Byte]], everyN: Int): Seq[Array[Byte]] = {
    require(everyN > 0)
    frames.zipWithIndex.collect { case (f, i) if i % everyN == 0 => f }
  }
}
