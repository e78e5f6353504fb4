package graft.multimodal

/** Pure-JVM GIF codec — the web-crawl image format the ingest family
  * was still quarantining (GIF is the third format a WARC image sweep
  * actually meets after JPEG and PNG; see [[Media.StubCodec]] for the
  * shrinking stub boundary). No native libraries: the only moving part
  * GIF mandates is its LZW variant, hand-rolled here both directions.
  *
  * Coverage is the training-corpus subset of the GIF89a specification
  * (CompuServe, 1990 — public): 87a and 89a signatures, global and
  * local color tables, non-interlaced AND Adam-style 4-pass interlaced
  * image data, all extension blocks skipped structurally (graphic
  * control / comment / application / plain text are length-prefixed
  * sub-block chains, so skipping needs no per-type knowledge), first
  * frame of an animation (the training-data reading: frame sampling
  * beyond frame 1 rides [[AviCodec]]'s idiom). Everything malformed —
  * truncated sub-blocks, LZW codes past the table, missing color
  * table — fails loudly: a silent misdecode poisons a corpus, a loud
  * one routes the asset to the quarantine path.
  *
  * The LZW variant (spec Appendix F): variable code width starting at
  * minCodeSize+1, LSB-first bit packing across 255-byte sub-blocks,
  * CLEAR = 2^min and EOI = CLEAR+1 reserved, table capped at 4096 with
  * deferred-clear tolerated on decode; the encoder emits CLEAR and
  * resets when the table fills. Width-growth parity is the classic
  * off-by-one trap: the DECODER widens after inserting entry
  * 2^width−1, i.e. when `next == 1<<width`, so the ENCODER must widen
  * one insert later, when `next > 1<<width` — its inserts run one
  * code ahead of the decoder's (the decoder can't build an entry
  * until it has seen the following code). Both sides here are pinned
  * against the JDK's independent ImageIO GIF plugin in MediaSpec,
  * cross-checked in BOTH directions like [[JpegCodec]].
  *
  * Scale shape: decode is per-image O(bytes) inside mapPartitions — no
  * shuffle, no driver involvement, allocations proportional to one
  * frame (the 4096-entry LZW table is two flat arrays, not a map).
  */
object GifCodec {

  private val MaxWidth = 12 // LZW code width cap (spec Appendix F)
  private val TableCap = 1 << MaxWidth

  // ---------------------------------------------------------------- encode

  /** Encode row-major top-down palette indices as a single-frame GIF89a
    * with a global color table. `palette` is packed 0xRRGGBB, length
    * 2..256; every index must address it. `interlaced` stores rows in
    * the spec's 4-pass order with the interlace flag set — decoded
    * pixels are identical either way (the flag only permutes row
    * order on the wire), which is exactly what makes it a good decoder
    * exercise. */
  def encode(w: Int, h: Int, indices: Array[Byte], palette: Array[Int],
      interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF,
      s"GIF dims out of range: ${w}x$h")
    require(indices.length == w * h, s"need $w*$h indices, got ${indices.length}")
    require(palette.length >= 2 && palette.length <= 256,
      s"palette size ${palette.length} outside 2..256")
    // GCT size is a power of two: the descriptor encodes 2^(n+1) entries
    var gctBits = 1
    while ((1 << gctBits) < palette.length) gctBits += 1
    val gctSize = 1 << gctBits
    var i = 0
    while (i < indices.length) {
      require((indices(i) & 0xFF) < palette.length,
        s"index ${indices(i) & 0xFF} outside palette of ${palette.length}")
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    // packed: GCT present | color resolution 8 bits | unsorted | size
    out.write(0x80 | (7 << 4) | (gctBits - 1))
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio: unspecified
    i = 0
    while (i < gctSize) {
      val rgb = if (i < palette.length) palette(i) else 0
      out.write((rgb >> 16) & 0xFF); out.write((rgb >> 8) & 0xFF); out.write(rgb & 0xFF)
      i += 1
    }
    out.write(0x2C) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(if (interlaced) 0x40 else 0x00) // no LCT; interlace flag
    val rows =
      if (!interlaced) indices
      else {
        val perm = new Array[Byte](indices.length)
        var dst = 0
        for ((start, step) <- InterlacePasses; y <- start until h by step) {
          System.arraycopy(indices, y * w, perm, dst * w, w)
          dst += 1
        }
        perm
      }
    // LZW minimum code size: at least 2 (spec: never 1, even for 2-color)
    val minCode = math.max(2, gctBits)
    out.write(minCode)
    lzwEncode(rows, minCode, out)
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Encode an animation: full-canvas frames over one global palette,
    * each preceded by a Graphic Control Extension carrying its delay
    * (centiseconds, one per frame) with disposal "do not dispose" —
    * the replace-the-whole-canvas animation shape, which is also what
    * makes per-frame decode composition-free. Non-interlaced. */
  def encodeAnimated(w: Int, h: Int, frames: Seq[Array[Byte]],
      palette: Array[Int], delaysCs: Seq[Int]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(delaysCs.length == frames.length,
      s"${frames.length} frames but ${delaysCs.length} delays")
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF,
      s"GIF dims out of range: ${w}x$h")
    require(palette.length >= 2 && palette.length <= 256,
      s"palette size ${palette.length} outside 2..256")
    var gctBits = 1
    while ((1 << gctBits) < palette.length) gctBits += 1
    val gctSize = 1 << gctBits
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 64)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0x80 | (7 << 4) | (gctBits - 1))
    out.write(0); out.write(0)
    var i = 0
    while (i < gctSize) {
      val rgb = if (i < palette.length) palette(i) else 0
      out.write((rgb >> 16) & 0xFF); out.write((rgb >> 8) & 0xFF); out.write(rgb & 0xFF)
      i += 1
    }
    val minCode = math.max(2, gctBits)
    frames.zip(delaysCs).foreach { case (idx, delay) =>
      require(idx.length == w * h, s"need $w*$h indices, got ${idx.length}")
      var j = 0
      while (j < idx.length) {
        require((idx(j) & 0xFF) < palette.length,
          s"index ${idx(j) & 0xFF} outside palette of ${palette.length}")
        j += 1
      }
      // GCE: disposal 1 (do not dispose), no transparency
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(1 << 2); u16(delay); out.write(0); out.write(0)
      out.write(0x2C)
      u16(0); u16(0); u16(w); u16(h)
      out.write(0x00)
      out.write(minCode)
      lzwEncode(idx, minCode, out)
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** GIF-variant LZW compress `data` into 255-byte sub-blocks on `out`.
    * Dictionary is a chained-hash over (prefixCode, byte) pairs in flat
    * arrays — no boxing on the per-pixel path. */
  private def lzwEncode(data: Array[Byte], minCode: Int,
      out: java.io.ByteArrayOutputStream): Unit = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // open-addressed hash: key = prefix<<8 | byte (20 bits), value = code
    val HashSize = 1 << 13
    val hashKey = new Array[Int](HashSize)
    val hashVal = new Array[Int](HashSize)
    java.util.Arrays.fill(hashKey, -1)

    val block = new Array[Byte](255)
    var blockLen = 0
    var bitBuf = 0
    var bitCnt = 0
    var width = minCode + 1
    var next = eoi + 1

    def flushBlock(): Unit =
      if (blockLen > 0) { out.write(blockLen); out.write(block, 0, blockLen); blockLen = 0 }
    def emit(code: Int): Unit = {
      bitBuf |= code << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        block(blockLen) = (bitBuf & 0xFF).toByte
        blockLen += 1
        if (blockLen == 255) flushBlock()
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    def resetTable(): Unit = {
      java.util.Arrays.fill(hashKey, -1)
      next = eoi + 1
      width = minCode + 1
    }
    def lookup(key: Int): Int = {
      var h = (key * 0x9E3779B1L.toInt) >>> (32 - 13)
      while (hashKey(h) != -1 && hashKey(h) != key) h = (h + 1) & (HashSize - 1)
      h
    }

    emit(clear)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xFF
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xFF
        val key = (prefix << 8) | k
        val slot = lookup(key)
        if (hashKey(slot) == key) prefix = hashVal(slot)
        else {
          emit(prefix)
          if (next == TableCap) { // table full: clear and restart
            emit(clear)
            resetTable()
          } else {
            hashKey(slot) = key
            hashVal(slot) = next
            next += 1
            // widen ONE insert after the decoder does (scaladoc): the
            // decoder widened when ITS next hit 1<<width, and its
            // inserts trail ours by one code
            if (next > (1 << width) && width < MaxWidth) width += 1
          }
          prefix = k
        }
        i += 1
      }
      emit(prefix)
    }
    emit(eoi)
    if (bitCnt > 0) { // flush the final partial byte
      block(blockLen) = (bitBuf & 0xFF).toByte
      blockLen += 1
    }
    flushBlock()
  }

  // ---------------------------------------------------------------- decode

  /** The 4 interlace passes: (first row, row step) — GIF89a §20. */
  private val InterlacePasses = Seq((0, 8), (4, 8), (2, 4), (1, 2))

  /** One decoded animation frame: its rectangle on the logical screen,
    * row-major top-down palette indices, the color table in effect
    * (local beats global), and the GIF89a Graphic Control state that
    * preceded it (−1 transparent index = opaque; disposal 0..3;
    * delay in centiseconds). */
  final case class Frame(frameNo: Int, left: Int, top: Int, w: Int, h: Int,
      indices: Array[Byte], palette: Array[Int],
      transparent: Int, disposal: Int, delayCs: Int)

  /** Decode the FIRST image of a GIF into (width, height, row-major
    * top-down palette indices, packed 0xRRGGBB palette). Handles 87a +
    * 89a, global + local color tables, interlace, and skips any
    * extension blocks before the image. Fails loudly on anything
    * structurally off (see object scaladoc). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte], Array[Int]) = {
    val (_, _, frames) = decodeFrames(bytes, maxFrames = 1)
    val f = frames.head
    (f.w, f.h, f.indices, f.palette)
  }

  /** Decode up to `maxFrames` frames of a (possibly animated) GIF:
    * (logical screen w, logical screen h, frames in stream order).
    * Stops reading at the frame cap — the every-nth-frame sampling
    * idiom ([[AviCodec]]) decodes only what it keeps. Graphic Control
    * Extensions are PARSED (not skipped) so each frame carries its
    * transparency/disposal/delay; all other extensions skip
    * structurally. */
  def decodeFrames(bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue): (Int, Int, Vector[Frame]) =
    walkFrames(bytes, _ => true, maxFrames)

  /** Decode every `n`th frame (0, n, 2n, …) of an animated GIF. The
    * frames NOT kept are skipped STRUCTURALLY — their LZW sub-blocks
    * are length-prefixed, so skipping walks block headers without
    * decompressing a byte: decode cost is proportional to frames KEPT,
    * not frames present (the [[AviCodec]] every-nth discipline). */
  def decodeEveryNth(bytes: Array[Byte], n: Int): (Int, Int, Vector[Frame]) = {
    require(n > 0, s"sampling stride $n")
    walkFrames(bytes, _ % n == 0, Int.MaxValue)
  }

  private def walkFrames(bytes: Array[Byte], keep: Int => Boolean,
      maxKept: Int): (Int, Int, Vector[Frame]) = {
    var p = 0
    def u8(): Int = {
      require(p < bytes.length, s"GIF truncated at byte $p")
      val v = bytes(p) & 0xFF; p += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    require(bytes.length >= 6, "GIF truncated: no signature")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"not a GIF signature: $sig")
    p = 6
    val sw = u16(); val sh = u16() // logical screen dims
    val packed = u8()
    u8(); u8() // background index, aspect ratio
    def readColorTable(bits: Int): Array[Int] = {
      val n = 1 << (bits + 1)
      val t = new Array[Int](n)
      var i = 0
      while (i < n) { t(i) = (u8() << 16) | (u8() << 8) | u8(); i += 1 }
      t
    }
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) readColorTable(packed & 0x07) else null
    def skipSubBlocks(): Unit = {
      var n = u8()
      while (n != 0) {
        require(p + n <= bytes.length, s"GIF truncated inside sub-block at $p")
        p += n
        n = u8()
      }
    }
    val frames = Vector.newBuilder[Frame]
    var nKept = 0
    var nSeen = 0
    // pending Graphic Control state: applies to the NEXT image only
    var gceTransparent = -1
    var gceDisposal = 0
    var gceDelay = 0
    var atTrailer = false
    while (!atTrailer && nKept < maxKept) {
      u8() match {
        case 0x21 => // extension: label byte, then sub-block chain
          val label = u8()
          if (label == 0xF9) { // Graphic Control Extension — parsed
            val size = u8()
            require(size == 4, s"GCE block size $size (spec: 4)")
            val gp = u8()
            gceDisposal = (gp >> 2) & 0x07
            gceDelay = u16()
            val ti = u8()
            gceTransparent = if ((gp & 0x01) != 0) ti else -1
            skipSubBlocks()
          } else skipSubBlocks()
        case 0x2C => // image descriptor
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          require(w > 0 && h > 0, s"GIF frame dims ${w}x$h")
          val ipacked = u8()
          val lct =
            if ((ipacked & 0x80) != 0) readColorTable(ipacked & 0x07) else gct
          require(lct != null, "GIF frame has neither local nor global color table")
          val interlaced = (ipacked & 0x40) != 0
          val minCode = u8()
          require(minCode >= 2 && minCode <= 8, s"LZW min code size $minCode")
          if (!keep(nSeen)) {
            // structural skip: LZW data is length-prefixed sub-blocks —
            // no decompression for frames the sampler drops
            skipSubBlocks()
          } else {
            val rows = new Array[Byte](w * h)
            val read = lzwDecode(bytes, p, minCode, rows)
            p = read
            skipSubBlocks() // the terminator (and any spec-violating residue)
            val out =
              if (!interlaced) rows
              else {
                val d = new Array[Byte](rows.length)
                var src = 0
                for ((start, step) <- InterlacePasses; y <- start until h by step) {
                  System.arraycopy(rows, src * w, d, y * w, w)
                  src += 1
                }
                d
              }
            var i = 0
            while (i < out.length) {
              require((out(i) & 0xFF) < lct.length,
                s"GIF pixel index ${out(i) & 0xFF} outside color table of ${lct.length}")
              i += 1
            }
            frames += Frame(nSeen, left, top, w, h, out, lct,
              gceTransparent, gceDisposal, gceDelay)
            nKept += 1
          }
          nSeen += 1
          gceTransparent = -1; gceDisposal = 0; gceDelay = 0
        case 0x3B =>
          atTrailer = true
        case b =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$b%02X at ${p - 1}")
      }
    }
    require(nSeen > 0, "GIF trailer before any image frame")
    (sw, sh, frames.result())
  }

  /** GIF-variant LZW decompress starting at `start` (the first
    * sub-block length byte) into exactly `dst.length` pixels; returns
    * the offset just past the last sub-block consumed. Table is two
    * flat arrays (prefix link + suffix byte); strings materialize by
    * walking the chain into a stack buffer. */
  private def lzwDecode(bytes: Array[Byte], start: Int, minCode: Int,
      dst: Array[Byte]): Int = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](TableCap)
    val suffix = new Array[Byte](TableCap)
    val stack = new Array[Byte](TableCap + 1)
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }

    var p = start
    var blockLeft = 0
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCode + 1
    var next = eoi + 1
    var prev = -1
    var prevFirst = 0 // first byte of the previously output string (KwKwK)
    var out = 0
    var done = false

    def readCode(): Int = {
      while (bitCnt < width) {
        if (blockLeft == 0) {
          require(p < bytes.length, "GIF truncated: LZW stream ran out")
          blockLeft = bytes(p) & 0xFF; p += 1
          require(blockLeft > 0, "GIF LZW stream ended before EOI/pixels complete")
          require(p + blockLeft <= bytes.length, "GIF truncated inside LZW sub-block")
        }
        bitBuf |= (bytes(p) & 0xFFL) << bitCnt
        bitCnt += 8
        p += 1
        blockLeft -= 1
      }
      val c = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      bitCnt -= width
      c
    }

    while (!done) {
      val code = readCode()
      if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        require(out == dst.length,
          s"GIF LZW EOI after $out of ${dst.length} pixels")
        done = true
      } else {
        require(out < dst.length, s"GIF LZW pixels past ${dst.length}")
        require(code < next || (code == next && prev >= 0),
          s"GIF LZW code $code past table size $next")
        // KwKwK: code == next means prev-string + prev-string's first
        // byte. The stack fills last-byte-first (chain walk) and pops
        // top-down, so the APPENDED byte goes in slot 0 (output last).
        var sp = 0
        var c = code
        if (code == next) { stack(sp) = prevFirst.toByte; sp += 1; c = prev }
        while (c >= 0) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        val first = stack(sp - 1) & 0xFF
        require(out + sp <= dst.length,
          s"GIF LZW output ${out + sp} past ${dst.length} pixels")
        while (sp > 0) { sp -= 1; dst(out) = stack(sp); out += 1 }
        if (prev >= 0 && next < TableCap) {
          prefix(next) = prev
          suffix(next) = first.toByte
          next += 1
          if (next == (1 << width) && width < MaxWidth) width += 1
        }
        prev = code
        prevFirst = first
      }
    }
    // position just past the last byte consumed; the caller's
    // skipSubBlocks then eats the remaining sub-block tail (if EOI
    // landed mid-block) and the 0x00 terminator
    if (blockLeft > 0) p + blockLeft else p
  }
}
