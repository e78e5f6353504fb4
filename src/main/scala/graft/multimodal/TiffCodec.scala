package graft.multimodal

/** Pure-JVM baseline TIFF codec (TIFF 6.0, Adobe 1992 — public spec):
  * the scanned-document / scientific-imagery format a crawl's PDF and
  * archive payloads carry. No native libraries; the only nontrivial
  * machinery is TIFF's OWN LZW variant, hand-rolled both directions —
  * deliberately a SECOND, different LZW from [[GifCodec]]'s:
  *
  *   - MSB-FIRST bit packing (GIF is LSB-first);
  *   - fixed 9-bit initial width over a 256-symbol alphabet with
  *     CLEAR=256 / EOI=257 (GIF derives width from the palette);
  *   - the EARLY-CHANGE rule ("you need to change more often than the
  *     reader of fine literature might expect", TIFF 6.0 §13): the
  *     reader widens when its table holds 511/1023/2047 entries —
  *     while code 511 would STILL fit in 9 bits, one change earlier
  *     than GIF's capacity-exact rule — and the writer, whose inserts
  *     run one code ahead, widens at 512/1024/2048. Both sides here
  *     are pinned against the JDK's independent ImageIO TIFF plugin
  *     (TiffSpec, both directions, across the 9→10→11→12-bit
  *     thresholds), whose decompressor bytecode confirms the 511
  *     threshold, as does libtiff's `free_ent > maxcode - 1`.
  *
  * Coverage is the training-corpus subset: 8-bit grayscale
  * (PhotometricInterpretation 1) and RGB (2), chunky planar layout,
  * compression None (1) or LZW (5) with horizontal-differencing
  * predictor 1 or 2, any strip layout, both byte orders on decode
  * (the encoder writes little-endian, any rows-per-strip, either
  * predictor). Everything else —
  * palettes, tiles, 16-bit, PackBits/JPEG/Deflate-in-TIFF, planar
  * format 2 — fails loudly: a silent misdecode poisons a corpus.
  *
  * Scale shape: per-image O(bytes) inside mapPartitions — no shuffle,
  * flat-array LZW table, allocations proportional to one image.
  */
object TiffCodec {

  private val MaxWidth = 12

  // ---------------------------------------------------------------- encode

  /** Encode row-major top-down RGB pixels as a little-endian baseline
    * TIFF (chunky RGB; LZW-compressed when `lzw`, else uncompressed;
    * horizontal-differencing `predictor` 2 — the transform that makes
    * LZW competitive on natural gradients — or the identity 1;
    * `rowsPerStrip` 0 = one strip, else multi-strip, each strip its
    * own LZW stream as the spec requires). */
  def encode(w: Int, h: Int, rgb: Array[Byte], lzw: Boolean = false,
      predictor: Int = 1, rowsPerStrip: Int = 0): Array[Byte] =
    encodePages(w, h, Seq(rgb), lzw, predictor, rowsPerStrip)

  /** Encode a MULTI-PAGE TIFF (the scanned-document layout: one IFD
    * per page, chained by the next-IFD pointer), every page `w`×`h`
    * RGB. Same wire options as [[encode]], applied to every page. */
  def encodePages(w: Int, h: Int, pages: Seq[Array[Byte]],
      lzw: Boolean = false, predictor: Int = 1,
      rowsPerStrip: Int = 0): Array[Byte] = {
    require(pages.nonEmpty, "need at least one page")
    pages.foreach(p => require(w > 0 && h > 0 && p.length == w * h * 3,
      s"need $w*$h*3 RGB bytes per page, got ${p.length}"))
    require(predictor == 1 || predictor == 2, s"predictor $predictor")
    require(predictor == 1 || lzw, "predictor 2 is an LZW transform (spec §14)")
    val rps = if (rowsPerStrip <= 0) h else math.min(rowsPerStrip, h)
    val stride = w * 3
    val nStrips = (h + rps - 1) / rps
    def stripsOf(rgb: Array[Byte]): IndexedSeq[Array[Byte]] =
      (0 until nStrips).map { si =>
        val rows = math.min(rps, h - si * rps)
        val raw = java.util.Arrays.copyOfRange(rgb, si * rps * stride,
          si * rps * stride + rows * stride)
        if (predictor == 2) { // difference RIGHT-TO-LEFT (inverse of decode's cumsum)
          var r = 0
          while (r < rows) {
            var i = (r + 1) * stride - 1
            while (i >= r * stride + 3) {
              raw(i) = (raw(i) - raw(i - 3)).toByte
              i -= 1
            }
            r += 1
          }
        }
        if (lzw) lzwEncode(raw) else raw
      }
    val pageStrips = pages.map(stripsOf)
    // fixed per-page layout: strips (even-aligned) then the page's IFD
    // with its external value arrays; pages laid out back to back
    val nEntries = 10
    val ifdSize = 2 + nEntries * 12 + 4 + 6 + (if (nStrips > 1) 8 * nStrips else 0)
    val stripBytes = pageStrips.map(_.map(s => s.length + (s.length & 1)).sum)
    val pageAts = stripBytes.map(_ + ifdSize).scanLeft(8)(_ + _)
    val ifdAts = pageAts.zip(stripBytes).map { case (at, sb) => at + sb }
    val out = new java.io.ByteArrayOutputStream(pageAts.last + 64)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF) }
    out.write('I'); out.write('I'); u16(42); u32(ifdAts(0))
    for (pg <- pageStrips.indices) {
      val strips = pageStrips(pg)
      val stripAts = strips.scanLeft(pageAts(pg))((at, s) => at + s.length + (s.length & 1))
      strips.foreach { s => out.write(s); if ((s.length & 1) == 1) out.write(0) }
      val ifdAt = ifdAts(pg)
      val bpsAt = ifdAt + 2 + nEntries * 12 + 4 // external 3×SHORT BitsPerSample
      val offsAt = bpsAt + 6                    // external n×LONG StripOffsets
      val cntsAt = offsAt + 4 * nStrips         // external n×LONG StripByteCounts
      // 10 entries, ascending tag order (spec requirement)
      u16(nEntries)
      def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
        u16(tag); u16(typ); u32(count); u32(value)
      }
      entry(256, 4, 1, w)              // ImageWidth, LONG
      entry(257, 4, 1, h)              // ImageLength, LONG
      entry(258, 3, 3, bpsAt)          // BitsPerSample → external 8,8,8
      entry(259, 3, 1, if (lzw) 5 else 1) // Compression
      entry(262, 3, 1, 2)              // Photometric: RGB
      entry(273, 4, nStrips,           // StripOffsets: inline iff single strip
        if (nStrips == 1) stripAts(0) else offsAt)
      entry(277, 3, 1, 3)              // SamplesPerPixel
      entry(278, 4, 1, rps)            // RowsPerStrip
      entry(279, 4, nStrips,           // StripByteCounts: inline iff single
        if (nStrips == 1) strips(0).length else cntsAt)
      entry(317, 3, 1, predictor)      // Predictor
      u32(if (pg + 1 < pageStrips.length) ifdAts(pg + 1) else 0) // next IFD
      u16(8); u16(8); u16(8)           // the external BitsPerSample values
      if (nStrips > 1) {
        stripAts.init.foreach(u32)
        strips.foreach(s => u32(s.length))
      }
    }
    out.toByteArray
  }

  /** TIFF-variant LZW compress: MSB-first, 9-bit start, early change
    * at 511/1023/2047, clear at table size 4094 (spec §13). */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val Clear = 256; val Eoi = 257
    val HashSize = 1 << 13
    val hashKey = new Array[Int](HashSize)
    val hashVal = new Array[Int](HashSize)
    java.util.Arrays.fill(hashKey, -1)
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    var next = 258
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code // MSB-first: append at the low end
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xFF).toInt)
        bitCnt -= 8
      }
    }
    def reset(): Unit = {
      java.util.Arrays.fill(hashKey, -1)
      next = 258; width = 9
    }
    def slotOf(key: Int): Int = {
      var s = (key * 0x9E3779B1L.toInt) >>> (32 - 13)
      while (hashKey(s) != -1 && hashKey(s) != key) s = (s + 1) & (HashSize - 1)
      s
    }
    emit(Clear)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xFF
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xFF
        val key = (prefix << 8) | k
        val s = slotOf(key)
        if (hashKey(s) == key) prefix = hashVal(s)
        else {
          emit(prefix)
          if (next >= 4094) { // spec: clear early, keeping slack
            emit(Clear)
            reset()
          } else {
            hashKey(s) = key
            hashVal(s) = next
            next += 1
            // EARLY-CHANGE handshake, writer side: widen when the
            // table holds 512/1024/2048 entries — one entry EARLIER
            // than capacity requires (code 511 would still fit in 9
            // bits), which is the TIFF quirk. Verified against both
            // the JDK's TIFFLZWDecompressor (widens at ITS count 511;
            // its adds trail ours by one code, so these are in
            // lockstep) and libtiff's `free_ent > maxcode` (= 512).
            if (next == 512 || next == 1024 || next == 2048) width += 1
          }
          prefix = k
        }
        i += 1
      }
      emit(prefix)
      // End-of-stream handshake (libtiff's LZWPostEncode discipline):
      // the decoder performs ONE MORE table insert while processing
      // this final code, and if that insert lands exactly on its
      // 511/1023/2047 threshold it widens BEFORE reading EOI. Mirror
      // that insert here so EOI is emitted at the width the decoder
      // will read it at — without this, a stream whose final insert
      // hits the threshold (e.g. exactly 254 all-distinct-pair bytes)
      // desyncs on the very last code.
      next += 1
      if (next == 512 || next == 1024 || next == 2048) width += 1
    }
    emit(Eoi)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Parse the 8-byte header: (little-endian?, first IFD offset). */
  private def headerOf(bytes: Array[Byte]): (Boolean, Int) = {
    require(bytes.length >= 8, "TIFF truncated: no header")
    val le = (bytes(0), bytes(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException("not a TIFF byte-order mark")
    }
    require(rd16(bytes, le, 2) == 42, s"TIFF magic ${rd16(bytes, le, 2)} != 42")
    (le, rd32(bytes, le, 4))
  }

  private def rd16(bytes: Array[Byte], le: Boolean, p: Int): Int = {
    require(p >= 0 && p + 2 <= bytes.length, s"TIFF truncated at $p")
    val a = bytes(p) & 0xFF; val b = bytes(p + 1) & 0xFF
    if (le) a | (b << 8) else (a << 8) | b
  }

  private def rd32(bytes: Array[Byte], le: Boolean, p: Int): Int = {
    val a = rd16(bytes, le, p); val b = rd16(bytes, le, p + 2)
    if (le) a | (b << 16) else (a << 16) | b
  }

  /** Structural IFD hop: the next-IFD pointer WITHOUT decoding the
    * page (entry-count walk only — how skipped pages stay cheap). */
  private def nextIfdOf(bytes: Array[Byte], le: Boolean, ifdAt: Int): Int =
    rd32(bytes, le, ifdAt + 2 + 12 * rd16(bytes, le, ifdAt))

  /** Decode a baseline TIFF's FIRST page into (width, height,
    * row-major top-down RGB bytes) — grayscale expands to RGB triples
    * (the [[Media.decodeCanonicalRgb]] canonical form). Fails loudly
    * on anything outside the documented subset. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (le, ifdAt) = headerOf(bytes)
    val (w, h, rgb, _) = decodeIfd(bytes, le, ifdAt)
    (w, h, rgb)
  }

  /** One decoded page of a multi-page TIFF. */
  final case class Page(pageNo: Int, w: Int, h: Int, rgb: Array[Byte])

  /** Number of pages (IFDs) — a structural walk, nothing decoded.
    * A repeated IFD offset (a crafted or corrupt next-IFD cycle) fails
    * loudly instead of hanging the task. */
  def pageCount(bytes: Array[Byte]): Int = {
    val (le, first) = headerOf(bytes)
    val seen = new java.util.HashSet[Integer]()
    var at = first; var n = 0
    while (at != 0) {
      require(seen.add(at), s"TIFF IFD chain cycles back to offset $at")
      n += 1; at = nextIfdOf(bytes, le, at)
    }
    n
  }

  /** Decode every `stride`-th page (0, stride, 2·stride, …) of a
    * multi-page TIFF — the frame-sampling idiom ([[GifCodec
    * .decodeEveryNth]]'s document twin): skipped pages' strip data is
    * never touched, only their 12-byte-per-entry IFDs are hopped, so
    * decode cost ∝ pages KEPT. */
  def decodeEveryNth(bytes: Array[Byte], stride: Int): Vector[Page] = {
    require(stride >= 1, s"stride $stride")
    val (le, first) = headerOf(bytes)
    val seen = new java.util.HashSet[Integer]()
    val out = Vector.newBuilder[Page]
    var at = first; var pageNo = 0
    while (at != 0) {
      require(seen.add(at), s"TIFF IFD chain cycles back to offset $at")
      if (pageNo % stride == 0) {
        val (w, h, rgb, next) = decodeIfd(bytes, le, at)
        out += Page(pageNo, w, h, rgb)
        at = next
      } else at = nextIfdOf(bytes, le, at)
      pageNo += 1
    }
    out.result()
  }

  /** Decode the IFD at `ifdAt`: (w, h, canonical RGB, next-IFD offset
    * or 0). */
  private def decodeIfd(bytes: Array[Byte], le: Boolean,
      ifdAt: Int): (Int, Int, Array[Byte], Int) = {
    def u16(p: Int): Int = rd16(bytes, le, p)
    def u32(p: Int): Int = rd32(bytes, le, p)
    val n = u16(ifdAt)
    require(n > 0, "TIFF IFD has no entries")
    // tag → (type, count, valueOffsetPos)
    var tags = Map.empty[Int, (Int, Int, Int)]
    for (i <- 0 until n) {
      val e = ifdAt + 2 + i * 12
      tags += u16(e) -> (u16(e + 2), u32(e + 4), e + 8)
    }
    def scalar(tag: Int, default: Option[Long] = None): Long = tags.get(tag) match {
      case Some((typ, count, vp)) =>
        require(count == 1, s"TIFF tag $tag count $count (expected scalar)")
        typ match {
          case 3 => u16(vp).toLong
          case 4 => u32(vp).toLong & 0xFFFFFFFFL
          case t => throw new IllegalArgumentException(s"TIFF tag $tag type $t")
        }
      case None => default.getOrElse(
        throw new IllegalArgumentException(s"TIFF missing required tag $tag"))
    }
    def vector(tag: Int): Seq[Long] = tags.get(tag) match {
      case Some((typ, count, vp)) =>
        val width = typ match {
          case 3 => 2
          case 4 => 4
          case t => throw new IllegalArgumentException(s"TIFF tag $tag type $t")
        }
        val at = if (count * width <= 4) vp else u32(vp)
        (0 until count).map { i =>
          if (width == 2) u16(at + 2 * i).toLong
          else u32(at + 4 * i).toLong & 0xFFFFFFFFL
        }
      case None => throw new IllegalArgumentException(s"TIFF missing required tag $tag")
    }
    val w = scalar(256).toInt
    val h = scalar(257).toInt
    require(w > 0 && h > 0, s"TIFF dims ${w}x$h")
    val spp = scalar(277, Some(1L)).toInt
    require(spp == 1 || spp == 3, s"TIFF SamplesPerPixel $spp (need 1 or 3)")
    val bps = tags.get(258).map(_ => vector(258)).getOrElse(Seq.fill(spp)(8L))
    require(bps.forall(_ == 8L), s"TIFF BitsPerSample $bps (need all 8)")
    val photo = scalar(262).toInt
    require(photo == 1 || photo == 2,
      s"TIFF PhotometricInterpretation $photo (palette/white-is-zero unsupported)")
    require((photo == 2) == (spp == 3), s"TIFF photometric $photo vs $spp samples")
    val comp = scalar(259, Some(1L)).toInt
    require(comp == 1 || comp == 5,
      s"TIFF compression $comp (only None/LZW decoded; PackBits/JPEG/Deflate quarantine)")
    require(scalar(284, Some(1L)) == 1L, "TIFF planar format 2 unsupported")
    // interpretation-changing baseline tags OUTSIDE the decoded subset
    // must quarantine, not silently misdecode (wrong pixels poison the
    // canonical-RGB dedup key and every channel sum downstream):
    // non-default Orientation reorders the raster, FillOrder 2
    // bit-reverses the LZW stream, non-unsigned SampleFormat changes
    // what the bytes MEAN
    require(scalar(274, Some(1L)) == 1L, "TIFF Orientation != 1 unsupported")
    require(scalar(266, Some(1L)) == 1L, "TIFF FillOrder 2 (bit-reversed) unsupported")
    require(scalar(339, Some(1L)) == 1L, "TIFF SampleFormat != unsigned unsupported")
    val predictor = scalar(317, Some(1L)).toInt
    require(predictor == 1 || predictor == 2, s"TIFF predictor $predictor")
    val rowsPerStrip = math.min(scalar(278, Some(0xFFFFFFFFL)), h.toLong).toInt
    val offsets = vector(273)
    val counts = vector(279)
    require(offsets.length == counts.length,
      s"TIFF ${offsets.length} strip offsets vs ${counts.length} counts")
    require(offsets.length == (h + rowsPerStrip - 1) / rowsPerStrip,
      s"TIFF strip count ${offsets.length} vs rows $h / $rowsPerStrip")
    val stride = w * spp
    val raw = new Array[Byte](h * stride)
    var row0 = 0
    for ((off, cnt) <- offsets.zip(counts)) {
      val rows = math.min(rowsPerStrip, h - row0)
      val want = rows * stride
      require(off + cnt <= bytes.length, "TIFF strip past end of file")
      val strip =
        if (comp == 1) {
          require(cnt >= want, s"TIFF uncompressed strip $cnt < $want bytes")
          java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + want)
        } else lzwDecode(bytes, off.toInt, cnt.toInt, want)
      if (predictor == 2) { // horizontal differencing: cumulative sum per row
        var r = 0
        while (r < rows) {
          var i = r * stride + spp
          while (i < (r + 1) * stride) {
            strip(i) = (strip(i) + strip(i - spp)).toByte
            i += 1
          }
          r += 1
        }
      }
      System.arraycopy(strip, 0, raw, row0 * stride, want)
      row0 += rows
    }
    val nextIfd = u32(ifdAt + 2 + n * 12)
    if (spp == 3) (w, h, raw, nextIfd)
    else { // grayscale → canonical RGB triples
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < raw.length) {
        rgb(3 * i) = raw(i); rgb(3 * i + 1) = raw(i); rgb(3 * i + 2) = raw(i)
        i += 1
      }
      (w, h, rgb, nextIfd)
    }
  }

  /** TIFF-variant LZW decompress of `len` bytes at `at` into exactly
    * `want` output bytes (MSB-first, early change at 510/1022/2046 —
    * one insert behind the writer, same thresholds). */
  private[graft] def lzwDecode(bytes: Array[Byte], at: Int, len: Int,
      want: Int): Array[Byte] = {
    val Clear = 256; val Eoi = 257
    val Cap = 1 << MaxWidth
    val prefix = new Array[Int](Cap)
    val suffix = new Array[Byte](Cap)
    val stack = new Array[Byte](Cap + 1)
    var i = 0
    while (i < 256) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    val dst = new Array[Byte](want)
    var p = at
    val end = at + len
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    var next = 258
    var prev = -1
    var prevFirst = 0
    var out = 0
    def readCode(): Int = {
      while (bitCnt < width) {
        require(p < end, "TIFF LZW strip ran out before EOI")
        bitBuf = (bitBuf << 8) | (bytes(p) & 0xFFL)
        bitCnt += 8
        p += 1
      }
      val c = ((bitBuf >>> (bitCnt - width)) & ((1 << width) - 1)).toInt
      bitCnt -= width
      c
    }
    var done = false
    while (!done) {
      val code = readCode()
      if (code == Clear) { next = 258; width = 9; prev = -1 }
      else if (code == Eoi) {
        require(out == want, s"TIFF LZW EOI after $out of $want bytes")
        done = true
      } else {
        require(out < want, s"TIFF LZW output past $want bytes")
        require(code < next || (code == next && prev >= 0),
          s"TIFF LZW code $code past table size $next")
        var sp = 0
        var c = code
        if (code == next) { stack(sp) = prevFirst.toByte; sp += 1; c = prev }
        while (c >= 0) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        val first = stack(sp - 1) & 0xFF
        require(out + sp <= want, s"TIFF LZW output ${out + sp} past $want bytes")
        while (sp > 0) { sp -= 1; dst(out) = stack(sp); out += 1 }
        if (prev >= 0 && next < Cap) {
          prefix(next) = prev
          suffix(next) = first.toByte
          next += 1
          // EARLY-CHANGE handshake, reader side: widen when OUR table
          // holds 511/1023/2047 entries — while code 511 is still
          // representable at 9 bits, hence "early". One insert behind
          // the writer's 512/1024/2048 rule = lockstep. Matches the
          // JDK's TIFFLZWDecompressor (`tableIndex == 511`) and
          // libtiff's `free_ent > maxcode - 1`.
          if ((next == 511 || next == 1023 || next == 2047) && width < MaxWidth)
            width += 1
        }
        prev = code
        prevFirst = first
      }
    }
    dst
  }
}
