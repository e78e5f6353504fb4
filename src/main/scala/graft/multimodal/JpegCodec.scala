package graft.multimodal

/** Pure-JVM baseline JPEG codec — closes the JPEG entry behind the
  * multimodal decode boundary ([[Media.StubCodec]]) the same way
  * [[PngCodec]] closed PNG: a real spec-subset implementation with no
  * native libraries, cross-checked both directions against the JDK's
  * independent ImageIO JPEG plugin (MediaSpec).
  *
  * Decoder coverage (ITU T.81 baseline sequential DCT, the format of
  * essentially every training-corpus photo): SOF0 with 8-bit samples,
  * 1 or 3 components, per-component sampling factors 1 or 2 (4:4:4,
  * 4:2:2, 4:2:0 — the JDK writer's default chroma subsampling decodes
  * here), stream-defined DQT/DHT tables, restart intervals (DRI +
  * RSTn), APPn/COM skipped. Everything else — progressive (SOF2),
  * arithmetic coding, 12-bit, 4-component CMYK — fails loudly: a
  * silent misdecode poisons a corpus, a loud one routes the asset to
  * the quarantine path (the [[PngCodec]] stance).
  *
  * Encoder: grayscale or 4:4:4 YCbCr baseline with the spec's Annex K
  * typical Huffman tables and Annex K quantization tables under the
  * standard quality scaling. The encoder exists for fixtures and the
  * gate; corpus work is decode-side.
  *
  * EXACTNESS SUBSPACE (what the mm_jpeg gate rides): JPEG is lossy in
  * general, but an 8×8-aligned block of CONSTANT sample value v has a
  * DCT of exactly one nonzero coefficient, DC = 8·(v−128); with the
  * DC quantization step q dividing 8·(v−128) (Annex K luma DC step 16
  * at quality 50 ⇒ any EVEN v), quantize→dequantize is the identity
  * and the IDCT reconstructs v exactly. On that subspace the whole
  * entropy/DCT pipeline is bit-exact round-trip — which makes a
  * DuckDB-computable analytic oracle possible for a lossy format.
  *
  * Scale shape: decode is per-row O(pixels) inside mapPartitions — no
  * shuffle, no driver traffic; all tables are parsed per image (no
  * shared mutable state), so the codec is trivially task-parallel.
  */
object JpegCodec {

  // ---------------------------------------------------------- tables
  /** Zigzag scan order: zigzag(k) = raster index of the k-th coeff. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance/chrominance quantization tables (raster order). */
  private val StdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val StdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** The standard quality→scale rule; step clamped to [1, 255]. */
  private def scaledQ(table: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    table.map(t => math.max(1, math.min(255, (t * scale + 50) / 100)))
  }

  // Annex K typical Huffman tables: (bits per code length 1..16, values)
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  // ------------------------------------------------------------- DCT
  private val Cos = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private def cFac(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 8×8 DCT-II of level-shifted samples (direct form — the
    * codec optimizes for clarity; fixtures are small). */
  private def fdct(s: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { acc += s(y * 8 + x) * Cos(x)(u) * Cos(y)(v); x += 1 }
          y += 1
        }
        out(v * 8 + u) = 0.25 * cFac(u) * cFac(v) * acc
        v += 1
      }
      u += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            acc += cFac(u) * cFac(v) * coef(v * 8 + u) * Cos(x)(u) * Cos(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = 0.25 * acc
        x += 1
      }
      y += 1
    }
    out
  }

  // -------------------------------------------------------- encoding
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var nbits = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per spec
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  /** (code, length) per symbol from a (bits, vals) table — canonical. */
  private def codesOf(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val enc = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        enc(vals(k) & 0xFF) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1; len += 1
    }
    enc
  }

  private def magnitude(v: Int): Int = {
    var s = 0; var a = math.abs(v)
    while (a > 0) { s += 1; a >>= 1 }
    s
  }

  private def writeMarker(out: java.io.ByteArrayOutputStream, m: Int,
      payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(m)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xFF)
    out.write(payload, 0, payload.length)
  }

  /** Encode `comps` planes (each w×h samples, already in component
    * space: Y or Y/Cb/Cr) as baseline 4:4:4. */
  private def encodePlanes(w: Int, h: Int, comps: Array[Array[Int]],
      quality: Int, restartInterval: Int = 0): Array[Byte] = {
    val nc = comps.length
    require(nc == 1 || nc == 3, s"1 or 3 components, got $nc")
    val qLuma = scaledQ(StdLumaQ, quality)
    val qChroma = scaledQ(StdChromaQ, quality)
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    out.write(0xFF); out.write(0xD8) // SOI
    writeMarker(out, 0xE0, Array[Byte](                 // JFIF APP0
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqtPayload(id: Int, q: Array[Int]): Array[Byte] =
      (id.toByte +: Zigzag.map(i => q(i).toByte)).toArray
    writeMarker(out, 0xDB, dqtPayload(0, qLuma))
    if (nc == 3) writeMarker(out, 0xDB, dqtPayload(1, qChroma))
    val sofB = new java.io.ByteArrayOutputStream()
    sofB.write(8) // precision
    sofB.write(h >> 8); sofB.write(h & 0xFF)
    sofB.write(w >> 8); sofB.write(w & 0xFF)
    sofB.write(nc)
    var c = 0
    while (c < nc) {
      sofB.write(c + 1)            // component id
      sofB.write(0x11)             // 1×1 sampling (4:4:4)
      sofB.write(if (c == 0) 0 else 1) // quant table id
      c += 1
    }
    writeMarker(out, 0xC0, sofB.toByteArray) // SOF0 baseline
    def dhtPayload(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]) =
      (((cls << 4) | id).toByte +: ((1 to 16).map(l => bits(l).toByte) ++ vals)).toArray
    writeMarker(out, 0xC4, dhtPayload(0, 0, DcLumaBits, DcLumaVals))
    writeMarker(out, 0xC4, dhtPayload(1, 0, AcLumaBits, AcLumaVals))
    if (nc == 3) {
      writeMarker(out, 0xC4, dhtPayload(0, 1, DcChromaBits, DcChromaVals))
      writeMarker(out, 0xC4, dhtPayload(1, 1, AcChromaBits, AcChromaVals))
    }
    if (restartInterval > 0)
      writeMarker(out, 0xDD, Array[Byte](
        (restartInterval >> 8).toByte, (restartInterval & 0xFF).toByte))
    val sosB = new java.io.ByteArrayOutputStream()
    sosB.write(nc)
    c = 0
    while (c < nc) {
      sosB.write(c + 1)
      sosB.write(if (c == 0) 0x00 else 0x11) // DC/AC table ids
      c += 1
    }
    sosB.write(0); sosB.write(63); sosB.write(0) // Ss, Se, Ah/Al
    writeMarker(out, 0xDA, sosB.toByteArray)

    val dcEncL = codesOf(DcLumaBits, DcLumaVals)
    val acEncL = codesOf(AcLumaBits, AcLumaVals)
    val dcEncC = codesOf(DcChromaBits, DcChromaVals)
    val acEncC = codesOf(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)
    val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
    val dcPred = new Array[Int](nc)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align, emit RSTm (m cycles 0–7), reset DC prediction
          bw.flush()
          out.write(0xFF); out.write(0xD0 + ((mcu / restartInterval - 1) % 8))
          java.util.Arrays.fill(dcPred, 0)
        }
        c = 0
        while (c < nc) {
          val plane = comps(c)
          val q = if (c == 0) qLuma else qChroma
          val (dcE, acE) = if (c == 0) (dcEncL, acEncL) else (dcEncC, acEncC)
          // gather the 8×8 block (edge replication), level-shift
          val s = new Array[Double](64)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val px = math.min(w - 1, mx * 8 + x)
              val py = math.min(h - 1, my * 8 + y)
              s(y * 8 + x) = plane(py * w + px) - 128.0
              x += 1
            }
            y += 1
          }
          val coef = fdct(s)
          val zq = new Array[Int](64)
          var k = 0
          while (k < 64) {
            zq(k) = math.round(coef(Zigzag(k)) / q(Zigzag(k))).toInt
            k += 1
          }
          // DC
          val diff = zq(0) - dcPred(c); dcPred(c) = zq(0)
          val sBits = magnitude(diff)
          val (dcCode, dcLen) = dcE(sBits)
          bw.put(dcCode, dcLen)
          if (sBits > 0)
            bw.put(if (diff >= 0) diff else diff + (1 << sBits) - 1, sBits)
          // AC with run-length
          var run = 0
          k = 1
          while (k < 64) {
            if (zq(k) == 0) run += 1
            else {
              while (run >= 16) {
                val (zc, zl) = acE(0xF0); bw.put(zc, zl); run -= 16 // ZRL
              }
              val aBits = magnitude(zq(k))
              val (acCode, acLen) = acE((run << 4) | aBits)
              bw.put(acCode, acLen)
              bw.put(if (zq(k) >= 0) zq(k) else zq(k) + (1 << aBits) - 1, aBits)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acE(0x00); bw.put(ec, el) } // EOB
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode top-down RGB as a baseline 4:4:4 YCbCr JPEG. */
  def encode(w: Int, h: Int, rgb: Array[Byte], quality: Int = 50): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"need $w*$h*3 RGB bytes, got ${rgb.length}")
    val yP = new Array[Int](w * h)
    val cbP = new Array[Int](w * h)
    val crP = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = rgb(3 * i) & 0xFF; val g = rgb(3 * i + 1) & 0xFF; val b = rgb(3 * i + 2) & 0xFF
      yP(i) = clamp8(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
      cbP(i) = clamp8(math.round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt)
      crP(i) = clamp8(math.round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt)
      i += 1
    }
    encodePlanes(w, h, Array(yP, cbP, crP), quality)
  }

  /** Encode a grayscale plane (w×h bytes) as a 1-component JPEG — the
    * subsampling-free path the exact gate and cross-checks ride.
    * `restartInterval` > 0 emits DRI + RSTn markers every that many
    * MCUs (the error-resilience layout long scans use; exercised by
    * JpegSpec against both decoders). */
  def encodeGray(w: Int, h: Int, gray: Array[Byte], quality: Int = 50,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      s"need $w*$h gray bytes, got ${gray.length}")
    encodePlanes(w, h, Array(gray.map(_ & 0xFF)), quality, restartInterval)
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // -------------------------------------------------------- decoding
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0; private var nbits = 0
    /** Align to a byte boundary and consume an expected RST marker. */
    def restart(): Unit = {
      acc = 0; nbits = 0
      require(pos + 1 < bytes.length && (bytes(pos) & 0xFF) == 0xFF &&
        ((bytes(pos + 1) & 0xF8) == 0xD0), "expected RST marker")
      pos += 2
    }
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "entropy stream truncated")
        var b = bytes(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          require(pos < bytes.length, "entropy stream truncated at FF")
          val m = bytes(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed byte
          else { // marker inside scan: treat as end-of-data padding
            pos -= 1; b = 0xFF
          }
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** Canonical Huffman decoding tables (spec F.2.2.3 mincode/maxcode). */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17); val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k; minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = code - 1
        code <<= 1; l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit(); var l = 1
      while (l <= 16 && (bits(l) == 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit(); l += 1
      }
      require(l <= 16, "invalid Huffman code")
      vals(valPtr(l) + code - minCode(l)) & 0xFF
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline JPEG to (width, height, top-down RGB). A
    * grayscale stream yields r=g=b. Unsupported flavors raise. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length > 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8, "not a JPEG payload (no SOI)")
    var pos = 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = 0; var h = 0
    // per component: (id, hSamp, vSamp, qId); scan adds (dcId, acId)
    var compIds: Array[Int] = null
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    def u16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
    var sosAt = -1
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    while (sosAt < 0) {
      require(pos + 3 < bytes.length, "truncated before SOS")
      require((bytes(pos) & 0xFF) == 0xFF, f"marker expected at $pos")
      val m = bytes(pos + 1) & 0xFF
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) { pos += 2 }
      else {
        val len = u16(pos + 2)
        val seg = pos + 4
        m match {
          case 0xC0 | 0xC1 => // baseline (C1 = extended sequential, same wire)
            require((bytes(seg) & 0xFF) == 8, "only 8-bit samples supported")
            h = u16(seg + 1); w = u16(seg + 3)
            val nc = bytes(seg + 5) & 0xFF
            require(nc == 1 || nc == 3,
              s"only 1- or 3-component images supported, got $nc")
            compIds = new Array[Int](nc); compH = new Array[Int](nc)
            compV = new Array[Int](nc); compQ = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              compIds(c) = bytes(seg + 6 + 3 * c) & 0xFF
              val sf = bytes(seg + 7 + 3 * c) & 0xFF
              compH(c) = sf >> 4; compV(c) = sf & 0x0F
              require(compH(c) >= 1 && compH(c) <= 2 && compV(c) >= 1 && compV(c) <= 2,
                s"sampling factors 1–2 supported, got ${compH(c)}x${compV(c)}")
              compQ(c) = bytes(seg + 8 + 3 * c) & 0xFF
              c += 1
            }
          case 0xC2 => sys.error("progressive JPEG (SOF2) not supported — quarantine")
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            sys.error(f"unsupported SOF marker FF$m%02X — quarantine")
          case 0xDB => // DQT: one or more tables in the segment
            var p = seg
            while (p < pos + 2 + len) {
              val pq = (bytes(p) & 0xFF) >> 4; val tq = bytes(p) & 0x0F
              require(pq == 0, "16-bit quant tables not supported")
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = bytes(p + 1 + k) & 0xFF; k += 1 }
              qTables(tq) = t
              p += 65
            }
          case 0xC4 => // DHT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val tc = (bytes(p) & 0xFF) >> 4; val th = bytes(p) & 0x0F
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = bytes(p + l) & 0xFF; total += bits(l); l += 1 }
              val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
              val tab = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = tab else acTables(th) = tab
              p += 17 + total
            }
          case 0xDD => restartInterval = u16(seg)
          case 0xDA => // SOS
            val ns = bytes(seg) & 0xFF
            require(compIds != null && ns == compIds.length,
              "single interleaved scan expected (progressive/multi-scan unsupported)")
            compDc = new Array[Int](ns); compAc = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cid = bytes(seg + 1 + 2 * c) & 0xFF
              val idx = compIds.indexOf(cid)
              require(idx >= 0, s"SOS references unknown component $cid")
              require(idx == c, "SOS component order must match SOF")
              compDc(c) = (bytes(seg + 2 + 2 * c) & 0xFF) >> 4
              compAc(c) = bytes(seg + 2 + 2 * c) & 0x0F
              c += 1
            }
            sosAt = pos + 2 + len
          case 0xD9 => sys.error("EOI before SOS — no image data")
          case _ => () // APPn, COM, others: skip
        }
        if (sosAt < 0) pos = pos + 2 + len
      }
    }
    require(w > 0 && h > 0, "no SOF before SOS")
    val nc = compIds.length
    val hMax = compH.max; val vMax = compV.max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW; val mcusY = (h + mcuH - 1) / mcuH
    // component planes at their own resolution (MCU-padded)
    val planeW = Array.tabulate(nc)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nc)(c => mcusY * compV(c) * 8)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * planeH(c)))
    val br = new BitReader(bytes, sosAt)
    val dcPred = new Array[Int](nc)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(); java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < nc) {
          val q = qTables(compQ(c))
          require(q != null, s"missing quant table ${compQ(c)}")
          val dcT = dcTables(compDc(c)); val acT = acTables(compAc(c))
          require(dcT != null && acT != null, "missing Huffman table")
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              val coef = new Array[Double](64)
              val sBits = dcT.decode(br)
              dcPred(c) += extend(br.bits(sBits), sBits)
              coef(0) = dcPred(c).toDouble * q(0)
              var k = 1
              while (k < 64) {
                val rs = acT.decode(br)
                val run = rs >> 4; val size = rs & 0x0F
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64            // EOB
                } else {
                  k += run
                  require(k < 64, "AC run past block end")
                  coef(Zigzag(k)) = extend(br.bits(size), size).toDouble * q(Zigzag(k))
                  k += 1
                }
              }
              val px = idct(coef)
              val ox = (mx * compH(c) + bx) * 8; val oy = (my * compV(c) + by) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  planes(c)((oy + y) * planeW(c) + ox + x) =
                    clamp8(math.round(px(y * 8 + x) + 128.0).toInt)
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // upsample (pixel replication) + color convert, crop to (w, h)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (nc == 1) {
          val v = planes(0)(y * planeW(0) + x).toByte
          rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
        } else {
          def samp(c: Int): Int = {
            val sx = x * compH(c) / hMax; val sy = y * compV(c) / vMax
            planes(c)(sy * planeW(c) + sx)
          }
          val yy = samp(0); val cb = samp(1) - 128; val cr = samp(2) - 128
          rgb(o) = clamp8(math.round(yy + 1.402 * cr).toInt).toByte
          rgb(o + 1) = clamp8(math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt).toByte
          rgb(o + 2) = clamp8(math.round(yy + 1.772 * cb).toInt).toByte
        }
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }
}
