package graft.web

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** One ISO 28500 WARC record: named headers + an opaque payload whose
  * length is governed ONLY by `Content-Length` (payloads may contain
  * anything, including the record-separator byte sequence). */
case class WarcRecord(headers: Map[String, String], payload: Array[Byte]) {
  def warcType: String  = headers.getOrElse("WARC-Type", "")
  def targetUri: String = headers.getOrElse("WARC-Target-URI", "")
}

/** Pure-JVM WARC (ISO 28500 / WARC 1.0) writer + parser in the
  * Common-Crawl layout: each record is its OWN gzip member and a file
  * is the concatenation of members, so a cluster can random-access
  * records from member offsets without decompressing the whole file.
  *
  * Reference intent: the engine's whole-file ingestion contract
  * (6.5840/src/mr/worker.go:64-118 reads crawl shards as opaque whole
  * files); this codec is the web-crawl front end a training-data
  * pipeline puts in front of that contract.
  *
  * Scale note: parse is record-streaming over one file's bytes — the
  * per-task unit is a WARC file (Common Crawl caps them ~1 GB), state
  * is O(1 record). No cross-file or cross-record coordination.
  */
object WarcCodec {
  private val Crlf = "\r\n".getBytes(UTF_8)

  /** One record, uncompressed: version line, sorted headers with a
    * computed (never caller-supplied) Content-Length, blank line,
    * payload, and the two mandatory trailing CRLFs. */
  def recordBytes(r: WarcRecord): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    (r.headers - "Content-Length").toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(r.payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out  = new ByteArrayOutputStream(head.length + r.payload.length + 4)
    out.write(head); out.write(r.payload); out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** A WARC file: one gzip member per record, members concatenated.
    * The gzip framing is written by hand around ONE reused `Deflater`
    * — a per-record `GZIPOutputStream` would allocate fresh native
    * zlib state per record, which at a million records per task is the
    * dominant cost, not the compression itself. */
  def writeGz(records: Iterator[WarcRecord]): Array[Byte] =
    writeGzIndexed(records)._1

  /** [[writeGz]] plus the CDX-style member index: (offset, length) of
    * each record's gzip member within the file. The index is WHY the
    * layout exists — a reader fetches ONE record from a 1 GB shard by
    * byte range (an object-store ranged GET) and decompresses just
    * that member; nothing upstream of the offset is read. */
  def writeGzIndexed(records: Iterator[WarcRecord]): (Array[Byte], Seq[(Long, Long)]) = {
    val out  = new ByteArrayOutputStream()
    val idx  = Seq.newBuilder[(Long, Long)]
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    val crc  = new java.util.zip.CRC32
    val buf  = new Array[Byte](1 << 16)
    try {
      records.foreach { r =>
        val at   = out.size().toLong
        val data = recordBytes(r)
        out.write(GzHeader)
        defl.reset(); defl.setInput(data); defl.finish()
        while (!defl.finished()) { val n = defl.deflate(buf); out.write(buf, 0, n) }
        crc.reset(); crc.update(data)
        writeIntLE(out, crc.getValue.toInt); writeIntLE(out, data.length)
        idx += ((at, out.size() - at))
      }
    } finally defl.end()
    (out.toByteArray, idx.result())
  }

  def readGz(bytes: Array[Byte]): Seq[WarcRecord] = read(gunzipAll(bytes))

  // CM=8 (deflate), FLG=0, MTIME=0, XFL=0, OS=255 (unknown)
  private val GzHeader = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)

  private def writeIntLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** Decompress a multi-member gzip stream with an EXPLICIT member
    * walk: one reused `Inflater`, per-member CRC32 + ISIZE verified,
    * loud failure on a malformed header or trailing garbage. The
    * JDK's `GZIPInputStream` is NOT used on purpose — on concatenated
    * streams it stops silently at the first malformed member header,
    * which for a crawl shard is silent data loss; here a corrupt
    * member boundary is an error, never a short read. Handles the
    * optional FEXTRA/FNAME/FCOMMENT/FHCRC fields real-world warc.gz
    * writers emit. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out  = new ByteArrayOutputStream(math.max(64, bytes.length * 3))
    val infl = new java.util.zip.Inflater(true)
    val crc  = new java.util.zip.CRC32
    val buf  = new Array[Byte](1 << 16)
    var pos  = 0
    try {
      while (pos < bytes.length) {
        pos = skipGzHeader(bytes, pos)
        infl.reset(); crc.reset()
        infl.setInput(bytes, pos, bytes.length - pos)
        var memberLen = 0L
        while (!infl.finished()) {
          val n = infl.inflate(buf)
          require(n > 0 || !infl.needsInput, s"truncated gzip member at offset $pos")
          if (n > 0) { out.write(buf, 0, n); crc.update(buf, 0, n); memberLen += n }
        }
        pos += infl.getBytesRead.toInt
        require(pos + 8 <= bytes.length, s"gzip member at $pos missing trailer")
        val gotCrc  = readIntLE(bytes, pos)
        val gotSize = readIntLE(bytes, pos + 4)
        require(gotCrc == crc.getValue.toInt, s"gzip CRC mismatch at offset $pos")
        require(gotSize == memberLen.toInt, s"gzip ISIZE mismatch at offset $pos")
        pos += 8
      }
    } finally infl.end()
    out.toByteArray
  }

  private def readIntLE(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
      ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)

  /** Validate a gzip member header at `at`; return the offset of the
    * deflate stream (past any optional FEXTRA/FNAME/FCOMMENT/FHCRC). */
  private def skipGzHeader(b: Array[Byte], at: Int): Int = {
    require(at + 10 <= b.length && (b(at) & 0xff) == 0x1f && (b(at + 1) & 0xff) == 0x8b,
      s"not a gzip member at offset $at")
    require(b(at + 2) == 8, s"unsupported gzip compression method at offset $at")
    val flg = b(at + 3) & 0xff
    var p   = at + 10
    if ((flg & 0x04) != 0) { // FEXTRA: 2-byte LE length + payload
      val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8); p += 2 + xlen
    }
    if ((flg & 0x08) != 0) { while (b(p) != 0) p += 1; p += 1 } // FNAME, NUL-terminated
    if ((flg & 0x10) != 0) { while (b(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 0x02) != 0) p += 2                               // FHCRC
    require(p <= b.length, s"truncated gzip header at offset $at")
    p
  }

  /** Parse concatenated uncompressed records. Fails loudly on any
    * grammar violation (bad version line, malformed header, truncated
    * payload, missing trailer) — a silent partial read of a crawl
    * shard is data loss. */
  def read(bytes: Array[Byte]): Seq[WarcRecord] = {
    val recs = Seq.newBuilder[WarcRecord]
    var pos  = 0
    while (pos < bytes.length) {
      val (ver, p1) = line(bytes, pos)
      require(ver.startsWith("WARC/"), s"not a WARC record at offset $pos: '$ver'")
      var p       = p1
      var headers = Map.empty[String, String]
      var blank   = false
      while (!blank) {
        val (l, np) = line(bytes, p); p = np
        if (l.isEmpty) blank = true
        else {
          val i = l.indexOf(':')
          require(i > 0, s"malformed WARC header '$l'")
          headers += (l.substring(0, i).trim -> l.substring(i + 1).trim)
        }
      }
      val len = headers.getOrElse("Content-Length",
        sys.error("WARC record missing Content-Length")).toInt
      require(len >= 0 && p + len <= bytes.length, s"truncated WARC payload at $p")
      val payload = java.util.Arrays.copyOfRange(bytes, p, p + len)
      p += len
      var k = 0
      while (k < 2) {
        val (bl, np) = line(bytes, p)
        require(bl.isEmpty, s"missing WARC record trailer at $p")
        p = np; k += 1
      }
      recs += WarcRecord(headers, payload)
      pos = p
    }
    recs.result()
  }

  private def line(bytes: Array[Byte], from: Int): (String, Int) = {
    var i = from
    while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
    require(i + 1 < bytes.length, s"missing CRLF after offset $from")
    (new String(bytes, from, i - from, UTF_8), i + 2)
  }
}

/** Minimal HTTP/1.1 message framing for WARC `response` payloads:
  * status line + headers + Content-Length-delimited body. */
object HttpMessage {
  def response(status: Int, reason: String, headers: Seq[(String, String)],
               body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(status).append(' ').append(reason).append("\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(body.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out  = new ByteArrayOutputStream(head.length + body.length)
    out.write(head); out.write(body)
    out.toByteArray
  }

  /** → (status, headers, body). Body length comes from Content-Length
    * when present, else the remainder of the message. Header names are
    * lowercased on insert (HTTP field names are case-insensitive,
    * RFC 9110 §5.1 — real WARC payloads carry `content-length`).
    *
    * @note the returned Map's KEYS ARE LOWERCASE — look headers up as
    *       `headers.get("content-type")`, never `"Content-Type"` (a
    *       mixed-case key silently misses and, for content-length,
    *       silently falls back to remainder-of-message body length).
    *       This is the contract since r11; earlier versions returned
    *       names verbatim as sent. */
  def parseResponse(bytes: Array[Byte]): (Int, Map[String, String], Array[Byte]) = {
    var i = 0
    def nextLine(): String = {
      val start = i
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      require(i + 1 < bytes.length, "missing CRLF in HTTP head")
      val s = new String(bytes, start, i - start, UTF_8); i += 2; s
    }
    val statusLine = nextLine()
    require(statusLine.startsWith("HTTP/"), s"not an HTTP response: '$statusLine'")
    val parts  = statusLine.split(" ", 3)
    val status = parts(1).toInt
    var headers = Map.empty[String, String]
    var l = nextLine()
    while (l.nonEmpty) {
      val c = l.indexOf(':')
      require(c > 0, s"malformed HTTP header '$l'")
      headers += (l.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        -> l.substring(c + 1).trim)
      l = nextLine()
    }
    val len  = headers.get("content-length").map(_.toInt).getOrElse(bytes.length - i)
    require(i + len <= bytes.length, "truncated HTTP body")
    (status, headers, java.util.Arrays.copyOfRange(bytes, i, i + len))
  }
}

/** HTML → text content extraction, the C4/CCNet front-end step: a
  * single-pass tokenizer that drops `head`/`script`/`style` subtrees
  * (raw-text semantics: the FIRST `</name` closes, exactly the HTML5
  * rule), strips comments and tags (quote-aware, so `>` inside a
  * quoted attribute value does not end the tag), decodes character
  * references (named, decimal, hex; unknown ones left verbatim per
  * HTML5 leniency), inserts a separator at block-tag boundaries, and
  * collapses whitespace runs. Pure function of the markup — one call
  * per document inside `mapPartitions`, no state across documents. */
object HtmlText {
  private val RawText = Set("script", "style", "head", "title", "textarea")
  private val Block = Set("p", "div", "br", "hr", "li", "ul", "ol", "tr", "td", "th",
    "table", "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "blockquote", "pre", "nav", "aside", "figure", "figcaption")
  private val Named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  def extract(html: String): String = {
    val n  = html.length
    val sb = new StringBuilder(n)
    var i  = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val close     = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (close) i + 2 else i + 1
          val name      = tagName(html, nameStart)
          val afterTag  = skipTag(html, i)
          if (!close && RawText(name)) {
            val e = indexOfIgnoreCase(html, "</" + name, afterTag)
            i = if (e < 0) n else skipTag(html, e)
            if (Block(name)) sb.append(' ')
          } else {
            if (Block(name)) sb.append(' ')
            i = afterTag
          }
        }
      } else if (c == '&') {
        val (s, ni) = charRef(html, i)
        sb.append(s); i = ni
      } else { sb.append(c); i += 1 }
    }
    normalizeWs(sb.toString)
  }

  /** Extract the `href` of every `<a>` tag, in document order, with
    * the same structural rules as [[extract]]: comments and raw-text
    * subtrees (script/style/…) are skipped — an anchor inside a
    * comment or a `document.write` string is not a link — and
    * character references in attribute values are decoded (HTML
    * serializes `&` in a URL as `&amp;`). Attribute grammar: double-
    * quoted, single-quoted, and unquoted values; anchors without an
    * href (`<a name=…>`) yield nothing. */
  def links(html: String): Seq[String] = linksWithText(html).map(_._1)

  /** [[links]] plus each anchor's INNER TEXT (the classic relevance /
    * weak-label signal: what the linking page calls the target),
    * extracted with the full [[extract]] rules over the anchor's
    * subtree — inline tags flattened, entities decoded, whitespace
    * normalized. HTML forbids nested `<a>`, so the element ends at
    * the next `</a>` (or at end-of-input for an unclosed anchor). */
  def linksWithText(html: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    val n   = html.length
    var i   = 0
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val close     = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (close) i + 2 else i + 1
          val name      = tagName(html, nameStart)
          if (!close && name == "a") {
            val (attrs, end) = tagAttrs(html, nameStart + name.length)
            val closeAt      = indexOfIgnoreCase(html, "</a", end)
            val bodyEnd      = if (closeAt < 0) n else closeAt
            attrs.get("href").filter(_.nonEmpty).foreach { href =>
              out += href -> extract(html.substring(end, bodyEnd))
            }
            i = if (closeAt < 0) n else skipTag(html, closeAt)
          } else {
            val afterTag = skipTag(html, i)
            i = if (!close && RawText(name)) {
              val e = indexOfIgnoreCase(html, "</" + name, afterTag)
              if (e < 0) n else skipTag(html, e)
            } else afterTag
          }
        }
      } else i += 1
    }
    out.result()
  }

  /** One text block between block-level tag boundaries: its
    * whitespace-normalized text, plus RAW appended char counts (total
    * and inside-anchor) for the link-density signal. */
  final case class TextBlock(text: String, chars: Int, anchorChars: Int)

  /** Segment the document into text blocks at block-level tag
    * boundaries (p/div/li/h1…), tracking per block how many appended
    * characters sat inside `<a>` elements. Same structural rules as
    * [[extract]] (comments and rawtext subtrees skipped, character
    * references decoded). Empty blocks are not emitted. */
  def blocks(html: String): Seq[TextBlock] = {
    val out = Seq.newBuilder[TextBlock]
    val sb  = new StringBuilder
    var raw = 0
    var anc = 0
    var anchorDepth = 0
    def flush(): Unit = {
      val t = normalizeWs(sb.toString)
      if (t.nonEmpty) out += TextBlock(t, raw, anc)
      sb.setLength(0); raw = 0; anc = 0
    }
    def put(s: String): Unit = {
      sb.append(s); raw += s.length
      if (anchorDepth > 0) anc += s.length
    }
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val close     = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (close) i + 2 else i + 1
          val name      = tagName(html, nameStart)
          val afterTag  = skipTag(html, i)
          if (!close && RawText(name)) {
            val e = indexOfIgnoreCase(html, "</" + name, afterTag)
            i = if (e < 0) n else skipTag(html, e)
            if (Block(name)) flush()
          } else {
            if (Block(name)) flush()
            if (name == "a") anchorDepth = if (close) math.max(0, anchorDepth - 1) else anchorDepth + 1
            i = afterTag
          }
        }
      } else if (c == '&') {
        val (s, ni) = charRef(html, i)
        put(s); i = ni
      } else { put(c.toString); i += 1 }
    }
    flush()
    out.result()
  }

  /** Main-content extraction: drop boilerplate blocks — too short
    * (< `minChars` normalized chars: nav crumbs, copyright lines) or
    * link-dominated (more than half the raw chars inside anchors:
    * menus, footers, related-links boxes). The kept blocks join in
    * document order. The thresholds are the classic link-density
    * heuristic (jusText/readability family), deterministic on
    * purpose so the oracle can replay the verdicts. */
  def mainText(html: String, minChars: Int = 20): String =
    blocks(html)
      .filter(b => b.text.length >= minChars && b.anchorChars * 2 <= b.chars)
      .map(_.text).mkString(" ")

  /** Parse `name[=value]` attributes from `from` to the tag's `>`;
    * returns (lowercased-name → decoded value, index past `>`). */
  private def tagAttrs(s: String, from: Int): (Map[String, String], Int) = {
    val attrs = Map.newBuilder[String, String]
    var i = from
    val n = s.length
    while (i < n && s.charAt(i) != '>') {
      while (i < n && (Character.isWhitespace(s.charAt(i)) || s.charAt(i) == '/')) i += 1
      if (i < n && s.charAt(i) != '>') {
        val ns = i
        while (i < n && !Character.isWhitespace(s.charAt(i)) &&
               s.charAt(i) != '=' && s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
        val name = s.substring(ns, i).toLowerCase
        while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
          val value =
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i); i += 1
              val vs = i
              while (i < n && s.charAt(i) != q) i += 1
              val v = s.substring(vs, i)
              if (i < n) i += 1 // past closing quote
              v
            } else {
              val vs = i
              while (i < n && !Character.isWhitespace(s.charAt(i)) && s.charAt(i) != '>') i += 1
              s.substring(vs, i)
            }
          if (name.nonEmpty) attrs += name -> decodeRefs(value)
        } else if (name.nonEmpty) attrs += name -> ""
      }
    }
    (attrs.result(), math.min(i + 1, n))
  }

  /** Decode character references in an attribute value. */
  private def decodeRefs(v: String): String =
    if (v.indexOf('&') < 0) v
    else {
      val sb = new StringBuilder(v.length)
      var i  = 0
      while (i < v.length) {
        if (v.charAt(i) == '&') { val (s, ni) = charRef(v, i); sb.append(s); i = ni }
        else { sb.append(v.charAt(i)); i += 1 }
      }
      sb.toString
    }

  private def tagName(s: String, from: Int): String = {
    var k = from
    while (k < s.length && (s.charAt(k).isLetterOrDigit)) k += 1
    s.substring(from, k).toLowerCase
  }

  /** Index just past the tag's `>`, honoring quoted attribute values. */
  private def skipTag(s: String, lt: Int): Int = {
    var i = lt + 1
    var q = '\u0000'
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != '\u0000') { if (c == q) q = '\u0000' }
      else if (c == '"' || c == '\'') q = c
      else if (c == '>') return i + 1
      i += 1
    }
    s.length
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val nl = needle.length
    var i  = math.max(0, from)
    while (i + nl <= s.length) {
      if (s.regionMatches(true, i, needle, 0, nl)) return i
      i += 1
    }
    -1
  }

  /** Decode one character reference starting at `&`; returns the
    * replacement and the index to resume at. Malformed/unknown refs
    * emit the `&` verbatim and resume one char later (HTML5 leniency). */
  private def charRef(s: String, amp: Int): (String, Int) = {
    val semi = s.indexOf(';', amp + 1)
    if (semi < 0 || semi - amp > 12) ("&", amp + 1)
    else {
      val body = s.substring(amp + 1, semi)
      def numeric(txt: String, radix: Int): (String, Int) =
        try {
          val cp = Integer.parseInt(txt, radix)
          // surrogate code points (isValidCodePoint passes them) would
          // emit lone surrogates — malformed UTF-16; HTML5 maps them to
          // U+FFFD, and the amp-verbatim fallback matches this file's
          // malformed-ref stance
          if (Character.isValidCodePoint(cp) && cp > 0 &&
              !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
            (new String(Character.toChars(cp)), semi + 1)
          else ("&", amp + 1)
        } catch { case _: NumberFormatException => ("&", amp + 1) }
      if (body.startsWith("#x") || body.startsWith("#X")) numeric(body.substring(2), 16)
      else if (body.startsWith("#")) numeric(body.substring(1), 10)
      else Named.get(body.toLowerCase) match {
        case Some(v) => (v, semi + 1)
        case None    => ("&", amp + 1)
      }
    }
  }

  private def normalizeWs(s: String): String = {
    val sb   = new StringBuilder(s.length)
    var i    = 0
    var inWs = true // leading ws dropped
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (!inWs) sb.append(' '); inWs = true }
      else { sb.append(c); inWs = false }
      i += 1
    }
    if (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    sb.toString
  }
}
