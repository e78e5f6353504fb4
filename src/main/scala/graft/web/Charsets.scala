package graft.web

import java.nio.charset.Charset

/** Charset detection + decode for crawled HTTP bodies — the step
  * between raw bytes and HTML text that real crawls cannot skip: a
  * third of the web is not UTF-8, headers lie, and pages label
  * themselves inside the very bytes being decoded.
  *
  * Precedence (the WHATWG encoding-sniffing order, trimmed to the
  * deterministic tiers): a byte-order mark is AUTHORITATIVE and beats
  * everything (a UTF-8 BOM under a header claiming latin-1 decodes as
  * UTF-8); else the `charset=` parameter of the Content-Type header;
  * else an ASCII prescan of the first 1024 bytes for `<meta
  * charset=…>` / `<meta http-equiv=… content="…charset=…">` (legal
  * because every supported label is ASCII-compatible in its own
  * encoding); else windows-1252, the HTML5 default for unlabeled
  * content — NOT iso-8859-1: bytes 0x80–0x9F are € “ ” … in cp1252
  * and invisible control chars in latin-1, so the wrong default
  * silently eats real characters. */
object Charsets {

  /** Canonical lowercase label, BOM > header > meta prescan > cp1252. */
  def detect(contentType: Option[String], body: Array[Byte]): String =
    bom(body)
      .orElse(contentType.flatMap(charsetParam))
      .orElse(metaPrescan(body))
      .getOrElse("windows-1252")

  /** Decode with the detected charset, dropping a leading BOM (it is
    * framing, not content). */
  def decode(contentType: Option[String], body: Array[Byte]): (String, String) = {
    val cs   = detect(contentType, body)
    val skip = bomLength(body)
    (cs, new String(body, skip, body.length - skip, Charset.forName(cs)))
  }

  private def bom(b: Array[Byte]): Option[String] =
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte && b(2) == 0xBF.toByte)
      Some("utf-8")
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte) Some("utf-16le")
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) Some("utf-16be")
    else None

  private def bomLength(b: Array[Byte]): Int =
    bom(b) match {
      case Some("utf-8") => 3
      case Some(_)       => 2
      case None          => 0
    }

  /** `charset=` parameter of a Content-Type value (quoted or bare). */
  def charsetParam(contentType: String): Option[String] = {
    val lower = contentType.toLowerCase
    val at    = lower.indexOf("charset")
    if (at < 0) None
    else {
      var i = at + 7
      while (i < lower.length && (lower.charAt(i) == ' ' || lower.charAt(i) == '\t')) i += 1
      if (i >= lower.length || lower.charAt(i) != '=') None
      else {
        i += 1
        while (i < lower.length && (lower.charAt(i) == ' ' || lower.charAt(i) == '\t')) i += 1
        val quoted = i < lower.length && (lower.charAt(i) == '"' || lower.charAt(i) == '\'')
        val q      = if (quoted) lower.charAt(i) else ' '
        if (quoted) i += 1
        val vs = i
        while (i < lower.length &&
               (if (quoted) lower.charAt(i) != q
                else ";, \t".indexOf(lower.charAt(i)) < 0)) i += 1
        canonical(lower.substring(vs, i))
      }
    }
  }

  /** ASCII prescan of the first 1024 bytes for a meta-declared
    * charset: `<meta charset=X>` or the http-equiv form where the
    * label sits inside the content attribute. */
  def metaPrescan(body: Array[Byte]): Option[String] = {
    val n  = math.min(body.length, 1024)
    val sb = new StringBuilder(n)
    var k  = 0
    while (k < n) { sb.append((body(k) & 0xff).toChar); k += 1 }
    val head = sb.toString
    var from = 0
    while (from >= 0) {
      val m = indexOfIgnoreCase(head, "<meta", from)
      if (m < 0) return None
      val end = head.indexOf('>', m)
      val tag = head.substring(m, if (end < 0) head.length else end)
      val cs  = indexOfIgnoreCase(tag, "charset", 0)
      if (cs >= 0) {
        var i = cs + 7
        while (i < tag.length && (tag.charAt(i) == ' ' || tag.charAt(i) == '\t')) i += 1
        if (i < tag.length && tag.charAt(i) == '=') {
          i += 1
          while (i < tag.length && (tag.charAt(i) == ' ' || tag.charAt(i) == '\t')) i += 1
          val quoted = i < tag.length && (tag.charAt(i) == '"' || tag.charAt(i) == '\'')
          val q      = if (quoted) tag.charAt(i) else ' '
          if (quoted) i += 1
          val vs = i
          while (i < tag.length &&
                 (if (quoted) tag.charAt(i) != q
                  else ";\"' \t>".indexOf(tag.charAt(i)) < 0)) i += 1
          val got = canonical(tag.substring(vs, i).toLowerCase)
          if (got.isDefined) return got
        }
      }
      from = if (end < 0) -1 else end + 1
    }
    None
  }

  /** Label → canonical name; unknown/unsupported labels are dropped so
    * the next tier (or the cp1252 default) applies instead of a crash
    * on `Charset.forName` — a crawl survives a typo'd label. */
  private def canonical(label: String): Option[String] = {
    val l = label.trim match {
      case "latin1" | "latin-1" | "l1" | "iso8859-1" | "iso-8859-1" | "iso_8859-1" => "iso-8859-1"
      case "utf8" | "utf-8"                         => "utf-8"
      case "utf-16le" | "utf16le"                   => "utf-16le"
      case "utf-16be" | "utf16be"                   => "utf-16be"
      case "windows-1252" | "cp1252" | "x-cp1252"   => "windows-1252"
      case "us-ascii" | "ascii"                     => "us-ascii"
      case other                                    => other
    }
    if (l.nonEmpty && Charset.isSupported(l)) Some(l) else None
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
}
