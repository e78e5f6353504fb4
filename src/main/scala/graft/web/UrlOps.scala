package graft.web

/** URL parsing + registrable-domain (eTLD+1) extraction — the crawl
  * bookkeeping every corpus pipeline needs (URL-level dedup keys,
  * per-domain caps, domain mixing stats all key on eTLD+1, not host:
  * `a.blogspot.example` and `b.blogspot.example` are different
  * publishers even though they share a "domain").
  *
  * [[parse]] is a hand-rolled RFC-3986-shaped splitter (scheme,
  * userinfo, host incl. `[IPv6]`, port, path, query, fragment) — a
  * pure function usable inside codegen'd `mapPartitions` with zero
  * allocation beyond the result. [[publicSuffix]] implements the real
  * Public Suffix List algorithm over an embedded rule set: normal
  * rules, `*.` wildcard rules, `!` exception rules; exception beats
  * wildcard, else longest match, else the implicit `*` default. The
  * rule list here is a small embedded snapshot — at production scale
  * the full PSL is a ~10k-entry broadcast map, same algorithm.
  */
object UrlOps {

  case class Parsed(scheme: String, userinfo: String, host: String, port: Int,
                    path: String, query: String, fragment: String)

  /** Split `scheme://[userinfo@]host[:port][/path][?query][#fragment]`.
    * Host is lowercased (DNS is case-insensitive); path/query/fragment
    * are preserved verbatim. Fails loudly on a missing scheme. */
  def parse(url: String): Parsed = {
    val ci = url.indexOf("://")
    require(ci > 0, s"URL has no scheme: '$url'")
    val scheme = url.substring(0, ci).toLowerCase
    val start  = ci + 3
    val hashI   = url.indexOf('#', start)
    val fragment = if (hashI < 0) "" else url.substring(hashI + 1)
    val preFrag  = if (hashI < 0) url.length else hashI
    val qRaw     = url.indexOf('?', start)
    val qI       = if (qRaw >= 0 && qRaw < preFrag) qRaw else -1
    val query    = if (qI < 0) "" else url.substring(qI + 1, preFrag)
    val pathEnd  = if (qI >= 0) qI else preFrag
    val sRaw     = url.indexOf('/', start)
    val slashI   = if (sRaw >= 0 && sRaw < pathEnd) sRaw else -1
    val path     = if (slashI < 0) "" else url.substring(slashI, pathEnd)
    val authEnd  = if (slashI >= 0) slashI else pathEnd
    var auth     = url.substring(start, authEnd)
    val at       = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at) else ""
    if (at >= 0) auth = auth.substring(at + 1)
    val (host, port) =
      if (auth.startsWith("[")) { // IPv6 literal: [::1]:8080
        val e = auth.indexOf(']')
        require(e > 0, s"unterminated IPv6 literal in '$url'")
        val rest = auth.substring(e + 1)
        (auth.substring(1, e), if (rest.startsWith(":")) rest.substring(1).toInt else -1)
      } else {
        val c = auth.lastIndexOf(':')
        if (c < 0) (auth, -1) else (auth.substring(0, c), auth.substring(c + 1).toInt)
      }
    Parsed(scheme, userinfo, host.toLowerCase, port, path, query, fragment)
  }

  /** Embedded PSL snapshot: enough shape diversity to exercise every
    * rule kind (plain, multi-label, wildcard, exception). */
  val SuffixRules: Seq[String] = Seq(
    "com", "org", "net", "io", "uk", "co.uk", "org.uk", "au", "gov.au",
    "github.io", "example", "s3.example",
    "jp", "kobe.jp", "*.kobe.jp", "!city.kobe.jp")

  private val parsedRules: Seq[(Boolean, Array[String])] =
    SuffixRules.map { r =>
      val exc = r.startsWith("!")
      (exc, (if (exc) r.substring(1) else r).split('.'))
    }

  /** The PSL algorithm: an exception rule wins outright (its suffix is
    * the rule minus its leftmost label); otherwise the longest
    * matching rule; otherwise the implicit `*` default (last label). */
  def publicSuffix(host: String): String = {
    val labels = host.split('.')
    var best   = 0
    parsedRules.foreach { case (exc, rl) =>
      if (rl.length <= labels.length) {
        val tail = labels.length - rl.length
        var ok   = true
        var k    = 0
        while (ok && k < rl.length) {
          ok = rl(k) == "*" || rl(k) == labels(tail + k); k += 1
        }
        if (ok) {
          if (exc) return labels.takeRight(rl.length - 1).mkString(".")
          if (rl.length > best) best = rl.length
        }
      }
    }
    labels.takeRight(math.max(best, 1)).mkString(".")
  }

  /** Registrable domain: one label more than the public suffix; empty
    * when the host IS a public suffix (not registrable). */
  def etld1(host: String): String = {
    val ps = publicSuffix(host)
    if (host == ps) ""
    else {
      val labels = host.split('.')
      labels.takeRight(ps.count(_ == '.') + 2).mkString(".")
    }
  }

  /** Host minus its registrable domain ("" when none). */
  def subdomain(host: String): String = {
    val e1 = etld1(host)
    if (e1.isEmpty || host == e1) "" else host.substring(0, host.length - e1.length - 1)
  }

  /** A URI *reference* (RFC 3986 §4.1): any component may be absent,
    * and absent ≠ empty (`?` with nothing after it is a DEFINED empty
    * query — it replaces the base query; no `?` at all keeps it). */
  case class Ref(scheme: Option[String], authority: Option[String], path: String,
                 query: Option[String], fragment: Option[String])

  /** Split a URI reference without resolving it. Unlike [[parse]] this
    * accepts relative references (no scheme, no authority). */
  def splitRef(ref: String): Ref = {
    var s = ref
    val hashI = s.indexOf('#')
    val fragment = if (hashI < 0) None else Some(s.substring(hashI + 1))
    if (hashI >= 0) s = s.substring(0, hashI)
    val qI = s.indexOf('?')
    val query = if (qI < 0) None else Some(s.substring(qI + 1))
    if (qI >= 0) s = s.substring(0, qI)
    // scheme: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) ":" — only if
    // the ':' precedes any '/' (a ':' inside a path segment is data)
    val cI = s.indexOf(':')
    val scheme =
      if (cI > 0 && (s.indexOf('/') < 0 || cI < s.indexOf('/')) &&
          s.charAt(0).isLetter &&
          (1 until cI).forall { k =>
            val c = s.charAt(k); c.isLetterOrDigit || c == '+' || c == '-' || c == '.' })
        Some(s.substring(0, cI).toLowerCase)
      else None
    if (scheme.isDefined) s = s.substring(cI + 1)
    val (authority, path) =
      if (s.startsWith("//")) {
        val e = s.indexWhere(c => c == '/', 2)
        if (e < 0) (Some(s.substring(2)), "") else (Some(s.substring(2, e)), s.substring(e))
      } else (None, s)
    Ref(scheme, authority, path, query, fragment)
  }

  /** RFC 3986 §5.2.4 `remove_dot_segments` — the exact string-buffer
    * algorithm from the spec (segment-list shortcuts get the
    * trailing-slash cases wrong; the spec's own walk does not). */
  def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in  = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val lastSlash = out.lastIndexOf("/")
        out.setLength(math.max(lastSlash, 0))
      }
      else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', from)
        val end  = if (next < 0) in.length else next
        out.append(in.substring(0, end)); in = in.substring(end)
      }
    }
    out.toString
  }

  /** RFC 3986 §5.2.2 strict reference resolution: resolve `ref`
    * against absolute `baseUrl` and recompose (§5.3). Passes the
    * spec's own §5.4 normal AND abnormal example tables (WebSpec).
    * The crawl-frontier primitive: every href on a page goes through
    * this before it can be fetched, deduped, or counted. */
  def resolve(baseUrl: String, ref: String): String = {
    val b = parse(baseUrl)
    val baseAuth = (if (b.userinfo.nonEmpty) b.userinfo + "@" else "") + b.host +
      (if (b.port >= 0) ":" + b.port else "")
    val r = splitRef(ref)
    val (scheme, auth, path, query) = r.scheme match {
      case Some(sc) => (sc, r.authority, removeDotSegments(r.path), r.query)
      case None => r.authority match {
        case Some(a) => (b.scheme, Some(a), removeDotSegments(r.path), r.query)
        case None =>
          if (r.path.isEmpty) {
            val hI = baseUrl.indexOf('#'); val qI = baseUrl.indexOf('?')
            val baseHasQuery = qI >= 0 && (hI < 0 || qI < hI)
            (b.scheme, Some(baseAuth), b.path,
              if (r.query.isDefined) r.query else Some(b.query).filter(_ => baseHasQuery))
          }
          else if (r.path.startsWith("/"))
            (b.scheme, Some(baseAuth), removeDotSegments(r.path), r.query)
          else {
            // §5.2.3 merge: base-with-authority-and-empty-path → "/"+ref,
            // else base path up to its last "/"
            val merged =
              if (b.path.isEmpty) "/" + r.path
              else b.path.substring(0, b.path.lastIndexOf('/') + 1) + r.path
            (b.scheme, Some(baseAuth), removeDotSegments(merged), r.query)
          }
      }
    }
    val sb = new StringBuilder(scheme).append(':')
    auth.foreach(a => sb.append("//").append(a))
    sb.append(path)
    query.foreach(q => sb.append('?').append(q))
    r.fragment.foreach(f => sb.append('#').append(f))
    sb.toString
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  /** RFC 3986 §6.2.2.2 percent-encoding normalization: decode escapes
    * of unreserved characters, uppercase the hex digits of the rest.
    * Malformed escapes (`%g1`, trailing `%`) pass through verbatim. */
  def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i  = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        val v = (Character.digit(s.charAt(i + 1), 16) << 4) | Character.digit(s.charAt(i + 2), 16)
        if (isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val DefaultPort = Map("http" -> 80, "https" -> 443, "ftp" -> 21, "ws" -> 80, "wss" -> 443)

  /** RFC 3986 §6.2 syntax-based normalization — the canonical URL
    * dedup key of a crawl: lowercase scheme+host (§6.2.2.1), decode
    * unreserved percent-escapes and uppercase the rest (§6.2.2.2),
    * remove dot segments (§6.2.2.3), drop the scheme's default port
    * and give an authority-form URL the "/" path (§6.2.3), and drop
    * the fragment (never sent to the server, so two URLs differing
    * only there are the same fetch). */
  def normalize(url: String): String = {
    val p = parse(url) // scheme and host already lowercased there
    val port = if (DefaultPort.get(p.scheme).contains(p.port)) -1 else p.port
    val path = {
      val r = removeDotSegments(pctNormalize(p.path))
      if (r.isEmpty) "/" else r
    }
    val sb = new StringBuilder(p.scheme).append("://")
    if (p.userinfo.nonEmpty) sb.append(p.userinfo).append('@')
    sb.append(p.host)
    if (port >= 0) sb.append(':').append(port)
    sb.append(path)
    val hI = url.indexOf('#'); val qI = url.indexOf('?')
    if (qI >= 0 && (hI < 0 || qI < hI)) sb.append('?').append(pctNormalize(p.query))
    sb.toString
  }
}
