package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import graft.web.{HtmlText, HttpMessage, UrlOps, WarcCodec, WarcRecord, WebIngest}

/** Web-ingest front end: WARC grammar round-trips (incl. hostile
  * payloads), HTTP framing, HTML extraction hand vectors, the
  * buildHtml→extract inverse property, URL parsing differentially vs
  * java.net.URI, and the PSL algorithm's rule kinds (plain, wildcard,
  * exception, implicit default). */
class WebSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def rec(id: Int, payload: Array[Byte]): WarcRecord =
    WarcRecord(Map(
      "WARC-Type"       -> "response",
      "WARC-Record-ID"  -> s"<urn:uuid:$id>",
      "WARC-Target-URI" -> s"https://h$id.example/p"), payload)

  test("WARC: gzip-member file round-trips records exactly, hostile payloads included") {
    val rng = new scala.util.Random(11)
    val payloads = Seq(
      Array.emptyByteArray,
      "plain".getBytes(UTF_8),
      // record-separator and version-line bytes INSIDE a payload must
      // not confuse the parser (length-delimited, not sentinel-delimited)
      "\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\n".getBytes(UTF_8),
      Array.fill(10000)(rng.nextInt().toByte))
    val recs = payloads.zipWithIndex.map { case (p, i) => rec(i, p) }
    val back = WarcCodec.readGz(WarcCodec.writeGz(recs.iterator))
    assert(back.size == recs.size)
    recs.zip(back).foreach { case (a, b) =>
      assert(b.headers("WARC-Target-URI") == a.headers("WARC-Target-URI"))
      assert(b.headers("Content-Length").toInt == a.payload.length)
      assert(java.util.Arrays.equals(b.payload, a.payload))
    }
  }

  test("WARC gzip framing: interop with JDK streams, optional header fields, corrupt members fail loudly") {
    val recs = Seq(rec(1, "alpha".getBytes(UTF_8)), rec(2, "beta".getBytes(UTF_8)))
    val ours = WarcCodec.writeGz(recs.iterator)

    // our hand-framed members must be readable by the JDK reader
    val jdkIn = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(ours), 1 << 16)
    val jdkOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = jdkIn.read(buf)
    while (n >= 0) { if (n > 0) jdkOut.write(buf, 0, n); n = jdkIn.read(buf) }
    assert(WarcCodec.read(jdkOut.toByteArray).map(_.headers("WARC-Record-ID")) ==
      recs.map(_.headers("WARC-Record-ID")))

    // members written by the JDK writer (and by writers that emit
    // FNAME/FEXTRA/FHCRC header fields) must be readable by ours
    val jdkMembers = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(jdkMembers)
      gz.write(WarcCodec.recordBytes(r)); gz.finish()
    }
    assert(WarcCodec.readGz(jdkMembers.toByteArray).size == 2)

    val deflated = {
      val d = new java.util.zip.Deflater(-1, true)
      val o = new java.io.ByteArrayOutputStream()
      val data = WarcCodec.recordBytes(recs.head)
      d.setInput(data); d.finish()
      while (!d.finished()) { val k = d.deflate(buf); o.write(buf, 0, k) }
      d.end()
      val crc = new java.util.zip.CRC32; crc.update(data)
      val full = new java.io.ByteArrayOutputStream()
      // FLG = FEXTRA|FNAME|FHCRC; XLEN=3 extra bytes; name "f\0"; 2-byte header CRC
      full.write(Array[Byte](0x1f, 0x8b.toByte, 8, (0x04 | 0x08 | 0x02).toByte, 0, 0, 0, 0, 0, 0xff.toByte))
      full.write(Array[Byte](3, 0, 9, 9, 9)); full.write("f".getBytes(UTF_8)); full.write(0)
      full.write(Array[Byte](0, 0))
      full.write(o.toByteArray)
      val t = new java.io.ByteArrayOutputStream()
      Seq(crc.getValue.toInt, data.length).foreach { v =>
        t.write(v & 0xff); t.write((v >>> 8) & 0xff); t.write((v >>> 16) & 0xff); t.write((v >>> 24) & 0xff)
      }
      full.write(t.toByteArray)
      full.toByteArray
    }
    assert(WarcCodec.readGz(deflated).size == 1)

    // a corrupt SECOND member must fail loudly, not silently truncate
    // (the JDK GZIPInputStream failure mode this codec exists to avoid)
    val secondAt = {
      // first member length = position where the 2nd 0x1f,0x8b magic begins
      var i = 2; while (!((ours(i) & 0xff) == 0x1f && (ours(i + 1) & 0xff) == 0x8b)) i += 1; i
    }
    val corrupt = ours.clone(); corrupt(secondAt) = 0x00
    intercept[IllegalArgumentException] { WarcCodec.readGz(corrupt) }
    // trailing garbage after the last member is also an error
    intercept[IllegalArgumentException] { WarcCodec.readGz(ours ++ Array[Byte](1, 2, 3)) }
  }

  test("WARC member index: every slice decodes alone; misaligned slices fail loudly") {
    val recs = (0 until 5).map(i => rec(i, s"payload number $i".getBytes(UTF_8)))
    val (bytes, idx) = WarcCodec.writeGzIndexed(recs.iterator)
    assert(idx.size == 5)
    // offsets tile the file exactly: contiguous, full coverage
    assert(idx.head._1 == 0L)
    idx.sliding(2).foreach { case Seq((o1, l1), (o2, _)) => assert(o1 + l1 == o2) }
    assert(idx.last._1 + idx.last._2 == bytes.length)
    // each slice decodes to exactly its own record — random access
    idx.zipWithIndex.foreach { case ((off, len), i) =>
      val got = WarcCodec.readGz(java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt))
      assert(got.size == 1 && got.head.headers("WARC-Record-ID") == recs(i).headers("WARC-Record-ID"))
    }
    // a short range (truncated trailer) and a shifted range both fail
    val (o0, l0) = idx(1)
    intercept[IllegalArgumentException] {
      WarcCodec.readGz(java.util.Arrays.copyOfRange(bytes, o0.toInt, (o0 + l0 - 3).toInt))
    }
    intercept[IllegalArgumentException] {
      WarcCodec.readGz(java.util.Arrays.copyOfRange(bytes, o0.toInt + 1, (o0 + l0).toInt))
    }
  }

  test("WARC: truncated and corrupt inputs fail loudly, never partially parse") {
    val good = WarcCodec.recordBytes(rec(1, "abcdef".getBytes(UTF_8)))
    intercept[IllegalArgumentException] {
      WarcCodec.read(java.util.Arrays.copyOfRange(good, 0, good.length - 6))
    }
    intercept[IllegalArgumentException] {
      WarcCodec.read("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)) // wrong magic
    }
  }

  test("HTTP framing: response round-trip, Content-Length-delimited body") {
    val body = "x\r\n\r\ny".getBytes(UTF_8)
    val msg  = HttpMessage.response(404, "Not Found", Seq("X-A" -> "b"), body)
    val (status, hdrs, back) = HttpMessage.parseResponse(msg)
    // header names lowercase on insert (RFC 9110 case-insensitivity)
    assert(status == 404 && hdrs("x-a") == "b" && java.util.Arrays.equals(back, body))
    // a lowercase content-length from a real-world server still frames
    val raw = ("HTTP/1.1 200 OK\r\ncontent-length: 6\r\n\r\n").getBytes(UTF_8) ++ body ++ "JUNK".getBytes(UTF_8)
    val (s2, _, b2) = HttpMessage.parseResponse(raw)
    assert(s2 == 200 && java.util.Arrays.equals(b2, body))
  }

  test("RFC 3986 reference resolution: the spec's own §5.4 normal and abnormal tables") {
    val base = "http://a/b/c/d;p?q"
    val vectors = Seq(
      // §5.4.1 normal
      "g:h" -> "g:h", "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/", "/g" -> "http://a/g", "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y", "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s", "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s", ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x", "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q", "." -> "http://a/b/c/", "./" -> "http://a/b/c/",
      ".." -> "http://a/b/", "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/", "../../g" -> "http://a/g",
      // §5.4.2 abnormal
      "../../../g" -> "http://a/g", "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g", "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.", ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..", "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g", "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h", "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y", "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x", "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x", "g#s/../x" -> "http://a/b/c/g#s/../x",
      "http:g" -> "http:g") // strict parser: scheme-qualified ref kept verbatim
    vectors.foreach { case (ref, want) =>
      assert(UrlOps.resolve(base, ref) == want, s"resolve('$ref')")
    }
  }

  test("RFC 3986 resolution: differential vs java.net.URI over the gate's link shapes") {
    val rng = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val id     = math.abs(rng.nextLong() % 100000)
      val lang   = Seq("en", "es", "de")(rng.nextInt(3))
      val source = Seq("wiki", "news", "blog")(rng.nextInt(3))
      val base   = WebIngest.synthUrl(id, lang, source)
      val j      = rng.nextInt(3)
      val href   = WebIngest.linkHref(id, j, source)
      // java.net.URI deviates from RFC 3986 on query-only references
      // (it drops the base path's last segment; §5.2.2 keeps the base
      // path — the "?y" row of the §5.4.1 table above pins OUR side)
      if (!href.startsWith("?")) {
        val got  = UrlOps.resolve(base, href)
        val want = java.net.URI.create(base).resolve(href).toString
        assert(got == want, s"base=$base ref=$href")
      }
    }
  }

  test("URL normalization: RFC 3986 §6.2 rules, idempotence, reserved escapes preserved") {
    // the RFC's own §6.2.2 example
    assert(UrlOps.normalize("eXAMPLE://a/./b/../b/%63/%7bfoo%7d") == "example://a/b/c/%7Bfoo%7D")
    // default port dropped, non-default kept; fragment dropped; empty path -> "/"
    assert(UrlOps.normalize("HTTPS://Ex.COM:443/a#f") == "https://ex.com/a")
    assert(UrlOps.normalize("https://ex.com:8443/a") == "https://ex.com:8443/a")
    assert(UrlOps.normalize("http://ex.com") == "http://ex.com/")
    // %2f is reserved ('/'): decoding it would CHANGE the path structure
    assert(UrlOps.normalize("http://e/a%2fb/%74") == "http://e/a%2Fb/t")
    // malformed escapes pass through; empty query survives as "?"
    assert(UrlOps.normalize("http://e/a%zz?") == "http://e/a%zz?")
    val rng = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val id = math.abs(rng.nextLong() % 100000)
      val m  = WebIngest.messyUrl(id, "en", "wiki")
      val n  = UrlOps.normalize(m)
      assert(UrlOps.normalize(n) == n, s"not idempotent on $m")
      assert(!n.contains("#") && !n.contains("/./") && !n.contains("/../"))
    }
  }

  test("link extraction: quoting styles, entities, and comment/rawtext/no-href decoys") {
    val html = WebIngest.buildLinksHtml(42L, "wiki")
    val hrefs = HtmlText.links(html)
    assert(hrefs == (0 until 3).map(j => WebIngest.linkHref(42L, j, "wiki")))
    // hand vectors: unquoted stops at whitespace, single-quote keeps
    // double quotes, entity decode happens inside attribute values,
    // href-less and empty-href anchors yield nothing
    assert(HtmlText.links("""<a href=/a/b rel=x>t</a>""") == Seq("/a/b"))
    assert(HtmlText.links("""<a href='/a"b'>t</a>""") == Seq("/a\"b"))
    assert(HtmlText.links("""<a href="?a=1&amp;b=2">t</a>""") == Seq("?a=1&b=2"))
    assert(HtmlText.links("""<a name=x>t</a><a href="">u</a>""") == Seq())
    assert(HtmlText.links("""<!-- <a href="/no">x</a> --><style>a{content:'<a href="/no2">'}</style>""") == Seq())
    // an anchor AFTER a rawtext subtree still counts
    assert(HtmlText.links("""<script>var a="<a href='/no'>";</script><a href="/yes">t</a>""") == Seq("/yes"))
    // anchor inner text: inline tags flattened, entities decoded,
    // unclosed anchor runs to end-of-input, href-less body ignored
    assert(HtmlText.linksWithText("""<a href="/x">see <b>doc</b> 7 &amp; more</a>""")
      == Seq("/x" -> "see doc 7 & more"))
    assert(HtmlText.linksWithText("""<a name=k>skip</a><a href="/y">tail""")
      == Seq("/y" -> "tail"))
  }

  test("charset sniffing: BOM > header > meta > cp1252 default; labels canonicalized; BOM stripped") {
    import graft.web.Charsets
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    // BOM beats a lying header
    val utf8Bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "a€b".getBytes(UTF_8)
    assert(Charsets.decode(Some("text/html; charset=iso-8859-1"), utf8Bom) == ("utf-8", "a€b"))
    // header beats meta
    val lied = "<meta charset=utf-8><p>a€b</p>".getBytes(cp1252)
    assert(Charsets.detect(Some("text/html; charset=windows-1252"), lied) == "windows-1252")
    // meta tiers: bare, quoted, http-equiv; prescan works on raw bytes
    assert(Charsets.metaPrescan("<meta charset=iso-8859-1>".getBytes(UTF_8)) == Some("iso-8859-1"))
    assert(Charsets.metaPrescan(
      "<meta http-equiv='Content-Type' content='text/html; charset=\"latin1\"'>".getBytes(UTF_8))
      == Some("iso-8859-1"))
    // unlabeled defaults to cp1252, NOT latin-1: 0x80 must decode to €
    assert(Charsets.decode(None, "x€".getBytes(cp1252)) == ("windows-1252", "x€"))
    // unknown/typo'd labels fall through rather than crash
    assert(Charsets.detect(Some("text/html; charset=utf-9000"), "hi".getBytes(UTF_8)) == "windows-1252")
    assert(Charsets.charsetParam("text/html; charset=\"UTF-8\"; boundary=x") == Some("utf-8"))
    // utf-16le round trip, BOM stripped from content
    val u16 = Array(0xFF.toByte, 0xFE.toByte) ++ "héllo".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    assert(Charsets.decode(None, u16) == ("utf-16le", "héllo"))
    // differential: every buildCharsetPage regime decodes to its marker text
    (0L until 12L).foreach { id =>
      val (body, ct) = WebIngest.buildCharsetPage(id)
      val (_, decoded) = Charsets.decode(Some(ct), body)
      val text = graft.web.HtmlText.extract(decoded)
      val marker = (id % 6) match {
        case 2 => "é±"; case 3 => "€é“"; case 4 => "€é"; case _ => "é±€"
      }
      assert(text == s"doc $id $marker", s"id=$id")
    }
  }

  test("redirect resolution: pointer doubling converges in log rounds; canary fires below them") {
    import graft.web.Redirects
    val dir = "/root/testdata/sf0.001"
    val out = Redirects.webRedirects(spark, dir).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == id - (id % 16), s"final_doc of $id")
      assert(r.getLong(4) == id % 16, s"hops of $id")
      assert(r.getInt(5) == (if (id % 16 == 0) 200 else 301))
    }
    // 2 rounds reach only 4 hops — a 15-hop chain must trip the canary
    val e = intercept[IllegalArgumentException] {
      Redirects.webRedirects(spark, dir, rounds = 2).collect()
    }
    assert(e.getMessage.contains("unresolved"))
    // 4 rounds (= ceil(log2 16)) are exactly enough: no 5th needed
    assert(Redirects.webRedirects(spark, dir, rounds = 4).count() == 500)
  }

  test("boilerplate removal: block segmentation, link density, length threshold") {
    import graft.web.HtmlText
    // inline tags don't split blocks; block tags do
    val bs = HtmlText.blocks("<p>one <b>two</b></p><div>three</div>")
    assert(bs.map(_.text) == Seq("one two", "three"))
    // anchor chars tracked through nesting and entities
    val nav = HtmlText.blocks("""<div><a href="/">Home</a> &amp; <a href="/b">More</a></div>""").head
    assert(nav.text == "Home & More" && nav.anchorChars == 8 && nav.chars == 11)
    // density exactly 1/2 is KEPT (anchor*2 <= total), just over is dropped
    val half = "<p>" + "<a href=x>aaaaaaaaaaaa</a>" + "bbbbbbbbbbbb long enough</p>" // 12 anchor / 36 total
    assert(HtmlText.mainText(half).nonEmpty)
    assert(HtmlText.mainText("""<p><a href=x>aaaaaaaaaaaaaaaaaaaaaaaa</a> tail</p>""") == "")
    // short blocks dropped regardless of density
    assert(HtmlText.mainText("<p>tiny</p><p>this block is clearly long enough to keep</p>")
      == "this block is clearly long enough to keep")
    // rawtext subtree is not content and does not leak into a block
    assert(HtmlText.blocks("<p>before<script>var x='<p>no</p>';</script>after block text</p>")
      .map(_.text) == Seq("beforeafter block text"))
  }

  test("sitemap XML: round-trip, CDATA/entities/comments, loud failure on malformed nesting") {
    import graft.web.{Sitemap, Xml}
    val es = Seq(
      Sitemap.Entry("https://a.example/x?q=1&r=2", "2026-01-05", "daily", 0.3),
      Sitemap.Entry("https://b.example/<odd>", "2026-02-06", "yearly", 1.0))
    assert(Sitemap.parseUrlset(Sitemap.renderUrlset(es)) == es)
    val idx = Seq("https://s.example/a.xml", "https://s.example/b.xml")
    assert(Sitemap.parseIndex(Sitemap.renderIndex(idx)) == idx)
    // CDATA, numeric entities, interleaved comments
    val hand = """<?xml version="1.0"?><urlset>
      |<!-- shard 1 --><url><loc><![CDATA[https://c.example/a&b]]></loc>
      |<lastmod>2026-03-07</lastmod><changefreq>weekly</changefreq>
      |<priority>0.7</priority></url>
      |<url><loc>https://d.example/&#x2F;p</loc></url></urlset>""".stripMargin
    val got = Sitemap.parseUrlset(hand)
    assert(got.head.loc == "https://c.example/a&b" && got.head.priority == 0.7)
    assert(got(1) == Sitemap.Entry("https://d.example//p", "", "", 0.5))
    // malformed nesting / truncation / trailing garbage fail loudly
    intercept[Exception] { Xml.parse("<a><b></a></b>") }
    intercept[Exception] { Xml.parse("<a><b>") }
    intercept[Exception] { Xml.parse("<a/>junk") }
    intercept[Exception] { Sitemap.parseUrlset("<sitemapindex></sitemapindex>") }
  }

  test("HTML extraction hand vectors") {
    val cases = Seq(
      // quoted '>' inside an attribute does not end the tag
      """<p data-x="a>b">ok</p>""" -> "ok",
      // comments vanish, even with markup inside
      "a<!-- <p>no</p> -->b" -> "ab",
      // script/style raw text: first matching close ends, content dropped
      """x<script>var a = 1 < 2; s = "<p>no</p>";</script>y""" -> "xy",
      "x<style>p>li{}</style>y" -> "xy",
      // head subtree (incl. title) is not content
      "<head><title>t</title></head><body>c</body>" -> "c",
      // entities: named, decimal, hex, unknown-left-verbatim, bare amp
      "&amp;&lt;&gt;&#65;&#x42;&unknown;&" -> "&<>AB&unknown;&",
      // nbsp decodes to a space and collapses
      "a&nbsp;&nbsp;b" -> "a b",
      // block boundaries separate, inline tags do not
      "<p>a</p><p>b</p>" -> "a b",
      "a<span>b</span>c" -> "abc",
      // whitespace runs collapse, ends trimmed
      "  a \n\t b  " -> "a b")
    cases.foreach { case (html, want) =>
      assert(HtmlText.extract(html) == want, s"for: $html")
    }
  }

  test("buildHtml -> extract is the identity on the text (inverse property)") {
    val rng = new scala.util.Random(7)
    val words = Seq("alpha", "a&b", "x<y", "y>z", "&amp;", "<p>", "plain", "")
    for (_ <- 0 until 200) {
      val id   = rng.nextLong(1 << 20)
      val text = Seq.fill(rng.nextInt(12))(words(rng.nextInt(words.size))).mkString(" ")
      val norm = text.trim.replaceAll("\\s+", " ")
      val want = ("doc " + id + " & " + norm).trim
      assert(HtmlText.extract(WebIngest.buildHtml(id, text)) == want, s"for text '$text'")
    }
  }

  test("URL parser agrees with java.net.URI across the synthetic family and hand cases") {
    val urls = (0L until 500L).map(i => WebIngest.synthUrl(i, "es", s"src${i % 7}")) ++ Seq(
      "https://user:pw@h.example.com:8080/a/b?q=1#f",
      "http://[2001:db8::1]:9000/x",
      "ftp://files.example.org",
      "https://h.example/?only=query",
      "https://h.example/#only-frag",
      "https://h.example/p?a=1&b=2#x?not-a-query")
    urls.foreach { u =>
      val p = UrlOps.parse(u)
      val j = new java.net.URI(u)
      assert(p.scheme == j.getScheme.toLowerCase, u)
      assert(p.host == Option(j.getHost).getOrElse("").toLowerCase
        .stripPrefix("[").stripSuffix("]"), u)
      assert(p.port == j.getPort, u)
      assert(p.path == Option(j.getRawPath).getOrElse(""), u)
      assert(p.query == Option(j.getRawQuery).getOrElse(""), u)
      assert(p.fragment == Option(j.getRawFragment).getOrElse(""), u)
      assert(p.userinfo == Option(j.getRawUserInfo).getOrElse(""), u)
    }
  }

  test("PSL algorithm: plain, multi-label, wildcard, exception, default rules") {
    import UrlOps.{etld1, publicSuffix, subdomain}
    assert(publicSuffix("foo.com") == "com" && etld1("foo.com") == "foo.com")
    assert(publicSuffix("a.b.github.io") == "github.io")
    assert(etld1("a.b.github.io") == "b.github.io" && subdomain("a.b.github.io") == "a")
    assert(publicSuffix("x.src.co.uk") == "co.uk" && etld1("x.src.co.uk") == "src.co.uk")
    // wildcard *.kobe.jp: every 3rd-level kobe label is itself a suffix
    assert(publicSuffix("oops.kobe.jp") == "oops.kobe.jp")
    assert(etld1("x.oops.kobe.jp") == "x.oops.kobe.jp")
    // exception !city.kobe.jp overrides the wildcard
    assert(publicSuffix("city.kobe.jp") == "kobe.jp")
    assert(etld1("x.city.kobe.jp") == "city.kobe.jp")
    // a bare public suffix is not registrable
    assert(etld1("github.io") == "" && subdomain("github.io") == "")
    // unknown TLD: the implicit '*' default rule
    assert(publicSuffix("foo.zz") == "zz" && etld1("foo.zz") == "foo.zz")
  }

  test("robots.txt: grammar, group selection, specificity, wildcards, anchors") {
    import graft.web.RobotsTxt._
    val p = parse(
      """# policy
        |User-agent: TrainBot
        |User-agent: otherbot
        |Disallow: /private/
        |Allow: /private/ok/
        |Disallow: /*.pdf$
        |Crawl-delay: 3
        |Sitemap: https://h.example/s.xml
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin)
    assert(p.groups.size == 2 && p.sitemaps == Seq("https://h.example/s.xml"))
    // consecutive User-agent lines share one group (case-insensitive)
    assert(evaluate(p, "trainbot", "/private/x") == ((false, "/private/")))
    assert(evaluate(p, "OTHERBOT", "/private/x") == ((false, "/private/")))
    // longer Allow re-admits a subtree
    assert(evaluate(p, "trainbot", "/private/ok/x") == ((true, "/private/ok/")))
    // wildcard + anchor: matches only at the end
    assert(evaluate(p, "trainbot", "/a/b.pdf") == ((false, "/*.pdf$")))
    assert(evaluate(p, "trainbot", "/a/b.pdfx")._1)
    // no rule matches => allowed
    assert(evaluate(p, "trainbot", "/pub/x") == ((true, "")))
    // unknown agent falls back to the '*' group
    assert(evaluate(p, "randombot", "/pub/x") == ((false, "/")))
    assert(rulesFor(p, "trainbot")._2.contains(3))
    assert(rulesFor(p, "randombot")._2.isEmpty)
    // specificity tie goes to Allow
    val t = parse("User-agent: a\nDisallow: /xx*z$\nAllow: /xx/yz\n")
    assert(evaluate(t, "a", "/xx/yz")._1)
    // pattern matcher corner: suffix occurrence may overlap the greedy walk
    assert(patternMatches("a*bb$", "abbb"))
    assert(!patternMatches("abc*c$", "abc"))
    assert(patternMatches("", "/anything"))
  }

  test("web gates run on the fixture and agree with the synthesis formulas") {
    val sf  = "/root/testdata/sf0.001"
    val out = WebIngest.webUrlParse(spark, sf)
      .select("doc_id", "host", "etld1", "path_depth", "n_params").collect()
    assert(out.nonEmpty)
    out.take(50).foreach { r =>
      val id = r.getLong(0)
      val sfx = Seq("com", "org", "co.uk", "github.io", "gov.au")((id % 5).toInt)
      assert(r.getString(1).endsWith("." + sfx))
      assert(r.getString(2) == r.getString(1).stripPrefix("www."), s"etld1 for $id")
      assert(r.getInt(3) == 3)
      assert(r.getInt(4) == (if (id % 2 == 0) 2 else 0))
    }
    val warc = WebIngest.webWarcExtract(spark, sf).select("doc_id", "text").collect()
    assert(warc.length == out.length)
    warc.take(20).foreach { r =>
      assert(r.getString(1).startsWith("doc " + r.getLong(0) + " &"))
    }
  }

  test("web_images: magic-byte sniff routes every codec; unknown bytes route to None") {
    import graft.multimodal.{GifCodec, JpegCodec, Media, PngCodec, TiffCodec}
    val pal = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
    assert(Media.sniffImage(GifCodec.encode(2, 2, Array[Byte](0, 1, 2, 3), pal)).contains("gif"))
    assert(Media.sniffImage(PngCodec.encode(1, 1, Array[Byte](9, 8, 7))).contains("png"))
    assert(Media.sniffImage(JpegCodec.encodeGray(8, 8, new Array[Byte](64), 50)).contains("jpeg"))
    assert(Media.sniffImage(TiffCodec.encode(1, 1, Array[Byte](1, 2, 3))).contains("tiff"))
    // big-endian TIFF sniffs too (the decoder reads both byte orders)
    assert(Media.sniffImage(Array[Byte]('M', 'M', 0, 42)).contains("tiff"))
    assert(Media.sniffImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Media.sniffImage(Array.emptyByteArray).isEmpty)
    // the gate itself: every fixture row decodes through the dispatch
    // and the four formats all appear
    val rows = WebIngest.webImages(spark, "/root/testdata/sf0.001")
      .select("fmt").distinct().collect().map(_.getString(0)).toSet
    assert(rows == Set("gif", "png", "jpeg", "tiff"))
  }
}
