package graft.web

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The web-crawl front end of a training-data pipeline, gated the same
  * way as the multimodal codecs ([[graft.multimodal.Media]] pattern):
  * each gate SYNTHESIZES the wire bytes deterministically from the
  * `documents` fixture inside the task, round-trips them through the
  * REAL codec/parser, and the DuckDB oracle recomputes the expected
  * output analytically from the fixture — agreement proves the whole
  * parse chain (gzip members → WARC grammar → HTTP framing → HTML
  * extraction → entity decoding) reconstructed every byte it had to.
  *
  * Scale shape: everything here is a narrow `mapPartitions` over the
  * corpus — the per-task unit is one WARC file (Common Crawl caps
  * ~1 GB), per-record state is O(1), and nothing shuffles until the
  * domain-level aggregate (|eTLD+1| keys, map-side combined).
  */
object WebIngest {

  /** Deterministic synthetic page for doc `id`: exercises head/style/
    * title subtree dropping, comments containing markup, quoted `>`
    * inside attributes, script raw-text with `<` and fake tags inside,
    * named + decimal + hex character references, and entity-escaped
    * body text. Extraction must recover exactly
    * `doc <id> & <text>` (whitespace-normalized). */
  def buildHtml(id: Long, text: String): String = {
    val esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    "<html><head><title>ignored title " + id + "</title>" +
      "<style>p{margin:0;} .x>li{color:red}</style></head>" +
      "<body><!-- shard " + id + " <p>not text</p> -->" +
      "<h1 class=\"t\" data-note=\"a>b\">doc&#32;" + id + "</h1>" +
      "<script type=\"text/javascript\">var p = 1 < 2; document.write(\"<p>not text</p>\");</script>" +
      "<p>&amp;&#x20;" + esc + "</p></body></html>"
  }

  /** Crawl-side record for doc `id`: HTML in an HTTP/1.1 response in a
    * WARC `response` record. */
  private def warcRecord(id: Long, uri: String, html: String): WarcRecord = {
    val http = HttpMessage.response(200, "OK", Seq(
      "Content-Type" -> "text/html; charset=utf-8",
      "X-Doc-Id"     -> id.toString), html.getBytes(UTF_8))
    WarcRecord(Map(
      "WARC-Type"        -> "response",
      "WARC-Record-ID"   -> s"<urn:uuid:$id>",
      "WARC-Date"        -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI"  -> uri,
      "Content-Type"     -> "application/http; msgtype=response"), http)
  }

  /** `web_warc_extract` — each partition writes ONE member-gzipped WARC
    * file from its documents, then the ingest side parses the bytes
    * back with no access to the originals: gzip member walk → WARC
    * grammar → HTTP framing → HTML → text. doc_id is recovered from
    * the WARC-Target-URI, so header round-tripping is on the hash too. */
  def webWarcExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        val recs = rows.map { case (id, text, lang, source) =>
          val uri = s"https://$source.example.com/$lang/doc/$id"
          warcRecord(id, uri, buildHtml(id, text))
        }
        val fileBytes = WarcCodec.writeGz(recs)
        // ——— ingest side: bytes only from here on ———
        WarcCodec.readGz(fileBytes).iterator.map { r =>
          val (status, hdrs, body) = HttpMessage.parseResponse(r.payload)
          val text = HtmlText.extract(new String(body, UTF_8))
          val uri  = r.targetUri
          val id   = uri.substring(uri.lastIndexOf('/') + 1).toLong
          (id, uri, status, hdrs.getOrElse("content-type", ""), text, text.length.toLong)
        }
      }.toDF("doc_id", "uri", "http_status", "content_type", "text", "n_chars")
  }

  /** `web_warc_index` — the CDX random-access proof: each partition
    * writes ONE member-gzipped WARC file PLUS its (offset, length)
    * index, then every record is recovered by slicing ONLY its own
    * byte range out of the file and decoding that member alone —
    * nothing upstream of the offset is touched, which is how a
    * cluster fetches single records from 1 GB crawl shards with
    * object-store ranged GETs instead of full-file scans. The output
    * carries the recovered text (analytic oracle: agreement proves
    * the slice really contained the whole record) and the member's
    * position in its file. */
  def webWarcIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        val recs = rows.map { case (id, text, lang, source) =>
          val uri = s"https://$source.example.com/$lang/doc/$id"
          warcRecord(id, uri, buildHtml(id, text))
        }
        val (fileBytes, index) = WarcCodec.writeGzIndexed(recs)
        // ——— random-access side: ONLY the indexed slice is read ———
        index.iterator.map { case (off, len) =>
          val slice = java.util.Arrays.copyOfRange(fileBytes, off.toInt, (off + len).toInt)
          val rec   = WarcCodec.readGz(slice) match {
            case Seq(one) => one
            case many     => sys.error(s"slice at $off decoded ${many.size} records")
          }
          val (_, _, body) = HttpMessage.parseResponse(rec.payload)
          val text = HtmlText.extract(new String(body, UTF_8))
          val id   = rec.targetUri.substring(rec.targetUri.lastIndexOf('/') + 1).toLong
          (id, text)
        }
      }.toDF("doc_id", "text")
  }

  /** Byte offsets are deflate-dependent, so the oracle checks what
    * random access must DELIVER: every doc's full text back out of its
    * own slice — a short or misaligned range breaks the gzip trailer
    * or the WARC grammar and the row (or the whole task) fails loudly
    * before any hash. */
  val webWarcIndexSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         trim('doc ' || doc_id || ' & ' ||
      |              trim(regexp_replace(text, '\s+', ' ', 'g'))) AS xt
      |  FROM documents)
      |SELECT doc_id, xt AS text
      |FROM t""".stripMargin

  /** Analytic twin: rebuilds the expected extraction directly from the
    * fixture (`doc <id> & <text>`, whitespace-normalized) — no WARC,
    * HTTP, or HTML involved, so agreement proves the parse chain. */
  val webWarcExtractSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, source,
      |         trim('doc ' || doc_id || ' & ' ||
      |              trim(regexp_replace(text, '\s+', ' ', 'g'))) AS xt
      |  FROM documents)
      |SELECT doc_id,
      |       'https://' || source || '.example.com/' || lang || '/doc/' || doc_id AS uri,
      |       CAST(200 AS INT) AS http_status,
      |       'text/html; charset=utf-8' AS content_type,
      |       xt AS text,
      |       CAST(length(xt) AS BIGINT) AS n_chars
      |FROM t""".stripMargin

  /** Deterministic URL for doc `id` — five public-suffix shapes (incl.
    * multi-label and private-registry suffixes), optional www label,
    * port, file extension, 2-param query, fragment. Mirrored verbatim
    * in the oracle CTE. */
  def synthUrl(id: Long, lang: String, source: String): String = {
    val sfx = (id % 5) match {
      case 0 => "com"; case 1 => "org"; case 2 => "co.uk"
      case 3 => "github.io"; case _ => "gov.au"
    }
    val sub = if (id % 3 == 0) "www." else ""
    val prt = if (id % 11 == 0) ":8443" else ""
    val ext = if (id % 4 == 0) ".html" else ""
    val qry = if (id % 2 == 0) s"?ref=$source&page=${id % 7}" else ""
    val frg = if (id % 9 == 0) "#s2" else ""
    s"https://$sub$source.$sfx$prt/$lang/doc/$id$ext$qry$frg"
  }

  private val urlOracleCte: String =
    """WITH u AS (
      |  SELECT doc_id, lang, source,
      |         CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |              WHEN 2 THEN 'co.uk' WHEN 3 THEN 'github.io'
      |              ELSE 'gov.au' END AS sfx,
      |         CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END AS sub,
      |         CASE WHEN doc_id % 11 = 0 THEN ':8443' ELSE '' END AS prt,
      |         CASE WHEN doc_id % 4 = 0 THEN '.html' ELSE '' END AS ext,
      |         CASE WHEN doc_id % 2 = 0
      |              THEN '?ref=' || source || '&page=' || (doc_id % 7)
      |              ELSE '' END AS qry,
      |         CASE WHEN doc_id % 9 = 0 THEN '#s2' ELSE '' END AS frg
      |  FROM documents)""".stripMargin

  /** `web_url_parse` — the real parser + PSL walk over the synthetic
    * URLs; the oracle recomputes every field from the synthesis
    * parameters (never by string-parsing), so the hash proves [[UrlOps
    * .parse]]/[[UrlOps.publicSuffix]] inverted the construction. */
  def webUrlParse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, lang, source) =>
          val url  = synthUrl(id, lang, source)
          val p    = UrlOps.parse(url)
          val ps   = UrlOps.publicSuffix(p.host)
          val e1   = UrlOps.etld1(p.host)
          val sub  = UrlOps.subdomain(p.host)
          val segs = p.path.split('/').filter(_.nonEmpty)
          val last = if (segs.isEmpty) "" else segs.last
          val dot  = last.lastIndexOf('.')
          val ext  = if (dot > 0) last.substring(dot + 1) else ""
          val nPar = if (p.query.isEmpty) 0 else p.query.split('&').count(_.nonEmpty)
          (id, url, p.scheme, p.host, p.port, ps, e1, sub, segs.length, ext, nPar, p.fragment)
        }
      }.toDF("doc_id", "url", "scheme", "host", "port", "public_suffix", "etld1",
             "subdomain", "path_depth", "file_ext", "n_params", "fragment")
  }

  val webUrlParseSql: String =
    urlOracleCte +
    """
      |SELECT doc_id,
      |       'https://' || sub || source || '.' || sfx || prt || '/' || lang ||
      |         '/doc/' || doc_id || ext || qry || frg AS url,
      |       'https' AS scheme,
      |       sub || source || '.' || sfx AS host,
      |       CAST(CASE WHEN doc_id % 11 = 0 THEN 8443 ELSE -1 END AS INT) AS port,
      |       sfx AS public_suffix,
      |       source || '.' || sfx AS etld1,
      |       CASE WHEN doc_id % 3 = 0 THEN 'www' ELSE '' END AS subdomain,
      |       CAST(3 AS INT) AS path_depth,
      |       CASE WHEN doc_id % 4 = 0 THEN 'html' ELSE '' END AS file_ext,
      |       CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS INT) AS n_params,
      |       CASE WHEN doc_id % 9 = 0 THEN 's2' ELSE '' END AS fragment
      |FROM u""".stripMargin

  /** Deterministic per-source robots.txt exercising rule specificity:
    * a wildcard+anchor Disallow, a prefix Disallow, a LONGER Allow that
    * re-admits part of it, a crawl delay, a sitemap line, comments, and
    * a catch-all `*` group that blocks everything (so group selection
    * is on the hash too — picking `*` for trainbot would flip every
    * row). Mirrored in the oracle's CASE. */
  def buildRobots(source: String): String =
    s"""# crawl policy for $source
       |User-agent: trainbot
       |Disallow: /*.html$$
       |Disallow: /es/
       |Allow: /es/doc/
       |Crawl-delay: ${source.length + 1}
       |Sitemap: https://$source.example.com/sitemap.xml
       |
       |User-agent: *
       |Disallow: /
       |""".stripMargin

  /** `web_robots` — RFC 9309 admission over the synthetic URL family:
    * parse each source's policy once (a per-domain broadcast at
    * cluster scale), evaluate the longest-match/tie-goes-to-Allow rule
    * per URL. The oracle recomputes verdicts from the synthesis
    * parameters, so the hash proves group selection, both wildcard
    * kinds, and the specificity ordering. */
  def webRobots(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        val policies = scala.collection.mutable.Map.empty[String, RobotsTxt.Policy]
        rows.map { case (id, lang, source) =>
          val policy = policies.getOrElseUpdate(source, RobotsTxt.parse(buildRobots(source)))
          val p      = UrlOps.parse(synthUrl(id, lang, source))
          val (ok, rule) = RobotsTxt.evaluate(policy, "trainbot", p.path)
          val delay  = RobotsTxt.rulesFor(policy, "trainbot")._2.getOrElse(-1)
          (id, p.path, if (ok) 1 else 0, rule, delay)
        }
      }.toDF("doc_id", "path", "allowed", "matched_rule", "crawl_delay")
  }

  val webRobotsSql: String =
    """SELECT doc_id,
      |       '/' || lang || '/doc/' || doc_id ||
      |         CASE WHEN doc_id % 4 = 0 THEN '.html' ELSE '' END AS path,
      |       CAST(CASE WHEN lang = 'es' OR doc_id % 4 <> 0 THEN 1 ELSE 0 END AS INT) AS allowed,
      |       CASE WHEN lang = 'es' THEN '/es/doc/'
      |            WHEN doc_id % 4 = 0 THEN '/*.html$'
      |            ELSE '' END AS matched_rule,
      |       CAST(length(source) + 1 AS INT) AS crawl_delay
      |FROM documents""".stripMargin

  /** Deterministic outlink target for (doc, j). */
  private def linkTarget(id: Long, j: Int): Long = (id * 7 + j * 13) % 997

  /** The DECODED href for link j of doc `id` — six URI-reference
    * shapes: absolute to an external hub, dot-dot relative,
    * absolute-path, protocol-relative to a per-source CDN, query-only
    * (with an `&` that HTML must serialize as `&amp;`), and a
    * dot-segment-stress relative path. Mirrored in the oracle CASE. */
  def linkHref(id: Long, j: Int, source: String): String = {
    val t = linkTarget(id, j)
    ((id + j) % 6) match {
      case 0 => s"https://hub${t % 5}.net/x/$t"
      case 1 => s"../doc/$t"
      case 2 => s"/tag/$t"
      case 3 => s"//cdn.$source.net/a/$t"
      case 4 => s"?page=$t&ref=in"
      case _ => s"a/./b/../c/$t"
    }
  }

  /** Page with three anchors in varied attribute quoting (double,
    * single, unquoted), hrefs entity-encoded, plus decoys the
    * extractor must NOT count: an anchor inside a comment, an anchor
    * with no href, and an anchor inside script raw-text. */
  def buildLinksHtml(id: Long, source: String): String = {
    val sb = new StringBuilder("<html><body>")
    sb.append("<!-- nav draft: <a href=\"/nope/1\">x</a> -->")
    sb.append("<a name=\"top\" class=\"anchor\">not a link</a>")
    sb.append("<script>document.write('<a href=\"/nope/2\">x</a>');</script>")
    (0 until 3).foreach { j =>
      val href = linkHref(id, j, source).replace("&", "&amp;")
      // anchor inner text exercises inline-tag flattening + entity
      // decode inside the anchor subtree (web_anchor_text's surface)
      val t    = linkTarget(id, j)
      val body = "see <b>doc</b> " + t + " &amp; more"
      val a = (j % 3) match {
        case 0 => "<a class=\"r\" href=\"" + href + "\" rel=\"next\">" + body + "</a>"
        case 1 => "<a href='" + href + "' data-k='v'>" + body + "</a>"
        case _ => "<a id=x href=" + href + " rel=nofollow>" + body + "</a>"
      }
      sb.append(a)
    }
    sb.append("</body></html>").toString
  }

  /** `web_links` — the crawl-frontier primitive: REAL anchor/attribute
    * extraction over synthesized pages, each href resolved against the
    * page's own base URL by strict RFC 3986 §5.2 resolution (base
    * query and fragment must vanish except under the query-only ref),
    * then host → PSL → registrable-domain classification. Narrow
    * mapPartitions; nothing shuffles. */
  def webLinks(s: SparkSession, dir: String): DataFrame =
    linksOf(Tables.documents(s, dir))

  /** Batch-shaped extraction (shared by the gate and the streaming
    * frontier sink): docs(doc_id, lang, source, …) → one row per
    * extracted+resolved outlink. */
  def linksOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, lang, source) =>
          val base  = synthUrl(id, lang, source)
          val srcE1 = UrlOps.etld1(UrlOps.parse(base).host)
          // ——— ingest side: page bytes only from here on ———
          HtmlText.links(buildLinksHtml(id, source)).zipWithIndex.map { case (href, j) =>
            val url = UrlOps.resolve(base, href)
            val p   = UrlOps.parse(url)
            val e1  = UrlOps.etld1(p.host)
            (id, j, href, url, srcE1, p.host, e1, if (e1 == srcE1) 1 else 0)
          }
        }
      }.toDF("doc_id", "link_no", "href", "url", "src_etld1", "dst_host", "dst_etld1", "internal")
  }

  /** Batch-shaped canonical page-URL set (the "crawled" side of the
    * frontier): docs → normalized own-URL rows. */
  def crawledOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, lang, source) =>
        UrlOps.normalize(synthUrl(id, lang, source))
      })
      .toDF("norm")
  }

  /** `web_anchor_text` — what linking pages CALL their targets (the
    * classic relevance / weak-label signal): href + anchor inner text
    * extracted together, the text through the full extraction rules
    * over the anchor subtree (inline tags flattened, entities
    * decoded). Narrow mapPartitions. */
  def webAnchorText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, lang, source) =>
          val base = synthUrl(id, lang, source)
          HtmlText.linksWithText(buildLinksHtml(id, source)).zipWithIndex.map {
            case ((href, anchor), j) => (id, j, UrlOps.resolve(base, href), anchor)
          }
        }
      }.toDF("doc_id", "link_no", "url", "anchor")
  }

  // lazy: linkOracleCte is declared later in the object (vals
  // initialize in declaration order; an eager reference would be null)
  lazy val webAnchorTextSql: String =
    linkOracleCte +
    """
      |SELECT doc_id, link_no,
      |       CASE shape WHEN 0 THEN 'https://hub' || (t % 5) || '.net/x/' || t
      |                  WHEN 1 THEN 'https://' || auth || '/' || lang || '/doc/' || t
      |                  WHEN 2 THEN 'https://' || auth || '/tag/' || t
      |                  WHEN 3 THEN 'https://cdn.' || source || '.net/a/' || t
      |                  WHEN 4 THEN 'https://' || auth || '/' || lang || '/doc/' || doc_id || ext
      |                              || '?page=' || t || '&ref=in'
      |                  ELSE 'https://' || auth || '/' || lang || '/doc/a/c/' || t END AS url,
      |       'see doc ' || t || ' & more' AS anchor
      |FROM u""".stripMargin

  private val linkOracleCte: String =
    urlOracleCte.replace("WITH u AS", "WITH u0 AS").replace("FROM documents)",
      "FROM documents),\n" +
      """u AS (
        |  SELECT u0.*, CAST(j AS INT) AS link_no,
        |         (doc_id * 7 + j * 13) % 997 AS t,
        |         (doc_id + j) % 6 AS shape,
        |         sub || source || '.' || sfx || prt AS auth
        |  FROM u0, (SELECT unnest([0, 1, 2]) AS j))""".stripMargin)

  private val linkRowsSql: String =
    linkOracleCte +
    """
      |SELECT doc_id, link_no,
      |       CASE shape WHEN 0 THEN 'https://hub' || (t % 5) || '.net/x/' || t
      |                  WHEN 1 THEN '../doc/' || t
      |                  WHEN 2 THEN '/tag/' || t
      |                  WHEN 3 THEN '//cdn.' || source || '.net/a/' || t
      |                  WHEN 4 THEN '?page=' || t || '&ref=in'
      |                  ELSE 'a/./b/../c/' || t END AS href,
      |       CASE shape WHEN 0 THEN 'https://hub' || (t % 5) || '.net/x/' || t
      |                  WHEN 1 THEN 'https://' || auth || '/' || lang || '/doc/' || t
      |                  WHEN 2 THEN 'https://' || auth || '/tag/' || t
      |                  WHEN 3 THEN 'https://cdn.' || source || '.net/a/' || t
      |                  WHEN 4 THEN 'https://' || auth || '/' || lang || '/doc/' || doc_id || ext
      |                              || '?page=' || t || '&ref=in'
      |                  ELSE 'https://' || auth || '/' || lang || '/doc/a/c/' || t END AS url,
      |       source || '.' || sfx AS src_etld1,
      |       CASE shape WHEN 0 THEN 'hub' || (t % 5) || '.net'
      |                  WHEN 3 THEN 'cdn.' || source || '.net'
      |                  ELSE sub || source || '.' || sfx END AS dst_host,
      |       CASE shape WHEN 0 THEN 'hub' || (t % 5) || '.net'
      |                  WHEN 3 THEN source || '.net'
      |                  ELSE source || '.' || sfx END AS dst_etld1,
      |       CAST(CASE WHEN shape IN (0, 3) THEN 0 ELSE 1 END AS INT) AS internal
      |FROM u""".stripMargin

  val webLinksSql: String = linkRowsSql

  /** `web_link_graph` — registrable-domain edge rollup of [[webLinks]]
    * (the hyperlink graph behind crawl prioritization and PageRank):
    * |eTLD+1|² keys at most, map-side combined after the narrow
    * extract/resolve pass. */
  def webLinkGraph(s: SparkSession, dir: String): DataFrame =
    webLinks(s, dir)
      .groupBy(col("src_etld1"), col("dst_etld1"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_pages"),
        max(col("internal")).as("internal"))

  // NOTE: built by concatenation, not an interpolated stripMargin —
  // stripMargin would eat the `||` concat operators inside linkRowsSql
  val webLinkGraphSql: String =
    "WITH links AS (\n" + linkRowsSql + "\n)\n" +
      "SELECT src_etld1, dst_etld1,\n" +
      "       CAST(COUNT(*) AS BIGINT) AS n_links,\n" +
      "       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_pages,\n" +
      "       CAST(MAX(internal) AS INT) AS internal\n" +
      "FROM links GROUP BY 1, 2"

  /** `web_host_pagerank` — the hyperlink graph's centrality pass:
    * PageRank over the DIRECTED registrable-domain graph distilled
    * from [[linksOf]] (distinct edges, self-loops dropped — internal
    * links say nothing about inter-publisher authority). Reuses the
    * graph family's integer-exact fixed-point kernel
    * ([[graft.operators.Graphs.pagerankOver]] — node ids are strings
    * here; the kernel is key-type-generic because every arithmetic op
    * touches only mass/degree), so the oracle replays the same
    * unrolled rounds over the same edge CTEs. At 100 TB the edge
    * distillation is the heavy pass (one distinct over |links|); the
    * fixed-point runs on the |domains|-sized graph. */
  def webHostPagerank(s: SparkSession, dir: String): DataFrame = {
    val links = linksOf(Tables.documents(s, dir))
    val edges = links
      .where(col("src_etld1") =!= col("dst_etld1"))
      .select(col("src_etld1").as("src"), col("dst_etld1").as("dst"))
      .distinct()
    val nodes = edges.select(col("src").as("doc_id"))
      .union(edges.select(col("dst"))).distinct()
    graft.operators.Graphs.pagerankOver(s, nodes, edges)
      .withColumnRenamed("doc_id", "domain")
  }

  val webHostPagerankSql: String =
    "WITH links AS (\n" + linkRowsSql + "\n),\n" +
      """sym AS MATERIALIZED (
        |  SELECT DISTINCT src_etld1 AS src, dst_etld1 AS dst
        |  FROM links WHERE src_etld1 <> dst_etld1),
        |nodes AS MATERIALIZED (
        |  SELECT src AS doc_id FROM sym UNION SELECT dst FROM sym),
        |""".stripMargin +
      graft.operators.Graphs.prRoundsCtesSql + "\n" +
      s"""SELECT nd.doc_id AS domain, CAST(COALESCE(d.deg, 0) AS BIGINT) AS out_deg,
         |       r.mass AS pr_scaled, CAST(r.mass AS DOUBLE) / 1e6 AS pr
         |FROM nodes nd
         |JOIN r${graft.operators.Graphs.PrIters} r ON nd.doc_id = r.doc_id
         |LEFT JOIN deg d ON nd.doc_id = d.src""".stripMargin

  /** Deliberately-messy URL for doc `id`: uppercase scheme and mixed-
    * case host, explicit default port, percent-encoded unreserved
    * chars (`%64oc` = `doc`), dot segments, a reserved escape in
    * lowercase hex (`%2f` must become `%2F`, not `/`), and a fragment.
    * [[UrlOps.normalize]] must reduce it to the canonical form the
    * oracle builds analytically. */
  def messyUrl(id: Long, lang: String, source: String): String = {
    val scheme = if (id % 2 == 0) "HTTPS" else "https"
    val host   = if (id % 3 == 0) source.toUpperCase + ".Example.COM"
                 else s"$source.example.com"
    val port   = if (id % 5 == 0) ":443" else ""
    val path   = s"/$lang/tmp/../%64oc/./$id"
    val qry    = if (id % 2 == 0) s"?x=%41$id&y=%2f" else ""
    val frg    = if (id % 7 == 0) "#top" else ""
    s"$scheme://$host$port$path$qry$frg"
  }

  /** `web_url_normalize` — RFC 3986 §6.2 syntax-based normalization,
    * the canonical URL-dedup key of a crawl (the same page arrives
    * spelled a dozen ways; fetch-dedup keys on the normalized form).
    * Narrow map; the oracle constructs BOTH the messy input and the
    * canonical output analytically, so the hash proves every §6.2
    * rule fired (and only where it should — `%2f` stays encoded). */
  def webUrlNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, lang, source) =>
          val url = messyUrl(id, lang, source)
          (id, url, UrlOps.normalize(url))
        }
      }.toDF("doc_id", "url", "norm")
  }

  val webUrlNormalizeSql: String =
    """SELECT doc_id,
      |       (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
      |       (CASE WHEN doc_id % 3 = 0 THEN upper(source) || '.Example.COM'
      |             ELSE source || '.example.com' END) ||
      |       (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
      |       '/' || lang || '/tmp/../%64oc/./' || doc_id ||
      |       (CASE WHEN doc_id % 2 = 0 THEN '?x=%41' || doc_id || '&y=%2f' ELSE '' END) ||
      |       (CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END) AS url,
      |       'https://' || source || '.example.com/' || lang || '/doc/' || doc_id ||
      |       (CASE WHEN doc_id % 2 = 0 THEN '?x=A' || doc_id || '&y=%2F' ELSE '' END) AS norm
      |FROM documents""".stripMargin

  /** `web_frontier` — the crawl-frontier builder composed from the
    * family's members: outlinks ([[webLinks]]: real extraction +
    * RFC 3986 resolution) → canonical key ([[UrlOps.normalize]]) →
    * anti-join against the already-crawled set (the corpus' own page
    * URLs under the same key) → per-URL referrer census. The
    * anti-join is corpus×links on the normalized key — at 100 TB a
    * shuffle join on a high-entropy string key, exactly the shape AQE
    * handles; nothing here is a window or a collect. */
  def webFrontier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val links = linksOf(Tables.documents(s, dir))
      .select(col("doc_id"), col("url"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, u) => (id, UrlOps.normalize(u)) })
      .toDF("doc_id", "norm")
    val crawled = crawledOf(Tables.documents(s, dir))
    links.join(crawled, Seq("norm"), "left_anti")
      .groupBy(col("norm"))
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("doc_id")).as("n_pages"),
        min(col("doc_id")).as("first_seen"))
  }

  // crawled key = the synthetic page URL minus its fragment (nothing
  // else in synthUrl is non-canonical); link keys are already canonical
  private val frontierCtes: String =
    "WITH links AS (\n" + linkRowsSql + "\n),\n" +
      """crawled AS (
        |  SELECT 'https://' ||
        |         (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) || source || '.' ||
        |         (CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'co.uk'
        |               WHEN 3 THEN 'github.io' ELSE 'gov.au' END) ||
        |         (CASE WHEN doc_id % 11 = 0 THEN ':8443' ELSE '' END) ||
        |         '/' || lang || '/doc/' || doc_id ||
        |         (CASE WHEN doc_id % 4 = 0 THEN '.html' ELSE '' END) ||
        |         (CASE WHEN doc_id % 2 = 0
        |               THEN '?ref=' || source || '&page=' || (doc_id % 7) ELSE '' END) AS norm
        |  FROM documents),
        |frontier AS (
        |  SELECT l.url AS norm, l.doc_id
        |  FROM links l LEFT JOIN crawled c ON l.url = c.norm
        |  WHERE c.norm IS NULL)
        |""".stripMargin

  val webFrontierSql: String =
    frontierCtes +
      """SELECT norm,
        |       CAST(COUNT(*) AS BIGINT) AS n_refs,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_pages,
        |       MIN(doc_id) AS first_seen
        |FROM frontier GROUP BY 1""".stripMargin

  /** Oracle for `stream_frontier`: the URL-set projection of the
    * batch frontier (MIN referrer only — the monotone state). */
  val streamFrontierSql: String =
    frontierCtes +
      """SELECT norm, MIN(doc_id) AS first_seen
        |FROM frontier GROUP BY 1""".stripMargin

  /** Wire bytes + Content-Type for the charset gate, six labeling
    * regimes: header-labeled UTF-8; UTF-8 BOM under a LYING latin-1
    * header (BOM must win); `<meta charset>`-labeled latin-1;
    * http-equiv-labeled cp1252; unlabeled cp1252 (the HTML5 default
    * tier); BOM'd UTF-16LE. Markers are chosen per charset so a wrong
    * decode changes the text: 0x80–0x9F bytes (€ “) exist in cp1252
    * but are controls in latin-1, and é/± differ byte-wise between
    * every pair. */
  def buildCharsetPage(id: Long): (Array[Byte], String) = {
    val cs = java.nio.charset.Charset.forName _
    def html(marker: String, meta: String) =
      s"<html><head>$meta</head><body><p>doc $id $marker</p></body></html>"
    (id % 6) match {
      case 0 => (html("é±€", "").getBytes(UTF_8),
                 "text/html; charset=utf-8")
      case 1 => (Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
                   html("é±€", "").getBytes(UTF_8),
                 "text/html; charset=iso-8859-1") // the header lies; BOM wins
      case 2 => (html("é±", "<meta charset=\"iso-8859-1\">")
                   .getBytes(cs("ISO-8859-1")), "text/html")
      case 3 => (html("€é“",
                   "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">")
                   .getBytes(cs("windows-1252")), "text/html")
      case 4 => (html("€é", "").getBytes(cs("windows-1252")), "text/html")
      case _ => (Array(0xFF.toByte, 0xFE.toByte) ++
                   html("é±€", "").getBytes(cs("UTF-16LE")), "text/html")
    }
  }

  /** `web_charset` — encoding sniffing + decode over synthesized wire
    * bytes: BOM > Content-Type header > meta prescan > windows-1252
    * default, then HTML extraction on the DECODED text. The oracle
    * rebuilds charset label and text analytically, so the hash proves
    * the precedence order (the lying-header case flips a third of the
    * rows if the header beats the BOM) and the byte-exact decode (the
    * latin-1/cp1252 0x80–0x9F split). */
  def webCharset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { rows =>
        rows.map { id =>
          val (body, contentType) = buildCharsetPage(id)
          // ——— ingest side: bytes + header only from here on ———
          val (cs, decoded) = Charsets.decode(Some(contentType), body)
          val text = HtmlText.extract(decoded)
          (id, cs, text, text.length.toLong)
        }
      }.toDF("doc_id", "charset", "text", "n_chars")
  }

  val webCharsetSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CASE doc_id % 6 WHEN 2 THEN 'iso-8859-1'
      |              WHEN 3 THEN 'windows-1252' WHEN 4 THEN 'windows-1252'
      |              WHEN 5 THEN 'utf-16le' ELSE 'utf-8' END AS charset,
      |         'doc ' || doc_id || ' ' ||
      |         CASE doc_id % 6 WHEN 2 THEN 'é±' WHEN 3 THEN '€é“'
      |              WHEN 4 THEN '€é' ELSE 'é±€' END AS text
      |  FROM documents)
      |SELECT doc_id, charset, text, CAST(length(text) AS BIGINT) AS n_chars
      |FROM t""".stripMargin

  /** Page for the boilerplate gate: a link-dominated nav block, the
    * real content paragraph, a sub-threshold ad line, a short
    * copyright footer, and (even ids) a second legitimate content
    * block — so both drop reasons (density, length) and both keep
    * verdicts appear on every page. */
  def buildBoilerHtml(id: Long, text: String): String = {
    val esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val extra =
      if (id % 2 == 0) s"<p>appendix for document $id with enough characters</p>"
      else "<p>ad: buy</p>"
    s"""<html><body><div><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>""" +
      s"<p>$esc</p>$extra<div>(c) $id corp</div></body></html>"
  }

  /** `web_boilerplate` — main-content extraction by block
    * segmentation + the link-density heuristic (jusText/readability
    * family): a block is boilerplate when it is shorter than 20
    * normalized chars (crumbs, copyright lines) or more than half its
    * raw chars sit inside anchors (menus, footers). Thresholds are
    * deterministic so the oracle replays every verdict; the hash
    * covers segmentation (a missed block boundary merges nav into
    * content and flips the density call). Narrow mapPartitions. */
  def webBoilerplate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val html   = buildBoilerHtml(id, text)
          val blocks = HtmlText.blocks(html)
          val kept   = blocks.filter(b => b.text.length >= 20 && b.anchorChars * 2 <= b.chars)
          val main   = kept.map(_.text).mkString(" ")
          (id, main, main.length.toLong, blocks.size, blocks.size - kept.size)
        }
      }.toDF("doc_id", "main_text", "n_chars", "n_blocks", "n_dropped")
  }

  val webBoilerplateSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         trim(regexp_replace(text, '\s+', ' ', 'g')) AS xt
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |         concat_ws(' ',
      |           CASE WHEN length(xt) >= 20 THEN xt END,
      |           CASE WHEN doc_id % 2 = 0
      |                THEN 'appendix for document ' || doc_id || ' with enough characters' END
      |         ) AS main_text,
      |         -- nav, content, extra, footer: 4 nonempty blocks;
      |         -- dropped = nav + footer + (odd: the short ad)
      |         --           + (content itself when under 20 chars)
      |         CAST(4 AS INT) AS n_blocks,
      |         CAST(2 + (CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END)
      |                + (CASE WHEN length(xt) >= 20 THEN 0 ELSE 1 END) AS INT) AS n_dropped
      |  FROM t)
      |SELECT doc_id, main_text, CAST(length(main_text) AS BIGINT) AS n_chars,
      |       n_blocks, n_dropped
      |FROM m""".stripMargin

  /** `web_sitemap` — the crawl-seed chain: each partition renders its
    * docs as TWO `<urlset>` shards (by id parity) plus a
    * `<sitemapindex>` pointing at them, then the ingest side walks
    * index → shards → entries through the REAL XML parser with no
    * access to the originals (doc ids come back out of the `<loc>`
    * URLs). Entity-escaped locs, CDATA-free protocol XML, loud
    * failure on malformed nesting. Narrow mapPartitions. */
  def webSitemap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val freqs = Array("daily", "weekly", "monthly", "yearly")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        val entries = rows.map { case (id, lang, source) =>
          (id % 2, Sitemap.Entry(synthUrl(id, lang, source),
            f"2026-01-${id % 28 + 1}%02d", freqs((id % 4).toInt), (id % 10) / 10.0))
        }.toSeq
        val shards = entries.groupBy(_._1).map { case (par, es) =>
          s"https://seeds.example/shard-$par.xml" ->
            Sitemap.renderUrlset(es.map(_._2))
        }
        val indexXml = Sitemap.renderIndex(shards.keys.toSeq.sorted)
        // ——— ingest side: XML strings only from here on ———
        Sitemap.parseIndex(indexXml).iterator.flatMap { shardLoc =>
          val par = shardLoc.substring(shardLoc.indexOf("shard-") + 6).stripSuffix(".xml").toInt
          Sitemap.parseUrlset(shards(shardLoc)).map { e =>
            val p    = UrlOps.parse(e.loc)
            val last = p.path.substring(p.path.lastIndexOf('/') + 1).stripSuffix(".html")
            (last.toLong, e.loc, e.lastmod, e.changefreq, e.priority, par)
          }
        }
      }.toDF("doc_id", "loc", "lastmod", "changefreq", "priority", "shard")
  }

  val webSitemapSql: String =
    s"""SELECT d.doc_id,
       |       ${Redirects.synthUrlExpr("d")} AS loc,
       |       '2026-01-' || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
       |       CASE d.doc_id % 4 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
       |            WHEN 2 THEN 'monthly' ELSE 'yearly' END AS changefreq,
       |       CAST((d.doc_id % 10) / 10.0 AS DOUBLE) AS priority,
       |       CAST(d.doc_id % 2 AS INT) AS shard
       |FROM documents d""".stripMargin

  /** `pipeline_web` — the crawl-ingest CAPSTONE: every member of the
    * family composed in ONE narrow pass per document, wire bytes to
    * training-ready row — WARC member write+read (gzip trailers
    * verified) → HTTP framing → HTML text extraction → outlink
    * extraction + RFC 3986 resolution → eTLD+1 classification →
    * robots admission for the doc's own path → canonical URL. No
    * shuffle anywhere: the capstone is the argument that the whole
    * ingest front end runs at scan speed, one task per WARC shard.
    * The oracle nests the members' analytic twins verbatim, so a
    * regression in ANY member flips the capstone hash too. */
  def pipelineWeb(s: SparkSession, dir: String): DataFrame =
    pipelineRowsOf(Tables.documents(s, dir))

  /** [[pipelineWeb]]'s extraction over an arbitrary documents-shaped
    * batch — the form [[graft.streaming.WebStream]] folds per ingest
    * batch (same narrow pass, batch-bounded input). */
  def pipelineRowsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        val policies = scala.collection.mutable.Map.empty[String, RobotsTxt.Policy]
        val recs = rows.map { case (id, text, lang, source) =>
          val uri = s"https://$source.example.com/$lang/doc/$id"
          (warcRecord(id, uri, buildHtml(id, text)), lang, source)
        }.toSeq
        val fileBytes = WarcCodec.writeGz(recs.iterator.map(_._1))
        // ——— ingest side: bytes + per-record (lang, source) only ———
        WarcCodec.readGz(fileBytes).iterator.zip(recs.iterator).map { case (r, (_, lang, source)) =>
          val (status, _, body) = HttpMessage.parseResponse(r.payload)
          val text  = HtmlText.extract(new String(body, UTF_8))
          val id    = r.targetUri.substring(r.targetUri.lastIndexOf('/') + 1).toLong
          val base  = synthUrl(id, lang, source)
          val p     = UrlOps.parse(base)
          val srcE1 = UrlOps.etld1(p.host)
          val links = HtmlText.links(buildLinksHtml(id, source)).map(UrlOps.resolve(base, _))
          val nExt  = links.count(u => UrlOps.etld1(UrlOps.parse(u).host) != srcE1)
          val policy = policies.getOrElseUpdate(source, RobotsTxt.parse(buildRobots(source)))
          val (ok, _) = RobotsTxt.evaluate(policy, "trainbot", p.path)
          (id, status, text, text.length.toLong, UrlOps.normalize(base), srcE1,
            links.size, nExt, if (ok) 1 else 0)
        }
      }.toDF("doc_id", "http_status", "text", "n_chars", "norm_url", "etld1",
             "n_links", "n_external", "allowed")
  }

  val pipelineWebSql: String =
    urlOracleCte +
    """,
      |x AS (
      |  SELECT doc_id,
      |         trim('doc ' || doc_id || ' & ' ||
      |              trim(regexp_replace(text, '\s+', ' ', 'g'))) AS xt
      |  FROM documents)
      |SELECT u.doc_id,
      |       CAST(200 AS INT) AS http_status,
      |       x.xt AS text,
      |       CAST(length(x.xt) AS BIGINT) AS n_chars,
      |       'https://' || sub || source || '.' || sfx || prt || '/' || lang ||
      |         '/doc/' || u.doc_id || ext || qry AS norm_url,
      |       source || '.' || sfx AS etld1,
      |       CAST(3 AS INT) AS n_links,
      |       -- shapes 0 and 3 are the external ones; of j=0,1,2 with
      |       -- shape=(doc_id+j)%6, externals happen iff doc_id%6 hits
      |       -- {0,3} shifted by j: exactly the count below
      |       CAST((CASE WHEN (u.doc_id + 0) % 6 IN (0, 3) THEN 1 ELSE 0 END)
      |          + (CASE WHEN (u.doc_id + 1) % 6 IN (0, 3) THEN 1 ELSE 0 END)
      |          + (CASE WHEN (u.doc_id + 2) % 6 IN (0, 3) THEN 1 ELSE 0 END) AS INT) AS n_external,
      |       CAST(CASE WHEN lang = 'es' OR u.doc_id % 4 <> 0 THEN 1 ELSE 0 END AS INT) AS allowed
      |FROM u JOIN x ON u.doc_id = x.doc_id""".stripMargin

  /** Oracle for `stream_web` — [[pipelineWebSql]] nested VERBATIM as
    * `base` (a member regression flips this capstone's hash too), then
    * the min-keeper fingerprint filter: keep the row whose doc_id is
    * the MIN over its content-body fingerprint (md5 of the text after
    * the ` & ` marker — [[graft.streaming.WebStream.fpCol]]'s twin;
    * DuckDB strpos ↔ Spark instr, both 1-based first-occurrence).
    * Built by plain concatenation (the stripMargin-eats-|| pitfall). */
  val streamWebSql: String =
    "WITH base AS (" + pipelineWebSql + "),\n" +
      "k AS (SELECT md5(substring(text, strpos(text, ' & ') + 3, " +
      graft.streaming.WebStream.FpPrefix + ")) AS fp, base.* FROM base),\n" +
      "keep AS (SELECT fp, MIN(doc_id) AS keeper FROM k GROUP BY 1)\n" +
      "SELECT k.fp, k.doc_id, k.http_status, k.text, k.n_chars, k.norm_url,\n" +
      "       k.etld1, k.n_links, k.n_external, k.allowed\n" +
      "FROM k JOIN keep ON k.fp = keep.fp AND k.doc_id = keep.keeper"

  /** `web_frontier_admitted` — the frontier a SCHEDULER may actually
    * fetch: [[webFrontier]]'s discovered-not-crawled URLs, each
    * internal target evaluated against ITS OWN domain's robots policy
    * on the resolved path (internal links share the page's source, so
    * the policy is the memoized per-source parse); external targets
    * are admitted by default — their policy belongs to the target's
    * fetch, not this corpus. Verdicts are per-URL-constant (same
    * canonical URL ⇒ same path ⇒ same rule), so the census groups
    * cleanly. */
  def webFrontierAdmitted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val links = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        val policies = scala.collection.mutable.Map.empty[String, RobotsTxt.Policy]
        rows.flatMap { case (id, lang, source) =>
          val base  = synthUrl(id, lang, source)
          val srcE1 = UrlOps.etld1(UrlOps.parse(base).host)
          HtmlText.links(buildLinksHtml(id, source)).map { href =>
            val url = UrlOps.resolve(base, href)
            val p   = UrlOps.parse(url)
            val (allowed, rule) =
              if (UrlOps.etld1(p.host) != srcE1) (1, "external")
              else {
                val policy = policies.getOrElseUpdate(source, RobotsTxt.parse(buildRobots(source)))
                val (ok, r) = RobotsTxt.evaluate(policy, "trainbot", p.path)
                (if (ok) 1 else 0, r)
              }
            (id, UrlOps.normalize(url), allowed, rule)
          }
        }
      }.toDF("doc_id", "norm", "allowed", "matched_rule")
    links.join(crawledOf(Tables.documents(s, dir)), Seq("norm"), "left_anti")
      .groupBy(col("norm"), col("allowed"), col("matched_rule"))
      .agg(count(lit(1)).as("n_refs"), min(col("doc_id")).as("first_seen"))
  }

  // verdicts per shape (trainbot group: Disallow /*.html$, Disallow
  // /es/, Allow /es/doc/): the only DISALLOWED frontier URL is the
  // query-only ref (shape 4) back to an .html page of a non-es doc —
  // everything else either matches the longer/tying Allow or no rule
  lazy val webFrontierAdmittedSql: String =
    frontierCtes.replace(
      """frontier AS (
        |  SELECT l.url AS norm, l.doc_id
        |  FROM links l LEFT JOIN crawled c ON l.url = c.norm
        |  WHERE c.norm IS NULL)""".stripMargin,
      """frontier AS (
        |  SELECT l.url AS norm, l.doc_id,
        |         CAST(CASE WHEN (l.doc_id + l.link_no) % 6 IN (0, 3) THEN 1
        |              WHEN (l.doc_id + l.link_no) % 6 = 4 AND l.doc_id % 4 = 0
        |                   AND d.lang <> 'es' THEN 0
        |              ELSE 1 END AS INT) AS allowed,
        |         CASE WHEN (l.doc_id + l.link_no) % 6 IN (0, 3) THEN 'external'
        |              WHEN d.lang = 'es' AND (l.doc_id + l.link_no) % 6 IN (1, 4, 5)
        |                   THEN '/es/doc/'
        |              WHEN (l.doc_id + l.link_no) % 6 = 4 AND l.doc_id % 4 = 0
        |                   THEN '/*.html$'
        |              ELSE '' END AS matched_rule
        |  FROM links l
        |  JOIN documents d ON d.doc_id = l.doc_id
        |  LEFT JOIN crawled c ON l.url = c.norm
        |  WHERE c.norm IS NULL)""".stripMargin) +
    """SELECT norm, allowed, matched_rule,
      |       CAST(COUNT(*) AS BIGINT) AS n_refs,
      |       MIN(doc_id) AS first_seen
      |FROM frontier GROUP BY 1, 2, 3""".stripMargin

  /** `web_domain_stats` — registrable-domain rollup (the per-domain
    * census behind domain caps and crawl mixing): one map-side-combined
    * aggregate over |eTLD+1| keys downstream of the narrow parse. */
  def webDomainStats(s: SparkSession, dir: String): DataFrame = {
    webUrlParse(s, dir)
      .groupBy(col("etld1"), col("public_suffix"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("subdomain") === "www").cast("long")).as("n_www"),
        sum((col("file_ext") === "html").cast("long")).as("n_html"),
        sum(col("n_params").cast("long")).as("sum_params"))
  }

  val webDomainStatsSql: String =
    urlOracleCte +
    """
      |SELECT source || '.' || sfx AS etld1, sfx AS public_suffix,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_www,
      |       CAST(SUM(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_html,
      |       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END) AS BIGINT) AS sum_params
      |FROM u GROUP BY 1, 2""".stripMargin

  /** `web_images` — the multimodal arm of crawl ingest: WARC response
    * records whose payloads are IMAGES, routed to the right pure-JVM
    * codec by MAGIC BYTES ([[graft.multimodal.Media.sniffImage]]), not
    * by the Content-Type header (real crawls lie; the gate still
    * asserts header/sniff agreement on its own well-formed synth so a
    * routing bug can't hide). Per document, doc_id mod 4 picks the
    * format — GIF (LZW indexed, grayscale palette), PNG (truecolor
    * DEFLATE), baseline JPEG on its exact block-constant subspace, or
    * TIFF (chunky RGB under TIFF's OWN MSB-first early-change LZW,
    * [[graft.multimodal.TiffCodec]]) — so one gate drives all four
    * decoders behind one dispatch. The oracle is a four-branch
    * analytic twin (each branch the format's own pixel-formula sum);
    * agreement proves sniff routing AND every decode chain, because a
    * misrouted or misdecoded image changes its row's sum.
    *
    * Scale shape: one WARC file per task, per-record O(pixels) decode,
    * zero shuffles — the [[webWarcExtract]] idiom with codec dispatch
    * in place of HTML extraction. */
  def webImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.{GifCodec, JpegCodec, Media, PngCodec, TiffCodec}
    val grayPal = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { rows =>
        val recs = rows.map { case (id, nc) =>
          val (mime, img) = (id % 4) match {
            case 0 =>
              val w = (nc % 15 + 1).toInt; val h = (id % 9 + 1).toInt
              val idx = Array.tabulate(w * h)(i =>
                ((id + 3L * (i % w) + 5L * (i / w)) % 256L).toByte)
              ("image/gif", GifCodec.encode(w, h, idx, grayPal))
            case 1 =>
              val w = (nc % 13 + 1).toInt; val h = (id % 11 + 1).toInt
              val rgb = new Array[Byte](w * h * 3)
              var i = 0
              while (i < rgb.length) {
                val p = i / 3
                rgb(i) = ((id + 3L * (p % w) + 5L * (p / w) + 7L * (i % 3)) % 256L).toByte
                i += 1
              }
              ("image/png", PngCodec.encode(w, h, rgb))
            case 2 =>
              val w = (nc % 3 + 1).toInt * 8; val h = (id % 2 + 1).toInt * 8
              val gray = Array.tabulate(w * h) { i =>
                val bx = (i % w) / 8; val by = (i / w) / 8
                (2L * ((id + 11L * bx + 23L * by) % 128L)).toByte
              }
              ("image/jpeg", JpegCodec.encodeGray(w, h, gray, quality = 50))
            case _ =>
              val w = (nc % 7 + 1).toInt; val h = (id % 5 + 1).toInt
              val rgb = new Array[Byte](w * h * 3)
              var i = 0
              while (i < rgb.length) {
                val p = i / 3
                rgb(i) = ((id + 13L * (p % w) + 17L * (p / w) + 7L * (i % 3)) % 256L).toByte
                i += 1
              }
              ("image/tiff", TiffCodec.encode(w, h, rgb, lzw = true))
          }
          val http = HttpMessage.response(200, "OK", Seq(
            "Content-Type" -> mime), img)
          WarcRecord(Map(
            "WARC-Type"       -> "response",
            "WARC-Record-ID"  -> s"<urn:uuid:img-$id>",
            "WARC-Date"       -> "2026-01-01T00:00:00Z",
            "WARC-Target-URI" -> s"https://img.example.com/asset/$id",
            "Content-Type"    -> "application/http; msgtype=response"), http)
        }
        val fileBytes = WarcCodec.writeGz(recs)
        // ——— ingest side: bytes only; format from MAGIC, not headers
        // (the shared sniff-route-decode dispatch: Media
        // .decodeCanonicalRgb, the same helper ImageStream keys on) ———
        WarcCodec.readGz(fileBytes).iterator.map { r =>
          val (_, hdrs, body) = HttpMessage.parseResponse(r.payload)
          val uri = r.targetUri
          val id = uri.substring(uri.lastIndexOf('/') + 1).toLong
          val (fmt, w, h, rgb) = Media.decodeCanonicalRgb(body)
          require(hdrs.get("content-type").contains(s"image/$fmt"),
            s"sniffed $fmt disagrees with ${hdrs.get("content-type")} for asset $id")
          var sum = 0L; var i = 0
          while (i < rgb.length) { sum += rgb(i) & 0xFF; i += 3 } // R channel
          (id, fmt, w, h, sum)
        }
      }.toDF("doc_id", "fmt", "width", "height", "sum_px")
  }

  /** Analytic twin: per format branch, the format's own pixel formula
    * summed directly — no WARC, HTTP, or codec involved. */
  val webImagesSql: String =
    """WITH gifd AS (
      |  SELECT doc_id, CAST(n_chars % 15 + 1 AS INT) AS width,
      |         CAST(doc_id % 9 + 1 AS INT) AS height
      |  FROM documents WHERE doc_id % 4 = 0),
      |gif AS (
      |  SELECT doc_id, 'gif' AS fmt, width, height,
      |         CAST(SUM((doc_id + 3 * x + 5 * y) % 256) AS BIGINT) AS sum_px
      |  FROM gifd,
      |       LATERAL (SELECT unnest(generate_series(0, width - 1)) AS x) tx,
      |       LATERAL (SELECT unnest(generate_series(0, height - 1)) AS y) ty
      |  GROUP BY 1, 2, 3, 4),
      |pngd AS (
      |  SELECT doc_id, CAST(n_chars % 13 + 1 AS INT) AS width,
      |         CAST(doc_id % 11 + 1 AS INT) AS height
      |  FROM documents WHERE doc_id % 4 = 1),
      |png AS (
      |  SELECT doc_id, 'png' AS fmt, width, height,
      |         CAST(SUM((doc_id + 3 * x + 5 * y) % 256) AS BIGINT) AS sum_px
      |  FROM pngd,
      |       LATERAL (SELECT unnest(generate_series(0, width - 1)) AS x) tx,
      |       LATERAL (SELECT unnest(generate_series(0, height - 1)) AS y) ty
      |  GROUP BY 1, 2, 3, 4),
      |jpgd AS (
      |  SELECT doc_id, CAST(n_chars % 3 + 1 AS BIGINT) AS wb,
      |         CAST(doc_id % 2 + 1 AS BIGINT) AS hb
      |  FROM documents WHERE doc_id % 4 = 2),
      |jpg AS (
      |  SELECT doc_id, 'jpeg' AS fmt,
      |         CAST(wb * 8 AS INT) AS width, CAST(hb * 8 AS INT) AS height,
      |         CAST(64 * SUM(2 * ((doc_id + 11 * bx + 23 * by) % 128)) AS BIGINT) AS sum_px
      |  FROM jpgd,
      |       LATERAL (SELECT unnest(generate_series(0, wb - 1)) AS bx) tx,
      |       LATERAL (SELECT unnest(generate_series(0, hb - 1)) AS by) ty
      |  GROUP BY 1, 2, 3, 4),
      |tifd AS (
      |  SELECT doc_id, CAST(n_chars % 7 + 1 AS INT) AS width,
      |         CAST(doc_id % 5 + 1 AS INT) AS height
      |  FROM documents WHERE doc_id % 4 = 3),
      |tif AS (
      |  SELECT doc_id, 'tiff' AS fmt, width, height,
      |         CAST(SUM((doc_id + 13 * x + 17 * y) % 256) AS BIGINT) AS sum_px
      |  FROM tifd,
      |       LATERAL (SELECT unnest(generate_series(0, width - 1)) AS x) tx,
      |       LATERAL (SELECT unnest(generate_series(0, height - 1)) AS y) ty
      |  GROUP BY 1, 2, 3, 4)
      |SELECT * FROM gif UNION ALL SELECT * FROM png
      |UNION ALL SELECT * FROM jpg UNION ALL SELECT * FROM tif""".stripMargin
}
