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
          (id, uri, status, hdrs.getOrElse("Content-Type", ""), text, text.length.toLong)
        }
      }.toDF("doc_id", "uri", "http_status", "content_type", "text", "n_chars")
  }

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
}
