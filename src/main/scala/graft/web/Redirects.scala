package graft.web

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** HTTP redirect-chain resolution at corpus scale.
  *
  * A crawl's URL table is full of 3xx hops (http→https, www
  * canonicalization, moved pages); analytics want every URL mapped to
  * its FINAL destination with the hop count. Following chains one hop
  * per round is O(longest chain) shuffles — a 30-hop chain is 30
  * full-table joins. This operator resolves by POINTER DOUBLING
  * (path halving): each round every unresolved row replaces its
  * pointer with its pointer's pointer and adds the pointed row's
  * accumulated hops, so reach doubles per round and ⌈log₂ maxChain⌉
  * rounds finish — 5 shuffles for a 32-hop chain, 64 TB or 64 MB
  * alike. A post-loop canary REQUIREs zero unresolved rows, so a
  * deeper-than-cap chain at a new scale fails loudly instead of
  * shipping a wrong final URL (the fixed-round-iteration lesson from
  * the graph family, SURVEY §8).
  *
  * Synthesis: doc `id` is terminal (HTTP 200) when id % 16 == 0, else
  * it 301-redirects to id−1 — chains up to 15 hops, crossing page
  * attribute boundaries (www/port/ext/query change along the chain).
  * The oracle computes the closed form; Spark has to walk the graph.
  */
object Redirects {

  val Rounds = 4 // 2^4 = 16 ≥ the 15-hop max chain

  def webRedirects(s: SparkSession, dir: String): DataFrame =
    webRedirects(s, dir, Rounds)

  /** `rounds` injectable so the spec can prove the canary FIRES on a
    * deeper-than-2^rounds chain (not only that it stays quiet). */
  def webRedirects(s: SparkSession, dir: String, rounds: Int): DataFrame = {
    import s.implicits._
    val pages = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, lang, source) => (id, WebIngest.synthUrl(id, lang, source)) }
      .toDF("doc_id", "url")

    var p = pages.select(
      col("doc_id"),
      when(col("doc_id") % 16 === 0, col("doc_id")).otherwise(col("doc_id") - 1).as("ptr"),
      when(col("doc_id") % 16 === 0, lit(0L)).otherwise(lit(1L)).as("hops"),
      (col("doc_id") % 16 === 0).as("done"))
    for (_ <- 1 to rounds) {
      val q = p.select(col("doc_id").as("p_src"), col("ptr").as("p_ptr"),
        col("hops").as("p_hops"), col("done").as("p_done"))
      p = p.join(q, col("ptr") === col("p_src"))
        .select(col("doc_id"),
          when(col("done"), col("ptr")).otherwise(col("p_ptr")).as("ptr"),
          when(col("done"), col("hops")).otherwise(col("hops") + col("p_hops")).as("hops"),
          (col("done") || col("p_done")).as("done"))
    }
    // materialize once: the canary count and the final joins are two
    // actions — without this the whole round tree recomputes per action
    p = graft.Graft.compactCheckpoint(p)
    // convergence canary — a chain deeper than 2^Rounds must fail
    // loudly, never ship a non-final "final" URL
    val unresolved = p.filter(!col("done")).count()
    require(unresolved == 0,
      s"$unresolved redirect chains unresolved after $rounds doubling rounds — raise rounds")

    p.join(pages, "doc_id")
      .join(pages.select(col("doc_id").as("final_doc"), col("url").as("final_url")),
        col("ptr") === col("final_doc"))
      .select(col("doc_id"), col("url"), col("final_doc"), col("final_url"), col("hops"),
        when(col("hops") === 0, lit(200)).otherwise(lit(301)).cast("int").as("status"))
  }

  /** The synthUrl construction as a DuckDB expression over alias `a`
    * (mirrors [[WebIngest.synthUrl]] verbatim). */
  private[web] def synthUrlExpr(a: String): String =
    s"'https://' || (CASE WHEN $a.doc_id % 3 = 0 THEN 'www.' ELSE '' END) || " +
    s"$a.source || '.' || " +
    s"(CASE $a.doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'co.uk' " +
    s"WHEN 3 THEN 'github.io' ELSE 'gov.au' END) || " +
    s"(CASE WHEN $a.doc_id % 11 = 0 THEN ':8443' ELSE '' END) || " +
    s"'/' || $a.lang || '/doc/' || $a.doc_id || " +
    s"(CASE WHEN $a.doc_id % 4 = 0 THEN '.html' ELSE '' END) || " +
    s"(CASE WHEN $a.doc_id % 2 = 0 THEN '?ref=' || $a.source || '&page=' || ($a.doc_id % 7) ELSE '' END) || " +
    s"(CASE WHEN $a.doc_id % 9 = 0 THEN '#s2' ELSE '' END)"

  val webRedirectsSql: String =
    s"""SELECT d.doc_id,
       |       ${synthUrlExpr("d")} AS url,
       |       d.doc_id - (d.doc_id % 16) AS final_doc,
       |       ${synthUrlExpr("fd")} AS final_url,
       |       CAST(d.doc_id % 16 AS BIGINT) AS hops,
       |       CAST(CASE WHEN d.doc_id % 16 = 0 THEN 200 ELSE 301 END AS INT) AS status
       |FROM documents d JOIN documents fd ON fd.doc_id = d.doc_id - (d.doc_id % 16)""".stripMargin
}
