package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Paragraph-level exact dedup: the C4/RefinedWeb cleaning step that
  * DOCUMENT-level dedup cannot express — boilerplate paragraphs (nav
  * bars, license footers, "terms of service" blocks) repeat across
  * millions of otherwise-distinct pages, so the unit of dedup drops
  * below the document: split every doc into paragraphs, keep each
  * distinct paragraph's FIRST occurrence corpus-wide (min (doc_id,
  * position)), and re-emit every document with only its kept
  * paragraphs. The reference's wc/indexer apps (`mrapps/wc.go:18-30`,
  * `mrapps/indexer.go:24-40`) establish the same corpus-wide
  * "explode text, group by content unit" dataflow at word granularity;
  * this is that shape one level up, with a reassembly reduce.
  *
  * The synthetic fixtures carry no newline structure, so "paragraph"
  * is a fixed window of [[ParaWords]] normalized words (the
  * [[TextAnalysis.taChunkFp]] convention: deterministic, engine-
  * replayable segmentation); on real corpora the segmentation column
  * is `split(text, '\n\n')` and everything downstream is unchanged.
  *
  * 100-TB shape — the keeper rule is ONE aggregation, no window and no
  * join-back: `groupBy(paragraph).agg(min(struct(doc_id, chunk_id)))`
  * both DECIDES the winner and IS the kept-occurrence set, because the
  * min struct carries the winner's coordinates. min(struct) partial-
  * aggregates map-side, so a paragraph repeated 10⁸ times ("all rights
  * reserved…") combines to one row per partition before the exchange —
  * the exact hot-key shape that makes a row_number()-over-paragraph
  * window plan (the obvious alternative, and the DuckDB twin's
  * two-step min) an unsplittable single-task straggler at scale.
  * Reassembly then groups WINNERS ONLY by doc_id (≤ one row per
  * original paragraph slot), and the doc-level stats join is on the
  * high-cardinality doc_id key. Shuffle volume: one exchange keyed by
  * paragraph text (combinable), one by doc_id — both linear in the
  * corpus, neither skew-prone.
  */
object ParagraphDedup {

  /** Fixed paragraph width in normalized words (no newlines in the
    * synthetic corpus; see scaladoc). */
  val ParaWords = 8

  /** (doc_id, chunk_id, chunk) — every doc segmented into
    * [[ParaWords]]-word paragraphs; docs whose text normalizes to
    * nothing contribute no rows. */
  private[graft] def paragraphs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        split(TextAnalysis.normalized(col("text")), " ").as("w"))
      .where(size(col("w")) >= 1 && element_at(col("w"), 1) =!= "")
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ceil(size(col("w")) / lit(ParaWords.toDouble)).cast("int") - 1),
          c => concat_ws(" ", slice(col("w"), c * lit(ParaWords) + 1, lit(ParaWords)))))
          .as(Seq("chunk_id", "chunk")))

  /** Corpus-wide first-occurrence paragraph dedup over any (doc_id,
    * text) frame. Returns one row per doc that has at least one
    * paragraph: (doc_id, n_chunks, n_kept, clean_text) where
    * clean_text re-joins the KEPT paragraphs in original order ('' if
    * every paragraph of the doc first appeared elsewhere). */
  def paragraphDedupOver(docs: DataFrame): DataFrame = {
    val chunks = paragraphs(docs)
    // the min struct IS the kept occurrence: no window, no join-back
    val kept = chunks.groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.chunk_id").as("chunk_id"),
        col("chunk"))
    val keptAgg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean_text"))
    chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def dedupParagraph(s: SparkSession, dir: String): DataFrame =
    paragraphDedupOver(Tables.documents(s, dir))

  /** Incremental member of the paragraph lens (the daily-crawl shape
    * every other dedup family already has): an ARRIVAL BATCH is
    * deduped against a standing snapshot — a batch paragraph drops if
    * the snapshot contains it anywhere, else the within-batch
    * first-occurrence rule applies. Genuine two-table entry; the gate
    * uses the shared doc_id % [[Cleaning.IncomingMod]] split as the
    * deterministic stand-in (batch = residue 0).
    *
    * Scale: the snapshot contributes only its DISTINCT paragraph set
    * (at steady state that set is a stored table keyed by paragraph —
    * the anti-join co-locates with no snapshot re-shuffle; here it is
    * derived in-query, so the gate's wall time charges snapshot
    * construction too, like `dedup_cc_incr`). The batch side is
    * batch-bounded throughout: anti-join, min-struct keeper, and
    * reassembly all touch batch paragraphs only. */
  def paragraphDedupIncrVs(batch: DataFrame, snapshot: DataFrame): DataFrame =
    paragraphDedupAgainst(batch, paragraphs(snapshot).select(col("chunk")).distinct())

  /** The batch-bounded kernel: dedup `batch` against an explicit
    * known-paragraph set (one `chunk` column — at steady state, the
    * stored seen-paragraph table a streaming pipeline maintains; see
    * [[graft.streaming.ParagraphStream]]). */
  /** The batch's KEPT chunk texts (one `chunk` column) — what a
    * maintained seen-paragraph table appends after processing the
    * batch. Distinct by construction (each kept chunk is a keeper). */
  private[graft] def keptChunksAgainst(batch: DataFrame, known: DataFrame): DataFrame =
    paragraphs(batch).join(known, Seq("chunk"), "left_anti")
      .select(col("chunk")).distinct()

  /** ONE-PASS batch processing for sinks that need BOTH outputs: the
    * paragraph split and the seen anti-join run once (localCheckpointed
    * — the cleaned write and the seen-append are separate actions, and
    * without materialization each would re-run the split + anti-join,
    * doubling the dominant per-batch cost). Returns (cleaned batch,
    * kept chunk texts). */
  private[graft] def processAgainst(batch: DataFrame, known: DataFrame)
      : (DataFrame, DataFrame) = {
    val bp = graft.Graft.compactCheckpoint(paragraphs(batch))
    val fresh = graft.Graft.compactCheckpoint(
      bp.join(known, Seq("chunk"), "left_anti"))
    (cleanedFrom(bp, fresh), fresh.select(col("chunk")).distinct())
  }

  private[graft] def paragraphDedupAgainst(batch: DataFrame, known: DataFrame): DataFrame = {
    val bp = paragraphs(batch)
    cleanedFrom(bp, bp.join(known, Seq("chunk"), "left_anti"))
  }

  /** Cleaned-batch assembly from the (already anti-joined) fresh
    * paragraph stream — shared by the single-output and one-pass
    * entries so the keeper rule has exactly one definition. */
  private def cleanedFrom(bp: DataFrame, fresh: DataFrame): DataFrame = {
    val kept = fresh.groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.chunk_id").as("chunk_id"),
        col("chunk"))
    val keptAgg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean_text"))
    bp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def dedupParagraphIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    paragraphDedupIncrVs(
      docs.where(col("doc_id") % Cleaning.IncomingMod === 0),
      docs.where(col("doc_id") % Cleaning.IncomingMod =!= 0))
  }

  val dedupParagraphIncrSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id,
       |         string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |chunks AS (
       |  SELECT doc_id, c AS chunk_id,
       |         array_to_string(w[(c*$ParaWords+1):(c*$ParaWords+$ParaWords)], ' ') AS chunk
       |  FROM docs, LATERAL (SELECT unnest(generate_series(0,
       |         CAST(ceil(len(w) / $ParaWords.0) AS INT) - 1)) AS c) t
       |  WHERE len(w) >= 1 AND w[1] <> ''),
       |bp AS (SELECT * FROM chunks WHERE doc_id % ${Cleaning.IncomingMod} = 0),
       |known AS (SELECT DISTINCT chunk FROM chunks
       |          WHERE doc_id % ${Cleaning.IncomingMod} <> 0),
       |fresh AS (SELECT * FROM bp WHERE chunk NOT IN (SELECT chunk FROM known)),
       |win_doc AS (SELECT chunk, MIN(doc_id) AS kd FROM fresh GROUP BY chunk),
       |kept AS (
       |  SELECT c.chunk, w.kd AS doc_id, MIN(c.chunk_id) AS chunk_id
       |  FROM fresh c JOIN win_doc w ON c.chunk = w.chunk AND c.doc_id = w.kd
       |  GROUP BY c.chunk, w.kd),
       |kept_agg AS (
       |  SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_kept,
       |         string_agg(chunk, ' ' ORDER BY chunk_id) AS clean_text
       |  FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_chunks
       |        FROM bp GROUP BY doc_id)
       |SELECT t.doc_id, t.n_chunks,
       |       COALESCE(k.n_kept, 0) AS n_kept,
       |       COALESCE(k.clean_text, '') AS clean_text
       |FROM tot t LEFT JOIN kept_agg k ON t.doc_id = k.doc_id""".stripMargin

  /** DuckDB twin. The two-step min (min doc_id, then min chunk_id
    * within it) is exact lexicographic min(struct) — the oracle may
    * use the straggler-prone shape; the Spark plan must not. */
  val dedupParagraphSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id,
       |         string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |chunks AS (
       |  SELECT doc_id, c AS chunk_id,
       |         array_to_string(w[(c*$ParaWords+1):(c*$ParaWords+$ParaWords)], ' ') AS chunk
       |  FROM docs, LATERAL (SELECT unnest(generate_series(0,
       |         CAST(ceil(len(w) / $ParaWords.0) AS INT) - 1)) AS c) t
       |  WHERE len(w) >= 1 AND w[1] <> ''),
       |win_doc AS (SELECT chunk, MIN(doc_id) AS kd FROM chunks GROUP BY chunk),
       |kept AS (
       |  SELECT c.chunk, w.kd AS doc_id, MIN(c.chunk_id) AS chunk_id
       |  FROM chunks c JOIN win_doc w ON c.chunk = w.chunk AND c.doc_id = w.kd
       |  GROUP BY c.chunk, w.kd),
       |kept_agg AS (
       |  SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_kept,
       |         string_agg(chunk, ' ' ORDER BY chunk_id) AS clean_text
       |  FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_chunks
       |        FROM chunks GROUP BY doc_id)
       |SELECT t.doc_id, t.n_chunks,
       |       COALESCE(k.n_kept, 0) AS n_kept,
       |       COALESCE(k.clean_text, '') AS clean_text
       |FROM tot t LEFT JOIN kept_agg k ON t.doc_id = k.doc_id""".stripMargin
}
