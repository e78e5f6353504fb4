package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for an LLM training-data pipeline: quality
  * scoring, tokenizer statistics, heuristic language ID, and document
  * fingerprinting. All per-document, single-scan, codegen'd built-ins —
  * the shape that streams through 100 TB without a shuffle (the only
  * shuffle here is lang-ID's per-doc token aggregation).
  *
  * Cross-engine determinism: ratios/scores use only single IEEE-754
  * double ops on identical integer inputs (no transcendentals, whose
  * libm implementations differ per engine), so DuckDB hash-matches.
  */
object TextAnalysis {

  /** count of chars matching a character class: strip them, diff the
    * lengths. `cls` is the POSITIVE class (e.g. "[0-9]"). */
  private def classCount(c: Column, cls: String): Column =
    (length(c) - length(regexp_replace(c, cls, ""))).cast("long")

  // ---------------------------------------------------------- quality
  /** Per-document quality statistics + composite score
    * (length / punctuation / letter ratios — the classic cheap filters
    * applied before expensive dedup/model scoring). */
  def taQuality(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val nChars = length(t).cast("long")
    val nLetters = classCount(t, "[\\p{L}]")
    val nPunct = classCount(t, "[,.;:!?]")
    val nDigits = classCount(t, "[0-9]")
    val nWs = size(regexp_extract_all(t, lit("\\S+"), lit(0))).cast("long")
    // an empty document has no defined ratios: emit 0 explicitly — an
    // unguarded 0.0/0.0 is NaN in Spark but NULL in DuckDB, so the two
    // engines diverge exactly on the zero-length docs a raw crawl has
    val letterRatio = when(nChars === 0, lit(0.0))
      .otherwise(nLetters.cast("double") / nChars.cast("double"))
    val punctRatio = when(nChars === 0, lit(0.0))
      .otherwise(nPunct.cast("double") / nChars.cast("double"))
    val lenScore = least(lit(1.0), nWs.cast("double") / lit(100.0))
    Tables.documentsWide(s, dir).select(
      col("doc_id"),
      nChars.as("n_chars"),
      nLetters.as("n_letters"),
      nPunct.as("n_punct"),
      nDigits.as("n_digits"),
      nWs.as("n_ws_tokens"),
      letterRatio.as("letter_ratio"),
      (lit(0.5) * letterRatio + lit(0.2) * (lit(1.0) - punctRatio)
        + lit(0.3) * lenScore).as("quality_score"))
  }

  val taQualitySql: String =
    """SELECT doc_id,
      |  CAST(LENGTH(text) AS BIGINT) AS n_chars,
      |  CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\p{L}]', '', 'g')) AS BIGINT) AS n_letters,
      |  CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[,.;:!?]', '', 'g')) AS BIGINT) AS n_punct,
      |  CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
      |  (CASE WHEN LENGTH(text) = 0 THEN 0.0
      |        ELSE CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\p{L}]', '', 'g')) AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) END) AS letter_ratio,
      |  (0.5 * (CASE WHEN LENGTH(text) = 0 THEN 0.0
      |          ELSE CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\p{L}]', '', 'g')) AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) END)
      |   + 0.2 * (1.0 - (CASE WHEN LENGTH(text) = 0 THEN 0.0
      |            ELSE CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[,.;:!?]', '', 'g')) AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) END))
      |   + 0.3 * LEAST(1.0, CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 100.0)) AS quality_score
      |FROM documents""".stripMargin

  // ------------------------------------------------------ token_count
  /** Tokenizer battery: whitespace tokens, letter-run words, and a
    * BPE-ish regex segmentation (letter runs | digit runs | single
    * non-space symbol — the pre-tokenizer shape GPT-style BPE uses). */
  def taTokenCount(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documentsWide(s, dir).select(
      col("doc_id"),
      size(regexp_extract_all(t, lit("\\S+"), lit(0))).cast("long").as("n_ws"),
      size(regexp_extract_all(t, lit("[\\p{L}]+"), lit(0))).cast("long").as("n_words"),
      size(regexp_extract_all(t, lit("[\\p{L}]+|[0-9]+|[^\\s\\p{L}0-9]"), lit(0)))
        .cast("long").as("n_bpe"))
  }

  val taTokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[\p{L}]+')) AS BIGINT) AS n_words,
      |  CAST(len(regexp_extract_all(text, '[\p{L}]+|[0-9]+|[^\s\p{L}0-9]')) AS BIGINT) AS n_bpe
      |FROM documents""".stripMargin

  // ---------------------------------------------------------- lang_id
  /** Heuristic language ID: marker-stopword votes per language, argmax
    * with a fixed precedence for ties. One explode + one per-doc agg —
    * the distributed shape; a real model would swap in richer n-gram
    * tables, the plumbing stays identical. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "los", "una", "que", "por", "con"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "pour"),
    "zh" -> Seq("de", "shi", "bu", "zai", "you"))

  def taLangId(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documentsWide(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), "[^\\p{L}]+")).as("w"))
      .where(col("w") =!= "")
    val scores = markers.map { case (l, ws) =>
      sum(when(col("w").isInCollection(ws), 1L).otherwise(0L)).as(s"s_$l")
    }
    val sc = toks.groupBy(col("doc_id"), col("lang")).agg(scores.head, scores.tail: _*)
    val Seq(en, de, es, fr, zh) = markers.map(m => col(s"s_${m._1}"))
    sc.select(col("doc_id"), col("lang").as("labeled_lang"),
        en.as("s_en"), de.as("s_de"), es.as("s_es"), fr.as("s_fr"), zh.as("s_zh"),
        when(en >= de && en >= es && en >= fr && en >= zh, "en")
          .when(de >= es && de >= fr && de >= zh, "de")
          .when(es >= fr && es >= zh, "es")
          .when(fr >= zh, "fr")
          .otherwise("zh").as("predicted_lang"))
  }

  val taLangIdSql: String = {
    def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
    val m = markers.toMap
    s"""WITH toks AS (
       |  SELECT doc_id, lang, unnest(string_split_regex(lower(text), '[^\\p{L}]+')) AS w
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id, lang,
       |    CAST(SUM(CASE WHEN w IN (${inList(m("en"))}) THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
       |    CAST(SUM(CASE WHEN w IN (${inList(m("de"))}) THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
       |    CAST(SUM(CASE WHEN w IN (${inList(m("es"))}) THEN 1 ELSE 0 END) AS BIGINT) AS s_es,
       |    CAST(SUM(CASE WHEN w IN (${inList(m("fr"))}) THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
       |    CAST(SUM(CASE WHEN w IN (${inList(m("zh"))}) THEN 1 ELSE 0 END) AS BIGINT) AS s_zh
       |  FROM toks WHERE w <> '' GROUP BY doc_id, lang)
       |SELECT doc_id, lang AS labeled_lang, s_en, s_de, s_es, s_fr, s_zh,
       |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       |       WHEN s_fr >= s_zh THEN 'fr'
       |       ELSE 'zh' END AS predicted_lang
       |FROM sc""".stripMargin
  }

  // ------------------------------------------------------ fingerprint
  /** Document fingerprints: md5 of the whitespace-normalized text
    * (exact-dup key) and md5 of the sorted distinct token bag
    * (reorder-invariant dup key). MD5 is bit-identical across engines,
    * making fingerprints portable join keys between systems. */
  def normalized(t: Column): Column =
    trim(regexp_replace(lower(t), "[^\\p{L}]+", " "))

  /** THE word-n-gram explode idiom, in one place (five operators use
    * it: shingles, decontaminate, repetition, bigrams, substring-dup):
    * `explode([array_distinct(]transform(sequence(0, size(w) - n),
    * i -> concat_ws(' ', w[i], …, w[i+n-1]))[)])` over a tokenized
    * column named `w`. `distinctPerDoc` picks set semantics (dedup /
    * decontamination overlap) vs multiplicity (LM counts, span mass).
    * Callers must pre-filter `size(w) >= n` — sequence(0, negative)
    * silently counts DOWN and would emit garbage grams from null
    * subscripts (concat_ws skips nulls), and the short-doc row set
    * differs per operator. */
  private[operators] def gramExplodeExpr(n: Int, distinctPerDoc: Boolean): String = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    val ws = (0 until n).map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(", ")
    val t = s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', $ws))"
    s"explode(${if (distinctPerDoc) s"array_distinct($t)" else t})"
  }

  def taFingerprint(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, dir).select(
      col("doc_id"),
      md5(normalized(t)).as("fp_norm"),
      md5(array_join(array_sort(array_distinct(
        split(normalized(t), " "))), " ")).as("fp_bag"))
  }

  // --------------------------------------------- rolling-hash chunks
  /** Content-defined chunking via a Rabin-style rolling hash: a chunk
    * boundary falls wherever the rolling polynomial hash of the last
    * [[ChunkWin]] code points hits 0 mod [[ChunkMod]] (expected chunk
    * ≈ ChunkMod code points). Chunk fingerprints survive insertions /
    * deletions elsewhere in the document — the primitive for
    * partial-duplicate detection at scale (dedup storage, diff-aware
    * pipelines). Per-partition kernel work; no shuffle.
    *
    * The unit is the UNICODE CODE POINT (not the UTF-8 byte) and the
    * chunk fingerprint is md5 of the chunk's comma-joined decimal code
    * points — both choices make the operator exactly reproducible in
    * SQL engines (no byte access, no 64-bit wraparound), so the DuckDB
    * oracle hash-checks the full output: the window hash is rewritten
    * as a plain windowed SUM via modular inverses
    * (roll(i) = Σ_{j=i-15..i} cp_j·257^(i-j)
    *          = 257^i · Σ cp_j·257^(-j)  mod M),
    * needing only a powers table (one-row-per-level recursive CTE).
    * ChunkingSpec asserts the CDC properties (boundary re-sync after a
    * prefix edit).
    */
  val ChunkWin = 16
  val ChunkMod = 64
  private val RollBase = 257L
  private val RollMod = 1000000007L
  /** 257⁻¹ mod M — lets the oracle turn the position-dependent window
    * polynomial into a prefix-summable series. */
  private val RollInv: Long =
    BigInt(RollBase).modPow(BigInt(RollMod - 2), BigInt(RollMod)).toLong

  def chunkFingerprints(text: String): Seq[String] = {
    val cps: Array[Int] = text.codePoints().toArray
    if (cps.isEmpty) return Seq.empty
    // precompute base^(win-1) for the rolling removal
    var pow = 1L
    for (_ <- 1 until ChunkWin) pow = pow * RollBase % RollMod
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val chunk = new StringBuilder
    var roll = 0L
    var i = 0
    while (i < cps.length) {
      val c = cps(i).toLong
      // drop the code point leaving the window (coefficient
      // base^(win-1)) BEFORE shifting, so `roll` is always the
      // window's polynomial hash
      if (i >= ChunkWin)
        roll = (roll - cps(i - ChunkWin) * pow % RollMod + RollMod) % RollMod
      roll = (roll * RollBase + c) % RollMod
      if (chunk.nonEmpty) chunk.append(',')
      chunk.append(c)
      if ((i >= ChunkWin - 1 && roll % ChunkMod == 0) || i == cps.length - 1) {
        md.reset()
        out += md.digest(chunk.toString.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        chunk.clear()
      }
      i += 1
    }
    out.toSeq
  }

  def taChunkFp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documentsWide(s, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val fps = chunkFingerprints(text)
        // serialized fingerprint list (not ArrayType) keeps the output
        // hashable by row-compare harnesses; chunking runs distributed
        (id, fps.length.toLong, fps.mkString(","))
      })
      .toDF("doc_id", "n_chunks", "chunk_fps")
  }

  /** DuckDB twin of [[taChunkFp]]. Per (doc, position) grid over code
    * points; roll(i) = windowed SUM of cp_j·257⁻ʲ, re-multiplied by
    * 257ⁱ (see [[chunkFingerprints]] doc); boundary positions close
    * chunks; chunk fp = md5 of the comma-joined code points. All
    * intermediates < 2⁶³ (window sum ≤ 16·M; (sum mod M)·powᵢ < M²). */
  val taChunkFpSql: String =
    s"""WITH RECURSIVE chars AS (
       |  SELECT doc_id, regexp_extract_all(text, '.', 0, 's') AS cs FROM documents),
       |maxlen AS (SELECT COALESCE(MAX(len(cs)), 0) AS ml FROM chars),
       |powers(i, p, ip) AS (
       |  SELECT 0, CAST(1 AS BIGINT), CAST(1 AS BIGINT)
       |  UNION ALL
       |  SELECT i + 1, (p * $RollBase) % $RollMod, (ip * $RollInv) % $RollMod
       |  FROM powers WHERE i < (SELECT ml FROM maxlen)),
       |grid AS (
       |  SELECT doc_id, i, unicode(cs[i]) AS cp, len(cs) AS n
       |  FROM chars, LATERAL (SELECT unnest(generate_series(1, len(cs))) AS i) t),
       |cser AS (
       |  SELECT g.doc_id, g.i, g.n, g.cp, (g.cp * powers.ip) % $RollMod AS cmod
       |  FROM grid g JOIN powers ON powers.i = g.i - 1),
       |w AS (
       |  SELECT doc_id, i, n, cp,
       |    SUM(cmod) OVER (PARTITION BY doc_id ORDER BY i
       |                    ROWS BETWEEN ${ChunkWin - 1} PRECEDING AND CURRENT ROW) AS wsum
       |  FROM cser),
       |r AS (
       |  SELECT w.doc_id, w.i, w.n, w.cp,
       |    ((w.wsum % $RollMod) * powers.p) % $RollMod AS roll
       |  FROM w JOIN powers ON powers.i = w.i - 1),
       |b AS (
       |  SELECT doc_id, i, cp,
       |    CASE WHEN (i >= $ChunkWin AND roll % $ChunkMod = 0) OR i = n
       |         THEN 1 ELSE 0 END AS is_b
       |  FROM r),
       |cid AS (
       |  SELECT doc_id, i, cp, is_b,
       |    COALESCE(SUM(is_b) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
       |  FROM b),
       |chunks AS (
       |  SELECT doc_id, chunk_idx,
       |    md5(string_agg(CAST(cp AS VARCHAR), ',' ORDER BY i)) AS fp
       |  FROM cid GROUP BY doc_id, chunk_idx),
       |perdoc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |    string_agg(fp, ',' ORDER BY chunk_idx) AS chunk_fps
       |  FROM chunks GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(p.n_chunks, 0) AS n_chunks,
       |  COALESCE(p.chunk_fps, '') AS chunk_fps
       |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id""".stripMargin

  val taFingerprintSql: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '[^\p{L}]+', ' ', 'g'))) AS fp_norm,
      |  md5(array_to_string(list_sort(list_distinct(
      |    string_split(trim(regexp_replace(lower(text), '[^\p{L}]+', ' ', 'g')), ' '))), ' ')) AS fp_bag
      |FROM documents""".stripMargin

  // -------------------------------------------------------- ta_lang_mix
  /** Code-switching / mixed-language detection — the routing signal
    * lang-ID's single verdict hides: a doc whose SECOND language's
    * marker mass is a substantial fraction of the first's is mixed
    * (bilingual boilerplate, quoted translations, wrong-language
    * spans), and single-language pipelines mis-handle it silently.
    * Melts the per-language marker scores of [[taLangId]]'s kernel to
    * (doc, lang, s) rows and ranks per doc — a DOC-bounded window (≤
    * |languages| rows per partition key, the window carve-out).
    * `is_mixed` = second's doubled mass reaches the top's and is
    * nonzero. Ties rank lexicographically (this op's own contract —
    * independent of lang-ID's fixed preference cascade). */
  def taLangMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = taLangId(s, dir)
    val langs = markers.map(_._1)
    val melted = base.select(col("doc_id"),
        explode(expr(
          s"array(${langs.map(l => s"struct('$l' as lang, s_$l as s)").mkString(", ")})"))
          .as("e"))
      .select(col("doc_id"), col("e.lang").as("lang"), col("e.s").as("s"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s").desc, col("lang"))
    melted.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 2)
      .groupBy(col("doc_id"))
      .agg(max(when(col("rk") === 1, col("lang"))).as("top_lang"),
        max(when(col("rk") === 1, col("s"))).as("s_top"),
        max(when(col("rk") === 2, col("lang"))).as("second_lang"),
        max(when(col("rk") === 2, col("s"))).as("s_second"))
      .select(col("doc_id"), col("top_lang"), col("s_top"),
        col("second_lang"), col("s_second"),
        (col("s_second") > 0 && col("s_second") * 2 >= col("s_top"))
          .cast("int").as("is_mixed"))
  }

  lazy val taLangMixSql: String = {
    val melt = markers.map(_._1)
      .map(l => s"SELECT doc_id, '$l' AS lang, s_$l AS s FROM base")
      .mkString("\n  UNION ALL ")
    s"""WITH base AS ($taLangIdSql),
       |m AS (
       |  $melt),
       |r AS (
       |  SELECT doc_id, lang, s,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rk
       |  FROM m)
       |SELECT doc_id,
       |       MAX(CASE WHEN rk = 1 THEN lang END) AS top_lang,
       |       MAX(CASE WHEN rk = 1 THEN s END) AS s_top,
       |       MAX(CASE WHEN rk = 2 THEN lang END) AS second_lang,
       |       MAX(CASE WHEN rk = 2 THEN s END) AS s_second,
       |       CAST(MAX(CASE WHEN rk = 2 THEN s END) > 0
       |        AND MAX(CASE WHEN rk = 2 THEN s END) * 2 >= MAX(CASE WHEN rk = 1 THEN s END)
       |          AS INT) AS is_mixed
       |FROM r WHERE rk <= 2
       |GROUP BY doc_id""".stripMargin
  }

  // ----------------------------------------------------- ta_langid_eval
  /** Classifier-quality evaluation of the language-ID heuristic
    * against the labeled `lang` column — the per-class confusion
    * summary (precision / recall) a pipeline reviews before trusting
    * lang-ID for routing or filtering. The eval-harness discipline of
    * `sim_recall_eval`/`dedup_recall_eval` applied to a classifier:
    * integer hit counts hash-check, each rate is ONE IEEE division.
    *
    * Scale: two tiny aggregations (per-label and per-prediction — at
    * most |languages| rows each) over the lang-ID output stream,
    * full-outer-merged so a class that is only ever predicted (or only
    * ever labeled) still surfaces instead of vanishing. */
  def taLangIdEval(s: SparkSession, dir: String): DataFrame = {
    val p = taLangId(s, dir).select(col("labeled_lang"), col("predicted_lang"))
    val byTrue = p.groupBy(col("labeled_lang").as("lang"))
      .agg(count(lit(1)).as("n_labeled"),
        sum(when(col("predicted_lang") === col("labeled_lang"), 1L).otherwise(0L))
          .as("n_correct"))
    val byPred = p.groupBy(col("predicted_lang").as("lang"))
      .agg(count(lit(1)).as("n_predicted"))
    byTrue.join(byPred, Seq("lang"), "full_outer")
      .select(col("lang"),
        coalesce(col("n_labeled"), lit(0L)).as("n_labeled"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .withColumn("precision",
        when(col("n_predicted") === 0, lit(0.0))
          .otherwise(col("n_correct").cast("double") / col("n_predicted").cast("double")))
      .withColumn("recall",
        when(col("n_labeled") === 0, lit(0.0))
          .otherwise(col("n_correct").cast("double") / col("n_labeled").cast("double")))
  }

  /** Oracle nests the lang-ID gate's SQL verbatim — the eval cannot
    * drift from the classifier it grades. */
  lazy val taLangIdEvalSql: String =
    s"""WITH pred AS ($taLangIdSql),
       |bt AS (SELECT labeled_lang AS lang, CAST(COUNT(1) AS BIGINT) AS n_labeled,
       |              CAST(SUM(CASE WHEN predicted_lang = labeled_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       |       FROM pred GROUP BY 1),
       |bp AS (SELECT predicted_lang AS lang, CAST(COUNT(1) AS BIGINT) AS n_predicted
       |       FROM pred GROUP BY 1)
       |SELECT COALESCE(bt.lang, bp.lang) AS lang,
       |       COALESCE(bt.n_labeled, 0) AS n_labeled,
       |       COALESCE(bp.n_predicted, 0) AS n_predicted,
       |       COALESCE(bt.n_correct, 0) AS n_correct,
       |       CASE WHEN COALESCE(bp.n_predicted, 0) = 0 THEN 0.0
       |            ELSE CAST(COALESCE(bt.n_correct, 0) AS DOUBLE) / CAST(bp.n_predicted AS DOUBLE) END AS precision,
       |       CASE WHEN COALESCE(bt.n_labeled, 0) = 0 THEN 0.0
       |            ELSE CAST(COALESCE(bt.n_correct, 0) AS DOUBLE) / CAST(bt.n_labeled AS DOUBLE) END AS recall
       |FROM bt FULL OUTER JOIN bp ON bt.lang = bp.lang""".stripMargin

  // --------------------------------------------------------- ta_winnow
  /** Winnowing gram width (k) and window size (w). */
  val WinnowK = 3
  val WinnowW = 4

  /** Position cap packed into the combined selection key (docs are
    * capped at 2^20 grams by the pipeline's chunking stage upstream;
    * the pack below requires it). */
  val WinnowPosBits = 20

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    * 2003 — the MOSS kernel): hash every [[WinnowK]]-token gram, slide
    * a [[WinnowW]]-window over the hash sequence, keep each window's
    * minimal hash (leftmost on ties), and emit the DISTINCT selected
    * (position, fingerprint) pairs. The winnowing guarantee: any shared
    * token run of ≥ w+k−1 tokens between two documents yields at least
    * one IDENTICAL selected fingerprint in both — so matching on the
    * ~1/w-density selected set finds every long-enough overlap at a
    * fraction of the full-gram index cost (the plagiarism/provenance
    * index shape, and the cheap pre-filter tier ahead of
    * [[graft.operators.Dedup]]'s exact verify).
    *
    * Determinism device: (hash, pos) packs into ONE Int64
    * (`hash·2^WinnowPosBits + pos`, exact while pos < 2^20 and
    * hash < 2^32), so BOTH engines take a plain MIN over the sliding
    * frame — no argmin/min_by whose tie behavior differs. Windows are
    * evaluated only at full-width anchor positions (pos ≤ n−w; a doc
    * shorter than w grams gets its global minimum at anchor 0), and
    * selection dedups per doc.
    *
    * Scale: the sliding MIN is a doc_id-partitioned window — bounded
    * by DOCUMENT length, never corpus size (the window-idiom carve-out
    * [[graft.operators.Snapshots.historyOver]] documents); everything
    * else is per-row hashing and a distinct over the ~G/w selected
    * rows. */
  def taWinnow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Tables.documentsWide(s, dir)
      .select(col("doc_id"), split(normalized(col("text")), " ").as("w"))
      .where(size(col("w")) >= WinnowK)
      .select(col("doc_id"), size(col("w")).as("nw"),
        posexplode(expr(
          s"transform(sequence(0, size(w) - $WinnowK), i -> concat_ws(' ', ${
            (0 until WinnowK).map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(", ")}))")))
      .toDF("doc_id", "nw", "pos", "g")
      .withColumn("h",
        expr("cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint) % 4294967296"))
      .withColumn("key",
        col("h") * lit(1L << WinnowPosBits) + col("pos"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, WinnowW - 1)
    grams
      .withColumn("wmin", min(col("key")).over(frame))
      .where(col("pos") <= greatest(col("nw") - WinnowK + 1 - WinnowW, lit(0)))
      .select(col("doc_id"),
        (col("wmin") % lit(1L << WinnowPosBits)).as("sel_pos"),
        expr(s"wmin div ${1L << WinnowPosBits}").as("fp"))
      .distinct()
  }

  val taWinnowSql: String = {
    val pow = 1L << WinnowPosBits
    val ws = (0 until WinnowK)
      .map(k => s"w[i + ${k + 1}]").mkString(" || ' ' || ")
    s"""WITH docs AS (
       |  SELECT doc_id,
       |         string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, len(w) AS nw, t.i AS pos, $ws AS g
       |  FROM docs, LATERAL (SELECT unnest(generate_series(0, len(w) - $WinnowK)) AS i) t
       |  WHERE len(w) >= $WinnowK),
       |h AS (
       |  SELECT doc_id, nw, pos,
       |         (CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 4294967296) * $pow + pos AS key
       |  FROM g),
       |m AS (
       |  SELECT doc_id, nw, pos,
       |         MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
       |                        ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wmin
       |  FROM h)
       |SELECT DISTINCT doc_id,
       |       wmin % $pow AS sel_pos,
       |       wmin // $pow AS fp
       |FROM m
       |WHERE pos <= GREATEST(nw - ${WinnowK - 1} - $WinnowW, 0)""".stripMargin
  }

  // ------------------------------------------------------ gopher_rules
  /** Rule-based document filter in the style of the published Gopher /
    * Dolma heuristics (word-count bounds, mean-word-length bounds,
    * minimum distinct-stopword presence, symbol-to-character ratio):
    * the cheap pre-filter a training pipeline applies BEFORE any
    * dedup or model scoring, so it must be a pure per-row projection.
    *
    * Scale: zero shuffles — one scan, per-row expressions only, fully
    * inside whole-stage codegen; at 100 TB this runs at scan speed and
    * the `passes` column is the pushdown-friendly predicate later
    * stages filter on. Cross-engine determinism: every RULE is an
    * integer comparison (e.g. mean-word-length ∈ [3,10] is tested as
    * `3·n_words ≤ n_letters ≤ 10·n_words`, never via the division);
    * the two reported ratios are single IEEE divisions of exact
    * integers, zero-guarded the [[taQuality]] way. */
  private val GopherStops = Seq("the", "a", "and", "of", "to", "in", "is", "for")
  private val GopherMinWords = 20
  private val GopherMaxWords = 100000

  def taGopherRules(s: SparkSession, dir: String): DataFrame = {
    val inList = GopherStops.map(w => s"'$w'").mkString(", ")
    val t = col("text")
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), t, split(normalized(t), " ").as("w"))
      .select(col("doc_id"), t, expr("filter(w, x -> x <> '')").as("wf"))
    val nWords = size(col("wf")).cast("long")
    val nLetters = classCount(t, "[\\p{L}]")
    val nChars = length(t).cast("long")
    val nSpace = classCount(t, "\\s")
    val nStopDistinct =
      size(expr(s"filter(array_distinct(wf), x -> x IN ($inList))")).cast("long")
    val nStopTokens = size(expr(s"filter(wf, x -> x IN ($inList))")).cast("long")
    d.select(col("doc_id"),
        nWords.as("n_words"), nLetters.as("n_letters"),
        nChars.as("n_chars"), nSpace.as("n_space"),
        nStopDistinct.as("n_stop_distinct"), nStopTokens.as("n_stop_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_letters"),
        col("n_stop_distinct"), col("n_stop_tokens"),
        when(col("n_words") === 0, lit(0.0))
          .otherwise(col("n_letters").cast("double") / col("n_words").cast("double"))
          .as("mean_word_len"),
        when(col("n_words") === 0, lit(0.0))
          .otherwise(col("n_stop_tokens").cast("double") / col("n_words").cast("double"))
          .as("stop_ratio"),
        (col("n_words") >= GopherMinWords && col("n_words") <= GopherMaxWords)
          .cast("int").as("r_word_count"),
        (col("n_words") > 0 &&
          col("n_letters") >= col("n_words") * 3 &&
          col("n_letters") <= col("n_words") * 10).cast("int").as("r_mean_word_len"),
        (col("n_stop_distinct") >= 2).cast("int").as("r_stopwords"),
        ((col("n_chars") - col("n_letters") - col("n_space")) * 10 <= col("n_chars"))
          .cast("int").as("r_symbol"))
      .withColumn("passes",
        (col("r_word_count") === 1 && col("r_mean_word_len") === 1 &&
          col("r_stopwords") === 1 && col("r_symbol") === 1).cast("int"))
  }

  val taGopherRulesSql: String = {
    val inList = GopherStops.map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' '),
       |                x -> x <> '') AS wf
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(wf) AS BIGINT) AS n_words,
       |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\\p{L}]', '', 'g')) AS BIGINT) AS n_letters,
       |    CAST(LENGTH(text) AS BIGINT) AS n_chars,
       |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_space,
       |    CAST(len(list_filter(list_distinct(wf), x -> x IN ($inList))) AS BIGINT) AS n_stop_distinct,
       |    CAST(len(list_filter(wf, x -> x IN ($inList))) AS BIGINT) AS n_stop_tokens
       |  FROM d)
       |SELECT doc_id, n_words, n_letters, n_stop_distinct, n_stop_tokens,
       |  CASE WHEN n_words = 0 THEN 0.0
       |       ELSE CAST(n_letters AS DOUBLE) / CAST(n_words AS DOUBLE) END AS mean_word_len,
       |  CASE WHEN n_words = 0 THEN 0.0
       |       ELSE CAST(n_stop_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) END AS stop_ratio,
       |  CAST(n_words BETWEEN $GopherMinWords AND $GopherMaxWords AS INT) AS r_word_count,
       |  CAST(n_words > 0 AND n_letters >= n_words * 3 AND n_letters <= n_words * 10 AS INT) AS r_mean_word_len,
       |  CAST(n_stop_distinct >= 2 AS INT) AS r_stopwords,
       |  CAST((n_chars - n_letters - n_space) * 10 <= n_chars AS INT) AS r_symbol,
       |  CAST(n_words BETWEEN $GopherMinWords AND $GopherMaxWords
       |   AND n_words > 0 AND n_letters >= n_words * 3 AND n_letters <= n_words * 10
       |   AND n_stop_distinct >= 2
       |   AND (n_chars - n_letters - n_space) * 10 <= n_chars AS INT) AS passes
       |FROM m""".stripMargin
  }

  /** `ta_sentences` — terminated-sentence segmentation. The fixture
    * is punctuation-free, so the gate SYNTHESIZES the boundaries (the
    * mm-codec discipline): terminal punctuation is injected after
    * every k = 5 + doc_id%3 words, cycling . ! ?, leaving a trailing
    * unterminated fragment whenever the word count is not a multiple.
    * The REAL operator then segments with `[^.!?]+[.!?]+` (maximal
    * non-terminal run + terminal run; an unterminated tail is NOT a
    * sentence — the truncation-artifact convention `ta_gopher_rules`
    * already scores). The oracle is fully ANALYTIC — list_slice word
    * groups, no regex — so the hash proves the segmentation inverted
    * the construction exactly (boundaries, punctuation attachment,
    * fragment drop, per-sentence counts). Generator pipelines in the
    * scan stage; zero shuffles. */
  def taSentences(s: SparkSession, dir: String): DataFrame =
    graft.Tables.documentsWide(s, dir)
      .select(col("doc_id"),
        expr("""array_join(
                  transform(split(text, ' '), (w, i) ->
                    CASE WHEN (i + 1) % (5 + doc_id % 3) = 0
                         THEN concat(w, CASE ((i + 1) div (5 + doc_id % 3)) % 3
                                          WHEN 1 THEN '.' WHEN 2 THEN '!' ELSE '?' END)
                         ELSE w END),
                  ' ')""").as("pt"))
      // ——— ingest side: the punctuated text only from here on ———
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(pt, '[^.!?]+[.!?]+', 0)"))
          .as(Seq("pos0", "s0")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("sent_no"),
        trim(col("s0")).as("sentence"),
        size(split(trim(col("s0")), " ")).cast("int").as("n_words"),
        length(trim(col("s0"))).cast("long").as("n_chars"))

  val taSentencesSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |         5 + doc_id % 3 AS k
      |  FROM documents),
      |u AS (
      |  SELECT doc_id, k, toks,
      |         unnest(range(1, len(toks) // k + 1)) AS sent_no
      |  FROM t),
      |v AS (
      |  SELECT doc_id, CAST(sent_no AS BIGINT) AS sent_no, CAST(k AS INT) AS n_words,
      |         array_to_string(list_slice(toks, (sent_no - 1) * k + 1, sent_no * k), ' ')
      |           || (CASE sent_no % 3 WHEN 1 THEN '.' WHEN 2 THEN '!' ELSE '?' END) AS sentence
      |  FROM u)
      |SELECT doc_id, sent_no, sentence, n_words,
      |       CAST(length(sentence) AS BIGINT) AS n_chars
      |FROM v""".stripMargin

  /** `ta_readability` — Flesch reading ease over the same terminated-
    * sentence synthesis as [[taSentences]]: score = 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words), with syllables
    * approximated by VOWEL RUNS per word (the standard cheap
    * surrogate; exact hyphenation needs a dictionary). Only words
    * inside terminated sentences count — the unterminated tail is a
    * crawl artifact. All counts integer; the score is one fixed IEEE
    * expression both engines evaluate identically. One narrow select,
    * HOFs inside codegen — zero shuffles. */
  def taReadability(s: SparkSession, dir: String): DataFrame =
    graft.Tables.documentsWide(s, dir)
      .select(col("doc_id"),
        expr("split(text, ' ')").as("toks"),
        expr("5 + doc_id % 3").as("k"))
      .select(col("doc_id"),
        expr("CAST(size(toks) div k AS BIGINT)").as("n_sents"),
        expr("CAST((size(toks) div k) * k AS BIGINT)").as("n_words"),
        expr("""aggregate(slice(toks, 1, (size(toks) div k) * k), 0L,
                 (acc, w) -> acc + size(regexp_extract_all(w, '[aeiou]+', 0)))""")
          .as("syllables"))
      .select(col("doc_id"), col("n_sents"), col("n_words"), col("syllables"),
        expr("""CASE WHEN n_sents = 0 OR n_words = 0 THEN 0.0D
                ELSE 206.835D - 1.015D * (CAST(n_words AS DOUBLE) / n_sents)
                             - 84.6D * (CAST(syllables AS DOUBLE) / n_words) END""")
          .as("flesch"))

  val taReadabilitySql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks, 5 + doc_id % 3 AS k
      |  FROM documents),
      |u AS (
      |  SELECT doc_id,
      |         CAST(len(toks) // k AS BIGINT) AS n_sents,
      |         CAST((len(toks) // k) * k AS BIGINT) AS n_words,
      |         CAST(COALESCE(list_sum(list_transform(
      |                list_slice(toks, 1, (len(toks) // k) * k),
      |                w -> len(regexp_extract_all(w, '[aeiou]+')))), 0) AS BIGINT) AS syllables
      |  FROM t)
      |SELECT doc_id, n_sents, n_words, syllables,
      |       CASE WHEN n_sents = 0 OR n_words = 0 THEN 0.0
      |            ELSE 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
      |                         - 84.6 * (CAST(syllables AS DOUBLE) / n_words) END AS flesch
      |FROM u""".stripMargin
}
