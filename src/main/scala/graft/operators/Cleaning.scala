package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import TextAnalysis.normalized

/** Corpus-cleaning operators for an LLM training-data pipeline: PII
  * masking/pseudonymization, denylist scrubbing, benchmark
  * decontamination, repetition filtering, and sequence packing — the
  * steps between raw crawl and tokenizer that the dedup/quality family
  * (Dedup, TextAnalysis) doesn't cover.
  *
  * All five are single-scan or bounded-shuffle shapes that survive
  * 100 TB: per-row regex/arithmetic (pii_mask, ta_denylist_scrub),
  * per-(doc, gram) aggregation whose key cardinality is bounded by
  * document length (ta_repetition), a broadcast semi-join against an
  * always-small benchmark set (ta_decontaminate), and a per-stream
  * running sum (ta_pack_chunks).
  */
object Cleaning {

  // ----------------------------------------------------------- pii_mask
  /** PII masking + pseudonymization over a structured table: digit runs
    * in the identifying column are masked for display, and a
    * deterministic md5-derived surrogate key replaces the identifier so
    * downstream joins still line up after the scrub (same input → same
    * surrogate). The surrogate is PSEUDONYMOUS, not anonymous: an
    * unsalted hash of a low-entropy identifier is reversible by
    * dictionary — a production pipeline must derive it with a keyed
    * HMAC whose secret lives outside the dataset. Pure per-row
    * expressions — linear, shuffle-free, codegen'd.
    */
  def piiMask(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
      expr("conv(substr(md5(c_name), 1, 15), 16, 10)")
        .cast("long").as("pseudonym"),
      (length(col("c_name")) -
        length(regexp_replace(col("c_name"), "[0-9]", "")))
        .cast("long").as("n_redacted"))

  val piiMaskSql: String =
    """SELECT c_custkey,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
      |  CAST(('0x' || substr(md5(c_name), 1, 15)) AS BIGINT) AS pseudonym,
      |  CAST(LENGTH(c_name) - LENGTH(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS n_redacted
      |FROM customer""".stripMargin

  // -------------------------------------------------- ta_denylist_scrub
  /** Term-denylist scrubbing: replace every whole-word occurrence of a
    * denied term with a redaction token and count the hits (the cheap
    * filter pass for licensed/sensitive terms). One regex per row,
    * shuffle-free. At 100 TB a large denylist compiles into one
    * alternation (or an Aho-Corasick UDF); the per-row cost stays
    * independent of corpus size either way. */
  val Denylist: Seq[String] = Seq("spark", "customer", "vector")

  def taDenylistScrub(s: SparkSession, dir: String): DataFrame = {
    val pat = s"\\b(${Denylist.mkString("|")})\\b"
    Tables.documents(s, dir).select(
      col("doc_id"),
      regexp_replace(col("text"), pat, "[REDACTED]").as("scrubbed"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0)))
        .cast("long").as("n_hits"))
  }

  val taDenylistScrubSql: String = {
    val pat = s"\\b(${Denylist.mkString("|")})\\b"
    s"""SELECT doc_id,
       |  regexp_replace(text, '$pat', '[REDACTED]', 'g') AS scrubbed,
       |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_hits
       |FROM documents""".stripMargin
  }

  /** Broadcast-set whole-word scrub — the LARGE-denylist scale path the
    * regex variant's scaladoc promises: for all-\w+ terms,
    * `\b(t1|…|tN)\b` matches exactly the words equal to a term, so the
    * scrub reduces to one O(1) hash probe per word — per-row cost
    * independent of denylist size, where the alternation regex scans
    * O(N) alternatives per position. A million-term denylist is a few
    * MB broadcast. (Multi-word phrase entries would need an
    * Aho-Corasick automaton — same broadcast shape, streaming match.)
    * Word boundaries replicate the Spark regex twin's JAVA `\b`
    * semantics exactly (Unicode-aware — see the kernel comment), so
    * output is bit-identical to [[taDenylistScrub]] on ANY input —
    * spec-pinned on a 500-term list plus non-ASCII boundary cases, and
    * gate-checked against the SAME DuckDB oracle. (DuckDB's RE2 `\b` is
    * ASCII-only; the shared oracle is exact on the ASCII fixtures, and
    * on non-ASCII corpora the two SPARK paths still agree with each
    * other.) */
  // ----------------- shared JDK-\b-exact boundary model -----------------
  // ONE implementation of java.util.regex.Pattern's default-flags \b
  // (what regexp_replace uses), shared by the set and phrase kernels so
  // a boundary-rule fix can never apply to one and not the other.
  // Measured against this JVM's Pattern.Bound:
  //  - word chars for the DIRECT neighbor: '_' or Unicode letter/digit,
  //    CODE-POINT aware (Bound reads codePointBefore/codePointAt, so a
  //    supplementary-plane letter adjacent to the position is a word
  //    char);
  //  - a NON-SPACING mark (Mn) is word-transparent ONLY when
  //    hasBaseCharacter holds: Pattern walks back one UTF-16 INDEX at a
  //    time, reading codePointAt(x) (a low-surrogate index yields the
  //    lone surrogate, type SURROGATE), through Mn marks, and requires
  //    Character.isLetterOrDigit of the first non-Mn read — probed on
  //    this JVM: '_' is NOT a valid base ("_́spark" redacts "spark"); a
  //    BMP mark over a supplementary letter finds only the letter's low
  //    surrogate ("𝐀́spark" redacts); a supplementary Mn approached at
  //    its own high-surrogate index IS transparent ("spark𞥄" does not
  //    redact — the walk reads the full mark then lands on 'k');
  //  - Mc/Me marks, connector punctuation other than '_', and ZWNJ/ZWJ
  //    are plain non-word chars to default \b (they are word chars only
  //    under UNICODE_CHARACTER_CLASS, which regexp_replace does not
  //    enable).
  private[operators] def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)
  private[operators] def isMnCp(cp: Int): Boolean =
    Character.getType(cp) == Character.NON_SPACING_MARK

  /** Pattern.hasBaseCharacter, verbatim: x walks DOWN one UTF-16 index
    * per step reading codePointAt(x) — NOT codePointBefore — so a
    * high-surrogate index reads the full supplementary code point while
    * a low-surrogate index reads a lone surrogate (never a base, never
    * transparent). True iff the first non-Mn read is a letter/digit. */
  private[operators] def hasBase(text: String, start: Int): Boolean = {
    var x = start
    while (x >= 0) {
      val ch = text.codePointAt(x)
      if (Character.isLetterOrDigit(ch)) return true
      if (Character.getType(ch) != Character.NON_SPACING_MARK) return false
      x -= 1
    }
    false
  }

  /** Is the char sequence position `i` (UTF-16 index) preceded by
    * word-stuff per JDK \b? (= Bound's `left` test.) */
  private[operators] def wordOnLeft(text: String, i: Int): Boolean =
    i > 0 && {
      val cp = text.codePointBefore(i)
      isWordCp(cp) || (isMnCp(cp) && hasBase(text, i - 1))
    }

  /** Is position `i` followed by word-stuff per JDK \b? (= Bound's
    * `right` test; a trailing Mn mark continues the word iff its base
    * walk succeeds.) */
  private[operators] def wordOnRight(text: String, i: Int): Boolean =
    i < text.length && {
      val cp = text.codePointAt(i)
      isWordCp(cp) || (isMnCp(cp) && hasBase(text, i))
    }

  def scrubWithSet(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    require(terms.forall(_.matches("[A-Za-z0-9_]+")),
      "set-scrub terms must be single \\w+ words — use scrubWithPhrases for multi-word phrases")
    val bc = s.sparkContext.broadcast(terms.toSet)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val deny = bc.value
        // word segmentation under the shared \b model: a word starts at
        // a word cp with no word-stuff on its left and extends while the
        // next position still has word-stuff on its right (word chars,
        // or Mn marks whose base walk succeeds)
        rows.map { case (id, text) =>
          val sb = new java.lang.StringBuilder(text.length)
          var hits = 0L
          var i = 0
          val n = text.length
          while (i < n) {
            val cp = text.codePointAt(i)
            if (isWordCp(cp)) {
              var j = i + Character.charCount(cp)
              while (j < n && wordOnRight(text, j)) {
                j += Character.charCount(text.codePointAt(j))
              }
              val w = text.substring(i, j)
              if (deny(w)) { sb.append("[REDACTED]"); hits += 1 }
              else sb.append(w)
              i = j
            } else { sb.appendCodePoint(cp); i += Character.charCount(cp) }
          }
          (id, sb.toString, hits)
        }
      }.toDF("doc_id", "scrubbed", "n_hits")
  }

  /** Gate twin of [[taDenylistScrub]] through the set kernel. */
  def taDenylistScrubLarge(s: SparkSession, dir: String): DataFrame =
    scrubWithSet(Tables.documentsWide(s, dir), Denylist)

  // ---------------------------------------------- ta_denylist_phrases
  /** PHRASE-denylist scrub — the missing piece [[scrubWithSet]]'s
    * scaladoc promised: real licensed-content denylists are mostly
    * multi-word phrases ("new york times", song titles, …), which a
    * per-word hash probe cannot match. A broadcast character-trie
    * automaton over the phrase list streams each document once:
    * at every word-boundary-valid start position the trie walks as deep
    * as the text matches (bounded by the longest phrase) and the
    * LONGEST phrase whose end is also a word boundary is redacted —
    * exactly the leftmost-longest semantics of the regex twin
    * `\b(p1|p2|…)\b` with alternatives listed longest-first, including
    * the backtracking case (a longer phrase matching its characters but
    * failing its end boundary falls back to a shorter one). Word
    * boundaries use the same JDK-`\b`-exact rule as [[scrubWithSet]]
    * (only Mn marks are transparent). On a single-word list this
    * reduces to [[scrubWithSet]]'s output bit-for-bit (spec-pinned).
    *
    * Scale shape: identical to the set kernel — the automaton has real
    * fail + output links, so per-row cost is O(len + matches) with NO
    * per-position re-walk factor, independent of denylist SIZE (a
    * million-phrase automaton is a few hundred MB broadcast once per
    * executor); the corpus never shuffles. */
  def scrubWithPhrases(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    require(phrases.nonEmpty, "phrase denylist must be non-empty")
    require(phrases.forall(_.matches("[A-Za-z0-9_]+( [A-Za-z0-9_]+)*")),
      "phrases must be \\w+ words separated by single spaces")
    // the automaton is built ONCE on the driver and broadcast BUILT —
    // a million-phrase automaton is large, and rebuilding it per task
    // would multiply both the build cost and the resident copies
    val bc = s.sparkContext.broadcast(new AhoCorasick(phrases.toArray))
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val ac = bc.value
        // Semantics contract (identical to the regex twin): scanning
        // left to right, at each boundary-valid start take the LONGEST
        // phrase whose end is also boundary-valid, redact, and continue
        // from its end. The automaton finds every (start, len) match
        // candidate in one O(text + matches) pass; a match survives iff
        // its start has nothing word-ish on the left and its end
        // nothing word-ish on the right (the SHARED \b model); the
        // greedy left-to-right longest-per-start selection over the
        // surviving matches is exactly the regex's longest-first
        // alternation with end-boundary backtracking.
        rows.map { case (id, text) =>
          val n = text.length
          // longest boundary-valid match length per start position
          val bestLen = new java.util.HashMap[Integer, Integer]()
          var state = 0
          var e = 0
          while (e < n) {
            state = ac.step(state, text.charAt(e))
            e += 1
            // walk output links only when the END boundary holds —
            // every phrase ends in a word char, so end validity
            // depends on the position alone
            if (ac.hasOutput(state) && !wordOnRight(text, e)) {
              var o = state
              while (o != 0) {
                val len = ac.terminalLen(o)
                if (len > 0) {
                  val start = e - len
                  if (!wordOnLeft(text, start)) {
                    val prev = bestLen.get(start)
                    if (prev == null || prev < len) bestLen.put(start, len)
                  }
                }
                o = ac.outLink(o)
              }
            }
          }
          val sb = new java.lang.StringBuilder(n)
          var hits = 0L
          var i = 0
          while (i < n) {
            val len = bestLen.get(i)
            if (len != null) {
              sb.append("[REDACTED]"); hits += 1; i += len
            } else {
              val cp = text.codePointAt(i)
              sb.appendCodePoint(cp); i += Character.charCount(cp)
            }
          }
          (id, sb.toString, hits)
        }
      }.toDF("doc_id", "scrubbed", "n_hits")
  }

  /** Classic Aho-Corasick automaton over the phrase characters:
    * `step` follows goto edges with fail-link fallback (amortized O(1)
    * per text char — the re-walk factor the plain trie paid is gone);
    * `outLink` chains each state to its longest proper-suffix state
    * that ends a phrase, so all matches ending at a position enumerate
    * in O(#matches). */
  private[operators] final class AhoCorasick(phrases: Array[String])
      extends Serializable {
    // Integer-valued maps so a miss is a SINGLE null-returning probe
    // (a Char->Int map would silently unbox null to 0 and need a
    // containsKey pre-check on every read)
    private val goto_ = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Integer]())
    private val term = scala.collection.mutable.ArrayBuffer(0) // phrase len ending here
    private val fail = scala.collection.mutable.ArrayBuffer(0)
    private val out = scala.collection.mutable.ArrayBuffer(0)  // output link

    phrases.foreach { p =>
      var s = 0
      p.foreach { c =>
        val nx = goto_(s).get(c)
        s = if (nx ne null) nx.intValue
        else {
          goto_ += new java.util.HashMap[Char, Integer]()
          term += 0; fail += 0; out += 0
          val id = goto_.size - 1
          goto_(s).put(c, id)
          id
        }
      }
      term(s) = p.length
    }
    // BFS fail links; out(v) = fail(v) if it ends a phrase else out(fail(v))
    locally {
      val q = new java.util.ArrayDeque[Int]()
      goto_(0).forEach((_, v) => { fail(v.intValue) = 0; q.add(v.intValue) })
      while (!q.isEmpty) {
        val u = q.poll()
        goto_(u).forEach { (c, vBoxed) =>
          val v = vBoxed.intValue
          var f = fail(u)
          var nx: Integer = null
          while (f != 0 && { nx = goto_(f).get(c); nx eq null }) f = fail(f)
          if (f == 0) nx = goto_(0).get(c)
          fail(v) = if ((nx ne null) && nx.intValue != v) nx.intValue else 0
          out(v) = if (term(fail(v)) > 0) fail(v) else out(fail(v))
          q.add(v)
        }
      }
    }

    // flat root-edge table: the scan spends almost all its time in
    // state 0, and phrases are ASCII (\w + space) by [[scrubWithPhrases]]'s
    // require — so the hot path is one array read, no boxing; non-ASCII
    // text chars can never leave the root
    private val rootNext = new Array[Int](128)
    goto_(0).forEach((c, v) => rootNext(c) = v.intValue)

    def step(state: Int, c: Char): Int = {
      var s = state
      while (s != 0) { // in-match states only — rare on typical text
        val nx = goto_(s).get(c)
        if (nx ne null) return nx.intValue
        s = fail(s)
      }
      if (c < 128) rootNext(c) else 0
    }
    def hasOutput(state: Int): Boolean = term(state) > 0 || out(state) != 0
    def terminalLen(state: Int): Int = term(state)
    def outLink(state: Int): Int = out(state)
  }

  /** Gate phrase list: overlapping phrases ("customer join merge" vs
    * "customer join") exercise longest-first, plus a single word. */
  val PhraseDenylist: Seq[String] =
    Seq("customer join merge", "customer join", "table hash", "spark")

  /** Gate query: phrase scrub over the documents table. */
  def taDenylistPhrases(s: SparkSession, dir: String): DataFrame =
    scrubWithPhrases(Tables.documentsWide(s, dir), PhraseDenylist)

  /** DuckDB twin: RE2 alternation, alternatives longest-first (RE2 `\b`
    * is ASCII-only — exact on the ASCII fixture corpus). */
  val taDenylistPhrasesSql: String = {
    val pat = s"\\b(${PhraseDenylist.sortBy(-_.length).mkString("|")})\\b"
    s"""SELECT doc_id,
       |  regexp_replace(text, '$pat', '[REDACTED]', 'g') AS scrubbed,
       |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_hits
       |FROM documents""".stripMargin
  }

  // -------------------------------------------------- ta_decontaminate
  /** Benchmark decontamination: flag every training document sharing at
    * least one [[DecontGram]]-gram with the held-out benchmark set.
    * [[taDecontaminateVs]] is the genuine two-input operator (corpus
    * table vs benchmark table); the gate query feeds it the
    * doc_id % [[BenchMod]] split of `documents` as a deterministic
    * stand-in for the second table.
    *
    * Scale shape: the benchmark is small BY DEFINITION (eval sets are
    * thousands of docs, not billions), so its distinct grams broadcast
    * and the corpus-side probe is a map-side semi-join — the 100 TB
    * corpus is never shuffled, unlike the symmetric all-pairs dedup
    * family. Per-doc distinct grams keep the hit count a per-doc
    * constant multiple of doc length. */
  val DecontGram = 5
  val BenchMod = 97

  /** Distinct [[DecontGram]]-grams per document of a (doc_id, text)
    * frame. */
  private def decontGrams(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), split(normalized(col("text")), " ").as("w"))
    .where(size(col("w")) >= DecontGram)
    .selectExpr("doc_id",
      s"${TextAnalysis.gramExplodeExpr(DecontGram, distinctPerDoc = true)} as g")

  /** TWO-TABLE form — the real operator shape: the training `corpus`
    * is flagged against an explicit `bench` DataFrame (both
    * (doc_id, text, ...)), e.g. the eval-set table of a production
    * pipeline. The gate query routes through this with the
    * doc_id % [[BenchMod]] split as the two inputs. */
  def taDecontaminateVs(corpus: DataFrame, bench: DataFrame): DataFrame = {
    val benchGrams = decontGrams(bench).select(col("g")).distinct()
    val hits = decontGrams(corpus)
      .join(broadcast(benchGrams), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n")) // grams are distinct per doc already
    corpus.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  def taDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsWide(s, dir)
    taDecontaminateVs(
      docs.where(col("doc_id") % BenchMod =!= 0),
      docs.where(col("doc_id") % BenchMod === 0))
  }

  val taDecontaminateSql: String = {
    val gram = (0 until DecontGram).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w) - ${DecontGram - 1}), i -> $gram))) AS g
       |  FROM docs WHERE len(w) >= $DecontGram),
       |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % $BenchMod = 0),
       |hits AS (
       |  SELECT gr.doc_id, COUNT(1) AS n
       |  FROM grams gr JOIN bench b ON gr.g = b.g
       |  WHERE gr.doc_id % $BenchMod <> 0
       |  GROUP BY gr.doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_grams,
       |  CAST(COALESCE(h.n, 0) > 0 AS INT) AS contaminated
       |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       |WHERE d.doc_id % $BenchMod <> 0""".stripMargin
  }

  // ----------------------------------------------------- ta_repetition
  /** Repetition signals (the MassiveText/Gopher filter family): per-doc
    * type-token ratio, most-frequent-bigram mass, and duplicate-trigram
    * mass. Low-TTR / high-repetition documents are boilerplate or
    * degenerate generations and get dropped before training.
    *
    * Shapes: word stats are pure array expressions (no shuffle);
    * bigram/trigram duplicate counting aggregates on (doc_id, gram) —
    * key cardinality is bounded by document length, so there is no
    * corpus-scale hotspot and partial aggregation absorbs the
    * duplicates map-side. Ratios are single IEEE divisions on exact
    * integer counts (cross-engine hash-safe). */
  def taRepetition(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsWide(s, dir)
      .select(col("doc_id"), split(normalized(col("text")), " ").as("w"))
    def gramStats(n: Int) = docs
      .where(size(col("w")) >= n)
      .selectExpr("doc_id",
        s"${TextAnalysis.gramExplodeExpr(n, distinctPerDoc = false)} as g")
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
    val bs = gramStats(2).groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bi"), max(col("c")).as("max_bi"))
    val ts = gramStats(3).groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tri"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_tri"))
    docs.select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_words"))
      .join(bs, Seq("doc_id"), "left")
      .join(ts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        (col("n_distinct_words").cast("double") /
          col("n_words").cast("double")).as("ttr"),
        when(coalesce(col("n_bi"), lit(0L)) > 0,
          col("max_bi").cast("double") / col("n_bi").cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_frac"),
        when(coalesce(col("n_tri"), lit(0L)) > 0,
          col("dup_tri").cast("double") / col("n_tri").cast("double"))
          .otherwise(lit(0.0)).as("dup_trigram_frac"))
  }

  val taRepetitionSql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\p{L}]+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1])) AS g
      |  FROM docs WHERE len(w) >= 2),
      |bc AS (SELECT doc_id, g, COUNT(1) AS c FROM bi GROUP BY doc_id, g),
      |bs AS (SELECT doc_id, SUM(c) AS n_bi, MAX(c) AS max_bi FROM bc GROUP BY doc_id),
      |tri AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      |  FROM docs WHERE len(w) >= 3),
      |tc AS (SELECT doc_id, g, COUNT(1) AS c FROM tri GROUP BY doc_id, g),
      |ts AS (SELECT doc_id, SUM(c) AS n_tri,
      |         SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_tri
      |       FROM tc GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(len(d.w) AS BIGINT) AS n_words,
      |  CAST(len(list_distinct(d.w)) AS BIGINT) AS n_distinct_words,
      |  CAST(len(list_distinct(d.w)) AS DOUBLE) / CAST(len(d.w) AS DOUBLE) AS ttr,
      |  CASE WHEN COALESCE(bs.n_bi, 0) > 0
      |       THEN CAST(bs.max_bi AS DOUBLE) / CAST(bs.n_bi AS DOUBLE)
      |       ELSE CAST(0 AS DOUBLE) END AS top_bigram_frac,
      |  CASE WHEN COALESCE(ts.n_tri, 0) > 0
      |       THEN CAST(ts.dup_tri AS DOUBLE) / CAST(ts.n_tri AS DOUBLE)
      |       ELSE CAST(0 AS DOUBLE) END AS dup_trigram_frac
      |FROM docs d
      |LEFT JOIN bs ON d.doc_id = bs.doc_id
      |LEFT JOIN ts ON d.doc_id = ts.doc_id""".stripMargin

  // ------------------------------------------------ dedup_incremental
  /** Incremental snapshot dedup — the daily-crawl shape: an incoming
    * batch is checked against the EXISTING corpus snapshot by
    * normalized content fingerprint, and only unseen documents survive.
    * [[dedupIncrementalVs]] is the genuine two-input operator (batch
    * table vs snapshot table); the gate query feeds it the
    * doc_id % [[IncomingMod]] split of `documents` as a deterministic
    * stand-in for the second table.
    *
    * Scale shape: a LEFT ANTI-flavored join on the md5 fingerprint.
    * Both sides shuffle on the fp hash — linear, skew-free (md5 keys
    * are uniform). When the incoming batch is small relative to a
    * 100 TB snapshot (the normal case), Spark broadcasts the batch side
    * and the snapshot streams map-side; when even the batch is too big
    * to broadcast, [[dedupIncrementalBloom]] pre-filters the snapshot
    * scan with a Bloom filter. Unlike [[Dedup.dedupExact]], the
    * snapshot is never windowed or grouped — it is read-only. */
  val IncomingMod = 3

  /** TWO-TABLE form: each `incoming` row (doc_id, fp_norm) is flagged
    * `is_new` unless its fingerprint exists in `snapshot` (fp_norm). */
  def dedupIncrementalVs(incoming: DataFrame, snapshot: DataFrame): DataFrame = {
    val snapFp = snapshot.select(col("fp_norm")).distinct()
    incoming.join(snapFp.withColumn("seen", lit(1)), Seq("fp_norm"), "left")
      .select(col("doc_id"), col("fp_norm"),
        (col("seen").isNull).cast("int").as("is_new"))
  }

  /** Bloom-filter escalation of [[dedupIncrementalVs]], for when BOTH
    * sides are shuffle-join-sized (a multi-TB batch vs a 100 TB
    * snapshot): a Bloom filter over the batch's fingerprints
    * (`df.stat.bloomFilter` — built distributed, merged on the driver,
    * a few MB at any fpp) broadcasts to every executor and pre-filters
    * the snapshot scan down to probable matches before the exact join,
    * so the snapshot side of the shuffle carries only ~fpp·|snapshot|
    * non-matching rows instead of everything. Bloom filters have NO
    * false negatives, so no snapshot match is lost, and the exact join
    * clears the false positives — CleaningSpec pins bit-identical
    * output vs the exact path. The probe is a UDF by necessity: the
    * public sketch has no registered SQL twin (bloom_filter_agg /
    * might_contain are optimizer-internal, absent from the public
    * registry), and the probe body is one murmur hash + bitset lookup
    * per row — constant work, no corpus-size term. */
  def dedupIncrementalBloom(incoming: DataFrame, snapshot: DataFrame,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame =
    // a zero-row batch aggregates to a bit-less sketch whose probe NPEs
    // — and nothing can match an empty batch anyway
    if (incoming.isEmpty) dedupIncrementalVs(incoming, snapshot.limit(0))
    else {
      val s = incoming.sparkSession
      val bloom = incoming.stat.bloomFilter("fp_norm", expectedItems, fpp)
      val bc = s.sparkContext.broadcast(bloom)
      val mightContain = udf((fp: String) => bc.value.mightContainString(fp))
      dedupIncrementalVs(incoming, snapshot.where(mightContain(col("fp_norm"))))
    }

  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documentsWide(s, dir)
      .select(col("doc_id"), md5(normalized(col("text"))).as("fp_norm"))
    dedupIncrementalVs(
      fp.where(col("doc_id") % IncomingMod === 0),
      fp.where(col("doc_id") % IncomingMod =!= 0))
  }

  val dedupIncrementalSql: String =
    s"""WITH fp AS (
       |  SELECT doc_id,
       |    md5(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g'))) AS fp_norm
       |  FROM documents),
       |snapshot AS (SELECT DISTINCT fp_norm FROM fp WHERE doc_id % $IncomingMod <> 0)
       |SELECT f.doc_id, f.fp_norm,
       |  CAST(s.fp_norm IS NULL AS INT) AS is_new
       |FROM fp f LEFT JOIN snapshot s ON f.fp_norm = s.fp_norm
       |WHERE f.doc_id % $IncomingMod = 0""".stripMargin

  // ---------------------------------------------------- ta_pack_chunks
  /** Sequence-packing manifest (the concat-and-chunk step of LLM
    * pretraining): documents are concatenated per STREAM in doc_id
    * order and cut every [[ChunkTokens]] tokens; each document reports
    * the chunk range it lands in. A running sum over the per-stream
    * window — integer-exact, so it hash-checks.
    *
    * The stream key is (lang, shard) with shard = pmod(hash(doc_id),
    * nShards): chunk ids only need to be unique PER STREAM, not
    * globally dense, so the packer is embarrassingly parallel across
    * shards — at 100 TB you size nShards to the cluster (one window
    * partition per stream) instead of serializing each language
    * through one task. nShards = 1 reproduces the single-stream-per-
    * language manifest (the oracle-checked gate query); CleaningSpec
    * pins that every sharded stream is byte-identical to packing that
    * stream's documents alone.
    *
    * Zero-token documents occupy no chunk: they report an EMPTY span
    * (n_chunks = 0, last_chunk = first_chunk − 1, first_chunk = the
    * cursor position) rather than claiming a chunk they contribute
    * nothing to. */
  val ChunkTokens = 256

  /** General sharded packer; output includes the `shard` stream key. */
  /** THE chunk-manifest kernel: running token cursor per stream (the
    * given key columns, ordered by doc_id) → (first_chunk, last_chunk,
    * n_chunks) spans, with the zero-token empty-span rule
    * (last = first − 1, n_chunks = 0) in exactly one place. Input needs
    * (doc_id, n_tokens) plus the stream-key/carry columns; all input
    * columns pass through. [[packChunks]] and
    * [[Pipeline.pipelineFull]] both delegate here, so the packing
    * contract cannot drift between the packer and the capstone. */
  private[graft] def chunkManifest(in: DataFrame, streamKey: Seq[String],
      base: Option[String] = None, orderCol: String = "doc_id"): DataFrame = {
    val win = Window.partitionBy(streamKey.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val passThrough = in.columns.map(col).toSeq
    // `base` (a per-row column, constant per stream) starts the cursor
    // mid-stream — the streaming packer's carried offset
    // ([[graft.streaming.PackStream]]); None is cursor 0, the batch
    // packers' whole-corpus origin
    in.withColumn("cb", coalesce(sum(col("n_tokens")).over(win), lit(0L))
        + base.map(col).getOrElse(lit(0L)))
      .select(passThrough ++ Seq(
        expr(s"cb div $ChunkTokens").as("first_chunk"),
        when(col("n_tokens") === 0, expr(s"cb div $ChunkTokens - 1"))
          .otherwise(expr(s"(cb + n_tokens - 1) div $ChunkTokens"))
          .as("last_chunk"),
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr(s"(cb + n_tokens - 1) div $ChunkTokens")
            - expr(s"cb div $ChunkTokens") + 1)
          .as("n_chunks")): _*)
  }

  def packChunks(s: SparkSession, dir: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    chunkManifest(
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
            .cast("long").as("n_tokens"))
        .withColumn("shard", pmod(hash(col("doc_id")), lit(nShards)).cast("long")),
      Seq("lang", "shard"))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        col("first_chunk"), col("last_chunk"), col("n_chunks"))
  }

  /** Gate query: the single-stream-per-language operating point. */
  def taPackChunks(s: SparkSession, dir: String): DataFrame =
    packChunks(s, dir, nShards = 1).drop("shard")

  val taPackChunksSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
       |  FROM t)
       |SELECT doc_id, lang, n_tokens,
       |  cb // $ChunkTokens AS first_chunk,
       |  CASE WHEN n_tokens = 0 THEN cb // $ChunkTokens - 1
       |       ELSE (cb + n_tokens - 1) // $ChunkTokens END AS last_chunk,
       |  CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
       |       ELSE (cb + n_tokens - 1) // $ChunkTokens - cb // $ChunkTokens + 1 END AS n_chunks
       |FROM c""".stripMargin

  // ---------------------------------- ta_decontaminate_semantic
  /** SEMANTIC benchmark decontamination — the embedding lens over the
    * same [[BenchMod]] benchmark split [[taDecontaminate]] checks with
    * 5-grams: a PARAPHRASED eval item shares no 5-gram with its source
    * but still lands next to it in embedding space, which is why
    * decontamination suites run both lenses. A corpus vector is
    * flagged when its cosine against ANY benchmark vector clears
    * [[Dedup.SemDedupTauScaled]] — "contaminated" and "semantic
    * duplicate" share ONE integer-exact definition (the
    * sim_hard_negatives discipline, from the other side of the
    * threshold).
    *
    * Scale shape: cell-bucketed like SemDeDup, never all-pairs — both
    * sides assign to the shared IVF coarse cells and only same-cell
    * (corpus × bench) pairs score: Σ |cell∩corpus|·|cell∩bench| exact
    * integer dots, both sides [[Similarity.IvfMaxCell]]-capped. The
    * output spine is the UNCAPPED corpus assignment: every corpus
    * vector reports exactly once; a capped-out vector reports
    * contaminated=false (recall loss on overfull cells only — the
    * documented FAISS-style trade, same as dedup_semantic). The
    * convicting bench vector is the HIGHEST-dot match, smallest
    * bench id on ties (struct-max, no window). */
  def taDecontaminateSemantic(s: SparkSession, dir: String): DataFrame = {
    val c = Similarity.nCentroids(Tables.embeddings(s, dir).count())
    val cells = VecKernel.ivfCells(s, dir, c, nprobe = 1)
      .select(col("vec_id"), col("cell"))
      .repartition(col("vec_id"))
    val isBench = col("vec_id") % BenchMod === 0
    val capped = Similarity.cappedAssign(cells)
    val pairs = capped.where(!isBench).as("a")
      .join(capped.where(isBench).as("b"), col("a.cell") === col("b.cell"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"))
    val best = VecKernel.pairDots(s, dir, pairs)
      .where(col("dot_scaled") >= lit(Dedup.SemDedupTauScaled))
      .groupBy(col("query_id").as("vec_id"))
      .agg(max(struct(col("dot_scaled").as("d"),
        (-col("neighbor_id")).as("nb"))).as("m"))
      .select(col("vec_id"), (-col("m.nb")).as("bench_id"),
        col("m.d").as("dot_scaled"))
    cells.where(!isBench).join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("bench_id").isNotNull.as("contaminated"),
        col("bench_id"), col("dot_scaled"),
        (col("dot_scaled").cast("double") / lit(1e12)).as("cos_sim"))
  }

  /** Oracle: the shared coarse-quantizer chain with the bench/corpus
    * split applied to [[Dedup.dedupSemanticSql]]'s cap/spine split. */
  val taDecontaminateSemanticSql: String =
    s"""WITH ${Similarity.ivfCoarseCtesSql},
       |assign AS (
       |  SELECT vec_id, c_id AS cell FROM (
       |    SELECT vec_id, c_id,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, c_id) AS rn
       |    FROM cdots) WHERE rn = 1),
       |capped AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |           ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS mrn
       |    FROM assign) WHERE mrn <= ${Similarity.IvfMaxCell}),
       |pairs AS (
       |  SELECT a.vec_id AS qa, b.vec_id AS vb
       |  FROM capped a JOIN capped b ON a.cell = b.cell
       |  WHERE a.vec_id % $BenchMod <> 0 AND b.vec_id % $BenchMod = 0),
       |dots AS (
       |  SELECT p.qa, p.vb, CAST(SUM(ea.e * eb.e) AS BIGINT) AS dot
       |  FROM pairs p
       |  JOIN ev ea ON ea.vec_id = p.qa
       |  JOIN ev eb ON eb.vec_id = p.vb AND ea.i = eb.i
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT qa AS vec_id, vb AS bench_id, dot AS dot_scaled FROM (
       |    SELECT qa, vb, dot,
       |           ROW_NUMBER() OVER (PARTITION BY qa ORDER BY dot DESC, vb) AS rn
       |    FROM dots WHERE dot >= ${Dedup.SemDedupTauScaled}) WHERE rn = 1)
       |SELECT a.vec_id, a.cell, (b.bench_id IS NOT NULL) AS contaminated,
       |       b.bench_id, b.dot_scaled,
       |       CAST(b.dot_scaled AS DOUBLE) / 1e12 AS cos_sim
       |FROM (SELECT vec_id, cell FROM assign WHERE vec_id % $BenchMod <> 0) a
       |LEFT JOIN best b ON a.vec_id = b.vec_id""".stripMargin
}
