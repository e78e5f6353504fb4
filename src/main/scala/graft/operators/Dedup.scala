package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for an LLM training-data pipeline, over the
  * `documents` (text) and `embeddings` (vector) fixture tables.
  *
  * Five escalating notions of "duplicate":
  *  - exact:      md5 of normalized text (shuffle on the hash, linear)
  *  - ngram:      3-gram shingle Jaccard via an inverted-index self-join
  *                with a document-frequency cap on posting lists — the
  *                classic scalable candidate generation (no n² pass)
  *  - minhash:    MinHash signatures + LSH banding — candidates only
  *                from band-key collisions, estimated Jaccard from
  *                signature agreement; the 100 TB-scale path
  *  - simhash:    32-bit SimHash fingerprint per document (near-dup =
  *                small Hamming distance; pairing tested in specs)
  *  - embedding:  exact nearest neighbor by scaled-integer dot product
  *                (brute force baseline; LSH-bucketed scale path lives
  *                in Similarity.scala)
  *
  * Every query returns ONE ROW PER INPUT DOCUMENT/VECTOR (best-match
  * columns default to -1/0.0), so outputs are non-empty regardless of
  * whether the corpus actually contains near-duplicates — EXCEPT
  * signature-level outputs whose kernel needs a minimum token count:
  * dedupSimhash drops zero-token documents and minhashAggSig drops
  * documents under 3 tokens (no shingles exist), identically in both
  * engines; consumers joining those outputs back to the corpus must
  * left-join.
  *
  * Cross-engine determinism: all hashes derive from md5 (bit-identical
  * everywhere); MinHash/SimHash use integer arithmetic only; Jaccard /
  * cosine are single IEEE divisions of exact integers.
  */
object Dedup {

  import TextAnalysis.normalized

  // ------------------------------------------------------ dedup_exact
  /** Min-id keeper via aggregate + join-back, NOT a window over
    * fp_norm: a mega-duplicate-group (site boilerplate repeated 10⁸
    * times at corpus scale) would land every member in ONE window task,
    * and AQE cannot split window partitions — whereas min() partial-
    * aggregates map-side and the join-back is an equi-join AQE's
    * skew-join CAN split. Same rows; the oracle keeps the windowed SQL
    * (DuckDB is not scale-bound). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documents(s, dir)
      .select(col("doc_id"), md5(normalized(col("text"))).as("fp_norm"))
    val keepers = fp.groupBy(col("fp_norm")).agg(min(col("doc_id")).as("canonical_id"))
    fp.join(keepers, "fp_norm")
      .select(col("doc_id"), col("fp_norm"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).cast("int").as("is_dup"))
  }

  val dedupExactSql: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '[^\p{L}]+', ' ', 'g'))) AS fp_norm,
      |  MIN(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '[^\p{L}]+', ' ', 'g')))) AS canonical_id,
      |  CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '[^\p{L}]+', ' ', 'g')))) AS INT) AS is_dup
      |FROM documents""".stripMargin

  // ------------------------------------------------------ dedup_ngram
  /** Max shingle document frequency: posting lists longer than this are
    * stop-shingles and dropped BEFORE the self-join — bounds the join
    * fan-out (df² per shingle) at any corpus size. */
  private val MaxDf = 50

  /** 3-gram token shingles, distinct per doc. Docs with <3 tokens have
    * no shingles (they surface with best_match_id = -1). */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    shinglesOf(Tables.documentsWide(s, dir)) // fan the md5 kernel out (r16)

  /** The shingle kernel over any documents-shaped frame — ONE
    * definition shared by the ngram family and [[containmentOver]], so
    * a tokenization or gram-width change can never de-synchronize
    * their candidate sets. */
  private[graft] def shinglesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(normalized(col("text")), " ").as("w"))
      .where(size(col("w")) >= 3)
      .selectExpr("doc_id",
        // Spark SQL array subscripts are 0-based (DuckDB's are 1-based)
        s"${TextAnalysis.gramExplodeExpr(3, distinctPerDoc = true)} as s")

  /** 8-byte gram id for the packed-sorted-array verify tiers (r15,
    * cashing the lever the r14 stage anatomy priced): every site that
    * packs per-doc gram SETS into sorted arrays for the
    * [[graft.functions.IntersectSizeSorted]] merge hashes the gram
    * string to a dictionary-free 64-bit id first. The ~32-byte 3-word
    * gram strings were the dominant bytes of the verify exchanges
    * (allpairs at the distinct-heavy 100× tier: 5.0 GB of pairs+arrays
    * read by the one 985-task-second verify stage — r14e StageProbe);
    * ids cut the array payload ~4× and the in-loop compare from
    * `UTF8String.compareTo` to `Long.compare`. Candidate GENERATION
    * and df statistics stay on the exact strings — only the
    * set-intersection COUNT rides hashes.
    *
    * COLLISION CONTRACT: `xxhash64` is not injective, so |h(A) ∩ h(B)|
    * can exceed |A ∩ B| if two DISTINCT grams on opposite sides of one
    * compared pair collide in 64-bit space. The probability per pair is
    * ≈ |A|·|B| / 2⁶⁴ (~5·10⁻¹⁴ for thousand-gram docs); across 10⁸
    * candidate pairs the expected overcount is ~10⁻⁵ intersection UNITS
    * workload-wide, and an overcount matters only when that single unit
    * flips a pair across τ/ContainT. A same-doc collision makes the
    * packed array a multiset; the sorted merge counts equal runs at
    * min(multiplicity), which still equals the true shared-gram count
    * unless the colliding partner is itself shared — the same vanishing
    * order. This is the standard 64-bit-fingerprint dedup trade
    * (MinHash/SimHash gates live on far coarser sketches); the oracle
    * twins hash exact strings, so the DuckDB gates double as standing
    * collision canaries on every fixture. */
  private def gramId(c: Column): Column = xxhash64(c)

  /** Plan-shape note: the df-kept shingle stream (`kept`) feeds both the
    * posting lists and the per-doc sizes; its two child exchanges (the
    * shingle stream and the kept-key set, both hashed on s) are shared
    * by ReuseExchange, so the semi-join replays from shuffle files for
    * the second reader — nothing stays persisted after the action (an
    * early version re-expanded the scan 8× in a 189-node plan). Pair
    * candidates are generated by exploding per-shingle posting lists —
    * the df cap bounds the explosion at df² per shingle — and both
    * directions are emitted by one explode instead of a
    * subtree-duplicating union. */
  def dedupNgram(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    // df FIRST, collect AFTER: count() partial-aggregates map-side, so a
    // stop-shingle ("terms of service…" in 10⁸ docs) costs one long per
    // partition before the filter drops it. The previous shape —
    // collect_list then size() <= MaxDf — built the FULL posting list in
    // one aggregation buffer before filtering: collect_list has no
    // partial-combine cap, so a hot shingle materialized a df-length
    // array in a single task (multi-GB at 100×). Now every collected
    // list is ≤ MaxDf BY CONSTRUCTION (the semi-join admits only low-df
    // shingles) — the DuckDB twin's keep/sh CTE shape.
    val keep = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .where(col("df") <= MaxDf).select(col("s"))
    val kept = sh.join(keep, Seq("s"), "left_semi")
    val lists = kept.groupBy(col("s")).agg(collect_list(col("doc_id")).as("ds"))
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = {
      import s.implicits._
      // typed flatMap: the nested-transform HOF equivalent is
      // interpreted per element and ~3× slower on wide posting lists.
      // Emit each pair ONCE (x < y): the (da, db) intersection count is
      // the dominant aggregation — up to df² rows per shingle — and
      // Jaccard is symmetric, so the second direction is recovered
      // AFTER aggregation from the tiny j table (the same one-explode
      // post-aggregation symmetrize dedupMinhash uses; emitting both
      // directions here doubled the heaviest shuffle)
      lists.select(col("ds")).as[Seq[Long]]
        .flatMap { ds =>
          val a = ds.toArray
          for { x <- a.iterator; y <- a if x < y } yield (x, y)
        }
        .toDF("da", "db")
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("inter"))
    }
    val jHalf = inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter")).cast("double")).as("j"))
    val j = jHalf.select(explode(array(
        struct(col("da"), col("db"), col("j")),
        struct(col("db").as("da"), col("da").as("db"), col("j")))).as("r"))
      .select(col("r.da").as("da"), col("r.db").as("db"), col("r.j").as("j"))
    val best = j
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("da")).orderBy(col("j").desc, col("db"))))
      .where(col("rn") === 1)
      .select(col("da"), col("db").as("best"), col("j"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(best, col("doc_id") === col("da"), "left")
      .select(col("doc_id"),
        coalesce(col("best"), lit(-1L)).as("best_match_id"),
        coalesce(col("j"), lit(0.0)).as("best_jaccard"))
  }

  val dedupNgramSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM docs WHERE len(w) >= 3),
       |keep AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(1) <= $MaxDf),
       |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN keep ON sh0.s = keep.s),
       |sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT da, db,
       |    CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS j
       |  FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id),
       |sym AS (SELECT da, db, j FROM j UNION ALL SELECT db, da, j FROM j),
       |best AS (
       |  SELECT da, db AS best, j,
       |         ROW_NUMBER() OVER (PARTITION BY da ORDER BY j DESC, db) AS rn
       |  FROM sym)
       |SELECT d.doc_id,
       |  COALESCE(b.best, -1) AS best_match_id,
       |  COALESCE(b.j, 0.0) AS best_jaccard
       |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
       |  ON d.doc_id = b.da""".stripMargin

  // ---------------------------------------------------- dedup_minhash
  /** MinHash/LSH parameters, shared verbatim by the Spark plan and the
    * generated oracle SQL. K hashes in B bands of R rows; universal
    * hash h_i(x) = (a_i·x + b_i) mod P over md5-derived 32-bit shingle
    * ids (a_i < 2^30 keeps a·x inside a 64-bit long). */
  /** 8 bands × 2 rows: collision threshold ≈ (1/b)^(1/r) ≈ 0.35 —
    * tuned to catch near-duplicates (J ≥ 0.5) with >99% probability. */
  val K = 16; val Bands = 8; val RowsPerBand = 2
  val P = 4294967311L // smallest prime > 2^32

  /** Max members considered per (band_id, band_key) bucket. Band-key
    * collisions grow O(N/2^bits) per bucket and candidate pairs
    * O(N²/2^bits) — on a duplicate-heavy corpus (the NORMAL case for
    * dedup) all near-identical docs share band keys and an uncapped
    * self-join goes quadratic (the 10× rehearsal measured exactly this
    * blowup on the vector-LSH twin: 87 s → 2.9 s once capped, see
    * [[Similarity.MaxBucket]]). Members are kept deterministically
    * (first [[MaxBucket]] by doc_id per bucket), mirrored verbatim in
    * the oracle SQL; overfull buckets lose recall — the standard LSH
    * probe-limit tradeoff. Fixture-scale buckets stay under the cap,
    * so small-scale results are unchanged. */
  val MaxBucket = 64
  val HashA: Seq[Long] = (0 until K).map(i => ((2654435761L * (2 * i + 1)) % (1L << 30)) | 1L)
  val HashB: Seq[Long] = (0 until K).map(i => (2246822519L * (2 * i + 2)) % (1L << 30))

  /** 32-bit shingle id from md5 — identical in Spark and DuckDB. */
  private val xSpark = "cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint) % 4294967296"
  private val xDuck = "CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % 4294967296"

  /** MinHash signatures computed per-document in a single pass — no
    * shuffle at all (signature work is doc-local; the explode+groupBy
    * alternative shuffles every shingle row). Tokenization/hashing
    * mirror the SQL oracle exactly: lower → strip non-letters → 3-gram
    * shingles → md5 first 15 hex digits → mod 2³² → K universal hashes.
    */
  /** (doc_id, x) 32-bit shingle ids — input stream for signature
    * aggregation (also consumable by [[graft.functions.MinHashAgg]]). */
  private[graft] def shingleHashes(s: SparkSession, dir: String): DataFrame =
    shingles(s, dir).selectExpr("doc_id", s"$xSpark as x")

  private[graft] def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    minhashSignaturesOf(s, Tables.documents(s, dir))

  /** Signature kernel over an arbitrary (doc_id, text) frame — the
    * two-table incremental path feeds batch and snapshot through here
    * separately (each side scanned once; the work is doc-local). */
  private[graft] def minhashSignaturesOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val (ks, bandsN, p) = (K, Bands, P)
    val (ha, hb) = (HashA.toArray, HashB.toArray)
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, text) =>
          val toks = text.toLowerCase.replaceAll("[^\\p{L}]+", " ").trim.split(" ")
          if (toks.length < 3) Iterator.empty
          else {
            val mins = Array.fill(ks)(Long.MaxValue)
            val seen = new scala.collection.mutable.HashSet[String]
            var t = 0
            while (t <= toks.length - 3) {
              val sh = s"${toks(t)} ${toks(t + 1)} ${toks(t + 2)}"
              if (seen.add(sh)) {
                md.reset()
                val d = md.digest(sh.getBytes("UTF-8"))
                // first 15 hex digits == big-endian first 8 bytes >>> 4
                // (exactly Long.parseLong(hexPrefix15, 16), sans strings)
                var be = 0L; var bi = 0
                while (bi < 8) { be = (be << 8) | (d(bi) & 0xffL); bi += 1 }
                val x32 = (be >>> 4) % 4294967296L
                var i = 0
                while (i < ks) {
                  val h = (ha(i) * x32 + hb(i)) % p
                  if (h < mins(i)) mins(i) = h
                  i += 1
                }
              }
              t += 1
            }
            Iterator.single((id, mins.toSeq))
          }
        }
      }
      .toDF("doc_id", "m")
      .select(col("doc_id") +: (0 until K).map(i => col("m")(i).as(s"m$i")): _*)
  }

  /** MinHash signatures computed via the MERGEABLE typed Aggregator
    * ([[graft.functions.MinHashAgg]]) instead of the per-document
    * mapPartitions kernel — the partial-aggregate form that composes
    * with any partitioning, map-side combine, and streaming state.
    * Registered as its own gate query so the UDAF surface is
    * driver-verified against the same DuckDB minhash oracle the kernel
    * path uses (MinHashAggSpec additionally asserts agg == kernel
    * bit-for-bit). */
  def minhashAggSig(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.MinHashAgg(K, HashA.toArray, HashB.toArray, P)
    shingleHashes(s, dir).as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sig"))
      .toDF("doc_id", "sig")
      .select(col("doc_id") +: (0 until K).map(i => col("sig")(i).as(s"m$i")): _*)
  }

  val minhashAggSigSql: String =
    s"""${minhashEstCteSql(recursive = false)}
       |SELECT doc_id, ${(0 until K).map(i => s"m$i").mkString(", ")} FROM mh""".stripMargin

  /** Shared LSH candidate stage: (mh signatures, est pairs). `est` has
    * one row per band-colliding pair with da < db and the
    * signature-agreement Jaccard estimate. mh is tiny (K longs per doc)
    * but referenced three times (banding + both estimate joins), and
    * recomputing it means re-hashing every shingle per reference — it
    * is materialized once either by persist or by a shared exchange,
    * per [[minhashEst]]'s `persistMh` contract. */
  /** LSH banding stage over a K-column signature table, parameterized
    * by the (bands, rowsPerBand) operating point. The collision curve
    * is P(candidate) = 1 − (1 − j^r)^b: more rows per band (r↑) sharpens
    * precision, more bands (b↑) raises recall — and at larger corpus
    * sizes r must GROW (~log N) to keep expected per-band bucket
    * population N·p^r bounded, which is why the operating point is a
    * parameter and not a constant. Coarser points are strict
    * refinements: every (b, 2r) candidate is a (2b, r) candidate
    * (DedupSpec pins the inclusion chain).
    *
    * Candidates are capped per (band, bucket) — `maxBucket` members,
    * deterministic by doc_id — bounding the self-join fan-out at
    * b·maxBucket²/2 pairs per bucket regardless of how degenerate the
    * corpus is (the 87 s → 2.9 s fix measured on the 10× rehearsal,
    * SCALE.md). */
  /** Capped (doc_id, band_id, band_key) rows for one signature table —
    * the banding half of [[bandCandidates]], reusable by the two-table
    * incremental path (which bands each side separately and cross-joins
    * instead of self-joining). */
  private[graft] def bandedKeys(mh: DataFrame, bands: Int = Bands,
      rowsPerBand: Int = RowsPerBand, maxBucket: Int = MaxBucket): DataFrame = {
    require(bands * rowsPerBand <= K,
      s"bands ($bands) x rowsPerBand ($rowsPerBand) exceeds the $K-row signature")
    val stackArgs = (0 until bands).map { b =>
      val ms = (0 until rowsPerBand).map(r => s"m${b * rowsPerBand + r}")
      s"'b$b', concat_ws('_', ${ms.mkString(", ")})"
    }.mkString(", ")
    // deterministic per-bucket cap (see [[MaxBucket]]) via the bounded
    // mergeable aggregate, NOT a window: row_number over (band, key)
    // lands every member of a hot bucket in one task, while
    // [[graft.functions.TopKLongAgg]] caps each partition's partial
    // state at K ids before the exchange — the oracle keeps the
    // windowed formulation (identical selection: the K smallest ids)
    val topk = udaf(new graft.functions.TopKLongAgg(maxBucket))
    mh.selectExpr(
        "doc_id", s"stack($bands, $stackArgs) as (band_id, band_key)")
      .groupBy(col("band_id"), col("band_key"))
      .agg(topk(col("doc_id")).as("ids"))
      .select(col("band_id"), col("band_key"), explode(col("ids")).as("doc_id"))
      .select(col("doc_id"), col("band_id"), col("band_key"))
  }

  private[graft] def bandCandidates(mh: DataFrame, bands: Int = Bands,
      rowsPerBand: Int = RowsPerBand, maxBucket: Int = MaxBucket): DataFrame = {
    val banded = bandedKeys(mh, bands, rowsPerBand, maxBucket)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
  }

  /** `persistMh = true` callers run MULTIPLE jobs against mh (dedupCc's
    * propagation loop) and MUST unpersist the returned handle when done.
    * Single-action callers (dedupMinhash, dedupEdit) pass false: mh is
    * then shared through a deliberate repartition(doc_id) EXCHANGE —
    * the signature kernel runs once at shuffle write, ReuseExchange
    * serves all three readers (banding + both estimate joins, whose
    * doc_id join distribution the repartition already satisfies), and
    * shuffle files are reclaimed automatically, so nothing stays
    * persisted after the action (DedupSpec pins getPersistentRDDs
    * empty). */
  /** Signature-agreement estimate for an explicit candidate frame. */
  private def agreeEst(cand: DataFrame, ma: DataFrame, mb: DataFrame): DataFrame = {
    val agree = (0 until K).map(i =>
      when(col(s"ma.m$i") === col(s"mb.m$i"), 1).otherwise(0)).reduce(_ + _)
    cand
      .join(ma.as("ma"), col("da") === col("ma.doc_id"))
      .join(mb.as("mb"), col("db") === col("mb.doc_id"))
      .select(col("da"), col("db"), (agree.cast("double") / lit(K.toDouble)).as("est_j"))
  }

  /** Banded self-join candidates + estimates over one signature table. */
  private[graft] def estOf(mh: DataFrame): DataFrame =
    agreeEst(bandCandidates(mh), mh, mh)

  /** Cross-side candidates + estimates (a-side × b-side only, each side
    * banded and bucket-capped independently — the incremental probe). */
  private[graft] def crossEst(mhA: DataFrame, mhB: DataFrame): DataFrame = {
    val cand = bandedKeys(mhA).as("a")
      .join(bandedKeys(mhB).as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key"))
      // the two sides are normally disjoint (batch vs snapshot), but if
      // a doc_id appears in both, it must not become its own est_j=1.0
      // "duplicate" — mirror the self-join path's a < b exclusion
      .where(col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    agreeEst(cand, mhA, mhB)
  }

  private[graft] def minhashEst(s: SparkSession, dir: String,
      persistMh: Boolean = true): (DataFrame, DataFrame) = {
    val sig = minhashSignatures(s, dir)
    val mh = if (persistMh) sig.persist() else sig.repartition(col("doc_id"))
    (mh, estOf(mh))
  }

  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val (_, est) = minhashEst(s, dir, persistMh = false)
    // both directions from ONE explode — a union would duplicate the
    // whole candidate-join subtree in the plan
    val sym = est.select(explode(array(
        struct(col("da"), col("db"), col("est_j")),
        struct(col("db").as("da"), col("da").as("db"), col("est_j")))).as("r"))
      .select(col("r.da").as("da"), col("r.db").as("db"), col("r.est_j").as("est_j"))
    val best = sym
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("da")).orderBy(col("est_j").desc, col("db"))))
      .where(col("rn") === 1)
    Tables.documents(s, dir).select(col("doc_id"))
      .join(best, col("doc_id") === col("da"), "left")
      .select(col("doc_id"),
        coalesce(col("db"), lit(-1L)).as("best_match_id"),
        coalesce(col("est_j"), lit(0.0)).as("best_est_jaccard"))
  }

  /** DuckDB CTE chain `docs → sh0 → shx → mh → bands → cand → est`,
    * shared by the minhash and connected-components oracles (`recursive`
    * prepends the keyword the CC oracle's reachability CTE needs). */
  private[graft] def minhashEstCteSql(recursive: Boolean): String = {
    val minExprs = (0 until K)
      .map(i => s"MIN((${HashA(i)} * x + ${HashB(i)}) % $P) AS m$i").mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val ms = (0 until RowsPerBand).map(r => s"m${b * RowsPerBand + r}")
      s"SELECT doc_id, 'b$b' AS band_id, ${ms.map(m => s"CAST($m AS VARCHAR)").mkString(" || '_' || ")} AS band_key FROM mh"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until K)
      .map(i => s"CASE WHEN ma.m$i = mb.m$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH ${if (recursive) "RECURSIVE " else ""}docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM docs WHERE len(w) >= 3),
       |shx AS (SELECT doc_id, $xDuck AS x FROM sh0),
       |mh AS (
       |  SELECT doc_id,
       |    $minExprs
       |  FROM shx GROUP BY doc_id),
       |bands0 AS (
       |  $bandSelects),
       |bands AS (
       |  SELECT doc_id, band_id, band_key FROM (
       |    SELECT doc_id, band_id, band_key,
       |           ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS rn
       |    FROM bands0) WHERE rn <= $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |est AS (
       |  SELECT da, db, CAST($agree AS DOUBLE) / ${K.toDouble} AS est_j
       |  FROM cand JOIN mh ma ON da = ma.doc_id JOIN mh mb ON db = mb.doc_id)""".stripMargin
  }

  val dedupMinhashSql: String =
    s"""${minhashEstCteSql(recursive = false)},
       |sym AS (SELECT da, db, est_j FROM est UNION ALL SELECT db, da, est_j FROM est),
       |best AS (
       |  SELECT da, db, est_j,
       |         ROW_NUMBER() OVER (PARTITION BY da ORDER BY est_j DESC, db) AS rn
       |  FROM sym)
       |SELECT d.doc_id,
       |  COALESCE(b.db, -1) AS best_match_id,
       |  COALESCE(b.est_j, 0.0) AS best_est_jaccard
       |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
       |  ON d.doc_id = b.da""".stripMargin

  // ----------------------------------------------- dedup_minhash_incr
  /** Near-duplicate check of a NEW batch against an existing snapshot —
    * the LSH counterpart of [[Cleaning.dedupIncrementalVs]]'s exact
    * check, i.e. "is today's crawl a near-dup of anything we already
    * have". Signatures are computed per side (each input scanned once,
    * doc-local work); each side is banded and bucket-capped
    * INDEPENDENTLY, then candidates come from a band-key join of new
    * against old — never new×new or old×old, so a duplicate-heavy batch
    * cannot quadratically self-collide here. At 100 TB the snapshot's
    * band table is the thing you'd precompute and store alongside the
    * corpus; this operator's join is exactly the probe against it.
    *
    * Output: one row per batch doc — best snapshot match (or -1), the
    * signature-agreement estimate, and is_dup at [[CcThreshold]]. */
  def dedupMinhashVs(s: SparkSession, batch: DataFrame, snapshot: DataFrame): DataFrame = {
    // each signature table feeds banding + its estimate join — root them
    // in a deliberate exchange so ReuseExchange shares the kernel pass
    val sigO = minhashSignaturesOf(s, snapshot).repartition(col("doc_id"))
    dedupMinhashVsSig(s, batch, sigO)
  }

  /** STORED-INDEX steady-state entry (the [[dedupCcVs]] analog): the
    * snapshot side arrives as its ALREADY-MATERIALIZED signature table
    * (the [[minhashSignaturesOf]] schema — at 100 TB a table written
    * once at ingest), so only the batch is ever hashed at probe time.
    * If a doc_id appears on both sides it is NOT flagged as its own
    * duplicate ([[crossEst]] excludes da == db); overlapping CONTENT
    * under different ids still matches, as it should.
    * DedupSpec proves the signature table survives a parquet round trip
    * with identical probe output. */
  def dedupMinhashVsSig(s: SparkSession, batch: DataFrame, sigSnapshot: DataFrame): DataFrame = {
    val sigN = minhashSignaturesOf(s, batch).repartition(col("doc_id"))
    val best = crossEst(sigN, sigSnapshot)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("da")).orderBy(col("est_j").desc, col("db"))))
      .where(col("rn") === 1)
    batch.select(col("doc_id"))
      .join(best, col("doc_id") === col("da"), "left")
      .select(col("doc_id"),
        coalesce(col("db"), lit(-1L)).as("dup_of"),
        coalesce(col("est_j"), lit(0.0)).as("best_est_jaccard"),
        (coalesce(col("est_j"), lit(0.0)) >= lit(CcThreshold)).as("is_dup"))
  }

  /** Gate query: batch = doc_id ≡ 1 (mod 3), snapshot = the rest —
    * routed through the genuine two-table entry with the split as the
    * argument (the operator shape is two-input, not a self-join
    * artifact). */
  def dedupMinhashIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    dedupMinhashVs(s,
      docs.where(col("doc_id") % 3 === 1),
      docs.where(col("doc_id") % 3 =!= 1))
  }

  /** DuckDB twin: same signature chain as [[dedupMinhashSql]], but
    * bands capped per side and candidates restricted to new×old.
    * (lazy: references [[CcThreshold]], declared later in this object —
    * an eager val here would interpolate its pre-init 0.0). */
  lazy val dedupMinhashIncrSql: String =
    s"""${minhashEstCteSql(recursive = false)},
       |bn AS (
       |  SELECT doc_id, band_id, band_key FROM (
       |    SELECT doc_id, band_id, band_key,
       |           ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS rn
       |    FROM bands0 WHERE doc_id % 3 = 1) WHERE rn <= $MaxBucket),
       |bo AS (
       |  SELECT doc_id, band_id, band_key FROM (
       |    SELECT doc_id, band_id, band_key,
       |           ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS rn
       |    FROM bands0 WHERE doc_id % 3 <> 1) WHERE rn <= $MaxBucket),
       |candx AS (
       |  SELECT DISTINCT n.doc_id AS da, o.doc_id AS db
       |  FROM bn n JOIN bo o ON n.band_id = o.band_id AND n.band_key = o.band_key),
       |estx AS (
       |  SELECT da, db, CAST(${(0 until K).map(i => s"CASE WHEN ma.m$i = mb.m$i THEN 1 ELSE 0 END").mkString(" + ")} AS DOUBLE) / ${K.toDouble} AS est_j
       |  FROM candx JOIN mh ma ON da = ma.doc_id JOIN mh mb ON db = mb.doc_id),
       |bestx AS (
       |  SELECT da, db, est_j,
       |         ROW_NUMBER() OVER (PARTITION BY da ORDER BY est_j DESC, db) AS rn
       |  FROM estx)
       |SELECT d.doc_id,
       |  COALESCE(b.db, -1) AS dup_of,
       |  COALESCE(b.est_j, 0.0) AS best_est_jaccard,
       |  COALESCE(b.est_j, 0.0) >= $CcThreshold AS is_dup
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 1) d
       |LEFT JOIN (SELECT * FROM bestx WHERE rn = 1) b ON d.doc_id = b.da""".stripMargin

  // --------------------------------------------- dedup_threshold_curve
  /** Threshold-tuning curve for the near-dup pipeline: the LSH
    * candidate pairs bucketed by signature agreement (est_j is
    * K-quantized — agree/K with agree ∈ 0..K — so the curve is an
    * exact ≤K+1-row table, no binning choices), with the cumulative
    * pair count at-or-above each level. Reading it IS how
    * [[CcThreshold]] gets chosen: the operator shows how many pairs
    * (and so how much CC merge pressure) each candidate threshold
    * admits. One pass over the existing estimate kernel + a ≤K+1-row
    * aggregation; the cumulative sum is a window over that tiny
    * table. */
  def dedupThresholdCurve(s: SparkSession, dir: String): DataFrame = {
    val (_, est) = minhashEst(s, dir, persistMh = false)
    val counts = est
      .select((round(col("est_j") * K).cast("long")).as("agree"))
      .groupBy(col("agree")).agg(count(lit(1)).as("n_pairs"))
    counts
      .withColumn("n_at_or_above",
        sum(col("n_pairs")).over(Window.orderBy(col("agree").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("agree"),
        (col("agree").cast("double") / K.toDouble).as("est_j"),
        col("n_pairs"), col("n_at_or_above"))
  }

  /** est_j·K is exact (est_j was agree/K — one IEEE division whose
    * round-trip recovers the integer), so both engines bucket
    * identically. */
  lazy val dedupThresholdCurveSql: String =
    s"""${minhashEstCteSql(recursive = false)},
       |cc AS (
       |  SELECT CAST(round(est_j * $K) AS BIGINT) AS agree,
       |         CAST(COUNT(1) AS BIGINT) AS n_pairs
       |  FROM est GROUP BY 1)
       |SELECT agree, CAST(agree AS DOUBLE) / $K AS est_j, n_pairs,
       |       CAST(SUM(n_pairs) OVER (ORDER BY agree DESC
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at_or_above
       |FROM cc""".stripMargin

  // ------------------------------------------------ dedup_recall_eval
  /** Ground-truth sample: doc_id ≡ 0 (mod this). 2 at fixture scale so
    * the sampled truth set is non-empty (near-dup PAIRS thin out
    * quadratically under sampling: a mod-m sample keeps ~1/m² of
    * them); at corpus scale the mod grows with N to keep the exact
    * side's sample² budget fixed.
    *
    * The "grows with N" clause is now an actual parameter
    * (`SPARK_GRAFT_RECALL_MOD`, r15): the mixed/boilerplate 100× leg
    * ran the fixture constant 2 against a 500k-doc corpus whose
    * boilerplate shingles appear in EVERY sampled doc — the cap-free
    * truth join's Σ df² became ~26 × (250k)² intermediate rows and
    * died of disk (ENOSPC), which is not a defect but the documented
    * sample² budget being exceeded by a sample that should have been
    * held fixed-size. The env knob is read once at class init and
    * interpolated into the DuckDB twin too, so the operator and its
    * oracle always sample identically; the gate harnesses never set
    * it, so gate outputs/hashes are untouched. */
  val RecallSampleMod: Int =
    sys.env.get("SPARK_GRAFT_RECALL_MOD").map(_.toInt).getOrElse(2)

  /** Recall evaluation of the MinHash-LSH index — [[Similarity]]'s
    * `sim_recall_eval` discipline applied to the dedup family: ground
    * truth (exact distinct-3-gram Jaccard ≥ [[RecallThresh]]) is
    * affordable only on a SAMPLED doc subset, while the candidate side
    * is the PRODUCTION banding over the whole corpus ([[bandedKeys]]
    * with its bucket caps — the thing whose recall you are actually
    * shipping). Output: every true near-dup pair within the sample,
    * its exact Jaccard, and `is_candidate` marking whether LSH banding
    * surfaced it — the measurement behind every (bands, rowsPerBand)
    * tuning decision, and the honest price tag on the bucket caps.
    *
    * Scale: the exact side self-joins shingles WITHIN the sample only
    * — no df cap needed because cost is bounded by the FIXED sample
    * size (a stop-shingle shared by all sample docs costs sample²
    * pairs, the budget the eval explicitly buys), never by corpus
    * size. The candidate side reuses the banding exchange the dedup
    * pipeline already runs; restricting it to sample×sample pairs is
    * a post-banding filter.
    *
    * @note persist ownership as in [[allpairsOver]]: the returned plan
    *       pins a persisted intermediate (the contraction groups
    *       frame). The harness releases it between gates via
    *       [[graft.Graft.releaseState]]; a library caller owns that
    *       release — call `Graft.releaseState(spark)` (or
    *       `spark.catalog.clearCache()`) after consuming the result. */
  def dedupRecallEval(s: SparkSession, dir: String): DataFrame = {
    // exact-duplicate contraction on the truth side (r13): the sampled
    // exact self-join is DELIBERATELY df-cap-free (measuring over
    // capped sets is what the eval exists to avoid — the r12 A/B that
    // rejected the packed-array rewrite stands), but cap-free must not
    // mean duplication-quadratic on the wire: the r13 100× sweep
    // measured the exploded form at 640 s with 638 GB of spill and a
    // 385 s max task on the all-replica fixture. Equal normalized
    // texts have equal shingle sets, so the exact-Jaccard machinery
    // runs over one rep per distinct sampled text and the true pair
    // set is re-expanded analytically — intra-group pairs at Jaccard
    // exactly 1.0 (always ≥ RecallThresh; suppressed for shingle-less
    // reps, which the self-join never paired either), cross-group
    // pairs inheriting their rep pair's exact n_a/n_b/jaccard. Rows
    // are byte-identical to the exploded form (gate-hash-pinned);
    // NOTHING is capped — every true pair is still emitted and judged
    // against the production banding.
    val docs = Tables.documents(s, dir)
      .where(col("doc_id") % RecallSampleMod === 0)
    val groups = docs
      .select(col("doc_id"), md5(normalized(col("text"))).as("fpx"))
      .groupBy(col("fpx"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("members"),
        count(lit(1)).as("gsize"))
      // FOUR consumers (rep semi-join, intra expansion, cross ×2);
      // released by the harness sweep — see the @note above
      .persist()
    val sh = shinglesOf(docs.join(
      groups.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // hint("merge"): identical-sides self-join — the same AQE build-side
    // jitter class pinned on allpairsOver/allpairsVs (r13/r14); SMJ is
    // deterministic and the only correct strategy when the sampled
    // shingle table is large (it must never be broadcast at corpus
    // scale; the sample bound caps rows, not bytes-per-shingle).
    val inter = sh.as("a")
      .join(sh.as("b").hint("merge"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    val truthRep = inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"), col("sa.n").as("n_a"), col("sb.n").as("n_b"),
        (col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= lit(RecallThresh))
    val intra = groups.where(col("gsize") >= 2)
      .join(sizes.select(col("doc_id").as("rep"), col("n")), Seq("rep"))
      .select(col("n"), col("members"),
        posexplode(col("members")).as(Seq("pos", "da")))
      .select(col("da"), col("n"),
        explode(expr("slice(members, pos + 2, size(members) - pos - 1)")).as("db"))
      .select(col("da"), col("db"), col("n").as("n_a"), col("n").as("n_b"),
        lit(1.0).as("jaccard"))
    val cross = truthRep
      .join(groups.select(col("rep").as("da"), col("members").as("ma")), Seq("da"))
      .join(groups.select(col("rep").as("db"), col("members").as("mb")), Seq("db"))
      .select(col("n_a"), col("n_b"), col("jaccard"),
        col("mb"), explode(col("ma")).as("a"))
      .select(col("n_a"), col("n_b"), col("jaccard"), col("a"),
        explode(col("mb")).as("b"))
      .select(least(col("a"), col("b")).as("da"),
        greatest(col("a"), col("b")).as("db"),
        when(col("a") < col("b"), col("n_a")).otherwise(col("n_b")).as("n_a"),
        when(col("a") < col("b"), col("n_b")).otherwise(col("n_a")).as("n_b"),
        col("jaccard"))
    val truth = cross.unionByName(intra)
    val mh = minhashSignatures(s, dir).repartition(col("doc_id"))
    val cand = bandCandidates(mh)
      .where(col("da") % RecallSampleMod === 0 && col("db") % RecallSampleMod === 0)
    truth.join(cand.withColumn("hit", lit(1)), Seq("da", "db"), "left")
      .select(col("da"), col("db"), col("n_a"), col("n_b"), col("jaccard"),
        coalesce(col("hit"), lit(0)).as("is_candidate"))
  }

  /** True-pair threshold for the recall eval (the CC edge threshold —
    * the pairs the pipeline MUST find). */
  def RecallThresh: Double = CcThreshold

  /** Oracle: candidate side is [[minhashEstCteSql]]'s banding chain
    * VERBATIM (the eval cannot drift from the index it evaluates);
    * truth side is the cap-free exact Jaccard within the sample.
    * (lazy: references [[CcThreshold]], declared below — a strict val
    * would capture its pre-initialization 0.0.) */
  lazy val dedupRecallEvalSql: String =
    s"""${minhashEstCteSql(recursive = false)},
       |scand AS (
       |  SELECT da, db FROM cand
       |  WHERE da % $RecallSampleMod = 0 AND db % $RecallSampleMod = 0),
       |ssh AS (SELECT doc_id, s FROM sh0 WHERE doc_id % $RecallSampleMod = 0),
       |sz AS (SELECT doc_id, COUNT(1) AS n FROM ssh GROUP BY 1),
       |it AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS inter
       |  FROM ssh a JOIN ssh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT da, db, sa.n AS n_a, sb.n AS n_b,
       |         CAST(it.inter AS DOUBLE) / CAST(sa.n + sb.n - it.inter AS DOUBLE) AS jaccard
       |  FROM it JOIN sz sa ON it.da = sa.doc_id JOIN sz sb ON it.db = sb.doc_id)
       |SELECT t.da, t.db, t.n_a, t.n_b, t.jaccard,
       |       CAST(c.da IS NOT NULL AS INT) AS is_candidate
       |FROM truth t LEFT JOIN scand c ON t.da = c.da AND t.db = c.db
       |WHERE t.jaccard >= $RecallThresh""".stripMargin

  // --------------------------------------------------------- dedup_cc
  /** Jaccard-estimate threshold above which an LSH candidate pair is a
    * near-duplicate edge for clustering. */
  val CcThreshold = 0.5

  /** Max label-propagation rounds. One-hop propagation needs
    * O(diameter) rounds; near-dup components are shallow (duplicates of
    * one source document collide pairwise, diameter ≲ 2), so 20 is a
    * generous bound with the convergence check exiting far earlier. */
  private val CcMaxIters = 20

  /** Near-duplicate clustering: connected components over the LSH
    * near-dup pair graph (est_j ≥ [[CcThreshold]]) — the transitive-
    * closure step a real pipeline runs after candidate generation, so
    * "A≈B, B≈C" lands A, B, C in one cluster with one canonical id.
    *
    * Distributed min-label propagation (Pregel-style, the same shape as
    * GraphX/GraphFrames CC): every doc starts labeled with its own id;
    * each round every node takes the min of its label and its
    * neighbors' labels (via one shuffle join on the symmetric edge
    * list) until a fixpoint. The fixpoint is unique (min doc_id per
    * component), so the result is deterministic regardless of round
    * count or partitioning. Each round localCheckpoints the label table:
    * labels are (long, long) pairs — O(docs) state, no lineage blowup.
    * Rounds are O(component diameter) — tiny for near-dup graphs; for
    * adversarially long chains switch to the large-star/small-star
    * variant (same join primitive, provably O(log n) rounds).
    */
  /** Symmetric (src, dst) edge list from one-direction (da, db) pairs. */
  private[graft] def symmetrize(edges: DataFrame): DataFrame =
    edges.select(explode(array(
        struct(col("da").as("src"), col("db").as("dst")),
        struct(col("db").as("src"), col("da").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** Min-label propagation to fixpoint over a PERSISTED symmetric edge
    * list, starting from `init` (doc_id, label). Convergence is
    * detected ON THE SAME PASS that materializes the round's labels (an
    * accumulator counts label decreases inside the eager
    * localCheckpoint job) — one job per round, not two. Retried tasks
    * can only over-count, and a converged round counts 0 in every
    * attempt, so the ==0 exit test is retry-safe. Returns the
    * localCheckpointed fixpoint.
    *
    * NON-CONVERGENCE ESCALATION (r15): past [[CcMaxIters]] rounds the
    * kernel switches to [[starContract]] (O(log n) rounds) instead of
    * throwing. The r14-era throw assumed deep components are
    * adversarial; the r15 mixed/boilerplate 100× legs proved they are
    * the NORMAL near-dup topology of a boilerplate-bearing corpus
    * (shared header/footer shingles raise short-doc pairwise Jaccard,
    * and the banding surfaces a sparse chain-heavy edge subset — three
    * gates died of the throw at the mixed tier). The fixpoints are
    * interchangeable: propagation yields, per node, the MIN init label
    * over its component; the star graph names each component, and one
    * groupBy-min + join-back reproduces exactly that — for ANY init
    * labeling, not only identity. Fixture-scale runs converge in <20
    * rounds, so gate plans, hashes, and fps never see this path.
    *
    * PRECONDITION (r16, ADVICE): every `sym` edge endpoint must appear
    * in `init`'s doc_id set. Propagation cannot move labels through a
    * node `init` never labeled, but the escalation's [[starContract]]
    * merges components THROUGH such bridge nodes — the two fixpoints
    * disagree exactly when the precondition is violated. Every current
    * caller passes init covering all endpoints (node sets are built by
    * unioning the edge endpoints or the full doc table). */
  private[graft] def propagateMin(s: SparkSession, init: DataFrame, sym: DataFrame,
      what: String): DataFrame = {
    var labels = graft.Graft.compactCheckpoint(init)
    var converged = false
    var it = 0
    while (!converged && it < CcMaxIters) {
      // r16 (guide §4): the round body is pure codegen expressions —
      // the previous Dataset.mapPartitions closure forced a
      // deserialize/serialize round-trip of every label row per round
      // AND erased the join's hash(doc_id) output partitioning (fresh
      // exprIds after SerializeFromObject), so every next round
      // re-shuffled the label table twice. Convergence now rides an
      // `observe` metric computed INSIDE the same localCheckpoint job
      // (CollectMetrics — no extra pass, no extra job); like the old
      // accumulator, a retried task can only over-count and a converged
      // round counts 0 in every attempt, so the ==0 exit is retry-safe.
      val obs = new org.apache.spark.sql.Observation() // UUID name: never collides
      val nbrMin = labels.join(sym, col("doc_id") === col("src"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr"))
      val next = graft.Graft.compactCheckpoint(
        labels.join(nbrMin, col("doc_id") === col("dst"), "left")
          .select(col("doc_id"),
            least(col("label"), coalesce(col("nbr"), col("label"))).as("label"),
            (col("nbr") < col("label")).as("improved"))
          .observe(obs,
            sum(when(col("improved"), 1L).otherwise(0L)).as("changed"))
          .select(col("doc_id"), col("label")))
      converged = obs.getAsJava.getOrDefault("changed", 0L) match {
        case null => true // empty label table: nothing can ever change
        case n: java.lang.Long => n == 0L
        case other => other.toString.toLong == 0L
      }
      // the superseded round's blocks are pinned by persistentRdds
      // (strong map — GC never reclaims them); release eagerly so live
      // storage is O(current round), not O(rounds) (Graft.releaseState
      // scaladoc; the final round is the harness's)
      graft.Graft.releaseCheckpoint(labels)
      labels = next
      it += 1
    }
    if (!converged) {
      // logger, not stdout (r15 VERDICT): a 100 TB operator's scale-path
      // switch must be observable in job telemetry
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$what: min-label propagation hit $CcMaxIters rounds " +
        "(component diameter exceeds the bound) — escalating to " +
        "large-star/small-star contraction (same fixpoint, O(log n) rounds)")
      // component ids from the star fixpoint (isolated nodes are their
      // own component), then each component takes its MIN init label —
      // the propagateMin fixpoint for any init labeling (scaladoc)
      val (star, _) = starContract(sym)
      val comp = init.select(col("doc_id"), col("label"))
        .join(star.withColumnRenamed("u", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("label"),
          coalesce(col("v"), col("doc_id")).as("comp"))
      val cmin = comp.groupBy(col("comp")).agg(min(col("label")).as("clabel"))
      val out = comp.join(cmin, Seq("comp"))
        .select(col("doc_id"), col("clabel").as("label"))
        .localCheckpoint()
      graft.Graft.releaseCheckpoint(labels)
      graft.Graft.releaseCheckpoint(star)
      return out
    }
    labels
  }

  /** (doc_id, cluster_id, cluster_size, is_canonical) from a label
    * fixpoint — shared output shape of all CC variants. */
  private[graft] def ccOutput(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"),
        (col("doc_id") === col("label")).cast("int").as("is_canonical"))
  }

  /** The near-dup edge set [[dedupCc]] clusters, built once and shared
    * with the graph capstone ([[Graphs.graphCanonical]]): minhash
    * estimates thresholded at [[CcThreshold]], symmetrized, hash-
    * positioned on `src` (the per-round probe key) and PERSISTED.
    * Returns (mh, sym); the caller unpersists both when its fixpoints
    * are severed from the lineage. */
  private[graft] def ccSymEdges(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (mh, est) = minhashEst(s, dir)
    val edges = est.where(col("est_j") >= CcThreshold).select(col("da"), col("db"))
    (mh, symmetrize(edges).repartition(col("src")).persist())
  }

  def dedupCc(s: SparkSession, dir: String): DataFrame = {
    val (mh, sym) = ccSymEdges(s, dir)
    val labels = propagateMin(s,
      Tables.documents(s, dir).select(col("doc_id"), col("doc_id").as("label")),
      sym, "dedupCc")
    sym.unpersist()
    mh.unpersist() // labels are localCheckpointed — lineage no longer reaches mh
    ccOutput(labels)
  }

  /** The CC reachability CTE chain `e/sym/reach/lab` (assumes `est` and
    * `documents` are defined, and the WITH is RECURSIVE) — one edge rule
    * shared textually by [[dedupCcSql]] and the graph capstone's oracle,
    * so a threshold change can never leave them clustering different
    * graphs. */
  private[graft] def ccCtesSql: String =
    s"""e AS MATERIALIZED (SELECT da, db FROM est WHERE est_j >= $CcThreshold),
       |sym AS MATERIALIZED (SELECT da AS src, db AS dst FROM e
       |        UNION ALL SELECT db, da FROM e),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst),
       |lab AS MATERIALIZED (SELECT src AS doc_id, MIN(dst) AS cluster_id
       |                     FROM reach GROUP BY src)""".stripMargin

  val dedupCcSql: String =
    s"""${minhashEstCteSql(recursive = true)},
       |$ccCtesSql
       |SELECT doc_id, cluster_id,
       |       COUNT(1) OVER (PARTITION BY cluster_id) AS cluster_size,
       |       CAST(doc_id = cluster_id AS INT) AS is_canonical
       |FROM lab""".stripMargin

  // ------------------------------------------------ dedup_keep_longest
  /** Composite argmax key: n_ws·2^40 + (2^40 − doc_id) — one BIGINT
    * whose MAX is "longest, then smallest id" (doc_id < 2^40 and
    * n_ws < 2^20 by the corpus contract, so the key < 2^61). */
  private def keepKey(n: Column, id: Column): Column =
    n * lit(1099511627776L) + (lit(1099511627776L) - id)

  /** KEEPER POLICY over near-dup clusters — "keep the LONGEST copy",
    * the policy real dedup pipelines apply where min-id is only a
    * tie-break: near-dup cluster members genuinely differ (a truncated
    * crawl vs the full page), and dropping by id throws away content.
    * (For EXACT dups the policy is vacuous — byte-identical copies have
    * identical length — which is why this runs on [[dedupCc]]'s
    * clusters, not [[dedupExact]]'s groups.) Per doc: its cluster, the
    * cluster's keeper under (max n_ws, then min doc_id), and the flag.
    *
    * Selection is ONE integer-key MAX per cluster (map-side combined)
    * + a join-back — the skew-safe keeper idiom; no window over
    * cluster_id (a boilerplate mega-cluster stays distributed). The
    * spec pins that the policy DIFFERS from the min-id canonical on
    * the fixture (otherwise this gate would prove nothing). */
  def dedupKeepLongest(s: SparkSession, dir: String): DataFrame = {
    val labels = dedupCc(s, dir).select(col("doc_id"), col("cluster_id"))
    val nWs = Tables.documents(s, dir).select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
        .cast("long").as("n_ws"))
    val keyed = labels.join(nWs, "doc_id")
      .withColumn("key", keepKey(col("n_ws"), col("doc_id")))
    val mx = keyed.groupBy(col("cluster_id")).agg(max(col("key")).as("mkey"))
    val keepers = keyed.join(mx, Seq("cluster_id"))
      .where(col("key") === col("mkey"))
      .select(col("cluster_id"), col("doc_id").as("keeper_id"))
    keyed.join(keepers, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_ws"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).cast("int").as("is_keeper"))
  }

  /** Twin: the full CC oracle as a nested subquery + the identical
    * integer-key argmax. */
  lazy val dedupKeepLongestSql: String =
    s"""WITH lab AS MATERIALIZED (SELECT doc_id, cluster_id FROM ($dedupCcSql)),
       |n AS (SELECT doc_id,
       |             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_ws
       |      FROM documents),
       |k AS (SELECT lab.doc_id, lab.cluster_id, n.n_ws,
       |             n.n_ws * 1099511627776 + (1099511627776 - lab.doc_id) AS key
       |      FROM lab JOIN n ON lab.doc_id = n.doc_id),
       |mx AS (SELECT cluster_id, MAX(key) AS mkey FROM k GROUP BY 1),
       |kp AS (SELECT k.cluster_id, k.doc_id AS keeper_id
       |       FROM k JOIN mx ON k.cluster_id = mx.cluster_id AND k.key = mx.mkey)
       |SELECT k.doc_id, k.cluster_id, k.n_ws, kp.keeper_id,
       |       CAST(k.doc_id = kp.keeper_id AS INT) AS is_keeper
       |FROM k JOIN kp ON k.cluster_id = kp.cluster_id""".stripMargin

  // --------------------------------------------------- dedup_cc_incr
  /** INCREMENTAL connected-components maintenance — the daily shape of
    * near-dup clustering: yesterday's component labels are a stored
    * table; today only the new batch's edges arrive (batch-internal
    * pairs + batch×snapshot probes against the stored band index, i.e.
    * exactly [[crossEst]]). Instead of re-running CC over the corpus,
    * every snapshot endpoint is CONTRACTED to its prior component
    * canonical: the reduced graph has one node per batch doc + one per
    * TOUCHED prior component, so the propagation works over
    * O(batch + touched components) — never the 100 TB snapshot. Prior
    * components are connected by construction, so contraction preserves
    * connectivity, and canonicals are component minima, so the reduced
    * fixpoint's minima are the true global minima — the result is
    * BIT-IDENTICAL to a full recompute, which is exactly how it is
    * gate-checked: this query's oracle IS [[dedupCcSql]], the full
    * recursive-CTE recompute. (Exactness caveat: the identity is over
    * the same EDGE set; when [[MaxBucket]] caps bind, per-side banding
    * can keep different bucket members than joint banding, so above the
    * cap both paths are approximations that may diverge slightly — the
    * standard LSH recall tradeoff, not an error in either path. Gate-SF
    * buckets stay far below the cap.)
    *
    * (The snapshot-side CC here is computed in-process as the stand-in
    * for the stored state, like the other incremental gate queries; a
    * real pipeline reads `prior` and the snapshot band table from
    * storage and runs ONLY the batch-sized stages.) */
  def dedupCcIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val batch = docs.where(col("doc_id") % 3 === 1)
    val snapshot = docs.where(col("doc_id") % 3 =!= 1)
    // ---- stand-in for yesterday's stored state (a real pipeline READS
    // both of these; the gate's wall time therefore charges prior-state
    // construction too — the steady-state cost is dedupCcVs alone)
    val sigS = minhashSignaturesOf(s, snapshot).repartition(col("doc_id"))
    val symS = symmetrize(
      estOf(sigS).where(col("est_j") >= CcThreshold).select(col("da"), col("db")))
      .persist()
    val prior = propagateMin(s,
      snapshot.select(col("doc_id"), col("doc_id").as("label")),
      symS, "dedupCcIncr/prior")
    symS.unpersist()
    dedupCcVs(s, batch, sigS, prior)
  }

  /** The genuine steady-state entry: `batch` docs, the snapshot's
    * STORED signature table, and the STORED prior labels. Runs only the
    * delta stages — batch signatures, batch-internal + cross probes,
    * contraction, reduced propagation, relabel. */
  def dedupCcVs(s: SparkSession, batch: DataFrame, sigS: DataFrame,
      prior: DataFrame): DataFrame =
    dedupCcVs(s, batch, sigS, prior, None)

  /** `sigBOpt`: a MATERIALIZED (persisted/checkpointed) signature table
    * for the batch, when the caller also needs it for a state write —
    * the streaming sink passes one checkpointed copy so signatures are
    * computed once per batch, not once per consumer. */
  def dedupCcVs(s: SparkSession, batch: DataFrame, sigS: DataFrame,
      prior: DataFrame, sigBOpt: Option[DataFrame]): DataFrame = {
    val sigB = sigBOpt.getOrElse(
      minhashSignaturesOf(s, batch).repartition(col("doc_id")))
    val internal = estOf(sigB)
      .where(col("est_j") >= CcThreshold).select(col("da"), col("db"))
    val cross = crossEst(sigB, sigS)
      .where(col("est_j") >= CcThreshold).select(col("da"), col("db"))
    // contract snapshot endpoints to their prior canonical
    val crossC = cross.join(prior.withColumnRenamed("doc_id", "sdoc"),
        col("db") === col("sdoc"))
      .select(col("da"), col("label").as("db"))
    val redEdges = internal.unionByName(crossC)
    // reduced nodes: every batch doc + every touched canonical
    val redNodes = batch.select(col("doc_id"))
      .unionByName(redEdges.select(col("db").as("doc_id")))
      .distinct()
    val symR = symmetrize(redEdges).persist()
    val red = propagateMin(s,
      redNodes.select(col("doc_id"), col("doc_id").as("label")),
      symR, "dedupCcIncr/delta")
    symR.unpersist()
    // final labels: batch docs from the reduced fixpoint; snapshot docs
    // re-labeled through their canonical's new label (untouched
    // components keep their prior label)
    val redLab = red.select(col("doc_id").as("rid"), col("label").as("rlabel"))
    val batchFinal = red.join(batch.select(col("doc_id")), "doc_id")
    val snapFinal = prior.join(redLab, col("label") === col("rid"), "left")
      .select(col("doc_id"), coalesce(col("rlabel"), col("label")).as("label"))
    ccOutput(batchFinal.unionByName(snapFinal))
  }

  // --------------------------------------------------- dedup_cc_star
  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * O(log n)-round escape hatch for adversarially deep components
    * where one-hop min-label propagation ([[dedupCc]]) needs
    * O(diameter) rounds.
    *
    *  - large-star(u): every neighbor v > u is re-pointed at
    *    m = min(N(u) ∪ {u})
    *  - small-star(u): every neighbor v < u (and u itself) is
    *    re-pointed at the minimum of the smaller neighborhood
    *
    * Both steps preserve connectivity; the fixpoint is the star graph
    * {(member, component-min)}, i.e. the same unique labeling as
    * min-label propagation — so either algorithm can serve the same
    * query and the same DuckDB oracle. Each round is two
    * groupBy-min + join passes over the edge list (no adjacency
    * collection); the round result is localCheckpointed to keep
    * lineage flat. Convergence = (count, Σ xxhash64(u,v)) unchanged
    * over a full round — ONE aggregation job on the already-
    * materialized edges instead of two exceptAll shuffles (a false
    * fixpoint needs a 64-bit multiset-hash collision between
    * consecutive rounds; StarCcSpec verifies exact fixpoints against
    * driver union-find).
    *
    * Returns (star edges (u, v=component-min), rounds used).
    */
  private[graft] def starContract(edges0: DataFrame, maxIters: Int = 40): (DataFrame, Int) = {
    // Σ hashes in DECIMAL(38,0): xxhash64 spans the full 64-bit range,
    // so a LongType sum overflows (ANSI error); decimal sum is exact.
    // r16: the signature rides an `observe` metric INSIDE the round's
    // own localCheckpoint job (CollectMetrics) — the separate sig()
    // aggregation job per round re-scanned the just-checkpointed edges
    // and was one of the two actions every round paid.
    def sigObserved(df: DataFrame): (DataFrame, () => (Long, String)) = {
      val obs = new org.apache.spark.sql.Observation()
      val observed = df.observe(obs, count(lit(1)).as("cnt"),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("sg"))
      (observed, () => {
        val m = obs.getAsJava
        val cnt = m.get("cnt") match {
          case null => 0L; case n: java.lang.Long => n.longValue()
          case other => other.toString.toLong
        }
        val sg = m.get("sg") match {
          case null => "0"
          case d: java.math.BigDecimal => d.toPlainString
          case other => other.toString
        }
        (cnt, sg)
      })
    }
    // canonical undirected edges u > v, self-loops dropped
    val (e0, sig0) = sigObserved(edges0
      .select(greatest(col("src"), col("dst")).as("u"),
              least(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct())
    var edges = graft.Graft.compactCheckpoint(e0)
    var prevSig = sig0()
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      // large-star over the symmetric adjacency; referenced twice below
      // (groupBy + join) so persisted for the round, not re-expanded
      val sym = edges.select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
      val mins = sym.groupBy(col("a"))
        .agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("mn"), col("a")).as("m"))
      val large = sym.join(mins, "a")
        .where(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct().persist()
      // small-star over edges oriented u > v
      val smins = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val (smallObs, sigK) = sigObserved(large.join(smins, "u")
        .select(explode(array(
          struct(col("v").as("x"), col("m")),
          struct(col("u").as("x"), col("m")))).as("e"))
        .select(greatest(col("e.x"), col("e.m")).as("u"),
                least(col("e.x"), col("e.m")).as("v"))
        .where(col("u") =!= col("v")).distinct())
      val small = graft.Graft.compactCheckpoint(smallObs)
      large.unpersist()
      val s = sigK()
      converged = s == prevSig
      prevSig = s
      graft.Graft.releaseCheckpoint(edges) // superseded round (see propagateMin)
      edges = small
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"starContract did not converge in $maxIters rounds")
    (edges, it)
  }

  /** Near-duplicate clustering via [[starContract]] — identical output
    * contract (and DuckDB oracle) to [[dedupCc]], different round
    * complexity: O(log n) vs O(diameter). */
  def dedupCcStar(s: SparkSession, dir: String): DataFrame = {
    val (mh, est) = minhashEst(s, dir)
    val edges = est.where(col("est_j") >= CcThreshold)
      .select(col("da").as("src"), col("db").as("dst"))
    val (star, _) = starContract(edges)
    mh.unpersist()
    val labels = Tables.documents(s, dir).select(col("doc_id"))
      .join(star.withColumnRenamed("u", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("v"), col("doc_id")).as("label"))
    ccOutput(labels) // shared output shape — identical contract to dedupCc
  }

  /** Same fixpoint as min-label propagation ⇒ same oracle. */
  val dedupCcStarSql: String = dedupCcSql

  // ------------------------------------------------------- dedup_edit
  /** Normalized-text prefix length fed to the edit-distance DP. */
  val EditPrefix = 200

  /** Edit-distance verification tier: exact Levenshtein over the LSH
    * candidate pairs (est_j ≥ [[CcThreshold]]). The O(n·m) DP never
    * touches the corpus — only the LSH-surviving pairs — and runs on a
    * fixed normalized prefix so one pathological document can't blow up
    * a task. This is the "verify before you delete" step between
    * sketch-based candidate generation and actual dedup action.
    * edit_sim = 1 − dist/max(len): one IEEE division, deterministic. */
  def dedupEdit(s: SparkSession, dir: String): DataFrame = {
    val (_, est) = minhashEst(s, dir, persistMh = false)
    val cand = est.where(col("est_j") >= CcThreshold).select(col("da"), col("db"))
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        substring(normalized(col("text")), 1, EditPrefix).as("norm"))
    cand
      .join(docs.as("x"), col("da") === col("x.doc_id"))
      .join(docs.as("y"), col("db") === col("y.doc_id"))
      .select(col("da"), col("db"),
        levenshtein(col("x.norm"), col("y.norm")).as("edit_dist"),
        (lit(1.0) - levenshtein(col("x.norm"), col("y.norm")).cast("double") /
          greatest(length(col("x.norm")), length(col("y.norm"))).cast("double"))
          .as("edit_sim"))
  }

  val dedupEditSql: String =
    s"""${minhashEstCteSql(recursive = false)},
       |cpair AS (SELECT da, db FROM est WHERE est_j >= $CcThreshold),
       |nd AS (
       |  SELECT doc_id,
       |         substr(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), 1, $EditPrefix) AS norm
       |  FROM documents)
       |SELECT da, db,
       |       levenshtein(x.norm, y.norm) AS edit_dist,
       |       1.0 - CAST(levenshtein(x.norm, y.norm) AS DOUBLE)
       |             / CAST(GREATEST(LENGTH(x.norm), LENGTH(y.norm)) AS DOUBLE) AS edit_sim
       |FROM cpair JOIN nd x ON da = x.doc_id JOIN nd y ON db = y.doc_id""".stripMargin

  // -------------------------------------------------- dedup_substring
  /** Token span length for cross-document substring duplication. */
  val SpanGram = 8

  /** SUBSTRING-level cross-document duplication (the Lee et al.
    * "Deduplicating Training Data Makes Language Models Better" signal,
    * distinct from whole-document near-dup): for every document, how
    * much of it consists of token spans that ALSO appear in other
    * documents — boilerplate headers, license blocks, templated
    * passages. Each doc's [[SpanGram]]-token rolling windows are
    * counted with multiplicity; a window is "repeated" when its exact
    * text occurs in ≥ 2 distinct documents. Output per doc: total
    * windows, repeated-window instances, their fraction (0.0 for docs
    * too short to have a window), and the widest cross-doc span fan-out
    * — the metrics a pipeline thresholds to drop or trim
    * boilerplate-heavy documents.
    *
    * 100 TB shape: the gram stream shuffles for the per-doc-distinct
    * df count and again for the instance⋈df join + per-doc aggregate —
    * all linear in gram instances; the per-doc TOTAL needs no explode
    * at all (window count = max(tokens − n + 1, 0), computed in the doc
    * projection). Gram keys are far flatter than single tokens, and
    * the df side is post-aggregated to one row per repeated gram, so
    * the join's only hotspot is a corpus-wide boilerplate gram's own
    * instance list — AQE skew-join splits it. Exact integer counts +
    * one IEEE division → cross-engine hash-stable. */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(normalized(col("text")), " ").as("w"))
    val grams = docs.where(size(col("w")) >= SpanGram)
      .selectExpr("doc_id",
        s"${TextAnalysis.gramExplodeExpr(SpanGram, distinctPerDoc = false)} as g")
    val spanDf = grams.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("span_df"))
      .where(col("span_df") >= 2)
    val rep = grams.join(spanDf, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rep"), max(col("span_df")).as("max_df"))
    // total windows per doc is pure arithmetic on the token count — no
    // explode, no shuffle (the review caught a gram-stream aggregate
    // here: a full extra corpus explode for a derivable number)
    docs.select(col("doc_id"),
        greatest(size(col("w")).cast("long") - lit(SpanGram - 1L), lit(0L))
          .as("n_grams"))
      .join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_rep"), lit(0L)).as("n_repeated_grams"),
        when(col("n_grams") > 0,
          coalesce(col("n_rep"), lit(0L)).cast("double") /
            col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("repeated_frac"),
        coalesce(col("max_df"), lit(0L)).as("max_span_df"))
  }

  val dedupSubstringSql: String = {
    val gram = (0 until SpanGram).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(w) - ${SpanGram - 1}), i -> $gram)) AS g
       |  FROM docs WHERE len(w) >= $SpanGram),
       |spandf AS (
       |  SELECT g, COUNT(1) AS span_df
       |  FROM (SELECT DISTINCT doc_id, g FROM grams) GROUP BY g HAVING COUNT(1) >= 2),
       |rep AS (
       |  SELECT doc_id, COUNT(1) AS n_rep, MAX(span_df) AS max_df
       |  FROM grams JOIN spandf USING (g) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(GREATEST(len(d.w) - ${SpanGram - 1}, 0) AS BIGINT) AS n_grams,
       |  CAST(COALESCE(r.n_rep, 0) AS BIGINT) AS n_repeated_grams,
       |  CASE WHEN GREATEST(len(d.w) - ${SpanGram - 1}, 0) > 0
       |       THEN CAST(COALESCE(r.n_rep, 0) AS DOUBLE) / CAST(len(d.w) - ${SpanGram - 1} AS DOUBLE)
       |       ELSE CAST(0 AS DOUBLE) END AS repeated_frac,
       |  CAST(COALESCE(r.max_df, 0) AS BIGINT) AS max_span_df
       |FROM docs d
       |LEFT JOIN rep r ON d.doc_id = r.doc_id""".stripMargin
  }

  // ------------------------------------------------ dedup_ngram_verify
  /** EXACT-Jaccard verification tier over the minhash/LSH candidates —
    * the composition SCALE.md prescribes for [[dedupNgram]] at 100 TB
    * ("run it only on minhash candidates"): candidate pairs come from
    * the sketch (est_j ≥ [[CcThreshold]], the same stage [[dedupEdit]]
    * verifies), and the exact distinct-3-gram Jaccard is computed ONLY
    * for those pairs. Unlike the standalone [[dedupNgram]], there is no
    * df cap and no posting-list self-join — exactness is affordable
    * because the work is candidates × doc-length, never corpus²:
    * each pair's shingle sets join on (pair, shingle), the per-doc set
    * sizes come from a semi-joined aggregate, and a pair with zero
    * common shingles still surfaces (jaccard 0.0, LSH false positive).
    * Output verdict: is_dup = exact jaccard ≥ [[CcThreshold]] — the
    * "verify before you delete" bit a production dedup acts on. */
  def dedupNgramVerify(s: SparkSession, dir: String): DataFrame = {
    val (_, est) = minhashEst(s, dir, persistMh = false)
    // cand feeds candDocs (×2), the intersection, and the final join,
    // and shc feeds sizes plus both sides of the pair-shingle join —
    // the subtrees repeat in the plan text, but rooting them in
    // deliberate repartitions was MEASURED SLOWER (sf0.1: 1.5 → 3.5 s;
    // 100×: no change): each branch's column-pruned projection pushes
    // below the exchange (the ivfpq effect), so reuse doesn't fire and
    // the extra full-stream shuffles are pure cost. AQE stage reuse
    // already shares the identical shuffle stages inside the repeated
    // est subtrees; the recomputed map-side work is linear and candidate-
    // bounded.
    val cand = est.where(col("est_j") >= CcThreshold)
    val sh = shingles(s, dir)
    val candDocs = cand.select(col("da").as("doc_id"))
      .union(cand.select(col("db").as("doc_id"))).distinct()
    // shingle rows for candidate docs only — at 100 TB the semi-join
    // prunes the corpus-wide shingle stream down to the verify set
    val shc = sh.join(candDocs, Seq("doc_id"), "semi")
    val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand.select(col("da"), col("db"))
      .join(shc.as("a"), col("da") === col("a.doc_id"))
      .join(shc.as("b"), col("db") === col("b.doc_id") && col("a.s") === col("b.s"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    cand
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .join(inter, Seq("da", "db"), "left")
      .select(col("da"), col("db"), col("est_j"),
        coalesce(col("inter"), lit(0L)).as("n_common"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sa.n") + col("sb.n") - coalesce(col("inter"), lit(0L))).cast("double"))
          .as("jaccard"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sa.n") + col("sb.n") - coalesce(col("inter"), lit(0L))).cast("double")
          >= lit(CcThreshold)).cast("int").as("is_dup"))
  }

  val dedupNgramVerifySql: String =
    s"""${minhashEstCteSql(recursive = false)},
       |ver AS (SELECT da, db, est_j FROM est WHERE est_j >= $CcThreshold),
       |vdocs AS (SELECT da AS doc_id FROM ver UNION SELECT db FROM ver),
       |vdsh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |        FROM documents WHERE doc_id IN (SELECT doc_id FROM vdocs))
       |  WHERE len(w) >= 3),
       |vsizes AS (SELECT doc_id, COUNT(1) AS n FROM vdsh GROUP BY doc_id),
       |vinter AS (
       |  SELECT v.da, v.db, COUNT(1) AS inter
       |  FROM ver v JOIN vdsh a ON v.da = a.doc_id
       |             JOIN vdsh b ON v.db = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2)
       |SELECT v.da, v.db, v.est_j,
       |  CAST(COALESCE(i.inter, 0) AS BIGINT) AS n_common,
       |  CAST(COALESCE(i.inter, 0) AS DOUBLE)
       |    / CAST(sa.n + sb.n - COALESCE(i.inter, 0) AS DOUBLE) AS jaccard,
       |  CAST(CAST(COALESCE(i.inter, 0) AS DOUBLE)
       |    / CAST(sa.n + sb.n - COALESCE(i.inter, 0) AS DOUBLE) >= $CcThreshold AS INT) AS is_dup
       |FROM ver v
       |JOIN vsizes sa ON v.da = sa.doc_id
       |JOIN vsizes sb ON v.db = sb.doc_id
       |LEFT JOIN vinter i ON v.da = i.da AND v.db = i.db""".stripMargin

  // ------------------------------------------------ dedup_containment
  /** Containment threshold: |A∩B| / min(|A|,|B|) at or above this flags
    * the smaller doc as contained. */
  val ContainT = 0.9

  /** ASYMMETRIC containment dedup — the near-dup case symmetric Jaccard
    * structurally under-weights: a short doc embedded verbatim in a
    * long one (quote farms, boilerplate wrappers, article + comment
    * thread) has J = |A|/|B| ≈ 0 but containment = 1.0, and MinHash-LSH
    * banding under-recalls exactly those pairs for the same reason.
    * Candidates therefore come from the df-capped posting-list join
    * (the [[dedupNgram]] inverted index — ANY shared rare shingle makes
    * a candidate, no similarity floor), then each pair is measured both
    * ways: containment = |A∩B| / min(|A|,|B|), Jaccard for comparison,
    * `jaccard_missed` marks pairs only the containment lens catches,
    * and `contained_id` names the doc to drop (the smaller side; id
    * tie-break). Pairs are canonical (da < db).
    *
    * Scale: identical budget to [[dedupNgram]] — the df cap bounds pair
    * fan-out at df² per shingle, sizes and intersections are partial-
    * aggregated, and the containment filter prunes the output before
    * any window. DedupSpec plants a doc-inside-doc case and pins that
    * Jaccard misses it while this flags it. */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    containmentOver(Tables.documentsWide(s, dir)) // fan-out (r16)

  /** The operator over any documents-shaped frame (doc_id, text).
    *
    * Two tiers, verify-discipline: CANDIDATES come from the df-capped
    * posting lists (any shared RARE shingle is evidence — no similarity
    * floor), but the MEASURES are exact over each doc's FULL distinct
    * shingle set. Measuring over the capped sets would be wrong in a
    * way that's fatal specifically for containment: a doc that is 500
    * parts boilerplate + 20 parts rare with 19 rare shingles shared
    * would score 19/20 = 0.95 "containment" (capped denominator)
    * instead of the true 19/520 ≈ 0.04 — Jaccard's sum denominator
    * dilutes that bias, min() concentrates it, and containment drives
    * the contained_id drop verdict. Cost: one pair-keyed count
    * exchange bounded by Σ min(df, MaxDf)² (the inverted-index
    * budget) plus candidates × DROPPED-set merges — never candidates ×
    * full doc length (the r14 kept/dropped decomposition; see the
    * body).
    *
    * @note the returned frame's plan pins a PERSISTED intermediate (the
    *       pair-keyed kept-overlap counts feed the candidate-doc set
    *       and the measure row). The harness releases it between gates
    *       via [[graft.Graft.releaseState]]; a direct library caller
    *       owns that release — call `Graft.releaseState(spark)` (or
    *       `spark.catalog.clearCache()`) after consuming the result,
    *       or |pairs|-sized cache blocks accumulate across calls. */
  def containmentOver(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val sh = shinglesOf(docs)
    // df-count → filter → semi-join → collect: same build order as
    // [[dedupNgram]] (see the scale note there) — no posting list longer
    // than MaxDf ever reaches an aggregation buffer.
    val dfs = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val keep = dfs.where(col("df") <= MaxDf).select(col("s"))
    val lists = sh.join(keep, Seq("s"), "left_semi")
      .groupBy(col("s")).agg(collect_list(col("doc_id")).as("ds"))
    // KEPT/DROPPED INTERSECTION DECOMPOSITION (r14). The full-set
    // measure splits exactly along the df cap that already generates
    // candidates: every shingle is kept (df ≤ MaxDf) or dropped, so
    //   inter_full = inter_kept + inter_dropped.
    // inter_kept is COUNTED on the posting-list pair stream — the same
    // explode that used to feed candPairs.distinct() now feeds ONE
    // pair-keyed count aggregate, so candidates and their kept-overlap
    // arrive in a single exchange of bare (da, db) pairs, bounded by
    // Σ min(df, MaxDf)² — the inverted-index budget, independent of
    // document length. inter_dropped runs the packed-sorted-array merge
    // over the DROPPED shingles only: a doc's dropped set is its
    // stop-shingles (df > MaxDf), typically a handful of entries where
    // the full set is hundreds. The r11 full-array form shipped
    // |pairs| × TWO FULL doc-length string arrays instead — measured
    // at the r14 distinct-heavy 100× tier (113M candidates × ~2.4 KB:
    // the per-copy candidate density is 9% of all pairs at sf0.1) that
    // is ~270 GB through the verify exchanges, and the sweep died of
    // disk exhaustion (containment_incr limped through at 98 GB of
    // spill). Outputs are byte-identical: the split is a disjoint
    // partition of each doc's shingle set.
    val candKept = lists.select(col("ds")).as[Seq[Long]]
      .flatMap { ds =>
        val a = ds.toArray
        for { x <- a.iterator; y <- a if x < y } yield (x, y)
      }
      .toDF("da", "db")
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter_kept"))
      // three consumers (candDocs via both unions + the measure row);
      // released by the harness releaseState contract like every other
      // dedup cut point
      .persist()
    val candDocs = candKept.select(col("da").as("doc_id"))
      .union(candKept.select(col("db").as("doc_id"))).distinct()
    // full per-doc set sizes WITHOUT the arrays (sh is per-doc distinct)
    val sizes = sh.join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).cast("long").as("n"))
    graft.functions.IntersectSizeSorted.register(docs.sparkSession)
    // dropped sets ride 8-byte gram ids, not strings (r15 — [[gramId]]
    // collision contract); stop-shingle-sized arrays, so the win here
    // is the compare loop more than the wire
    val droppedSets = sh
      .join(dfs.where(col("df") > MaxDf).select(col("s")), Seq("s"), "left_semi")
      .join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(sort_array(collect_list(gramId(col("s")))).as("ss"))
    val inter = candKept
      .join(sizes.select(col("doc_id").as("da"), col("n").as("n_a")), Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("n_b")), Seq("db"))
      .join(droppedSets.select(col("doc_id").as("da"), col("ss").as("ssa")), Seq("da"), "left")
      .join(droppedSets.select(col("doc_id").as("db"), col("ss").as("ssb")), Seq("db"), "left")
      .select(col("da"), col("db"), col("n_a"), col("n_b"),
        (col("inter_kept") +
          when(col("ssa").isNull || col("ssb").isNull, lit(0L))
            .otherwise(expr("intersect_size_sorted(ssa, ssb)"))).as("inter"))
    inter
      .select(col("da"), col("db"),
        col("n_a"), col("n_b"), col("inter").as("n_common"),
        (col("inter").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
          .as("containment"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jaccard"))
      .where(col("containment") >= lit(ContainT))
      .select(col("da"), col("db"), col("n_a"), col("n_b"), col("n_common"),
        col("containment"), col("jaccard"),
        when(col("n_a") < col("n_b"), col("da"))
          .when(col("n_b") < col("n_a"), col("db"))
          .otherwise(least(col("da"), col("db"))).as("contained_id"),
        (col("jaccard") < lit(CcThreshold)).cast("int").as("jaccard_missed"))
  }

  /** Same inverted index, intersections, and single-division measures
    * in DuckDB — containment and Jaccard hash-check as doubles because
    * each is ONE IEEE division of exact integers. */
  val dedupContainmentSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |sh AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM docs WHERE len(w) >= 3),
       |keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(1) <= $MaxDf),
       |cap AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep ON sh.s = keep.s),
       |cpairs AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM cap a JOIN cap b ON a.s = b.s AND a.doc_id < b.doc_id),
       |cdocs AS (SELECT da AS doc_id FROM cpairs UNION SELECT db FROM cpairs),
       |shc AS MATERIALIZED (
       |  SELECT sh.doc_id, sh.s FROM sh JOIN cdocs ON sh.doc_id = cdocs.doc_id),
       |sizes AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n FROM shc GROUP BY 1),
       |vinter AS (
       |  SELECT p.da, p.db, CAST(COUNT(1) AS BIGINT) AS inter
       |  FROM cpairs p
       |  JOIN shc a ON p.da = a.doc_id
       |  JOIN shc b ON p.db = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT p.da, p.db, sa.n AS n_a, sb.n AS n_b, p.inter AS n_common,
       |         CAST(p.inter AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment,
       |         CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE) AS jaccard
       |  FROM vinter p
       |  JOIN sizes sa ON p.da = sa.doc_id
       |  JOIN sizes sb ON p.db = sb.doc_id)
       |SELECT da, db, n_a, n_b, n_common, containment, jaccard,
       |       CASE WHEN n_a < n_b THEN da WHEN n_b < n_a THEN db
       |            ELSE LEAST(da, db) END AS contained_id,
       |       CAST(jaccard < $CcThreshold AS INT) AS jaccard_missed
       |FROM m WHERE containment >= $ContainT""".stripMargin

  // ----------------------------------------- dedup_containment_incr
  /** INCREMENTAL containment — the two-table member of the containment
    * lens, completing the incremental family (exact:
    * [[Cleaning.dedupIncrementalVs]], near-dup: [[dedupMinhashVs]],
    * clustering: [[dedupCcIncr]]): an arrival batch is probed against
    * the SNAPSHOT's df-capped shingle inverted index, so a new doc
    * embedded verbatim in an already-ingested page (or vice versa) is
    * flagged before it enters the corpus. Candidates are NEW×OLD pairs
    * only — batch-internal and snapshot-internal duplication are other
    * operators' jobs — and each batch shingle matches at most
    * [[MaxDf]] snapshot docs, so candidate volume is O(batch shingles ·
    * MaxDf), never snapshot-bounded. Full-measure shingle I/O touches
    * candidate docs only (both sides semi-joined down before the
    * intersection), the shape that keeps the snapshot side read-mostly
    * at 100 TB; the snapshot's capped index is a stored table there
    * (the [[minhashSignaturesOf]] stored-signature precedent).
    * Both ids must be globally unique across the two frames (the
    * incremental family's shared contract).
    *
    * @note persist ownership as in [[containmentOver]]: the returned
    *       plan pins a persisted pair-keyed intermediate; library
    *       callers must `Graft.releaseState(spark)` (or
    *       `spark.catalog.clearCache()`) after consuming the result. */
  def containmentVs(batch: DataFrame, snapshot: DataFrame): DataFrame = {
    val shN = shinglesOf(batch.select(col("doc_id"), col("text")))
    val shO = shinglesOf(snapshot.select(col("doc_id"), col("text")))
    // COMBINED df cap — the single-table rule (df over batch ∪ snapshot
    // ≤ MaxDf), count-first on each side (no posting list ever
    // materializes). A snapshot-only cap lets a stop-shingle common in
    // the BATCH fan out df_batch × MaxDf pairs (measured 62 s vs the
    // full pass's 28 s at the 10× rehearsal); independent per-side
    // caps still admit duplicate-heavy shingles the single-table rule
    // drops (measured 50 s). The combined rule needs no snapshot
    // re-scan at 100 TB: df_o is a STORED column of the snapshot's
    // inverted index, and the inner join is exactly the probe — a
    // shingle must occur on both sides to form a pair at all.
    val dfN = shN.groupBy(col("s")).agg(count(lit(1)).as("dfn"))
    val dfO = shO.groupBy(col("s")).agg(count(lit(1)).as("dfo"))
    val both = dfN.join(dfO, "s")
    val keep = both
      .where(col("dfn") + col("dfo") <= MaxDf).select(col("s"))
    val shO2 = shO.join(keep, Seq("s"), "left_semi")
    // KEPT/DROPPED INTERSECTION DECOMPOSITION (r14), the
    // [[containmentOver]] argument carried to the two-table member: a
    // shingle contributes to a cross-side intersection only if it
    // occurs on BOTH sides, and every both-sides shingle is either
    // kept (combined df ≤ MaxDf) or dropped, so
    //   inter_full = inter_kept + inter_dropped.
    // The kept term is counted on the very cross-side pair stream that
    // generates candidates (one pair-keyed count exchange, bounded by
    // Σ_kept dfn·dfo); the dropped term merges the two docs' DROPPED
    // both-sides sets — stop-shingle-sized, not doc-sized. The r12
    // packed-FULL-array form shipped |pairs| × two doc-length arrays:
    // at the r14 distinct-heavy 100× tier that limped through with
    // 98 GB of spill / 227 s (the single-table twin died of disk
    // outright). Outputs byte-identical — the split partitions each
    // doc's set. (The r12 exploded form's >50% max-task share came
    // from its (old_id, s)-keyed size re-joins, not the pair-keyed
    // count — sizes here are array-free COUNT aggregates joined at
    // |candidate docs| cardinality.)
    graft.functions.IntersectSizeSorted.register(batch.sparkSession)
    val candKept = shN.join(keep, Seq("s"), "left_semi")
      .select(col("s"), col("doc_id").as("new_id"))
      .join(shO2.select(col("s"), col("doc_id").as("old_id")), "s")
      .groupBy(col("new_id"), col("old_id")).agg(count(lit(1)).as("inter_kept"))
      // three consumers (per-side candidate-doc sets + the measure row)
      .persist()
    val candN = candKept.select(col("new_id").as("doc_id")).distinct()
    val candO = candKept.select(col("old_id").as("doc_id")).distinct()
    val dropped = both
      .where(col("dfn") + col("dfo") > MaxDf).select(col("s"))
    def sizesOf(sh0: DataFrame, cd: DataFrame, out: String): DataFrame =
      sh0.join(cd, Seq("doc_id"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).cast("long").as(out))
    def droppedOf(sh0: DataFrame, cd: DataFrame): DataFrame =
      sh0.join(dropped, Seq("s"), "left_semi")
        .join(cd, Seq("doc_id"), "left_semi")
        // 8-byte gram ids ([[gramId]] collision contract, r15)
        .groupBy(col("doc_id")).agg(sort_array(collect_list(gramId(col("s")))).as("ss"))
    candKept
      .join(sizesOf(shN, candN, "n_new").select(
        col("doc_id").as("new_id"), col("n_new")), Seq("new_id"))
      .join(sizesOf(shO, candO, "n_old").select(
        col("doc_id").as("old_id"), col("n_old")), Seq("old_id"))
      .join(droppedOf(shN, candN).select(
        col("doc_id").as("new_id"), col("ss").as("ssa")), Seq("new_id"), "left")
      .join(droppedOf(shO, candO).select(
        col("doc_id").as("old_id"), col("ss").as("ssb")), Seq("old_id"), "left")
      .select(col("new_id"), col("old_id"), col("n_new"), col("n_old"),
        (col("inter_kept") +
          when(col("ssa").isNull || col("ssb").isNull, lit(0L))
            .otherwise(expr("intersect_size_sorted(ssa, ssb)"))).as("inter"))
      .select(col("new_id"), col("old_id"),
        col("n_new"), col("n_old"),
        col("inter").as("n_common"),
        (col("inter").cast("double") / least(col("n_new"), col("n_old")).cast("double"))
          .as("containment"),
        (col("inter").cast("double") /
          (col("n_new") + col("n_old") - col("inter")).cast("double")).as("jaccard"))
      .where(col("containment") >= lit(ContainT))
      .select(col("new_id"), col("old_id"), col("n_new"), col("n_old"),
        col("n_common"), col("containment"), col("jaccard"),
        when(col("n_new") < col("n_old"), col("new_id"))
          .when(col("n_old") < col("n_new"), col("old_id"))
          .otherwise(least(col("new_id"), col("old_id"))).as("contained_id"),
        (col("jaccard") < lit(CcThreshold)).cast("int").as("jaccard_missed"))
  }

  /** Gate: the [[dedupMinhashIncr]] split (batch = doc_id ≡ 1 mod 3)
    * through the containment lens. */
  def dedupContainmentIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    containmentVs(docs.where(col("doc_id") % 3 === 1),
      docs.where(col("doc_id") % 3 =!= 1))
  }

  val dedupContainmentIncrSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |sh AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM docs WHERE len(w) >= 3),
       |shn AS (SELECT doc_id, s FROM sh WHERE doc_id % 3 = 1),
       |sho AS (SELECT doc_id, s FROM sh WHERE doc_id % 3 <> 1),
       |dfn AS (SELECT s, COUNT(1) AS c FROM shn GROUP BY s),
       |dfo AS (SELECT s, COUNT(1) AS c FROM sho GROUP BY s),
       |keep AS (SELECT dfn.s FROM dfn JOIN dfo ON dfn.s = dfo.s
       |         WHERE dfn.c + dfo.c <= $MaxDf),
       |capn AS (SELECT shn.doc_id, shn.s FROM shn JOIN keep ON shn.s = keep.s),
       |capo AS (SELECT sho.doc_id, sho.s FROM sho JOIN keep ON sho.s = keep.s),
       |cpairs AS MATERIALIZED (
       |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
       |  FROM capn n JOIN capo o ON n.s = o.s),
       |shcn AS MATERIALIZED (
       |  SELECT shn.doc_id, shn.s FROM shn
       |  WHERE shn.doc_id IN (SELECT new_id FROM cpairs)),
       |shco AS MATERIALIZED (
       |  SELECT sho.doc_id, sho.s FROM sho
       |  WHERE sho.doc_id IN (SELECT old_id FROM cpairs)),
       |sizen AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n FROM shcn GROUP BY 1),
       |sizeo AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n FROM shco GROUP BY 1),
       |vinter AS (
       |  SELECT p.new_id, p.old_id, CAST(COUNT(1) AS BIGINT) AS inter
       |  FROM cpairs p
       |  JOIN shcn a ON p.new_id = a.doc_id
       |  JOIN shco b ON p.old_id = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT p.new_id, p.old_id, sa.n AS n_new, sb.n AS n_old,
       |         p.inter AS n_common,
       |         CAST(p.inter AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment,
       |         CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE) AS jaccard
       |  FROM vinter p
       |  JOIN sizen sa ON p.new_id = sa.doc_id
       |  JOIN sizeo sb ON p.old_id = sb.doc_id)
       |SELECT new_id, old_id, n_new, n_old, n_common, containment, jaccard,
       |       CASE WHEN n_new < n_old THEN new_id WHEN n_old < n_new THEN old_id
       |            ELSE LEAST(new_id, old_id) END AS contained_id,
       |       CAST(jaccard < $CcThreshold AS INT) AS jaccard_missed
       |FROM m WHERE containment >= $ContainT""".stripMargin

  // ---------------------------------------------------- dedup_simhash
  /** 32-bit SimHash per document over term occurrences (md5-derived
    * token hashes; bit votes weighted by term frequency). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(normalized(col("text")), " ")).as("s"))
      .where(col("s") =!= "")
      .selectExpr("doc_id", s"$xSpark as x")
    val bitSums = (0 until 32).map(i =>
      sum(expr(s"case when (shiftright(x, $i) & 1) = 1 then 1 else -1 end")).as(s"v$i"))
    val agg = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 32)
      .map(i => expr(s"case when v$i >= 0 then cast(${1L << i} as bigint) else 0 end"))
      .reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  val dedupSimhashSql: String = {
    val bitSums = (0 until 32)
      .map(i => s"SUM(CASE WHEN (x >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i")
      .mkString(",\n    ")
    val sim = (0 until 32)
      .map(i => s"CASE WHEN v$i >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ')) AS s
       |  FROM documents),
       |tx AS (SELECT doc_id, $xDuck AS x FROM toks WHERE s <> ''),
       |agg AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM tx GROUP BY doc_id)
       |SELECT doc_id, CAST($sim AS BIGINT) AS simhash FROM agg""".stripMargin
  }

  // --------------------------------------------- dedup_simhash_pairs
  /** Max Hamming distance for a SimHash near-dup pair. */
  val SimhashMaxHamming = 3

  /** SimHash PAIRING at scale (Manku et al., "Detecting Near-Duplicates
    * for Web Crawling", WWW'07): split the 32-bit fingerprint into 4
    * bands of 8 bits — by pigeonhole, any pair within Hamming distance
    * ≤ [[SimhashMaxHamming]] (= 3 < 4 bands) matches EXACTLY on at
    * least one band — so candidates come from 4 band-key equi-joins
    * (shuffle on the band key, never all-pairs), then one exact
    * popcount check (`bit_count(a ^ b)`, codegen'd built-in) verifies.
    * Buckets are capped like the MinHash/vector-LSH families
    * ([[MaxBucket]]); the fingerprint table is referenced three times
    * (banding + both verify joins) but roots in an aggregate, so
    * ReuseExchange materializes it once — no persist to leak. */
  def dedupSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = dedupSimhash(s, dir)
    val keyExprs = (0 until 4).map(b =>
      s"$b, cast(shiftright(simhash, ${8 * b}) & 255 as bigint)").mkString(", ")
    // bucket cap via the bounded aggregate — same rationale as
    // [[bandedKeys]] (hot buckets never serialize into one window task)
    val topk = udaf(new graft.functions.TopKLongAgg(MaxBucket))
    val bands = sh.selectExpr("doc_id",
        s"stack(4, $keyExprs) as (band_id, band_key)")
      .groupBy(col("band_id"), col("band_key"))
      .agg(topk(col("doc_id")).as("ids"))
      .select(col("band_id"), col("band_key"), explode(col("ids")).as("doc_id"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    cand
      .join(sh.select(col("doc_id"), col("simhash").as("sa")), col("da") === col("doc_id")).drop("doc_id")
      .join(sh.select(col("doc_id"), col("simhash").as("sb")), col("db") === col("doc_id")).drop("doc_id")
      .select(col("da"), col("db"),
        expr("cast(bit_count(sa ^ sb) as int)").as("hamming"))
      .where(col("hamming") <= SimhashMaxHamming)
  }

  val dedupSimhashPairsSql: String = {
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band_id, (simhash >> ${8 * b}) & 255 AS band_key FROM sh")
      .mkString("\n  UNION ALL ")
    s"""WITH sh AS (SELECT * FROM ($dedupSimhashSql)),
       |bands0 AS (
       |  $bandSelects),
       |bands AS (
       |  SELECT doc_id, band_id, band_key FROM (
       |    SELECT doc_id, band_id, band_key,
       |           ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS rn
       |    FROM bands0) WHERE rn <= $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
       |SELECT da, db, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
       |FROM cand
       |JOIN sh sa ON da = sa.doc_id
       |JOIN sh sb ON db = sb.doc_id
       |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= $SimhashMaxHamming""".stripMargin
  }

  // ------------------------------------------------- dedup_embedding
  /** Exact nearest neighbor per vector by dot product (embeddings are
    * ~unit-norm, so dot ≈ cosine). Elements are scaled to integers
    * (×10⁶, round) so the sum is EXACT and engine-independent; cosine
    * is recovered by one final division. Brute-force n² — the baseline;
    * the LSH-bucketed scale path is simLshTopk in Similarity.scala. */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    VecKernel.bruteTopk(s, dir, k = 1, probeFilter = _ => true)
      .select(col("query_id").as("vec_id"), col("neighbor_id").as("nn_id"),
        col("dot_scaled"),
        (col("dot_scaled").cast("double") / lit(1e12)).as("cos_sim"))

  val dedupEmbeddingSql: String =
    """WITH ev AS (
      |  SELECT vec_id, i, CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS e
      |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t),
      |dots AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb, CAST(SUM(a.e * b.e) AS BIGINT) AS dot
      |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id <> b.vec_id
      |  GROUP BY 1, 2),
      |best AS (
      |  SELECT va, vb, dot,
      |         ROW_NUMBER() OVER (PARTITION BY va ORDER BY dot DESC, vb) AS rn
      |  FROM dots)
      |SELECT va AS vec_id, vb AS nn_id, dot AS dot_scaled,
      |       CAST(dot AS DOUBLE) / 1e12 AS cos_sim
      |FROM best WHERE rn = 1""".stripMargin

  // -------------------------------------------------- dedup_semantic
  /** Minimum scaled dot (cos × 10¹²) for two cell-mates to count as
    * semantic duplicates. The comparison runs on the EXACT integer
    * dot, never a derived double, so both engines agree bit-for-bit.
    * 0.40 is the fixture operating point (the synthetic embeddings top
    * out near cos 0.49 within cells — 14 pairs / 13 dups at sf0.01
    * exercise both branches); production corpora use the paper's
    * 0.95-ish range via [[dedupSemanticWith]]. */
  val SemDedupTauScaled = 400000000000L

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-then-dedup
    * over embeddings — cluster the corpus into C = 2·⌈√N⌉ coarse cells,
    * then flag within-cell pairs whose cosine clears a threshold; the
    * keeper is the smallest vec_id among each flagged pair (the same
    * canonical-keeper rule as the text dedups). Pairwise comparison
    * never crosses a cell boundary, which is the paper's whole point:
    * Σ|cell|² ≈ N^1.5 candidate dots with √N balanced cells, instead of
    * N² — and the [[Similarity.IvfMaxCell]] cap bounds a degenerate
    * clustered corpus at cells·cap², FAISS-style (recall loss on
    * overfull cells only; gate-SF cells stay far below the cap, spec'd).
    *
    * Distributed shape: the cell-index pass is shuffle-free
    * ([[VecKernel.ivfCells]] — centroids broadcast from a pushed-down
    * O(√N·dim) scan); the cap window and the within-cell self-join
    * share ONE exchange on `cell`; pair scoring joins the O(N^1.5)
    * candidate list against the scaled-vector table by id. Every vector
    * appears in the output exactly once (is_dup=false when unmatched or
    * capped out), so downstream `WHERE NOT is_dup` is the dedup filter.
    *
    * Cell "training" is the deterministic first-C-vectors seeding the
    * IVF family uses — swap in [[KMeans.embKmeans]] centroids offline
    * at scale; flagging semantics are centroid-agnostic. */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    dedupSemanticWith(s, dir, SemDedupTauScaled)

  /** Parameterized core: `tauScaled` is the duplicate threshold on the
    * exact integer dot (cos × 10¹²). */
  def dedupSemanticWith(s: SparkSession, dir: String, tauScaled: Long): DataFrame = {
    val c = Similarity.nCentroids(Tables.embeddings(s, dir).count())
    // the cell table feeds three consumers (both self-join sides + the
    // all-vectors output spine); the deliberate repartition gives
    // ReuseExchange a shared node, same as simIvfTopk
    val cells = VecKernel.ivfCells(s, dir, c, nprobe = 1)
      .select(col("vec_id"), col("cell"))
      .repartition(col("vec_id"))
    val capped = Similarity.cappedAssign(cells)
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"))
    val best = VecKernel.pairDots(s, dir, pairs)
      .where(col("dot_scaled") >= lit(tauScaled))
      .groupBy(col("neighbor_id").as("vec_id"))
      .agg(min(col("query_id")).as("dup_of"),
        expr("min_by(dot_scaled, query_id)").as("dot_scaled"))
    cells.join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"),
        col("dot_scaled"),
        (col("dot_scaled").cast("double") / lit(1e12)).as("cos_sim"))
  }

  /** Oracle: composes the shared coarse-quantizer chain
    * ([[Similarity.ivfCoarseCtesSql]]); its OWN `assign` is the
    * UNCAPPED rn=1 assignment (the all-vectors output spine — a
    * capped-out vector must still appear, is_dup=false), with the cap
    * applied separately in `capped` exactly as the Spark side separates
    * `cells` from `cappedAssign`. */
  val dedupSemanticSql: String =
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
       |  FROM capped a JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |dots AS (
       |  SELECT p.qa, p.vb, CAST(SUM(ea.e * eb.e) AS BIGINT) AS dot
       |  FROM pairs p
       |  JOIN ev ea ON ea.vec_id = p.qa
       |  JOIN ev eb ON eb.vec_id = p.vb AND ea.i = eb.i
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT vb AS vec_id, MIN(qa) AS dup_of, arg_min(dot, qa) AS dot_scaled
       |  FROM dots WHERE dot >= $SemDedupTauScaled GROUP BY vb)
       |SELECT a.vec_id, a.cell, (b.dup_of IS NOT NULL) AS is_dup, b.dup_of,
       |       b.dot_scaled, CAST(b.dot_scaled AS DOUBLE) / 1e12 AS cos_sim
       |FROM assign a LEFT JOIN best b ON a.vec_id = b.vec_id""".stripMargin

  // ----------------------------------------------- dedup_semantic_cc
  /** Semantic clusters: connected components over the SemDeDup edge
    * set, with the candidate graph widened to `nprobe = 2` (each vector
    * also pairs against its second-nearest cell). Within-cell-only
    * edges would make every component cell-confined by construction,
    * silently splitting a duplicate group that straddles a Voronoi
    * boundary — the probe fan-out is the standard IVF patch for exactly
    * that, and it is what lets these components genuinely span cells.
    * Candidate volume stays ≤ N·nprobe·[[Similarity.IvfMaxCell]];
    * edges are the candidate pairs whose EXACT integer dot clears
    * [[SemDedupTauScaled]]; components come from the same min-label
    * propagation kernel as the text CC family ([[propagateMin]] — one
    * shuffle join per round, same-pass accumulator convergence,
    * localCheckpointed O(N) label state). Output matches the CC family:
    * every vector exactly once as (vec_id, cluster_id, cluster_size,
    * is_canonical). */
  def dedupSemanticCc(s: SparkSession, dir: String): DataFrame = {
    val c = Similarity.nCentroids(Tables.embeddings(s, dir).count())
    // the N·C·dim centroid-dot kernel is the dominant cost here and
    // feeds two differently-pruned consumers (assignment and probe
    // explode) that defeat ReuseExchange; unlike the single-action
    // operators this one runs its propagation rounds INSIDE the call,
    // so an explicit persist/unpersist pair is safe — the kernel
    // materializes once, and nothing stays cached after the labels are
    // localCheckpointed (leak-spec'd alongside the other CC variants)
    val cells = VecKernel.ivfCells(s, dir, c, nprobe = 2).persist()
    val assign = Similarity.cappedAssign(cells)
    val probes = cells.select(col("vec_id").as("query_id"),
      explode(col("probes")).as("cell"))
    // unordered-normalized candidates: each pair is scored once no
    // matter which side's probe list surfaced it
    val cand = probes.join(assign, "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select(least(col("query_id"), col("vec_id")).as("query_id"),
        greatest(col("query_id"), col("vec_id")).as("neighbor_id"))
      .distinct()
    val edges = VecKernel.pairDots(s, dir, cand)
      .where(col("dot_scaled") >= lit(SemDedupTauScaled))
      .select(col("query_id").as("da"), col("neighbor_id").as("db"))
    val sym = symmetrize(edges).persist()
    val labels = propagateMin(s,
      Tables.embeddings(s, dir)
        .select(col("vec_id").as("doc_id"), col("vec_id").as("label")),
      sym, "dedupSemanticCc")
    sym.unpersist()
    cells.unpersist()
    ccOutput(labels).withColumnRenamed("doc_id", "vec_id")
  }

  /** Oracle: the full shared index chain ([[Similarity.ivfIndexCtesSql]]
    * — capped assignment + [[Similarity.NProbe]]-cell probe lists,
    * identical to the search oracle's index side) feeding
    * unordered-normalized candidates and the recursive reachability CC. */
  val dedupSemanticCcSql: String =
    s"""WITH RECURSIVE ${Similarity.ivfIndexCtesSql},
       |cand AS (
       |  SELECT DISTINCT LEAST(p.query_id, a.vec_id) AS qa, GREATEST(p.query_id, a.vec_id) AS vb
       |  FROM probes p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.query_id),
       |dots AS (
       |  SELECT c.qa, c.vb, CAST(SUM(ea.e * eb.e) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN ev ea ON ea.vec_id = c.qa
       |  JOIN ev eb ON eb.vec_id = c.vb AND ea.i = eb.i
       |  GROUP BY 1, 2),
       |e AS (SELECT qa AS da, vb AS db FROM dots WHERE dot >= $SemDedupTauScaled),
       |sym AS (SELECT da AS src, db AS dst FROM e UNION ALL SELECT db, da FROM e),
       |reach(src, dst) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst),
       |lab AS (SELECT src AS vec_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
       |SELECT vec_id, cluster_id,
       |       COUNT(1) OVER (PARTITION BY cluster_id) AS cluster_size,
       |       CAST(vec_id = cluster_id AS INT) AS is_canonical
       |FROM lab""".stripMargin

  // ------------------------------------------------- dedup_allpairs
  /** τ for the EXACT all-pairs join, in integer parts-per-million (the
    * Jaccard test `1e6·inter ≥ τppm·union` runs entirely on integers —
    * no IEEE division anywhere near the verdict). */
  val AllPairsTauPpm = 600000L

  /** EXACT all-pairs similarity join by PREFIX FILTERING (the
    * AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al. 2008):
    * every pair of documents with 3-gram Jaccard ≥ τ, with a
    * COMPLETENESS GUARANTEE the LSH/banding path structurally cannot
    * give (MinHash banding trades recall for bounded candidates; the
    * df-capped posting lists of dedup_ngram trade completeness on hot
    * shingles). This is the lossless member of the dedup family — the
    * operator to run when a miss is unacceptable.
    *
    * The filter: order each doc's grams by GLOBAL rarity (df asc, gram
    * asc — a total order, no materialized global rank needed, so no
    * corpus-wide window; the per-doc ordering is a doc-bounded window,
    * the allowed kind). A doc with n grams and threshold τ keeps its
    * first p = n − ⌈τ·n⌉ + 1 grams as its PREFIX; two docs with
    * Jaccard ≥ τ MUST share a prefix gram (if they shared none, the
    * overlap is confined to the ≤ ⌈τ·n⌉ − 1 suffix grams of each —
    * too few to reach τ), so joining prefixes on the gram loses
    * nothing. Candidates then pass the LENGTH filter
    * (τ·max(na,nb) ≤ min(na,nb) — sizes further apart cannot reach τ)
    * and the exact candidate-bounded intersection count (Σ_pairs na
    * verify I/O, the dedup_ngram_verify tier shape).
    *
    * Scale: prefixes hold each doc's RAREST grams, so per-gram prefix
    * df is small by construction and the candidate join's fan-out
    * concentrates where df is low (the published behavior of the
    * AllPairs family; the r11 sf1 stage probe measured the candidate
    * join itself at 1.6 s against a 100×-duplicate-structure fixture —
    * a salted two-path variant was built, measured as pure overhead,
    * and removed: measure, don't guess). The stage that DOES dominate
    * on duplicate-heavy data is the exact verify — the r10 exploded
    * form (pair × per-gram rows through a shuffle, then a pair-keyed
    * count exchange) put Σ_pairs na rows on the wire and burned 86% of
    * the sf1 wall in its sort. It now rides the [[containmentOver]]
    * packed-array discipline instead: candidate docs' FULL gram sets
    * collect once into SORTED per-doc arrays (doc-length-bounded
    * buffers), each qualifying pair carries two packed arrays, and the
    * intersection is the zero-allocation codegen merge
    * [[graft.functions.IntersectSizeSorted]] (`size(array_intersect)`
    * materializes the intersection array per pair just to read its
    * length — at 7M candidate pairs that allocation was itself the
    * next bottleneck, 419 s of stage CPU). Same candidates ×
    * doc-length work, off the wire and out of the allocator: sf1
    * measured 41.7 → 8.0 s wall, max task 36 → 4.5 s. Output: one row
    * per qualifying unordered pair (da < db) with exact
    * inter/sizes/j_ppm. */
  def dedupAllpairs(s: SparkSession, dir: String): DataFrame =
    allpairsOver(Tables.documents(s, dir))

  /** The exact join over any documents-shaped (doc_id, text) frame.
    *
    * @note the returned frame's plan pins a PERSISTED intermediate (the
    *       packed per-doc gram arrays feed both the prefix candidates
    *       and the verify join). The harness releases it between gates
    *       via [[graft.Graft.releaseState]]; a direct library caller
    *       owns that release — call `Graft.releaseState(spark)` (or
    *       `spark.catalog.clearCache()`) after consuming the result, or
    *       |docs|-sized cache blocks accumulate across calls. */
  private[graft] def allpairsOver(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ---- EXACT-DUPLICATE CONTRACTION (r13) ----------------------------
    // The r13 100× rehearsal killed the uncontracted form with disk
    // exhaustion: on a duplicate-heavy corpus (the replica fixture is
    // every doc ×100) the prefix candidate join explodes quadratically
    // in duplicate-group size BEFORE the distinct (each identical copy
    // contributes the same prefix grams), and the verify then ships two
    // doc-length gram arrays per exploded pair. Every doc with the same
    // NORMALIZED text has the same shingle set by construction
    // ([[shinglesOf]] derives from `normalized`), so the Jaccard
    // machinery only needs one representative per distinct text: group
    // on [[dedupExact]]'s key, run prefix+verify over reps, then expand
    // the lossless answer analytically — intra-group pairs are exact
    // duplicates (inter = na = nb, J = 1), cross-group pairs inherit
    // their rep pair's exact counts. Output rows are BYTE-IDENTICAL to
    // the uncontracted form (the gate hash pins it); what changes is
    // the shuffle: Σ|group|²·doclen of candidate/verify traffic becomes
    // Σ|distinct-pairs|·doclen plus a generate-only expansion, so the
    // wire cost no longer scales with duplication — only the answer
    // itself does, which is irreducible for a LOSSLESS operator (the
    // collapsed-corpus question is [[dedupAllpairsClean]]'s job).
    // The member arrays are |group|-bounded; any group too large to
    // hold as one array implies a |group|² output that is already
    // impossible to emit, so the bound is dominated by the answer.
    val groups = docs
      .select(col("doc_id"), md5(normalized(col("text"))).as("fpx"))
      .groupBy(col("fpx"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("members"),
        count(lit(1)).as("gsize"))
      // four consumers (rep semi-join, intra expansion, cross ×2) —
      // same release contract as `cand` below
      .persist()
    val repDocs = docs.join(
      groups.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")

    val dg = shinglesOf(repDocs)
    val df = dg.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = dg.join(df, "s")
      .withColumn("rnk", row_number().over(byDoc.orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(byDoc))
    // p = n − ceil(τ·n) + 1 in pure integer math (τ = 0.6 ⇒ ⌈3n/5⌉;
    // `div`, not `/` — Column `/` is IEEE division)
    val prefix = ranked
      .where(col("rnk") <= expr("n - ((n * 3 + 4) div 5) + 1"))
      .select(col("s"), col("doc_id"), col("n"), col("rnk"))
    // POSITIONAL filter (PPJoin's tightening of AllPairs): a match at
    // prefix positions (i, j) leaves at most min(na−i, nb−j) further
    // common grams, so the overlap can reach at most that + 1; prune
    // when even the ceiling misses α = ⌈τ/(1+τ)·(na+nb)⌉, the minimum
    // intersection any J ≥ τ pair must have (from J = α/(na+nb−α)).
    // Integer form with τ = ppm/1e6: α = ⌈ppm·(na+nb)/(1e6+ppm)⌉.
    // hint("merge"): the contraction (r13) made BOTH sides of this
    // self-join small and near-equal at fixture scale, and AQE's
    // broadcast build-side pick then flips on byte-level size jitter —
    // two semantically-identical renderings (BuildLeft/BuildRight with
    // swapped children) that flap the plan fingerprint run to run
    // (diffed 2026-08-16; isolated re-runs land on either). SMJ is the
    // symmetric, deterministic strategy AND the 100 TB-correct one: on
    // a distinct-heavy corpus the prefix table is large and must never
    // be broadcast; on a duplicate-heavy one both sides are tiny and
    // SMJ costs the same few seconds.
    val cand = prefix.as("a")
      .join(prefix.as("b").hint("merge"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .where(lit(AllPairsTauPpm) * greatest(col("a.n"), col("b.n")) <=
        lit(1000000L) * least(col("a.n"), col("b.n")))
      .where(expr(s"1 + least(a.n - a.rnk, b.n - b.rnk) >= " +
        s"($AllPairsTauPpm * (a.n + b.n) + ${1000000L + AllPairsTauPpm} - 1) " +
        s"div ${1000000L + AllPairsTauPpm}"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
      // the candidate table feeds TWO consumers (the doc-set semi-join
      // and the verify join); unpersisted, each re-runs the 36M-row
      // prefix join + distinct lineage — the r11 sf1 probe measured
      // every stage cheap in isolation yet the composed query 2×
      // slower than their sum. |pairs|×4 longs is the documented
      // candidate budget, so the cut point is safe to cache. RELEASE
      // CONTRACT: the terminal action runs in the caller, so the cache
      // outlives this function — every harness (Bench/Verify/
      // ScaleRehearsal) clearCache()s between queries; a library
      // caller embedding this in a long-lived session owns that sweep.
      .persist()
    // exact verify, candidate-bounded and OFF THE WIRE: candidate docs'
    // full gram sets packed once into SORTED per-doc arrays (doc-length-
    // bounded collect_list buffers, the containmentOver discipline) of
    // 8-BYTE GRAM IDS, not strings (r15 — [[gramId]] collision
    // contract; the r14e StageProbe priced the verify stage's 5.0 GB
    // pairs+string-array exchange at 985 task-seconds on the
    // distinct-heavy 100× fixture, and ids cut the array bytes ~4×
    // and the merge compare to Long.compare). Every qualifying pair
    // carries two arrays, intersection in-task by the zero-allocation
    // codegen merge ([[graft.functions.IntersectSizeSorted]]'s long
    // arm — sort once per doc, amortized over every pair the doc
    // appears in); na/nb ride through, so no re-join with cand
    // afterwards
    graft.functions.IntersectSizeSorted.register(docs.sparkSession)
    val candDocs = cand.select(col("da").as("doc_id"))
      .union(cand.select(col("db").as("doc_id"))).distinct()
    val docSets = dg.join(candDocs, Seq("doc_id"), "semi")
      .groupBy(col("doc_id")).agg(sort_array(collect_list(gramId(col("s")))).as("ss"))
    val repPairs = cand
      .join(docSets.select(col("doc_id").as("da"), col("ss").as("ssa")), Seq("da"))
      .join(docSets.select(col("doc_id").as("db"), col("ss").as("ssb")), Seq("db"))
      .select(col("da"), col("db"), col("na"), col("nb"),
        expr("intersect_size_sorted(ssa, ssb)").as("inter"))
      .where(lit(1000000L) * col("inter") >=
        lit(AllPairsTauPpm) * (col("na") + col("nb") - col("inter")))
      .select(col("da"), col("db"), col("inter"), col("na"), col("nb"),
        expr("1000000 * inter div (na + nb - inter)").as("j_ppm"))

    // ---- analytic expansion back to the lossless answer ---------------
    // intra-group: every unordered member pair of a multi-doc group is
    // an exact duplicate (inter = na = nb = |shingle set|, J exactly
    // 10⁶). Joining the rep's shingle COUNT inner keeps parity with the
    // uncontracted form for shingle-less docs (< 3 normalized words):
    // they never reach the candidate join there, so their identical
    // copies must not pair here either.
    val nOf = dg.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val intra = groups.where(col("gsize") >= 2)
      .join(nOf.select(col("doc_id").as("rep"), col("n")), Seq("rep"))
      .select(col("n"), col("members"),
        posexplode(col("members")).as(Seq("pos", "da")))
      .select(col("da"), col("n"),
        explode(expr("slice(members, pos + 2, size(members) - pos - 1)")).as("db"))
      .select(col("da"), col("db"), col("n").as("inter"),
        col("n").as("na"), col("n").as("nb"),
        lit(1000000L).as("j_ppm"))
    // cross-group: each qualifying rep pair fans out over both member
    // sets (identical texts ⇒ identical counts, so inter/na/nb/j carry
    // over verbatim); da < db is restored per expanded pair, swapping
    // na/nb with it since na is bound to da's side.
    val cross = repPairs
      .join(groups.select(col("rep").as("da"), col("members").as("ma")), Seq("da"))
      .join(groups.select(col("rep").as("db"), col("members").as("mb")), Seq("db"))
      .select(col("inter"), col("na"), col("nb"), col("j_ppm"),
        col("mb"), explode(col("ma")).as("a"))
      .select(col("inter"), col("na"), col("nb"), col("j_ppm"), col("a"),
        explode(col("mb")).as("b"))
      .select(least(col("a"), col("b")).as("da"),
        greatest(col("a"), col("b")).as("db"),
        col("inter"),
        when(col("a") < col("b"), col("na")).otherwise(col("nb")).as("na"),
        when(col("a") < col("b"), col("nb")).otherwise(col("na")).as("nb"),
        col("j_ppm"))
    cross.unionByName(intra)
  }

  /** The INCREMENTAL member of the exact family: EXACT new×old τ-join
    * — an arrival batch against a snapshot with the same completeness
    * guarantee, candidates restricted to batch-prefix × snapshot-prefix
    * (batch-internal pairs are [[dedupAllpairs]]'s job over the batch).
    * The prefix discipline needs ONE shared total gram order across
    * both sides, so df is counted over the UNION of the two gram
    * streams — the census a maintained snapshot would store and fold
    * per batch; any shared total order preserves the completeness
    * proof, including the positional filter's (whose first-joined-match
    * argument never used the a<b side constraint). Gate stand-in: the
    * engine-wide doc_id % 3 batch/snapshot split. */
  def dedupAllpairsIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsWide(s, dir) // fan-out (r16)
    allpairsVs(docs.where(col("doc_id") % 3 === 1),
      docs.where(col("doc_id") % 3 =!= 1))
  }

  /** Two-table exact join core: qualifying (batch doc, snapshot doc)
    * pairs only.
    *
    * @note persist ownership as in [[allpairsOver]]: the returned plan
    *       pins a persisted intermediate; library callers must
    *       `Graft.releaseState(spark)` after consuming the result. */
  private[graft] def allpairsVs(batch: DataFrame, snapshot: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // exact-duplicate contraction per side, the [[allpairsOver]] r13
    // discipline: the τ-machinery runs over one representative per
    // distinct normalized text on each side, and the lossless
    // batch×snapshot answer is re-expanded analytically afterwards
    // (identical texts ⇒ identical shingle sets ⇒ the rep pair's exact
    // inter/na/nb/j transfer verbatim to every member pair). No
    // intra-group leg here — batch-internal pairs are dedupAllpairs's
    // job, and a batch member and a snapshot member with the SAME text
    // pair through their reps' J = 1 rep pair, never analytically.
    def groupsOf(side: DataFrame) = side
      .select(col("doc_id"), md5(normalized(col("text"))).as("fpx"))
      .groupBy(col("fpx"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("members"))
      .persist()
    val gB = groupsOf(batch)
    val gS = groupsOf(snapshot)
    val dgB = shinglesOf(batch.join(
      gB.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi"))
    val dgS = shinglesOf(snapshot.join(
      gS.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi"))
    val df = dgB.unionByName(dgS)
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
    def prefixOf(dg: DataFrame): DataFrame = dg.join(df, "s")
      .withColumn("rnk", row_number().over(byDoc.orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(byDoc))
      .where(col("rnk") <= expr("n - ((n * 3 + 4) div 5) + 1"))
      .select(col("s"), col("doc_id"), col("n"), col("rnk"))
    // hint("merge"): same AQE build-side jitter class as allpairsOver's
    // pinned prefix self-join (r13) — the contraction leaves two small,
    // near-equal prefix tables at fixture scale, and the broadcast
    // build-side pick flips on byte-level size jitter, flapping the
    // plan fingerprint. SMJ is deterministic AND the 100 TB-correct
    // strategy: a distinct-heavy corpus's prefix tables must never be
    // broadcast. Pinned proactively per the r13 verdict.
    val cand = prefixOf(dgB).as("a")
      .join(prefixOf(dgS).as("b").hint("merge"), col("a.s") === col("b.s"))
      .where(lit(AllPairsTauPpm) * greatest(col("a.n"), col("b.n")) <=
        lit(1000000L) * least(col("a.n"), col("b.n")))
      .where(expr(s"1 + least(a.n - a.rnk, b.n - b.rnk) >= " +
        s"($AllPairsTauPpm * (a.n + b.n) + ${1000000L + AllPairsTauPpm} - 1) " +
        s"div ${1000000L + AllPairsTauPpm}"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
      // three consumers (both per-side semi-joins + the verify join):
      // same cut point, same release contract as allpairsOver's cand
      .persist()
    // packed sorted-array verify, the allpairsOver discipline (na/nb
    // ride through; both sides' sets sorted once, merged in-task) over
    // 8-byte gram ids ([[gramId]] collision contract, r15)
    graft.functions.IntersectSizeSorted.register(batch.sparkSession)
    def setsOf(dg: DataFrame, side: DataFrame): DataFrame =
      dg.join(side, Seq("doc_id"), "semi")
        .groupBy(col("doc_id")).agg(sort_array(collect_list(gramId(col("s")))).as("ss"))
    val setsB = setsOf(dgB, cand.select(col("da").as("doc_id")).distinct())
    val setsS = setsOf(dgS, cand.select(col("db").as("doc_id")).distinct())
    val repPairs = cand
      .join(setsB.select(col("doc_id").as("da"), col("ss").as("ssa")), Seq("da"))
      .join(setsS.select(col("doc_id").as("db"), col("ss").as("ssb")), Seq("db"))
      .select(col("da"), col("db"), col("na"), col("nb"),
        expr("intersect_size_sorted(ssa, ssb)").as("inter"))
      .where(lit(1000000L) * col("inter") >=
        lit(AllPairsTauPpm) * (col("na") + col("nb") - col("inter")))
      .select(col("da"), col("db"), col("inter"), col("na"), col("nb"),
        expr("1000000 * inter div (na + nb - inter)").as("j_ppm"))
    // analytic expansion over both sides' member sets; da stays the
    // batch doc and db the snapshot doc (side roles, not an ordering),
    // so na/nb never swap
    repPairs
      .join(gB.select(col("rep").as("da"), col("members").as("ma")), Seq("da"))
      .join(gS.select(col("rep").as("db"), col("members").as("mb")), Seq("db"))
      .select(col("inter"), col("na"), col("nb"), col("j_ppm"),
        col("mb"), explode(col("ma")).as("a"))
      .select(col("inter"), col("na"), col("nb"), col("j_ppm"), col("a"),
        explode(col("mb")).as("b"))
      .select(col("a").as("da"), col("b").as("db"), col("inter"),
        col("na"), col("nb"), col("j_ppm"))
  }

  /** Oracle: brute batch×snapshot join — losslessness across the two
    * tables, same argument as [[dedupAllpairsSql]]. */
  val dedupAllpairsIncrSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |dg AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM docs WHERE len(w) >= 3),
       |sizes AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n FROM dg GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(1) AS BIGINT) AS inter
       |  FROM dg a JOIN dg b ON a.s = b.s
       |  WHERE a.doc_id % 3 = 1 AND b.doc_id % 3 <> 1
       |  GROUP BY 1, 2)
       |SELECT i.da, i.db, i.inter, sa.n AS na, sb.n AS nb,
       |       1000000 * i.inter // (sa.n + sb.n - i.inter) AS j_ppm
       |FROM inter i
       |JOIN sizes sa ON i.da = sa.doc_id
       |JOIN sizes sb ON i.db = sb.doc_id
       |WHERE 1000000 * i.inter >= $AllPairsTauPpm * (sa.n + sb.n - i.inter)""".stripMargin

  /** The standing doctrine AS AN OPERATOR: exact τ-join over the
    * replica-COLLAPSED corpus — [[dedupExact]]'s keeper rule first
    * (one row per distinct normalized text, min-id canonical), then
    * [[allpairsOver]] among canonicals only. On a duplicate-heavy
    * corpus the raw exact join's output is quadratic in duplication BY
    * SEMANTICS (every replica pair qualifies at J = 1 — the 10×
    * rehearsal measured 250k such pairs); collapsing first removes the
    * clique blow-up while keeping the completeness guarantee among
    * DISTINCT texts, which is the question a pipeline actually asks.
    * This is the composition every dedup family here prescribes
    * (SCALE.md's r1 LSH lesson, now gated and measured). */
  def dedupAllpairsClean(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val keep = docs
      .select(col("doc_id"), md5(normalized(col("text"))).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    allpairsOver(docs.join(keep, Seq("doc_id"), "left_semi"))
  }

  val dedupAllpairsCleanSql: String =
    s"""WITH keepers AS (
       |  SELECT MIN(doc_id) AS doc_id
       |  FROM (SELECT doc_id,
       |          md5(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g'))) AS fp
       |        FROM documents)
       |  GROUP BY fp),
       |documents2 AS (
       |  SELECT d.* FROM documents d JOIN keepers k ON d.doc_id = k.doc_id),
       |docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents2),
       |dg AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM docs WHERE len(w) >= 3),
       |sizes AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n FROM dg GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(1) AS BIGINT) AS inter
       |  FROM dg a JOIN dg b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT i.da, i.db, i.inter, sa.n AS na, sb.n AS nb,
       |       1000000 * i.inter // (sa.n + sb.n - i.inter) AS j_ppm
       |FROM inter i
       |JOIN sizes sa ON i.da = sa.doc_id
       |JOIN sizes sb ON i.db = sb.doc_id
       |WHERE 1000000 * i.inter >= $AllPairsTauPpm * (sa.n + sb.n - i.inter)""".stripMargin

  /** Oracle: BRUTE all-pairs — the whole point of the gate: the
    * prefix/length pruning must be provably LOSSLESS, so the oracle
    * ignores the filters entirely and the hash only matches if the
    * pruned join found every qualifying pair. */
  val dedupAllpairsSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |dg AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM docs WHERE len(w) >= 3),
       |sizes AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n FROM dg GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(1) AS BIGINT) AS inter
       |  FROM dg a JOIN dg b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT i.da, i.db, i.inter, sa.n AS na, sb.n AS nb,
       |       1000000 * i.inter // (sa.n + sb.n - i.inter) AS j_ppm
       |FROM inter i
       |JOIN sizes sa ON i.da = sa.doc_id
       |JOIN sizes sb ON i.db = sb.doc_id
       |WHERE 1000000 * i.inter >= $AllPairsTauPpm * (sa.n + sb.n - i.inter)""".stripMargin
}
