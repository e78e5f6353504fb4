package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{CountMinAgg, HllAgg, MisraGriesAgg, QuantileAgg}

/** Corpus heavy hitters: every token with frequency above 1% of all
  * token occurrences, with its EXACT count — found without ever
  * shuffling the full per-token groupBy.
  *
  * Two-pass shape (the standard scale pattern for frequent items):
  *  1. SKETCH: one Misra-Gries pass ([[MisraGriesAgg]], k = [[HhK]])
  *     — a mergeable partial aggregate whose state is ≤ k counters per
  *     partition and whose shuffle is ≤ k rows total, independent of
  *     vocabulary size. Because the report threshold n/[[HhT]] exceeds
  *     the sketch guarantee n/(k+1), every true heavy hitter is
  *     guaranteed to be among the ≤ k candidates (no false negatives;
  *     MisraGriesSpec pins the bound adversarially).
  *  2. VERIFY: exact counts for ONLY the candidate tokens (an isin
  *     filter the scan prunes on, then a ≤ k-key groupBy), keeping
  *     those above threshold. The output is exact and deterministic —
  *     sketch merge-order nondeterminism affects only which EXTRA
  *     candidates get disproven — so the DuckDB oracle is a plain
  *     GROUP BY ... HAVING.
  *
  * At 100 TB: a full token groupBy shuffles billions of distinct keys;
  * this shuffles ≤ k counters plus ≤ k exact-count rows.
  */
object HeavyHitters {

  /** Sketch capacity; guarantee threshold n/(K+1) must be below the
    * report threshold n/T. */
  val HhK = 127
  /** Report tokens with count · T > n (i.e. frequency > 1/T). */
  val HhT = 100L

  def taHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(split(TextAnalysis.normalized(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
    val tokDs = toks.as[String]

    val agg = new MisraGriesAgg(HhK)
    // the total rides the SKETCH job (typed multi-column select): one
    // corpus scan produces both, instead of a separate count() pass
    // re-tokenizing everything a second time
    val (sketch: Map[String, Long], n: Long) =
      tokDs.select(agg.toColumn.name("mg"), count(lit(1)).as[Long]).head()
    val candidates = sketch.keys.toSeq

    toks.where(col("token").isInCollection(candidates))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") * HhT > n)
      .select(col("token"), col("n_occurrences"),
        (col("n_occurrences").cast("double") / lit(n.toDouble)).as("share"))
  }

  val taHeavyHittersSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ')) AS token
       |  FROM documents),
       |t2 AS (SELECT token FROM toks WHERE token <> ''),
       |tot AS (SELECT COUNT(1) AS n FROM t2)
       |SELECT token,
       |       CAST(COUNT(1) AS BIGINT) AS n_occurrences,
       |       CAST(COUNT(1) AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM tot) AS share
       |FROM t2 GROUP BY token
       |HAVING COUNT(1) * $HhT > (SELECT n FROM tot)""".stripMargin

  // ------------------------------------------------------- ta_cms_eval
  /** Count-Min sketch depth (rows) and width (buckets/row): 16 KB of
    * state answering point queries with overcount ≤ 2n/[[CmsW]] at
    * probability 1 − 2^−[[CmsD]] per query. */
  val CmsD = 4
  val CmsW = 512
  /** Probe set size for the eval gate. */
  val CmsTopK = 20
  /** Per-row universal-hash coefficients — the same Knuth/xxhash-prime
    * recipe as [[Dedup.HashA]]/[[Dedup.HashB]] at offset seeds, kept
    * < 2³⁰ so a·x stays inside Int64 for 32-bit x in both engines. */
  val CmsA: Seq[Long] = (0 until CmsD).map(i => ((2654435761L * (2 * i + 7)) % (1L << 30)) | 1L)
  val CmsB: Seq[Long] = (0 until CmsD).map(i => (2246822519L * (2 * i + 8)) % (1L << 30))

  private[graft] def cmsAgg = new CountMinAgg(CmsD, CmsW, CmsA.toArray, CmsB.toArray, Dedup.P)

  /** CMS accuracy EVALUATION over the corpus token stream — the
    * [[graft.operators.Similarity]]`.simRecallEval` shape applied to
    * the frequency sketch: build the sketch in one mergeable pass, then
    * compare its point estimates against exact counts on the exact
    * top-[[CmsTopK]] tokens. Output (token, n_exact, n_est, overcount);
    * overcount ≥ 0 always (CMS never underestimates).
    *
    * The PRODUCTION path at 100 TB is the sketch alone ([[cmsAgg]] —
    * d·w longs of mergeable state, one tiny shuffle, point queries via
    * [[CountMinAgg.estimate]] on any later item); the exact top-k
    * groupBy here is the eval harness that grades it, exactly like the
    * brute-force side of the ANN recall eval. Driver traffic is the
    * 16 KB sketch + [[CmsTopK]] probe rows — bounded at any corpus
    * size. Token ids are the minhash kernel's md5-derived 32-bit x, so
    * the DuckDB twin replays the identical arithmetic. */
  def taCmsEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = cmsToksOf(Tables.documents(s, dir))
    val agg = cmsAgg
    val sketch = toks.select(col("x")).as[Long]
      .select(agg.toColumn.name("cms")).head().toIndexedSeq
    cmsProbe(s, toks, sketch)
  }

  /** (token, x) occurrence stream — the 32-bit md5-derived item id
    * twin of Dedup's shingle id. Shared by the one-shot eval and the
    * streaming fold ([[graft.streaming.SketchStream]]). */
  private[graft] def cmsToksOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(TextAnalysis.normalized(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
      .withColumn("x",
        expr("cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint) % 4294967296"))

  /** Grade a FINISHED sketch against exact counts of the top-
    * [[CmsTopK]] tokens of `toks` — the eval harness half, split out
    * so any sketch (one-shot, batch-fold, stream-maintained) is graded
    * by the identical probe. */
  private[graft] def cmsProbe(s: SparkSession, toks: DataFrame,
      sketch: IndexedSeq[Long]): DataFrame = {
    import s.implicits._
    val agg = cmsAgg
    val top = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n_exact"), max(col("x")).as("x")) // x = f(token)
      .orderBy(col("n_exact").desc, col("token")).limit(CmsTopK)
      .collect() // ≤ CmsTopK rows, by construction
    top.toSeq.map { r =>
      val (t, c, x) = (r.getAs[String]("token"), r.getAs[Long]("n_exact"), r.getAs[Long]("x"))
      val e = agg.estimate(sketch, x)
      (t, c, e, e - c)
    }.toDF("token", "n_exact", "n_est", "overcount")
  }

  /** The sketch replayed relationally: per-row bucket sums over the
    * exact count table, estimate = min over rows — identical integer
    * arithmetic, so the gate hash-checks the ESTIMATES, not just the
    * exact side. */
  val taCmsEvalSql: String = {
    val hrows = (0 until CmsD).map(r => s"($r, ${CmsA(r)}, ${CmsB(r)})").mkString(", ")
    s"""WITH toks AS (
       |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ')) AS token
       |  FROM documents),
       |t2 AS (SELECT token FROM toks WHERE token <> ''),
       |counts AS MATERIALIZED (
       |  SELECT token, CAST(COUNT(1) AS BIGINT) AS c,
       |         CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % 4294967296 AS x
       |  FROM t2 GROUP BY token),
       |hs AS (SELECT * FROM (VALUES $hrows) AS v(r, ha, hb)),
       |hashed AS MATERIALIZED (
       |  SELECT token, c, r, ((ha * x + hb) % ${Dedup.P}) % $CmsW AS bkt
       |  FROM counts CROSS JOIN hs),
       |buckets AS MATERIALIZED (
       |  SELECT r, bkt, CAST(SUM(c) AS BIGINT) AS bc FROM hashed GROUP BY 1, 2),
       |est AS (
       |  SELECT h.token, MIN(b.bc) AS n_est
       |  FROM hashed h JOIN buckets b ON h.r = b.r AND h.bkt = b.bkt
       |  GROUP BY 1),
       |top AS (SELECT token, c FROM counts ORDER BY c DESC, token LIMIT $CmsTopK)
       |SELECT t.token, t.c AS n_exact, e.n_est AS n_est,
       |       e.n_est - t.c AS overcount
       |FROM top t JOIN est e ON t.token = e.token""".stripMargin
  }

  // ------------------------------------------------------- ta_hll_eval
  /** HyperLogLog register count (power of two) and trailing-zero cap.
    * m=1024 → standard error 1.04/√m ≈ 3.25%; the cap keeps the scaled
    * harmonic term `2^(HllRCap − rho)` in Int64 (max term 2^40, ×m
    * total ≤ 2^50). */
  val HllM = 1024
  val HllRCap = 40
  /** Raw-estimate constant α_m·m²·2^[[HllRCap]], written as the SAME
    * literal arithmetic the oracle SQL evaluates so both engines round
    * identically at every step. */
  val HllC: Double = 0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0 * 1099511627776.0

  private[graft] def hllAgg = new HllAgg(HllM, HllRCap)

  /** (lang, token) raw token stream — shared by the one-shot eval and
    * the streaming register-state twin ([[graft.streaming.SketchStream
    * .hllRegsOf]]). */
  private[graft] def hllLangToks(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
      explode(split(TextAnalysis.normalized(col("text")), " ")).as("token"))
      .where(col("token") =!= "")

  /** 60-bit item id: md5-derived, the engine's shared hash idiom. */
  private[graft] def hllItemCol =
    expr("cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint)")

  /** Eval projection over a (lang, n_exact, regs) frame: untouched
    * registers, the integer-scaled harmonic sum, and the raw estimate —
    * shared verbatim by [[taHllEval]] and the streamed fold gate so the
    * two cannot drift. */
  private[graft] def hllEvalOver(withRegs: DataFrame): DataFrame =
    withRegs.select(col("lang"), col("n_exact"),
      expr("size(filter(regs, r -> r = 0))").cast("long").as("v_zero"),
      expr(s"aggregate(regs, cast(0 as bigint), (acc, r) -> acc + shiftleft(cast(1 as bigint), $HllRCap - r))")
        .as("s_scaled"))
      .withColumn("n_est", lit(HllC) / col("s_scaled").cast("double"))

  /** Distinct-token ESTIMATION per language — the sketch answer to
    * COUNT(DISTINCT) at 100 TB, graded against the exact count the way
    * [[taCmsEval]] grades point frequencies. Output per language:
    * the exact distinct count, the count of untouched registers, the
    * integer-scaled harmonic sum `Σ_j 2^(HllRCap − r_j)` (the whole
    * sketch collapsed to ONE hash-checkable BIGINT), and the raw HLL
    * estimate α_m·m²/Σ2^−r_j — one division over integer-exact inputs,
    * so even the DOUBLE hash-checks across engines. This is the gate
    * stock HLL++ can never have (`q20_approx_distinct` documents that
    * concession; its estimates are checked only as within-tolerance
    * booleans).
    *
    * Registers are multiplicity-invariant (max is idempotent), so the
    * plan shares ONE distinct (lang, token) exchange between the exact
    * side and the sketch side — a single aggregation pipeline, no
    * second corpus scan, no join. The PRODUCTION path feeds the raw
    * token stream to [[hllAgg]] with no distinct upstream (HllSpec pins
    * stream == distinct-set registers bit-for-bit); state is m small
    * ints per group at any corpus size, and sketches for disjoint
    * shards union by pointwise max. */
  def taHllEval(s: SparkSession, dir: String): DataFrame = {
    val distinctToks = hllLangToks(Tables.documents(s, dir))
      .distinct()
      .withColumn("x", hllItemCol)
    val hll = udaf(hllAgg)
    hllEvalOver(distinctToks
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_exact"), hll(col("x")).as("regs")))
  }

  /** The register table replayed relationally: j = low-10-bits bucket,
    * rho = capped trailing-zero rank of the remaining bits, register =
    * MAX(rho) per (lang, j), untouched registers contribute 2^HllRCap
    * each — identical integer arithmetic, then the identical one
    * division. `log2(w & −w)` is exact (argument is a power of two),
    * mirroring numberOfTrailingZeros. */
  val taHllEvalSql: String =
    s"""WITH toks AS (
       |  SELECT lang,
       |         unnest(string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ')) AS token
       |  FROM documents),
       |dt AS (SELECT DISTINCT lang, token FROM toks WHERE token <> ''),
       |h AS (
       |  SELECT lang, token,
       |         CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS x
       |  FROM dt),
       |r AS (
       |  SELECT lang, x % $HllM AS j,
       |         CASE WHEN x // $HllM = 0 THEN $HllRCap
       |              ELSE LEAST(CAST(log2((x // $HllM) & -(x // $HllM)) AS BIGINT) + 1, $HllRCap)
       |         END AS rho
       |  FROM h),
       |regs AS (SELECT lang, j, MAX(rho) AS reg FROM r GROUP BY 1, 2),
       |per_lang AS (
       |  SELECT lang, COUNT(1) AS touched,
       |         CAST(SUM(CAST(1 AS BIGINT) << ($HllRCap - reg)) AS BIGINT) AS s_touched
       |  FROM regs GROUP BY 1),
       |exact AS (SELECT lang, COUNT(1) AS n_exact FROM dt GROUP BY 1)
       |SELECT e.lang, e.n_exact,
       |       $HllM - p.touched AS v_zero,
       |       p.s_touched + ($HllM - p.touched) * (CAST(1 AS BIGINT) << $HllRCap) AS s_scaled,
       |       (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE))
       |         * CAST(1048576.0 AS DOUBLE) * CAST(1099511627776.0 AS DOUBLE))
       |         / CAST(p.s_touched + ($HllM - p.touched) * (CAST(1 AS BIGINT) << $HllRCap) AS DOUBLE) AS n_est
       |FROM exact e JOIN per_lang p ON e.lang = p.lang""".stripMargin

  // -------------------------------------------------- ta_quantile_eval
  /** Sub-bucket bits: 2^5 = 32 linear buckets per octave → any quantile
    * estimate within 1/32 ≈ 3.1% of exact. */
  val QuantK = 5
  /** Bucket-array length: covers v < 2^41 (doc word counts are ≤ 10^4;
    * the clamp in [[QuantileAgg.bucketOf]] absorbs anything above). */
  val QuantSize = 1184
  val QuantPcts: Seq[Int] = Seq(50, 90, 95, 99)

  private[graft] def quantileAgg = new QuantileAgg(QuantK, QuantSize)

  /** Quantiles of the per-document word-count distribution per language
    * — the sketch answer to percentile_approx at 100 TB, graded against
    * exact percentiles the way [[taCmsEval]] grades point frequencies.
    * Output per (lang, pct): the group size, the EXACT pct-th
    * percentile (smallest v whose cumulative count reaches
    * ceil(n·pct/100)), and the sketch estimate.
    *
    * The PRODUCTION path is the sketch alone ([[quantileAgg]]):
    * [[QuantSize]] longs of mergeable state per group, one tiny
    * shuffle, any percentile answerable afterwards — including ones
    * chosen after the pass, and across shard sketches merged by vector
    * add. The exact side here is the eval harness (a full per-value
    * groupBy + rank walk) exactly like the brute-force side of the ANN
    * recall eval. Unlike stock percentile_approx (GK sketch — its
    * merge is order-dependent, so its output can't be hash-checked;
    * `q31_approx_pctile` documents that concession), this sketch's
    * bucketing is a pure per-value function, so the DuckDB twin
    * replays the identical integer arithmetic and the gate
    * hash-checks the ESTIMATES. Driver traffic: #langs × (sketch +
    * |QuantPcts| rows) — bounded at any corpus size. */
  /** (lang, v) per-document word-count stream — shared by the one-shot
    * eval and the streaming sketch-state twin. */
  private[graft] def quantileValsOf(docs: DataFrame): DataFrame =
    docs.select(
      col("lang"),
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
        .cast("long").as("v"))

  /** Eval assembly over collected per-lang (n, sketch) state: driver
    * estimates per percentile + the exact rank-walk harness over
    * `vals` — shared verbatim by [[taQuantileEval]] and the streamed
    * fold gate so the two cannot drift. */
  private[graft] def quantileEvalOver(s: SparkSession, vals: DataFrame,
      perLang: Seq[(String, Long, IndexedSeq[Long])]): DataFrame = {
    import s.implicits._
    val agg = quantileAgg
    val est = perLang.flatMap { case (lang, n, sk) =>
      QuantPcts.map { p => (lang, p, n, agg.estimate(sk, (n * p + 99L) / 100L)) }
    }.toDF("lang", "pct", "n", "v_est")
    // exact side (eval harness): per-value counts + rank walk
    val cum = vals.groupBy(col("lang"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("lang")).orderBy(col("v"))))
    val exact = cum.join(est.select("lang", "pct", "n").distinct(), Seq("lang"))
      .where(col("cum") >= expr("(n * pct + 99) div 100"))
      .groupBy(col("lang"), col("pct"))
      .agg(min(col("v")).as("v_exact"))
    exact.join(est, Seq("lang", "pct"))
      .select(col("lang"), col("pct"), col("n"), col("v_exact"), col("v_est"))
  }

  def taQuantileEval(s: SparkSession, dir: String): DataFrame = {
    val vals = quantileValsOf(Tables.documents(s, dir))
    val qa = udaf(quantileAgg)
    // ONE mergeable aggregation carries sketch + group size
    val perLang = vals.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), qa(col("v")).as("sk"))
      .collect() // ≤ #languages rows, QuantSize longs each — bounded
      .toSeq.map { r =>
        (r.getString(0), r.getLong(1), r.getSeq[Long](2).toIndexedSeq)
      }
    quantileEvalOver(s, vals, perLang)
  }

  /** The sketch replayed relationally: bucket index via
    * `length(bin(v))-1` (= floor(log2 v), exact integer in both
    * engines), cumulative bucket counts, first bucket reaching the
    * target rank, integer midpoint representative — identical
    * arithmetic to [[QuantileAgg]], so estimates hash-check. */
  val taQuantileEvalSql: String = {
    val k = QuantK; val w = 1 << k
    s"""WITH vals AS (
       |  SELECT lang, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS v
       |  FROM documents),
       |n AS (SELECT lang, CAST(COUNT(1) AS BIGINT) AS n FROM vals GROUP BY 1),
       |bidx AS (
       |  SELECT lang,
       |    CASE WHEN v <= 0 THEN 0
       |         WHEN v < ${2 * w} THEN v
       |         ELSE LEAST((length(bin(v)) - 1 - $k) * $w + (v >> (length(bin(v)) - 1 - $k)),
       |                    ${QuantSize - 1})
       |    END AS b
       |  FROM vals),
       |bcum AS (
       |  SELECT lang, b, SUM(c) OVER (PARTITION BY lang ORDER BY b) AS cum
       |  FROM (SELECT lang, b, COUNT(1) AS c FROM bidx GROUP BY 1, 2)),
       |vcum AS (
       |  SELECT lang, v, SUM(c) OVER (PARTITION BY lang ORDER BY v) AS cum
       |  FROM (SELECT lang, v, COUNT(1) AS c FROM vals GROUP BY 1, 2)),
       |tgt AS (
       |  SELECT n.lang, p.pct, n.n, (n.n * p.pct + 99) // 100 AS t
       |  FROM n CROSS JOIN (SELECT * FROM (VALUES ${QuantPcts.map(p => s"($p)").mkString(", ")}) pv(pct)) p),
       |ex AS (
       |  SELECT t.lang, t.pct, MIN(v.v) AS v_exact
       |  FROM tgt t JOIN vcum v ON v.lang = t.lang AND v.cum >= t.t
       |  GROUP BY 1, 2),
       |eb AS (
       |  SELECT t.lang, t.pct, MIN(b.b) AS best_b
       |  FROM tgt t JOIN bcum b ON b.lang = t.lang AND b.cum >= t.t
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT lang, pct,
       |    CASE WHEN best_b < ${2 * w} THEN best_b
       |         ELSE (((2 * ((best_b % $w) + $w) + 1) << ((best_b // $w) - 1)) - 1) // 2
       |    END AS v_est
       |  FROM eb)
       |SELECT t.lang, t.pct, t.n, x.v_exact, CAST(s.v_est AS BIGINT) AS v_est
       |FROM tgt t
       |JOIN ex x ON x.lang = t.lang AND x.pct = t.pct
       |JOIN est s ON s.lang = t.lang AND s.pct = t.pct""".stripMargin
  }

  // ------------------------------------------------ dq_join_estimate
  /** Equi-join cardinality estimation by Count-Min INNER PRODUCT
    * (Cormode & Muthukrishnan 2005, §4.3): |R ⋈ S| on a key is
    * Σ_v f_R(v)·f_S(v), and the sketch estimate is
    * min_r Σ_j cms_R[r][j]·cms_S[r][j] — an upper bound with expected
    * overcount |R||S|/w. The planner-side use: decide broadcast vs
    * shuffle vs skew handling from two O(d·w) sketches WITHOUT
    * touching either table again (sketches are maintained
    * incrementally by the [[graft.streaming.SketchStream]] fold).
    *
    * This gate uses a wider row than the token sketch
    * ([[JoinW]] = 2¹⁶: |lineitem|·|orders|/w ≈ 23% at sf0.01, vs the
    * useless 512-bucket row whose collision mass would swamp the
    * answer — the width is THE accuracy knob and is sized from the
    * expected |R||S|). Estimate arithmetic is exact integer (counter
    * dot products, min over d rows) so it hash-checks; the exact join
    * count rides along with the signed overcount — the eval-harness
    * discipline: measure the estimator against truth, don't trust it.
    * Driver state: two d·w counter arrays (512 KiB at JoinW) — the
    * same bounded-collect contract as the sketch family. */
  val JoinW = 65536

  def dqJoinEstimate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.CountMinAgg(
      CmsD, JoinW, CmsA.toArray, CmsB.toArray, Dedup.P)
    def sketchOf(df: org.apache.spark.sql.DataFrame, key: String): IndexedSeq[Long] =
      df.select(expr(
          s"cast(conv(substr(md5(cast($key as string)), 1, 15), 16, 10) as bigint) % 4294967296")
          .as("x"))
        .as[Long].select(agg.toColumn.name("cms")).head().toIndexedSeq
    val l = sketchOf(Tables.lineitemWide(s, dir), "l_orderkey") // fan-out (r16)
    val o = sketchOf(Tables.orders(s, dir), "o_orderkey")
    var est = Long.MaxValue
    var r = 0
    while (r < CmsD) {
      var dot = 0L
      var j = 0
      while (j < JoinW) { dot += l(r * JoinW + j) * o(r * JoinW + j); j += 1 }
      if (dot < est) est = dot
      r += 1
    }
    val exact = Tables.lineitem(s, dir).select(col("l_orderkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    Seq((est, exact, est - exact)).toDF("est_join", "exact_join", "overcount")
  }

  val dqJoinEstimateSql: String = {
    val hrows = (0 until CmsD).map(r => s"($r, ${CmsA(r)}, ${CmsB(r)})").mkString(", ")
    s"""WITH hs AS (SELECT * FROM (VALUES $hrows) AS v(r, ha, hb)),
       |lx AS (
       |  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
       |           % 4294967296 AS x
       |  FROM lineitem),
       |ox AS (
       |  SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
       |           % 4294967296 AS x
       |  FROM orders),
       |lb AS (SELECT r, ((ha * x + hb) % ${Dedup.P}) % $JoinW AS bkt,
       |              CAST(COUNT(1) AS BIGINT) AS c
       |       FROM lx CROSS JOIN hs GROUP BY 1, 2),
       |ob AS (SELECT r, ((ha * x + hb) % ${Dedup.P}) % $JoinW AS bkt,
       |              CAST(COUNT(1) AS BIGINT) AS c
       |       FROM ox CROSS JOIN hs GROUP BY 1, 2),
       |ip AS (SELECT l.r, CAST(SUM(l.c * o.c) AS BIGINT) AS dotp
       |       FROM lb l JOIN ob o ON l.r = o.r AND l.bkt = o.bkt GROUP BY l.r),
       |est AS (SELECT MIN(dotp) AS est_join FROM ip),
       |ex AS (SELECT CAST(COUNT(1) AS BIGINT) AS exact_join
       |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       |SELECT est.est_join, ex.exact_join, est.est_join - ex.exact_join AS overcount
       |FROM est, ex""".stripMargin
  }
}
