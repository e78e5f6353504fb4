package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Feature engineering for model-input pipelines — the last mile
  * between a cleaned corpus and a trainer: numeric scaling, bucketing,
  * categorical encoding, and the hashing trick. Each op is one
  * aggregate over a bounded domain (|groups|, |categories|, 2 global
  * extrema) broadcast back over the corpus — zero corpus-keyed
  * shuffles, the [[Classifier]] discipline.
  *
  * Cross-engine exactness: sums ride DECIMAL (doubles summed in
  * different orders disagree in the last ulp — the [[Relational
  * .q33CovCorr]] lesson); the per-row arithmetic is then a FIXED
  * IEEE expression both engines evaluate identically. */
object Features {

  /** `feat_scale` — per-language z-score + min-max of `n_chars` (the
    * per-domain normalization pattern: LENGTH means nothing across
    * languages, so scaling is grouped). Population variance from
    * DECIMAL Σx, Σx²; degenerate groups (σ=0 or max=min) scale to 0. */
  def featScale(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
    scaleOver(d, statsOf(d))
  }

  /** Per-group scaling statistics — every component is MERGEABLE
    * (DECIMAL sums add, counts add, extrema least/greatest), which is
    * what lets [[graft.streaming.FeatureStream]] fold them per batch
    * and reproduce the one-shot aggregation exactly. */
  def statsOf(d: DataFrame): DataFrame =
    d.groupBy(col("lang")).agg(
      sum(col("n_chars").cast("decimal(38,0)")).as("sx"),
      sum((col("n_chars").cast("decimal(38,0)") * col("n_chars")).cast("decimal(38,0)")).as("sxx"),
      count(lit(1)).as("n"),
      min(col("n_chars")).as("lo"),
      max(col("n_chars")).as("hi"))

  /** Score a corpus under a (possibly stream-folded) stats table. */
  def scaleOver(d: DataFrame, st: DataFrame): DataFrame =
    d.join(broadcast(st), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr("""CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n <= 0.0 THEN 0.0
                ELSE (n_chars - CAST(sx AS DOUBLE) / n) /
                     sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n)
                END""").as("z"),
        expr("CASE WHEN hi = lo THEN 0.0 ELSE CAST(n_chars - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE) END")
          .as("minmax"))

  val featScaleSql: String =
    """WITH st AS (
      |  SELECT lang,
      |         SUM(CAST(n_chars AS DECIMAL(38,0))) AS sx,
      |         SUM(CAST(CAST(n_chars AS DECIMAL(38,0)) * n_chars AS DECIMAL(38,0))) AS sxx,
      |         CAST(COUNT(*) AS BIGINT) AS n,
      |         MIN(n_chars) AS lo, MAX(n_chars) AS hi
      |  FROM documents GROUP BY 1)
      |SELECT d.doc_id, d.lang, d.n_chars,
      |       CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n <= 0.0 THEN 0.0
      |            ELSE (d.n_chars - CAST(sx AS DOUBLE) / n) /
      |                 sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n)
      |            END AS z,
      |       CASE WHEN hi = lo THEN 0.0
      |            ELSE CAST(d.n_chars - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE) END AS minmax
      |FROM documents d JOIN st ON d.lang = st.lang""".stripMargin

  /** Fixed bucket count for [[featBucketize]]. */
  val NBuckets = 16

  /** `feat_bucketize` — equal-width binning of `events.value` against
    * the GLOBAL extrema (one broadcast 1-row aggregate): bucket =
    * ⌊(x−lo)·B/(hi−lo)⌋ clamped to B−1. The multiply-THEN-divide
    * order is part of the contract (the other association rounds
    * differently near bin edges) — mirrored verbatim in the oracle. */
  def featBucketize(s: SparkSession, dir: String): DataFrame = {
    val e  = Tables.events(s, dir).select(col("event_id"), col("value"))
    val st = e.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    e.crossJoin(broadcast(st))
      .select(col("event_id"), col("value"),
        // hi = lo guard (degenerate one-value domain): without it the
        // division is 0/0 → NaN, and Spark and DuckDB disagree on what
        // least/floor make of NaN — the featScale sigma-zero branch
        expr(s"CAST(CASE WHEN hi = lo THEN 0.0 ELSE least(floor((value - lo) * $NBuckets.0 / (hi - lo)), ${NBuckets - 1}.0) END AS INT)")
          .as("bucket"))
  }

  val featBucketizeSql: String =
    s"""WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
       |SELECT event_id, value,
       |       CAST(CASE WHEN hi = lo THEN 0.0 ELSE LEAST(FLOOR((value - lo) * $NBuckets.0 / (hi - lo)), ${NBuckets - 1}.0) END AS INT) AS bucket
       |FROM events, st""".stripMargin

  /** `feat_onehot` — dense categorical indices over a SORTED distinct
    * catalog of lang and source values (index stability matters: a
    * model trained against these positions must see the same mapping
    * every run, so the order is the values' own, never discovery
    * order). The window runs over the |categories|-sized catalog only,
    * never the corpus. */
  def featOnehot(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source"))
    val feats = d.select(concat(lit("lang="), col("lang")).as("feat"), col("doc_id"))
      .unionByName(d.select(concat(lit("source="), col("source")).as("feat"), col("doc_id")))
    val catalog = feats.select(col("feat")).distinct()
      .withColumn("idx", (row_number().over(Window.orderBy(col("feat"))) - 1).cast("long"))
    feats.join(broadcast(catalog), Seq("feat"))
      .select(col("doc_id"), col("feat"), col("idx"))
  }

  val featOnehotSql: String =
    """WITH feats AS (
      |  SELECT doc_id, 'lang=' || lang AS feat FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'source=' || source AS feat FROM documents),
      |catalog AS (
      |  SELECT feat, CAST(ROW_NUMBER() OVER (ORDER BY feat) - 1 AS BIGINT) AS idx
      |  FROM (SELECT DISTINCT feat FROM feats))
      |SELECT f.doc_id, f.feat, c.idx
      |FROM feats f JOIN catalog c ON f.feat = c.feat""".stripMargin

  /** Hash-bucket count for [[featHashedCross]]. */
  val HashBuckets = 1024

  /** `feat_hashed_cross` — the hashing trick over a lang×source×
    * length-band cross (the unbounded-vocabulary escape hatch: no
    * catalog, no index state, collisions priced in). Buckets derive
    * from md5 — the repo's cross-engine hash discipline
    * ([[CorpusOps]]: Spark and DuckDB md5 agree bit-for-bit; their
    * native hash() functions do not). */
  def featHashedCross(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(col("lang"), lit("x"), col("source"), lit("x"), col("n_chars") % 8).as("cross"))
      .select(col("doc_id"), col("cross"),
        (expr("cast(conv(substr(md5(cross), 1, 15), 16, 10) as bigint)") % HashBuckets)
          .cast("int").as("bucket"))

  val featHashedCrossSql: String =
    s"""SELECT doc_id,
       |       lang || 'x' || source || 'x' || (n_chars % 8) AS cross,
       |       CAST(CAST(('0x' || substr(md5(lang || 'x' || source || 'x' || (n_chars % 8)), 1, 15)) AS BIGINT)
       |            % $HashBuckets AS INT) AS bucket
       |FROM documents""".stripMargin

  /** `feat_quantile_bucketize` — quantile (equal-FREQUENCY) binning of
    * `events.value` into quartiles, the robust sibling of
    * [[featBucketize]]'s equal-width bins (one outlier stretches an
    * equal-width grid into uselessness; quantile edges don't move).
    * The quartile edges come from the EXACT two-pass counting
    * selection kernel ([[Selection.exactPctileOver]]) — never a
    * global sort, never a single-buffer percentile() — and the bucket
    * is then `Σ (x > edge)`, a broadcast of three longs. Ceil-rank
    * edge semantics: a value equal to an edge falls in the LOWER
    * bucket. */
  def featQuantileBucketize(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.events(s, dir)
      .select(expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"))
    val edges = Selection.exactPctileOver(s, cents, Seq(25, 50, 75))
      .orderBy("p").collect().map(_.getAs[Long]("cents"))
    val Array(q1, q2, q3) = edges
    Tables.events(s, dir)
      .select(col("event_id"), col("value"),
        expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"))
      .select(col("event_id"), col("value"),
        ((col("cents") > q1).cast("int") + (col("cents") > q2).cast("int") +
          (col("cents") > q3).cast("int")).as("q_bucket"))
  }

  val featQuantileBucketizeSql: String =
    """WITH c AS (
      |  SELECT event_id, value,
      |         CAST(floor(value * 100.0) AS BIGINT) AS cents
      |  FROM events),
      |n AS (SELECT CAST(COUNT(1) AS BIGINT) AS n FROM c),
      |r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c),
      |e AS (
      |  SELECT p, r.cents AS edge
      |  FROM (VALUES (25), (50), (75)) AS v(p)
      |  CROSS JOIN n JOIN r ON r.rn = (p * n.n + 99) // 100)
      |SELECT c.event_id, c.value,
      |       CAST((CASE WHEN c.cents > e1.edge THEN 1 ELSE 0 END)
      |          + (CASE WHEN c.cents > e2.edge THEN 1 ELSE 0 END)
      |          + (CASE WHEN c.cents > e3.edge THEN 1 ELSE 0 END) AS INT) AS q_bucket
      |FROM c, (SELECT edge FROM e WHERE p = 25) e1,
      |        (SELECT edge FROM e WHERE p = 50) e2,
      |        (SELECT edge FROM e WHERE p = 75) e3""".stripMargin

  /** Smoothing pseudo-count for [[featTargetEncode]]. */
  val SmoothM = 10

  /** `feat_target_encode` — Bayesian-smoothed target encoding of
    * `event_type` against `value`:
    * enc = (Σ_cat + m·μ_global) / (n_cat + m) — the
    * high-cardinality-categorical workhorse (a rare category shrinks
    * to the global mean instead of memorizing its few rows). Sums
    * ride exact integer cents (floor(value·100)); the encoding is one
    * fixed IEEE expression over those integers, so it hash-checks.
    * One |categories| aggregate + broadcast back. */
  def featTargetEncode(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"))
    val g = e.agg(sum(col("cents")).as("gs"), count(lit(1)).as("gn"))
    val cat = e.groupBy(col("event_type"))
      .agg(sum(col("cents")).as("cs"), count(lit(1)).as("cn"))
    e.join(broadcast(cat), Seq("event_type")).crossJoin(broadcast(g))
      .select(col("event_id"), col("event_type"), col("cn").as("n_cat"),
        expr(s"""(CAST(cs AS DOUBLE) / 100.0
                 + $SmoothM.0 * (CAST(gs AS DOUBLE) / 100.0 / gn))
                / (cn + $SmoothM.0)""").as("encoded"))
  }

  val featTargetEncodeSql: String =
    s"""WITH e AS (
       |  SELECT event_id, event_type,
       |         CAST(floor(value * 100.0) AS BIGINT) AS cents
       |  FROM events),
       |g AS (SELECT SUM(cents) AS gs, CAST(COUNT(1) AS BIGINT) AS gn FROM e),
       |cat AS (
       |  SELECT event_type, SUM(cents) AS cs, CAST(COUNT(1) AS BIGINT) AS cn
       |  FROM e GROUP BY 1)
       |SELECT e.event_id, e.event_type, cat.cn AS n_cat,
       |       (CAST(cs AS DOUBLE) / 100.0
       |        + $SmoothM.0 * (CAST(gs AS DOUBLE) / 100.0 / gn))
       |       / (cn + $SmoothM.0) AS encoded
       |FROM e JOIN cat USING (event_type) CROSS JOIN g""".stripMargin
}
