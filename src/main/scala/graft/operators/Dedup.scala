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
  * whether the corpus actually contains near-duplicates.
  *
  * Cross-engine determinism: all hashes derive from md5 (bit-identical
  * everywhere); MinHash/SimHash use integer arithmetic only; Jaccard /
  * cosine are single IEEE divisions of exact integers.
  */
object Dedup {

  import TextAnalysis.normalized

  // ------------------------------------------------------ dedup_exact
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("fp_norm"))
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(normalized(col("text"))).as("fp_norm"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("canonical_id")).cast("int"))
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
    Tables.documents(s, dir)
      .select(col("doc_id"), split(normalized(col("text")), " ").as("w"))
      .where(size(col("w")) >= 3)
      .selectExpr("doc_id",
        // Spark SQL array subscripts are 0-based (DuckDB's are 1-based)
        """explode(array_distinct(transform(
          |  sequence(0, size(w) - 3),
          |  i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) as s""".stripMargin)

  def dedupNgram(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val keep = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .where(col("df") <= MaxDf).select(col("s"))
    val sh2 = sh.join(keep, "s")
    val sizes = sh2.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh2.as("a")
      .join(sh2.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    val j = inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter")).cast("double")).as("j"))
    val sym = j.unionByName(
      j.select(col("db").as("da"), col("da").as("db"), col("j")))
    val best = sym
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
  val HashA: Seq[Long] = (0 until K).map(i => ((2654435761L * (2 * i + 1)) % (1L << 30)) | 1L)
  val HashB: Seq[Long] = (0 until K).map(i => (2246822519L * (2 * i + 2)) % (1L << 30))

  /** 32-bit shingle id from md5 — identical in Spark and DuckDB. */
  private val xSpark = "cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint) % 4294967296"
  private val xDuck = "CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % 4294967296"

  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir).selectExpr("doc_id", s"$xSpark as x")
    val mins = (0 until K).map(i =>
      min(expr(s"(${HashA(i)} * x + ${HashB(i)}) % $P")).as(s"m$i"))
    val mh = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val stackArgs = (0 until Bands).map { b =>
      val ms = (0 until RowsPerBand).map(r => s"m${b * RowsPerBand + r}")
      s"'b$b', concat_ws('_', ${ms.mkString(", ")})"
    }.mkString(", ")
    val bands = mh.selectExpr(
      "doc_id", s"stack($Bands, $stackArgs) as (band_id, band_key)")
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    val agree = (0 until K).map(i =>
      when(col(s"ma.m$i") === col(s"mb.m$i"), 1).otherwise(0)).reduce(_ + _)
    val est = cand
      .join(mh.as("ma"), col("da") === col("ma.doc_id"))
      .join(mh.as("mb"), col("db") === col("mb.doc_id"))
      .select(col("da"), col("db"), (agree.cast("double") / lit(K.toDouble)).as("est_j"))
    val sym = est.unionByName(
      est.select(col("db").as("da"), col("da").as("db"), col("est_j")))
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

  val dedupMinhashSql: String = {
    val minExprs = (0 until K)
      .map(i => s"MIN((${HashA(i)} * x + ${HashB(i)}) % $P) AS m$i").mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val ms = (0 until RowsPerBand).map(r => s"m${b * RowsPerBand + r}")
      s"SELECT doc_id, 'b$b' AS band_id, ${ms.map(m => s"CAST($m AS VARCHAR)").mkString(" || '_' || ")} AS band_key FROM mh"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until K)
      .map(i => s"CASE WHEN ma.m$i = mb.m$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH docs AS (
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
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |est AS (
       |  SELECT da, db, CAST($agree AS DOUBLE) / ${K.toDouble} AS est_j
       |  FROM cand JOIN mh ma ON da = ma.doc_id JOIN mh mb ON db = mb.doc_id),
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
  }

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

  // ------------------------------------------------- dedup_embedding
  /** Exact nearest neighbor per vector by dot product (embeddings are
    * ~unit-norm, so dot ≈ cosine). Elements are scaled to integers
    * (×10⁶, round) so the sum is EXACT and engine-independent; cosine
    * is recovered by one final division. Brute-force n² — the baseline;
    * the LSH-bucketed scale path is simLshTopk in Similarity.scala. */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * lit(1000000.0)).cast("long")).as("ev"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        aggregate(zip_with(col("a.ev"), col("b.ev"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("dot"))
    pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("va")).orderBy(col("dot").desc, col("vb"))))
      .where(col("rn") === 1)
      .select(col("va").as("vec_id"), col("vb").as("nn_id"), col("dot").as("dot_scaled"),
        (col("dot").cast("double") / lit(1e12)).as("cos_sim"))
  }

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
}
