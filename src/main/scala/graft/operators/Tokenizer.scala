package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Tokenizer-dictionary operators: the vocabulary-build / corpus-encode
  * pair every LLM training pipeline runs between cleaning and packing
  * (the fixed-vocab analog of BPE training + encoding; the reference's
  * wc app — `mrapps/wc.go` — is the count half of the build step).
  *
  *  - vocabBuild:  global token counts → the top-[[VocabSize]] terms,
  *    ids assigned by rank (count desc, term asc). Id 0 is reserved for
  *    out-of-vocabulary terms.
  *  - vocabEncode: every document re-expressed as (doc_id, pos,
  *    token_id) rows — the integer stream a tokenizer hands to
  *    [[Cleaning.taPackChunks]]-style sequence packing.
  *
  * 100 TB shape: the build is one groupBy(term) with map-side partial
  * aggregation (shuffle volume = partitions × vocabulary, not corpus
  * size) and the top-V is a TakeOrdered over per-partition tops — no
  * global sort; the V-row id assignment is the only single-task window
  * and it runs on V rows. The encode never shuffles the corpus at all:
  * the dictionary broadcasts and the join is map-side.
  */
object Tokenizer {

  /** Kept vocabulary entries; ids 1..V, 0 = OOV. */
  val VocabSize = 24

  /** Non-empty normalized tokens (shared convention with [[CorpusOps]]). */
  private def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(TextAnalysis.normalized(col("text")), " ")).as("term"))
      .where(col("term") =!= "")

  /** Top-[[VocabSize]] vocabulary with rank-assigned ids.
    *
    * The limit runs BEFORE the id window: orderBy+limit plans as
    * TakeOrderedAndProject (each partition ships only its top V), and
    * the unpartitioned row_number — the classic single-task trap on a
    * corpus-sized input — sees exactly V rows. */
  def vocabBuild(s: SparkSession, dir: String): DataFrame =
    tokens(s, dir)
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(VocabSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("cnt").desc, col("term"))).cast("int"))
      .select(col("token_id"), col("term"), col("cnt"))

  val vocabBuildSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ')) AS term
       |  FROM documents),
       |cnts AS (SELECT term, COUNT(1) AS cnt FROM toks WHERE term <> '' GROUP BY term),
       |r AS (
       |  SELECT term, cnt,
       |         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS INT) AS token_id
       |  FROM cnts)
       |SELECT token_id, term, cnt FROM r WHERE token_id <= $VocabSize""".stripMargin

  /** Corpus encoded against the built dictionary: one row per token
    * occurrence, position-preserving, OOV → id 0. The dictionary side
    * is V rows — broadcast, so the corpus stream is encoded map-side
    * with zero shuffle (the plan must show BroadcastHashJoin; a shuffle
    * here would move the whole corpus to re-key it by term). */
  def vocabEncode(s: SparkSession, dir: String): DataFrame = {
    val dict = vocabBuild(s, dir).select(col("term"), col("token_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(split(TextAnalysis.normalized(col("text")), " ")).as(Seq("pos", "term")))
      .where(col("term") =!= "")
      .join(broadcast(dict), Seq("term"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(0)).cast("int").as("token_id"))
  }

  val vocabEncodeSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id,
       |         string_split(trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')), ' ') AS w
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, i - 1 AS pos, w[i] AS term
       |  FROM docs, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) t
       |  WHERE w[i] <> ''),
       |cnts AS (SELECT term, COUNT(1) AS cnt FROM (SELECT term FROM toks) GROUP BY term),
       |vocab AS (
       |  SELECT term, token_id FROM (
       |    SELECT term, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS INT) AS token_id
       |    FROM cnts)
       |  WHERE token_id <= $VocabSize)
       |SELECT t.doc_id, t.pos, CAST(COALESCE(v.token_id, 0) AS INT) AS token_id
       |FROM toks t LEFT JOIN vocab v ON t.term = v.term""".stripMargin
}
