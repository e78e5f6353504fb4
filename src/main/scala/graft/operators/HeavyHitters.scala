package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.MisraGriesAgg

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
}
