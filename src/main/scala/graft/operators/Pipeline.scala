package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Composed pipeline + remaining join-type coverage. */
object Pipeline {

  /** q39: FULL OUTER join — the one join type the per-query inventory
    * didn't yet gate-check. High-balance suppliers vs customers per
    * nation: at fixture scale several nations have suppliers but no
    * qualifying customers (and vice versa), so both null sides of the
    * full outer are exercised; COALESCE makes the output total and
    * deterministic. Plans as a shuffle full-outer SMJ on the nation
    * key — both sides are pre-aggregated to ≤ #nations rows, so at
    * 100 TB the join input is dimension-sized regardless of fact
    * volume. */
  def q39FullOuter(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir).where(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
    // tighter than the supplier cut so BOTH null sides occur at the
    // gate scale factor (nations with suppliers but no qualifying
    // customers, and vice versa)
    val cust = Tables.customer(s, dir).where(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey").as("nk2")).agg(count(lit(1)).as("n_cust"))
    sup.join(cust, col("nk") === col("nk2"), "full_outer")
      .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"))
  }

  val q39FullOuterSql: String =
    """SELECT COALESCE(s.nk, c.nk) AS nationkey,
      |       COALESCE(s.n_supp, 0) AS n_supp,
      |       COALESCE(c.n_cust, 0) AS n_cust
      |FROM (SELECT s_nationkey AS nk, CAST(COUNT(1) AS BIGINT) AS n_supp
      |      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s
      |FULL OUTER JOIN
      |     (SELECT c_nationkey AS nk, CAST(COUNT(1) AS BIGINT) AS n_cust
      |      FROM customer WHERE c_acctbal > 9900 GROUP BY 1) c
      |ON s.nk = c.nk""".stripMargin

  /** The training-data pipeline CAPSTONE: the stages every LLM corpus
    * pass runs, composed end to end on the engine's own operators —
    *  1. exact-dup collapse (keep the md5-canonical copy,
    *     [[Dedup.dedupExact]]),
    *  2. near-dup collapse (keep each LSH-connected-component's
    *     canonical doc, [[Dedup.dedupCc]]),
    *  3. quality floor ([[TextAnalysis.taQuality]] composite ≥ 0.5).
    * Output: the SURVIVING corpus with its quality stats — what you'd
    * actually feed a tokenizer. Each stage is the already-verified
    * operator, so the composition inherits their scale properties
    * (hash shuffle, capped LSH candidates, O(diameter) CC rounds); the
    * oracle composes the same three DuckDB subqueries. */
  def pipelineClean(s: SparkSession, dir: String): DataFrame = {
    val exactCanon = Dedup.dedupExact(s, dir)
      .where(col("is_dup") === 0).select(col("doc_id"))
    val ccCanon = Dedup.dedupCc(s, dir)
      .where(col("is_canonical") === 1).select(col("doc_id"))
    TextAnalysis.taQuality(s, dir)
      .select(col("doc_id"), col("n_chars"), col("quality_score"))
      .join(exactCanon, "doc_id")
      .join(ccCanon, "doc_id")
      .where(col("quality_score") >= 0.5)
  }

  val pipelineCleanSql: String =
    s"""SELECT q.doc_id, q.n_chars, q.quality_score
       |FROM (${TextAnalysis.taQualitySql}) q
       |JOIN (SELECT doc_id FROM (${Dedup.dedupExactSql}) WHERE is_dup = 0) ex
       |  ON q.doc_id = ex.doc_id
       |JOIN (SELECT doc_id FROM (${Dedup.dedupCcSql}) WHERE is_canonical = 1) cc
       |  ON q.doc_id = cc.doc_id
       |WHERE q.quality_score >= 0.5e0""".stripMargin
}
