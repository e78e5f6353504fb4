package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** INCREMENTAL VIEW MAINTENANCE — the missing consumer of the
  * snapshot family's change feeds. [[Snapshots.diffOver]] derives WHAT
  * changed between two table versions; this module keeps a downstream
  * AGGREGATE (the materialized view every 100-TB pipeline hangs off
  * its corpus: per-(source, lang) doc counts and char budgets) fresh
  * from that feed WITHOUT re-aggregating the corpus — the classic
  * signed-delta formulation (insert ⇒ +new row, delete ⇒ −old row,
  * update ⇒ −old +new, summed per group and merged into the stored
  * view). Reference intent: the overwrite-idempotent sink contract
  * (`mr/worker.go:156,169`) generalized to derived tables — a
  * maintained output must equal what a from-scratch run would write.
  *
  * Scale: the whole maintenance cost is O(|changes|) — one
  * change-feed-sized aggregation (map-side combinable: the delta rows
  * partial-sum per group before any exchange) plus one view-keyed
  * join; the corpus is never touched. Recomputing the same view scans
  * every row of a 100-TB table; this path scans the day's CDC batch.
  * The gate's oracle IS the from-scratch recompute over the new
  * version, so the maintenance identity (delta-merge ≡ recompute) is
  * hash-checked end-to-end, including the hard cases: group MIGRATION
  * (an update moves a row between groups — both groups adjust) and
  * group DEATH (the last row of a group leaves — the view row must
  * vanish, not linger at zero).
  */
object Ivm {

  /** Change feed between two versions of a table, carrying BOTH old
    * and new values per changed key — what a view maintainer needs
    * (retract the old contribution, add the new one). Same
    * classification as [[Snapshots.diffOver]]; keep rows are dropped
    * immediately after the join so the feed is O(changes). */
  def changeFeedOver(oldV: DataFrame, newV: DataFrame, key: String): DataFrame = {
    val cols = oldV.columns.toSeq
    require(newV.columns.toSeq == cols,
      s"change-feed sides must share a schema: ${cols.mkString(",")} vs ${newV.columns.mkString(",")}")
    val valueCols = cols.filterNot(_ == key)
    val o = oldV.as("o")
    val n = newV.as("n")
    val joined = o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
    val anyChanged = valueCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    val op = when(col(s"o.$key").isNull, lit("insert"))
      .when(col(s"n.$key").isNull, lit("delete"))
      .when(anyChanged, lit("update"))
      .otherwise(lit("keep"))
    val outCols =
      coalesce(col(s"n.$key"), col(s"o.$key")).as(key) +:
        op.as("op") +:
        (valueCols.map(c => col(s"o.$c").as(s"o_$c")) ++
          valueCols.map(c => col(s"n.$c").as(s"n_$c")))
    joined.select(outCols: _*).where(col("op") =!= "keep")
  }

  /** Apply one change feed to the stored view. `view` has columns
    * (groupCols..., n_docs, sum_chars); `feed` is [[changeFeedOver]]
    * output over the documents schema. Returns the maintained view.
    *
    * Shape: the feed explodes into signed contributions (≤2 rows per
    * change), partial-sums per group (map-side combine — the only
    * aggregation, and it is feed-sized), then ONE full-outer join
    * against the view on the group key merges the deltas in. Groups
    * whose count reaches zero are dropped — matching what a recompute
    * would (not) produce. No window, no driver state, corpus never
    * read. */
  def applyFeed(view: DataFrame, feed: DataFrame): DataFrame = {
    val retr = feed.where(col("op").isin("update", "delete"))
      .select(col("o_source").as("source"), col("o_lang").as("lang"),
        col("o_n_chars").as("n_chars"), lit(-1L).as("w"))
    val ins = feed.where(col("op").isin("update", "insert"))
      .select(col("n_source").as("source"), col("n_lang").as("lang"),
        col("n_n_chars").as("n_chars"), lit(1L).as("w"))
    val delta = retr.union(ins)
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("w")).as("d_n"), sum(col("w") * col("n_chars")).as("d_chars"))
    val v = view.as("v")
    val d = delta.as("d")
    v.join(d, col("v.source") <=> col("d.source") &&
        col("v.lang") <=> col("d.lang"), "full_outer")
      .select(
        coalesce(col("v.source"), col("d.source")).as("source"),
        coalesce(col("v.lang"), col("d.lang")).as("lang"),
        (coalesce(col("v.n_docs"), lit(0L)) + coalesce(col("d.d_n"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("v.sum_chars"), lit(0L)) + coalesce(col("d.d_chars"), lit(0L)))
          .as("sum_chars"))
      .where(col("n_docs") > 0)
  }

  /** The view definition (what a recompute evaluates). */
  def viewOf(state: DataFrame): DataFrame =
    state.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

  // ------------------------------------------------------- gate states
  // v0: the base snapshot. v1: a re-crawl batch upserted (lang
  // migration on even ids — rows MOVE between groups — and re-extracted
  // lengths) with doc_id ≡ 1 (mod 7) then deleted. v2: a second batch
  // upserted with doc_id ≡ 2 (mod 13) then deleted.
  private def v0(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).where(col("doc_id") % 3 =!= 0)

  private def batch1(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).where(col("doc_id") % 5 === 0)
      .withColumn("lang",
        when(col("doc_id") % 2 === 0, lit("xx")).otherwise(col("lang")))
      .withColumn("n_chars", col("n_chars") + 7)

  private def batch2(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).where(col("doc_id") % 4 === 0)
      .withColumn("lang",
        when(col("doc_id") % 6 === 0, lit("yy")).otherwise(col("lang")))
      .withColumn("n_chars", col("n_chars") + 1)

  private[graft] def v1(s: SparkSession, dir: String): DataFrame =
    Snapshots.upsertOver(v0(s, dir), batch1(s, dir), "doc_id")
      .drop("op").where(col("doc_id") % 7 =!= 1)

  private[graft] def v2(s: SparkSession, dir: String): DataFrame =
    Snapshots.upsertOver(v1(s, dir), batch2(s, dir), "doc_id")
      .drop("op").where(col("doc_id") % 13 =!= 2)

  /** Gate: maintain v0's view to v1 through the change feed — never
    * re-aggregating v1 — and hash-check against the oracle's
    * from-scratch recompute over v1. */
  def ivmAgg(s: SparkSession, dir: String): DataFrame =
    applyFeed(viewOf(v0(s, dir)), changeFeedOver(v0(s, dir), v1(s, dir), "doc_id"))
      .select(col("source"), col("lang"), col("n_docs"), col("sum_chars"))

  /** Gate: FOLD two maintenance steps (v0→v1, v1→v2) — the oracle is
    * the recompute at v2, pinning that maintenance composes: applying
    * feeds in sequence equals rebuilding from the latest version, for
    * any batch boundaries. StreamingSpec drives the same fold through
    * a checkpointed foreachBatch with a restart. */
  def ivmFold(s: SparkSession, dir: String): DataFrame = {
    val afterV1 =
      applyFeed(viewOf(v0(s, dir)), changeFeedOver(v0(s, dir), v1(s, dir), "doc_id"))
    applyFeed(afterV1, changeFeedOver(v1(s, dir), v2(s, dir), "doc_id"))
      .select(col("source"), col("lang"), col("n_docs"), col("sum_chars"))
  }

  /** An empty view with the right schema — the bootstrap state: a view
    * maintained from nothing via an all-insert feed equals the
    * recompute, so a NEW view can be backfilled by replaying the log
    * with the same code that keeps it fresh. */
  def emptyView(like: DataFrame): DataFrame =
    viewOf(like).where(lit(false))

  /** Gate: the full stream-maintenance story as a batch fold —
    * BOOTSTRAP the view from empty (the ∅→v0 feed is all inserts),
    * then maintain through v1 and v2. Oracle = recompute at v2
    * ([[ivmFoldSql]]'s shape): one code path serves backfill and
    * keep-fresh. StreamingSpec drives the same fold through a
    * checkpointed foreachBatch with a restart and a replay. */
  def streamIvm(s: SparkSession, dir: String): DataFrame = {
    val base = v0(s, dir)
    val feeds = Seq(
      changeFeedOver(base.where(lit(false)), base, "doc_id"),
      changeFeedOver(base, v1(s, dir), "doc_id"),
      changeFeedOver(v1(s, dir), v2(s, dir), "doc_id"))
    feeds.foldLeft(emptyView(base))(applyFeed)
      .select(col("source"), col("lang"), col("n_docs"), col("sum_chars"))
  }

  // ------------------------------------------------------ oracle SQL
  // The oracles recompute the view from the VERSION STATE built by the
  // same upsert-then-delete algebra (COALESCE merge = update wins),
  // deliberately never touching the delta path: hash equality IS the
  // maintenance identity.
  private val statesSql: String =
    """v0 AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
      |b1 AS (SELECT doc_id, text,
      |              CASE WHEN doc_id % 2 = 0 THEN 'xx' ELSE lang END AS lang,
      |              source, n_chars + 7 AS n_chars
      |       FROM documents WHERE doc_id % 5 = 0),
      |m1 AS (SELECT COALESCE(b1.doc_id, v0.doc_id) AS doc_id,
      |              COALESCE(b1.text, v0.text) AS text,
      |              COALESCE(b1.lang, v0.lang) AS lang,
      |              COALESCE(b1.source, v0.source) AS source,
      |              COALESCE(b1.n_chars, v0.n_chars) AS n_chars
      |       FROM v0 FULL OUTER JOIN b1 ON v0.doc_id = b1.doc_id),
      |v1 AS (SELECT * FROM m1 WHERE doc_id % 7 <> 1),
      |b2 AS (SELECT doc_id, text,
      |              CASE WHEN doc_id % 6 = 0 THEN 'yy' ELSE lang END AS lang,
      |              source, n_chars + 1 AS n_chars
      |       FROM documents WHERE doc_id % 4 = 0),
      |m2 AS (SELECT COALESCE(b2.doc_id, v1.doc_id) AS doc_id,
      |              COALESCE(b2.text, v1.text) AS text,
      |              COALESCE(b2.lang, v1.lang) AS lang,
      |              COALESCE(b2.source, v1.source) AS source,
      |              COALESCE(b2.n_chars, v1.n_chars) AS n_chars
      |       FROM v1 FULL OUTER JOIN b2 ON v1.doc_id = b2.doc_id),
      |v2 AS (SELECT * FROM m2 WHERE doc_id % 13 <> 2)""".stripMargin

  val ivmAggSql: String =
    s"""WITH $statesSql
       |SELECT source, lang, CAST(COUNT(1) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM v1 GROUP BY source, lang""".stripMargin

  val ivmFoldSql: String =
    s"""WITH $statesSql
       |SELECT source, lang, CAST(COUNT(1) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM v2 GROUP BY source, lang""".stripMargin
}
