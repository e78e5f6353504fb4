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

  // ---------------------------------------------------------- ivm_join
  /** JOIN-VIEW maintenance — the hard IVM case: the view aggregates a
    * FACT⋈DIM join (per-nation order counts and revenue, orders ⋈
    * customer), and the fact table changes. The delta rule for a join
    * view under single-side changes is Δ(R ⋈ S) = ΔR ⋈ S: each signed
    * fact contribution joins the DIMENSION (broadcast — dims are the
    * small side by construction) to find its group, then merges into
    * the view exactly like [[applyFeed]]. Cost: O(|changes|) fact rows
    * × one broadcast dim lookup — the 100-TB fact table is never
    * re-joined or re-aggregated. Money goes through DECIMAL(18,2) in
    * both engines (the cross-engine sum contract every revenue gate in
    * this repo uses) and back to DOUBLE at the output edge.
    *
    * Group migration is doubly indirect here: an update that re-points
    * o_custkey moves the order to ANOTHER NATION — the old nation
    * retracts, the new one gains — which the gate's batch exercises on
    * half its keys. */
  private def decP(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** The join view (what a recompute evaluates). Revenue stays DECIMAL
    * internally; callers cast at the output edge. */
  def joinViewOf(facts: DataFrame, customer: DataFrame): DataFrame =
    facts.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(decP(col("o_totalprice"))).as("revenue"))

  /** Apply an ORDERS change feed ([[changeFeedOver]] output) to the
    * stored join view. */
  def applyJoinFeed(view: DataFrame, feed: DataFrame, customer: DataFrame): DataFrame = {
    val retr = feed.where(col("op").isin("update", "delete"))
      .select(col("o_o_custkey").as("o_custkey"),
        decP(col("o_o_totalprice")).as("price"), lit(-1L).as("w"))
    val ins = feed.where(col("op").isin("update", "insert"))
      .select(col("n_o_custkey").as("o_custkey"),
        decP(col("n_o_totalprice")).as("price"), lit(1L).as("w"))
    val delta = retr.union(ins)
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      // signed price via negate-not-multiply: keeps the delta the same
      // DECIMAL(18,2)-summed type as the stored view's revenue
      .agg(sum(col("w")).as("d_n"),
        sum(when(col("w") > 0, col("price")).otherwise(-col("price")))
          .as("d_rev"))
    val v = view.as("v")
    val d = delta.as("d")
    v.join(d, col("v.nationkey") <=> col("d.nationkey"), "full_outer")
      .select(
        coalesce(col("v.nationkey"), col("d.nationkey")).as("nationkey"),
        (coalesce(col("v.n_orders"), lit(0L)) + coalesce(col("d.d_n"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("v.revenue"), decP(lit(0))) +
          coalesce(col("d.d_rev"), decP(lit(0)))).as("revenue"))
      .where(col("n_orders") > 0)
  }

  private[graft] def ordersV0(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).where(col("o_orderkey") % 3 =!= 0)

  /** Re-pricing batch; even keys also MIGRATE to another customer —
    * and thereby (usually) another nation. */
  private def ordersBatch(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).where(col("o_orderkey") % 5 === 0)
      .withColumn("o_custkey",
        when(col("o_orderkey") % 2 === 0, col("o_custkey") % 50 + 1)
          .otherwise(col("o_custkey")))
      .withColumn("o_totalprice", col("o_totalprice") + 10)

  private[graft] def ordersV1(s: SparkSession, dir: String): DataFrame =
    Snapshots.upsertOver(ordersV0(s, dir), ordersBatch(s, dir), "o_orderkey")
      .drop("op").where(col("o_orderkey") % 7 =!= 1)

  /** Gate: maintain the per-nation join view from v0 to v1 through the
    * orders change feed; oracle recomputes over v1. */
  def ivmJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val feed = changeFeedOver(ordersV0(s, dir), ordersV1(s, dir), "o_orderkey")
    applyJoinFeed(joinViewOf(ordersV0(s, dir), cust), feed, cust)
      .select(col("nationkey"), col("n_orders"),
        col("revenue").cast("double").as("revenue"))
  }

  val ivmJoinSql: String =
    """WITH v0 AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
      |b AS (SELECT o_orderkey,
      |             CASE WHEN o_orderkey % 2 = 0 THEN (o_custkey % 50) + 1
      |                  ELSE o_custkey END AS o_custkey,
      |             o_orderstatus, o_totalprice + 10 AS o_totalprice,
      |             o_orderdate, o_orderpriority
      |      FROM orders WHERE o_orderkey % 5 = 0),
      |m AS (SELECT COALESCE(b.o_orderkey, v0.o_orderkey) AS o_orderkey,
      |             COALESCE(b.o_custkey, v0.o_custkey) AS o_custkey,
      |             COALESCE(b.o_totalprice, v0.o_totalprice) AS o_totalprice
      |      FROM v0 FULL OUTER JOIN b ON v0.o_orderkey = b.o_orderkey),
      |v1 AS (SELECT * FROM m WHERE o_orderkey % 7 <> 1)
      |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |       CAST(COUNT(1) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM v1 JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

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

  // ----------------------------------------------------------- ivm_dim
  /** Join-view maintenance under DIMENSION changes — the direction
    * [[ivmJoin]] doesn't cover, and the one that naively forces a fact
    * rescan (a customer moving nations invalidates every one of their
    * orders' contributions). The classic IVM answer is a KEY-LEVEL
    * PRE-AGGREGATE on the fact side: `preagg(c_custkey) → (n, rev)` —
    * O(|dim|) state maintained by the fact feed for free — so a dim
    * change only REMAPS already-aggregated rows:
    * retract (old nation ← preagg(key)), add (new nation ← preagg(key)),
    * for exactly the customers whose nation changed (plus dim
    * deletes/inserts). Cost: |Δdim| join rows against the pre-aggregate
    * + one view merge — the fact table is never rescanned.
    *
    * The feed is RELEVANCE-FILTERED first: an update that doesn't move
    * the view's group-by column (an address change) contributes nothing
    * and is dropped before the join. Updates that do move: the same
    * signed retract/add algebra as [[applyJoinFeed]], DECIMAL money
    * discipline throughout. */
  def applyDimFeed(view: DataFrame, feed: DataFrame, preagg: DataFrame): DataFrame = {
    val relevant = feed.where(col("op") === "delete" || col("op") === "insert" ||
      !(col("o_c_nationkey") <=> col("n_c_nationkey")))
    val retr = relevant.where(col("op").isin("update", "delete"))
      .select(col("c_custkey"), col("o_c_nationkey").as("nationkey"), lit(-1L).as("w"))
    val ins = relevant.where(col("op").isin("update", "insert"))
      .select(col("c_custkey"), col("n_c_nationkey").as("nationkey"), lit(1L).as("w"))
    val delta = retr.union(ins)
      .join(preagg, Seq("c_custkey")) // inner: a dim key with no facts is a no-op
      .groupBy(col("nationkey").cast("long").as("nationkey"))
      .agg(sum(col("w") * col("pn")).as("d_n"),
        sum(when(col("w") > 0, col("prev")).otherwise(-col("prev"))).as("d_rev"))
    val v = view.as("v")
    val d = delta.as("d")
    v.join(d, col("v.nationkey") <=> col("d.nationkey"), "full_outer")
      .select(
        coalesce(col("v.nationkey"), col("d.nationkey")).as("nationkey"),
        (coalesce(col("v.n_orders"), lit(0L)) + coalesce(col("d.d_n"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("v.revenue"), decP(lit(0))) +
          coalesce(col("d.d_rev"), decP(lit(0)))).as("revenue"))
      .where(col("n_orders") > 0)
  }

  /** The fact-side pre-aggregate (per dim key): maintained by the fact
    * change feed in a real pipeline; built in-process here as the
    * stored-state stand-in. */
  private def custPreagg(facts: DataFrame): DataFrame =
    facts.groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("pn"), sum(decP(col("o_totalprice"))).as("prev"))

  /** Nation migration on every 4th customer; every 9th ≡ 2 customer
    * churns (delete) — their orders drop out of the view entirely. */
  private def custBatch(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).where(col("c_custkey") % 4 === 0)
      .withColumn("c_nationkey", ((col("c_nationkey") + 7) % 25).cast("int"))

  private[graft] def custV1(s: SparkSession, dir: String): DataFrame =
    Snapshots.upsertOver(Tables.customer(s, dir), custBatch(s, dir), "c_custkey")
      .drop("op").where(col("c_custkey") % 9 =!= 2)

  /** Gate: maintain the per-nation join view under the customer-dim
    * change from v0 to v1; oracle recomputes the join over v1. */
  def ivmDim(s: SparkSession, dir: String): DataFrame = {
    val facts = Tables.orders(s, dir)
    val cust0 = Tables.customer(s, dir)
    val feed = changeFeedOver(cust0, custV1(s, dir), "c_custkey")
    applyDimFeed(joinViewOf(facts, cust0), feed, custPreagg(facts))
      .select(col("nationkey"), col("n_orders"),
        col("revenue").cast("double").as("revenue"))
  }

  val ivmDimSql: String =
    """WITH b AS (SELECT c_custkey, c_name,
      |                  CAST((c_nationkey + 7) % 25 AS INT) AS c_nationkey,
      |                  c_acctbal, c_mktsegment
      |           FROM customer WHERE c_custkey % 4 = 0),
      |m AS (SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
      |             COALESCE(b.c_nationkey, c.c_nationkey) AS c_nationkey
      |      FROM customer c FULL OUTER JOIN b ON c.c_custkey = b.c_custkey),
      |c1 AS (SELECT * FROM m WHERE c_custkey % 9 <> 2)
      |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |       CAST(COUNT(1) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN c1 ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin
}
