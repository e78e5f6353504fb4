package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Snapshot maintenance — the missing half of the incremental family:
  * `dedup_incremental` / `dedup_minhash_incr` / `dedup_cc_incr` all
  * PROBE a maintained snapshot; this operator is how that snapshot is
  * MAINTAINED. Vanilla Spark has no MERGE INTO (that's a table-format
  * feature — Delta/Iceberg layer it over the same shuffle), so the
  * upsert is expressed as the relational core those formats execute:
  * one full-outer join on the key, updates winning per column, plus an
  * `op` audit column (insert/update/keep) — the row-level change
  * feed a pipeline logs.
  *
  * Scale: ONE shuffle of each side on the key (the join), no window,
  * no driver state; at 100 TB both sides are key-bucketed tables and
  * the join is co-located (graft.sources.Bucketing's shuffle-free SMJ
  * applies verbatim). Idempotent by construction — re-applying the
  * same batch changes nothing (spec-pinned) — which is what makes
  * replays after a failed write safe.
  */
object Snapshots {

  /** Generic upsert: every row of `updates` replaces the same-key row
    * of `target` (or inserts); target rows without an update survive
    * unchanged. Both frames must share the schema; `key` names the
    * merge key column.
    *
    * Contract, stated precisely:
    *   - `updates` must be key-UNIQUE. A batch with a duplicated key
    *     would fan out through the full-outer join (2 update rows × 1
    *     target row = 2 output rows) and then grow without bound on
    *     replay — so, like MERGE INTO's multiple-matches error, the
    *     plan RAISES at execution time on a duplicate (`raise_error`
    *     folded into the key projection; costs one aggregate exchange
    *     of the small batch side, nothing on the target).
    *   - NULL update columns KEEP the target's value (per-column
    *     COALESCE — last-known-good semantics). A pipeline that needs
    *     to write explicit NULLs or deletes models them as tombstone
    *     values, the way append-only table formats do.
    *   - the merge KEY must be non-NULL in `updates`. `ON t.key =
    *     u.key` can never match a NULL, so a NULL-keyed update could
    *     only ever insert — and would insert AGAIN on every replay
    *     (NULLs don't match their own earlier insert either), breaking
    *     the idempotence the sink contract relies on. The plan RAISES
    *     on a NULL key instead of silently dropping or duplicating. */
  def upsertOver(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = target.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"upsert sides must share a schema: ${cols.mkString(",")} vs ${updates.columns.mkString(",")}")
    // both guards are folded into the KEY COLUMN'S VALUE (raise_error
    // on the never-taken branch), not a filter over an assert_true
    // column: a filter depends on the optimizer never simplifying
    // IsNull over the NullType assert column and then pruning it, while
    // a projection the join key and output both consume cannot be
    // dropped. The NULL guard must run BEFORE the count join-back — a
    // null-rejecting equi-join would silently drop NULL-key rows on the
    // way to the duplicate check. Counts come from an aggregate +
    // join-back (the skew-safe keeper idiom), not a window over the key.
    val uKeyed = updates.withColumn(key, expr(
      s"if($key is not null, $key, " +
        s"raise_error('upsert updates batch has a NULL $key'))"))
    val counts = uKeyed.groupBy(col(key)).agg(count(lit(1)).as("_k_n"))
    val uChecked = uKeyed.join(counts, key)
      .withColumn(key, expr(
        s"if(_k_n = 1, $key, raise_error(concat(" +
          s"'upsert updates batch has a duplicate $key: ', cast($key as string))))"))
      .drop("_k_n")
    val t = target.as("t")
    val u = uChecked.as("u")
    val joined = t.join(u, col(s"t.$key") === col(s"u.$key"), "full_outer")
    val merged = cols.map {
      case `key` => coalesce(col(s"u.$key"), col(s"t.$key")).as(key)
      case c     => coalesce(col(s"u.$c"), col(s"t.$c")).as(c)
    }
    val op = when(col(s"u.$key").isNotNull && col(s"t.$key").isNotNull, lit("update"))
      .when(col(s"u.$key").isNotNull, lit("insert"))
      .otherwise(lit("keep")).as("op")
    joined.select(merged :+ op: _*)
  }

  /** Gate: re-crawl simulation over the documents snapshot — target is
    * doc_id ≢ 0 (mod 3), the re-crawl batch is doc_id ≡ 0 (mod 5) with
    * re-extracted (uppercased) text. Batch rows overlapping the
    * snapshot surface as `update`, new ids as `insert`, untouched
    * snapshot rows as `keep`. */
  def snapshotUpsert(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val target = docs.where(col("doc_id") % 3 =!= 0)
    val updates = docs.where(col("doc_id") % 5 === 0)
      .withColumn("text", upper(col("text")))
    upsertOver(target, updates, "doc_id")
  }

  /** Full-outer twin with the same per-column update-wins COALESCE and
    * op classification. */
  val snapshotUpsertSql: String =
    s"""WITH t AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
       |u AS (SELECT doc_id, upper(text) AS text, lang, source, n_chars
       |      FROM documents WHERE doc_id % 5 = 0)
       |SELECT COALESCE(u.doc_id, t.doc_id) AS doc_id,
       |       COALESCE(u.text, t.text) AS text,
       |       COALESCE(u.lang, t.lang) AS lang,
       |       COALESCE(u.source, t.source) AS source,
       |       COALESCE(u.n_chars, t.n_chars) AS n_chars,
       |       CASE WHEN u.doc_id IS NOT NULL AND t.doc_id IS NOT NULL THEN 'update'
       |            WHEN u.doc_id IS NOT NULL THEN 'insert'
       |            ELSE 'keep' END AS op
       |FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id""".stripMargin

  // ------------------------------------------------- snapshot_diff
  /** Change-data-capture by version diff — `table_changes(v_old,
    * v_new)` computed from the two materialized versions themselves,
    * the way Delta/Iceberg derive a change feed for tables written
    * without CDC logging. One full-outer join on the key classifies
    * every key as insert / delete / update / keep; keep rows (the
    * overwhelming majority of a 100-TB snapshot between adjacent
    * versions) are dropped IMMEDIATELY after the join, before any
    * further exchange, so downstream consumers see only O(changes).
    *
    * Output per changed key: the key, `op`, the NEW row values
    * (deletes carry the last-known OLD values — what a downstream
    * index needs to retract), and `changed_cols` — the
    * comma-joined, schema-ordered list of columns whose value
    * actually differs (empty for insert/delete), using null-safe
    * comparison so NULL→value and value→NULL both count as changes.
    *
    * Scale: the join is the whole cost — with both versions bucketed
    * on the key ([[graft.sources.Bucketing]]) it is a co-located
    * sort-merge with ZERO shuffle; no window, no driver state. */
  def diffOver(oldV: DataFrame, newV: DataFrame, key: String): DataFrame = {
    val cols = oldV.columns.toSeq
    require(newV.columns.toSeq == cols,
      s"diff sides must share a schema: ${cols.mkString(",")} vs ${newV.columns.mkString(",")}")
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
    val changed = when(op === "update",
      concat_ws(",", valueCols.map(c =>
        when(!(col(s"o.$c") <=> col(s"n.$c")), lit(c))): _*))
      .otherwise(lit(""))
    val values = cols.map {
      case `key` => coalesce(col(s"n.$key"), col(s"o.$key")).as(key)
      case c     => when(op === "delete", col(s"o.$c"))
                      .otherwise(col(s"n.$c")).as(c)
    }
    joined.select((values :+ op.as("op")) :+ changed.as("changed_cols"): _*)
      .where(col("op") =!= "keep")
  }

  /** Gate: the change feed between the upsert gate's snapshot states,
    * plus a delete — old is the base snapshot (doc_id ≢ 0 mod 3), new
    * is the re-crawl applied ([[snapshotUpsert]]'s merge) with
    * doc_id ≡ 1 (mod 7) subsequently dropped. The diff must recover
    * exactly the upsert's insert/update rows (with `changed_cols` =
    * "text" on updates, since the re-crawl only re-extracts text)
    * and surface the dropped ids as deletes carrying old values. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val old = docs.where(col("doc_id") % 3 =!= 0)
    val merged = upsertOver(old,
        docs.where(col("doc_id") % 5 === 0).withColumn("text", upper(col("text"))),
        "doc_id")
      .drop("op")
    val newV = merged.where(col("doc_id") % 7 =!= 1)
    diffOver(old, newV, "doc_id")
  }

  /** Same classification via FULL OUTER + IS DISTINCT FROM. */
  val snapshotDiffSql: String =
    s"""WITH t AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
       |u AS (SELECT doc_id, upper(text) AS text, lang, source, n_chars
       |      FROM documents WHERE doc_id % 5 = 0),
       |m AS (SELECT COALESCE(u.doc_id, t.doc_id) AS doc_id,
       |             COALESCE(u.text, t.text) AS text,
       |             COALESCE(u.lang, t.lang) AS lang,
       |             COALESCE(u.source, t.source) AS source,
       |             COALESCE(u.n_chars, t.n_chars) AS n_chars
       |      FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id),
       |n AS (SELECT * FROM m WHERE doc_id % 7 <> 1),
       |d AS (SELECT
       |  COALESCE(n.doc_id, t.doc_id) AS doc_id,
       |  CASE WHEN t.doc_id IS NULL THEN 'insert'
       |       WHEN n.doc_id IS NULL THEN 'delete'
       |       WHEN t.text IS DISTINCT FROM n.text
       |         OR t.lang IS DISTINCT FROM n.lang
       |         OR t.source IS DISTINCT FROM n.source
       |         OR t.n_chars IS DISTINCT FROM n.n_chars THEN 'update'
       |       ELSE 'keep' END AS op,
       |  CASE WHEN n.doc_id IS NULL THEN t.text ELSE n.text END AS text,
       |  CASE WHEN n.doc_id IS NULL THEN t.lang ELSE n.lang END AS lang,
       |  CASE WHEN n.doc_id IS NULL THEN t.source ELSE n.source END AS source,
       |  CASE WHEN n.doc_id IS NULL THEN t.n_chars ELSE n.n_chars END AS n_chars,
       |  concat_ws(',',
       |    CASE WHEN t.text IS DISTINCT FROM n.text THEN 'text' END,
       |    CASE WHEN t.lang IS DISTINCT FROM n.lang THEN 'lang' END,
       |    CASE WHEN t.source IS DISTINCT FROM n.source THEN 'source' END,
       |    CASE WHEN t.n_chars IS DISTINCT FROM n.n_chars THEN 'n_chars' END
       |  ) AS chg
       |  FROM t FULL OUTER JOIN n ON t.doc_id = n.doc_id)
       |SELECT doc_id, text, lang, source, n_chars, op,
       |       CASE WHEN op = 'update' THEN chg ELSE '' END AS changed_cols
       |FROM d WHERE op <> 'keep'""".stripMargin

  // ---------------------------------------------- snapshot_apply
  /** CDC APPLY — the consumer side of [[snapshotDiff]]'s change feed,
    * and its algebraic inverse: `apply(v_old, diff(v_old, v_new)) ==
    * v_new` exactly. A replica site holding v_old folds the change
    * rows in with ONE key anti-join (drop deleted + updated keys) and
    * one union (insert + update rows carry their new values) — O(table
    * + changes), co-locatable when both sides are key-bucketed, and
    * the identity means replicas never drift from the publisher. */
  def applyChanges(target: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val touched = changes.where(col("op").isin("delete", "update"))
      .select(col(key))
    val adds = changes.where(col("op").isin("insert", "update"))
      .drop("op", "changed_cols")
    target.join(touched, Seq(key), "left_anti").unionByName(adds)
  }

  /** Gate: v_old + [[snapshotDiff]]'s own feed; the oracle constructs
    * v_new DIRECTLY (the diff CTEs minus the classification) — the
    * round-trip identity. */
  def snapshotApply(s: SparkSession, dir: String): DataFrame = {
    val old = Tables.documents(s, dir).where(col("doc_id") % 3 =!= 0)
    applyChanges(old, snapshotDiff(s, dir), "doc_id")
  }

  val snapshotApplySql: String =
    """WITH t AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
      |u AS (SELECT doc_id, upper(text) AS text, lang, source, n_chars
      |      FROM documents WHERE doc_id % 5 = 0),
      |m AS (SELECT COALESCE(u.doc_id, t.doc_id) AS doc_id,
      |             COALESCE(u.text, t.text) AS text,
      |             COALESCE(u.lang, t.lang) AS lang,
      |             COALESCE(u.source, t.source) AS source,
      |             COALESCE(u.n_chars, t.n_chars) AS n_chars
      |      FROM t FULL OUTER JOIN u ON t.doc_id = u.doc_id)
      |SELECT doc_id, text, lang, source, n_chars
      |FROM m WHERE doc_id % 7 <> 1""".stripMargin

  // ---------------------------------------------- snapshot_history
  /** Sentinel `valid_to` for the open (current) row version — keeps
    * the history table null-free so AS-OF filters are plain integer
    * range predicates. */
  val OpenVersion = 9999L

  /** SCD-2 history build from an upsert LOG: given `(version, batch)`
    * entries (the base table is the version-0 "batch"; later batches
    * are [[upsertOver]] updates), produce one row per ROW VERSION
    * with its validity interval: `valid_from` = the version that
    * wrote it, `valid_to` = the next version that overwrote the key
    * ([[OpenVersion]] when still current). Reading AS OF v is then
    * `valid_from <= v < valid_to` — a plain filter, no fold — and
    * folding [[upsertOver]] through the log reproduces exactly the
    * AS-OF read at every v (the identity `snapshot_timetravel` pins).
    *
    * Scale: ONE union of the log batches and ONE window keyed on the
    * merge key. The window partition for a key holds at most
    * (log depth) rows — bounded by the number of VERSIONS, never by
    * corpus size or key skew — which is the case where a window is
    * the right tool and the aggregate+join-back idiom buys nothing. */
  def historyOver(log: Seq[(Long, DataFrame)], key: String): DataFrame = {
    require(log.nonEmpty, "history needs at least the base version")
    val cols = log.head._2.columns.toSeq
    val stamped = log.map { case (v, df) =>
      require(df.columns.toSeq == cols,
        s"all log batches must share a schema: ${cols.mkString(",")} vs ${df.columns.mkString(",")}")
      df.withColumn("valid_from", lit(v))
    }
    val h = stamped.reduce(_ union _)
    val w = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    h.withColumn("valid_to",
      coalesce(lead(col("valid_from"), 1).over(w), lit(OpenVersion)))
  }

  /** ONE incremental SCD-2 step — how the history table is MAINTAINED
    * (vs [[historyOver]], which rebuilds from the whole log): rows of
    * `hist` whose key arrives in `batch` and are still OPEN get their
    * interval closed at `v`; every batch row appends as the new open
    * row-version. Folding this step over the log reproduces
    * [[historyOver]] EXACTLY (the `stream_history` gate pins the
    * identity), and each step is one key join of the history against
    * the batch + an append — batch-bounded, no window at all (the
    * rebuild's lead() is replaced by the open-interval update).
    * Re-applying the same (batch, v) yields the same table
    * byte-for-byte: the close is idempotent (`valid_to` already `v`
    * matches nothing open) only when fed the PRE-step history, which
    * is what the versioned-directory sink discipline guarantees. */
  def historyStep(hist: DataFrame, batch: DataFrame, v: Long): DataFrame = {
    val cols = batch.columns.toSeq
    val keys = batch.select(col("doc_id")).withColumn("_hit", lit(1))
    val closed = hist.join(keys, Seq("doc_id"), "left")
      .withColumn("valid_to",
        when(col("_hit").isNotNull && col("valid_to") === OpenVersion, lit(v))
          .otherwise(col("valid_to")))
      .drop("_hit")
    val appended = batch
      .withColumn("valid_from", lit(v))
      .withColumn("valid_to", lit(OpenVersion))
    closed.unionByName(appended.select(closed.columns.map(col): _*))
  }

  /** The gate's three-version log: v0 = the base snapshot (doc_id ≢ 0
    * mod 3), v1 = the re-crawl (doc_id ≡ 0 mod 5, uppercased), v2 = a
    * second re-extraction (doc_id ≡ 0 mod 7, reversed text). */
  private def docLog(s: SparkSession, dir: String): Seq[(Long, DataFrame)] = {
    val docs = Tables.documents(s, dir)
    Seq(
      0L -> docs.where(col("doc_id") % 3 =!= 0),
      1L -> docs.where(col("doc_id") % 5 === 0)
        .withColumn("text", upper(col("text"))),
      2L -> docs.where(col("doc_id") % 7 === 0)
        .withColumn("text", reverse(col("text"))))
  }

  /** Gate: the full SCD-2 history table of the three-version log. */
  def snapshotHistory(s: SparkSession, dir: String): DataFrame =
    historyOver(docLog(s, dir), "doc_id")

  /** Gate: the [[historyStep]] FOLD over the same log — its oracle is
    * deliberately the REBUILD's SQL ([[snapshotHistorySql]]), pinning
    * the maintenance identity: incrementally closing and appending
    * intervals batch-by-batch equals rebuilding the history from the
    * whole log, for any split. StreamingSpec drives the same fold
    * through a checkpointed foreachBatch with a restart and a replay. */
  def streamHistory(s: SparkSession, dir: String): DataFrame = {
    val log = docLog(s, dir)
    val empty = log.head._2
      .withColumn("valid_from", lit(0L)).withColumn("valid_to", lit(0L))
      .where(lit(false))
    log.foldLeft(empty) { case (h, (v, b)) => historyStep(h, b, v) }
  }

  private val docLogSql: String =
    """v0 AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
      |v1 AS (SELECT doc_id, upper(text) AS text, lang, source, n_chars
      |       FROM documents WHERE doc_id % 5 = 0),
      |v2 AS (SELECT doc_id, reverse(text) AS text, lang, source, n_chars
      |       FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  val snapshotHistorySql: String =
    s"""WITH $docLogSql,
       |h AS (
       |  SELECT *, 0 AS valid_from FROM v0
       |  UNION ALL SELECT *, 1 FROM v1
       |  UNION ALL SELECT *, 2 FROM v2)
       |SELECT doc_id, text, lang, source, n_chars,
       |       CAST(valid_from AS BIGINT) AS valid_from,
       |       CAST(COALESCE(LEAD(valid_from) OVER (
       |         PARTITION BY doc_id ORDER BY valid_from), $OpenVersion) AS BIGINT)
       |         AS valid_to
       |FROM h""".stripMargin

  /** Gate: time travel — the AS-OF v=1 read of the history table.
    * Its oracle is NOT the history filter but the direct UPSERT FOLD
    * to v1 (base merged with the first re-crawl), so the gate pins
    * the load-bearing identity: filtering the SCD-2 intervals at v
    * reproduces exactly what sequentially applying the upsert log
    * through v would have built. Any interval bug — wrong lead
    * bound, half-open-range mistake, a lost overwrite — breaks the
    * hash against the fold. */
  def snapshotTimetravel(s: SparkSession, dir: String): DataFrame = {
    val v = 1L
    snapshotHistory(s, dir)
      .where(col("valid_from") <= v && col("valid_to") > v)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
  }

  /** The upsert fold to v1, verbatim from [[snapshotUpsertSql]]'s
    * merge shape — deliberately NOT the interval filter. */
  val snapshotTimetravelSql: String =
    s"""WITH $docLogSql
       |SELECT COALESCE(v1.doc_id, v0.doc_id) AS doc_id,
       |       COALESCE(v1.text, v0.text) AS text,
       |       COALESCE(v1.lang, v0.lang) AS lang,
       |       COALESCE(v1.source, v0.source) AS source,
       |       COALESCE(v1.n_chars, v0.n_chars) AS n_chars
       |FROM v0 FULL OUTER JOIN v1 ON v0.doc_id = v1.doc_id""".stripMargin

  // ---------------------------------------------- snapshot_restore
  /** RESTORE TO VERSION v — Delta/Iceberg's rollback command as its
    * relational core: make the AS-OF-v state current again WITHOUT
    * rewriting history (a restore is a new version whose content is an
    * old version — audits must still see what was briefly live).
    * Mechanics: diff the CURRENT state (open rows) against the target
    * state via [[Ivm.changeFeedOver]]; keys that changed since v (or
    * were inserted after v) get their open interval closed at `vNew`,
    * and the target's values for changed/removed-then-restored keys
    * append as new open row-versions. Untouched keys keep their open
    * row — a restore after no changes is a no-op, not a full rewrite.
    *
    * Scale: the diff is one key join of two states; the close is one
    * key join of the history against the TOUCHED keys only; the append
    * is change-bounded. Nothing rewrites rows whose key did not move
    * since v — at 100 TB a rollback of yesterday's bad batch costs
    * O(batch), not O(table). */
  def restoreStep(hist: DataFrame, target: DataFrame, vNew: Long): DataFrame = {
    val cols = target.columns.toSeq
    val current = hist.where(col("valid_to") === OpenVersion)
      .select(cols.map(col): _*)
    val feed = Ivm.changeFeedOver(current, target, "doc_id")
    val toClose = feed.where(col("op").isin("update", "delete"))
      .select(col("doc_id")).withColumn("_hit", lit(1))
    val closed = hist.join(toClose, Seq("doc_id"), "left")
      .withColumn("valid_to",
        when(col("_hit").isNotNull && col("valid_to") === OpenVersion, lit(vNew))
          .otherwise(col("valid_to")))
      .drop("_hit")
    val appended = feed.where(col("op").isin("update", "insert"))
      .select(col("doc_id") +: cols.filterNot(_ == "doc_id")
        .map(c => col(s"n_$c").as(c)): _*)
      .withColumn("valid_from", lit(vNew))
      .withColumn("valid_to", lit(OpenVersion))
    closed.unionByName(appended.select(closed.columns.map(col): _*))
  }

  /** Gate: the three-version log's history after RESTORE TO v=1 as
    * version 3 — v2's re-extraction is rolled back, so v2-batch keys
    * that existed at v1 reopen with their v1 values, and keys v2
    * INSERTED (absent at v1) close without a successor. The oracle
    * rebuilds the same table relationally; SnapshotsSpec additionally
    * pins that the restored OPEN state equals the AS-OF-1 read and
    * that re-restoring is a no-op. */
  def snapshotRestore(s: SparkSession, dir: String): DataFrame = {
    val hist = snapshotHistory(s, dir)
    val target = snapshotTimetravel(s, dir) // the AS-OF v=1 state
    restoreStep(hist, target, vNew = 3L)
  }

  val snapshotRestoreSql: String =
    s"""WITH $docLogSql,
       |h AS (
       |  SELECT *, 0 AS valid_from FROM v0
       |  UNION ALL SELECT *, 1 FROM v1
       |  UNION ALL SELECT *, 2 FROM v2),
       |hist AS (
       |  SELECT doc_id, text, lang, source, n_chars,
       |         CAST(valid_from AS BIGINT) AS valid_from,
       |         CAST(COALESCE(LEAD(valid_from) OVER (
       |           PARTITION BY doc_id ORDER BY valid_from), $OpenVersion) AS BIGINT)
       |           AS valid_to
       |  FROM h),
       |tgt AS (
       |  SELECT COALESCE(v1.doc_id, v0.doc_id) AS doc_id,
       |         COALESCE(v1.text, v0.text) AS text,
       |         COALESCE(v1.lang, v0.lang) AS lang,
       |         COALESCE(v1.source, v0.source) AS source,
       |         COALESCE(v1.n_chars, v0.n_chars) AS n_chars
       |  FROM v0 FULL OUTER JOIN v1 ON v0.doc_id = v1.doc_id),
       |cur AS (
       |  SELECT doc_id, text, lang, source, n_chars FROM hist
       |  WHERE valid_to = $OpenVersion),
       |feed AS (
       |  SELECT COALESCE(tgt.doc_id, cur.doc_id) AS doc_id,
       |         CASE WHEN cur.doc_id IS NULL THEN 'insert'
       |              WHEN tgt.doc_id IS NULL THEN 'delete'
       |              WHEN cur.text IS DISTINCT FROM tgt.text
       |                OR cur.lang IS DISTINCT FROM tgt.lang
       |                OR cur.source IS DISTINCT FROM tgt.source
       |                OR cur.n_chars IS DISTINCT FROM tgt.n_chars THEN 'update'
       |              ELSE 'keep' END AS op,
       |         tgt.text AS n_text, tgt.lang AS n_lang,
       |         tgt.source AS n_source, tgt.n_chars AS n_n_chars
       |  FROM cur FULL OUTER JOIN tgt ON cur.doc_id = tgt.doc_id),
       |closed AS (
       |  SELECT hist.doc_id, text, lang, source, n_chars, valid_from,
       |         CASE WHEN valid_to = $OpenVersion AND hist.doc_id IN (
       |                SELECT doc_id FROM feed WHERE op IN ('update','delete'))
       |              THEN 3 ELSE valid_to END AS valid_to
       |  FROM hist),
       |appended AS (
       |  SELECT doc_id, n_text AS text, n_lang AS lang, n_source AS source,
       |         n_n_chars AS n_chars, CAST(3 AS BIGINT) AS valid_from,
       |         CAST($OpenVersion AS BIGINT) AS valid_to
       |  FROM feed WHERE op IN ('update','insert'))
       |SELECT * FROM closed UNION ALL SELECT * FROM appended""".stripMargin
}
