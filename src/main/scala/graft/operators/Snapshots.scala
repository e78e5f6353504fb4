package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
