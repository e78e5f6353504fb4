package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.Tables
import graft.operators.Snapshots

/** Streaming twin of the snapshot-maintenance family: a stream of
  * re-crawled documents maintains an on-disk snapshot table through
  * [[Snapshots.upsertOver]] inside `foreachBatch` — the continuous
  * version of the batch `snapshot_upsert` gate, and the writer side of
  * everything the incremental dedups (`dedup_incremental`,
  * `dedup_minhash_incr`, `dedup_cc_incr`) probe.
  *
  * Durability model — versioned snapshot directories:
  * each micro-batch writes the post-upsert table to `v=<batchId>`,
  * reading the latest version strictly BELOW its own id as the merge
  * target. Micro-batch ids from a checkpointed query are strictly
  * increasing across restarts, so this gives exactly-once table
  * maintenance over an at-least-once batch feed for free:
  *  - a batch replayed after a crash mid-write re-reads the same
  *    predecessor version (its own half-written `v=N` is ignored — N is
  *    not < N — and then overwritten whole);
  *  - a batch replayed after a complete write but lost checkpoint
  *    commit recomputes byte-identical output over the same inputs.
  * This is the same recipe as [[EventStreams.idempotentParquetSink]]
  * (deterministic path per batch + overwrite), upgraded from append
  * tables to read-modify-write tables; it is also the transactional
  * core of how Delta/Iceberg maintain tables (monotone versions,
  * readers pin one, old ones are GC'd by retention). READERS are
  * protected separately: only versions carrying Spark's `_SUCCESS`
  * commit marker are visible (see [[versionsIn]]) — the replay
  * argument above makes writes converge, the marker keeps a torn
  * in-progress version from ever being read or merged against.
  *
  * Scale: each version rewrite costs one key-shuffle of target+batch
  * (the upsert's full-outer join) plus a table write. At 100 TB the
  * target is key-bucketed and the rewrite is restricted to touched
  * buckets — [[graft.sources.ZMaintain.upsertZBucketed]] is exactly
  * that composition; this sink contributes the versioning/replay
  * discipline, ZMaintain the bucket-localized I/O.
  */
object SnapshotStream {

  /** Versions with a COMMIT MARKER only: a version dir is visible iff
    * Spark's job-level `_SUCCESS` file exists in it. Without the
    * filter, a reader racing a crash-mid-write sees the half-written
    * `v=N` as newest and silently reads a torn table (the committed
    * subset of part files — rows missing, no error); the writer-side
    * replay safety below never protected readers. This is the same
    * reader gate table formats implement with a commit record; it also
    * keeps the SINK honest — a torn predecessor is skipped as a merge
    * target too. (If `mapreduce.fileoutputcommitter.marksuccessfuljobs`
    * is disabled, every version is invisible and [[currentSnapshot]]
    * fails loudly rather than tearing — re-enable the marker.) */
  private[graft] def versionsIn(s: SparkSession, tableDir: String): Seq[Long] = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("v=") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.drop(2).toLong)
      .sorted
  }

  /** The foreachBatch sink: merge `batch` into the latest snapshot
    * version below `batchId` (or `init` when none exists yet) and write
    * the result as `v=<batchId>`. Safe to re-invoke with the same
    * (batch, batchId) — see the object scaladoc's replay argument. */
  def versionedUpsertSink(tableDir: String, key: String, init: DataFrame)(
      batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val target = versionsIn(s, tableDir).filter(_ < batchId).lastOption
      .map(v => s.read.parquet(s"$tableDir/v=$v"))
      .getOrElse(init)
    Snapshots.upsertOver(target, batch, key).drop("op")
      .write.mode("overwrite").parquet(s"$tableDir/v=$batchId")
  }

  /** Read the table as of its newest version (what a reader pins). */
  def currentSnapshot(s: SparkSession, tableDir: String): DataFrame = {
    val vs = versionsIn(s, tableDir)
    require(vs.nonEmpty, s"no snapshot versions under $tableDir")
    s.read.parquet(s"$tableDir/v=${vs.last}")
  }

  // ------------------------- batch twin (driver oracle gate) ---------

  /** Gate: the two-batch re-crawl fold the streaming sink applies,
    * expressed as the equivalent batch composition — upsert batch 1
    * (doc_id ≡ 0 mod 5, re-extracted/uppercased), then batch 2
    * (doc_id ≡ 0 mod 7, a tagged second re-crawl with 5 extra chars)
    * into the doc_id ≢ 0 (mod 3) snapshot. Last-write-wins per key
    * (docs in both batches end at batch 2's value); the final `op`
    * column audits batch 2's effect against the post-batch-1 state.
    * StreamingSpec drives the SAME fold through the checkpointed
    * `foreachBatch` sink, chops it differently, replays a batch, and
    * pins that the converged on-disk table equals this frame. */
  def streamUpsert(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val target = docs.where(col("doc_id") % 3 =!= 0)
    val b1 = docs.where(col("doc_id") % 5 === 0)
      .withColumn("text", upper(col("text")))
    val b2 = docs.where(col("doc_id") % 7 === 0)
      .withColumn("text", concat(lit("<r2> "), col("text")))
      .withColumn("n_chars", col("n_chars") + lit(5L))
    val after1 = Snapshots.upsertOver(target, b1, "doc_id").drop("op")
    Snapshots.upsertOver(after1, b2, "doc_id")
  }

  /** Nested full-outer twin: the same two merge rounds as SQL CTEs,
    * per-column update-wins COALESCE at each round. */
  val streamUpsertSql: String =
    """WITH t0 AS (SELECT doc_id, text, lang, source, n_chars
      |            FROM documents WHERE doc_id % 3 <> 0),
      |u1 AS (SELECT doc_id, upper(text) AS text, lang, source, n_chars
      |       FROM documents WHERE doc_id % 5 = 0),
      |t1 AS (SELECT COALESCE(u.doc_id, t.doc_id) AS doc_id,
      |              COALESCE(u.text, t.text) AS text,
      |              COALESCE(u.lang, t.lang) AS lang,
      |              COALESCE(u.source, t.source) AS source,
      |              COALESCE(u.n_chars, t.n_chars) AS n_chars
      |       FROM t0 t FULL OUTER JOIN u1 u ON t.doc_id = u.doc_id),
      |u2 AS (SELECT doc_id, concat('<r2> ', text) AS text, lang, source,
      |              n_chars + 5 AS n_chars
      |       FROM documents WHERE doc_id % 7 = 0)
      |SELECT COALESCE(u.doc_id, t.doc_id) AS doc_id,
      |       COALESCE(u.text, t.text) AS text,
      |       COALESCE(u.lang, t.lang) AS lang,
      |       COALESCE(u.source, t.source) AS source,
      |       COALESCE(u.n_chars, t.n_chars) AS n_chars,
      |       CASE WHEN u.doc_id IS NOT NULL AND t.doc_id IS NOT NULL THEN 'update'
      |            WHEN u.doc_id IS NOT NULL THEN 'insert'
      |            ELSE 'keep' END AS op
      |FROM t1 t FULL OUTER JOIN u2 u ON t.doc_id = u.doc_id""".stripMargin

  /** Version retention — the VACUUM for the versioned-state sinks: a
    * long-running stream accumulates one snapshot directory per batch;
    * this keeps the newest `keep` COMMITTED versions and deletes the
    * rest, plus any TORN version (no `_SUCCESS`) older than the newest
    * committed one (a torn dir newer than every committed version may
    * be a write in progress and is left alone). Readers are unaffected
    * by construction: they resolve through [[versionsIn]], which only
    * ever serves committed versions, and the newest `keep` survive.
    * Returns the deleted version ids (committed ones only).
    *
    * Replay caveat, stated loudly: a batch replay REREADS the latest
    * version strictly below its own id — vacuum must therefore keep at
    * least as many versions as the stream's maximum replay depth
    * (`keep` ≥ 2 covers the restart-last-batch case the specs pin). */
  def vacuum(s: SparkSession, tableDir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least the current version")
    val root = new Path(tableDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val committed = versionsIn(s, tableDir)
    val dropCommitted = committed.dropRight(keep)
    val newestCommitted = committed.lastOption.getOrElse(Long.MinValue)
    val tornOld = fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("v=") &&
        !fs.exists(new Path(p, "_SUCCESS")) &&
        p.getName.drop(2).toLong < newestCommitted)
    dropCommitted.foreach(v => fs.delete(new Path(root, s"v=$v"), true))
    tornOld.foreach(p => fs.delete(p, true))
    dropCommitted
  }
}
