package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.ParagraphDedup

/** Streaming twin of the paragraph-dedup lens: a stream of document
  * batches maintains a SEEN-PARAGRAPH table and emits each batch with
  * only its first-ever-seen paragraphs — the continuous form of
  * [[ParagraphDedup.dedupParagraphIncr]], and the shape a crawl
  * pipeline actually runs (docs arrive forever; the seen set is the
  * standing state).
  *
  * State and output both use [[SnapshotStream]]'s versioned-directory
  * discipline (`v=<batchId>`, `_SUCCESS`-gated reads, merge target =
  * latest version strictly below the batch id), so an at-least-once
  * batch feed yields exactly-once state maintenance: a replayed batch
  * re-reads the same predecessor seen-set and rewrites its own version
  * byte-identically.
  *
  * THE ORDER-FOLD IDENTITY (what the gate pins): if batches partition
  * the corpus into doc_id RANGES fed in order, the per-batch keeper
  * rule (first batch to see a paragraph wins; min (doc_id, chunk_id)
  * within the batch) composes to exactly the global min-(doc_id,
  * chunk_id) rule — so the UNION of cleaned batch outputs equals the
  * one-shot [[ParagraphDedup.dedupParagraph]] over the whole corpus,
  * for ANY range split. The gate runs the two-batch fold; its oracle
  * IS the one-shot `dedup_paragraph` SQL, so any drift between the
  * incremental kernel and the global rule breaks the hash.
  * StreamingSpec drives the same fold through a real checkpointed
  * `foreachBatch` query, chops it differently, replays a batch, and
  * pins the converged tables.
  *
  * Scale: each batch costs one anti-join of the batch's paragraphs
  * against the seen table (keyed by paragraph; at 100 TB the seen
  * table is bucketed on the chunk key so the probe co-locates) plus an
  * append of the batch's fresh paragraphs — batch-bounded work, and
  * the seen-set append (not rewrite) keeps state maintenance O(batch)
  * too.
  */
object ParagraphStream {

  /** foreachBatch sink: dedup `batch` against the seen-paragraph table
    * (versions under `$tableDir/seen`), write the cleaned batch to
    * `$tableDir/out/v=<batchId>`, and the updated seen set to
    * `$tableDir/seen/v=<batchId>`. */
  def paragraphSink(tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val seenDir = s"$tableDir/seen"
    val seen = SnapshotStream.versionsIn(s, seenDir).filter(_ < batchId).lastOption
      .map(v => s.read.parquet(s"$seenDir/v=$v"))
      .getOrElse(s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("chunk",
            org.apache.spark.sql.types.StringType)))))
    // ONE split + anti-join feeds both writes (processAgainst
    // localCheckpoints the shared frames — the two writes are separate
    // actions and would otherwise each re-run the batch scan)
    val (cleaned, keptChunks) = ParagraphDedup.processAgainst(batch, seen)
    cleaned.write.mode("overwrite").parquet(s"$tableDir/out/v=$batchId")
    // fresh paragraphs = the batch's kept occurrences; the union stays
    // distinct because kept chunks were anti-joined against `seen`
    seen.unionByName(keptChunks)
      .write.mode("overwrite").parquet(s"$seenDir/v=$batchId")
  }

  /** Cleaned output across all committed batches (reader view). */
  def cleanedOutput(s: SparkSession, tableDir: String): DataFrame = {
    val vs = SnapshotStream.versionsIn(s, s"$tableDir/out")
    require(vs.nonEmpty, s"no output versions under $tableDir/out")
    vs.map(v => s.read.parquet(s"$tableDir/out/v=$v")).reduce(_ unionByName _)
  }

  /** Gate: the two-batch range fold (see the order-fold identity in
    * the object scaladoc) — batch 1 = doc_id below the midpoint, batch
    * 2 = the rest, seen-set carried between them. Oracle = the ONE-SHOT
    * `dedup_paragraph` SQL. */
  def streamParagraph(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val Array(org.apache.spark.sql.Row(lo: Long, hi: Long)) =
      docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()
    val mid = lo + (hi - lo) / 2
    val b1 = docs.where(col("doc_id") <= mid)
    val b2 = docs.where(col("doc_id") > mid)
    val empty = b1.sparkSession.createDataFrame(
      b1.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("chunk",
          org.apache.spark.sql.types.StringType))))
    val (out1, seen1) = ParagraphDedup.processAgainst(b1, empty)
    val out2 = ParagraphDedup.paragraphDedupAgainst(b2, seen1)
    out1.unionByName(out2)
  }
}
