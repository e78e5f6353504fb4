package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.CorpusOps

/** Streaming maintenance of the FIRST-OCCURRENCE gram table — the
  * state behind incremental novelty scoring: "which 3-grams has this
  * corpus ever seen, and where first?" kept fresh per ingest batch, so
  * an arriving document scores against ALL history without a corpus
  * rescan ([[CorpusOps.taNovelty]]'s signal as standing state).
  *
  * The state is (g → min doc_id). MIN is associative, commutative AND
  * idempotent, so — like the HLL registers and unlike the CMS/quantile
  * counters — the fold is replay-safe by arithmetic alone; the
  * versioned `_SUCCESS` discipline ([[SnapshotStream.versionsIn]])
  * still guards readers against torn writes.
  *
  * Scale honesty: unlike the sketch states this table is
  * CORPUS-VOCABULARY-SIZED (one row per distinct gram ever seen). The
  * per-batch cost is one batch-scan aggregation + one state merge keyed
  * on the gram — at 100 TB the state is gram-bucketed and the merge
  * bucket-localized, exactly the
  * [[graft.sources.ZMaintain.upsertZBucketed]] composition the snapshot
  * sink documents; the versioned-rewrite shape here is the same one
  * `stream_upsert` ships.
  *
  * THE FOLD IDENTITY (what the gate pins): min over any batching of
  * the corpus equals the one-shot min, so the folded state regrouped
  * by doc must reproduce `ta_novelty` exactly — oracle IS
  * [[CorpusOps.taNoveltySql]].
  */
object NoveltyStream {

  /** Batch-local first-occurrence table: ONE mergeable aggregation. */
  private[graft] def firstSeenOf(batch: DataFrame): DataFrame =
    CorpusOps.noveltyGramsOf(batch)
      .groupBy(col("g")).agg(min(col("doc_id")).as("doc_id"))

  /** Keyed state merge: full-outer on the gram, pointwise MIN (LEAST
    * with a null-absorbing coalesce on each side). */
  private[graft] def mergeFirstSeen(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("g"), col("doc_id").as("da"))
      .join(b.select(col("g"), col("doc_id").as("db")), Seq("g"), "full_outer")
      .select(col("g"),
        least(coalesce(col("da"), col("db")), coalesce(col("db"), col("da")))
          .as("doc_id"))

  /** foreachBatch sink: fold the batch's first-occurrence table into
    * the stored state (versions under `$tableDir/firstseen`). */
  def noveltySink(tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val dir = s"$tableDir/firstseen"
    val local = firstSeenOf(batch)
    val merged = SnapshotStream.versionsIn(s, dir).filter(_ < batchId).lastOption
      .map(v => mergeFirstSeen(s.read.parquet(s"$dir/v=$v"), local))
      .getOrElse(local)
    merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
  }

  /** The maintained first-occurrence table (latest committed version). */
  def storedFirstSeen(s: SparkSession, tableDir: String): DataFrame = {
    val dir = s"$tableDir/firstseen"
    val vs = SnapshotStream.versionsIn(s, dir)
    require(vs.nonEmpty, s"no first-seen versions under $dir")
    s.read.parquet(s"$dir/v=${vs.last}")
  }

  /** Gate: two-range-batch fold of the first-occurrence state, scored
    * with the shared novelty projection. Oracle IS `ta_novelty`'s SQL
    * — the min-merge fold identity. */
  def streamNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val Array(org.apache.spark.sql.Row(lo: Long, hi: Long)) =
      docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()
    val mid = lo + (hi - lo) / 2
    val merged = mergeFirstSeen(
      firstSeenOf(docs.where(col("doc_id") <= mid)),
      firstSeenOf(docs.where(col("doc_id") > mid)))
    CorpusOps.noveltyOver(CorpusOps.noveltyGramsOf(docs), merged)
  }
}
