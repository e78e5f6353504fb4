package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming maintenance of the near-dup CLUSTER state — the daily
  * ingest loop of `dedup_cc_incr` run continuously: per micro-batch,
  * batch signatures probe the STORED band index, snapshot endpoints
  * contract to their stored component canonicals, a reduced
  * (batch + touched components)-sized propagation relabels, and both
  * state tables (the signature index and the labels) advance one
  * version. The delta stages are [[Dedup.dedupCcVs]] VERBATIM — the
  * sink adds only the state plumbing, so the streamed fold and the
  * batch gate cannot drift.
  *
  * Bootstrap-from-empty is the SAME code path: with an empty signature
  * index and empty prior labels, the cross probes and the snapshot
  * relabel degenerate to nothing and [[Dedup.dedupCcVs]] is exactly a
  * from-scratch CC of the batch (the `stream_er` discipline).
  *
  * Two tables, one commit point: `sig` writes BEFORE `labels`, and
  * readers pin the newest version committed in BOTH (see
  * [[storedVersion]]) — a crash between the writes leaves a sig
  * version without its labels twin, which no reader and no successor
  * batch ever pairs up. Replay re-reads the same predecessors
  * (strictly below the batch id) and rewrites both tables
  * byte-identically — the [[SnapshotStream]] exactly-once argument.
  *
  * Scale honesty: the signature index is CORPUS-SIZED state (one row
  * per doc ever seen) — bucketed on doc_id and bucket-localized at
  * 100 TB, the ZMaintain composition; the labels table likewise. The
  * per-batch COMPUTE, though, is batch-bounded: batch signatures +
  * band probes + a reduced propagation over batch docs and touched
  * components only ([[Dedup.dedupCcVs]]'s scaladoc carries the
  * argument).
  *
  * THE FOLD IDENTITY (what the gate pins): contraction preserves
  * connectivity and canonicals are component minima, so ANY batching
  * folded through the maintenance step reproduces the full-corpus CC
  * bit-identically — the gate runs a THREE-range-batch fold (bootstrap
  * + two maintenance steps, so a REAL intermediate state is exercised
  * on both sides of the induction) and its oracle IS `dedup_cc`'s
  * recursive-CTE recompute. (Exactness caveat shared with
  * `dedup_cc_incr`: above the band-bucket cap, per-side vs joint
  * banding may keep different members — gate-SF buckets stay far
  * below it.)
  */
object CcStream {

  private def emptyState(batch: DataFrame): (DataFrame, DataFrame) = {
    val s = batch.sparkSession
    (Dedup.minhashSignaturesOf(s, batch).limit(0),
      batch.select(col("doc_id"), col("doc_id").as("label")).limit(0))
  }

  /** Versions committed in BOTH state tables (the readable pairs). */
  private[graft] def committedVersions(s: SparkSession, tableDir: String): Seq[Long] = {
    val sig = SnapshotStream.versionsIn(s, s"$tableDir/sig").toSet
    SnapshotStream.versionsIn(s, s"$tableDir/labels").filter(sig)
  }

  /** Newest version committed in BOTH state tables (the reader pair). */
  private[graft] def storedVersion(s: SparkSession, tableDir: String): Option[Long] =
    committedVersions(s, tableDir).lastOption

  /** foreachBatch sink: fold `batch` (documents-shaped) into the
    * stored (sig, labels) state and write `v=<batchId>` of both. The
    * merge target is the newest committed pair STRICTLY BELOW the
    * batch id (filter the list, then take the last — a replayed
    * batch's own half-state is newest and must be skipped, not make
    * the lookup come up empty and silently re-bootstrap). */
  def ccSink(tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val prev = committedVersions(s, tableDir).filter(_ < batchId).lastOption
    val (sigS, prior) = prev match {
      case Some(v) => (s.read.parquet(s"$tableDir/sig/v=$v"),
        s.read.parquet(s"$tableDir/labels/v=$v"))
      case None => emptyState(batch)
    }
    // ONE materialized signature pass feeds both the fold and the
    // state write (recomputing it per consumer doubled the batch cost)
    val sigB = Dedup.minhashSignaturesOf(s, batch)
      .repartition(col("doc_id")).localCheckpoint()
    val out = Dedup.dedupCcVs(s, batch, sigS, prior, Some(sigB))
    val labels = out.select(col("doc_id"), col("cluster_id").as("label"))
      .localCheckpoint() // sever before the writes below re-trigger the fold
    sigS.unionByName(sigB).write.mode("overwrite")
      .parquet(s"$tableDir/sig/v=$batchId")
    labels.write.mode("overwrite").parquet(s"$tableDir/labels/v=$batchId")
  }

  /** The maintained labels (newest version committed in both tables). */
  def storedLabels(s: SparkSession, tableDir: String): DataFrame = {
    val v = storedVersion(s, tableDir)
    require(v.nonEmpty, s"no committed (sig, labels) pair under $tableDir")
    s.read.parquet(s"$tableDir/labels/v=${v.get}")
  }

  /** Gate: the three-range-batch fold as its batch composition —
    * bootstrap on the first third, then two maintenance steps (each
    * [[Dedup.dedupCcVs]] against the accumulated state). Oracle IS
    * `dedup_cc`'s SQL — the maintenance identity through a real
    * intermediate state. */
  def streamCc(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir)
    val Array(org.apache.spark.sql.Row(lo: Long, hi: Long)) =
      docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()
    val (t1, t2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    val b1 = docs.where(col("doc_id") <= t1)
    val b2 = docs.where(col("doc_id") > t1 && col("doc_id") <= t2)
    val b3 = docs.where(col("doc_id") > t2)
    val (sig0, lab0) = emptyState(b1)
    def step(batch: DataFrame, sigS: DataFrame, prior: DataFrame) = {
      // ONE materialized signature pass per batch, shared by the fold
      // and the state union — the ccSink discipline (r16: the gate
      // recomputed the kernel once inside dedupCcVs and once for the
      // union; same rows, one pass)
      val sigB = graft.Graft.compactCheckpoint(
        Dedup.minhashSignaturesOf(s, batch).repartition(col("doc_id")))
      val out = Dedup.dedupCcVs(s, batch, sigS, prior, Some(sigB))
      (graft.Graft.compactCheckpoint(sigS.unionByName(sigB)),
        graft.Graft.compactCheckpoint(
          out.select(col("doc_id"), col("cluster_id").as("label"))))
    }
    val (sig1, lab1) = step(b1, sig0, lab0)
    val (sig2, lab2) = step(b2, sig1, lab1)
    Dedup.dedupCcVs(s, b3, sig2, lab2)
  }
}
