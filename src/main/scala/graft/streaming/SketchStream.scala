package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.HeavyHitters

/** Streaming maintenance of a mergeable sketch — the Count-Min counter
  * matrix as STANDING STATE over an unbounded document stream, the way
  * a 100-TB ingest keeps "how often has this token ever appeared"
  * queryable without a corpus-scale recount. Each micro-batch builds
  * its own batch-local sketch (one mergeable aggregation, d·w longs of
  * shuffle no matter the batch size) and pointwise-ADDS it into the
  * stored sketch — the merge is the UDAF's own
  * [[graft.functions.CountMinAgg.merge]], so the streaming fold and
  * the one-shot aggregation are THE SAME arithmetic by construction.
  *
  * State uses [[SnapshotStream]]'s versioned-directory discipline
  * (`v=<batchId>`, `_SUCCESS`-gated reads, merge target = latest
  * version strictly below the batch id) so an at-least-once batch feed
  * maintains the sketch exactly-once: a replayed batch re-reads the
  * same predecessor and rewrites its own version byte-identically.
  *
  * THE FOLD IDENTITY (what the gate pins): counter addition is
  * associative and commutative, so ANY batching of the corpus — and
  * any arrival order — folds to exactly the one-shot sketch. The gate
  * runs a two-range-batch fold and grades the merged sketch with the
  * one-shot eval's probe harness; its oracle IS `ta_cms_eval`'s SQL,
  * so a drift anywhere in the fold (a lost batch, a double-merge, a
  * mis-indexed counter) breaks the hash. StreamingSpec drives the same
  * fold through a real checkpointed `foreachBatch` query with a
  * restart and a replayed batch, and pins convergence.
  */
object SketchStream {

  /** One-row frame holding a sketch (the stored-state encoding). */
  private def sketchFrame(s: SparkSession, sk: Seq[Long]): DataFrame = {
    import s.implicits._
    Seq(sk).toDF("cms")
  }

  private def readSketch(s: SparkSession, path: String): Seq[Long] =
    s.read.parquet(path).select(col("cms")).head().getSeq[Long](0)

  /** Batch-local sketch: ONE mergeable aggregation over the batch's
    * token stream. */
  private[graft] def sketchOf(batch: DataFrame): IndexedSeq[Long] = {
    val s = batch.sparkSession
    import s.implicits._
    HeavyHitters.cmsToksOf(batch).select(col("x")).as[Long]
      .select(HeavyHitters.cmsAgg.toColumn.name("cms")).head().toIndexedSeq
  }

  /** foreachBatch sink: merge `batch`'s sketch into the stored one
    * (versions under `$tableDir/cms`) and write `v=<batchId>`. */
  def cmsSink(tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val dir = s"$tableDir/cms"
    val prev = SnapshotStream.versionsIn(s, dir).filter(_ < batchId).lastOption
      .map(v => readSketch(s, s"$dir/v=$v"))
    val local = sketchOf(batch).toArray
    val merged = prev match {
      case Some(p) => HeavyHitters.cmsAgg.merge(local, p.toArray).toSeq
      case None    => local.toSeq
    }
    sketchFrame(s, merged).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/v=$batchId")
  }

  /** The maintained sketch (latest committed version). */
  def storedSketch(s: SparkSession, tableDir: String): IndexedSeq[Long] = {
    val dir = s"$tableDir/cms"
    val vs = SnapshotStream.versionsIn(s, dir)
    require(vs.nonEmpty, s"no sketch versions under $dir")
    readSketch(s, s"$dir/v=${vs.last}").toIndexedSeq
  }

  /** Gate: the two-batch range fold of the corpus through the sketch
    * merge, graded by the one-shot probe harness. Oracle =
    * `ta_cms_eval`'s relational replay — the fold identity. */
  def streamCms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val Array(org.apache.spark.sql.Row(lo: Long, hi: Long)) =
      docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()
    val mid = lo + (hi - lo) / 2
    val s1 = sketchOf(docs.where(col("doc_id") <= mid))
    val s2 = sketchOf(docs.where(col("doc_id") > mid))
    val merged = HeavyHitters.cmsAgg.merge(s1.toArray, s2.toArray).toIndexedSeq
    HeavyHitters.cmsProbe(s, HeavyHitters.cmsToksOf(docs), merged)
  }
}
