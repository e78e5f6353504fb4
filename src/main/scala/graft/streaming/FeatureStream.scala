package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Features

/** Streaming maintenance of the per-group SCALING STATISTICS — the
  * state behind online feature normalization: a trainer consuming an
  * ingest stream needs z-score/min-max parameters that cover
  * everything seen so far, without rescanning the corpus per batch.
  *
  * The state is tiny and fully mergeable: per lang (Σx, Σx² as
  * DECIMAL, n, min, max). Sums and counts are associative+commutative
  * (NOT idempotent — so the state is versioned `v=<batchId>` with
  * `_SUCCESS` guards, the [[SnapshotStream]] exactly-once argument:
  * a replayed batch re-reads the same predecessor and rewrites the
  * same version, never double-adds); extrema are idempotent anyway.
  * |langs| rows of driver-free state — the sketch-stream class, so a
  * single-file write per version is correct here (unlike the
  * corpus-shaped ER/novelty states).
  *
  * THE FOLD IDENTITY (what the gate pins): addition/least/greatest
  * over any batching equal the one-shot aggregation, so scoring the
  * corpus under the FOLDED stats must reproduce `feat_scale` exactly
  * — the gate's oracle IS [[Features.featScaleSql]].
  */
object FeatureStream {

  private[graft] def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("lang"), col("sx").as("sxa"), col("sxx").as("sxxa"),
        col("n").as("na"), col("lo").as("loa"), col("hi").as("hia"))
      .join(b.select(col("lang"), col("sx").as("sxb"), col("sxx").as("sxxb"),
        col("n").as("nb"), col("lo").as("lob"), col("hi").as("hib")), Seq("lang"), "full_outer")
      .select(col("lang"),
        (coalesce(col("sxa"), lit(0)) + coalesce(col("sxb"), lit(0)))
          .cast("decimal(38,0)").as("sx"),
        (coalesce(col("sxxa"), lit(0)) + coalesce(col("sxxb"), lit(0)))
          .cast("decimal(38,0)").as("sxx"),
        (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L))).as("n"),
        least(coalesce(col("loa"), col("lob")), coalesce(col("lob"), col("loa"))).as("lo"),
        greatest(coalesce(col("hia"), col("hib")), coalesce(col("hib"), col("hia"))).as("hi"))

  /** foreachBatch sink: fold the batch's stats into version
    * `v=<batchId>`, merging from the newest committed version
    * STRICTLY BELOW the batch id (replay-safe for the non-idempotent
    * sums). */
  def scaleSink(tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val prev = SnapshotStream.versionsIn(s, tableDir).filter(_ < batchId).lastOption
    val batchStats = Features.statsOf(
      batch.select(col("doc_id"), col("lang"), col("n_chars")))
    val merged = prev match {
      case Some(v) => merge(s.read.parquet(s"$tableDir/v=$v"), batchStats)
      case None    => batchStats
    }
    merged.coalesce(1).write.mode("overwrite").parquet(s"$tableDir/v=$batchId")
  }

  /** The maintained stats (newest committed version). */
  def storedStats(s: SparkSession, tableDir: String): DataFrame = {
    val vs = SnapshotStream.versionsIn(s, tableDir)
    require(vs.nonEmpty, s"no committed scaling stats under $tableDir")
    s.read.parquet(s"$tableDir/v=${vs.last}")
  }

  /** Gate: two-range-batch fold of the stats, corpus scored under the
    * FOLDED table. Oracle IS `feat_scale`'s SQL — the fold identity. */
  def streamFeatScale(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
    val Array(org.apache.spark.sql.Row(lo: Long, hi: Long)) =
      d.agg(min(col("doc_id")), max(col("doc_id"))).collect()
    val mid = lo + (hi - lo) / 2
    val folded = merge(
      Features.statsOf(d.where(col("doc_id") <= mid)),
      Features.statsOf(d.where(col("doc_id") > mid)))
    Features.scaleOver(d, folded)
  }
}
