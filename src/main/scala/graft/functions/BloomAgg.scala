package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Fixed-size BLOOM BITMAP aggregate over a long key column — the
  * membership half of a data-skipping manifest (Delta's bloom filter
  * index / Parquet's column bloom): min-max envelopes prove a point
  * predicate CAN'T match a file only when the value is outside the
  * range; for a key uniform across files the envelope is vacuous and
  * membership is the only skippable signal. One bitmap per file,
  * built here as a mergeable typed Aggregator (map-side combinable:
  * partials are fixed-size bitmaps OR-merged, never value lists), so
  * building the index costs one pass over the data with O(bits)
  * state per file — the same shape every sketch UDAF in this package
  * ships.
  *
  * Determinism contract: probes use [[XXH64.hashLong]] with the two
  * pinned seeds below. [[graft.sources.ZPrune]] re-computes the same
  * probes DRIVER-SIDE when deciding which files a `key = v` predicate
  * can skip — the aggregate and the prober must never drift, so both
  * call [[BloomAgg.probes]].
  *
  * Sizing: [[Words]]·64 bits per file. At 2^15 bits a file tracking
  * ~8k distinct keys sits near 40% fill (FP ≈ 2.6% with two probes);
  * the rule of thumb is bits ≈ 4–10× per-file NDV, and a 100-TB
  * deployment sizes [[Words]] from the layout's rows-per-file target
  * the same way Parquet sizes its column blooms from NDV estimates.
  * False positives only KEEP files (never skip a match); false
  * negatives are impossible — every value in the file set its bits.
  */
object BloomAgg {
  /** 64-bit words per bitmap (2^9 words = 2^15 bits = 4 KiB/file). */
  val Words = 512
  private val Bits = Words * 64

  private val Seed1 = 42L
  private val Seed2 = 0x9E3779B97F4A7C15L

  /** The two bit positions `v` sets/probes — ONE definition shared by
    * the aggregate (build) and the planner rule (skip decision). */
  def probes(v: Long): (Int, Int) = {
    def idx(seed: Long): Int = {
      val h = XXH64.hashLong(v, seed)
      (((h % Bits) + Bits) % Bits).toInt
    }
    (idx(Seed1), idx(Seed2))
  }

  /** Driver-side membership test against a stored bitmap. */
  def mightContain(words: IndexedSeq[Long], v: Long): Boolean = {
    val (a, b) = probes(v)
    ((words(a >> 6) >> (a & 63)) & 1L) == 1L &&
      ((words(b >> 6) >> (b & 63)) & 1L) == 1L
  }
}

class BloomAgg extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
  override def zero: Array[Long] = new Array[Long](BloomAgg.Words)

  override def reduce(buf: Array[Long], v: java.lang.Long): Array[Long] = {
    if (v != null) {
      val (a, b) = BloomAgg.probes(v.longValue())
      buf(a >> 6) |= 1L << (a & 63)
      buf(b >> 6) |= 1L << (b & 63)
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
