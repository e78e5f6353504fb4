package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: mergeable quantile sketch over non-negative integers —
  * the fifth member of the mergeable-sketch family
  * ([[CountMinAgg]]/[[HllAgg]]/[[MinHashAgg]]/[[MisraGriesAgg]]).
  *
  * Bucketing is HDR-histogram style (public design: Tene's HdrHistogram;
  * same guarantee class as DDSketch, Masson et al., VLDB 2019): base-2
  * exponent with `2^k` linear sub-buckets per octave. For value v ≥ 1
  * with e = floor(log2 v):
  *   - v < 2^(k+1)      → idx = v                  (exact region)
  *   - otherwise        → idx = (e−k)·2^k + (v >> (e−k))
  * (the two branches agree on the shared octave, and idx is monotone in
  * v, so rank queries against bucket counts land in the bucket holding
  * the true quantile). v ≤ 0 → bucket 0. Relative bucket width is
  * ≤ 2^−k, so any quantile estimate is within 2^−k of the exact value.
  *
  * Chosen over KLL/t-digest DELIBERATELY: those are sampling- or
  * merge-order-dependent, so two engines (or two partition orders!)
  * produce different sketches. This bucketing is a pure per-value
  * function — deterministic under any partitioning, replayable in ANSI
  * SQL (`length(bin(v))-1` is floor(log2) in both Spark and DuckDB),
  * which is what lets the gate hash-check the ESTIMATES, not just
  * tolerance booleans.
  *
  * Buffer = fixed Array[Long] of bucket counts; reduce = +1 in one
  * bucket; merge = pointwise add. A proper mergeable partial aggregate:
  * map-side combine absorbs the stream and the shuffle carries
  * [[size]] longs per group regardless of stream length — sketches for
  * disjoint 100-TB shards union by vector add.
  */
class QuantileAgg(k: Int, val size: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  // the exact region (v < 2^(k+1)) indexes buckets by value without the
  // logarithmic branch's clamp — a smaller `size` would let bucketOf
  // return an index past the buffer and fail inside reduce()
  require(size >= (1 << (k + 1)),
    s"size ($size) must cover the exact region (>= ${1 << (k + 1)} for k=$k)")

  /** Pure per-value bucket index (shared by reduce and the replay). */
  def bucketOf(v: Long): Int = {
    if (v <= 0L) 0
    else if (v < (1L << (k + 1))) v.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val idx = ((e - k) << k) + (v >> (e - k)).toInt
      // clamp engages once v exceeds what `size` buckets cover —
      // v ≥ 2^(size/2^k + k - 1), i.e. 2^41 for (k=5, size=1184). The
      // SQL replay (taQuantileEvalSql) applies the same LEAST() clamp
      // so both engines bucket the overflow region identically.
      math.min(idx, size - 1)
    }
  }

  /** Integer representative of a bucket: midpoint of its value range
    * (exact value in the exact region). */
  def repOf(idx: Int): Long = {
    if (idx < (1 << (k + 1))) idx.toLong
    else {
      val s = (idx >> k) - 1
      val m = (idx & ((1 << k) - 1)) + (1 << k)
      val lo = m.toLong << s
      val hi = ((m + 1).toLong << s) - 1
      (lo + hi) >> 1
    }
  }

  /** Rank query against a finished sketch: the representative of the
    * first bucket whose cumulative count reaches `target` (1-based). */
  def estimate(sketch: IndexedSeq[Long], target: Long): Long = {
    var cum = 0L
    var i = 0
    while (i < sketch.length) {
      cum += sketch(i)
      if (cum >= target) return repOf(i)
      i += 1
    }
    repOf(sketch.length - 1)
  }

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    buf(bucketOf(v)) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
