package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: HyperLogLog register vector over a stream of item ids
  * (Flajolet et al. 2007) — the fourth mergeable sketch in the family
  * ([[MinHashAgg]] set resemblance, [[MisraGriesAgg]] frequent items,
  * [[CountMinAgg]] point frequencies, this one distinct counts).
  * Buffer = `m` small registers, reduce = max into one register,
  * merge = pointwise max — map-side combine absorbs the stream and the
  * shuffle carries `m` ints per group regardless of stream length.
  *
  * Register index is the low `log2(m)` bits of the id; the register
  * value is the trailing-zero rank (count of trailing zeros + 1,
  * capped at [[rhoCap]]) of the remaining bits — the cap keeps the
  * scaled harmonic sum `Σ 2^(rhoCap − r)` inside Int64 so the DuckDB
  * twin ([[graft.operators.HeavyHitters.taHllEvalSql]]) can replay the
  * ESTIMATE integer-exactly, which stock HLL implementations (Spark's
  * HLL++, DuckDB's) never allow across engines — exactly the gap
  * `q20_approx_distinct`'s scaladoc concedes.
  *
  * Registers see only WHICH ids appear, not how often (max is
  * idempotent), so sketch(stream) == sketch(distinct(stream)) — pinned
  * by HllSpec, and the property that lets an eval gate share one
  * distinct exchange between the exact count and the sketch.
  */
class HllAgg(m: Int, rhoCap: Int) extends Aggregator[Long, Array[Int], Seq[Int]] {
  require((m & (m - 1)) == 0 && m > 0, s"m must be a power of two, got $m")
  private val jBits = java.lang.Integer.numberOfTrailingZeros(m)

  override def zero: Array[Int] = new Array[Int](m)

  override def reduce(buf: Array[Int], x: Long): Array[Int] = {
    val j = (x & (m - 1)).toInt
    val w = x >>> jBits
    val rho =
      if (w == 0L) rhoCap
      else math.min(java.lang.Long.numberOfTrailingZeros(w) + 1, rhoCap)
    if (rho > buf(j)) buf(j) = rho
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Int]): Seq[Int] = r.toSeq

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
}
