package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: Count-Min sketch over a stream of 32-bit item ids
  * (Cormode & Muthukrishnan 2005). Buffer = a d×w counter matrix
  * (flattened row-major), reduce = +1 in one bucket per row, merge =
  * pointwise add — a proper MERGEABLE partial aggregate: map-side
  * combine absorbs the stream, the shuffle carries d·w longs per
  * group regardless of stream length or key cardinality.
  *
  * The estimate for item x is min over rows r of cell(r, h_r(x)); it
  * NEVER underestimates (every occurrence of x lands in exactly those
  * cells) and overestimates only by colliding mass — with d rows of
  * width w, the overcount exceeds 2n/w with probability ≤ 2^−d.
  * Complements [[MisraGriesAgg]]: MG keeps WHICH items are frequent
  * (bounded candidate set, no per-item query), CMS answers point
  * frequency queries for ANY item, including ones chosen after the
  * pass.
  *
  * Hash family must match the oracle twin
  * ([[graft.operators.HeavyHitters.taCmsEvalSql]]): h_r(x) =
  * ((a_r·x + b_r) mod p) mod w, the same (a·x + b) mod P universal
  * family the minhash kernel uses — a_r < 2³⁰ and x < 2³² keep the
  * product inside Int64 in both engines.
  */
class CountMinAgg(d: Int, w: Int, hashA: Array[Long], hashB: Array[Long], p: Long)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], x32: Long): Array[Long] = {
    var r = 0
    while (r < d) {
      buf(r * w + (((hashA(r) * x32 + hashB(r)) % p) % w).toInt) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  /** Point query against a finished sketch. */
  def estimate(sketch: IndexedSeq[Long], x32: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = sketch(r * w + (((hashA(r) * x32 + hashB(r)) % p) % w).toInt)
      if (c < best) best = c
      r += 1
    }
    best
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
