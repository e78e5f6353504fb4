package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: one-pass MinHash signature over a stream of 32-bit
  * shingle ids. Buffer = K running minima, merge = elementwise min —
  * a proper MERGEABLE partial aggregate (map-side combine + shuffle of
  * K longs per group), unlike the reference engine where Reduce always
  * receives the full value list (SURVEY.md §2.3 "no combiner",
  * reference `mr/worker.go:228-243`). Because it's an Aggregator it
  * also drops into streaming (`KeyValueGroupedDataset.agg`) for
  * incremental signatures.
  *
  * Hash family must match [[graft.operators.Dedup]]: h_i(x) =
  * (a_i·x + b_i) mod P.
  */
class MinHashAgg(k: Int, hashA: Array[Long], hashB: Array[Long], p: Long)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], x32: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = (hashA(i) * x32 + hashB(i)) % p
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
