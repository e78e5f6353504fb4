package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Member row for [[TopKPayloadAgg]]: a long sort id plus the payload
  * columns that must survive the cap (PQ codes, here). */
case class IdCodes(id: Long, codes: Seq[Int])

/** Typed UDAF: bounded per-group TOP-K over long ids — the
  * [[TopKLongAgg]] selection rule (K smallest ids), carrying a payload
  * through the aggregation instead of joining it back afterwards.
  *
  * Why it exists: [[graft.operators.Similarity.simIvfPqTopkOver]]'s
  * inverted-list cap needs the kept members' CODES, not just their ids.
  * Capping ids with [[TopKLongAgg]] and semi-joining the codes back
  * works, but the join-back re-evaluates the index branch a third time
  * (the encode kernel roots in mapPartitions, and column pruning makes
  * the branches non-reusable — see simIvfPqTopk's scaladoc) and costs
  * an extra exchange — the 10× rehearsal never measured it below
  * 5.4 s where the one-pass form reaches 2.0 s (min-of-4).
  * Carrying the payload keeps it ONE aggregation pass:
  * state is ≤ K (id, M-byte codes) entries per (group, partition) —
  * still fixed-size, still mergeable, map-side combined.
  *
  * Selection is by id alone (ids are distinct vector ids), so results
  * are identical to TopKLongAgg-then-join and to the windowed oracle
  * twin under any partitioning.
  */
class TopKPayloadAgg(kCap: Int)
    extends Aggregator[IdCodes, Array[IdCodes], Seq[IdCodes]] {

  override def zero: Array[IdCodes] = Array.empty

  private def insertPos(buf: Array[IdCodes], id: Long): Int = {
    // binary search on the id field (buffer is id-ascending)
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid).id < id) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def reduce(buf: Array[IdCodes], row: IdCodes): Array[IdCodes] = {
    if (buf.length == kCap && row.id >= buf(buf.length - 1).id) buf
    else {
      val pos = insertPos(buf, row.id)
      val n = math.min(buf.length + 1, kCap)
      val out = new Array[IdCodes](n)
      System.arraycopy(buf, 0, out, 0, pos)
      out(pos) = row
      System.arraycopy(buf, pos, out, pos + 1, n - pos - 1)
      out
    }
  }

  override def merge(a: Array[IdCodes], b: Array[IdCodes]): Array[IdCodes] = {
    val n = math.min(a.length + b.length, kCap)
    val out = new Array[IdCodes](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      out(o) =
        if (j >= b.length || (i < a.length && a(i).id <= b(j).id)) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(r: Array[IdCodes]): Seq[IdCodes] = r.toSeq

  override def bufferEncoder: Encoder[Array[IdCodes]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[IdCodes]]()
  override def outputEncoder: Encoder[Seq[IdCodes]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[IdCodes]]()
}
