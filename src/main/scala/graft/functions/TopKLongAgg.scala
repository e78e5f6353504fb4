package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: bounded per-group TOP-K over LONG keys (the K smallest)
  * — the numeric sibling of [[TopKAgg]], for the band-bucket / cell
  * membership caps whose selection rule is "first K members by id".
  *
  * Why not the window idiom: `row_number() OVER (PARTITION BY bucket
  * ORDER BY id) <= K` materializes and sorts EVERY row of a bucket in
  * one task — a hot LSH bucket (all near-identical docs share band
  * keys; boilerplate makes that the NORMAL case at corpus scale) or a
  * hot IVF cell serializes into a single straggler, and AQE cannot
  * split window partitions. This aggregate keeps at most K ids per
  * partial state: map-side combine caps every partition's contribution
  * at K before the exchange, the shuffle carries ≤ K longs per
  * (bucket, partition), and merge is a truncated sorted-array merge —
  * O(K) memory always. Deterministic for distinct keys under any
  * partitioning (same set of K smallest, same order), so the windowed
  * formulation remains the exact oracle twin.
  */
class TopKLongAgg(kCap: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    if (buf.length == kCap && key >= buf(buf.length - 1)) buf
    else {
      val raw = java.util.Arrays.binarySearch(buf, key)
      val pos = if (raw >= 0) raw else -raw - 1
      val n = math.min(buf.length + 1, kCap)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, pos)
      out(pos) = key
      System.arraycopy(buf, pos, out, pos + 1, n - pos - 1)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val n = math.min(a.length + b.length, kCap)
    val out = new Array[Long](n)
    var (i, j, o) = (0, 0, 0)
    while (o < n) {
      out(o) =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
