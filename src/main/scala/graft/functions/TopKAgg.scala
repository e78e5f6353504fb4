package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: bounded per-group TOP-K (smallest K keys in string
  * order) — the sixth mergeable aggregate in the sketch family, and the
  * skew-safe upgrade of the window-rank idiom.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY k) <= K` materializes
  * and sorts EVERY row of a group in one task — a supernode domain
  * (half the corpus from one crawl host) serializes into a single
  * straggler. This aggregate keeps at most K keys per partial state:
  * map-side combine caps every partition's contribution at K before
  * the exchange, the shuffle carries ≤ K keys per (group, partition),
  * and merge is a truncated sorted-array merge — O(K) memory always,
  * no per-group sort of the full data anywhere. Deterministic for
  * distinct keys under any partitioning (same set of K smallest, same
  * order), so the windowed formulation IS the oracle twin.
  *
  * Keys are plain strings: callers encode compound sort keys into one
  * lexicographically-faithful string (e.g. `md5hex:zero-padded-id`),
  * which keeps the aggregate engine-replayable — DuckDB sorts the same
  * strings the same way.
  */
class TopKAgg(kCap: Int) extends Aggregator[String, Array[String], Seq[String]] {

  override def zero: Array[String] = Array.empty

  override def reduce(buf: Array[String], key: String): Array[String] = {
    if (buf.length == kCap && key.compareTo(buf(buf.length - 1)) >= 0) buf
    else {
      val raw = java.util.Arrays.binarySearch(
        buf.asInstanceOf[Array[AnyRef]], key)
      val pos = if (raw >= 0) raw else -raw - 1
      val n = math.min(buf.length + 1, kCap)
      val out = new Array[String](n)
      System.arraycopy(buf, 0, out, 0, pos)
      out(pos) = key
      System.arraycopy(buf, pos, out, pos + 1, n - pos - 1)
      out
    }
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    val n = math.min(a.length + b.length, kCap)
    val out = new Array[String](n)
    var (i, j, o) = (0, 0, 0)
    while (o < n) {
      out(o) =
        if (j >= b.length || (i < a.length && a(i).compareTo(b(j)) <= 0)) {
          i += 1; a(i - 1)
        } else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(r: Array[String]): Seq[String] = r.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
