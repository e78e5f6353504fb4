package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: Misra-Gries frequent-items sketch with capacity k.
  *
  * State is AT MOST k counters regardless of stream length or key
  * cardinality — the bounded-memory alternative to a full groupBy when
  * only items above a frequency threshold matter (vocabulary at 100 TB
  * is billions of keys; k counters fit in one cache line row).
  *
  * Classic guarantees (Misra & Gries 1982; merge rule per Agarwal et
  * al., "Mergeable Summaries", PODS'12):
  *  - any item with true count > n/(k+1) is present in the sketch;
  *  - each surviving counter undercounts by at most n/(k+1);
  *  - the merge of two sketches preserves both bounds (sum counters
  *    pointwise, subtract the (k+1)-th largest, drop non-positive) —
  *    so it composes with map-side partial aggregation and any
  *    partitioning.
  *
  * The sketch's surviving SET depends on merge order, so it is used as
  * a CANDIDATE GENERATOR: a second exact pass over only the ≤ k
  * candidates makes the final result deterministic
  * ([[graft.operators.HeavyHitters]]).
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, scala.collection.mutable.HashMap[String, Long], Map[String, Long]] {

  import scala.collection.mutable

  // the buffer is MUTATED IN PLACE: typed Aggregator buffers live as
  // objects between reduce calls within a partition (same contract
  // MinHashAgg's arrays rely on), so the per-token hot path does one
  // hash probe + in-place update instead of allocating a persistent-map
  // node per element — this sketch exists for billions-of-tokens
  // streams, where per-row allocation is the cost that matters
  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
    buf.get(x) match {
      case Some(c)              => buf(x) = c + 1
      case None if buf.size < k => buf(x) = 1L
      case None                 => // decrement-all step: drops ≤0 counters
        // materialize keys first (≤ k of them): removing while
        // iterating the live map is undefined
        buf.keysIterator.toArray.foreach { t =>
          val c = buf(t)
          if (c > 1) buf(t) = c - 1 else buf.remove(t)
        }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everyone, keep > 0
      val cut = a.values.toArray.sortBy(-_).apply(k)
      a.keysIterator.toArray.foreach { t =>
        val c = a(t)
        if (c > cut) a(t) = c - cut else a.remove(t)
      }
    }
    a
  }

  override def finish(r: mutable.HashMap[String, Long]): Map[String, Long] = r.toMap

  // buffers only ever serialize at the partial→final exchange — kryo's
  // opaque bytes are fine there (the OUTPUT keeps a relational encoder)
  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
