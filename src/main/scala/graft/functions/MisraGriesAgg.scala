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
class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c)              => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None                 => // decrement-all step: drops ≤0 counters
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everyone, keep > 0
      val cut = sum.values.toArray.sortBy(-_).apply(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
