package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Adversarial-topology tests for the large-star/small-star connected
  * components variant: a 1000-node path is the worst case for one-hop
  * min-label propagation (diameter 999 ⇒ 999 rounds) and the exact
  * case star contraction exists for — it must converge in O(log n)
  * rounds to the same unique fixpoint (min node id per component).
  */
class StarCcSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("1000-node path converges in O(log n) rounds to the component min") {
    val n = 1000
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst")
    val (star, rounds) = Dedup.starContract(edges)
    assert(rounds <= 15, s"path of $n nodes must need O(log n) rounds, took $rounds")
    val labels = star.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fixpoint = star: every non-min node points straight at node 0
    assert(labels.size == n - 1)
    assert(labels.values.forall(_ == 0L), "all nodes must label to the component min")
  }

  test("multiple components + isolated nodes keep distinct minima") {
    // components {0..4} (cycle), {10..12} (triangle), {20,21}; 30 isolated
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L)).toDF("src", "dst")
    val (star, _) = Dedup.starContract(edges)
    val labels = star.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(labels(_) == 0L))
    assert(Seq(11L, 12L).forall(labels(_) == 10L))
    assert(labels(21L) == 20L)
    assert(!labels.contains(30L) && !labels.contains(0L))
  }

  test("star fixpoint equals one-hop min-label propagation fixpoint") {
    // random-ish deterministic graph: chains + cross links
    val edges = (0 until 200).map { i =>
      val a = (i * 37) % 100; val b = (i * 53 + 7) % 100
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }.toDF("src", "dst")

    val (star, _) = Dedup.starContract(edges)
    val starLabels = star.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: driver-side union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = parent.keys.toSeq
    val expect = nodes.map(x => x -> find(x)).filter { case (x, r) => x != r }.toMap
    assert(starLabels == expect)
  }

  test("propagateMin escalates past the round cap to star contraction, preserving min-INIT-label semantics") {
    // A 40-hop path exceeds CcMaxIters = 20 one-hop rounds, forcing the
    // r15 escalation (the mixed/boilerplate 100× legs proved deep
    // chains are the NORMAL topology of a boilerplate corpus — three
    // gates died of the old throw). The fallback must reproduce
    // propagateMin's fixpoint for an ARBITRARY init labeling — per
    // node, the minimum INIT LABEL over its component (not the
    // component-min node id): init label = 1000 − doc_id makes the
    // component minimum 1000 − 40 = 960, owned by the LAST node, so a
    // fallback that returned component-min ids (= node 0's label 1000)
    // would fail. Isolated node 99 must keep its own init label.
    val n = 41
    val sym = Dedup.symmetrize(
      (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("da", "db"))
      .persist()
    val init = ((0 until n).map(_.toLong) :+ 99L)
      .map(id => (id, 1000L - id)).toDF("doc_id", "label")
    val out = Dedup.propagateMin(spark, init, sym, "escalation-spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sym.unpersist()
    assert((0 until n).forall(i => out(i.toLong) == 1000L - (n - 1)),
      s"every chain node must take the component's min init label: $out")
    assert(out(99L) == 1000L - 99L, "isolated node keeps its own init label")
  }
}
