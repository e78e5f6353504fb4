package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graphs

/** Pins the fixed-point PageRank semantics against an independent
  * driver-side re-implementation (Maps + the same integer update), so
  * the distributed join/agg plan is checked — not trusted — on
  * topologies with every structural case: a path (asymmetric degrees),
  * a star (supernode), dangling nodes, and an isolated node.
  */
class GraphsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Reference fixed-point PR: same update, no Spark. */
  private def refPr(nodes: Seq[Long], sym: Seq[(Long, Long)]): Map[Long, Long] = {
    val deg = sym.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    var mass = nodes.map(_ -> Graphs.PrScale).toMap
    for (_ <- 1 to Graphs.PrIters) {
      val pot = nodes.map { u =>
        val d = deg.getOrElse(u, 0L)
        if (d == 0L) mass(u) else mass(u) - d * (mass(u) / d)
      }.sum / n
      val inc = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => mass(u) / deg(u) }.sum
      }
      mass = nodes.map(u => u -> (150000L + (85L * (inc.getOrElse(u, 0L) + pot)) / 100L)).toMap
    }
    mass
  }

  private def run(nodes: Seq[Long], undirected: Seq[(Long, Long)]): Map[Long, Long] = {
    val sym = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = Graphs.pagerankOver(spark, nodes.toDF("doc_id"), sym.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = refPr(nodes, sym)
    assert(got == want)
    got
  }

  test("path + dangling + isolated nodes match the reference update exactly") {
    // 0-1-2-3 path, 4 and 5 isolated (dangling)
    val pr = run(0L to 5L, Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    // symmetry of the path: ends equal, middles equal and higher
    assert(pr(0L) == pr(3L) && pr(1L) == pr(2L) && pr(1L) > pr(0L))
    // dangling nodes sit at the teleport floor, below every path node
    assert(pr(4L) == pr(5L) && pr(4L) < pr(0L))
  }

  test("star hub outranks its leaves; mass stays ~conserved") {
    val leaves = 1L to 8L
    val pr = run(0L +: leaves, leaves.map(l => (0L, l)))
    assert(leaves.map(pr).distinct.size == 1, "leaves are symmetric")
    assert(pr(0L) > pr(1L), "hub collects 8 shares per round")
    val total = pr.values.sum
    val ideal = 9L * Graphs.PrScale
    // flooring loses at most a few units per node per round
    assert(total <= ideal && total > ideal - 9L * Graphs.PrIters * 100L,
      s"mass $total vs ideal $ideal drifted more than flooring explains")
  }
}
