package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CountMinAgg
import graft.operators.HeavyHitters

/** Pins the Count-Min sketch guarantees the operator's scaladoc claims:
  * no underestimates ever, exact merge-order invariance (the property
  * that makes it a valid partial aggregate), and the eval gate's
  * overcount contract on the real fixture corpus.
  */
class CountMinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def freshAgg = HeavyHitters.cmsAgg

  /** Driver-side reference: exact counts, then estimate per item. */
  private def refCounts(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).map { case (x, g) => x -> g.size.toLong }

  test("estimates never underestimate; unique-bucket items are exact") {
    val agg = freshAgg
    // deterministic pseudo-stream over a skewed id set (ids < 2^32)
    val xs = (0 until 5000).map(i => ((i * i * 2654435761L) % 4294967296L) % 97L) ++
      Seq.fill(800)(7L) // one heavy item
    val sketch = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)).toIndexedSeq
    val exact = refCounts(xs)
    exact.foreach { case (x, c) =>
      assert(agg.estimate(sketch, x) >= c, s"item $x underestimated")
    }
    // total mass conservation per row: each of the d rows holds n counts
    val n = xs.size.toLong
    (0 until HeavyHitters.CmsD).foreach { r =>
      assert(sketch.slice(r * HeavyHitters.CmsW, (r + 1) * HeavyHitters.CmsW).sum == n)
    }
  }

  test("merge of split sketches equals the one-pass sketch (mergeability)") {
    val agg = freshAgg
    val xs = (0 until 3000).map(i => (i * 2246822519L) % 4294967296L % 211L)
    val (l, rr) = xs.splitAt(1234)
    val one = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    val merged = agg.merge(
      l.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)),
      rr.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
    assert(one.toSeq == merged.toSeq)
  }

  test("ta_cms_eval on the fixture corpus: top-k probes, overcount >= 0") {
    val rows = HeavyHitters.taCmsEval(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == HeavyHitters.CmsTopK)
    assert(rows.map(_.getAs[String]("token")).distinct.length == rows.length)
    rows.foreach { r =>
      val (c, e, o) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"), r.getAs[Long]("overcount"))
      assert(e >= c, s"${r.getAs[String]("token")} underestimated")
      assert(o == e - c)
    }
  }

  test("dq_join_estimate: CMS inner product upper-bounds the exact join size") {
    val r = HeavyHitters.dqJoinEstimate(spark, "/root/testdata/sf0.001").head()
    val (est, exact, over) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // collisions only ADD counter mass: the inner-product estimate can
    // never undercount the true Σ f_R(v)·f_S(v)
    assert(est >= exact, s"est $est < exact $exact")
    assert(over == est - exact)
    assert(exact > 0, "fixture join must be non-empty")
    // width sized so collision mass stays a fraction of the signal:
    // E[over] = |R||S|/w per row; keep the gate honest about it
    assert(over.toDouble <= exact.toDouble,
      s"overcount $over must not swamp the signal $exact at spec SF")
  }
}
