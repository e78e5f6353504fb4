package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HeavyHitters

/** Pins the HyperLogLog guarantees the operator's scaladoc claims:
  * multiplicity invariance (the property that lets the eval gate share
  * the distinct exchange with the exact count), merge-order invariance
  * (valid partial aggregate), and the accuracy envelope of the raw
  * estimate on both a synthetic id stream and the fixture corpus.
  */
class HllSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def freshAgg = HeavyHitters.hllAgg

  /** md5-derived 60-bit id, the same derivation the gate query uses. */
  private def id60(tok: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def sketchOf(xs: Seq[Long]): IndexedSeq[Int] = {
    val agg = freshAgg
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)).toIndexedSeq
  }

  private def estimate(regs: IndexedSeq[Int]): Double = {
    val s = regs.map(r => 1L << (HeavyHitters.HllRCap - r)).sum
    HeavyHitters.HllC / s.toDouble
  }

  test("registers are multiplicity-invariant: sketch(stream) == sketch(distinct set)") {
    val distinct = (0 until 2000).map(i => id60(s"tok$i"))
    val stream = distinct ++ distinct.take(500) ++ Seq.fill(300)(distinct.head)
    assert(sketchOf(stream) == sketchOf(distinct))
  }

  test("merge of split sketches equals the one-pass sketch, in any split") {
    val xs = (0 until 3000).map(i => id60(s"w$i"))
    val agg = freshAgg
    val one = sketchOf(xs)
    Seq(1, 777, 2999).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)),
        r.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      assert(merged.toIndexedSeq == one)
    }
  }

  test("raw estimate lands inside 4 standard errors on a 50k-id stream") {
    val n = 50000
    val xs = (0 until n).map(i => id60(s"item-$i"))
    val est = estimate(sketchOf(xs))
    val se = 1.04 / math.sqrt(HeavyHitters.HllM.toDouble) // ≈ 3.25%
    assert(math.abs(est - n) / n < 4 * se, s"estimate $est for n=$n")
  }

  test("ta_hll_eval on the fixture corpus: estimate tracks exact per language") {
    val rows = HeavyHitters.taHllEval(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val se = 1.04 / math.sqrt(HeavyHitters.HllM.toDouble)
    rows.foreach { r =>
      val (lang, exact, v, s, est) = (r.getAs[String]("lang"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("v_zero"), r.getAs[Long]("s_scaled"), r.getAs[Double]("n_est"))
      assert(s > 0 && v >= 0 && v <= HeavyHitters.HllM)
      // raw (uncorrected) estimate: generous envelope that still fails
      // on any arithmetic divergence; small langs lean on v_zero > 0
      if (exact > 2500)
        assert(math.abs(est - exact) / exact < 5 * se, s"$lang: est $est vs exact $exact")
    }
  }
}
