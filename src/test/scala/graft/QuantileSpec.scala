package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.QuantileAgg
import graft.operators.HeavyHitters

/** The quantile sketch UDAF: bucket-map invariants, merge =
  * concatenation, partition-order determinism, and the 2^-k error
  * bound against exact quantiles — the properties that make the
  * relational-replay gate (ta_quantile_eval) sound.
  */
class QuantileSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val agg = HeavyHitters.quantileAgg
  private val k = HeavyHitters.QuantK

  test("bucket map: monotone, exact below 2^(k+1), rep inside its bucket") {
    val vs = (0L to 5000L) ++ Seq(1L << 20, (1L << 30) + 12345L, (1L << 40) - 1)
    var lastIdx = -1
    vs.sorted.foreach { v =>
      val idx = agg.bucketOf(v)
      assert(idx >= lastIdx, s"bucketOf must be monotone, broke at v=$v")
      lastIdx = idx
      if (v < (1L << (k + 1))) assert(idx == v && agg.repOf(idx) == v,
        s"exact region must map identically, v=$v idx=$idx")
      else {
        // the representative's bucket is the bucket itself, and the
        // value's bucket bounds contain both v and rep
        val rep = agg.repOf(idx)
        assert(agg.bucketOf(rep) == idx, s"rep $rep escaped bucket $idx (v=$v)")
        // relative error bound: |rep − v| ≤ v / 2^k
        assert(math.abs(rep - v) * (1L << k) <= v,
          s"rep $rep further than 2^-$k from v=$v")
      }
    }
  }

  test("merge of shard sketches == sketch of concatenation (mergeable state)") {
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(2000)(math.abs(rnd.nextLong()) % 100000L)
    val b = Seq.fill(3000)(rnd.between(1L, 1L << 35))
    def sketchOf(vs: Seq[Long]) = vs.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(sketchOf(a), sketchOf(b))
    val whole = sketchOf(a ++ b)
    assert(merged.toSeq == whole.toSeq)
  }

  test("distributed: partition order does not change the sketch (udaf determinism)") {
    import spark.implicits._
    val vs = (1L to 10000L).map(i => (i * 2654435761L) % 1000000L)
    val qa = udaf(agg)
    def run(parts: Int) = vs.toDF("v").repartition(parts)
      .agg(qa(col("v")).as("sk")).head().getSeq[Long](0)
    assert(run(2) == run(13), "sketch must be identical under any partitioning")
  }

  test("estimate hits the 2^-k bound on every percentile of a skewed stream") {
    val rnd = new scala.util.Random(42)
    // log-uniform: exercises many octaves, like real doc-length data
    val vs = Seq.fill(20000)(math.round(math.exp(rnd.nextDouble() * 20)))
    val sk = vs.foldLeft(agg.zero)(agg.reduce).toIndexedSeq
    val sorted = vs.sorted
    (1 to 99).foreach { p =>
      val target = (vs.size.toLong * p + 99) / 100
      val exact = sorted((target - 1).toInt)
      val est = agg.estimate(sk, target)
      assert(math.abs(est - exact) * (1L << k) <= exact,
        s"p$p: est $est vs exact $exact exceeds 2^-$k relative error")
    }
  }

  test("gate query: exact and estimated percentiles agree within bound at sf0.001") {
    val rows = HeavyHitters.taQuantileEval(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length >= 4, "at least one language group")
    rows.foreach { r =>
      val (exact, est) = (r.getLong(3), r.getLong(4))
      assert(math.abs(est - exact) * (1L << k) <= math.max(exact, 1L),
        s"${r.getString(0)} p${r.getInt(1)}: est $est vs exact $exact")
    }
  }
}
