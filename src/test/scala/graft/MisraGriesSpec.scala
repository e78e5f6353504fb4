package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGriesAgg
import graft.operators.HeavyHitters

/** Adversarial tests for the Misra-Gries sketch guarantees: the
  * fixture vocabulary is smaller than k (the sketch is incidentally
  * exact there), so these build a skewed stream with vocabulary ≫ k
  * where decrements and merge-compactions actually fire.
  */
class MisraGriesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  val k = 20

  /** 10 hot items (≈5.5% each), 5000 cold singletons-ish: vocab 5010 ≫ k. */
  lazy val stream: Seq[String] = {
    val hot = (0 until 10).flatMap(h => Seq.fill(500)(s"hot$h"))
    val cold = (0 until 5000).map(c => s"cold$c")
    // deterministic interleave (no RNG: retry-stable test data)
    (hot ++ cold).zipWithIndex.sortBy { case (_, i) => (i * 2654435761L) % 9001 }
      .map(_._1)
  }

  def truth: Map[String, Long] =
    stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  test("every item above n/(k+1) survives the sketch; counters undercount by <= n/(k+1)") {
    for (parts <- Seq(1, 7, 32)) {
      val agg = new MisraGriesAgg(k)
      val sketch = stream.toDS().repartition(parts)
        .select(agg.toColumn.name("mg")).head()
      assert(sketch.size <= k)
      val n = stream.size.toLong
      val bound = n / (k + 1)
      for ((t, c) <- truth if c > bound)
        assert(sketch.contains(t), s"guaranteed item $t (count $c > $bound) missing at parts=$parts")
      for ((t, c) <- sketch) {
        assert(c <= truth(t), s"sketch must never overcount: $t $c > ${truth(t)}")
        assert(truth(t) - c <= bound, s"undercount bound violated for $t at parts=$parts")
      }
    }
  }

  test("taHeavyHitters == exact groupBy-HAVING on the fixture corpus") {
    val dir = "/root/testdata/sf0.001"
    val got = HeavyHitters.taHeavyHitters(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.documents(spark, dir)
      .select(explode(split(graft.operators.TextAnalysis.normalized(col("text")), " ")).as("t"))
      .where(col("t") =!= "")
    val n = toks.count()
    val exact = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
      .where(col("c") * HeavyHitters.HhT > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(got.nonEmpty, "fixture should contain >1% tokens for the test to bite")
  }
}
