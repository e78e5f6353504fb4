package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.mr.{Apps, MRJob}

/** ScalaCheck-generator-driven properties replacing the reference's
  * probe apps' intent (FIXTURES.md §3): distributed output ==
  * sequential oracle for generated corpora, under permutation and
  * partition-count changes. (Raw Gen sampling — the scalatest bridge
  * artifact isn't in the offline cache.)
  */
class MRPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  val word: Gen[String] = Gen.oneOf(
    Gen.oneOf("the", "fast", "key", "spark", "Émile", "såå", "word"),
    Gen.alphaStr.map(_.take(6)))
  val fileGen: Gen[String] = Gen.listOf(
    Gen.frequency(8 -> word, 1 -> Gen.const("123"), 1 -> Gen.const("!;")))
    .map(_.mkString(" "))
  val corpusGen: Gen[Seq[(String, String)]] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, fileGen).map(_.zipWithIndex.map { case (c, i) => (s"f$i", c) }))

  def samples(n: Int): Seq[Seq[(String, String)]] =
    (0 until n).flatMap(i =>
      corpusGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("wc: distributed == sequential oracle on generated corpora") {
    for (corpus <- samples(10)) {
      val got = MRJob.run(corpus.toDS(), Apps.wcMap, Apps.wcReduce).collect().sorted.toSeq
      val want = MRJob.sequential(corpus, Apps.wcMap, Apps.wcReduce).sorted
      assert(got == want, s"corpus: $corpus")
    }
  }

  test("indexer: invariant under input permutation") {
    for (corpus <- samples(5)) {
      val a = MRJob.run(corpus.toDS(), Apps.indexerMap, Apps.indexerReduce).collect().sorted.toSeq
      val b = MRJob.run(scala.util.Random.shuffle(corpus).toDS(),
        Apps.indexerMap, Apps.indexerReduce).collect().sorted.toSeq
      assert(a == b, s"corpus: $corpus")
    }
  }

  test("metadata: invariant under partition count") {
    for ((corpus, n) <- samples(5).zip(LazyList.continually(Seq(1, 3, 13)).flatten)) {
      val a = MRJob.run(corpus.toDS(), Apps.metadataMap, Apps.metadataReduce).collect().sorted.toSeq
      val b = MRJob.run(corpus.toDS().repartition(n), Apps.metadataMap, Apps.metadataReduce)
        .collect().sorted.toSeq
      assert(a == b, s"corpus: $corpus, n=$n")
    }
  }
}
