package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

/** Skyline operator: differential tests against an in-memory
  * brute-force dominance oracle, tie semantics, and partition-count
  * invariance of the local-frontier/global-refine split. */
class SkylineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def brute(pts: Seq[(Long, Int, Double)]): Set[(Long, Int, Double)] =
    pts.filter { a =>
      !pts.exists(b => b._2 >= a._2 && b._3 <= a._3 &&
        (b._2 > a._2 || b._3 < a._3))
    }.toSet

  private def run(pts: Seq[(Long, Int, Double)], parts: Int): Set[(Long, Int, Double)] =
    Skyline.skylineOver(
      spark.createDataset(pts).repartition(parts).toDF("key", "size", "price"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

  test("skyline equals the brute-force dominance oracle; ties both kept") {
    val pts = Seq(
      (1L, 10, 5.0), (2L, 10, 5.0),  // identical points: both frontier
      (3L, 9, 5.0),                  // dominated by 1/2 (same price, smaller)
      (4L, 10, 6.0),                 // dominated by 1/2 (same size, dearer)
      (5L, 20, 9.0), (6L, 5, 1.0),   // frontier (anti-correlated ends)
      (7L, 4, 2.0),                  // dominated by 6
      (8L, 15, 7.0),                 // frontier (between 1 and 5)
      (9L, 15, 7.5))                 // dominated by 8
    val expect = brute(pts)
    assert(expect.contains((1L, 10, 5.0)) && expect.contains((2L, 10, 5.0)),
      "sanity: the duplicated point must be frontier twice")
    assert(run(pts, 3) == expect)
  }

  test("partition-count invariance: local prune is lossless") {
    // anti-correlated grid (worst case for the prune) + random interior
    val rng = new scala.util.Random(7)
    val chain = (0 until 40).map(i => (i.toLong, i, (100 - i).toDouble))
    val noise = (100 until 300).map(i =>
      (i.toLong, rng.nextInt(40), (60 + rng.nextInt(40)).toDouble))
    val pts = chain ++ noise
    val expect = brute(pts)
    for (p <- Seq(1, 2, 7, 32))
      assert(run(pts, p) == expect, s"partitions=$p must not change the frontier")
  }

  test("merge identity: skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B))") {
    val rng = new scala.util.Random(11)
    val pts = (0 until 400).map(i =>
      (i.toLong, rng.nextInt(60), (50 + rng.nextInt(100)).toDouble))
    for (cut <- Seq(0, 97, 200, 400)) { // incl. empty-side folds
      val (a, b) = pts.splitAt(cut)
      val merged = run(brute(a).toSeq ++ brute(b).toSeq, 2)
      assert(merged == brute(pts), s"cut=$cut broke the merge identity")
    }
  }

  test("incremental gate equals the one-shot gate on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val one = Skyline.q44Skyline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val incr = Skyline.skylineIncr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(incr == one)
  }

  test("q44 gate: n_dominated matches per-point brute force on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val all = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val got = Skyline.q44Skyline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(got.map(g => (g._1, g._2, g._3)).toSet == brute(all.toSeq))
    got.foreach { case (k, sz, pr, nd) =>
      val expectN = all.count(b => sz >= b._2 && pr <= b._3 &&
        (sz > b._2 || pr < b._3))
      assert(nd == expectN, s"point $k: n_dominated $nd != $expectN")
    }
  }
}
