package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca

/** Power-iteration PCA: planted-structure recovery and the integer
  * contracts the oracle twin relies on. */
class PcaSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Rank-1 corpus: every vector is a scalar multiple of one direction
    * w, plus a tiny orthogonal perturbation on one row. */
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-pca").toString
    val w = Array(0.6f, 0.0f, -0.8f, 0.0f) // unit direction
    def scaled(c: Float) = w.map(_ * c).toSeq
    Seq(
      (0L, scaled(0.9f), 0),
      (1L, scaled(-0.5f), 0),
      (2L, scaled(0.25f), 0),
      (3L, scaled(0.05f), 0),
      // off-direction noise, tiny relative to the planted axis
      (4L, Seq(0.0f, 0.02f, 0.0f, 0.01f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("rank-1 corpus: projections recover each vector's coefficient ordering") {
    val p = Pca.embPca(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // on rank-1 data the top PC is the planted w (up to sign): the
    // projections must be proportional to the coefficients
    // (0.9, -0.5, 0.25, 0.05), so |proj| ordering is exact and signs
    // oppose between 0 and 1
    val mags = Seq(0L, 1L, 2L, 3L).map(id => math.abs(p(id)))
    assert(mags == mags.sorted.reverse, s"|proj| must follow |coef|: $p")
    assert(p(0L).signum == -p(1L).signum && p(0L) != 0,
      s"opposite coefficients project with opposite signs: $p")
    // proportionality within integer truncation: proj(0)/proj(1) ≈ -1.8
    val ratio = p(0L).toDouble / p(1L).toDouble
    assert(math.abs(ratio + 1.8) < 0.01, s"ratio $ratio should be ≈ -1.8")
    // the noise row is (near-)orthogonal to the planted axis
    assert(math.abs(p(4L)) < math.abs(p(3L)),
      s"orthogonal noise must project below the smallest on-axis vector: $p")
  }

  test("projection of the real fixture is deterministic across two runs") {
    val sf = "/root/testdata/sf0.001"
    val a = Pca.embPca(spark, sf).collect().map(_.toSeq).toSet
    val b = Pca.embPca(spark, sf).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("farthest-point seeding picks the spread, not the crowd") {
    import graft.operators.KMeans
    // a tight cluster near the origin (ids 0-3), one far point right,
    // one far point up: maximin must pick origin-cluster min-id first,
    // then the two far points BEFORE any other cluster member
    val d = java.nio.file.Files.createTempDirectory("graft-pp").toString
    Seq(
      (0L, Seq(0.00f, 0.01f), 0), (1L, Seq(0.01f, 0.00f), 0),
      (2L, Seq(0.01f, 0.01f), 0), (3L, Seq(0.00f, 0.00f), 0),
      (10L, Seq(5.0f, 0.0f), 1),
      (11L, Seq(0.0f, 4.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val picks = KMeans.embKmeansPp(spark, d)
      .collect().sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(2)))
    assert(picks(0)._1 == 0L && picks(0)._2 == 0L, "first seed: min id, d2 = 0")
    // the two far points come next, farthest first (5.0 beats 4.0)
    assert(picks(1)._1 == 10L, s"${picks.toSeq}")
    assert(picks(2)._1 == 11L, s"${picks.toSeq}")
    // selection distances never increase (maximin is monotone)
    val d2s = picks.drop(1).map(_._2)
    assert(d2s.sameElements(d2s.sortBy(-_)), s"d2 must be non-increasing: ${d2s.toSeq}")
    // remaining rounds fill from the near cluster with positive d2
    assert(picks.drop(3).forall(p => Set(1L, 2L, 3L)(p._1)))
  }
}
