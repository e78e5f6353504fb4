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
}
