package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EntityResolution

/** ER family over a planted catalog: exact pair set, transitive
  * entity closure with min-key canonicals, and a blocking-recall eval
  * that must SEE the planted cross-block miss. */
class EntityResolutionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // keys are multiples of 7 (the eval's sample modulus) so every
  // planted record participates in the recall truth set
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-er").toString
    Seq(
      (0L, "red widget"),   // vs 7: dist 1 but DIFFERENT noun block —
      (7L, "red widgex"),   //   a true match blocking must miss
      (14L, "blue widget"), // 14–21–28: pairwise dist 1, same block —
      (21L, "bluu widget"), //   one transitive entity, canonical 14
      (28L, "bluz widget"),
      (35L, "green anvil")) // singleton
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    d
  }

  test("pairs: exactly the within-block verified matches") {
    val got = EntityResolution.erPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got == Set((14L, 21L, 1), (14L, 28L, 1), (21L, 28L, 1)),
      s"got $got")
  }

  test("entities: transitive closure, min-key canonical, skew-safe sizes") {
    val got = EntityResolution.erEntities(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(got(14L) == (14L, 3L, 1) && got(21L) == (14L, 3L, 0) &&
      got(28L) == (14L, 3L, 0), s"widget entity wrong: $got")
    // the cross-block match is NOT merged (blocking contract)
    assert(got(0L) == (0L, 1L, 1) && got(7L) == (7L, 1L, 1))
    assert(got(35L) == (35L, 1L, 1))
  }

  test("blocking recall eval counts the cross-block miss honestly") {
    val r = EntityResolution.erBlockRecall(spark, dir).head()
    // truth: (0,7), (14,21), (14,28), (21,28); found: the 3 same-block
    assert(r.getLong(0) == 4L, s"n_truth ${r.getLong(0)}")
    assert(r.getLong(1) == 3L, s"n_found ${r.getLong(1)}")
    assert(math.abs(r.getDouble(2) - 0.75) < 1e-12)
  }
}
