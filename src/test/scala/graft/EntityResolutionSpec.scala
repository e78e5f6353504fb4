package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EntityResolution

/** ER family over a planted catalog: exact name-pair set with counts,
  * transitive entity closure with min-key canonicals (including the
  * exact-duplicate contraction), and a blocking-recall eval that must
  * SEE the planted cross-block miss. */
class EntityResolutionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // keys are multiples of 7 (the eval's sample modulus) so every
  // planted name's representative participates in the recall truth set
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-er").toString
    Seq(
      (0L, "red widget"),   // vs 7: dist 1 but DIFFERENT noun block —
      (7L, "red widgex"),   //   a true match blocking must miss
      (14L, "blue widget"), // 14–21–28: pairwise dist 1, same block —
      (21L, "bluu widget"), //   one transitive entity, canonical 14
      (28L, "bluz widget"),
      (35L, "green anvil"), // singleton
      (42L, "blue widget")) // exact duplicate of 14: same entity via
                            //   the distinct-name contraction
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    d
  }

  test("pairs: exactly the within-block distinct-name matches, count-weighted") {
    val got = EntityResolution.erPairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      ("blue widget", "bluu widget", 1, 2L, 1L),
      ("blue widget", "bluz widget", 1, 2L, 1L),
      ("bluu widget", "bluz widget", 1, 1L, 1L)), s"got $got")
  }

  test("entities: transitive closure, min-key canonical, exact dups merged") {
    val got = EntityResolution.erEntities(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(got(14L) == (14L, 4L, 1) && got(21L) == (14L, 4L, 0) &&
      got(28L) == (14L, 4L, 0) && got(42L) == (14L, 4L, 0),
      s"widget entity wrong: $got")
    // the cross-block match is NOT merged (blocking contract)
    assert(got(0L) == (0L, 1L, 1) && got(7L) == (7L, 1L, 1))
    assert(got(35L) == (35L, 1L, 1))
  }

  test("incremental ER: a batch name bridging two prior entities merges them; equals full recompute") {
    val d = java.nio.file.Files.createTempDirectory("graft-er-incr").toString
    Seq(
      // snapshot side (keys <= mid = 53)
      (2L, "aaaa widget"),  // prior entity X
      (4L, "cccc widget"),  // prior entity Y (dist to X = 4: separate)
      (6L, "gggg anvil"),   // prior singleton
      // batch side (keys > mid)
      (100L, "aacc widget"), // dist 2 to BOTH X and Y — must bridge them
      (102L, "cccc widget"), // exact duplicate of a known name
      (104L, "zzzz gear"))   // brand-new singleton
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val incr = EntityResolution.erIncr(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    val full = EntityResolution.erEntities(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(incr == full, "incremental must equal the full recompute exactly")
    assert(incr(2L) == (2L, 4L, 1) && incr(4L) == (2L, 4L, 0) &&
      incr(100L) == (2L, 4L, 0) && incr(102L) == (2L, 4L, 0),
      s"bridged entity wrong: $incr")
    assert(incr(6L) == (6L, 1L, 1) && incr(104L) == (104L, 1L, 1))
  }

  test("blocking recall eval counts the cross-block miss honestly") {
    val r = EntityResolution.erBlockRecall(spark, dir).head()
    // truth: (red widgex, red widget), (blue, bluu), (blue, bluz),
    // (bluu, bluz); found: the 3 same-block ones
    assert(r.getLong(0) == 4L, s"n_truth ${r.getLong(0)}")
    assert(r.getLong(1) == 3L, s"n_found ${r.getLong(1)}")
    assert(math.abs(r.getDouble(2) - 0.75) < 1e-12)
  }
}
