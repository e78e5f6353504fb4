package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Manifest

/** Closes the data-skipping loop physically: the manifest's pruning
  * verdicts must let a reader answer the box query from the unpruned
  * buckets alone, and the z layout must actually make most buckets
  * prunable for a small box — on BOTH dimensions. */
class ManifestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("unpruned buckets alone answer the box query; pruning is substantial on both dims") {
    val manifest = Manifest.layoutManifest(spark, dir).collect()
    val total = manifest.length
    val prunedN = manifest.count(_.getAs[Int]("pruned") == 1)
    // the box covers ~1/16 of the key space: most z-range files must
    // miss it entirely — if few prune, the envelopes (or the z
    // interleave) are broken
    assert(prunedN * 2 > total,
      s"only $prunedN of $total z-range files pruned for a small box")
    assert(prunedN < total, "the box must hit at least one file")

    // physical layout: write partitioned by bucket, read back ONLY the
    // unpruned buckets, and answer the box query
    val out = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    try {
      Manifest.keyed(spark, dir)
        .write.mode("overwrite").partitionBy("bucket").parquet(out)
      val box = col("pk").between(Manifest.PkLo, Manifest.PkHi) &&
        col("ok").between(Manifest.OkLo, Manifest.OkHi)
      val live = manifest.filter(_.getAs[Int]("pruned") == 0)
        .map(_.getAs[Long]("bucket")).sorted
      val prunedRead = spark.read.parquet(
          live.map(b => s"$out/bucket=$b"): _*)
        .where(box)
        .select(col("l_orderkey"), col("l_linenumber").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fullRead = spark.read.parquet(out).where(box)
        .select(col("l_orderkey"), col("l_linenumber").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(prunedRead == fullRead,
        "reading only unpruned buckets changed the query answer")
      assert(fullRead.nonEmpty, "box predicate selects nothing — gate is vacuous")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
