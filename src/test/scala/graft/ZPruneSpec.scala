package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ZPrune

/** The file-skipping optimizer rule: results must be bit-identical to
  * the full scan while the physical scan reads strictly fewer files —
  * and the rule must keep its hands off queries it cannot prove
  * anything about. */
class ZPruneSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-zprune").toString
    val m = 1L << ZPrune.MBits
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"),
        expr(s"l_partkey % $m").as("pk"), expr(s"l_orderkey % $m").as("ok"))
    ZPrune.writeLayout(df, d, "pk", "ok", buckets = 16)
    ZPrune.attach(spark, d)
    d
  }

  /** Execute a FRESH instance of the query exactly once and return
    * (rows, files-read, scan node). One execution only: re-collecting
    * the same Dataset resets its SQLMetrics while the scan's lazy
    * `selectedPartitions` (which sets numFiles) never re-fires, so a
    * second run would read 0. */
  private def runOnce(q: DataFrame => DataFrame)
      : (Seq[String], Long, FileSourceScanExec) = {
    val df = q(spark.read.parquet(dir))
    val rows = df.collect().map(_.toString).sorted.toSeq
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1)
    (rows, scans.head.metrics("numFiles").value, scans.head)
  }

  private def hasBucketFilter(scan: FileSourceScanExec): Boolean =
    scan.partitionFilters.exists(_.references.exists(_.name == "bucket"))

  test("box query: same rows as the full scan, strictly fewer files read") {
    val (all, totalFiles, _) = runOnce(identity)
    val (got, prunedFiles, scan) = runOnce(_.where(
      col("pk") >= 16 && col("pk") <= 31 && col("ok") >= 32 && col("ok") <= 47))
    val expected = spark.read.parquet(dir).collect()
      .filter { r =>
        val pk = r.getAs[Long]("pk"); val ok = r.getAs[Long]("ok")
        pk >= 16 && pk <= 31 && ok >= 32 && ok <= 47
      }.map(_.toString).sorted.toSeq
    assert(got == expected, "pruning must never change results")
    assert(got.nonEmpty, "fixture must populate the box or this pins nothing")
    assert(all.size > got.size)
    assert(prunedFiles < totalFiles,
      s"box scan must skip files: $prunedFiles vs $totalFiles")
    // the injected predicate must surface as a PARTITION filter (so the
    // skipping is directory-level, not post-read)
    assert(hasBucketFilter(scan),
      s"expected an injected bucket partition filter: ${scan.partitionFilters}")
  }

  test("single-dimension range prunes too (the z layout's whole point)") {
    val (_, total, _) = runOnce(identity)
    val (got, files, _) = runOnce(_.where(col("ok") < 8))
    val expected = spark.read.parquet(dir).collect()
      .count(_.getAs[Long]("ok") < 8)
    assert(got.size == expected)
    assert(files < total, s"an ok-only range must already skip buckets: $files vs $total")
  }

  test("filters the extractor cannot use are left alone, with correct results") {
    val (_, total, _) = runOnce(identity)
    // OR at the top level: no conjunct bound — no pruning, same rows
    val (got, files, scan) = runOnce(_.where(col("pk") === 1 || col("ok") === 2))
    val expected = spark.read.parquet(dir).collect()
      .count(r => r.getAs[Long]("pk") == 1 || r.getAs[Long]("ok") == 2)
    assert(got.size == expected)
    assert(files == total, "an OR filter must not be pruned on")
    assert(!hasBucketFilter(scan))
    // a non-dim filter is untouched
    val (_, files2, scan2) = runOnce(_.where(col("l_linenumber") === 1))
    assert(files2 == total && !hasBucketFilter(scan2))
  }

  test("a vacuous bound keeps every bucket and injects nothing") {
    val (all, _, _) = runOnce(identity)
    val (got, files, scan) = runOnce(_.where(col("pk") >= 0))
    assert(!hasBucketFilter(scan),
      "no bucket filter when nothing can be pruned")
    assert(got.size == all.size)
    assert(files == 16L)
  }
}
