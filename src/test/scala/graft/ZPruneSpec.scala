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

  // ------------------------------------------------ membership (bloom)

  /** A second layout whose z dims are INDEPENDENT of l_orderkey, so a
    * point lookup on it can only be skipped by the membership bitmaps
    * — every bucket's orderkey ENVELOPE spans the whole domain. */
  lazy val bloomDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-bloomprune").toString
    val m = 1L << ZPrune.MBits
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"),
        expr(s"l_suppkey % $m").as("sd"), expr(s"l_partkey % $m").as("pd"))
    ZPrune.writeLayout(df, d, "sd", "pd", buckets = 64,
      bloomCol = Some("l_orderkey"))
    ZPrune.attach(spark, d)
    d
  }

  private def runBloom(q: DataFrame => DataFrame)
      : (Seq[String], Long, FileSourceScanExec) = {
    val df = q(spark.read.parquet(bloomDir))
    val rows = df.collect().map(_.toString).sorted.toSeq
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1)
    (rows, scans.head.metrics("numFiles").value, scans.head)
  }

  test("point lookup: membership bitmaps skip files the envelopes cannot") {
    val (all, totalFiles, _) = runBloom(identity)
    val (got, files, scan) = runBloom(_.where(col("l_orderkey") === 7L))
    val expected = spark.read.parquet(bloomDir).collect()
      .filter(_.getAs[Long]("l_orderkey") == 7L).map(_.toString).sorted.toSeq
    assert(got == expected, "membership skipping must never change results")
    assert(got.nonEmpty, "key 7 must exist or this pins nothing")
    assert(got.size < all.size)
    // the real claim: orderkey is uniform across buckets (vacuous
    // envelopes), yet the scan reads only the buckets whose bitmap
    // might contain the key — strictly fewer than half the files
    assert(files < totalFiles / 2,
      s"membership must prune most files: $files of $totalFiles")
    assert(hasBucketFilter(scan),
      s"expected an injected bucket partition filter: ${scan.partitionFilters}")
  }

  test("IN-list lookup keeps exactly the union of candidate buckets") {
    val (_, totalFiles, _) = runBloom(identity)
    val (got, files, scan) =
      runBloom(_.where(col("l_orderkey").isin(7L, 32L)))
    val expected = spark.read.parquet(bloomDir).collect()
      .filter(r => Set(7L, 32L)(r.getAs[Long]("l_orderkey")))
      .map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(files < totalFiles, s"IN must still skip: $files of $totalFiles")
    assert(hasBucketFilter(scan))
  }

  test("absent key: zero rows, near-zero files, no error") {
    val absent = spark.read.parquet(bloomDir)
      .agg(max(col("l_orderkey"))).collect()(0).getLong(0) + 5L
    val (got, files, _) = runBloom(_.where(col("l_orderkey") === absent))
    assert(got.isEmpty)
    // only false-positive buckets survive; at fixture fill that is a
    // small minority (never a correctness condition — just the skip)
    val (_, totalFiles, _) = runBloom(identity)
    assert(files < totalFiles / 2, s"$files of $totalFiles")
  }

  test("a range over the bloom column contributes no probe (kept, correct)") {
    val (_, totalFiles, _) = runBloom(identity)
    val (got, files, scan) = runBloom(_.where(col("l_orderkey") <= 7L))
    val expected = spark.read.parquet(bloomDir).collect()
      .count(_.getAs[Long]("l_orderkey") <= 7L)
    assert(got.size == expected)
    assert(files == totalFiles, "no range semantics in a membership sketch")
    assert(!hasBucketFilter(scan))
  }

  test("BloomAgg: merge is OR, membership is complete (no false negatives)") {
    import graft.functions.BloomAgg
    val agg = new BloomAgg
    val left = (1L to 50L).foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val right = (51L to 100L).foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val merged = agg.merge(left, right).toIndexedSeq
    assert((1L to 100L).forall(BloomAgg.mightContain(merged, _)),
      "every inserted key must test positive")
  }
}
