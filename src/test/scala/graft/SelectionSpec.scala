package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Selection

/** Two-pass counting selection: differential tests against a
  * brute-force sorted ceil-rank oracle, bucket-boundary ranks,
  * duplicate-heavy and all-equal columns, permutation/partitioning
  * invariance, the empty-input `require`, and the grouped variant. */
class SelectionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** The ceil-rank definition, brute force: r-th smallest with
    * r = ceil(p*n/100), 1-indexed. */
  private def brute(vals: Seq[Long], pcts: Seq[Int]): Seq[(Int, Long, Long, Long)] = {
    val sorted = vals.sorted
    val n = vals.size.toLong
    pcts.sorted.map { p =>
      val rnk = (p * n + 99L) / 100L
      (p, rnk, n, sorted((rnk - 1).toInt))
    }
  }

  private def run(vals: Seq[Long], pcts: Seq[Int], parts: Int,
      width: Long = Selection.BucketW): Seq[(Int, Long, Long, Long)] =
    Selection.exactPctileOver(spark,
      spark.createDataset(vals).repartition(parts).toDF("cents"), pcts, width)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("matches the brute-force ceil-rank oracle on random data") {
    val rng = new scala.util.Random(42)
    val vals = Seq.fill(5000)(rng.nextLong(1000000L))
    assert(run(vals, Seq(25, 50, 75, 90, 99), 7) ==
      brute(vals, Seq(25, 50, 75, 90, 99)))
  }

  test("exactFracRanksOver: fractional targets match brute-force kth-smallest; rejects rank 0") {
    val rng = new scala.util.Random(11)
    val vals = Seq.fill(2000)(rng.nextLong(300000L))
    val fracs = Seq((1, 1L, 3L), (2, 2L, 3L), (3, 1L, 7L), (4, 7L, 7L))
    val got = Selection.exactFracRanksOver(spark,
      spark.createDataset(vals).repartition(5).toDF("cents"), fracs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val sorted = vals.sorted
    val n = vals.length.toLong
    val want = fracs.map { case (lbl, num, den) =>
      val rnk = (num * n + den - 1) / den
      (lbl, rnk, n, sorted((rnk - 1).toInt))
    }
    assert(got == want)
    // ceil(n/3) differs from the nearest integer percentile's ceil(33n/100)
    assert((1L * n + 2) / 3 != (33 * n + 99) / 100,
      "fixture must exercise the rank integer-percentiles cannot express")
    intercept[IllegalArgumentException] {
      Selection.exactFracRanksOver(spark,
        spark.createDataset(vals).toDF("cents"), Seq((0, 0L, 3L)))
    }
  }

  test("permutation and partition-count invariance") {
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(999)(rng.nextLong(50000L))
    val expect = brute(vals, Seq(50, 99))
    for (p <- Seq(1, 3, 8); vs <- Seq(vals, rng.shuffle(vals), vals.sorted.reverse))
      assert(run(vs, Seq(50, 99), p) == expect,
        s"partitions=$p must not change exact order statistics")
  }

  test("duplicate-heavy and all-equal columns") {
    // 90% of the mass is one value: p25..p90 all land on it
    val dup = Seq.fill(900)(777L) ++ (1L to 100L)
    assert(run(dup, Seq(25, 50, 75, 90, 99), 4) ==
      brute(dup, Seq(25, 50, 75, 90, 99)))
    val eq = Seq.fill(321)(4096L) // sits exactly ON a bucket boundary too
    assert(run(eq, Seq(1, 50, 100), 4) == brute(eq, Seq(1, 50, 100)))
  }

  test("ranks at bucket boundaries: values straddling b*W-1, b*W, b*W+1") {
    val w = Selection.BucketW
    // n=8 values placed around the first two boundaries; with small
    // widths every target rank sits at a bucket edge somewhere
    val vals = Seq(0L, w - 1, w, w + 1, 2 * w - 1, 2 * w, 2 * w, 3 * w)
    for (width <- Seq(2L, 7L, w))
      assert(run(vals, (1 to 100 by 7).toSeq, 3, width) ==
        brute(vals, (1 to 100 by 7).toSeq),
        s"width=$width disagreed with brute force")
  }

  test("p=100 selects the maximum; p small selects the minimum") {
    val vals = Seq(5L, 9L, 1L, 14L, 3L)
    val got = run(vals, Seq(1, 100), 2).map(t => t._1 -> t._4).toMap
    assert(got(1) == 1L && got(100) == 14L)
  }

  test("empty input fails loudly") {
    val e = intercept[IllegalArgumentException] {
      run(Seq.empty[Long], Seq(50), 1)
    }
    assert(e.getMessage.contains("empty input"))
  }

  test("grouped variant matches per-group brute force") {
    val rng = new scala.util.Random(13)
    val rows = Seq("a", "b", "c").flatMap(k =>
      Seq.fill(400 + k.hashCode.abs % 37)((k, rng.nextLong(20000L))))
    val df = spark.createDataset(rows).repartition(5).toDF("k", "cents")
    val got = Selection.exactPctileByKey(spark, df, Seq("k"), Seq(25, 50, 99))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val expect = rows.groupBy(_._1).flatMap { case (k, vs) =>
      brute(vs.map(_._2), Seq(25, 50, 99)).map(t => (k, t._1, t._2, t._3, t._4))
    }.toSet
    assert(got == expect)
  }

  test("withMinMax: per-group exact extremes ride the pass-2 slice") {
    val rng = new scala.util.Random(29)
    val rows = Seq("a", "b").flatMap(k =>
      Seq.fill(300)((k, rng.nextLong(1L << 30)))) // extremes far from the median buckets
    val df = spark.createDataset(rows).repartition(4).toDF("k", "cents")
    val got = Selection
      .exactPctileByKey(spark, df, Seq("k"), Seq(50), withMinMax = true)
      .collect().map(r => (r.getString(0), (r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    for (k <- Seq("a", "b")) {
      val vs = rows.filter(_._1 == k).map(_._2)
      assert(got(k) == ((vs.sorted.apply((vs.size + 1) / 2 - 1), vs.min, vs.max)),
        s"group $k: median/min/max mismatch")
    }
  }

  test("pass-2 filter reaches a parquet scan as pushed range predicates") {
    // the kernel's pass-2 predicate must arrive at the source as
    // bare-column >=/< comparisons (parquet row-group min/max can
    // evaluate those); the old `cents div W IN (...)` form could not
    // push at all. Pin it against a real parquet scan of a STORED
    // cents column — the layout the scaladoc's at-scale claim assumes.
    val dir = java.nio.file.Files.createTempDirectory("selpush").toString
    val rng = new scala.util.Random(3)
    spark.createDataset(Seq.fill(2000)(rng.nextLong(1L << 20)))
      .toDF("cents").write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val pred = (col("cents") >= lit(0L) && col("cents") < lit(4096L)) ||
      (col("cents") >= lit(8192L) && col("cents") < lit(12288L))
    val plan = stored.where(pred).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(cents") || plan.contains("Or(And(")),
      s"range predicate did not push to the parquet source:\n$plan")
  }

  test("exactPctileKeyedWide: identical to the driver-walk keyed kernel and the brute oracle") {
    val rng = new scala.util.Random(17)
    val rows = Seq("a", "b", "c").flatMap(k =>
      Seq.fill(200 + k.hashCode.abs % 97)((k, rng.nextLong(1L << 22))))
    val df = spark.createDataset(rows).repartition(5).toDF("k", "cents")
    val pcts = Seq(25, 50, 75, 99)
    def asMap(r: Array[org.apache.spark.sql.Row]) =
      r.map(x => (x.getString(0), x.getInt(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    val wide = asMap(Selection.exactPctileKeyedWide(df, Seq("k"), pcts)
      .select("k", "p", "rnk", "n", "cents").collect())
    val narrow = asMap(Selection.exactPctileByKey(spark, df, Seq("k"), pcts)
      .select("k", "p", "rnk", "n", "cents").collect())
    assert(wide == narrow,
      "distributed keyed kernel must equal the driver-walk kernel row for row")
    for (k <- Seq("a", "b", "c")) {
      val vs = rows.filter(_._1 == k).map(_._2)
      val expect = brute(vs, pcts).map(t => (k, t._1) -> (t._2, t._3, t._4)).toMap
      assert(pcts.forall(p => wide((k, p)) == expect((k, p))), s"group $k vs brute")
    }
    // bucket-boundary ranks: every value equal, sitting ON a boundary
    val eq = spark.createDataset(Seq.fill(97)(("z", Selection.BucketW)))
      .toDF("k", "cents")
    val got = asMap(Selection.exactPctileKeyedWide(eq, Seq("k"), Seq(1, 100))
      .select("k", "p", "rnk", "n", "cents").collect())
    assert(got(("z", 1)) == ((1L, 97L, Selection.BucketW)) &&
      got(("z", 100)) == ((97L, 97L, Selection.BucketW)))
  }

  test("high-cardinality grouping trips the driver-state guard, never floods the driver") {
    // MaxDriverRows+1 one-row groups: the pass-1 histogram has exactly
    // one row per group, so the DEFAULT bound must fire. The guard's
    // own collect is a LIMIT(bound+1) — this test completing in seconds
    // (not OOMing) is itself evidence the check never materializes the
    // unbounded result it rejects.
    val wide = spark.range(Selection.MaxDriverRows + 1L)
      .select(col("id").cast("string").as("k"), col("id").as("cents"))
    val e = intercept[IllegalArgumentException] {
      Selection.exactPctileByKey(spark, wide, Seq("k"), Seq(50))
    }
    assert(e.getMessage.contains("QuantileAgg") &&
      e.getMessage.contains("MaxDriverRows"),
      s"guard message must route callers to the sketch: ${e.getMessage}")
  }
}
