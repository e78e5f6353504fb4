package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Features

/** Feature-engineering gates: scaling math vs a driver-side brute
  * recompute, bucket edge behavior, catalog index stability, and the
  * hashing trick's determinism. */
class FeaturesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("feat_scale: z and minmax match a driver-side brute recompute per group") {
    val rows = Features.featScale(spark, dir).collect()
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = raw.groupBy(_._2)
    val stats = byLang.map { case (lang, rs) =>
      val xs = rs.map(_._3)
      val n  = xs.length.toDouble
      val sx = xs.map(BigDecimal(_)).sum
      val sxx = xs.map(x => BigDecimal(x) * BigDecimal(x)).sum
      val mean = sx.toDouble / n
      val variance = (sxx.toDouble - sx.toDouble * sx.toDouble / n) / n
      (lang, (mean, variance, xs.min, xs.max))
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, x, z, mm) = (r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      val (mean, variance, lo, hi) = stats(lang)
      val wantZ = if (variance <= 0.0) 0.0 else (x - mean) / math.sqrt(variance)
      val wantM = if (hi == lo) 0.0 else (x - lo).toDouble / (hi - lo).toDouble
      assert(z == wantZ, s"z of doc ${r.getLong(0)}")
      assert(mm == wantM, s"minmax of doc ${r.getLong(0)}")
    }
    // and each group's z-scores are actually standardized
    val out = rows.map(r => (r.getString(1), r.getDouble(3)))
    for ((lang, zs) <- out.groupBy(_._1); vals = zs.map(_._2)) {
      assert(math.abs(vals.sum / vals.length) < 1e-9, s"mean(z) for $lang")
    }
  }

  test("feat_bucketize: edges land in-range, extremes hit first/last buckets") {
    val rows = Features.featBucketize(spark, dir).collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val lo = rows.map(_._1).min; val hi = rows.map(_._1).max
    rows.foreach { case (v, b) =>
      assert(b >= 0 && b < Features.NBuckets, s"bucket $b for $v")
      val want = math.min(math.floor((v - lo) * Features.NBuckets / (hi - lo)),
        (Features.NBuckets - 1).toDouble).toInt
      assert(b == want, s"bucket of $v")
    }
    assert(rows.find(_._1 == lo).get._2 == 0)
    assert(rows.find(_._1 == hi).get._2 == Features.NBuckets - 1)
  }

  test("feat_onehot: indices are dense, 0-based, and sorted by feature name") {
    val cat = Features.featOnehot(spark, dir)
      .select(col("feat"), col("idx")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(cat.map(_._2).toSeq == cat.indices.map(_.toLong).toSeq, "dense 0-based")
    assert(cat.map(_._1).toSeq == cat.map(_._1).sorted.toSeq, "sorted by name")
    assert(cat.exists(_._1.startsWith("lang=")) && cat.exists(_._1.startsWith("source=")))
  }

  test("feat_quantile_bucketize: edges equal brute ceil-rank quartiles; bins equal-frequency-ish") {
    val rows = Features.featQuantileBucketize(spark, dir).collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    val cents = rows.map { case (v, _) => math.floor(v * 100.0).toLong }.sorted
    val n = cents.length
    def edge(p: Int) = cents(((p * n + 99) / 100 - 1).toInt)
    val (q1, q2, q3) = (edge(25), edge(50), edge(75))
    rows.foreach { case (v, b) =>
      val c = math.floor(v * 100.0).toLong
      val want = (if (c > q1) 1 else 0) + (if (c > q2) 1 else 0) + (if (c > q3) 1 else 0)
      assert(b == want, s"bucket of $v")
    }
    // quartiles: each bin holds ~n/4 (exact up to ties at the edges)
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3))
    sizes.values.foreach(sz => assert(math.abs(sz - n / 4.0) <= n * 0.05, s"bin sizes $sizes"))
  }

  test("feat_target_encode: matches a driver-side brute recompute; rare categories shrink to global mean") {
    val rows = Features.featTargetEncode(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    val raw = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100.0).toLong))
    val gMean = raw.map(_._2).sum.toDouble / 100.0 / raw.length
    val byCat = raw.groupBy(_._1)
    rows.foreach { case (cat, nCat, enc) =>
      val cs = byCat(cat).map(_._2).sum
      assert(nCat == byCat(cat).length)
      val want = (cs.toDouble / 100.0 + Features.SmoothM * gMean) / (nCat + Features.SmoothM)
      assert(enc == want, s"encoding of $cat")
      // shrinkage: the encoding sits between the raw category mean and
      // the global mean
      val catMean = cs.toDouble / 100.0 / nCat
      assert((enc - catMean) * (enc - gMean) <= 1e-9, s"$cat not between means")
    }
  }

  test("stream_feat_scale: folded stats equal the one-shot aggregation; replay is a no-op") {
    import graft.streaming.FeatureStream
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val mid = 250L
    val (b1, b2) = (d.where(col("doc_id") <= mid), d.where(col("doc_id") > mid))
    val table = java.nio.file.Files.createTempDirectory("graft-fsc").toString
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getDecimal(1), r.getDecimal(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    FeatureStream.scaleSink(table)(b1, 0L)
    FeatureStream.scaleSink(table)(b2, 1L)
    val oneShot = stats(graft.operators.Features.statsOf(d))
    assert(oneShot.nonEmpty)
    assert(stats(FeatureStream.storedStats(spark, table)) == oneShot,
      "folded stats must equal the one-shot aggregation")
    // non-idempotent sums: replaying batch 1 must NOT double-add (the
    // versioned sink re-merges from the same predecessor)
    FeatureStream.scaleSink(table)(b2, 1L)
    assert(stats(FeatureStream.storedStats(spark, table)) == oneShot,
      "batch replay must be a no-op")
    // scoring under folded stats == the batch gate == feat_scale
    val viaFold = FeatureStream.streamFeatScale(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val oneShotScore = graft.operators.Features.featScale(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(viaFold == oneShotScore)
  }

  test("feat_hashed_cross: buckets deterministic, in range, and collision-consistent") {
    val a = Features.featHashedCross(spark, dir).collect()
      .map(r => (r.getString(1), r.getInt(2)))
    assert(a.forall { case (_, b) => b >= 0 && b < Features.HashBuckets })
    // same cross -> same bucket, across rows and across runs
    val byCross = a.groupBy(_._1).map { case (c, bs) => c -> bs.map(_._2).distinct }
    assert(byCross.values.forall(_.size == 1), "a cross must map to one bucket")
    val b = Features.featHashedCross(spark, dir).collect()
      .map(r => (r.getString(1), r.getInt(2))).toMap
    byCross.foreach { case (c, bs) => assert(b(c) == bs.head) }
  }
}
