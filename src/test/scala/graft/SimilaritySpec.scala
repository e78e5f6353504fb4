package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{KMeans, Similarity, VecKernel}

/** IVF-PQ search invariants, verified against an independent in-test
  * reconstruction (not the DuckDB oracle): the ADC score of every
  * returned pair must equal the exact dot of the query vector against
  * the neighbor's codebook reconstruction, and every neighbor must come
  * from a probed coarse cell. */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  private def scaledVecs(): Map[Long, Array[Long]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val ev = r.getSeq[Float](1).toArray
          .map(x => math.round(x.toDouble * 1000000.0))
        r.getLong(0) -> ev
      }.toMap

  test("adc score == dot(query, pq-reconstruction of neighbor); neighbors come from probed cells") {
    val vecs = scaledVecs()
    val c = Similarity.nCentroids(vecs.size.toLong)
    val enc = VecKernel
      .ivfPqEncode(spark, dir, c, Similarity.NProbe, KMeans.PqC, KMeans.PqM)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toSet,
        r.getSeq[Int](3).toArray)))
      .toMap
    val dsub = vecs(0L).length / KMeans.PqM
    def recon(codes: Array[Int]): Array[Long] =
      Array.tabulate(vecs(0L).length)(k => vecs(codes(k / dsub).toLong)(k))
    val rows = Similarity.simIvfPqTopk(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, n, adc) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (nCell, _, nCodes) = enc(n)
      val (_, qProbes, _) = enc(q)
      assert(qProbes.contains(nCell),
        s"neighbor $n (cell $nCell) not in query $q's probes $qProbes")
      val expect = vecs(q).zip(recon(nCodes)).map { case (a, b) => a * b }.sum
      assert(adc == expect, s"adc mismatch for ($q, $n): $adc vs $expect")
    }
  }

  test("per-query results are ranked 1..k by (adc desc, neighbor asc)") {
    val byQuery = Similarity.simIvfPqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1)
    byQuery.values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to g.length))
      assert(g.length <= Similarity.IvfPqTopK)
      sorted.sliding(2).foreach {
        case Array((_, n1, a1, _), (_, n2, a2, _)) =>
          assert(a1 > a2 || (a1 == a2 && n1 < n2))
        case _ => ()
      }
    }
  }

  test("search_hybrid fuses only docs in both pools with exact reciprocal-rank scores") {
    import graft.operators.Pipeline
    val rows = Pipeline.searchHybrid(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty && rows.length <= Pipeline.HybridTopK)
    rows.foreach { case (_, rBm, rVec, rrf, _) =>
      assert(rBm >= 1 && rBm <= Pipeline.HybridPoolK)
      assert(rVec >= 1 && rVec <= Pipeline.HybridPoolK)
      // fusion is exactly 1/(k+r_bm) + 1/(k+r_vec), bit-for-bit
      assert(rrf == 1.0 / (Pipeline.RrfK + rBm) + 1.0 / (Pipeline.RrfK + rVec))
    }
    val sorted = rows.sortBy(_._5)
    assert(sorted.map(_._5).toSeq == (1 to rows.length))
    sorted.sliding(2).foreach {
      case Array((d1, _, _, s1, _), (d2, _, _, s2, _)) =>
        assert(s1 > s2 || (s1 == s2 && d1 < d2))
      case _ => ()
    }
  }

  test("search_hybrid pool sizing: duplicate-saturated fixed pools empty the fusion; scaling poolK recovers it") {
    import graft.operators.Pipeline
    import spark.implicits._
    // 20 logical docs × 10 exact copies (distinct doc_ids, identical
    // scores — the shape an un-deduped crawl hands the retriever). The
    // two sides rank the logical docs in OPPOSITE orders, so each
    // side's champions are the other's stragglers.
    val d = 10
    val logical = 0 until 20
    val lex = logical.flatMap(l => (0 until d).map(c =>
      (l.toLong * d + c, (1000 - l).toDouble))).toDF("doc_id", "score")
    val vec = logical.flatMap(l => (0 until d).map(c =>
      (l.toLong * d + c, (1000 - (19 - l)).toDouble))).toDF("doc_id", "score")
    // poolK=10: each pool holds ONLY the d copies of that side's single
    // top logical doc; the id intersection — and the fusion — is EMPTY.
    // This is SCALE.md's measured 10×-rehearsal failure, pinned.
    assert(Pipeline.rrfFuse(lex, vec, poolK = 10, topK = 20).isEmpty)
    // Scaling poolK past duplication × needed depth recovers the fusion:
    // 200 rows covers all copies of all logical docs on both sides.
    val fused = Pipeline.rrfFuse(lex, vec, poolK = 200, topK = 20).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    assert(fused.length == 20)
    fused.foreach { case (_, rBm, rVec, rrf, _) =>
      assert(rrf == 1.0 / (Pipeline.RrfK + rBm) + 1.0 / (Pipeline.RrfK + rVec))
    }
    // 1/(k+r) is convex, so with opposite rankings the two champions
    // (logical 0 and 19, symmetric ranks → equal rrf) beat the middle;
    // the doc_id tie-break makes logical 0's first copy the winner.
    val byRank = fused.sortBy(_._5)
    assert(byRank.head._1 == 0L, s"expected doc 0 first, got ${byRank.head._1}")
    assert(byRank(0)._4 == byRank(1)._4 && byRank(1)._1 == 190L,
      "logical 19's first copy ties the champion rrf and sorts second")
  }

  test("hard negatives: below the dup threshold, dense ranks, exact dots, and the exclusion actually binds") {
    import graft.operators.Dedup
    val rows = Similarity.simHardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty, "fixture must mine some negatives")
    // every mined negative is strictly below the semantic-dup threshold
    assert(rows.forall(_._3 < Dedup.SemDedupTauScaled))
    // ranks are dense 1..k per anchor, ordered by (dot desc, id asc)
    for ((q, g0) <- rows.groupBy(_._1)) {
      val g = g0.sortBy(_._4)
      assert(g.map(_._4).toSeq == (1 to g.length),
        s"ranks not dense for anchor $q")
      assert(g.map(x => (-x._3, x._2)).toSeq ==
        g.map(x => (-x._3, x._2)).sortBy(identity).toSeq,
        s"order wrong for anchor $q")
    }
    // dots are exact: recompute from the raw embeddings
    val ev = scaledVecs()
    for ((q, n, dot, _) <- rows.take(200)) {
      val want = ev(q).zip(ev(n)).map { case (a, b) => a * b }.sum
      assert(dot == want, s"dot mismatch for ($q, $n)")
    }
    // the false-negative exclusion must actually bind on the fixture:
    // the UNFILTERED candidate re-rank (sim_ivf_topk) returns pairs at
    // or above the threshold that mining must have dropped
    val dupPairs = Similarity.simIvfTopk(spark, dir).collect()
      .filter(_.getLong(2) >= Dedup.SemDedupTauScaled)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.nonEmpty, "fixture has no dup-range candidates — exclusion untested")
    val mined = rows.map(x => (x._1, x._2)).toSet
    assert(dupPairs.forall(!mined.contains(_)),
      "a dup-range pair leaked into the mined negatives")
  }

  test("bitext mining: margin inequality exact from raw embeddings, cross-lingual only, and the margin actually filters") {
    val langOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Similarity.simBitext(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty, "fixture must mine some bitext pairs")
    // direction: non-en source, en target, every pair cross-lingual
    assert(rows.forall { case (s, t, _, _, _, _) =>
      langOf(s) != "en" && langOf(t) == "en" })
    // the margin inequality holds on every emitted pair, with
    // margin_num exactly 2k·dot
    for ((_, _, dot, num, den, _) <- rows) {
      assert(num == 2L * Similarity.BitextK * dot)
      assert(num * 1000L >= Similarity.BitextThreshold1000.toLong * den)
    }
    // dots are exact: recompute from the raw embeddings
    val ev = scaledVecs()
    for ((s, t, dot, _, _, _) <- rows.take(200)) {
      val want = ev(s).zip(ev(t)).map { case (a, b) => a * b }.sum
      assert(dot == want, s"dot mismatch for ($s, $t)")
    }
    // ranks are dense 1..n per source, ordered by (dot desc, tgt asc)
    for ((s, g0) <- rows.groupBy(_._1)) {
      val g = g0.sortBy(_._6)
      assert(g.map(_._6).toSeq == (1 to g.length), s"ranks not dense for src $s")
      assert(g.map(x => (-x._3, x._2)).toSeq ==
        g.map(x => (-x._3, x._2)).sortBy(identity).toSeq, s"order wrong for src $s")
    }
    // the margin criterion must BIND on the fixture: some cross-lingual
    // candidate pair with a positive dot is rejected (raw-cosine mining
    // would have kept it)
    val mined = rows.map(x => (x._1, x._2)).toSet
    val ivf = Similarity.simIvfTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (q, n, d) =>
        langOf(q) != "en" && langOf(n) == "en" && d > 0 }
    val rejected = ivf.filterNot(x => mined.contains((x._1, x._2)))
    assert(rejected.nonEmpty,
      "no positive-dot candidate was margin-rejected — threshold not binding")
  }

  test("corpus_icp: a permutation of the corpus; every hop is the true greedy argmax") {
    val rows = Similarity.corpusIcp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // exactly one position per vector — the output IS the training
    // order (nothing dropped: unlike the search family's capped
    // candidate lists, oversized cells SHARD instead of truncating)
    assert(rows.length == total)
    assert(rows.map(_._4).distinct.length == total, "a vector repeats in the order")
    val ev = scaledVecs()
    for ((key, g0) <- rows.groupBy(r => (r._1, r._2))) {
      val chain = g0.sortBy(_._3)
      assert(chain.map(_._3).toSeq == (1 to chain.length), s"positions not dense in $key")
      assert(chain.head._5 == 0L, s"chain head of $key must carry dot_prev 0")
      // chain head is the min id of the shard
      assert(chain.head._4 == chain.map(_._4).min, s"$key must start at its min id")
      for (i <- 1 until chain.length) {
        val prev = chain(i - 1)._4; val cur = chain(i)._4
        val d = ev(prev).zip(ev(cur)).map { case (a, b) => a * b }.sum
        assert(d == chain(i)._5, s"dot_prev wrong at $key pos ${i + 1}")
        // the GREEDY invariant, replayed from the output: at this hop,
        // no later-visited member was strictly closer to prev (and on
        // ties the smaller id was taken)
        for (j <- i + 1 until chain.length) {
          val alt = chain(j)._4
          val da = ev(prev).zip(ev(alt)).map { case (a, b) => a * b }.sum
          assert(da < d || (da == d && cur < alt),
            s"hop at $key pos ${i + 1} was not the greedy argmax")
        }
      }
    }
  }

  test("ivfpq search over a stored (parquet round-tripped) index equals the inline path") {
    val c = Similarity.nCentroids(
      spark.read.parquet(s"$dir/embeddings.parquet").count())
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx").toString
    VecKernel.ivfPqEncode(spark, dir, c, Similarity.NProbe, KMeans.PqC, KMeans.PqM)
      .write.mode("overwrite").parquet(idx)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val stored = rows(Similarity.simIvfPqTopkOver(spark.read.parquet(idx)))
    val inline = rows(Similarity.simIvfPqTopk(spark, dir))
    assert(stored.nonEmpty && stored == inline)
  }

  test("index upsert: maintained index searches exactly like the rebuilt index") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val maintained = rows(Similarity.simIndexUpsert(spark, dir))
    val rebuilt = rows(Similarity.simIvfPqTopk(spark, dir))
    assert(maintained.nonEmpty && maintained == rebuilt,
      "frozen-quantizer batch encode + upsert must reconstruct the one-pass index")
  }

  test("index upsert: a re-crawled vector's fresh encoding replaces its stale stored row") {
    import org.apache.spark.sql.functions._
    // corrupt the STORED index rows for the arrival batch's ids (wrong
    // cell + zeroed codes — a stale encoding from before a re-crawl),
    // then upsert the correctly-encoded batch: update-wins must restore
    // the clean search results; keeping the stale rows must NOT
    val c = Similarity.nCentroids(
      spark.read.parquet(s"$dir/embeddings.parquet").count())
    def enc(pred: org.apache.spark.sql.Column) = VecKernel.ivfPqEncode(
      spark, dir, c, Similarity.NProbe, KMeans.PqC, KMeans.PqM, Some(pred))
    val full = enc(lit(true))
    val stale = full.withColumn("cell",
        when(col("vec_id") % Similarity.IndexUpsertMod === 1, lit(0L))
          .otherwise(col("cell")))
      .withColumn("codes",
        when(col("vec_id") % Similarity.IndexUpsertMod === 1,
          expr(s"array_repeat(0, ${KMeans.PqM})")).otherwise(col("codes")))
    val batch = enc(col("vec_id") % Similarity.IndexUpsertMod === 1)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val clean = rows(Similarity.simIvfPqTopkOver(full.repartition(col("vec_id"))))
    val healed = rows(Similarity.simIvfPqTopkOver(
      graft.operators.Snapshots.upsertOver(stale, batch, "vec_id").drop("op")
        .repartition(col("vec_id"))))
    assert(healed == clean, "upserted fresh rows must win over stale ones")
    assert(rows(Similarity.simIvfPqTopkOver(stale.repartition(col("vec_id")))) != clean,
      "the staleness must actually perturb the search (else the test proves nothing)")
  }

  test("ivfpq search leaves nothing newly persisted after its action") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Similarity.simIvfPqTopk(spark, dir).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"newly persisted RDD ids: $leaked")
  }
}
