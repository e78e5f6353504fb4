package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, Dedup}

/** Ground-truth corpus tests for the corpus-level operators (TF-IDF,
  * bigram counts, stratified sampling) and near-dup connected
  * components. */
class CorpusOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Corpus with a planted 3-doc near-dup chain (0≈1, 1≈2 — but 0 and 2
    * still share most shingles) + distinct docs, for CC transitivity. */
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the deep green forest tonight"
    val v1 = base.replace("tonight", "today")
    val v2 = base.replace("quick", "swift")
    Seq(
      (0L, base, "en", "srcA", base.length.toLong),
      (1L, v1, "en", "srcA", v1.length.toLong),
      (2L, v2, "en", "srcB", v2.length.toLong),
      (3L, "completely different words about spark engines shuffling partitions with columnar vectors", "en", "srcB", 90L),
      (4L, "zebra yak xylophone walrus viper unicorn tiger snake rabbit quail", "de", "srcC", 66L),
      (5L, "pepper pepper pepper salt salt sugar", "de", "srcC", 36L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_cc clusters the near-dup chain transitively with one canonical id") {
    val rows = Dedup.dedupCc(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(rows.size === 6)
    // 0,1,2 one cluster, canonical = min id = 0
    assert(rows(0L) === ((0L, 3L, 1)))
    assert(rows(1L) === ((0L, 3L, 0)))
    assert(rows(2L) === ((0L, 3L, 0)))
    // 3,4,5 singletons, each its own canonical
    Seq(3L, 4L, 5L).foreach { id => assert(rows(id) === ((id, 1L, 1))) }
  }

  test("ta_tfidf scores tf·N/df and ranks deterministically") {
    val all = CorpusOps.taTfidf(spark, dir).collect()
    // doc 5: pepper×3, salt×2, sugar×1, all df=1 (unique to doc 5) →
    // scores 18/12/6 with N=6, ranks 1/2/3; fewer terms than TopK keeps all 3
    val d5 = all.filter(_.getLong(0) == 5L)
      .map(r => (r.getInt(r.fieldIndex("rnk")), r.getString(r.fieldIndex("term")),
        r.getDouble(r.fieldIndex("score")))).sortBy(_._1).toSeq
    assert(d5 === Seq((1, "pepper", 18.0), (2, "salt", 12.0), (3, "sugar", 6.0)))
    // docs with >TopK distinct terms are capped at TopK rows
    assert(all.count(_.getLong(0) == 0L) === CorpusOps.TfidfTopK)
  }

  test("ta_bigrams counts occurrences (not per-doc distinct) with deterministic order") {
    val rows = CorpusOps.taBigrams(spark, dir).collect()
    val cnt = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // "pepper pepper" occurs twice inside doc 5 alone
    assert(cnt("pepper pepper") === 2L)
    // "the lazy" occurs once in each of docs 0,1,2
    assert(cnt("the lazy") === 3L)
    // sorted by cnt desc then bigram asc
    val sorted = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(sorted === sorted.sorted)
  }

  test("sample_fixed_k keeps at most K per stratum, deterministically") {
    val rows = CorpusOps.sampleFixedK(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(0), r.getInt(3)))
    val perStratum = rows.groupBy(t => (t._1, t._2))
    assert(perStratum.values.forall(_.length <= CorpusOps.SampleK))
    // rn is 1..k within each stratum
    perStratum.values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.length).toSeq)
    }
    val again = CorpusOps.sampleFixedK(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(0), r.getInt(3)))
    assert(rows.sortBy(_._3).toSeq === again.sortBy(_._3).toSeq)
  }

  test("emb_centroids averages scaled-int vectors per (label, dim)") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.operators.CorpusOps.embCentroids(spark, sf).collect()
    val dims = out.map(_.getInt(out.head.fieldIndex("dim"))).distinct.length
    val labels = out.map(_.getInt(out.head.fieldIndex("label"))).distinct.length
    assert(out.length === dims * labels)
    // n_vecs is constant across dims within a label (every vector has
    // every dimension)
    out.groupBy(_.getInt(out.head.fieldIndex("label"))).values.foreach { g =>
      assert(g.map(_.getLong(g.head.fieldIndex("n_vecs"))).distinct.length === 1)
    }
  }

  test("ta_bm25 hits only query terms and saturates with tf") {
    val sf = "/root/testdata/sf0.001"
    val out = CorpusOps.taBm25(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val hits = r.getLong(r.fieldIndex("n_terms_hit"))
      assert(hits >= 1 && hits <= CorpusOps.Bm25Query.length)
      assert(r.getDouble(r.fieldIndex("bm25_total")) > 0.0)
    }
  }

  test("dedup_cc and sample_fixed_k are invariant to shuffle partitioning") {
    val conf = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(conf)
    def snap(): (Seq[(Long, Long)], Seq[Long]) = (
      Dedup.dedupCc(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq,
      CorpusOps.sampleFixedK(spark, dir).collect()
        .map(_.getLong(0)).sorted.toSeq)
    try {
      spark.conf.set(conf, "3")
      val a = snap()
      spark.conf.set(conf, "13")
      val b = snap()
      assert(a === b)
    } finally spark.conf.set(conf, old)
  }

  test("sample_stratified is a deterministic md5 filter") {
    val a = CorpusOps.sampleStratified(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
    val b = CorpusOps.sampleStratified(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    // buckets are in [0, SampleRatePct)
    val buckets = CorpusOps.sampleStratified(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("bucket")))
    assert(buckets.forall(x => x >= 0 && x < CorpusOps.SampleRatePct))
  }

  test("sample_mixture keeps exactly the md5 buckets below each language's integer rate") {
    // independent first-principles recompute on the real fixture (all 5
    // mixture languages present there, unlike this suite's 2-lang corpus)
    val fdir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$fdir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val total = docs.length.toLong
    val nLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pct = CorpusOps.MixTargetPct.toMap
    val ratePpm: Map[String, Long] = nLang.collect {
      case (l, n) if pct.contains(l) =>
        l -> math.min(1000000L, (total / CorpusOps.MixBudgetDen) * pct(l) / 100 * 1000000L / n)
    }.toMap
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val expected = docs.collect {
      case (id, l) if ratePpm.contains(l) && bucket(id) < ratePpm(l) => id
    }.toSet
    val got = CorpusOps.sampleMixture(spark, fdir).collect()
    assert(got.map(_.getLong(0)).toSet == expected)
    // the rate column reports the audited per-language keep rate
    got.foreach(r => assert(r.getLong(2) == ratePpm(r.getString(1))))
    // under-represented strata clamp at keep-everything, never oversample
    assert(ratePpm.values.forall(_ <= 1000000L))
  }

  test("ta_lm_score: hand-computed bigram conditional probabilities, exact fold") {
    val d = java.nio.file.Files.createTempDirectory("graft-lm").toString
    // corpus LM: c("a b")=3, c("b a")=1, c("b c")=1; left counts a=3, b=2
    // -> p("a b")=1.0, p("b a")=0.5, p("b c")=0.5
    Seq(
      (0L, "a b a b", "en", "s", 7L),
      (1L, "a b c", "en", "s", 5L),
      (2L, "z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val m = CorpusOps.taLmScore(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc 0: bigrams [a b, b a, a b] -> sorted fold 0.5+1.0+1.0
    assert(m(0L) == ((3L, ((0.5 + 1.0) + 1.0) / 3.0, 0.5)))
    // doc 1: [a b, b c] -> 0.5+1.0 over 2
    assert(m(1L) == ((2L, (0.5 + 1.0) / 2.0, 0.5)))
    // doc 2: too short for a bigram
    assert(m(2L) == ((0L, 0.0, 0.0)))
  }

  test("ta_lm_score_vs: reference-trained LM with OOV accounting; self-reference equals the gate path") {
    val d = java.nio.file.Files.createTempDirectory("graft-lmvs").toString
    Seq(
      (0L, "a b a b", "en", "s", 7L),
      (1L, "a b c", "en", "s", 5L),
      (2L, "z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    // self-reference: OOV impossible, must equal taLmScore minus the
    // (all-zero) oov column
    val self = CorpusOps.taLmScoreVs(docs, docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val gate = CorpusOps.taLmScore(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    self.foreach { case (id, (n, oov, score, minP)) =>
      assert(oov == 0L)
      assert(gate(id) == ((n, score, minP)))
    }
    // external reference "a b" only: LM has c("a b")=1, left a=1 ->
    // p("a b")=1.0; "b a" and "b c" are OOV (p=0)
    val ref = Seq((100L, "a b", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val vs = CorpusOps.taLmScoreVs(docs, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(vs(0L) == ((3L, 1L, (0.0 + 1.0 + 1.0) / 3.0, 0.0)),
      "doc 0: two 'a b' hits + one OOV 'b a'")
    assert(vs(1L) == ((2L, 1L, (0.0 + 1.0) / 2.0, 0.0)),
      "doc 1: one 'a b' + OOV 'b c'")
    assert(vs(2L) == ((0L, 0L, 0.0, 0.0)))
  }

  test("ta_lm_kn: hand-computed interpolated Kneser–Ney probabilities, exact fold") {
    val d = java.nio.file.Files.createTempDirectory("graft-kn").toString
    // cBi: c("a b")=3, c("b a")=1, c("b c")=1; NB=3 types;
    // left a: cl=3,n1l=1; left b: cl=2,n1l=2; right n1r(a)=n1r(b)=n1r(c)=1
    // p("a b") = [(12−3)·3 + 3·1·1]/(4·3·3) = 30/36
    // p("b a") = p("b c") = [(4−3)·3 + 3·2·1]/(4·2·3) = 9/24 = 0.375
    Seq(
      (0L, "a b a b", "en", "s", 7L),
      (1L, "a b c", "en", "s", 5L),
      (2L, "z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val m = CorpusOps.taLmKn(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val pAB = 30.0 / 36.0
    assert(m(0L) == ((3L, (((0.0 + 0.375) + pAB) + pAB) / 3.0, 0.375)),
      "doc 0: [a b, b a, a b], sorted fold")
    assert(m(1L) == ((2L, ((0.0 + 0.375) + pAB) / 2.0, 0.375)))
    assert(m(2L) == ((0L, 0.0, 0.0)), "too short for a bigram")
    // self-reference Vs equals the gate path with an all-zero oov column
    val docs = spark.read.parquet(s"$d/documents.parquet")
    CorpusOps.taLmKnVs(docs, docs).collect().foreach { r =>
      assert(r.getLong(2) == 0L, "self-reference OOV impossible")
      assert(m(r.getLong(0)) == ((r.getLong(1), r.getDouble(3), r.getDouble(4))))
    }
  }

  test("ta_lm_kn_vs: smoothing tiers — unseen transition > 0, continuation backoff for unseen context, true-OOV accounting") {
    // reference "a b a c": cBi {a b:1, b a:1, a c:1}, NB=3;
    // left a: cl=2,n1l=2; left b: cl=1,n1l=1; right n1r(a)=n1r(b)=n1r(c)=1
    val ref = Seq((100L, "a b a c", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = Seq(
      (0L, "a c b z b", "en", "s", 9L), // (a c) seen; (c b) ctx-unseen; (b z) w2-OOV; (z b) ctx-unseen
      (1L, "b b", "en", "s", 3L))       // (b b): both words seen, transition unseen
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val vs = CorpusOps.taLmKnVs(corpus, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // (a c) = [(4−3)·3 + 3·2·1]/(4·2·3) = 9/24; (c b)/(z b) back off to
    // n1r(b)/NB = 1/3; (b z): w2 never seen → 0, the one true OOV
    val third = 1.0 / 3.0
    assert(vs(0L) == ((4L, 1L, ((((0.0 + 0.375) + third) + third)) / 4.0, 0.0)))
    // the KN point: a both-words-seen but never-observed transition gets
    // real probability mass 3·n1l(b)·n1r(b)/(4·cl(b)·NB) = 3/12 = 0.25
    assert(vs(1L) == ((1L, 0L, 0.25, 0.25)))
  }

  test("ta_lm_kn: probabilities normalize — per seen context, scores over the right-vocabulary sum to 1") {
    val ref = Seq((100L, "a b a c", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // one probe doc per (context, continuation) pair over the LM's
    // right-vocabulary {a,b,c}: each probe's kn_score IS p(w2|w1)
    val vocab = Seq("a", "b", "c")
    val probes = (for {
      (w1, i) <- Seq("a", "b").zipWithIndex
      (w2, j) <- vocab.zipWithIndex
    } yield ((i * 10 + j).toLong, s"$w1 $w2", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val p = CorpusOps.taLmKnVs(probes, ref).collect()
      .map(r => (r.getLong(0) / 10, r.getDouble(3)))
    val sums = p.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // exact on the integer numerators (den = Σ num per context); the
    // double sum re-associates, so assert to IEEE slack
    Seq(0L, 1L).foreach { ctx =>
      assert(math.abs(sums(ctx) - 1.0) < 1e-12, s"context $ctx mass ${sums(ctx)}")
    }
  }

  test("pipeline_ppl: CCNet terciles — total, value-ordered buckets, ceil-rank cut sizes, deterministic") {
    val sf = "/root/testdata/sf0.01"
    val out = graft.operators.Pipeline.pipelinePpl(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getString(4)))
    Graft.releaseState(spark)
    val nRest = spark.read.parquet(s"$sf/documents.parquet")
      .where($"doc_id" % 3 =!= 0).count()
    assert(out.length.toLong == nRest, "every non-reference doc is bucketed")
    val byB = out.groupBy(_._3).view.mapValues(_.map(t => math.floor(t._2 * 1e12).toLong)).toMap
    assert(byB.keySet == Set("tail", "middle", "head"), "all terciles populated")
    // value cuts: buckets are totally ordered on the integer cut key
    assert(byB("tail").max < byB("middle").min)
    assert(byB("middle").max < byB("head").min)
    // ceil-rank semantics: strictly fewer than ceil(k·n/3) fall below cut k
    val n = out.length.toLong
    assert(byB("tail").size < (n + 2) / 3)
    assert(byB("tail").size + byB("middle").size < (2 * n + 2) / 3)
    // deterministic end to end
    val again = graft.operators.Pipeline.pipelinePpl(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getString(4)))
    Graft.releaseState(spark)
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("corpus_shuffle: a seeded permutation — every doc exactly once, dense pos per shard, same seed identical, next epoch different") {
    val big = "/root/testdata/sf0.01" // 500-doc fixture gives the balance check teeth
    val e1 = CorpusOps.corpusShuffleWith(spark, big, seed = 1, nShards = 8).collect()
    val n = spark.read.parquet(s"$big/documents.parquet").count()
    assert(e1.length == n, "a shuffle is a permutation: no doc dropped or duplicated")
    assert(e1.map(_.getLong(0)).distinct.length == n)
    // pos is dense 1..|shard| inside every shard (a reader can stream it)
    e1.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length),
        s"shard $shard pos not dense")
    }
    // deterministic: the same seed reproduces the identical order
    val e1b = CorpusOps.corpusShuffleWith(spark, big, seed = 1, nShards = 8).collect()
    assert(e1.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet ==
      e1b.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
    // epoch 2 is a genuinely different permutation
    val e2 = CorpusOps.corpusShuffleWith(spark, big, seed = 2, nShards = 8).collect()
    val m1 = e1.map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val moved = e2.count(r => m1(r.getLong(0)) != ((r.getInt(1), r.getInt(2))))
    assert(moved > n / 2, s"only $moved/$n docs moved between epochs")
    // md5 spreads: no shard is empty or >2x the mean (uniform hashing)
    val sizes = e1.groupBy(_.getInt(1)).view.mapValues(_.length)
    assert(sizes.size == 8 && sizes.values.max <= 2 * n.toInt / 8,
      s"shard sizes: ${sizes.toMap}")
  }

  test("corpus_split: disjoint, exhaustive, and a doc's split never depends on other docs") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val split = CorpusOps.corpusSplit(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val n = Tables.documents(spark, dir).count()
    assert(split.size == n, "every doc gets exactly one split")
    val byS = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    // ~90/5/5 within generous tolerance at 500 docs
    assert(byS("train") > n * 8 / 10 && byS("val") + byS("test") < n / 4, s"$byS")
    // corpus-independence: the split of the doc_ids that ALSO exist at
    // sf0.01 must be identical — adding docs never moves existing ones
    val bigger = CorpusOps.corpusSplit(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    split.foreach { case (id, sp) =>
      assert(bigger(id) == sp, s"doc $id moved split when the corpus grew")
    }
  }

  test("corpus_report: the data card reconciles against its component operators") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val card = CorpusOps.corpusReport(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val docs = Tables.documents(spark, dir)
    assert(card.values.map(_._1).sum == docs.count(), "doc counts partition the corpus")
    val dups = Dedup.dedupExact(spark, dir).where(col("is_dup") === 1).count()
    assert(card.values.map(_._2).sum == dups, "dup counts reconcile")
    card.values.foreach { case (nd, dup, q) =>
      assert(dup <= nd && q <= nd, "per-source counts bounded by docs")
    }
  }

  test("sample_importance: target-like raw docs outrank off-distribution ones, deterministically") {
    import org.apache.spark.sql.functions._
    // target speaks "alpha beta gamma"; one raw doc speaks the target's
    // language, one speaks words the target never uses, one is empty
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "t"),
      (2L, "beta gamma alpha gamma", "t"),
      (10L, "alpha beta gamma beta alpha gamma", "r"), // on-distribution
      (11L, "zulu xray whiskey victor uniform zulu", "r"), // off-distribution
      (12L, "", "r")) // zero tokens
      .toDF("doc_id", "text", "side")
    val out = CorpusOps.sampleImportanceOver(docs, col("side") === "t", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    // target rows never appear in the output pool
    assert(out.keySet == Set(10L, 11L, 12L))
    val (n10, s10, k10) = out(10L)
    val (n11, s11, k11) = out(11L)
    val (n12, s12, k12) = out(12L)
    assert(n10 == 6 && n11 == 6 && n12 == 0 && s12 == 0)
    assert(s10 > s11, s"on-distribution doc must outscore off-distribution: $s10 vs $s11")
    assert(s11 < 0, "tokens the target never uses score negative")
    // keepK = 2: the empty doc's neutral 0 (likelihood ratio 1 — it
    // contains no evidence either way) outranks the off-distribution
    // doc's negative score, so {10, 12} are kept
    assert(k10 == 1 && k12 == 1 && k11 == 0)
  }

  test("sample_importance keeps exactly min(K, pool) and ties break by doc_id") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "same words here", "t"),
      (20L, "same words here", "r"),
      (21L, "same words here", "r"),
      (22L, "same words here", "r"))
      .toDF("doc_id", "text", "side")
    val out = CorpusOps.sampleImportanceOver(docs, col("side") === "t", 2)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // all three raw docs tie on score: the two SMALLEST ids win
    assert(out == Map(20L -> 1, 21L -> 1, 22L -> 0))
  }

  test("epoch mix: per-source multiplicities, distinct per-epoch orders, contiguous positions") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val m = CorpusOps.sampleEpochMix(spark, sf)
    val docs = Tables.documents(spark, sf)
    // each doc appears exactly (its source's multiplier) times
    val perDoc = m.groupBy(col("doc_id"), col("source")).agg(countDistinct(col("epoch")).as("k"),
        count(lit(1)).as("n"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val want = CorpusOps.EpochMixTargets.getOrElse(r.getString(1), 1).toLong
      assert(r.getLong(2) == want && r.getLong(3) == want,
        s"doc ${r.getLong(0)} (${r.getString(1)}): ${r.getLong(3)} copies, want $want")
    }
    assert(perDoc.length == docs.count())
    // epochs permute independently: epoch 1 and 2 must order the shared
    // src1 docs differently (md5 keyed by epoch — collisions would mean
    // the training loop replays the same order every epoch)
    val ord = m.where(col("source") === "src1")
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
      .collect().groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(r => (r.getInt(1), r.getInt(2))).map(_.getLong(3)).toSeq).toMap
    assert(ord(1) != ord(2), "epoch permutations must differ")
    assert(ord(1).toSet == ord(2).toSet && ord(2).toSet == ord(3).toSet)
    // positions are 1..k contiguous within every (epoch, shard)
    val bad = m.groupBy(col("epoch"), col("shard"))
      .agg(min(col("pos")).as("lo"), max(col("pos")).as("hi"), count(lit(1)).as("n"))
      .where(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(bad == 0L)
  }

  test("entropy: collapse scores zero, all-distinct scores n*ilog2(n), empty scores zero") {
    val h = CorpusOps.taEntropy(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 5: "pepper pepper pepper salt salt sugar" — n=6, counts 3,2,1
    // h = 6*ilog2(6) − (3*ilog2(3) + 2*ilog2(2) + 1*ilog2(1)) = 12 − 5 = 7
    assert(h(5L) == (6L, 3L, 7L), s"doc 5: ${h(5L)}")
    // doc 3: 11 distinct words — h = 11*ilog2(11) = 33
    assert(h(3L) == (11L, 11L, 33L), s"doc 3: ${h(3L)}")
    // identical docs score identically; a single-token doc scores 0
    assert(h(0L) == h(1L))
    // h_int = 0 iff the distribution is a single repeated term
    val collapsed = Seq((100L, "spam spam spam spam", "en", "x", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d2 = java.nio.file.Files.createTempDirectory("graft-ent").toString
    collapsed.write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val h2 = CorpusOps.taEntropy(spark, d2).collect()(0)
    assert((h2.getLong(1), h2.getLong(2), h2.getLong(3)) == (4L, 1L, 0L))
  }

  test("corpus_rank: exact permutation matching the driver-side total order") {
    val sf = "/root/testdata/sf0.001"
    val got = CorpusOps.corpusRank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = got.length
    assert(got.map(_._3).sorted.toSeq == (1L to n).toSeq,
      "ranks must be a permutation of 1..n")
    // the bucketed two-phase rank must equal the single-order truth
    val want = got.map(t => (t._2, t._1)).sorted.zipWithIndex
      .map { case ((_, id), i) => id -> (i + 1L) }.toMap
    assert(got.forall { case (id, _, r) => want(id) == r },
      "two-phase rank diverged from the global key order")
  }

  test("waterfall: tiers disjoint and exhaustive, each reconciles with its member operator") {
    import graft.operators.{Dedup, Pipeline}
    val sf = "/root/testdata/sf0.001" // needs the embeddings table too
    val rows = Pipeline.corpusWaterfall(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    for ((src, nd, e, n, m, k) <- rows)
      assert(e + n + m + k == nd, s"$src: tiers must partition the docs")
    // reconcile the global tier masses against the member operators
    val exact = Dedup.dedupExact(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(3) == 1)).toMap
    val near = Dedup.dedupMinhash(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2) >= Dedup.CcThreshold)).toMap
    val sem = Dedup.dedupSemantic(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    def tier(p: Long => Boolean) = exact.keys.count(p).toLong
    assert(rows.map(_._3).sum == tier(d => exact(d)))
    assert(rows.map(_._4).sum == tier(d => !exact(d) && near.getOrElse(d, false)))
    assert(rows.map(_._5).sum == tier(d =>
      !exact(d) && !near.getOrElse(d, false) && sem.getOrElse(d, false)))
    // the card is non-trivial: at least two tiers fire on the fixture
    assert(Seq(rows.map(_._3).sum, rows.map(_._4).sum, rows.map(_._5).sum)
      .count(_ > 0) >= 2, s"waterfall vacuous on the fixture: $rows")
  }

  test("novelty: originals score full, late copies zero, partial overlap in between, short docs absent") {
    // arrival order IS doc_id order: 0 = original, 1 = exact copy (all
    // grams first seen in 0), 2 = fresh, 3 = front half copied from 0 +
    // fresh back half, 4 = too short for a 3-gram
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "x", 30L),
      (1L, "alpha beta gamma delta epsilon", "en", "x", 30L),
      (2L, "zeta eta theta iota kappa", "en", "x", 25L),
      (3L, "alpha beta gamma nu xi omicron", "en", "x", 30L),
      (4L, "pi rho", "en", "x", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = java.nio.file.Files.createTempDirectory("graft-nov").toString
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = CorpusOps.taNovelty(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((3L, 3L, 1000000L)), s"original: ${got(0L)}")
    assert(got(1L) == ((3L, 0L, 0L)), s"late copy: ${got(1L)}")
    assert(got(2L) == ((3L, 3L, 1000000L)), s"fresh: ${got(2L)}")
    // doc 3 grams: "alpha beta gamma" (seen in 0), "beta gamma nu",
    // "gamma nu xi", "nu xi omicron" (novel) -> 3/4
    assert(got(3L) == ((4L, 3L, 750000L)), s"half copy: ${got(3L)}")
    assert(!got.contains(4L), "sub-3-token docs have no gram row")
  }

  test("mix_doremi: weight conservation, monotone upweighting of hard domains, fixed-point trajectory") {
    val rows = CorpusOps.mixDoremi(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val k = rows.length
    assert(k >= 2, "fixture must have multiple domains")
    // smoothed weights are a (truncated) probability vector in ppm
    val tot = rows.map(_._5).sum
    assert(tot <= 1000000L && tot >= 1000000L - 4L * k,
      s"weights must conserve mass up to truncation: $tot over $k domains")
    // the DoReMi direction: higher relative excess (worse-than-average
    // fluency) never gets LESS weight — monotone through all rounds,
    // normalization, and smoothing
    val byExcess = rows.sortBy(_._4)
    byExcess.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._5,
        s"monotonicity violated: ${a._1}(rel=${a._4}, w=${a._5}) vs ${b._1}(rel=${b._4}, w=${b._5})")
    }
    // excesses are centered: some domain sits at or below the mean
    assert(rows.exists(_._4 <= 0) && rows.exists(_._4 >= 0), s"degenerate excesses")
    // trajectory replayed in plain Scala from the emitted (m_dom, n) agrees
    val rel = rows.map(_._4)
    var w = Array.fill(k)(1000000L / k)
    for (_ <- 1 to CorpusOps.DoremiRounds) {
      val up = w.zip(rel).map { case (wd, rd) =>
        wd * math.max(10000L, 1000000L + CorpusOps.DoremiEta * rd) / 1000000L }
      val t = up.sum
      w = up.map(_ * 1000000L / t)
    }
    rows.zip(w).foreach { case (r, wi) =>
      assert(r._5 == wi * 9 / 10 + 1000000L / (10L * k),
        s"trajectory mismatch for ${r._1}") }
  }
}
