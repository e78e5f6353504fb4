package graft

import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tokenizer

/** Vocabulary build/encode: id assignment, OOV handling, and the plan
  * properties that keep both halves linear at corpus scale. */
class TokenizerSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("vocab ids are dense 1..V in (count desc, term asc) order") {
    val rows = Tokenizer.vocabBuild(spark, dir)
      .orderBy(col("token_id"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.length == Tokenizer.VocabSize)
    assert(rows.map(_._1).toSeq == (1 to Tokenizer.VocabSize))
    // counts non-increasing; equal counts break ties on term asc
    rows.sliding(2).foreach { case Array((_, t1, c1), (_, t2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && t1 < t2), s"order broken at $t1/$t2")
    }
  }

  test("encode maps in-vocab terms to their dict id and everything else to 0") {
    val dict = Tokenizer.vocabBuild(spark, dir)
      .collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    // decode independently: re-tokenize in the test and compare per position
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enc = Tokenizer.vocabEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    var oov = 0
    docs.foreach { case (id, text) =>
      val toks = text.toLowerCase.replaceAll("[^\\p{L}]+", " ").trim
        .split(" ").filter(_.nonEmpty)
      toks.zipWithIndex.foreach { case (t, pos) =>
        val expected = dict.getOrElse(t, 0)
        assert(enc((id, pos.toLong)) == expected, s"doc $id pos $pos term $t")
        if (expected == 0) oov += 1
      }
    }
    // fixture vocabulary (31 terms) exceeds VocabSize (24): OOV is exercised
    assert(oov > 0, "fixture must exercise the OOV path")
    assert(enc.size == docs.values.map(t =>
      t.toLowerCase.replaceAll("[^\\p{L}]+", " ").trim.split(" ").count(_.nonEmpty)).sum)
  }

  test("vocab build/encode and mixture sampling are invariant to shuffle partitioning") {
    val conf = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(conf)
    def snap(): (Seq[(Int, String)], Long, Seq[Long]) = (
      Tokenizer.vocabBuild(spark, dir).collect()
        .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq,
      Tokenizer.vocabEncode(spark, dir).collect()
        .map(r => r.getLong(0) * 1000003 + r.getLong(1) * 31 + r.getInt(2)).sum,
      graft.operators.CorpusOps.sampleMixture(spark, dir).collect()
        .map(_.getLong(0)).sorted.toSeq)
    try {
      spark.conf.set(conf, "3")
      val a = snap()
      spark.conf.set(conf, "13")
      val b = snap()
      assert(a === b)
    } finally spark.conf.set(conf, old)
  }

  test("build plans TakeOrdered (no global vocab sort); encode joins by broadcast (no corpus shuffle)") {
    val build = Tokenizer.vocabBuild(spark, dir).queryExecution.sparkPlan
    assert(build.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"top-V must short-circuit, not sort the vocabulary:\n$build")
    val encode = Tokenizer.vocabEncode(spark, dir).queryExecution.sparkPlan
    assert(encode.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"the V-row dictionary must broadcast to the corpus stream:\n$encode")
    assert(!encode.toString.contains("SortMergeJoin"),
      "a sort-merge join here would shuffle the whole corpus by term")
  }

  test("coverage eval: full driver-side differential + the held-out discipline") {
    // independent Scala recount: same split predicate (via corpusSplit),
    // same tokenization, top-V vocab from TRAIN tokens only, per-source
    // held-out metrics — must match the operator row-for-row. Also pins
    // the held-out discipline itself: every reported OOV term is absent
    // from the train vocab, even when frequent in the held-out split.
    val sf = dir
    val split = graft.operators.CorpusOps.corpusSplit(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^\\p{L}]+", " ").trim.split(" ").toSeq
        .filter(_.nonEmpty)
    val trainToks = docs.filter(d => split(d._1) == "train").flatMap(d => toks(d._3))
    val vocab = trainToks.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(Tokenizer.VocabSize).map(_._1).toSet
    val held = docs.filter(d => split(d._1) != "train")
    assert(held.nonEmpty, "fixture must have held-out docs")
    val want = held.groupBy(_._2).map { case (src, ds) =>
      val ts = ds.flatMap(d => toks(d._3))
      val oov = ts.filterNot(vocab)
      src -> ((ts.size.toLong, oov.size.toLong,
        1000000L * oov.size / ts.size,
        ts.map(_.length.toLong).sum, oov.map(_.length.toLong).sum,
        ts.distinct.size.toLong, oov.distinct.size.toLong))
    }
    val got = Tokenizer.vocabCoverage(spark, sf).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    }.toMap
    assert(got == want, s"coverage differs:\n got=$got\nwant=$want")
    assert(got.values.exists(_._2 > 0), "eval must actually see OOV tokens")
  }

  test("BPE: greedy leftmost application of a run pair, pinned in the final state") {
    import spark.implicits._
    // five decoy words burn merge rounds 1-5 by frequency order; (a,a)
    // (weight 4·10=40) wins exactly round BpeMerges=6, so its greedy
    // application survives into the OUTPUT: "a a a a a" must become
    // "aa aa a" — leftmost-first non-overlapping ("aa a a a" = a missed
    // second match, the shared-boundary bug; "a aa aa" = right-to-left)
    assert(graft.operators.Tokenizer.BpeMerges == 6, "decoy ladder sized for 6 rounds")
    val words = Seq(("bc", 100L), ("de", 90L), ("fg", 80L), ("hi", 70L),
      ("jk", 60L), ("aaaaa", 10L)).toDF("term", "freq")
    val got = graft.operators.Tokenizer.bpeOver(words)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got("aaaaa") == "aa aa a")
    assert(got("bc") == "bc" && got("jk") == "jk")
  }

  test("BPE: overlapping occurrences all count, pinned by the last-round winner") {
    import spark.implicits._
    // decoys burn rounds 1-5; round 6 decides between (a,a) — weight
    // 2 adjacent pairs × freq 26 = 52, but only 26 if overlapping
    // occurrences were miscounted as one — and (p,q) at 40. The correct
    // count merges (a,a); the wrong one merges (p,q), so the final
    // segmentations differ
    val words = Seq(("bc", 100L), ("de", 90L), ("fg", 80L), ("hi", 70L),
      ("jk", 60L), ("aaa", 26L), ("pq", 40L)).toDF("term", "freq")
    val got = graft.operators.Tokenizer.bpeOver(words)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got("aaa") == "aa a" && got("pq") == "p q")
  }

  test("BPE: equal-count ties break to the lexicographically smaller pair") {
    import spark.implicits._
    // decoys burn rounds 1-5; round 6 ties (a,b)=50 with (x,y)=50 and
    // must merge (a,b) — a wrong or nondeterministic tie-break leaves
    // "ab" split and "xy" fused
    val words = Seq(("bc", 100L), ("de", 90L), ("fg", 80L), ("hi", 70L),
      ("jk", 60L), ("ab", 50L), ("xy", 50L)).toDF("term", "freq")
    val got = graft.operators.Tokenizer.bpeOver(words)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got("ab") == "ab" && got("xy") == "x y")
  }

  test("BPE encode: per-doc totals reconcile with the corpus and the trained dictionary") {
    val enc = graft.operators.Tokenizer.vocabBpeEncode(spark, dir).collect()
    // a symbol covers >= 1 char, so every doc needs at least as many
    // symbols as tokens, and fewer symbols than characters
    enc.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: fewer symbols than tokens")
    }
    // token total equals an independent corpus-side count
    val nTok = enc.map(_.getLong(1)).sum
    val want = Tables.documents(spark, dir)
      .select(explode(split(graft.operators.TextAnalysis.normalized(col("text")), " ")).as("t"))
      .where(col("t") =!= "").count()
    assert(nTok == want)
  }

  test("BPE segmentations re-concatenate to their terms and the corpus gate is non-trivial") {
    val rows = graft.operators.Tokenizer.vocabBpe(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getString(2).replace(" ", "") == r.getString(0),
        s"segmentation of '${r.getString(0)}' lost characters: '${r.getString(2)}'")
      assert(r.getLong(3) == r.getString(2).split(" ").length)
    }
    // the merges must have actually fused something
    assert(rows.exists(_.getString(2).split(" ").exists(_.length > 1)),
      "no multi-character symbol was ever produced")
  }

  test("wordpiece: segmentation equals a brute reimplementation of inventory + maximal munch") {
    import graft.operators.Tokenizer
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val alphabet = "abcde"
    val terms = (0 until 60).map(_ =>
      (0 until (3 + rng.nextInt(8))).map(_ => alphabet(rng.nextInt(5))).mkString)
      .distinct
    val pairs = terms.map(t => (t, 1L + rng.nextInt(100)))
    val words = pairs.toDF("term", "freq")
    val wf = pairs.toMap
    // brute inventory: occurrence-weighted substrings (len 2..max),
    // top-K by (weight desc, piece asc), plus every observed char
    val weights = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- terms; i <- 0 until t.length;
         l <- 2 to math.min(Tokenizer.WpMaxPiece, t.length - i))
      weights(t.substring(i, i + l)) += wf(t)
    val multi = weights.toSeq.sortBy { case (p, w) => (-w, p) }
      .take(Tokenizer.WpTopPieces).map(_._1)
    val inv = multi.toSet ++ terms.flatMap(_.map(_.toString))
    def munch(t: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = 0
      while (p < t.length) {
        var l = math.min(Tokenizer.WpMaxPiece, t.length - p)
        while (l > 1 && !inv.contains(t.substring(p, p + l))) l -= 1
        out += t.substring(p, p + l); p += l
      }
      out.toSeq
    }
    val got = Tokenizer.wordpieceOver(spark, words).collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got.keySet == terms.toSet)
    for (t <- terms) {
      val expect = munch(t)
      assert(got(t) == ((expect.mkString(" "), expect.length.toLong)),
        s"$t: operator segmented '${got(t)._1}', brute munch says '${expect.mkString(" ")}'")
      assert(expect.mkString == t, s"$t: munch does not re-concatenate")
    }
    assert(terms.exists(t => got(t)._2 < t.length),
      "fixture must exercise multi-char pieces (some word segments shorter than chars)")
  }

  test("pack_bpe: tokenizer-true cuts reconcile with the encode and DIVERGE from the surrogate") {
    import graft.operators.{Cleaning, Tokenizer}
    // 1) reconciliation: pack_bpe's n_tokens IS vocabBpeEncode's n_sym
    //    for every encoded doc, and 0 for docs the encode never saw
    //    (no letters → no BPE symbols)
    val enc = Tokenizer.vocabBpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val packed = Tokenizer.packBpe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(packed.nonEmpty)
    packed.foreach { case (id, _, nTok, first, last, nChunks) =>
      assert(nTok == enc.getOrElse(id, 0L),
        s"doc $id: packed n_tokens $nTok != encode n_sym ${enc.getOrElse(id, 0L)}")
      if (nTok == 0L) assert(nChunks == 0L && last == first - 1,
        s"doc $id: zero-symbol doc must take the kernel's empty-span rule")
    }
    // 2) kernel identity: the spans equal chunkManifest over the encode
    //    counts directly (the shared-kernel contract — pack_bpe adds
    //    NO cut arithmetic of its own)
    val viaKernel = Cleaning.chunkManifest(
        Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
          .withColumn("n_tokens",
            coalesce(udf((id: Long) => enc.get(id)).apply(col("doc_id")), lit(0L))),
        Seq("lang"))
      .collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        ((r.getLong(r.fieldIndex("first_chunk")),
          r.getLong(r.fieldIndex("last_chunk"))))).toMap
    packed.foreach { case (id, _, _, first, last, _) =>
      assert(viaKernel(id) == ((first, last)),
        s"doc $id: pack_bpe span ($first,$last) != direct kernel ${viaKernel(id)}")
    }
    // 3) divergence: the whitespace-surrogate manifest must cut
    //    DIFFERENTLY — if every doc landed on the same span the
    //    composition would be a relabeling and the surrogate fine
    val surrogate = Cleaning.taPackChunks(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        ((r.getLong(r.fieldIndex("n_tokens")),
          r.getLong(r.fieldIndex("first_chunk")),
          r.getLong(r.fieldIndex("last_chunk"))))).toMap
    val tokenDiffs = packed.count { case (id, _, nTok, _, _, _) =>
      surrogate(id)._1 != nTok }
    val spanDiffs = packed.count { case (id, _, _, first, last, _) =>
      (surrogate(id)._2, surrogate(id)._3) != ((first, last)) }
    assert(tokenDiffs > 0, "BPE symbol counts never differ from whitespace counts " +
      "— the fixture cannot demonstrate why tokenizer-true packing exists")
    assert(spanDiffs > 0, s"per-doc counts differ ($tokenDiffs docs) but every " +
      "chunk span coincides — cuts must move for the composition to matter")
  }

  test("stream_pack_bpe fold identity holds on a THREE-batch chain (exercises mergeCursors)") {
    import graft.operators.Tokenizer
    import graft.streaming.PackStream
    // the gate's own split is two batches; a three-batch chain routes
    // the carry through mergeCursors (full-outer SUM), pinning that
    // the BPE composition folds under the same state discipline
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val ids = d.select("doc_id").collect().map(_.getLong(0)).sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val seg = Tokenizer.vocabBpe(spark, dir).select(col("term"), col("n_sym"))
    def toks(f: org.apache.spark.sql.Column) =
      Tokenizer.bpeTokenCounts(d.where(f), seg)
    val t1 = toks(col("doc_id") <= c1)
    val t2 = toks(col("doc_id") > c1 && col("doc_id") <= c2)
    val t3 = toks(col("doc_id") > c2)
    val s1 = PackStream.cursorsOf(t1)
    val s12 = PackStream.mergeCursors(s1, PackStream.cursorsOf(t2))
    val streamed = PackStream.manifestUnder(t1, None)
      .unionByName(PackStream.manifestUnder(t2, Some(s1)))
      .unionByName(PackStream.manifestUnder(t3, Some(s12)))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val got = rows(streamed)
    assert(got.nonEmpty && got === rows(Tokenizer.packBpe(spark, dir)),
      "three-batch cursor-carry must reproduce the one-shot BPE packer exactly")
  }

  test("pack_report: contiguous-packing invariants — ceil chunks, sub-capacity tail, split accounting") {
    val rows = graft.operators.Tokenizer.packReport(spark, "/root/testdata/sf0.001")
      .collect()
    graft.Graft.releaseState(spark)
    assert(rows.nonEmpty)
    val cap = graft.operators.Cleaning.ChunkTokens.toLong
    rows.foreach { r =>
      val (total, used) = (r.getLong(2), r.getLong(3))
      assert(used == (total + cap - 1) / cap,
        s"${r.getString(0)}: contiguous packing means chunks_used = ceil(total/cap)")
      assert(r.getLong(5) == used * cap - total && r.getLong(5) < cap,
        s"${r.getString(0)}: tail waste must be the final partial chunk only")
      assert(r.getLong(4) <= 1000000L && (used == 0 || r.getLong(4) > 0))
      assert(r.getLong(6) <= r.getLong(1), "split docs cannot exceed docs")
      assert(r.getLong(7) >= 1, "some doc must occupy at least one chunk")
    }
  }

  test("pack_report fill_ppm arithmetic survives the int64 wrap zone (complement form)") {
    // The r13 "decomposed scaleDiv" was vacuous as an overflow guard:
    // chunks_used = ceil(total/cap) forces total div denom ∈ {0,1} and
    // remainder ≈ total, so its (total % denom)·10⁶ term wrapped at the
    // same ~9.2·10¹²-token threshold as the naive total·10⁶. The r14
    // complement form only ever multiplies waste < cap by 10⁶. These
    // vectors sit squarely PAST the wrap threshold (total·10⁶ overflows
    // int64 for every one of them) and at the exact-fill / one-token /
    // max-waste edges; ground truth via BigInt.
    import spark.implicits._
    val cap = graft.operators.Cleaning.ChunkTokens.toLong
    def chunksOf(total: Long) = (total + cap - 1) / cap
    val totals = Seq(
      // just past Long.Max/1e6 (the naive form's wrap threshold), with
      // +cap headroom so the derived max-waste vector stays in the zone
      9223372036854L + cap,
      9223372036854L + cap + 1,
      40L * 1000L * 1000L * 1000L * 1000L,   // 40T tokens, ~100 TB corpus
      40L * 1000L * 1000L * 1000L * 1000L - 1,
      (Long.MaxValue / cap) * cap / 2,        // deep interior
      123456789012345L)
    val vecs = totals.flatMap { t0 =>
      // exact fill, one-token tail (max waste), and the raw value
      val exact = chunksOf(t0) * cap
      Seq(exact, exact - cap + 1, t0)
    }.distinct.map(t => (t, chunksOf(t)))
    vecs.foreach { case (t, _) =>
      assert(t > Long.MaxValue / 1000000L,
        s"vector $t does not exercise the wrap zone — tighten the fixture")
    }
    val got = vecs.toDF("total_tokens", "chunks_used")
      .selectExpr("total_tokens",
        graft.operators.Tokenizer.fillPpmExpr(cap) + " AS fill_ppm")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (t, used) =>
      val want = (BigInt(t) * 1000000 / (BigInt(used) * cap)).toLong
      assert(got(t) == want,
        s"fill_ppm($t, $used): got ${got(t)}, BigInt truth $want")
      assert(got(t) >= 0L && got(t) <= 1000000L)
    }
  }
}
