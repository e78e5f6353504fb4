package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cleaning

class CleaningSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // doc 0 (doc_id % 97 == 0) is the benchmark doc for decontamination;
  // doc 1 shares a 5-gram with it, doc 2 is clean but hits the denylist,
  // doc 3 is degenerate-repetitive and long enough to straddle a
  // 256-token chunk boundary, doc 4 is short and diverse.
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-clean").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s", 58L),
      (1L, "prefix words alpha beta gamma delta epsilon suffix tail", "en", "s", 56L),
      (2L, "the spark customer query runs a totally different sentence here", "en", "s", 64L),
      (3L, ("spam ham " * 150).trim, "en", "s", 1350L),
      (4L, "one two three four five six", "de", "s", 27L),
      // 5 (snapshot) and 6 (incoming, % 3 == 0) are exact duplicates
      (5L, "identical snapshot duplicate text payload", "en", "s", 41L),
      (6L, "identical snapshot duplicate text payload", "en", "s", 41L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq(
      (0L, "Customer#000000000", 1, 100.0, "BUILDING"),
      (1L, "Customer#000000001", 2, 200.0, "MACHINERY"),
      (2L, "Customer#000000000", 3, 300.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    d
  }

  test("pii_mask: digits masked, surrogate deterministic, redaction counted") {
    val rows = Cleaning.piiMask(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.values.forall(!_._1.exists(_.isDigit)), "mask left digits behind")
    assert(rows(0L)._1 == "Customer##########")
    assert(rows(0L)._3 == 9) // nine digits redacted
    // same source name -> same pseudonym (joinability survives the scrub);
    // different name -> different pseudonym
    assert(rows(0L)._2 == rows(2L)._2)
    assert(rows(0L)._2 != rows(1L)._2)
  }

  test("denylist scrub: whole-word hits replaced and counted, clean docs untouched") {
    val m = Cleaning.taDenylistScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(m(2L)._2 == 2) // "spark" + "customer"
    val pat = s"\\b(${Cleaning.Denylist.mkString("|")})\\b".r
    assert(pat.findFirstIn(m(2L)._1).isEmpty, s"scrubbed text still matches: ${m(2L)._1}")
    assert(m(2L)._1.contains("[REDACTED] [REDACTED] query"))
    assert(m(0L)._2 == 0 && m(0L)._1 == "alpha beta gamma delta epsilon zeta eta theta iota kappa")
  }

  test("decontaminate: benchmark overlap flags, benchmark docs excluded") {
    val out = Cleaning.taDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(!out.contains(0L), "benchmark doc must not appear in the training corpus")
    assert(out(1L)._2 == 1 && out(1L)._1 >= 1, "doc sharing a 5-gram must flag")
    assert(out(2L)._2 == 0 && out(2L)._1 == 0)
    assert(out(3L)._2 == 0)
  }

  test("repetition: degenerate doc separates from diverse doc on every signal") {
    val m = Cleaning.taRepetition(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (ttrRep, topBiRep, dupTriRep) = m(3L)
    val (ttrDiv, topBiDiv, dupTriDiv) = m(4L)
    assert(ttrRep < 0.01 && ttrDiv == 1.0)
    // "spam ham spam ham ...": bigrams alternate between two values
    assert(topBiRep > 0.49 && topBiRep <= 0.51, s"got $topBiRep")
    assert(topBiDiv < 0.5)
    assert(dupTriRep == 1.0, s"every trigram repeats, got $dupTriRep")
    assert(dupTriDiv == 0.0)
  }

  test("incremental dedup: batch doc duplicating the snapshot is not new") {
    val m = Cleaning.dedupIncremental(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(m.keySet == Set(0L, 3L, 6L), "output must be exactly the incoming batch")
    assert(m(0L) == 1 && m(3L) == 1, "unseen content is new")
    assert(m(6L) == 0, "content already in the snapshot must be flagged seen")
  }

  test("emb_pq: codebook members self-encode at zero distortion; clones inherit codes") {
    val d = java.nio.file.Files.createTempDirectory("graft-pq").toString
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(8)(r.nextGaussian().toFloat)
    }
    val v0 = vec(1)
    (Seq((0L, v0, 0), (1L, vec(2), 0), (2L, vec(3), 1), (3L, vec(4), 1),
      (10L, v0, 2), // exact clone of codebook vector 0
      (11L, v0.updated(0, v0.head + 5.0f), 2))) // far in subspace 0 only
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val m = graft.operators.KMeans.embPq(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)), r.getLong(5))).toMap
    for (id <- 0L to 3L)
      assert(m(id) == ((id.toInt, id.toInt, id.toInt, id.toInt), 0L),
        s"codebook vector $id must self-encode: ${m(id)}")
    assert(m(10L) == ((0, 0, 0, 0), 0L), "exact clone must inherit vector 0's codes")
    val ((c0, c1, c2, c3), dist) = m(11L)
    assert((c1, c2, c3) == ((0, 0, 0)), "untouched subspaces still match vector 0")
    assert(dist > 0L, "perturbed subspace must contribute distortion")
  }

  test("pack_chunks: per-stream running sum, straddling doc spans chunks") {
    val m = Cleaning.taPackChunks(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // first doc of each lang stream starts at chunk 0
    assert(m(0L)._3 == 0 && m(4L)._3 == 0)
    // en stream: 10 + 9 + 10 = 29 tokens before doc 3; doc 3 has 300
    // tokens -> occupies chunks floor(29/256)=0 .. floor(328/256)=1
    assert(m(3L)._2 == 300)
    assert(m(3L)._3 == 0 && m(3L)._4 == 1 && m(3L)._5 == 2)
    // chunk ids are per-stream: the de doc ignores the en stream's sums
    assert(m(4L)._4 == 0)
  }

  test("pack_chunks: every sharded stream equals packing that stream's docs alone") {
    val nShards = 4
    val rows = Cleaning.packChunks(spark, dir, nShards).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // sharding partitions the corpus: every doc in exactly one stream
    assert(rows.map(_._1).sorted.toSeq == (0L to 6L).toSeq)
    // shard-invariance: each (lang, shard) stream's chunk ranges are
    // exactly what a single-stream packer produces on that stream's
    // docs — shards never see each other's cursors
    rows.groupBy(r => (r._2, r._3)).foreach { case ((lang, shard), members) =>
      var cursor = 0L
      members.sortBy(_._1).foreach { case (id, _, _, nt, first, last, nc) =>
        val expFirst = cursor / Cleaning.ChunkTokens
        if (nt == 0)
          assert(first == expFirst && last == expFirst - 1 && nc == 0,
            s"empty doc $id in ($lang,$shard): ($first,$last,$nc)")
        else {
          val expLast = (cursor + nt - 1) / Cleaning.ChunkTokens
          assert(first == expFirst && last == expLast && nc == expLast - expFirst + 1,
            s"doc $id in ($lang,$shard): got ($first,$last,$nc), want ($expFirst,$expLast)")
        }
        cursor += nt
      }
    }
  }

  test("set-based scrub (large-denylist path) is bit-identical to the regex path") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(Cleaning.taDenylistScrubLarge(spark, dir)) ==
      rows(Cleaning.taDenylistScrub(spark, dir)))
    // a 500-term denylist: the regime the set kernel exists for — the
    // regex alternation is checked against it once, here, as the oracle
    val big = (1 to 500).map(i => s"bigterm$i") ++ Cleaning.Denylist :+ "totally"
    val pat = s"\\b(${big.mkString("|")})\\b"
    val viaRegex = rows(docs.select(col("doc_id"),
      regexp_replace(col("text"), pat, "[REDACTED]").as("scrubbed"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0)))
        .cast("long").as("n_hits")))
    assert(rows(Cleaning.scrubWithSet(docs, big)) == viaRegex)
    // phrases are loudly rejected, not silently mis-scrubbed
    intercept[IllegalArgumentException] {
      Cleaning.scrubWithSet(docs, Seq("new york"))
    }
  }

  test("set-based scrub matches the regex path on non-ASCII word boundaries (Java \\b is Unicode-aware)") {
    import spark.implicits._
    // "caféspark": é is a word char to Java \b, so there is NO boundary
    // before "spark" and neither path may redact; "müller spark" has a
    // real boundary and both must redact. An ASCII-only boundary test
    // would split at é and redact where the regex path does not.
    val docs = Seq(
      (0L, "caféspark test"), (1L, "müller spark müller"),
      (2L, "日本spark"), (3L, "a_spark spark_b spark"),
      (4L, "e\u0301spark combining-mark boundary"), // e + combining acute
      (5L, "spark\u0301 trailing mark continues the word"),
      (6L, "spark\u203Fx undertie is NOT a word char to \\b"),
      (7L, "spark\u200Dx zwj is NOT a word char to \\b"),
      (8L, "spark\uD835\uDC00 supplementary letter continues"), // U+1D400
      // Mc/Me marks: JDK \b's hasBaseCharacter walks back only through
      // NON_SPACING_MARK (Mn), so spacing (Mc, U+0903) and enclosing
      // (Me, U+20DD) marks DO bound the word and the regex redacts
      (9L, "spark\u0903 devanagari visarga (Mc) bounds the word"),
      (10L, "spark\u20DD enclosing circle (Me) bounds the word"),
      (11L, "spark\u0903more Mc splits the cluster into two words"),
      // hasBaseCharacter quirks, probed on this JVM: the base walk
      // reads codePointAt per UTF-16 index and requires isLetterOrDigit
      (12L, "_\u0301spark mark over underscore has no base, so the word breaks and redacts"),
      (13L, "\uD835\uDC00\u0301spark a low surrogate kills the base walk, redacts"),
      (14L, "spark\uD83A\uDD44 supplementary Mn (U+1E944) IS transparent, no hit here"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val pat = s"\\b(${Cleaning.Denylist.mkString("|")})\\b"
    val viaRegex = rows(docs.select(col("doc_id"),
      regexp_replace(col("text"), pat, "[REDACTED]").as("scrubbed"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0)))
        .cast("long").as("n_hits")))
    assert(rows(Cleaning.scrubWithSet(docs, Cleaning.Denylist)) == viaRegex)
    // sanity on the semantics themselves, not just parity
    val byId = viaRegex.map(t => t._1 -> t._3).toMap
    assert(byId(0L) == 0L, "no word break inside caféspark")
    assert(byId(1L) == 1L && byId(4L) == 0L)
    assert(byId(5L) == 0L, "trailing combining mark continues the word")
    assert(byId(6L) == 1L && byId(7L) == 1L,
      "connector punctuation / ZWJ are boundaries to default \\b")
    assert(byId(8L) == 0L, "supplementary-plane letter continues the word")
    assert(byId(9L) == 1L && byId(10L) == 1L && byId(11L) == 1L,
      "Mc/Me marks are boundaries to default \\b (only Mn is transparent)")
    assert(byId(12L) == 1L && byId(13L) == 1L,
      "a mark without a letter/digit base does not glue the word shut")
    assert(byId(14L) == 0L,
      "supplementary Mn read at its high surrogate continues the word")
  }

  test("phrase scrub: single-word lists reduce to the set kernel bit-for-bit") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(Cleaning.scrubWithPhrases(docs, Cleaning.Denylist)) ==
      rows(Cleaning.scrubWithSet(docs, Cleaning.Denylist)))
    // malformed phrase lists fail loudly
    intercept[IllegalArgumentException] {
      Cleaning.scrubWithPhrases(docs, Seq("double  space"))
    }
    intercept[IllegalArgumentException] {
      Cleaning.scrubWithPhrases(docs, Seq.empty)
    }
  }

  test("phrase scrub matches the regex twin (longest-first alternation) on overlap and boundary-fallback cases") {
    import spark.implicits._
    val phrases = Seq("customer join merge", "customer join", "table hash", "spark")
    val docs = Seq(
      (0L, "customer join merge wins over customer join"),
      (1L, "customer join x then table hash y"),
      // longer phrase matches chars but fails its END boundary
      // (merge+r is mid-word) -> regex backtracks to "customer join"
      (2L, "customer join merger falls back to the short phrase"),
      (3L, "xcustomer join has no start boundary for customer"),
      (4L, "customer  join double space does not match"),
      (5L, "table hashx end boundary fails, no hit"),
      // phrase straddling a redaction is NOT re-matched (left to right,
      // non-overlapping, same as regex 'g')
      (6L, "customer join customer join merge both hit"),
      (7L, "sparḱ mark continues the word: no hit"),
      (8L, "sparkः Mc mark bounds the word: hit")) // U+0903
      .toDF("doc_id", "text")
    val pat = s"\\b(${phrases.sortBy(-_.length).mkString("|")})\\b"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaRegex = rows(docs.select(col("doc_id"),
      regexp_replace(col("text"), pat, "[REDACTED]").as("scrubbed"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0)))
        .cast("long").as("n_hits")))
    val viaTrie = rows(Cleaning.scrubWithPhrases(docs, phrases))
    assert(viaTrie == viaRegex)
    // sanity on the semantics themselves
    val byId = viaTrie.map(t => t._1 -> t._3).toMap
    assert(byId(0L) == 2L, "longest phrase wins, then the shorter one hits")
    assert(byId(2L) == 1L, "end-boundary failure falls back to the shorter phrase")
    assert(byId(3L) == 0L && byId(4L) == 0L && byId(5L) == 0L && byId(7L) == 0L)
    assert(byId(6L) == 2L && byId(8L) == 1L)
  }

  test("phrase scrub automaton: fail links and suffix outputs match the regex twin") {
    import spark.implicits._
    // suffix phrase ("join merge" ⊂ "customer join merge"), an
    // overlapping repetition ("table hash" in "table hash table hash"),
    // and a self-overlapping chain ("a b a" in "a b a b a") — the
    // shapes where fail/output links, not plain trie walks, do the work
    val phrases = Seq("customer join merge", "join merge", "table hash", "a b a")
    val docs = Seq(
      (0L, "customer join merge x"),       // long wins; inner suffix consumed
      (1L, "zz join merge after fail"),    // suffix phrase alone
      (2L, "table hash table hash"),       // back-to-back, both hit
      (3L, "a b a b a"),                   // overlap: greedy takes first, second overlaps -> 1 hit
      (4L, "customer join mergex end boundary kills the long phrase"))
      .toDF("doc_id", "text")
    val pat = s"\\b(${phrases.sortBy(-_.length).mkString("|")})\\b"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaRegex = rows(docs.select(col("doc_id"),
      regexp_replace(col("text"), pat, "[REDACTED]").as("scrubbed"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0)))
        .cast("long").as("n_hits")))
    val viaAc = rows(Cleaning.scrubWithPhrases(docs, phrases))
    assert(viaAc == viaRegex)
    val byId = viaAc.map(t => t._1 -> t._3).toMap
    assert(byId(0L) == 1L && byId(1L) == 1L && byId(2L) == 2L && byId(3L) == 1L)
    assert(byId(4L) == 0L,
      "mergex kills the long phrase AND the suffix phrase at that end")
  }

  test("decontaminate: two-table form flags against a genuine external benchmark") {
    // a benchmark table that is NOT a doc_id-split of the corpus
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val out = Cleaning.taDecontaminateVs(corpus, bench).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out.keySet == (0L to 6L).toSet, "all corpus docs appear (no split filter)")
    assert(out(0L) == 1, "doc 0 shares 'alpha beta gamma delta epsilon'")
    assert(out(1L) == 1, "doc 1 shares the same 5-gram mid-sentence")
    assert(Seq(2L, 3L, 4L, 5L, 6L).forall(out(_) == 0))
  }

  test("incremental dedup: bloom pre-filter output is bit-identical to the exact path") {
    val fp = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("fp_norm"))
    val incoming = fp.where(col("doc_id") % 3 === 0)
    val snapshot = fp.where(col("doc_id") % 3 =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val exact = rows(Cleaning.dedupIncrementalVs(incoming, snapshot))
    // tiny capacity + high fpp forces Bloom false positives through the
    // pre-filter — the exact join must still clear them (and Bloom's
    // no-false-negative guarantee means no match is ever lost)
    val bloomed = rows(Cleaning.dedupIncrementalBloom(incoming, snapshot,
      expectedItems = 8, fpp = 0.3))
    assert(bloomed == exact, s"bloom path diverged: $bloomed vs $exact")
    assert(exact.exists(_._3 == 0) && exact.exists(_._3 == 1),
      "fixture must exercise both seen and new outcomes")
    // empty batch: null bloom aggregate must not NPE — nothing matches
    assert(Cleaning.dedupIncrementalBloom(incoming.limit(0), snapshot).count() == 0)
  }

  test("pack_chunks: zero-token doc reports an empty span and advances no cursor") {
    val d = java.nio.file.Files.createTempDirectory("graft-pack0").toString
    Seq((0L, "one two three", "en", "s", 13L),
        (1L, "", "en", "s", 0L), // zero tokens
        (2L, "four five", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val m = Cleaning.taPackChunks(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m(1L) == ((0L, 0L, -1L, 0L)),
      s"empty doc must claim no chunk (empty span), got ${m(1L)}")
    assert(m(2L)._2 == 0L && m(0L)._2 == 0L, "cursor unaffected by the empty doc")
  }

  test("semantic decontamination: flags agree with brute-force same-cell cosine vs the bench split") {
    import graft.operators.{Cleaning, Dedup, Similarity, VecKernel}
    // sf0.01: the smallest fixture whose embedding geometry exercises
    // the contaminated branch (sf0.001's same-cell dots all sit below
    // the threshold); brute force here is |bench|·|corpus| driver work
    val sf = "/root/testdata/sf0.01"
    val out = Cleaning.taDecontaminateSemantic(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) 0L else r.getLong(4)))).toMap
    // spine: every NON-bench vector exactly once, no bench vectors
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1).map {
        case f: Float => math.round(f.toDouble * 1e6)
        case d: Double => math.round(d * 1e6)
      }.toArray).toMap
    val benchIds = emb.keySet.filter(_ % Cleaning.BenchMod == 0)
    assert(out.keySet == (emb.keySet -- benchIds),
      "output spine must be exactly the non-bench vectors")
    // brute-force differential within cells (fixture cells are far
    // below IvfMaxCell, so the cap is not binding and the flag must be
    // EXACTLY brute same-cell cosine >= tau)
    val c = Similarity.nCentroids(emb.size.toLong)
    val cells = VecKernel.ivfCells(spark, sf, c, nprobe = 1)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    for ((v, (cell, flagged, benchId, dotScaled)) <- out) {
      val hits = benchIds.toSeq.filter(b => cells(b) == cell)
        .map(b => (dot(emb(v), emb(b)), b))
        .filter(_._1 >= Dedup.SemDedupTauScaled)
      if (flagged) {
        assert(hits.nonEmpty, s"vec $v flagged with no qualifying bench hit")
        // convicting vector: highest dot, smallest bench id on ties
        val (bd, bb) = hits.maxBy { case (d, b) => (d, -b) }
        assert((benchId, dotScaled) == ((bb, bd)),
          s"vec $v: convicting pair mismatch")
      } else {
        assert(hits.isEmpty, s"vec $v unflagged but brute force finds ${hits.size} hits")
      }
    }
    assert(out.values.exists(_._2), "fixture must exercise the contaminated branch")
  }
}
