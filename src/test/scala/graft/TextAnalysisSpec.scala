package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ta").toString
    Seq(
      (0L, "The cat sat on the mat, and the dog is in the house for now.", "en", "s", 60L),
      (1L, "der hund ist nicht in das haus und der garten ist grün", "de", "s", 54L),
      (2L, "12345 67890 !!!", "en", "s", 15L),
      (3L, "word " * 200, "en", "s", 1000L),
      (4L, "mat the on sat cat The, house the in is dog the and now. for", "en", "s", 60L),
      // 28 words, 2 distinct stopwords, mean word length 4.5:
      // passes every Gopher rule
      (5L, "The quick brown foxes jumped over the lazy sleeping dogs in the garden today " +
        "The quick brown foxes jumped over the lazy sleeping dogs in the garden today", "en", "s", 155L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("lang_id: marker votes pick the right language") {
    val m = TextAnalysis.taLangId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(m(0L) == "en")
    assert(m(1L) == "de")
  }

  test("quality: letterless doc scores low, long clean doc scores high") {
    val m = TextAnalysis.taQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(7)).toMap
    assert(m(2L) < 0.4, s"digits-only doc got ${m(2L)}")
    assert(m(3L) >= 0.89, s"long clean doc got ${m(3L)}")
  }

  test("token counts: ws vs letter-run vs BPE-ish differ as designed") {
    val r = TextAnalysis.taTokenCount(spark, dir)
      .where(col("doc_id") === 0L).head()
    val (ws, words, bpe) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ws == 15)            // whitespace tokens
    assert(words == 15)         // letter runs ("mat," splits to mat)
    assert(bpe == 17)           // letter runs + ',' and '.' symbols
  }

  test("fingerprints: bag fp is reorder-invariant, norm fp is not") {
    val m = TextAnalysis.taFingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(m(0L)._2 == m(4L)._2, "same word bag → same fp_bag")
    assert(m(0L)._1 != m(4L)._1, "different order → different fp_norm")
  }

  test("winnowing guarantee: a shared >= w+k-1 token run yields a shared fingerprint") {
    val d = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    // shared passage of w+k-1 = 6 tokens, embedded in different
    // surroundings and at DIFFERENT positions; doc 2 shares nothing
    val shared = "lorem ipsum dolor sit amet consectetur"
    Seq(
      (0L, s"alpha beta $shared gamma delta epsilon", "en", "s", 10L),
      (1L, s"one two three four five six seven $shared", "en", "s", 10L),
      (2L, "entirely unrelated words on some other topic here today", "en", "s", 10L),
      (3L, "tiny", "en", "s", 4L)) // < k tokens: no grams, no rows
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val sel = TextAnalysis.taWinnow(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = sel.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((byDoc(0L) intersect byDoc(1L)).nonEmpty,
      "the winnowing theorem: the shared passage MUST surface in both docs")
    assert((byDoc(0L) intersect byDoc(2L)).isEmpty &&
           (byDoc(1L) intersect byDoc(2L)).isEmpty,
      "no shared fingerprints without shared 3-gram content")
    assert(!byDoc.contains(3L), "sub-k docs select nothing")
    // density: selection keeps roughly 1/w of the grams, never more
    // than the full gram count, and positions are in-range
    sel.foreach { case (id, pos, _) =>
      assert(pos >= 0, s"doc $id pos $pos")
    }
  }

  test("gopher rules: planted docs trip exactly the intended rules") {
    val rows = TextAnalysis.taGopherRules(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long): (Int, Int, Int, Int, Int) = {
      val r = rows(id)
      (r.getAs[Int]("r_word_count"), r.getAs[Int]("r_mean_word_len"),
        r.getAs[Int]("r_stopwords"), r.getAs[Int]("r_symbol"),
        r.getAs[Int]("passes"))
    }
    // doc 2 is letterless: zero words, every word-based rule fails and
    // the zero-guard keeps ratios at 0.0 (not NaN/NULL)
    assert(flags(2L) == (0, 0, 0, 0, 0))
    assert(rows(2L).getAs[Double]("mean_word_len") == 0.0)
    assert(rows(2L).getAs[Double]("stop_ratio") == 0.0)
    // doc 3 is "word" x200: long enough and clean, but no stopwords —
    // the repetition Gopher's stopword rule exists to catch
    assert(flags(3L) == (1, 1, 0, 1, 0))
    // doc 0 is natural text but too short (15 words < 20), and its
    // function-word-heavy mean word length (44/15 ≈ 2.9) sits just
    // under the published [3, 10] band — the rule is intentionally
    // strict about short-word soup
    assert(flags(0L) == (0, 0, 1, 1, 0))
    // doc 5 is the same text doubled: 28 words, passes everything
    assert(flags(5L) == (1, 1, 1, 1, 1))
    // passes is exactly the conjunction, on every row
    rows.values.foreach { r =>
      val conj = Seq("r_word_count", "r_mean_word_len", "r_stopwords", "r_symbol")
        .forall(c => r.getAs[Int](c) == 1)
      assert(r.getAs[Int]("passes") == (if (conj) 1 else 0),
        s"doc ${r.getLong(0)}: passes must be the conjunction of the rules")
    }
  }
}
