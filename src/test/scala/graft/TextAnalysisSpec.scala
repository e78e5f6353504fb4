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
      (4L, "mat the on sat cat The, house the in is dog the and now. for", "en", "s", 60L))
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
}
