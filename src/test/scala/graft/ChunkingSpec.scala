package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Content-defined-chunking properties: identical text → identical
  * chunk fingerprints; an edit near the START only disturbs the first
  * chunk(s) — later boundaries re-synchronize (the whole point of CDC
  * vs fixed-size blocks, where one insertion shifts every block). */
class ChunkingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  val base: String = (1 to 300).map(i => s"token$i word${i % 17} data${i % 7}").mkString(" ")

  test("deterministic: same text, same fingerprints") {
    assert(TextAnalysis.chunkFingerprints(base) == TextAnalysis.chunkFingerprints(base))
    assert(TextAnalysis.chunkFingerprints("").isEmpty)
  }

  test("CDC resynchronizes after a prefix edit") {
    val a = TextAnalysis.chunkFingerprints(base)
    val b = TextAnalysis.chunkFingerprints("INSERTED-PREFIX " + base)
    assert(a.length > 5, s"need several chunks, got ${a.length}")
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.size >= a.length - 2,
      s"prefix edit must leave later chunks identical: ${shared.size}/${a.length} shared")
    assert(a.toSet != b.toSet, "the edited chunk itself must differ")
  }

  test("distributed operator emits one row per doc with serialized chunk fps") {
    val d = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    Seq((0L, base, "en", "s", 1L), (1L, "INSERTED " + base, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.taChunkFp(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(2).split(",").toSeq)
      .toMap
    assert(rows.size == 2)
    assert(rows(0L).toSet.intersect(rows(1L).toSet).size >= rows(0L).size - 2)
  }
}
