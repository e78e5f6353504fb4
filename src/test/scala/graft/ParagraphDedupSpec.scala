package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ParagraphDedup

/** Paragraph-level dedup: keeper rule, reassembly order, and the
  * skew-safety plan property (no window over paragraph text). */
class ParagraphDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // ParaWords = 8: craft docs from 8-word paragraphs so boundaries are
  // exactly the planted units (letter suffixes — normalization strips
  // digits)
  private def para(tag: String): String =
    ('a' until ('a' + ParagraphDedup.ParaWords).toChar).map(c => s"$tag$c").mkString(" ")

  test("first corpus-wide occurrence wins; later copies drop; order is preserved") {
    val boiler = para("footer")
    val docs = Seq(
      (1L, s"${para("one")} $boiler"),          // first occurrence of boiler
      (2L, s"$boiler ${para("two")}"),          // later copy -> dropped
      (3L, boiler),                             // nothing left after dedup
      (4L, s"${para("four")} ${para("four")}")  // self-duplicate inside one doc
    ).toDF("doc_id", "text")
    val got = ParagraphDedup.paragraphDedupOver(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, s"${para("one")} $boiler")))
    assert(got(2L) == ((2L, 1L, para("two"))))
    assert(got(3L) == ((1L, 0L, "")))
    assert(got(4L) == ((2L, 1L, para("four"))))
  }

  test("every distinct paragraph survives exactly once across the corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = ParagraphDedup.dedupParagraph(spark, dir).collect()
    val keptTotal = out.map(_.getLong(2)).sum
    val distinctChunks = ParagraphDedup.paragraphs(Tables.documents(spark, dir))
      .select("chunk").distinct().count()
    assert(keptTotal == distinctChunks,
      s"kept $keptTotal paragraphs but the corpus has $distinctChunks distinct ones")
    // the gate must actually be exercised: some doc loses a paragraph
    assert(out.exists(r => r.getLong(2) < r.getLong(1)),
      "fixture corpus has no cross-doc repeated paragraph")
  }

  test("incremental: snapshot-known paragraphs drop, within-batch first occurrence wins") {
    val boiler = para("footer")
    val batch = Seq(
      (3L, s"$boiler ${para("newa")}"),          // boiler known from snapshot
      (6L, s"${para("newa")} ${para("newb")}"),  // newa already in batch doc 3
      (9L, boiler)                               // nothing fresh
    ).toDF("doc_id", "text")
    val snapshot = Seq((1L, s"${para("old")} $boiler")).toDF("doc_id", "text")
    val got = ParagraphDedup.paragraphDedupIncrVs(batch, snapshot)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // only batch docs appear; doc 3 keeps newa (first in batch), doc 6
    // keeps only newb, doc 9 keeps nothing
    assert(got.keySet == Set(3L, 6L, 9L))
    assert(got(3L) == ((2L, 1L, para("newa"))))
    assert(got(6L) == ((2L, 1L, para("newb"))))
    assert(got(9L) == ((1L, 0L, "")))
  }

  test("plan is window-free (the keeper aggregate replaces row_number over paragraph)") {
    val plan = ParagraphDedup.dedupParagraph(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    assert(plan.collectWithSubqueries { case w: WindowExec => w }.isEmpty,
      s"a window over paragraph text is the hot-key straggler shape:\n$plan")
  }
}
