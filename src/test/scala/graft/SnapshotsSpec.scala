package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Snapshots

/** The upsert operator: update-wins semantics, op classification, and
  * the idempotence that makes failed-write replays safe.
  */
class SnapshotsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def frame(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("upsert: updates win, inserts land, untouched rows keep — and ops say which") {
    val target = frame(1L -> "one", 2L -> "two", 3L -> "three")
    val updates = frame(2L -> "TWO", 9L -> "NINE")
    val out = Snapshots.upsertOver(target, updates, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out == Map(
      1L -> ("one", "keep"), 2L -> ("TWO", "update"),
      3L -> ("three", "keep"), 9L -> ("NINE", "insert")))
  }

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    val target = frame(1L -> "one", 2L -> "two")
    val updates = frame(2L -> "TWO", 9L -> "NINE")
    val once = Snapshots.upsertOver(target, updates, "doc_id")
      .select(col("doc_id"), col("text")) // drop the audit column
    val twice = Snapshots.upsertOver(once, updates, "doc_id")
      .select(col("doc_id"), col("text"))
    assert(once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet)
  }

  test("upsert raises on a duplicate key in the updates batch (no silent fan-out)") {
    // MERGE INTO's multiple-matches rule: a batch carrying the same key
    // twice would fan out through the join and grow the snapshot on
    // every replay — the plan must fail loudly instead
    val target = frame(1L -> "one")
    val dupBatch = frame(1L -> "A", 1L -> "B")
    val e = intercept[Exception] {
      Snapshots.upsertOver(target, dupBatch, "doc_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("duplicate doc_id")),
      s"error must name the violated contract: ${messages(e).mkString(" | ")}")
  }

  test("upsert raises on a NULL key in the updates batch (no silent drop, no replay duplication)") {
    // a NULL merge key can never match — not the target, and not its
    // own earlier insert on a replay — so it must neither vanish into
    // the null-rejecting count join nor insert unboundedly: it raises
    val target = frame(1L -> "one")
    val nullBatch = Seq((java.lang.Long.valueOf(2L), "ok"), (null.asInstanceOf[java.lang.Long], "bad"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Snapshots.upsertOver(target, nullBatch, "doc_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("NULL doc_id")),
      s"error must name the violated contract: ${messages(e).mkString(" | ")}")
  }

  test("upsert rejects mismatched schemas loudly") {
    intercept[IllegalArgumentException] {
      Snapshots.upsertOver(frame(1L -> "x"),
        frame(1L -> "y").withColumnRenamed("text", "body"), "doc_id")
    }
  }

  test("gate query: every batch row is insert-or-update, counts reconcile") {
    val rows = Snapshots.snapshotUpsert(spark, "/root/testdata/sf0.001")
      .groupBy(col("op")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val nTarget = docs.where(col("doc_id") % 3 =!= 0).count()
    val nBoth = docs.where(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0).count()
    val nBatch = docs.where(col("doc_id") % 5 === 0).count()
    assert(rows.getOrElse("update", 0L) == nBoth)
    assert(rows.getOrElse("insert", 0L) == nBatch - nBoth)
    assert(rows.getOrElse("keep", 0L) == nTarget - nBoth)
  }

  // ------------------------------------------------------------ CDC

  test("diff classifies insert/update/delete, drops keeps, names the changed columns") {
    val old  = Seq((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L))
      .toDF("doc_id", "text", "n")
    val newV = Seq((2L, "TWO", 20L), (3L, "three", 30L), (9L, "nine", 90L))
      .toDF("doc_id", "text", "n")
    val out = Snapshots.diffOver(old, newV, "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(out == Map(
      1L -> ("one", 10L, "delete", ""),   // deletes carry OLD values
      2L -> ("TWO", 20L, "update", "text"),
      9L -> ("nine", 90L, "insert", "")))
    // key 3 is identical in both versions: no row at all
    assert(!out.contains(3L))
  }

  test("apply inverts diff: apply(v_old, diff(v_old, v_new)) == v_new across all three ops") {
    val old  = Seq((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L))
      .toDF("doc_id", "text", "n")
    val newV = Seq((2L, "TWO", 20L), (3L, "three", 30L), (9L, "nine", 90L))
      .toDF("doc_id", "text", "n")
    val applied = Snapshots.applyChanges(old,
        Snapshots.diffOver(old, newV, "doc_id"), "doc_id")
      .collect().map(_.toSeq).toSet
    assert(applied == newV.collect().map(_.toSeq).toSet,
      "the CDC round trip must reproduce v_new exactly")
    // an empty feed is the identity transformation
    val noop = Snapshots.applyChanges(old,
        Snapshots.diffOver(old, old, "doc_id"), "doc_id")
      .collect().map(_.toSeq).toSet
    assert(noop == old.collect().map(_.toSeq).toSet)
  }

  test("diff counts changes as null-safe: NULL→value and value→NULL are updates") {
    def f(rows: (java.lang.Long, String)*) = rows.toDF("doc_id", "text")
    val old  = f(java.lang.Long.valueOf(1L) -> null,
                 java.lang.Long.valueOf(2L) -> "x")
    val newV = f(java.lang.Long.valueOf(1L) -> "now",
                 java.lang.Long.valueOf(2L) -> null)
    val out = Snapshots.diffOver(old, newV, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "update", 2L -> "update"))
  }

  test("diff of upsert output recovers the upsert's change feed exactly") {
    // apply a batch, diff the before/after states: every upsert 'update'
    // and 'insert' reappears with the same op, and nothing else does
    val target = frame(1L -> "one", 2L -> "two", 3L -> "three")
    val updates = frame(2L -> "TWO", 9L -> "NINE")
    val after = Snapshots.upsertOver(target, updates, "doc_id").drop("op")
    val d = Snapshots.diffOver(target, after, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(d == Map(2L -> "update", 9L -> "insert"))
  }

  test("history intervals tile each key's lifetime; AS-OF read == upsert fold at every version") {
    val v0 = frame(1L -> "a", 2L -> "b")
    val v1 = frame(2L -> "B", 3L -> "c")
    val v2 = frame(1L -> "A2", 3L -> "C2")
    val hist = Snapshots.historyOver(Seq(0L -> v0, 1L -> v1, 2L -> v2), "doc_id")
    // intervals are half-open, consecutive, and end open
    val byKey = hist.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    assert(byKey(1L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq(("a", 0L, 2L), ("A2", 2L, Snapshots.OpenVersion)))
    assert(byKey(2L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq(("b", 0L, 1L), ("B", 1L, Snapshots.OpenVersion)))
    // AS-OF v equals the sequential upsert fold to v, for every v
    def asOf(v: Long) = hist
      .where(col("valid_from") <= v && col("valid_to") > v)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    var folded = v0
    assert(asOf(0L) == folded.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    for ((v, batch) <- Seq(1L -> v1, 2L -> v2)) {
      folded = Snapshots.upsertOver(folded, batch, "doc_id").drop("op")
      assert(asOf(v) == folded.collect().map(r => r.getLong(0) -> r.getString(1)).toMap,
        s"AS-OF $v must equal the upsert fold to $v")
    }
  }

  test("restore: opens the AS-OF state, closes post-v inserts, keeps history, no-ops twice") {
    val v0 = frame(1L -> "a", 2L -> "b")
    val v1 = frame(2L -> "B", 3L -> "c")
    val v2 = frame(1L -> "A2", 4L -> "d") // touches 1, INSERTS 4
    val hist = Snapshots.historyOver(Seq(0L -> v0, 1L -> v1, 2L -> v2), "doc_id")
    // the AS-OF 1 state: 1→a, 2→B, 3→c
    val target = hist.where(col("valid_from") <= 1L && col("valid_to") > 1L)
      .select(col("doc_id"), col("text"))
    val restored = Snapshots.restoreStep(hist, target, vNew = 3L)
    def openState(h: org.apache.spark.sql.DataFrame) =
      h.where(col("valid_to") === Snapshots.OpenVersion)
        .select(col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(openState(restored) == Map(1L -> "a", 2L -> "B", 3L -> "c"),
      "restored current state must equal the AS-OF target")
    // key 4 (inserted after v) closes at 3 with NO successor
    val k4 = restored.where(col("doc_id") === 4L).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(k4 == Seq(("d", 2L, 3L)))
    // key 2 was NOT touched after v=1: its open row survives untouched
    // (a restore is change-bounded, not a table rewrite)
    val k2 = restored.where(col("doc_id") === 2L && col("valid_to") === Snapshots.OpenVersion)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(k2 == Seq(("B", 1L)))
    // history is preserved: what was briefly live at v=2 is still there
    assert(restored.where(col("doc_id") === 1L && col("text") === "A2").count() == 1)
    // restoring again to the same state is a no-op
    val again = Snapshots.restoreStep(restored, target, vNew = 4L)
    assert(again.collect().map(_.toSeq).toSet ==
      restored.collect().map(_.toSeq).toSet)
  }
}
