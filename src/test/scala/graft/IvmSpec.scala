package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ivm

/** Incremental view maintenance: the signed-delta merge must equal the
  * from-scratch recompute — including group migration and group death —
  * and maintenance must compose across batch boundaries.
  */
class IvmSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def docs(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private def setOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("applyFeed equals recompute: insert, update, delete, migration, group death") {
    val oldV = docs(
      (1L, "a", "en", "web", 10L),
      (2L, "b", "en", "web", 20L),
      (3L, "c", "de", "web", 30L),   // the ONLY (web, de) row — will migrate
      (4L, "d", "en", "book", 40L))
    val newV = docs(
      (1L, "a", "en", "web", 10L),   // keep
      (2L, "b2", "en", "web", 25L),  // update in place (sum moves)
      (3L, "c", "en", "web", 30L),   // migration: (web,de) dies, (web,en) grows
      (5L, "e", "fr", "web", 50L))   // insert into a NEW group; doc 4 deleted
    val feed = Ivm.changeFeedOver(oldV, newV, "doc_id")
    val maintained = Ivm.applyFeed(Ivm.viewOf(oldV), feed)
    assert(setOf(maintained) == setOf(Ivm.viewOf(newV)))
    // group death really happened: no (web, de) or (book, en) row lingers
    val groups = maintained.select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!groups.contains(("web", "de")) && !groups.contains(("book", "en")))
  }

  test("empty feed is the identity") {
    val state = docs((1L, "a", "en", "web", 10L), (2L, "b", "de", "web", 20L))
    val feed = Ivm.changeFeedOver(state, state, "doc_id")
    assert(feed.count() == 0)
    assert(setOf(Ivm.applyFeed(Ivm.viewOf(state), feed)) == setOf(Ivm.viewOf(state)))
  }

  test("change feed carries old AND new values with the right ops") {
    val oldV = docs((1L, "a", "en", "web", 10L), (2L, "b", "de", "web", 20L))
    val newV = docs((2L, "b", "fr", "web", 21L), (3L, "c", "en", "book", 30L))
    val feed = Ivm.changeFeedOver(oldV, newV, "doc_id")
      .select("doc_id", "op", "o_lang", "n_lang", "o_n_chars", "n_n_chars")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(feed(1L) == (("delete", "en", null)))
    assert(feed(2L) == (("update", "de", "fr")))
    assert(feed(3L) == (("insert", null, "en")))
  }

  test("fixture identity: ivm_agg == recompute over v1; the fold reaches v2") {
    val dir = "/root/testdata/sf0.001"
    assert(setOf(Ivm.ivmAgg(spark, dir)) == setOf(Ivm.viewOf(Ivm.v1(spark, dir))))
    assert(setOf(Ivm.ivmFold(spark, dir)) == setOf(Ivm.viewOf(Ivm.v2(spark, dir))))
  }

  test("join view: fact-side feed maintains the joined aggregate, incl. nation migration") {
    val dir = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, dir)
    val maintained = Ivm.ivmJoin(spark, dir)
    val recomputed = Ivm.joinViewOf(Ivm.ordersV1(spark, dir), cust)
      .select(col("nationkey"), col("n_orders"),
        col("revenue").cast("double").as("revenue"))
    assert(setOf(maintained) == setOf(recomputed))
    assert(maintained.count() > 1, "several nations or this pins nothing")
    // the migration case really fires: at least one update re-points
    // o_custkey to a customer in a DIFFERENT nation
    val feed = Ivm.changeFeedOver(
      Ivm.ordersV0(spark, dir), Ivm.ordersV1(spark, dir), "o_orderkey")
    val nk = cust.select(col("c_custkey"), col("c_nationkey"))
    val migrated = feed.where(col("op") === "update" &&
        col("o_o_custkey") =!= col("n_o_custkey"))
      .join(nk.as("a"), col("o_o_custkey") === col("a.c_custkey"))
      .join(nk.as("b"), col("n_o_custkey") === col("b.c_custkey"))
      .where(col("a.c_nationkey") =!= col("b.c_nationkey"))
    assert(migrated.count() > 0, "need at least one cross-nation migration")
  }

  test("dim view: dim-side feed remaps the fact pre-aggregate, incl. churn") {
    val dir = "/root/testdata/sf0.001"
    val maintained = Ivm.ivmDim(spark, dir)
    val recomputed = Ivm.joinViewOf(
        Tables.orders(spark, dir), Ivm.custV1(spark, dir))
      .select(col("nationkey"), col("n_orders"),
        col("revenue").cast("double").as("revenue"))
    assert(setOf(maintained) == setOf(recomputed))
    // the hard cases really fire on this fixture: a nation migration
    // and a customer deletion both appear in the feed
    val feed = Ivm.changeFeedOver(
      Tables.customer(spark, dir), Ivm.custV1(spark, dir), "c_custkey")
    assert(feed.where(col("op") === "update" &&
      col("o_c_nationkey") =!= col("n_c_nationkey")).count() > 0,
      "need at least one nation migration")
    assert(feed.where(col("op") === "delete").count() > 0,
      "need at least one churned customer")
  }

  test("the delta aggregation partial-aggregates before the exchange") {
    // the maintenance cost claim is O(|changes|) with map-side combine:
    // the plan must show a partial HashAggregate below the exchange for
    // the feed-sized delta, and the view merge must be a join of two
    // aggregates (never a re-aggregation of the corpus rows)
    val dir = "/root/testdata/sf0.001"
    val plan = Ivm.ivmAgg(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"expected a partial aggregate in:\n$plan")
  }
}
