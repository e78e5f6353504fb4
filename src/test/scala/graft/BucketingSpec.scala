package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketing

/** Proves the bucketed-table co-located join: two fact tables written
  * bucketed by the join key join with ZERO shuffle exchanges, vs 2 for
  * the plain parquet path. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed fact-fact join plans with zero exchanges; unbucketed needs two") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    // force SMJ (no broadcast) so the exchange comparison is honest, and
    // disable AQE for a deterministic static plan to count nodes in
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      assert(Bucketing.exchangeCount(plain) >= 2) // both join inputs shuffle

      Bucketing.writeBucketed(li, "li_b", 8, "l_orderkey")
      Bucketing.writeBucketed(ord, "ord_b", 8, "o_orderkey")
      val bl = spark.table("li_b"); val bo = spark.table("ord_b")
      val joined = bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
      // join itself: no exchange at all — both sides read pre-bucketed
      assert(Bucketing.exchangeCount(joined) === 0)
      assert(joined.count() > 0)
      // the bucketed join result matches the plain join
      assert(joined.count() ===
        li.join(ord, li("l_orderkey") === ord("o_orderkey")).count())
      // groupBy on the SAME key also reuses the bucketing: only the
      // final single aggregation exchange may remain absent too
      val agg = bl.groupBy(col("l_orderkey")).agg(sum(col("l_quantity")))
      assert(Bucketing.exchangeCount(agg) === 0)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
