package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.Bucketing

/** q38: the flagship 100 TB fact⋈fact join strategy, driver-verified.
  *
  * lineitem and orders are first written as bucketed+sorted tables on
  * the join key (the one-time co-location cost), then joined and
  * aggregated per order — and the physical plan is ASSERTED, at gate
  * time, to contain ZERO Exchange nodes: the SortMergeJoin reads both
  * sides pre-partitioned (bucket metadata proves co-partitioning) and
  * the per-orderkey aggregation reuses the same partitioning (bucket
  * key ⊆ grouping keys). At 100 TB this is the difference between
  * shuffling both fact tables on every query and shuffling neither.
  *
  * The MERGE hint forces the SMJ so the assertion is honest at any
  * scale factor (at fixture scale orders would otherwise broadcast —
  * proving nothing about co-location); with no Exchange in the plan
  * AQE never re-plans it.
  */
object BucketedJoin {

  /** Fixture-scale bucket count. At 100 TB size so each bucket lands
    * at 128–512 MB (see [[graft.sources.Bucketing]] sizing note). */
  val NBuckets = 8

  /** (applicationId, sfDir) pairs whose bucketed layout already exists
    * in this JVM's warehouse. The layout build is the ONE-TIME
    * co-location cost the whole strategy amortizes — rebuilding it on
    * every invocation (as min-of-N bench runs do) would charge the ETL
    * write to every query. Keyed by applicationId so a fresh session
    * (whose in-memory catalog forgot the tables) rebuilds. */
  private val layoutBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def q38BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    // dir-scoped table names: two sf dirs in one JVM (spec fixtures vs
    // testdata) must not reuse each other's layout
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val (liTable, ordTable) = (s"graft_q38_li_$tag", s"graft_q38_ord_$tag")
    val memoKey = s"${s.sparkContext.applicationId}|$dir"
    // computeIfAbsent: atomic per key — concurrent callers block until
    // the build completes, and a build that THROWS records nothing, so
    // the next call retries instead of failing at s.table() on a
    // half-built layout
    layoutBuilt.computeIfAbsent(memoKey, _ => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
      Bucketing.writeBucketed(li, liTable, NBuckets, "l_orderkey")
      Bucketing.writeBucketed(ord, ordTable, NBuckets, "o_orderkey")
      java.lang.Boolean.TRUE
    })
    val bl = s.table(liTable)
    val bo = s.table(ordTable)
    val joined = bl.hint("MERGE")
      .join(bo, bl("l_orderkey") === bo("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    val nEx = Bucketing.exchangeCount(joined)
    require(nEx == 0,
      s"q38: bucketed co-located join must plan with zero Exchange nodes, got $nEx")
    joined
  }

  val q38BucketedJoinSql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  COUNT(1) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey, o_orderpriority""".stripMargin
}
