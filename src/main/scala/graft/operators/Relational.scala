package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator suite over the TPC-H-ish fixture tables.
  *
  * The reference engine (natedob/GoLang_MapReduce) has no relational
  * operators at all — each job is a single-input map→shuffle→reduce
  * pipeline (SURVEY.md §2.4; reference `mr/coordinator.go:337-339`).
  * This file provides the relational surface the extended engine needs,
  * expressed declaratively so Catalyst handles pushdown, pruning, join
  * strategy, and AQE at scale.
  *
  * Determinism rules (driver hash-compares vs DuckDB):
  *  - money/quantity aggregates go through exact DECIMAL arithmetic in
  *    BOTH engines, cast back to DOUBLE at the end — double summation
  *    order is partitioning-dependent and can never hash-match;
  *  - every LIMIT/top-k has a total-order tiebreaker;
  *  - event time is epoch-µs longs (see [[graft.Tables.events]]).
  */
object Relational {

  private def dec(c: String): Column = col(c).cast("decimal(18,2)")
  private def one: Column = lit(1).cast("decimal(18,2)")
  private def ts(s: String): Column = lit(s).cast("timestamp")

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1-style pricing summary. Single lineitem scan, map-side
    * partial agg, one shuffle on a low-cardinality 2-col key. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (one - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS avg_price,
      |  COUNT(1) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** TPC-H Q6-style selective scan-aggregate: predicate + column
    * pruning must reach the parquet reader (PushedFilters). */
  def q2SelectiveAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= ts("1997-01-01") &&
             col("l_shipdate") < ts("1998-01-01") &&
             col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
             col("l_quantity") < 24)
      .agg(
        sum(dec("l_extendedprice") * dec("l_discount")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val q2SelectiveAggSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(1) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q3
  /** TPC-H Q3-style shipping-priority top-k: 3-way join, agg, total-order
    * top 10. customer is broadcast-small; orders⋈lineitem shuffles on
    * orderkey (the natural co-partitioning key at scale). */
  def q3JoinTopk(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).where(col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(s, dir).where(col("l_shipdate") > ts("1998-01-05"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (one - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val q3JoinTopkSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-05'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q4
  /** Semi join (EXISTS): orders having at least one heavy lineitem.
    * left_semi never duplicates and never widens the row — at scale it
    * beats JOIN+DISTINCT by skipping the dedup shuffle. */
  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(s, dir).where(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    Tables.orders(s, dir)
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  val q4SemiJoinSql: String =
    """SELECT o_orderpriority, COUNT(1) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Anti join (NOT EXISTS): customers with no URGENT order, counted per
    * market segment. */
  def q5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    Tables.customer(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  val q5AntiJoinSql: String =
    """SELECT c_mktsegment, COUNT(1) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q6
  /** TPC-H Q5-style multi-join: big fact tables shuffle on their join
    * keys; all dimensions (supplier, customer, nation, region) are
    * broadcast. Revenue per nation for one region/year. */
  def q6MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
    val sup = Tables.supplier(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .where(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
                          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") * (one - dec("l_discount")))
        .cast("double").as("revenue"))
  }

  val q6MultiJoinSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Broadcast join fact→dim: per-brand demand. part is tiny relative to
    * lineitem at every SF → explicit broadcast(), no shuffle of the fact
    * side beyond the final agg. */
  def q7BroadcastJoin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec("l_quantity")).cast("double").as("sum_qty"))

  val q7BroadcastJoinSql: String =
    """SELECT p_brand, COUNT(1) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q8
  /** Ranking window: top-3 customers by balance per nation. row_number
    * with a total-order tiebreaker; partition-local sort after one
    * shuffle on nationkey. */
  def q8WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_acctbal"), col("rnk"))
  }

  val q8WindowRankSql: String =
    """SELECT n_name, c_custkey, c_acctbal, rnk
      |FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer) t
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE rnk <= 3""".stripMargin

  // ---------------------------------------------------------------- q9
  /** Running-total window frame: cumulative customer spend over time.
    * DECIMAL running sum (frame-ordered, engine-independent) + lag. */
  def q9WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("running_spend",
        sum(dec("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1, -1.0).over(w))
      .withColumn("order_rank", row_number().over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("running_spend"),
              col("prev_price"), col("order_rank"))
  }

  val q9WindowRunningSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend,
      |  LAG(o_totalprice, 1, -1.0) OVER w AS prev_price,
      |  ROW_NUMBER() OVER w AS order_rank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // --------------------------------------------------------------- q10
  /** Global top-k with total order: TakeOrderedAndProject — never a full
    * sort at scale, each partition keeps k rows then the driver merges. */
  def q10TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(20)

  val q10TopKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q11
  /** Set operators: customers ordering in 1996 vs 1998 — INTERSECT /
    * EXCEPT both directions, tagged and unioned. */
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def buyers(y0: String, y1: String): DataFrame =
      o.where(col("o_orderdate") >= ts(y0) && col("o_orderdate") < ts(y1))
        .select(col("o_custkey")).distinct()
    val a = buyers("1996-01-01", "1997-01-01")
    val b = buyers("1998-01-01", "1999-01-01")
    a.intersect(b).withColumn("tag", lit("both"))
      .unionByName(a.except(b).withColumn("tag", lit("only_1996")))
      .unionByName(b.except(a).withColumn("tag", lit("only_1998")))
  }

  val q11SetOpsSql: String =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
      |           WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
      |     b AS (SELECT DISTINCT o_custkey FROM orders
      |           WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01')
      |SELECT o_custkey, 'both' AS tag FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
      |UNION ALL
      |SELECT o_custkey, 'only_1996' AS tag FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
      |UNION ALL
      |SELECT o_custkey, 'only_1998' AS tag FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)""".stripMargin

  // --------------------------------------------------------------- q12
  /** ROLLUP: nation × segment hierarchy with subtotals and grand total.
    * COALESCE the grouping columns so NULL-vs-subtotal is unambiguous. */
  def q12Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           sum(dec("c_acctbal")).cast("double").as("sum_bal"))
      .select(
        coalesce(col("n_name"), lit("<all>")).as("nation"),
        coalesce(col("c_mktsegment"), lit("<all>")).as("segment"),
        col("n_customers"), col("sum_bal"))

  val q12RollupSql: String =
    """SELECT COALESCE(n_name, '<all>') AS nation,
      |       COALESCE(c_mktsegment, '<all>') AS segment,
      |       COUNT(1) AS n_customers,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin

  // --------------------------------------------------------------- q13
  /** CUBE over order status × priority. */
  def q13Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           sum(dec("o_totalprice")).cast("double").as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("n_orders"), col("sum_price"))

  val q13CubeSql: String =
    """SELECT COALESCE(o_orderstatus, '<all>') AS status,
      |       COALESCE(o_orderpriority, '<all>') AS priority,
      |       COUNT(1) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // --------------------------------------------------------------- q14
  /** Exact multi-distinct aggregation (Catalyst expands to one pass per
    * distinct key via Expand — still no driver-side work). */
  def q14DistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      count(lit(1)).as("n_rows"))

  val q14DistinctAggSql: String =
    """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
      |       COUNT(DISTINCT l_suppkey) AS n_supps,
      |       COUNT(DISTINCT l_orderkey) AS n_orders,
      |       COUNT(1) AS n_rows
      |FROM lineitem""".stripMargin

  // --------------------------------------------------------------- q20
  /** Sketch-based distinct (HyperLogLog++): the 100 TB answer to
    * COUNT(DISTINCT) — constant memory, mergeable, no Expand blow-up.
    * No DuckDB oracle (HLL implementations differ across engines);
    * FunctionsSpec bounds the error against the exact count. */
  def q20ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("a_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("a_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      // HLL++ is deterministic for fixed data, so "estimate within
      // tolerance" is a stable boolean the DuckDB oracle can assert as
      // a constant — upgrading this query from rows-only to
      // hash-checked without demanding cross-engine sketch-identical
      // estimates. Tolerance = 5σ of the configured rsd (0.02): at 5%
      // (2.5σ) a legitimately drifting sketch at an untested scale
      // factor would surface as an opaque hash mismatch instead of a
      // tolerance failure.
      .select(
        col("exact_parts"), col("exact_orders"),
        (abs(col("a_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.10).cast("int").as("parts_within_tol"),
        (abs(col("a_orders") - col("exact_orders")) <=
          col("exact_orders") * 0.10).cast("int").as("orders_within_tol"))

  val q20ApproxDistinctSql: String =
    """SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
      |       COUNT(DISTINCT l_orderkey) AS exact_orders,
      |       CAST(1 AS INT) AS parts_within_tol,
      |       CAST(1 AS INT) AS orders_within_tol
      |FROM lineitem""".stripMargin

  // --------------------------------------------------------------- q23
  /** Order statistics: exact per-flag median/quartiles by the two-pass
    * counting-selection kernel ([[Selection.exactPctileByKey]]) —
    * ceil-rank order statistics in integer cents, so every value is an
    * ELEMENT of the column and the row hash-checks cross-engine.
    * Replaces the `percentile()` aggregate this query shipped through
    * round 9: that function collects every value of a group into ONE
    * aggregation buffer — the exact single-task trap the selection
    * kernel exists to avoid (PlanSpec pins its absence). Both metrics
    * ride one stacked pass-1 histogram (`stack` unpivots qty/price
    * into a metric key, so the grouped kernel sees 2·|flags| bounded
    * groups); min/max/count ride the kernel's OWN two passes
    * (`withMinMax` — extreme buckets join the pass-2 slice), so the
    * whole summary is exactly two column scans. */
  def q23Stats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stacked = Tables.lineitem(s, dir).selectExpr(
      "l_returnflag",
      "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c",
      "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c")
      .selectExpr("l_returnflag",
        "stack(2, 'qty', qty_c, 'price', price_c) AS (m, cents)")
    val rows = Selection
      .exactPctileByKey(s, stacked, Seq("l_returnflag", "m"), Seq(25, 50, 75),
        withMinMax = true)
      .collect()
    val pct = rows
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)), r.getLong(5)))
      .toMap
    // per-group n / exact min / exact max off the same kernel output —
    // n is rows-per-(flag, metric) = lineitem rows per flag
    val meta = rows
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(4), r.getLong(6), r.getLong(7)))).toMap
    // driver pivot of |flags| × metrics × percentiles rows — bounded by
    // the grouping cardinality, same argument as the kernel itself
    meta.keys.map(_._1).toSeq.distinct.sorted.map { f =>
      val (n, minP, maxP) = meta((f, "price"))
      (f, pct((f, "qty", 50)), pct((f, "price", 25)), pct((f, "price", 75)),
        minP, maxP, n)
    }.toDF("l_returnflag", "median_qty_c", "p25_price_c", "p75_price_c",
      "min_price_c", "max_price_c", "n")
  }

  val q23StatsSql: String =
    """WITH c AS (
      |  SELECT l_returnflag AS k,
      |         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
      |  FROM lineitem),
      |n AS (SELECT k, CAST(COUNT(1) AS BIGINT) AS n,
      |             MIN(price_c) AS min_price_c, MAX(price_c) AS max_price_c
      |      FROM c GROUP BY k),
      |rq AS (SELECT k, qty_c, ROW_NUMBER() OVER (PARTITION BY k ORDER BY qty_c) AS rn FROM c),
      |rp AS (SELECT k, price_c, ROW_NUMBER() OVER (PARTITION BY k ORDER BY price_c) AS rn FROM c)
      |SELECT n.k AS l_returnflag,
      |       q50.qty_c AS median_qty_c,
      |       p25.price_c AS p25_price_c,
      |       p75.price_c AS p75_price_c,
      |       n.min_price_c, n.max_price_c, n.n
      |FROM n
      |JOIN rq q50 ON q50.k = n.k AND q50.rn = (50 * n.n + 99) // 100
      |JOIN rp p25 ON p25.k = n.k AND p25.rn = (25 * n.n + 99) // 100
      |JOIN rp p75 ON p75.k = n.k AND p75.rn = (75 * n.n + 99) // 100""".stripMargin

  // --------------------------------------------------------------- q34
  /** Fixed-width histogram of l_extendedprice in [0, 120000) — binning
    * + count, the profiling primitive. The bucket index floor(x/w) is
    * one IEEE division+floor (identical everywhere); fixed bounds (not
    * data-driven min/max) so bucket edges don't depend on a prior
    * aggregation. One groupBy on ≤ NBuckets keys — partial aggs absorb
    * everything map-side. */
  val HistBuckets = 24
  val HistWidth = 5000.0

  def q34Histogram(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(least(floor(col("l_extendedprice") / HistWidth),
        lit(HistBuckets - 1)).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .select(col("bucket"), (col("bucket") * HistWidth).as("lo"), col("cnt"))

  val q34HistogramSql: String =
    s"""SELECT bucket, bucket * ${HistWidth}e0 AS lo, COUNT(1) AS cnt
       |FROM (SELECT CAST(LEAST(FLOOR(l_extendedprice / ${HistWidth}e0),
       |                        ${HistBuckets - 1}) AS INT) AS bucket
       |      FROM lineitem)
       |GROUP BY bucket""".stripMargin

  // --------------------------------------------------------------- q35
  /** Data-quality audit in one pass per table: null counts, primary-key
    * duplicate count, and referential orphans (anti-join shape) — the
    * constraint checks a pipeline runs before trusting a batch. Each
    * check is an aggregate over one scan; orphans use a broadcast
    * semi/anti join against the parent keys. Output: one row per check.
    */
  def q35DqChecks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val liNulls = li.agg(
      sum(col("l_orderkey").isNull.cast("long")).as("v"))
      .select(lit("lineitem_null_orderkey").as("check"), col("v"))
    val ordDupPk = ord.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).agg(count(lit(1)).as("v"))
      .select(lit("orders_dup_pk").as("check"), col("v"))
    val ordOrphans = ord.join(cust,
        ord("o_custkey") === cust("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .select(lit("orders_orphan_custkey").as("check"), col("v"))
    val liOrphans = li.join(ord,
        li("l_orderkey") === ord("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .select(lit("lineitem_orphan_orderkey").as("check"), col("v"))
    liNulls.union(ordDupPk).union(ordOrphans).union(liOrphans)
  }

  val q35DqChecksSql: String =
    """SELECT 'lineitem_null_orderkey' AS check,
      |       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders_dup_pk', COUNT(1)
      |FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(1) > 1)
      |UNION ALL
      |SELECT 'orders_orphan_custkey', COUNT(1)
      |FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'lineitem_orphan_orderkey', COUNT(1)
      |FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin

  // --------------------------------------------------------------- q33
  /** Covariance/correlation per group WITHOUT the built-in corr/covar
    * aggregates: their streaming update formulas accumulate doubles in
    * partition order, which never hash-matches across engines. Instead:
    * exact DECIMAL sums (Σx, Σy, Σxy, Σx², Σy² — order-independent),
    * then the closed forms in doubles. Every double op is an IEEE
    * correctly-rounded operation (+,−,×,÷,sqrt) on identical inputs, so
    * the results agree bitwise. Same one-pass shuffle profile as the
    * built-ins. */
  def q33CovCorr(s: SparkSession, dir: String): DataFrame = {
    val (x, y) = (dec("l_quantity"), dec("l_extendedprice"))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .selectExpr("l_returnflag", "n",
        "(cast(sxy as double) - cast(sx as double) * cast(sy as double) / n) / n as cov_pop",
        // zero-variance groups (any single-row or constant-column
        // group) have no defined correlation: emit NULL explicitly —
        // Spark's 0.0/0.0 is NaN while DuckDB's is NULL, so an
        // unguarded division diverges cross-engine exactly there
        """CASE WHEN (cast(sxx as double) - cast(sx as double) * cast(sx as double) / n) <= 0
          |       OR (cast(syy as double) - cast(sy as double) * cast(sy as double) / n) <= 0
          |     THEN NULL
          |     ELSE ((cast(sxy as double) - cast(sx as double) * cast(sy as double) / n) / n)
          |       / (sqrt((cast(sxx as double) - cast(sx as double) * cast(sx as double) / n) / n)
          |          * sqrt((cast(syy as double) - cast(sy as double) * cast(sy as double) / n) / n))
          |END as corr""".stripMargin)
  }

  val q33CovCorrSql: String =
    """WITH a AS (
      |  SELECT l_returnflag, COUNT(1) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / n AS cov_pop,
      |  CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) <= 0
      |         OR (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n) <= 0
      |       THEN NULL
      |       ELSE ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / n)
      |         / (sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n)
      |            * sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n) / n))
      |  END AS corr
      |FROM a""".stripMargin

  // --------------------------------------------------------------- q31
  /** Mergeable percentile sketch: approx_percentile's KLL-style digest
    * is the 100 TB path; the EXACT baseline that grades it comes from
    * the counting-selection kernel (ceil-rank median in integer cents —
    * since r10 nothing in this engine funnels a group's values into a
    * single `percentile()` buffer, not even an eval tier). Oracle
    * strategy mirrors q20: output the exact median plus a deterministic
    * within-5% flag for the sketch estimate — the sketch is
    * deterministic for fixed data, DuckDB asserts the flag as a
    * constant without needing sketch-identical estimates. */
  def q31ApproxPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val med = Selection.exactPctileByKey(s,
        li.selectExpr("l_returnflag",
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents"),
        Seq("l_returnflag"), Seq(50))
      .collect().map(r => (r.getString(0), r.getLong(4))).toSeq
      .sortBy(_._1).toDF("l_returnflag", "exact_median_c")
    li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a_med"),
        count(lit(1)).as("n"))
      .join(broadcast(med), "l_returnflag")
      // accuracy=10000 bounds RANK error at n/10000 (≈6 ranks at sf0.01)
      // — a 5% VALUE tolerance is many sigma of headroom at any SF while
      // still catching a broken sketch outright
      .select(col("l_returnflag"), col("exact_median_c"), col("n"),
        (abs(col("a_med") * 100 - col("exact_median_c")) <=
          col("exact_median_c") * 0.05).cast("int").as("median_within_tol"))
  }

  val q31ApproxPercentileSql: String =
    """WITH c AS (
      |  SELECT l_returnflag,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, cents,
      |         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
      |         CAST(COUNT(1) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      |  FROM c)
      |SELECT l_returnflag, cents AS exact_median_c, n,
      |       CAST(1 AS INT) AS median_within_tol
      |FROM r WHERE rn = (50 * n + 99) // 100""".stripMargin

  // --------------------------------------------------------------- q21
  /** Array functions over grouped data: per-order part list (sorted,
    * sliced, probed) — collect_list/sort_array/slice/array_contains,
    * the array manipulation surface. */
  def q21Arrays(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
           sort_array(collect_list(col("l_partkey"))).as("parts"))
      .select(col("l_orderkey"), col("n_items"),
        // serialized (not ArrayType) so the result is hashable by any
        // row-compare harness; the array ops still run distributed
        array_join(slice(col("parts"), 1, 3), ",").as("first_parts"),
        array_contains(col("parts"), 1L).cast("int").as("has_part_1"),
        element_at(col("parts"), -1).as("max_part"))

  val q21ArraysSql: String =
    """SELECT l_orderkey, COUNT(1) AS n_items,
      |       array_to_string(list_sort(array_agg(l_partkey))[1:3], ',') AS first_parts,
      |       CAST(list_contains(list_sort(array_agg(l_partkey)), 1) AS INT) AS has_part_1,
      |       list_sort(array_agg(l_partkey))[-1] AS max_part
      |FROM lineitem
      |GROUP BY l_orderkey""".stripMargin

  // --------------------------------------------------------------- q15
  /** Scalar function library: string/math expressions, all codegen'd
    * built-ins (no UDFs). */
  def q15Scalar(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      length(col("p_name")).as("name_len"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      substring(col("p_type"), 1, 4).as("type4"),
      element_at(split(col("p_name"), " "), 1).as("first_word"),
      floor(col("p_retailprice")).cast("long").as("price_floor"),
      (col("p_size") % 7).cast("int").as("size_mod7"))

  val q15ScalarSql: String =
    """SELECT p_partkey,
      |  UPPER(p_brand) AS brand_u,
      |  CAST(LENGTH(p_name) AS INT) AS name_len,
      |  CONCAT_WS('|', p_brand, p_type) AS brand_type,
      |  SUBSTRING(p_type, 1, 4) AS type4,
      |  STRING_SPLIT(p_name, ' ')[1] AS first_word,
      |  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
      |  CAST(p_size % 7 AS INT) AS size_mod7
      |FROM part""".stripMargin

  // --------------------------------------------------------------- q16
  /** Date-part grouping: monthly order volume. year()/month() keep the
    * group key integer-typed (identical across engines, unlike
    * date_trunc whose return type differs). */
  def q16DateParts(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("o_year"),
               month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
           sum(dec("o_totalprice")).cast("double").as("sum_price"))

  val q16DatePartsSql: String =
    """SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
      |       CAST(MONTH(o_orderdate) AS INT) AS o_month,
      |       COUNT(1) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q17
  /** JSON extraction from the events props column + aggregation. */
  def q17Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"))

  val q17JsonSql: String =
    Tables.eventsCteSql +
    """
      |SELECT event_type, COUNT(1) AS n_events,
      |       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM ev
      |GROUP BY event_type""".stripMargin

  // --------------------------------------------------------------- q18
  /** As-of join composed from built-ins: for every purchase event, the
    * most recent preceding signup of the same user. One shuffle on
    * user_id + a frame-bounded running MAX — this is the scalable
    * pattern (no range-join explosion). */
  def q18AsOf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("last_signup_us",
        max(when(col("event_type") === "signup", col("ts_us"))).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
              col("ts_us").as("purchase_us"),
              coalesce(col("last_signup_us"), lit(-1L)).as("last_signup_us"))
  }

  val q18AsOfSql: String =
    Tables.eventsCteSql +
    """
      |SELECT event_id, user_id, ts_us AS purchase_us,
      |       COALESCE(MAX(CASE WHEN event_type = 'signup' THEN ts_us END)
      |                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS last_signup_us
      |FROM ev
      |QUALIFY event_type = 'purchase'""".stripMargin

  /** SALTED escalation of [[q18AsOf]] — the skew note SCALE.md left
    * open: one user with millions of events serializes [[q18AsOf]]'s
    * per-user window into a single task. Salting must preserve temporal
    * order, so the salt is a TIME bucket (ts_us div bucketUs), not a
    * hash, and the as-of becomes two passes:
    *  1. a running signup-max WITHIN each (user, bucket) — parallel
    *     across buckets, each window ≤ one bucket of events;
    *  2. a carry-in per bucket: the signup-max over all PRECEDING
    *     buckets, a window over the per-(user, bucket) aggregate —
    *     one row per bucket, millions of events collapse to thousands
    *     of rows before this pass.
    * last_signup = max(local, carry). Exactness: equal-ts events always
    * share a bucket (same div), so the (ts, event_id) tie order is
    * fully local to pass 1, and every prior-bucket event is strictly
    * earlier — Relational2Spec pins salted == unsalted on the real
    * events table at several widths. Size bucketUs so a hot user's
    * single-bucket event count fits one task (≈ events/sec × bucket
    * seconds); [[q18AsOf]] remains the no-skew operating point. */
  /** Gate operating point: hour-wide salt buckets. The ORACLE is the
    * plain unsalted window SQL ([[q18AsOfSql]]) — salted == unsalted is
    * the operator's whole contract, so the gate hash-checks the salted
    * plan against the straightforward single-window answer. */
  val AsOfSaltBucketUs: Long = 3600L * 1000 * 1000

  def q18AsOfSaltedGate(s: SparkSession, dir: String): DataFrame =
    q18AsOfSalted(s, dir, AsOfSaltBucketUs)

  def q18AsOfSalted(s: SparkSession, dir: String, bucketUs: Long): DataFrame = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    val ev = Tables.events(s, dir).withColumn("bkt", expr(s"ts_us div $bucketUs"))
    val wLocal = Window.partitionBy(col("user_id"), col("bkt"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ev.withColumn("local_signup_us",
      max(when(col("event_type") === "signup", col("ts_us"))).over(wLocal))
    val bmax = ev.groupBy(col("user_id"), col("bkt"))
      .agg(max(when(col("event_type") === "signup", col("ts_us")))
        .as("bkt_signup_us"))
    val wCarry = Window.partitionBy(col("user_id")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bmax
      .withColumn("carry_signup_us", max(col("bkt_signup_us")).over(wCarry))
      .select(col("user_id"), col("bkt"), col("carry_signup_us"))
    local.join(carry, Seq("user_id", "bkt"))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts_us").as("purchase_us"),
        coalesce(greatest(col("local_signup_us"), col("carry_signup_us")),
          lit(-1L)).as("last_signup_us"))
  }

  // --------------------------------------------------------------- q19
  /** Tumbling-window batch aggregation over event time (hourly buckets
    * as epoch-µs integers — the batch twin of the streaming query). */
  def q19EventWindow(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000 * 1000
    Tables.events(s, dir)
      .groupBy(expr(s"(ts_us div $hourUs) * $hourUs").as("hour_us"),
               col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(dec("value")).cast("double").as("sum_value"))
  }

  val q19EventWindowSql: String =
    Tables.eventsCteSql +
    """
      |SELECT (ts_us // 3600000000) * 3600000000 AS hour_us, event_type,
      |       COUNT(1) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM ev
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- dq_skew_report
  /** Join-key skew census — the report an engineer reads BEFORE
    * keying a 100-TB shuffle on a column: per-key row counts for
    * `orders.o_custkey` reduced to the distribution summary that
    * decides between a plain shuffle join, AQE skew splitting, or
    * salting. Two aggregations: per-key counts (map-side combined),
    * then a |keys|-row summary — exact ceil-rank percentiles over the
    * COUNT table, never the row table, computed by the two-pass
    * counting-selection kernel ([[Selection.exactPctileOver]]).
    * `top1_share_ppm` is integer parts-per-million so the headline
    * skew number hash-checks without an IEEE division.
    */
  def dqSkewReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // persist side of the kernel's persist-or-scan contract: counts is
    // a DERIVED frame (an aggregation over orders) and the selection
    // kernel scans it twice — without the persist, pass 2 would
    // recompute the groupBy
    val counts = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      // exact ceil-rank percentiles over the |keys|-sized count table
      // via the two-pass selection kernel — no single-buffer
      // `percentile()` aggregate anywhere on this path (PlanSpec pins)
      val pct = Selection
        .exactPctileOver(s, counts.select(col("cnt").as("cents")), Seq(50, 90, 99))
        .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
      val a = counts.agg(
        count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
        min(col("cnt")).as("min_cnt"), max(col("cnt")).as("max_cnt")).head()
      val (nk, nr, mn, mx) = (a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3))
      Seq((nk, nr, mn, mx, pct(50), pct(90), pct(99), mx * 1000000L / nr))
        .toDF("n_keys", "n_rows", "min_cnt", "max_cnt",
          "p50_cnt", "p90_cnt", "p99_cnt", "top1_share_ppm")
    } finally counts.unpersist()
  }

  val dqSkewReportSql: String =
    """WITH counts AS (
      |  SELECT o_custkey, CAST(COUNT(1) AS BIGINT) AS cnt
      |  FROM orders GROUP BY o_custkey),
      |n AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_keys,
      |             CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |             MIN(cnt) AS min_cnt, MAX(cnt) AS max_cnt
      |      FROM counts),
      |r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt) AS rn FROM counts)
      |SELECT n.n_keys, n.n_rows, n.min_cnt, n.max_cnt,
      |       (SELECT cnt FROM r WHERE rn = (50 * n.n_keys + 99) // 100) AS p50_cnt,
      |       (SELECT cnt FROM r WHERE rn = (90 * n.n_keys + 99) // 100) AS p90_cnt,
      |       (SELECT cnt FROM r WHERE rn = (99 * n.n_keys + 99) // 100) AS p99_cnt,
      |       n.max_cnt * 1000000 // n.n_rows AS top1_share_ppm
      |FROM n""".stripMargin
}
