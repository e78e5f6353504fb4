package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** `spark.sql(...)` entry surface: temp views over the fixture tables
  * so users can query the engine in plain SQL. The demo query is
  * deliberately written in the ANSI subset both Spark SQL and DuckDB
  * parse identically — ONE string is both the Spark query and its
  * oracle.
  */
object SqlSurface {

  /** Register every fixture table as a temp view (events normalized to
    * µs like Tables.events). Idempotent. */
  def registerViews(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      s.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    Tables.events(s, dir).createOrReplaceTempView("events_us")
  }

  val sqlDirect: String =
    """SELECT o_orderstatus AS status,
      |       COUNT(1) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY o_orderstatus""".stripMargin

  def qSqlDirect(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    s.sql(sqlDirect)
  }

  /** GROUPING SETS — arbitrary grouping combinations in one pass
    * (Expand + single shuffle), the general form of rollup/cube.
    * Same string runs in both engines. */
  val sqlGroupingSets: String =
    """SELECT COALESCE(n_name, '<all>') AS nation,
      |       COALESCE(c_mktsegment, '<all>') AS segment,
      |       COUNT(1) AS n_customers,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())""".stripMargin

  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    s.sql(sqlGroupingSets)
  }

  /** CTE + scalar subqueries + EXISTS + IN in one ANSI statement both
    * engines parse identically. The above-average predicate is written
    * shuffle-free of float folklore: `price × N > Σprice` compares an
    * IEEE product of exact inputs against an exact DECIMAL sum cast to
    * DOUBLE — no AVG whose rounding differs per engine at the
    * comparison boundary. Catalyst decorrelates the EXISTS to a
    * semi-join and the scalar subqueries to broadcast singletons. */
  val sqlCte: String =
    """WITH big_orders AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice
      |  FROM orders
      |  WHERE o_totalprice * (SELECT COUNT(1) FROM orders)
      |        > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders)
      |),
      |active_cust AS (
      |  SELECT c_custkey, c_name
      |  FROM customer
      |  WHERE EXISTS (SELECT 1 FROM big_orders b WHERE b.o_custkey = c_custkey)
      |    AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
      |)
      |SELECT c.c_custkey, c.c_name,
      |       COUNT(1) AS n_big,
      |       CAST(SUM(CAST(b.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM active_cust c JOIN big_orders b ON b.o_custkey = c.c_custkey
      |GROUP BY c.c_custkey, c.c_name""".stripMargin

  def qSqlCte(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    s.sql(sqlCte)
  }

  /** LATERAL correlated derived table — per-group top-k as the SQL
    * surface expresses it (the relational form of "for each nation,
    * its 2 richest customers"). Catalyst plans the correlated LIMIT
    * subquery as a LateralJoin and DuckDB as a dependent join; the
    * (c_acctbal DESC, c_custkey) order makes the k rows deterministic,
    * and the output carries raw column values (no float aggregation),
    * so the one string hash-checks in both engines. */
  val sqlLateral: String =
    """SELECT n.n_name AS nation, t.c_custkey, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_custkey, c_name, c_acctbal
      |  FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey
      |  LIMIT 2
      |) t""".stripMargin

  def qSqlLateral(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    s.sql(sqlLateral)
  }

  /** RECURSIVE CTE — ONE ANSI string both engines execute verbatim
    * (Spark 4.x `WITH RECURSIVE` / DuckDB native): a doubling-threshold
    * ladder (1, 2, 4, … 2²⁰) LEFT-joined against orders to read the
    * revenue distribution by order size. The recursion is a bounded
    * integer ladder (21 rows — provably terminating, no cycle hazard);
    * the fan-out is a 21×|orders| theta join where the 21-row side
    * broadcasts. DECIMAL money discipline as everywhere; COUNT(col)
    * counts matched rows only, so empty thresholds surface as 0. */
  val sqlRecursive: String =
    """WITH RECURSIVE t(p) AS (
      |  SELECT 1
      |  UNION ALL
      |  SELECT p * 2 FROM t WHERE p < 1048576)
      |SELECT t.p AS threshold,
      |       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_below,
      |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_below
      |FROM t LEFT JOIN orders o ON o.o_totalprice < t.p
      |GROUP BY t.p""".stripMargin

  def qSqlRecursive(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    s.sql(sqlRecursive)
  }

  /** WINDOW-FUNCTION SQL surface — ONE ANSI string both engines run
    * verbatim (the dialect-compat discipline of [[sqlRecursive]]),
    * covering the clauses the DataFrame battery (q8/q9/q29/q32)
    * expresses natively: a named WINDOW clause reused by rank /
    * dense_rank / lag with default / a bounded ROWS frame, plus an
    * independent RANGE frame. Supplier account balances are DECIMAL —
    * SUMs hash-check without the double-summation hazard. */
  val sqlWindow: String =
    """SELECT s_nationkey, s_suppkey,
      |       RANK() OVER w AS rnk,
      |       DENSE_RANK() OVER w AS drnk,
      |       LAG(s_suppkey, 1, -1) OVER w AS prev_supp,
      |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY s_nationkey
      |              ORDER BY s_acctbal DESC, s_suppkey
      |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS bal3,
      |       CAST(COUNT(1) OVER (PARTITION BY s_nationkey
      |              ORDER BY s_acctbal
      |              RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING)
      |            AS BIGINT) AS near_peers
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)""".stripMargin

  def qSqlWindow(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    s.sql(sqlWindow)
  }
}
