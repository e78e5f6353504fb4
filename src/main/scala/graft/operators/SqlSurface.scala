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
}
