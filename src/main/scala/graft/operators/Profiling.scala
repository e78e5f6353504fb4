package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Whole-warehouse column profile — the catalog statistics table
  * (rows, nulls, exact distinct counts per column) every governance /
  * query-planning layer keeps. One aggregation pass per table: the
  * multi-column distinct counts plan through Spark's Expand (one scan,
  * ×|columns| row expansion before the partial aggregates — the
  * standard multi-distinct trade; at extreme scale swap
  * `countDistinct` for the engine's own HLL UDAF ([[HeavyHitters]])
  * and keep the same melt). The single stats row per table is melted
  * to (tbl, col_name, …) rows driver-free via one explode.
  *
  * The profiled column set is a STATIC contract shared verbatim by the
  * Spark pass and the DuckDB twin (generated from the same map), so a
  * fixture schema change breaks both sides loudly rather than
  * diverging silently. `events.ts` profiles as the canonical `ts_us`
  * ([[Tables.events]] normalization — the raw encoding has drifted
  * across fixture regenerations).
  */
object Profiling {

  private val ProfileTables: Seq[(String, Seq[String])] = Seq(
    "region"    -> Seq("r_regionkey", "r_name"),
    "nation"    -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"  -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"  -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"      -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"    -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem"  -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "events"    -> Seq("event_id", "ts_us", "user_id", "event_type", "value", "props"))

  private def tableOf(s: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => Tables.events(s, dir)
      case "region" => Tables.region(s, dir)
      case "nation" => Tables.nation(s, dir)
      case "customer" => Tables.customer(s, dir)
      case "supplier" => Tables.supplier(s, dir)
      case "part" => Tables.part(s, dir)
      case "orders" => Tables.orders(s, dir)
      case "lineitem" => Tables.lineitem(s, dir)
      case "documents" => Tables.documents(s, dir)
    }

  def dqProfile(s: SparkSession, dir: String): DataFrame = {
    val perTable = ProfileTables.map { case (tbl, cols) =>
      val aggs: Seq[Column] = cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c")))
      val row = tableOf(s, dir, tbl)
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
      val melted = array(cols.map(c => struct(
        lit(tbl).as("tbl"), lit(c).as("col_name"), col("n_rows"),
        col(s"null_$c").as("n_null"), col(s"dist_$c").as("n_distinct"))): _*)
      row.select(explode(melted).as("e"))
        .select(col("e.tbl").as("tbl"), col("e.col_name").as("col_name"),
          col("e.n_rows").as("n_rows"), col("e.n_null").as("n_null"),
          col("e.n_distinct").as("n_distinct"))
    }
    perTable.reduce(_.unionByName(_))
  }

  val dqProfileSql: String = {
    val selects = ProfileTables.flatMap { case (tbl, cols) =>
      val from = if (tbl == "events") "ev" else tbl
      cols.map(c =>
        s"""SELECT '$tbl' AS tbl, '$c' AS col_name,
           |  CAST(COUNT(1) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
           |FROM $from""".stripMargin)
    }
    Tables.eventsCteSql + "\n" + selects.mkString("\nUNION ALL\n")
  }

  // ------------------------------------------------------ dq_fk_check
  /** Referential-integrity audit over the warehouse's FK edges: per
    * edge, child row count and ORPHAN count (child keys with no parent
    * row) — the join-before-you-join check that catches a truncated
    * parent load before a silent inner-join row loss. Each edge is one
    * LEFT ANTI join on the key (broadcast when the parent is small, a
    * key-only shuffle otherwise — the child's payload columns are
    * pruned); the edge list is the same static-contract style as
    * [[ProfileTables]]. */
  private val FkEdges: Seq[(String, String, String, String)] = Seq(
    // (childTable, childKey, parentTable, parentKey)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  def dqFkCheck(s: SparkSession, dir: String): DataFrame = {
    val perEdge = FkEdges.map { case (ct, ck, pt, pk) =>
      val child = tableOf(s, dir, ct).select(col(ck))
      val parent = tableOf(s, dir, pt).select(col(pk))
      val orphans = child.join(parent, col(ck) === col(pk), "left_anti")
      child.agg(count(lit(1)).as("n_child")).crossJoin(
          orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(s"$ct.$ck").as("fk"), lit(s"$pt.$pk").as("ref"),
          col("n_child"), col("n_orphans"))
    }
    perEdge.reduce(_.unionByName(_))
  }

  val dqFkCheckSql: String = {
    val selects = FkEdges.map { case (ct, ck, pt, pk) =>
      s"""SELECT '$ct.$ck' AS fk, '$pt.$pk' AS ref,
         |  (SELECT CAST(COUNT(1) AS BIGINT) FROM $ct) AS n_child,
         |  (SELECT CAST(COUNT(1) AS BIGINT) FROM $ct c
         |   WHERE NOT EXISTS (SELECT 1 FROM $pt p WHERE c.$ck = p.$pk)) AS n_orphans""".stripMargin
    }
    selects.mkString("\nUNION ALL\n")
  }
}
