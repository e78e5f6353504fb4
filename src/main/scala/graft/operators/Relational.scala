package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator suite over the TPC-H-ish fixture tables.
  *
  * The reference engine (natedob/GoLang_MapReduce) has no relational
  * operators at all — each job is a single-input map→shuffle→reduce
  * pipeline (see SURVEY.md §2.4, reference `mr/coordinator.go:337-339`).
  * This file provides the relational surface the extended engine needs,
  * expressed declaratively so Catalyst handles pushdown, pruning, join
  * strategy, and AQE at scale.
  *
  * Numeric parity note: every money aggregate is computed in exact
  * DECIMAL arithmetic and cast back to DOUBLE at the end, in both the
  * Spark plan and the DuckDB oracle SQL. Double summation order differs
  * between engines (and between partitionings of the same engine), so
  * summing doubles directly can never hash-match; decimal sums are
  * order-independent and exact.
  */
object Relational {

  /** Exact decimal view of a 2-dp money/quantity double column. */
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** q1_agg — TPC-H Q1-style pricing summary.
    * Scale notes: single scan of lineitem, partial aggregation map-side
    * (hash agg with 6 narrow agg buffers), one shuffle on a 2-column
    * low-cardinality key. At 100 TB this is the ideal shape: no join,
    * pushdown of the shipdate filter to parquet, AQE coalesces the tiny
    * post-shuffle partitions.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
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
}
