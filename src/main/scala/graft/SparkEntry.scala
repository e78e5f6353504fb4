package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the extension
  * surface: dedup, similarity search, text analysis, streaming) gets one
  * entry in [[queries]]; SQL-expressible ones also get a DuckDB oracle in
  * [[oracleSql]] with IDENTICAL column names and deterministic values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql
  )

  /** Headline subset used by Bench (keep it representative, not exhaustive). */
  def benchQueries: Seq[String] = Seq("q1_agg")
}
