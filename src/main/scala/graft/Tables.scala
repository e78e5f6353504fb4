package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided TPC-H-ish parquet fixtures
  * (TESTDATA.md). One function per table; every operator in the engine
  * reads through here so the scan path (parquet, pushdown, pruning) is
  * uniform.
  *
  * At cluster scale these would be external-catalog tables; `dir` stands
  * in for the warehouse location so the same code runs at any SF.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot read
    * natively (PARQUET_TYPE_ILLEGAL). We read nanos as a long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and expose both:
    *   - `ts_us`: epoch microseconds (long) — the canonical event time,
    *     matches DuckDB's `epoch_ns(ts)//1000` exactly;
    *   - `ts`: TIMESTAMP at microsecond precision for time operators
    *     (window(), session_window(), watermarks).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  /** DuckDB-side twin of [[events]]: a CTE normalizing ts to epoch-µs.
    * Prepend to any oracle SQL that touches events. */
  /** CONTRACT: ts_us is NON-NEGATIVE (post-1970 event time). Several
    * bucketing queries pair Spark's truncating `div` with DuckDB's
    * flooring `//` — identical for ts_us >= 0 but one bucket apart for
    * negative values; a corpus with pre-epoch or corrupt timestamps
    * must be floor-normalized at ingest before these oracles apply. */
  val eventsCteSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, value, props,
      |         epoch_ns(ts)//1000 AS ts_us,
      |         make_timestamp(epoch_ns(ts)//1000) AS ts
      |  FROM events
      |)""".stripMargin

  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
