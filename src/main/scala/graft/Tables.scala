package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The fixture encoding of `events.ts` has drifted across driver
    * regenerations, so this loader is schema-ADAPTIVE: it branches on the
    * dtype Spark actually loaded and normalizes every encoding to the
    * same shape —
    *   - `ts_us`: epoch microseconds (long) — the canonical event time,
    *     matches DuckDB's `epoch_ns(ts)//1000` exactly;
    *   - `ts`: TIMESTAMP at microsecond precision for time operators
    *     (window(), session_window(), watermarks).
    * Encodings seen so far:
    *   (a) INT64 TIMESTAMP(NANOS) — Spark cannot read it natively
    *       (PARQUET_TYPE_ILLEGAL); `nanosAsLong` reads the raw nanos as
    *       a long (the conf is a no-op for every other encoding);
    *   (b) plain TIMESTAMP-µs without a zone → TIMESTAMP_NTZ. The stored
    *       micros ARE the event time; under the engine-wide UTC session
    *       contract (every entry point sets spark.sql.session.timeZone=UTC)
    *       the cast to TIMESTAMP is an exact micros identity.
    * Any other dtype fails loudly here — ONE error naming the drift, not
    * nineteen AnalysisExceptions downstream (see FixtureSchemaSpec).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, dir, "events"))
  }

  /** The encoding branch of [[events]], reusable for any events-shaped
    * frame whose `ts` carries one of the known fixture encodings (the
    * streaming specs read the same fixture through `readStream` and need
    * the identical normalization). */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    val withUs = raw.schema("ts").dataType match {
      case LongType => // (a) nanos-as-long → truncate to µs
        raw.withColumn("ts_us", expr("ts div 1000"))
      case TimestampNTZType => // (b) regenerated fixture
        raw.withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
      case _: TimestampType => // (b) with NTZ inference disabled
        raw.withColumn("ts_us", unix_micros(col("ts")))
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unsupported dtype $other — the fixture " +
            "encoding drifted again; teach Tables.normalizeEventsTs (and " +
            "the DuckDB twin eventsCteSql) the new encoding")
    }
    withUs.withColumn("ts", timestamp_micros(col("ts_us")))
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
