package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Event-time streaming operators (no reference counterpart — the
  * reference is strictly batch with a hard map→reduce barrier, SURVEY.md
  * §2.4). Built on Structured Streaming primitives; every transform is
  * written against a plain DataFrame so the SAME code runs on
  * `readStream` (incremental, stateful) and on a batch frame (the
  * driver's oracle gate runs the batch side; StreamingSpec runs the
  * streaming side and checks they agree).
  */
object EventStreams {

  /** Normalize a raw events frame (ts already µs timestamp + ts_us long,
    * as produced by [[graft.Tables.events]] or the streaming schema). */

  /** Tumbling 1-hour windows per event type: counts + exact value sums. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_us"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows hopping every 15 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("w_start_us"),
              col("event_type"), col("n_events"))

  /** Session windows per user with a 30-minute inactivity gap.
    * Spark semantics: a session's tentative end is last-event-ts + gap
    * and sessions MERGE ON TOUCH — an event exactly gap after the
    * previous one still extends the session (verified empirically:
    * events 30 min apart yield ONE session); a new session starts only
    * when the next event is STRICTLY more than gap away. The oracle's
    * break condition must therefore be `>`, not `>=`. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
              unix_micros(col("session_window.start")).as("session_start_us"),
              unix_micros(col("session_window.end")).as("session_end_us"),
              col("n_events"), col("sum_value"))

  // ------------------------------------------------- custom state ----
  case class UserEvent(user_id: Long, ts_us: Long, event_id: Long,
                       event_type: String, value: Double)
  case class UserStats(user_id: Long, n_events: Long, total_cents: Long,
                       total_value: Double, last_event_type: String)

  /** Per-user lifetime stats via flatMapGroupsWithState — the custom
    * stateful-operator surface (KeyValueGroupedDataset). Money is
    * accumulated in integer cents so results are exact and identical
    * between engines and between batch/streaming execution. */
  def userStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(user, 0L, 0L, 0.0, ""))
          // iterator order is not guaranteed → sort for determinism
          val evs = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            val cents = prev.total_cents + evs.map(e => math.round(e.value * 100)).sum
            val next = UserStats(user, prev.n_events + evs.size, cents,
              cents / 100.0, evs.last.event_type)
            state.update(next)
            Iterator.single(next)
          }
      }
  }

  /** Watermarked stream-stream join: each purchase joined to every
    * signup of the same user in the preceding hour. The event-time
    * range bound is what lets Spark expire join state — without it a
    * stream-stream join buffers forever. Works unchanged on batch
    * frames (watermarks are no-ops there). */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
              col("ts").as("p_ts"), col("ts_us").as("p_us"))
      .withWatermark("p_ts", "1 hour")
    val g = events.where(col("event_type") === "signup")
      .select(col("user_id").as("g_user"), col("ts").as("g_ts"),
              col("ts_us").as("g_us"))
      .withWatermark("g_ts", "2 hours")
    p.join(g,
      col("user_id") === col("g_user") &&
      col("g_ts") <= col("p_ts") &&
      col("g_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_id"), col("user_id"), col("p_us"), col("g_us"))
  }

  /** Watermarked LEFT OUTER stream-stream join: every click, paired
    * with each purchase by the same user within the following 30
    * minutes — or NULLs if none. Outer stream-stream joins are the
    * harder variant: matched rows emit immediately, but a NULL row can
    * only emit once the watermark proves no matching purchase can still
    * arrive (global watermark > click_ts + 30 min), which is exactly
    * the state-eviction bound that keeps the join finite on an
    * unbounded stream. Unchanged on batch frames (the oracle gate runs
    * the batch side; StreamingSpec checks streamed == batch on the
    * watermark-closed region). */
  def clickConversion(events: DataFrame): DataFrame = {
    val c = events.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"),
              col("ts").as("c_ts"), col("ts_us").as("c_us"))
      .withWatermark("c_ts", "1 hour")
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
              col("ts").as("p_ts"), col("ts_us").as("p_us"))
      .withWatermark("p_ts", "2 hours")
    c.join(p,
        col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("c_id"), col("user_id"), col("c_us"), col("p_id"), col("p_us"))
  }

  /** Streaming exact dedup: first-seen (user_id, event_type) pairs.
    * Keys-only projection makes the result set identical to batch
    * DISTINCT regardless of which duplicate arrives first. State is one
    * entry per distinct key — bounded by key cardinality, not stream
    * length; for time-bounded duplicate bursts,
    * `dropDuplicatesWithinWatermark` caps state by the watermark delay
    * instead (exercised in StreamingSpec). */
  def dedupKeys(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type")).dropDuplicates()

  /** Idempotent foreachBatch parquet sink — the exactly-once recipe for
    * non-transactional sinks: each micro-batch overwrites its own
    * `batch_id=<id>` directory, so an epoch replayed after a failure
    * mid-commit lands on the same path instead of appending duplicates.
    * (Checkpointed offsets give at-least-once delivery of batches;
    * (batchId → deterministic path, overwrite) upgrades the sink to
    * exactly-once.) Readers see the sink as one partitioned parquet
    * table. */
  def idempotentParquetSink(out: String)(df: DataFrame, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$out/batch_id=$batchId")

  // ------------------------- batch twins (driver oracle gate) --------

  def qStreamDedup(s: SparkSession, dir: String): DataFrame =
    dedupKeys(Tables.events(s, dir))

  val qStreamDedupSql: String =
    Tables.eventsCteSql +
    """
      |SELECT DISTINCT user_id, event_type FROM ev""".stripMargin


  def qStreamJoin(s: SparkSession, dir: String): DataFrame =
    purchaseAttribution(Tables.events(s, dir))

  val qStreamJoinSql: String =
    Tables.eventsCteSql +
    """
      |SELECT p.event_id AS p_id, p.user_id, p.ts_us AS p_us, g.ts_us AS g_us
      |FROM ev p JOIN ev g
      |  ON p.user_id = g.user_id
      | AND p.event_type = 'purchase' AND g.event_type = 'signup'
      | AND g.ts_us <= p.ts_us AND g.ts_us >= p.ts_us - 3600000000""".stripMargin

  def qStreamLeftJoin(s: SparkSession, dir: String): DataFrame =
    clickConversion(Tables.events(s, dir))

  val qStreamLeftJoinSql: String =
    Tables.eventsCteSql +
    """
      |SELECT c.event_id AS c_id, c.user_id, c.ts_us AS c_us,
      |       p.event_id AS p_id, p.ts_us AS p_us
      |FROM ev c LEFT JOIN ev p
      |  ON c.user_id = p.user_id
      | AND p.event_type = 'purchase'
      | AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + 1800000000
      |WHERE c.event_type = 'click'""".stripMargin

  def qStreamSliding(s: SparkSession, dir: String): DataFrame =
    sliding(Tables.events(s, dir))

  val qStreamSlidingSql: String =
    Tables.eventsCteSql +
    """
      |SELECT ((ts_us // 900000000) - k) * 900000000 AS w_start_us,
      |       event_type, COUNT(1) AS n_events
      |FROM ev, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) t
      |GROUP BY 1, 2""".stripMargin

  def qStreamSession(s: SparkSession, dir: String): DataFrame =
    sessions(Tables.events(s, dir))

  val qStreamSessionSql: String =
    Tables.eventsCteSql +
    """,
      |o AS (SELECT user_id, ts_us, event_id, value,
      |             LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      |      FROM ev),
      |m AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM o),
      |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m)
      |SELECT user_id,
      |       MIN(ts_us) AS session_start_us,
      |       MAX(ts_us) + 1800000000 AS session_end_us,
      |       COUNT(1) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM g GROUP BY user_id, sid""".stripMargin

  def qStreamUserStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
              col("event_type"), col("value")).as[UserEvent]
    userStats(evs).toDF()
  }

  val qStreamUserStatsSql: String =
    Tables.eventsCteSql +
    """,
      |c AS (SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents, ts_us, event_id, event_type
      |      FROM ev),
      |last AS (SELECT user_id, event_type,
      |                ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
      |         FROM c)
      |SELECT c.user_id,
      |       COUNT(1) AS n_events,
      |       CAST(SUM(c.cents) AS BIGINT) AS total_cents,
      |       CAST(SUM(c.cents) AS DOUBLE) / 100.0 AS total_value,
      |       MAX(l.event_type) AS last_event_type
      |FROM c JOIN (SELECT user_id, event_type FROM last WHERE rn = 1) l
      |  ON c.user_id = l.user_id
      |GROUP BY c.user_id""".stripMargin
}
