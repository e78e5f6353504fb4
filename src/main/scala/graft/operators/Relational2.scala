package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Second relational battery: pivot, subquery decorrelation, lateral
  * explode-with-position, map-typed columns, regex functions, ranking
  * window functions, and a bucketed time-range join.
  *
  * Like [[Relational]], none of this exists in the reference engine
  * (SURVEY.md §2.4 — the reference has no multi-input or windowed
  * operators; reference `mr/coordinator.go:337-339` gives each job
  * exactly one input set). Everything here is declarative DataFrame
  * code so Catalyst picks the physical plan; scale notes per query.
  */
object Relational2 {

  private def dec(c: String): Column = col(c).cast("decimal(18,2)")

  // --------------------------------------------------------------- q24
  /** Pivot: order counts per priority × status. Spark's `pivot` with an
    * explicit value list compiles to a single-pass conditional
    * aggregation (no extra shuffle vs a plain groupBy; values are listed
    * so no driver-side distinct pre-pass runs). Output stays 5×3 at any
    * scale — the aggregation is the reduction. */
  def q24Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  val q24PivotSql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders
      |GROUP BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- q25
  /** Correlated scalar subquery, decorrelated: customers with
    * above-nation-average balance. Expressed as a single window pass
    * (one shuffle on c_nationkey) instead of a per-row subquery — the
    * plan Catalyst's decorrelation would aim for, written directly.
    * The comparison is kept in exact DECIMAL arithmetic
    * (bal·n > Σbal avoids division) so it is order-independent and
    * engine-identical. */
  def q25Correlated(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
    Tables.customer(s, dir)
      .withColumn("n_nat", count(lit(1)).over(w))
      .withColumn("sum_nat", sum(dec("c_acctbal")).over(w))
      .where(dec("c_acctbal") * col("n_nat") > col("sum_nat"))
      .select(col("c_custkey"), col("c_name"))
  }

  val q25CorrelatedSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
      |      (SELECT COUNT(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c3
      |       WHERE c3.c_nationkey = c.c_nationkey)""".stripMargin

  // --------------------------------------------------------------- q26
  /** Lateral/positional explode: leading tokens of each document with
    * their 1-based position, aggregated to (token, position) counts.
    * `posexplode` is a Generator — it pipelines inside the scan stage
    * (no shuffle until the final groupBy), so fan-out cost is linear in
    * tokens regardless of document count. */
  def q26PosExplode(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
      .select(col("tok"), (col("pos0") + 1).cast("long").as("pos"))
      .where(col("pos") <= 5)
      .groupBy(col("tok"), col("pos"))
      .agg(count(lit(1)).as("n"))

  val q26PosExplodeSql: String =
    """SELECT tok, pos, COUNT(1) AS n FROM (
      |  SELECT unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS pos
      |  FROM (SELECT string_split(text, ' ') AS toks FROM documents)
      |) WHERE pos <= 5
      |GROUP BY tok, pos""".stripMargin

  // --------------------------------------------------------------- q27
  /** Map-typed columns: build a map from part attributes, extend it
    * with map_concat, look up a key, then explode entries back to rows.
    * The map never leaves the executors and the output is all scalar
    * columns (hashable by any row-compare harness). */
  def q27Maps(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .withColumn("m", map(lit("brand"), col("p_brand"), lit("type"), col("p_type")))
      .withColumn("m2", map_concat(col("m"), map(lit("size"), col("p_size").cast("string"))))
      .select(col("p_partkey"),
        element_at(col("m2"), "brand").as("brand"),
        size(col("m2")).cast("long").as("m_size"),
        explode(col("m2")).as(Seq("attr", "val")))

  val q27MapsSql: String =
    """SELECT p_partkey, p_brand AS brand, CAST(3 AS BIGINT) AS m_size, k AS attr, v AS val
      |FROM (SELECT p_partkey, p_brand, p_brand AS brand, p_type AS type,
      |             CAST(p_size AS VARCHAR) AS size FROM part)
      |UNPIVOT (v FOR k IN (brand, type, size))""".stripMargin

  // --------------------------------------------------------------- q28
  /** Regex battery: extract, replace-all, and match-test — all codegen'd
    * built-ins (no UDFs). Patterns stay in the portable common subset of
    * Java regex and RE2 (character classes, anchors, alternation) so any
    * conforming engine produces identical results. */
  def q28Regex(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)$", 1).as("adj"),
      regexp_extract(col("p_name"), "([a-z]+)$", 1).as("noun"),
      regexp_replace(col("p_type"), "[AEIOU]", "_").as("type_masked"),
      col("p_name").rlike("^(red|blue)").cast("int").as("is_rb"))

  val q28RegexSql: String =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 1) AS adj,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS noun,
      |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_masked,
      |  CAST(regexp_matches(p_name, '^(red|blue)') AS INT) AS is_rb
      |FROM part""".stripMargin

  // --------------------------------------------------------------- q29
  /** Ranking-window battery: ntile / percent_rank / cume_dist /
    * first_value / nth_value per nation, ordered by (acctbal, suppkey)
    * so the order is total and every function is deterministic.
    * percent_rank and cume_dist are exact rationals computed the same
    * way in both engines, so doubles compare bit-identical. */
  def q29WindowBattery(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").asc, col("s_suppkey").asc)
    Tables.supplier(s, dir).select(
      col("s_suppkey"), col("s_nationkey"),
      ntile(4).over(w).cast("long").as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cdist"),
      first(col("s_suppkey")).over(w).as("first_sk"),
      nth_value(col("s_suppkey"), 2).over(w).as("second_sk"))
  }

  val q29WindowBatterySql: String =
    """SELECT s_suppkey, s_nationkey,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cdist,
      |  first_value(s_suppkey) OVER w AS first_sk,
      |  nth_value(s_suppkey, 2) OVER w AS second_sk
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)""".stripMargin

  // --------------------------------------------------------------- q30
  /** Time-range join without an equi key: for every click, count the
    * purchases (any user) in the following 5 minutes.
    *
    * A naive theta-join is a cross product — O(clicks × purchases).
    * The scale pattern used here buckets both sides by
    * ⌊ts / window⌋: a purchase inside (c.ts, c.ts + W] lands in the
    * click's bucket or the next one, so exploding each click into those
    * two buckets turns the theta-join into an equi-join on the bucket id
    * (hash-partitionable, AQE-skew-splittable) followed by the exact
    * range predicate. Candidate pairs per click stay O(events within
    * 2W), independent of total data size. */
  def q30RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val W = 300000000L // 5 minutes in µs
    val ev = Tables.events(s, dir)
    val bkt = expr(s"ts_us div $W") // exact integer division (no double rounding)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("ts_us"),
        explode(array(bkt, bkt + 1)).as("bucket"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts_us").as("p_ts"),
              bkt.as("p_bucket"))
    clicks
      .join(purchases,
        col("bucket") === col("p_bucket") &&
        col("p_ts") > col("ts_us") && col("p_ts") <= col("ts_us") + W,
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("p_id")).as("n_purch"))
  }

  val q30RangeJoinSql: String =
    graft.Tables.eventsCteSql +
    """
      |SELECT c.event_id, COUNT(p.event_id) AS n_purch
      |FROM (SELECT * FROM ev WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
      |  ON p.ts_us > c.ts_us AND p.ts_us <= c.ts_us + 300000000
      |GROUP BY c.event_id""".stripMargin

  // --------------------------------------------------------------- q36
  /** Funnel conversion: per user, first click → earliest purchase
    * strictly after it, with conversion flag and time-to-convert. The
    * conditional "first event after" shape (join on user + time
    * inequality, then min) is the building block of funnel analytics;
    * all values are epoch-µs longs, so the result is exact. Join is a
    * shuffle on user_id; the purchase side is pre-filtered before the
    * join so the inequality never drives a cartesian. */
  def q36Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("first_click"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"))
    clicks
      .join(purch, col("user_id") === col("p_user") &&
        col("p_ts") > col("first_click"), "left")
      .groupBy(col("user_id"), col("first_click"))
      .agg(min(col("p_ts")).as("first_purch"))
      .select(col("user_id"), col("first_click"),
        coalesce(col("first_purch"), lit(-1L)).as("first_purch"),
        col("first_purch").isNotNull.cast("int").as("converted"),
        coalesce(col("first_purch") - col("first_click"), lit(-1L))
          .as("convert_lag_us"))
  }

  val q36FunnelSql: String =
    graft.Tables.eventsCteSql +
    """,
      |clicks AS (
      |  SELECT user_id, MIN(ts_us) AS first_click
      |  FROM ev WHERE event_type = 'click' GROUP BY user_id),
      |conv AS (
      |  SELECT c.user_id, c.first_click, MIN(p.ts_us) AS first_purch
      |  FROM clicks c LEFT JOIN ev p
      |    ON p.user_id = c.user_id AND p.event_type = 'purchase'
      |   AND p.ts_us > c.first_click
      |  GROUP BY c.user_id, c.first_click)
      |SELECT user_id, first_click,
      |       COALESCE(first_purch, -1) AS first_purch,
      |       CAST(first_purch IS NOT NULL AS INT) AS converted,
      |       COALESCE(first_purch - first_click, -1) AS convert_lag_us
      |FROM conv""".stripMargin

  // --------------------------------------------------------------- q37
  /** Cohort retention: users grouped by first-active day, counted per
    * activity-day offset — the classic retention triangle. Day ids are
    * integer division of epoch-µs (exact); distinct (user, day) pairs
    * shrink the input before the cohort join; the final count-distinct
    * groups on (cohort_day, offset). */
  def q37Cohort(s: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val days = graft.Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val q37CohortSql: String =
    graft.Tables.eventsCteSql +
    """,
      |days AS (SELECT DISTINCT user_id, ts_us // 86400000000 AS day FROM ev),
      |cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id)
      |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
      |       COUNT(DISTINCT d.user_id) AS n_users
      |FROM days d JOIN cohort c ON d.user_id = c.user_id
      |GROUP BY c.cohort_day, day_offset""".stripMargin

  // --------------------------------------------------------------- q32
  /** Value-based RANGE frame: 5-minute trailing sum per user ordered by
    * event time (µs longs). RANGE frames differ from ROWS frames (q9)
    * in peer handling — all rows within the value bound join the frame
    * regardless of count — and are the window analog of the q30 range
    * join. Sum in DECIMAL for cross-engine exactness. */
  def q32RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-300000000L, 0L)
    graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
          .as("rolling_5m_value"),
        count(lit(1)).over(w).as("n_5m"))
  }

  val q32RangeFrameSql: String =
    graft.Tables.eventsCteSql +
    """
      |SELECT event_id, user_id, ts_us,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_5m_value,
      |       COUNT(1) OVER w AS n_5m
      |FROM ev
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
      |             RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)""".stripMargin

  // --------------------------------------------------------------- q40
  /** 15-minute bucket width in µs. */
  private val GapBucketUs = 900000000L

  /** Time-series resampling with gap fill: per user, a dense 15-minute
    * grid from first to last observed bucket; empty buckets carry the
    * last observed bucket value forward (LOCF via `last(_, ignoreNulls)`
    * over an unbounded-preceding frame). The grid is generated
    * DISTRIBUTED (`sequence` + explode per user — grid length is
    * time-range/width, independent of event volume) and the fill is one
    * partition-local window after the per-bucket shuffle — the shape
    * that resamples a 100 TB event table without ever densifying raw
    * events. Bucket sums in DECIMAL; LOCF copies (never re-adds)
    * values, so determinism is inherited. */
  def q40GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"(ts_us div $GapBucketUs) * $GapBucketUs").as("b"),
        col("value"))
    val perBucket = ev.groupBy(col("user_id"), col("b"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("bucket_value"))
    val grid = perBucket.groupBy(col("user_id"))
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
      .select(col("user_id"),
        explode(sequence(col("b0"), col("b1"), lit(GapBucketUs))).as("b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(perBucket, Seq("user_id", "b"), "left")
      .select(col("user_id"), col("b").as("bucket_us"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("bucket_value"), ignoreNulls = true).over(w).as("locf_value"))
  }

  val q40GapFillSql: String =
    graft.Tables.eventsCteSql +
    s""",
      |pb AS (
      |  SELECT user_id, (ts_us // $GapBucketUs) * $GapBucketUs AS b,
      |         CAST(COUNT(1) AS BIGINT) AS n_obs,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
      |  FROM ev GROUP BY 1, 2),
      |bounds AS (SELECT user_id, MIN(b) AS b0, MAX(b) AS b1 FROM pb GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(b0, b1, $GapBucketUs)) AS b
      |  FROM bounds)
      |SELECT g.user_id, g.b AS bucket_us,
      |       COALESCE(pb.n_obs, 0) AS n_obs,
      |       last_value(pb.bucket_value IGNORE NULLS)
      |         OVER (PARTITION BY g.user_id ORDER BY g.b
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
      |FROM grid g LEFT JOIN pb ON g.user_id = pb.user_id AND g.b = pb.b""".stripMargin

  // ----------------------------------------------------- q41_unpivot
  /** q41: UNPIVOT — the wide→long reshape inverse of [[q24Pivot]]:
    * lineitem's four measure columns melt to (measure, value) rows via
    * `stack` (a Generate, no shuffle, no UDTF), then re-aggregate per
    * measure. The groupBy has exactly 4 keys, so map-side partial
    * aggregation reduces the shuffle to partitions×4 rows at any scale.
    * DECIMAL sums per the engine convention (double sums are
    * order-dependent across engines); one cast back at the end. */
  def q41Unpivot(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .selectExpr(
        """stack(4,
          |  'quantity',      cast(l_quantity as decimal(18,2)),
          |  'extendedprice', cast(l_extendedprice as decimal(18,2)),
          |  'discount',      cast(l_discount as decimal(18,2)),
          |  'tax',           cast(l_tax as decimal(18,2))) as (measure, value)""".stripMargin)
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).cast("double").as("total"),
        min(col("value")).cast("double").as("mn"),
        max(col("value")).cast("double").as("mx"))

  val q41UnpivotSql: String =
    """WITH m AS (
      |  SELECT 'quantity' AS measure, CAST(l_quantity AS DECIMAL(18,2)) AS value FROM lineitem
      |  UNION ALL SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
      |  UNION ALL SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
      |  UNION ALL SELECT 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem)
      |SELECT measure, COUNT(1) AS n, CAST(SUM(value) AS DOUBLE) AS total,
      |       CAST(MIN(value) AS DOUBLE) AS mn, CAST(MAX(value) AS DOUBLE) AS mx
      |FROM m GROUP BY measure""".stripMargin

  // ---------------------------------------------------- q42_islands
  /** Island gap: events ≤ 30 min apart merge into one activity island. */
  val IslandGapUs = 30L * 60 * 1000000

  /** Gaps-and-islands interval merge: per-user event streams collapse
    * into maximal activity intervals (bursts separated by more than
    * [[IslandGapUs]]) via the classic two-window composition — a lag
    * diff flags island OPENINGS, a running sum of flags numbers the
    * islands, one aggregation emits (start, end, size). This is the
    * BATCH twin of session windows with a declarative plan: both
    * windows share ONE exchange + sort on (user_id, ts_us) (the second
    * window's requirement is satisfied by the first's output
    * partitioning, so no re-shuffle), and the final aggregation
    * partial-aggregates map-side. Equal timestamps are gap 0 — same
    * island whatever their relative order, so the plan needs no
    * tie-break column to be deterministic. */
  def q42Islands(s: SparkSession, dir: String): DataFrame = {
    // event_id tie-break: the island SUMS are tie-order-invariant
    // (exactly one `opens` flag lands per gap, wherever ties sit), but
    // the lag pass and the running-sum pass must SEE the same order —
    // guaranteed inside one Spark plan (shared sort), NOT between the
    // oracle's two window subqueries, so both engines pin a total order
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    graft.Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("opens",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) <= IslandGapUs, 0)
          .otherwise(1)) // first row per user: lag is null → opens 1
      .withColumn("island",
        sum(col("opens")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("ts_us")).as("island_start_us"),
        max(col("ts_us")).as("island_end_us"),
        count(lit(1)).as("n_events"))
  }

  val q42IslandsSql: String =
    Tables.eventsCteSql +
    s""",
       |flagged AS (
       |  SELECT user_id, ts_us, event_id,
       |         CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
       |                   <= $IslandGapUs THEN 0 ELSE 1 END AS opens
       |  FROM ev),
       |numbered AS (
       |  SELECT user_id, ts_us,
       |         CAST(SUM(opens) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
       |  FROM flagged)
       |SELECT user_id, island, MIN(ts_us) AS island_start_us,
       |       MAX(ts_us) AS island_end_us, COUNT(1) AS n_events
       |FROM numbered GROUP BY user_id, island""".stripMargin

  // ------------------------------------------------- events_anomaly
  /** Tukey-fence outlier detection over the event stream — the DQ
    * primitive behind "which readings are broken": per event type,
    * exact quartiles of `value` give fences q1 − 1.5·IQR / q3 +
    * 1.5·IQR, and every event OUTSIDE its type's fences is emitted
    * with the bounds that convicted it. All arithmetic after the
    * quartile selection is a fixed IEEE expression of matched inputs
    * (the q23 discipline), so the verdict table hash-checks too.
    *
    * Scale: the fence table is |event types| rows, computed once and
    * shipped as per-row LITERALS — per-row comparison, zero additional
    * shuffle. Since r10 the quartiles are exact ceil-rank order
    * statistics from the counting-selection kernel (value → integer
    * micros, non-negative — the kernel's precondition) rather than
    * `percentile()`, whose per-type buffers are corpus-shaped at
    * 100 TB; fence arithmetic runs in IEEE doubles from the exact
    * micro values, the IDENTICAL expression on both engines. */
  def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val vals = ev.selectExpr("event_type AS k",
      "CAST(CAST(value AS DECIMAL(20,6)) * 1000000 AS BIGINT) AS cents")
    val pct = graft.operators.Selection
      .exactPctileByKey(s, vals, Seq("k"), Seq(25, 75))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(4))).toMap
    val fences = pct.keys.map(_._1).toSeq.distinct.sorted.map { t =>
      val q1 = pct((t, 25)).toDouble / 1000000.0
      val q3 = pct((t, 75)).toDouble / 1000000.0
      (t, q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
    }.toDF("event_type", "lo", "hi")
    ev.join(broadcast(fences), "event_type")
      .where(col("value") < col("lo") || col("value") > col("hi"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("lo"), col("hi"))
  }

  val eventsAnomalySql: String =
    Tables.eventsCteSql +
    """,
      |c AS (
      |  SELECT event_type,
      |         CAST(CAST(value AS DECIMAL(20,6)) * 1000000 AS BIGINT) AS cents
      |  FROM ev),
      |r AS (
      |  SELECT event_type, cents,
      |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
      |         CAST(COUNT(1) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM c),
      |f AS (
      |  SELECT q1t.event_type,
      |         CAST(q1t.cents AS DOUBLE) / 1000000.0 AS q1,
      |         CAST(q3t.cents AS DOUBLE) / 1000000.0 AS q3
      |  FROM (SELECT event_type, cents FROM r WHERE rn = (25 * n + 99) // 100) q1t
      |  JOIN (SELECT event_type, cents FROM r WHERE rn = (75 * n + 99) // 100) q3t
      |    USING (event_type)),
      |b AS (SELECT event_type,
      |             q1 - (q3 - q1) * 1.5 AS lo,
      |             q3 + (q3 - q1) * 1.5 AS hi
      |      FROM f)
      |SELECT e.event_id, e.event_type, e.value, b.lo, b.hi
      |FROM ev e JOIN b USING (event_type)
      |WHERE e.value < b.lo OR e.value > b.hi""".stripMargin

  // ----------------------------------------------------- events_dau
  /** µs per UTC day ([[Tables.eventsCteSql]]'s non-negative ts_us
    * contract makes truncating and flooring division agree). */
  val DayUs = 86400000000L

  /** Daily activity / growth curve: per day, event volume, DAU
    * (distinct users), NEW users, and CUMULATIVE distinct users since
    * the start. The cumulative-distinct column is the one that breaks
    * naive plans at 100 TB — a running set union over days is either a
    * re-scan per day (quadratic) or a giant distinct state. The
    * FIRST-SEEN trick makes it linear: cum_users(d) = Σ_{d'≤d}
    * new_users(d'), and new_users is just a per-user MIN(day) —
    * one map-side-combinable user-keyed aggregation — re-aggregated
    * by day. The only window runs over the \|days\|-row curve itself.
    * The per-day DAU count_distinct is the [[Profiling.dqProfile]]
    * Expand trade (HLL-swappable). */
  def eventsDau(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
    val perDay = ev.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("dau"))
    val newUsers = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    perDay.join(newUsers, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users",
        sum(col("new_users")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("day")).rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("day"), col("n_events"), col("dau"),
        col("new_users"), col("cum_users"))
  }

  val eventsDauSql: String =
    Tables.eventsCteSql +
    s""",
       |d AS (SELECT user_id, ts_us // $DayUs AS day FROM ev),
       |per_day AS (
       |  SELECT day, CAST(COUNT(1) AS BIGINT) AS n_events,
       |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
       |  FROM d GROUP BY 1),
       |fs AS (SELECT user_id, MIN(day) AS day FROM d GROUP BY 1),
       |nu AS (SELECT day, CAST(COUNT(1) AS BIGINT) AS new_users FROM fs GROUP BY 1)
       |SELECT p.day, p.n_events, p.dau,
       |       COALESCE(n.new_users, 0) AS new_users,
       |       CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY p.day
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
       |FROM per_day p LEFT JOIN nu n ON p.day = n.day""".stripMargin

  // ----------------------------------------------------- events_ewma
  /** Fixed-point scale for the smoothing state (2^20). */
  val EwmaK = 1048576L

  /** Integer EWMA over the per-type daily volume curve — the
    * time-series smoothing primitive (α = 1/4), in EXACT integer
    * arithmetic: s_1 = x_1·2^20, s_t = (3·s_{t−1} + x_t·2^20) div 4.
    * Every term is non-negative, so truncating and flooring division
    * agree and the STATE ITSELF hash-checks cross-engine — where an
    * IEEE α-blend never would. Emitted per (event_type, day): the
    * volume, the smoothed state, and \|x·2^20 − s\| (the deviation a
    * monitor thresholds).
    *
    * Scale shape: the corpus-sized work is ONE map-side-combinable
    * (type, day) count; the sequential fold runs on the collected
    * \|types\|·\|days\| curve — bounded driver state, the
    * `ta_quantile_eval` discipline (a curve is small at ANY corpus
    * size; it's the event COUNT that's 100 TB, not the day count).
    * The oracle replays the fold as a recursive CTE. */
  def eventsEwma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .select(col("event_type"), expr(s"ts_us div $DayUs").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
    val curve = daily.collect() // |types| x |days| rows — bounded
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val out = curve.toSeq.flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      var sState = 0L
      sorted.zipWithIndex.map { case ((_, day, n), i) =>
        sState = if (i == 0) n * EwmaK else (3 * sState + n * EwmaK) / 4
        (et, day, n, sState, math.abs(n * EwmaK - sState))
      }
    }
    out.toDF("event_type", "day", "n", "ewma_scaled", "dev_scaled")
  }

  val eventsEwmaSql: String = {
    // WITH RECURSIVE must open the statement; inline the events CTE
    // body after it (eventsCteSql's own WITH can't nest second)
    val evBody = Tables.eventsCteSql.stripPrefix("WITH ")
    s"""WITH RECURSIVE $evBody,
       |daily AS (
       |  SELECT event_type, ts_us // $DayUs AS day, CAST(COUNT(1) AS BIGINT) AS n
       |  FROM ev GROUP BY 1, 2),
       |idx AS (
       |  SELECT event_type, day, n,
       |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
       |  FROM daily),
       |fold(event_type, i, day, n, s) AS (
       |  SELECT event_type, i, day, n, n * $EwmaK
       |  FROM idx WHERE i = 1
       |  UNION ALL
       |  SELECT x.event_type, x.i, x.day, x.n, (3 * f.s + x.n * $EwmaK) // 4
       |  FROM fold f JOIN idx x ON x.event_type = f.event_type AND x.i = f.i + 1)
       |SELECT event_type, day, n, s AS ewma_scaled,
       |       ABS(n * $EwmaK - s) AS dev_scaled
       |FROM fold""".stripMargin
  }

  // ----------------------------------------------------- events_rfm
  /** RFM segmentation (recency / frequency / monetary — the classic
    * behavioral cohorting): per user, days since last event, event
    * count, and value mass, each scored 1–5 against the population's
    * quintile fences, segment = the 3-digit RFM code. There is NO
    * corpus-wide ntile window (the textbook formulation — one task for
    * all users), and since r10 no `percentile()` aggregate either: the
    * per-user census is corpus-shaped (hundreds of millions of users
    * at 100 TB), and percentile() would collect all of it into ONE
    * aggregation buffer. The 12 fences are exact ceil-rank order
    * statistics from the two-pass counting-selection kernel
    * ([[graft.operators.Selection.exactPctileByKey]]) over the THREE
    * metrics stacked into one grouped histogram pass (all metrics are
    * non-negative longs — the kernel's precondition; value ≥ 0 in the
    * events schema). Scores are per-row CASEs against the 12 fence
    * LITERALS — not even a broadcast join remains. Monetary sums
    * DECIMAL (IEEE double summation is order-dependent and would never
    * hash-check) and ships as integer cents; recency inverts (recent =
    * 5). perUser persists across the kernel's two passes + the scoring
    * pass (the persist-or-scan contract). */
  def eventsRfm(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val nowUs = ev.agg(max(col("ts_us")).as("now_us"))
    val perUser = ev.groupBy(col("user_id"))
      .agg(max(col("ts_us")).as("last_us"),
        count(lit(1)).as("f"),
        sum(col("value").cast("decimal(20,6)")).as("mdec"))
      .crossJoin(broadcast(nowUs))
      .select(col("user_id"),
        expr(s"(now_us - last_us) div $DayUs").as("r_days"),
        col("f"),
        (col("mdec") * lit(100)).cast("long").as("m_cents"))
      .persist()
    try {
      val stacked = perUser.selectExpr(
        "stack(3, 'r', r_days, 'f', f, 'm', m_cents) AS (m, cents)")
      val fence = graft.operators.Selection
        .exactPctileByKey(s, stacked, Seq("m"), Seq(20, 40, 60, 80))
        .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(4))).toMap
      def score(v: String, met: String) =
        when(col(v) <= lit(fence((met, 20))), 1)
          .when(col(v) <= lit(fence((met, 40))), 2)
          .when(col(v) <= lit(fence((met, 60))), 3)
          .when(col(v) <= lit(fence((met, 80))), 4)
          .otherwise(5)
      perUser
        .select(col("user_id"), col("r_days"), col("f"), col("m_cents"),
          // recency inverts: fewer days since last event = higher score
          (lit(6) - score("r_days", "r")).as("r_score"),
          score("f", "f").as("f_score"),
          score("m_cents", "m").as("m_score"))
        .withColumn("segment",
          col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        // sever lineage from the persisted census before unpersist
        .localCheckpoint()
    } finally perUser.unpersist()
  }

  val eventsRfmSql: String =
    Tables.eventsCteSql +
    s""",
       |now_us AS (SELECT MAX(ts_us) AS now_us FROM ev),
       |pu AS (
       |  SELECT user_id,
       |         (SELECT now_us FROM now_us) - MAX(ts_us) AS gap_us,
       |         CAST(COUNT(1) AS BIGINT) AS f,
       |         CAST(SUM(CAST(value AS DECIMAL(20,6))) * 100 AS BIGINT) AS m_cents
       |  FROM ev GROUP BY 1),
       |u AS (SELECT user_id, gap_us // $DayUs AS r_days, f, m_cents FROM pu),
       |nu AS (SELECT CAST(COUNT(1) AS BIGINT) AS n FROM u),
       |rr AS (SELECT r_days AS v, ROW_NUMBER() OVER (ORDER BY r_days) AS rn FROM u),
       |rf AS (SELECT f AS v, ROW_NUMBER() OVER (ORDER BY f) AS rn FROM u),
       |rm AS (SELECT m_cents AS v, ROW_NUMBER() OVER (ORDER BY m_cents) AS rn FROM u),
       |fn AS (
       |  SELECT (SELECT v FROM rr WHERE rn = (20 * nu.n + 99) // 100) AS r20,
       |         (SELECT v FROM rr WHERE rn = (40 * nu.n + 99) // 100) AS r40,
       |         (SELECT v FROM rr WHERE rn = (60 * nu.n + 99) // 100) AS r60,
       |         (SELECT v FROM rr WHERE rn = (80 * nu.n + 99) // 100) AS r80,
       |         (SELECT v FROM rf WHERE rn = (20 * nu.n + 99) // 100) AS f20,
       |         (SELECT v FROM rf WHERE rn = (40 * nu.n + 99) // 100) AS f40,
       |         (SELECT v FROM rf WHERE rn = (60 * nu.n + 99) // 100) AS f60,
       |         (SELECT v FROM rf WHERE rn = (80 * nu.n + 99) // 100) AS f80,
       |         (SELECT v FROM rm WHERE rn = (20 * nu.n + 99) // 100) AS m20,
       |         (SELECT v FROM rm WHERE rn = (40 * nu.n + 99) // 100) AS m40,
       |         (SELECT v FROM rm WHERE rn = (60 * nu.n + 99) // 100) AS m60,
       |         (SELECT v FROM rm WHERE rn = (80 * nu.n + 99) // 100) AS m80
       |  FROM nu),
       |sc AS (
       |  SELECT u.user_id, u.r_days, u.f, u.m_cents,
       |         6 - (CASE WHEN u.r_days <= fn.r20 THEN 1 WHEN u.r_days <= fn.r40 THEN 2
       |                   WHEN u.r_days <= fn.r60 THEN 3 WHEN u.r_days <= fn.r80 THEN 4
       |                   ELSE 5 END) AS r_score,
       |         CASE WHEN u.f <= fn.f20 THEN 1 WHEN u.f <= fn.f40 THEN 2
       |              WHEN u.f <= fn.f60 THEN 3 WHEN u.f <= fn.f80 THEN 4
       |              ELSE 5 END AS f_score,
       |         CASE WHEN u.m_cents <= fn.m20 THEN 1 WHEN u.m_cents <= fn.m40 THEN 2
       |              WHEN u.m_cents <= fn.m60 THEN 3 WHEN u.m_cents <= fn.m80 THEN 4
       |              ELSE 5 END AS m_score
       |  FROM u CROSS JOIN fn)
       |SELECT user_id, r_days, f, m_cents,
       |       CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       |       CAST(m_score AS INT) AS m_score,
       |       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
       |FROM sc""".stripMargin

  // ---------------------------------------------- events_transitions
  /** Per-user event-flow Markov table — the behavioral bigram LM: for
    * every (from, to) pair of CONSECUTIVE event types within a user's
    * timeline, the transition count and conditional probability
    * P(to | from) = c(from,to) / c(from,·). The lens funnels can't
    * give: funnels test ONE hypothesized path, the transition matrix
    * surfaces the paths users actually take (and `error` loops).
    *
    * One user-keyed lag window (user-bounded partitions — the window
    * carve-out) + two partial-aggregated counts; the probability is a
    * single integer division per output row ([[eventsAttribution]]'s
    * IEEE discipline). */
  def eventsTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    // out-degree via a window over the AGGREGATED pair table (at most
    // |types|² rows — the tiny-table case where a window is free) so
    // the token-scale lag subtree is evaluated ONCE, not re-computed
    // for a separate out-degree branch (PlanSpec pins one user_id
    // exchange)
    pairs
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
  }

  val eventsTransitionsSql: String =
    Tables.eventsCteSql +
    """,
      |seq AS (
      |  SELECT event_type,
      |         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_type
      |  FROM ev),
      |pairs AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |         CAST(COUNT(1) AS BIGINT) AS n
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |od AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM pairs GROUP BY 1)
      |SELECT p.from_type, p.to_type, p.n, od.n_from,
      |       CAST(p.n AS DOUBLE) / CAST(od.n_from AS DOUBLE) AS p
      |FROM pairs p JOIN od USING (from_type)""".stripMargin

  // ---------------------------------------------- events_attribution
  /** Attribution lookback window (µs): 24 h — wide enough that the
    * fixture exercises 1-, 2-, and ≥3-touch splits (an hour-wide
    * window never produced a multi-touch purchase at gate SF, leaving
    * the division path untested). */
  val AttribWindowUs: Long = 24L * 3600L * 1000000L

  /** Linear multi-touch attribution — each purchase's value split
    * equally across the user's clicks inside the lookback window
    * (strictly before the purchase); purchases with no touch attribute
    * to the `click_id = -1` direct row at full value. Complements
    * [[graft.operators.Relational.q18AsOf]] (single last-touch recall):
    * linear attribution needs the full touch SET per conversion, so the
    * shape is a user-keyed interval join, not a running window.
    *
    * The per-user purchase×click pairing is banded by the lookback
    * interval via the join predicate; at 100 TB the same time-bucket
    * banding as the salted as-of applies (join on (user, bucket) with
    * bucket width = window, each click lands in 2 buckets) — the
    * fixture-scale plan keeps the plain user-key equi-join + range
    * filter that AQE can skew-split. `credit` is value/n — ONE IEEE
    * division of an exact parquet double by an exact integer, the
    * [[graft.operators.Dedup]] jaccard discipline, so it
    * hash-checks. */
  def eventsAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("purchase_us"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_us").as("click_us"))
    val touched = purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("click_us") < col("purchase_us") &&
        col("click_us") >= col("purchase_us") - AttribWindowUs)
      .select(col("purchase_id"), col("click_id"), col("click_us"))
    val counts = touched.groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_touches"))
    purchases
      .join(touched.join(counts, "purchase_id"), Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        when(col("n_touches").isNull, col("value"))
          .otherwise(col("value") / col("n_touches").cast("double")).as("credit"))
  }

  val eventsAttributionSql: String =
    Tables.eventsCteSql +
    s""",
       |p AS (SELECT event_id AS purchase_id, user_id, ts_us AS purchase_us, value
       |      FROM ev WHERE event_type = 'purchase'),
       |c AS (SELECT event_id AS click_id, user_id, ts_us AS click_us
       |      FROM ev WHERE event_type = 'click'),
       |t AS (SELECT p.purchase_id, c.click_id
       |      FROM p JOIN c ON p.user_id = c.user_id
       |       AND c.click_us < p.purchase_us
       |       AND c.click_us >= p.purchase_us - $AttribWindowUs),
       |n AS (SELECT purchase_id, CAST(COUNT(1) AS BIGINT) AS n_touches
       |      FROM t GROUP BY 1)
       |SELECT p.purchase_id, p.user_id, p.purchase_us,
       |       COALESCE(t.click_id, -1) AS click_id,
       |       COALESCE(n.n_touches, 0) AS n_touches,
       |       CASE WHEN n.n_touches IS NULL THEN p.value
       |            ELSE p.value / CAST(n.n_touches AS DOUBLE) END AS credit
       |FROM p
       |LEFT JOIN t ON p.purchase_id = t.purchase_id
       |LEFT JOIN n ON p.purchase_id = n.purchase_id""".stripMargin

  // -------------------------------------------------- events_paths
  /** Entry-path mining — the top-of-funnel table `events_transitions`'
    * bigram view cannot give: each user's FIRST [[PathK]] event types
    * in time order, concatenated to a path key, counted across users.
    * Path cardinality is bounded by |event_types|^K (the reason K is
    * small and fixed), so the aggregation output is tiny however large
    * the corpus. The per-user window is user-bounded (the window
    * carve-out); the rank prefilter drops everything beyond rank K
    * BEFORE the path aggregation. Ordering inside the path uses the
    * deterministic (ts_us, event_id) tie-break shared with
    * transitions/funnel. */
  private val PathK = 3

  def eventsPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= PathK)
      .groupBy(col("user_id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"),
        count(lit(1)).as("len"))
      .groupBy(col("path"), col("len"))
      .agg(count(lit(1)).as("n_users"))
  }

  val eventsPathsSql: String =
    Tables.eventsCteSql +
    s""",
       |r AS (
       |  SELECT user_id, event_type,
       |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
       |  FROM ev),
       |paths AS (
       |  SELECT user_id,
       |         string_agg(event_type, '>' ORDER BY rn) AS path,
       |         CAST(COUNT(1) AS BIGINT) AS len
       |  FROM r WHERE rn <= $PathK GROUP BY user_id)
       |SELECT path, len, CAST(COUNT(1) AS BIGINT) AS n_users
       |FROM paths GROUP BY path, len""".stripMargin
}
