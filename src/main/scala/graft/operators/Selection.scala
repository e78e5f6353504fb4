package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Exact distributed order statistics WITHOUT a global sort — the
  * selection-algorithm counterpart of the approximate quantile sketch
  * ([[graft.functions.QuantileAgg]]) and the reason neither
  * `ORDER BY` nor a corpus-wide `ROW_NUMBER` window ever appears on an
  * exact-percentile path in this engine.
  *
  * Algorithm (classic two-pass counting selection):
  *   1. ONE map-side-combinable histogram over `value div W` buckets.
  *      Driver state is |value range| / W rows — bounded by the DOMAIN
  *      (price range), not the corpus; a cumulative walk locates, for
  *      each target rank r_p = ceil(p·n/100), the bucket holding it and
  *      the count of rows strictly below that bucket.
  *   2. ONE per-distinct-value count over the ≤ |targets| needed
  *      buckets only. The pass-2 filter is an OR of RANGE predicates on
  *      the bare column (`cents >= b·W AND cents < b·W + W`) — NOT a
  *      predicate on `cents div W`, which parquet cannot evaluate
  *      against row-group min/max stats; when the value column is
  *      STORED (the integer-cents layout discipline) the bare-column
  *      ranges prune file scans at 100 TB the same way ZOrder's range
  *      predicates do (SelectionSpec pins the PushedFilters). A
  *      cast-derived column (the q45 gate's shape) still short-circuits
  *      row-by-row inside codegen but cannot row-group-prune — store
  *      cents if pass 2 cost matters. Then a driver walk of
  *      ≤ W·|targets| rows to the residual rank.
  *
  * Two corpus scans, zero shuffled rows beyond the two partial
  * aggregations, no task ever holds more than a histogram slice: this
  * is how an exact p99 over 10^12 prices actually gets computed. The
  * single-task traps it replaces: `ORDER BY` (range exchange + full
  * sort), `ROW_NUMBER() OVER ()` (ONE task for the whole corpus),
  * `percentile()` (collects every value into one aggregation buffer).
  *
  * PERSIST-OR-SCAN CONTRACT: both passes re-evaluate the `values`
  * plan. Callers passing a bare column off a parquet scan get two
  * cheap scans (pass 2 pruned); callers passing an expensive DERIVED
  * frame (an aggregation, a join) must `.persist()` it first or the
  * lineage recomputes — [[graft.operators.Relational.dqSkewReport]] is
  * the in-repo example of the persist side of the contract.
  *
  * Inter-pass consistency is REQUIRED and verified: if pass 2's slice
  * does not reach every target rank located by pass 1 (possible only
  * if the underlying data changed between the scans, or a
  * non-deterministic derived frame was passed unpersisted), the kernel
  * throws rather than emitting a bad row — the same fail-loudly stance
  * as the empty-input `require`.
  *
  * Money goes through the engine-wide DECIMAL(18,2) → integer-cents
  * discipline, so ranks, counts, and the selected values are all exact
  * integers and the whole row hash-checks cross-engine. The DuckDB
  * oracle computes the same ceil-rank order statistic by brute rank
  * walk (fine at oracle SF).
  */
object Selection {

  /** Histogram bucket width in cents (pass-1 driver state =
    * price-range/W rows; pass-2 per-target slice ≤ W distinct values). */
  val BucketW = 4096L

  /** Hard ceiling on rows any kernel collect may bring to the driver
    * (~1M rows ≈ tens of MB — generous for every legitimate
    * low-cardinality grouping, far below OOM). The bound is ENFORCED,
    * not documented: [[collectBounded]] fetches at most MaxDriverRows+1
    * rows (a LIMIT, so an over-bound aggregation can never flood driver
    * memory on the way to its own error) and fails loudly pointing at
    * the sketch path. */
  val MaxDriverRows = 1 << 20

  /** Collect with the driver-state bound enforced. The `limit(max+1)`
    * is load-bearing: the check must not itself materialize the
    * unbounded result it guards against. */
  private def collectBounded(df: DataFrame, what: String): Array[Row] = {
    val rows = df.limit(MaxDriverRows + 1).collect()
    require(rows.length <= MaxDriverRows,
      s"$what exceeds MaxDriverRows=$MaxDriverRows — the grouping is too " +
        "high-cardinality (or the value range too wide) for the exact " +
        "two-pass kernel's driver histogram; use the mergeable sketch " +
        "graft.functions.QuantileAgg for per-key quantiles at this scale, " +
        "or widen `width`")
    rows
  }

  /** Target percentiles (ceil-rank definition: the r-th smallest with
    * r = ⌈p·n/100⌉, 1-indexed — every output is an element of the
    * column, never an interpolation). */
  val Pcts: Seq[Int] = Seq(25, 50, 75, 90, 99)

  /** Exact percentiles of `l_extendedprice` (as cents) by two-pass
    * counting selection. Output: (p, rnk, n, cents). */
  def q45ExactPctile(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.lineitem(s, dir)
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    exactPctileOver(s, cents, Pcts)
  }

  /** The reusable kernel: exact ceil-rank percentiles of a non-negative
    * long column named `cents`. Non-negativity is load-bearing: bucket
    * id uses truncating `div`, which equals floor only for v >= 0 (the
    * eventsCteSql ts_us contract, same argument). */
  def exactPctileOver(s: SparkSession, values: DataFrame, pcts: Seq[Int],
      width: Long = BucketW): DataFrame =
    exactRanksOver(s, values, n => pcts.map(p => (p, (p * n + 99L) / 100L)),
      width, "exactPctileOver")

  /** Generalized-rank sibling of [[exactPctileOver]]: targets given as
    * exact fractions num/den of n (label, num, den) — ceil-rank
    * r = ⌈num·n/den⌉, so e.g. terciles are (1,1,3),(2,2,3), which
    * integer-percentile targets cannot express (⌈33n/100⌉ ≠ ⌈n/3⌉).
    * Same two corpus scans, same output schema (p = the label). */
  def exactFracRanksOver(s: SparkSession, values: DataFrame,
      fracs: Seq[(Int, Long, Long)], width: Long = BucketW): DataFrame = {
    require(fracs.forall { case (_, num, den) => num >= 1 && num <= den },
      "fractional ranks must satisfy 1 <= num <= den (rank 0 has no element)")
    exactRanksOver(s, values,
      n => fracs.map { case (lbl, num, den) => (lbl, (num * n + den - 1) / den) },
      width, "exactFracRanksOver")
  }

  private def exactRanksOver(s: SparkSession, values: DataFrame,
      targetsOf: Long => Seq[(Int, Long)], width: Long,
      what: String): DataFrame = {
    import s.implicits._
    // pass 1: bucket histogram — partial-aggregated map-side, driver
    // receives |range|/W rows
    val hist = collectBounded(values
      .groupBy(expr(s"cents div $width").as("b"))
      .agg(count(lit(1)).as("cnt")), s"$what pass-1 histogram")
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = hist.iterator.map(_._2).sum
    // ceil-rank targets in pure integer math; n >= 1 required (empty
    // input has no order statistics — fail loudly, not with a bad row)
    require(n > 0, s"$what: empty input has no order statistics")
    val targets = targetsOf(n)
    val located = locate(targets, hist)
    val neededBuckets = located.map(_._3).distinct
    // pass 2: per-distinct-value counts inside the needed buckets only.
    // Bare-column range predicates (not `div`-arithmetic) so parquet
    // row-group min/max pruning actually applies at scale.
    val slice = collectBounded(values
      .where(bucketRanges(col("cents"), neededBuckets, width))
      .groupBy(col("cents")).agg(count(lit(1)).as("cnt")),
      s"$what pass-2 slice")
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val byBucket = slice.groupBy(v => v._1 / width)
    val rows = located.map { case (p, rnk, b, below) =>
      (p, rnk, n, walkTo(rnk, below, byBucket, b, width))
    }
    rows.toDF("p", "rnk", "n", "cents").orderBy("p")
  }

  /** Grouped variant of the kernel: exact ceil-rank percentiles of the
    * non-negative long column `cents` WITHIN each group keyed by the
    * given STRING columns. Same two corpus scans as the global kernel —
    * pass 1 is one histogram keyed by (group, bucket), so driver state
    * is |groups| × |range|/W — ENFORCED under [[MaxDriverRows]] by
    * [[collectBounded]] (a high-cardinality grouping fails loudly with
    * a pointer to the sketch [[graft.functions.QuantileAgg]], it can
    * never silently flood the driver); pass 2 is one
    * per-distinct-value count under an OR of (group = g AND range)
    * predicates. Output: keyCols ++ (p, rnk, n, cents), one row per
    * (group, percentile); with `withMinMax` also exact per-group
    * (min_cents, max_cents) at ZERO extra scans — each group's lowest
    * and highest non-empty buckets join the pass-2 needed set and the
    * extremes are read off the same per-distinct-value slice (this is
    * how q23's min/max/count tier rides the kernel's two passes
    * instead of paying a third). Same persist-or-scan contract as
    * [[exactPctileOver]]. */
  def exactPctileByKey(s: SparkSession, values: DataFrame,
      keyCols: Seq[String], pcts: Seq[Int],
      width: Long = BucketW, withMinMax: Boolean = false): DataFrame = {
    val kn = keyCols.length
    val hist = collectBounded(values
      .groupBy((keyCols.map(col) :+ expr(s"cents div $width").as("b")): _*)
      .agg(count(lit(1)).as("cnt")),
      s"exactPctileByKey pass-1 histogram keyed by ${keyCols.mkString(",")}")
      .map(r => (keyCols.indices.map(r.getString).toList,
        r.getLong(kn), r.getLong(kn + 1)))
      .groupBy(_._1)
      .map { case (k, rs) => (k, rs.map(t => (t._2, t._3)).sortBy(_._1)) }
      .toSeq.sortBy(_._1.mkString("\u0000"))
    require(hist.nonEmpty, "exactPctileByKey: empty input has no order statistics")
    // locate every group's target ranks against its own histogram
    val locatedByKey = hist.map { case (k, h) =>
      val n = h.iterator.map(_._2).sum
      val targets = pcts.map(p => (p, (p * n + 99L) / 100L))
      (k, n, locate(targets, h))
    }
    // per-group extreme buckets ride along in pass 2 when min/max are
    // requested — zero extra scans, the slice already carries them
    val extremes: Map[List[String], Seq[Long]] =
      if (!withMinMax) Map.empty
      else hist.map { case (k, h) => k -> Seq(h.head._1, h.last._1) }.toMap
    // pass 2 predicate: OR over groups of (key = g AND needed ranges)
    val pred = locatedByKey.map { case (k, _, loc) =>
      val keyPred = keyCols.zip(k).map { case (c, v) => col(c) === lit(v) }
        .reduce(_ && _)
      keyPred && bucketRanges(col("cents"),
        (loc.map(_._3) ++ extremes.getOrElse(k, Nil)).distinct, width)
    }.reduce(_ || _)
    val slice = collectBounded(values.where(pred)
      .groupBy((keyCols.map(col) :+ col("cents")): _*)
      .agg(count(lit(1)).as("cnt")),
      "exactPctileByKey pass-2 slice")
      .map(r => (keyCols.indices.map(r.getString).toList,
        r.getLong(kn), r.getLong(kn + 1)))
      .groupBy(_._1)
    val rows = locatedByKey.flatMap { case (k, n, loc) =>
      val sorted = slice.getOrElse(k,
        sys.error(s"exactPctileByKey: pass 2 lost group $k — input changed " +
          "between passes (persist-or-scan contract)"))
        .map(t => (t._2, t._3)).sortBy(_._1)
      val byBucket = sorted.groupBy(v => v._1 / width)
      val mm: Seq[Any] =
        if (withMinMax) Seq(sorted.head._1, sorted.last._1) else Nil
      loc.map { case (p, rnk, b, below) =>
        Row.fromSeq(k ++ Seq[Any](p, rnk, n,
          walkTo(rnk, below, byBucket, b, width)) ++ mm)
      }
    }
    val schema = StructType(
      keyCols.map(StructField(_, StringType, nullable = false)) ++ Seq(
        StructField("p", IntegerType, nullable = false),
        StructField("rnk", LongType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("cents", LongType, nullable = false)) ++
      (if (withMinMax) Seq(
        StructField("min_cents", LongType, nullable = false),
        StructField("max_cents", LongType, nullable = false)) else Nil))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  /** Exact ceil-rank percentiles per key at UNBOUNDED key cardinality —
    * the fully distributed sibling of [[exactPctileByKey]] and the
    * closure of its documented limit: NOTHING is collected to the
    * driver, so a grouping by supplier, user, or domain (10⁸ keys at
    * corpus scale) is fine. The price is two extra shuffles instead of
    * two driver walks; the DECISION RULE between the three exact/approx
    * tiers is now complete:
    *   - global or low-cardinality keys → [[exactPctileOver]] /
    *     [[exactPctileByKey]] (driver walk, bounded by
    *     [[MaxDriverRows]])
    *   - high-cardinality keys, exactness required → THIS
    *   - high-cardinality keys, sketch error acceptable →
    *     [[graft.functions.QuantileAgg]] (one pass, mergeable)
    *
    * Same two corpus scans; the locate/walk logic becomes relational:
    *   1. (key, bucket) histogram → per-key running cum (window
    *      partitioned BY KEY over its ≤|range|/W bucket rows — bounded
    *      by the value DOMAIN, never the corpus; the unpartitioned-
    *      window trap does not apply) → broadcast-join the percentile
    *      list → one row per (key, p): target bucket + count below.
    *   2. per-(key, cents) counts inside needed buckets only (semi-join
    *      instead of the driver-built OR predicate) → running cum
    *      within (key, bucket) — ≤ W distinct values per partition —
    *      → first cents reaching the residual rank, via min().
    *
    * Ceil-rank semantics, pure integers, hash-exact cross-engine —
    * identical outputs to [[exactPctileByKey]] on any input both can
    * run (SelectionSpec pins the differential). Output:
    * keyCols ++ (p, rnk, n, cents), one row per (group, percentile). */
  def exactPctileKeyedWide(values: DataFrame, keyCols: Seq[String],
      pcts: Seq[Int], width: Long = BucketW): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = values.sparkSession
    val k = keyCols.map(col)
    val hist = values
      .groupBy((k :+ expr(s"cents div $width").as("b")): _*)
      .agg(count(lit(1)).as("cnt"))
    val perKey = Window.partitionBy(k: _*)
    val byBucket = perKey.orderBy(col("b"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(byBucket))
      .withColumn("n", sum(col("cnt")).over(perKey))
    val ps = s.createDataFrame(pcts.map(Tuple1(_))).toDF("p")
    // one row per (key, p): the bucket whose cum first reaches the
    // target rank, with `below` = rows strictly before that bucket
    val located = cum.join(broadcast(ps))
      .withColumn("rnk", expr(s"(p * n + 99) div 100"))
      .where(col("cum") >= col("rnk") && col("cum") - col("cnt") < col("rnk"))
      .select((k :+ col("p") :+ col("rnk") :+ col("n") :+ col("b") :+
        (col("cum") - col("cnt")).as("below")): _*)
    val needed = located.select((k :+ col("b")): _*).distinct()
    val slice = values
      .withColumn("b", expr(s"cents div $width"))
      .join(needed, keyCols :+ "b", "left_semi")
      .groupBy((k :+ col("b") :+ col("cents")): _*)
      .agg(count(lit(1)).as("vcnt"))
      .withColumn("vcum",
        sum(col("vcnt")).over(Window.partitionBy((k :+ col("b")): _*)
          .orderBy(col("cents"))))
    located.join(slice, keyCols :+ "b")
      .where(col("below") + col("vcum") >= col("rnk"))
      .groupBy((k :+ col("p") :+ col("rnk") :+ col("n")): _*)
      .agg(min(col("cents")).as("cents"))
  }

  /** Driver walk over a (bucket, count) histogram: for each target
    * (p, rank), the bucket holding that rank and the row count strictly
    * below the bucket. Returns (p, rnk, bucket, below). */
  private def locate(targets: Seq[(Int, Long)],
      hist: Seq[(Long, Long)]): Seq[(Int, Long, Long, Long)] = {
    var cum = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    val it = targets.sortBy(_._2).iterator
    var pending = if (it.hasNext) it.next() else null
    for ((b, c) <- hist if pending != null) {
      while (pending != null && pending._2 <= cum + c) {
        out += ((pending._1, pending._2, b, cum))
        pending = if (it.hasNext) it.next() else null
      }
      cum += c
    }
    require(pending == null,
      "exactPctileOver: pass 1 histogram does not cover every target rank")
    out.toSeq
  }

  /** OR of bare-column range predicates covering the given buckets —
    * the parquet-pruneable form of `c div width IN (buckets)`. */
  private def bucketRanges(c: org.apache.spark.sql.Column,
      buckets: Seq[Long], width: Long): org.apache.spark.sql.Column =
    buckets.map(b => c >= lit(b * width) && c < lit(b * width + width))
      .reduce(_ || _)

  /** Walk the pass-2 slice of bucket `b` from `below` to rank `rnk`.
    * Fails loudly if the slice is missing or too short — inter-pass
    * inconsistency, never a silent -1 row. */
  private def walkTo(rnk: Long, below: Long,
      byBucket: Map[Long, Array[(Long, Long)]], b: Long, width: Long): Long = {
    val vals = byBucket.getOrElse(b,
      sys.error(s"exactPctileOver: pass 2 returned no rows for bucket $b — " +
        "input changed between passes (persist-or-scan contract)"))
    var cum = below
    var ans = -1L
    val vit = vals.iterator
    while (ans < 0 && vit.hasNext) {
      val (v, c) = vit.next()
      cum += c
      if (rnk <= cum) ans = v
    }
    require(ans >= 0,
      s"exactPctileOver: bucket $b slice exhausted below rank $rnk — " +
        "input changed between passes (persist-or-scan contract)")
    ans
  }

  /** `q46_pctile_wide` — exact per-SUPPLIER price percentiles through
    * the distributed keyed kernel ([[exactPctileKeyedWide]]): the
    * high-cardinality shape (every supplier is a group; at 100 TB that
    * is millions of keys) that [[exactPctileByKey]]'s driver histogram
    * correctly refuses. Median/p90/p99 per supplier, one row each. */
  def q46PctileWide(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.lineitem(s, dir)
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    exactPctileKeyedWide(cents, Seq("l_suppkey"), Seq(50, 90, 99))
  }

  val q46PctileWideSql: String =
    """WITH c AS (
      |  SELECT l_suppkey,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem),
      |nn AS (SELECT l_suppkey, CAST(COUNT(1) AS BIGINT) AS n FROM c GROUP BY 1),
      |r AS (SELECT l_suppkey, cents,
      |             ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY cents) AS rn
      |      FROM c),
      |t AS (SELECT nn.l_suppkey, p, (p * nn.n + 99) // 100 AS rnk, nn.n AS n
      |      FROM (VALUES (50), (90), (99)) AS v(p) CROSS JOIN nn)
      |SELECT t.l_suppkey, t.p, t.rnk, t.n, r.cents
      |FROM t JOIN r ON r.l_suppkey = t.l_suppkey AND r.rn = t.rnk""".stripMargin

  val q45ExactPctileSql: String =
    s"""WITH c AS (
       |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM lineitem),
       |n AS (SELECT CAST(COUNT(1) AS BIGINT) AS n FROM c),
       |r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c),
       |t AS (
       |  SELECT p, (p * n.n + 99) // 100 AS rnk, n.n AS n
       |  FROM (VALUES ${Pcts.map(p => s"($p)").mkString(", ")}) AS v(p)
       |  CROSS JOIN n)
       |SELECT t.p, t.rnk, t.n, r.cents
       |FROM t JOIN r ON r.rn = t.rnk
       |ORDER BY t.p""".stripMargin
}
