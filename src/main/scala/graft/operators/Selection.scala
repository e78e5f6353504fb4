package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  *      buckets only (a pushdown-friendly `div`-range predicate — at
  *      100 TB with min/max column stats this prunes file scans the
  *      same way ZOrder's range predicates do), then a driver walk of
  *      ≤ W·|targets| rows to the residual rank.
  *
  * Two corpus scans, zero shuffled rows beyond the two partial
  * aggregations, no task ever holds more than a histogram slice: this
  * is how an exact p99 over 10^12 prices actually gets computed. The
  * single-task traps it replaces: `ORDER BY` (range exchange + full
  * sort), `ROW_NUMBER() OVER ()` (ONE task for the whole corpus),
  * `percentile()` (collects every value into one aggregation buffer).
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
      width: Long = BucketW): DataFrame = {
    import s.implicits._
    // pass 1: bucket histogram — partial-aggregated map-side, driver
    // receives |range|/W rows
    val hist = values
      .groupBy(expr(s"cents div $width").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = hist.iterator.map(_._2).sum
    // ceil(p*n/100) in pure integer math; n >= 1 required (empty input
    // has no order statistics — fail loudly, not with a bad row)
    require(n > 0, "exactPctileOver: empty input has no order statistics")
    val targets = pcts.map(p => (p, (p * n + 99L) / 100L))
    // driver walk: for each target rank, the bucket holding it and the
    // row count strictly below that bucket
    val located: Seq[(Int, Long, Long, Long)] = { // (p, rnk, bucket, below)
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
      out.toSeq
    }
    val neededBuckets = located.map(_._3).distinct
    // pass 2: per-distinct-value counts inside the needed buckets only
    // (div-range predicate → min/max stats prune at scale)
    val slice = values
      .where(expr(s"cents div $width").isin(neededBuckets: _*))
      .groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val byBucket = slice.groupBy(v => v._1 / width)
    val rows = located.map { case (p, rnk, b, below) =>
      var cum = below
      var ans = -1L
      val vals = byBucket(b) // sorted ascending by construction
      val vit = vals.iterator
      while (ans < 0 && vit.hasNext) {
        val (v, c) = vit.next()
        cum += c
        if (rnk <= cum) ans = v
      }
      (p, rnk, n, ans)
    }
    rows.toDF("p", "rnk", "n", "cents").orderBy("p")
  }

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
