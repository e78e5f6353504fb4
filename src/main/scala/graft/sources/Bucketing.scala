package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout: the co-located-join strategy for repeated
  * large⋈large joins at 100 TB.
  *
  * A shuffle join on fact⋈fact (e.g. lineitem⋈orders on orderkey at
  * ~100 TB) moves BOTH sides across the network every query. Writing
  * each table bucketed by the join key — `bucketBy(n, key)` hash-splits
  * every output file set into n buckets using Spark's Murmur3, the same
  * hash the shuffle would use — lets the planner prove both sides are
  * already co-partitioned and plan a SortMergeJoin with ZERO Exchange
  * nodes: the dominant cost of the join is paid once at write time,
  * then amortized over every subsequent query.
  *
  * Sizing rule: pick n so each bucket ≈ 128–512 MB at the target scale
  * (100 TB / 256 MB ≈ 400k buckets is too many files per write task —
  * in practice bucket count trades off against partitionBy dims, e.g.
  * date-partitioned + 4k buckets ⇒ ~25 GB per date-bucket at 100 TB/d).
  * `sortBy(key)` additionally pre-sorts inside each bucket so the SMJ's
  * per-bucket sort is a no-op on one side.
  *
  * Bucketed tables need a table catalog (bucket metadata lives in the
  * metastore, not in parquet footers), hence saveAsTable rather than a
  * path write.
  */
object Bucketing {

  /** Write df as a bucketed+sorted managed table (replacing any
    * previous version — including one left by a PREVIOUS session: the
    * in-memory catalog forgets tables across JVMs while their files
    * still occupy the warehouse location, and saveAsTable refuses a
    * non-empty location (LOCATION_ALREADY_EXISTS), so the stale
    * directory is removed explicitly). */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, key: String,
                    moreKeys: String*): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    // resolve the managed location through the CATALOG, not by string
    // concatenation: warehouse/<name> is wrong for db-qualified names
    // (warehouse/db.db/name) and non-default current databases — the
    // stale dir would then survive and saveAsTable still fail with
    // LOCATION_ALREADY_EXISTS, the exact error this cleanup prevents
    val ident = s.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Count Exchange (shuffle) operators in df's physical plan — the
    * assertion surface for co-location tests. AdaptiveSparkPlanExec is
    * a LEAF node (a plain foreach never enters it), so under AQE — the
    * bench session's default — the naive count is always 0 and a
    * zero-shuffle assertion passes vacuously even when the join DOES
    * shuffle; recurse into the adaptive wrapper's current inner plan
    * and count materialized shuffle stages too. */
  def exchangeCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    def walk(plan: SparkPlan): Int = {
      var n = 0
      plan.foreach {
        case a: AdaptiveSparkPlanExec => n += walk(a.executedPlan)
        case s: ShuffleQueryStageExec => n += 1
        case node =>
          if (node.getClass.getSimpleName.startsWith("ShuffleExchange")) n += 1
      }
      n
    }
    walk(df.queryExecution.executedPlan)
  }
}
