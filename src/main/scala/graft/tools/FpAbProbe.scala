package graft.tools

import org.apache.spark.sql.SparkSession

/** Fingerprint-normalization A/B: runs every registered gate, then
  * applies BOTH the current [[graft.Bench.normalizePlan]] and a frozen
  * copy of the previous epoch's chain to the same raw executed-plan
  * text, and reports any query where the two normalizations disagree.
  * The tool exists because a normalization edit that changes output on
  * plans the old chain also rewrote BUMPS THE FINGERPRINT EPOCH —
  * invalidating the calm baseline every bench_compare run diffs
  * against — so an intended no-op tightening (the r12 anchored-id
  * rewrite) must be PROVEN a no-op over the whole registry before it
  * ships. Usage: scripts/run.sh graft.tools.FpAbProbe [sfDir]
  */
object FpAbProbe {

  /** The r12 chain, frozen verbatim (anchored id= rewrite, no gid
    * canonicalization) — the epoch the r12/r12b/r12c records hashed
    * under. The r12d edit (sorted-fragment canonicalization of
    * RewriteDistinctAggregates' gid-bearing lines) must differ ONLY on
    * multi-countDistinct gates. */
  private def normalizeR12(raw: String): String =
    raw
      .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+", "Lambda")
      .replaceAll("@[0-9a-fA-F]{6,}", "@x")
      .replaceAll("#\\d+[A-Za-z]*", "#x")
      .replaceAll("(?i)\\[(plan_id|id|stage|subquery)=#?\\d+\\]", "[$1=x]")
      .replaceAll("(file|hdfs|s3a?|mocks3)://?\\S+", "path")
      .replaceAll("/[-A-Za-z0-9_./]*(testdata|tmp|warehouse)[-A-Za-z0-9_./]*", "path")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics()")
      .replaceAll("size=\\d+", "size=x")
      .replaceAll("(Shuffle|Broadcast|TableCache|Result)QueryStage \\d+",
        "$1QueryStage x")
      .replaceAll("\\*\\(\\d+\\)", "*(x)")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-fp-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var diffs = List.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, q) =>
      try {
        val df = q(spark, dir)
        df.count()
        val raw = df.queryExecution.executedPlan.toString
        if (graft.Bench.normalizePlan(raw) != normalizeR12(raw)) {
          diffs ::= n
          println(s"[fp-ab] DIFF $n")
        }
      } catch { case e: Throwable =>
        diffs ::= s"$n(ERR:${e.getClass.getSimpleName})"
        println(s"[fp-ab] ERR  $n ${e.getMessage}")
      }
      graft.Graft.releaseState(spark)
    }
    println(s"[fp-ab] ${diffs.size} differing of ${graft.SparkEntry.queries.size}" +
      (if (diffs.nonEmpty) s": ${diffs.reverse.mkString(", ")}" else " — epoch preserved"))
    spark.stop()
  }
}
