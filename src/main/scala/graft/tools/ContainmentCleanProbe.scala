package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** One-off doctrine probe for SCALE.md r15g: measures the standing
  * collapse-first composition (dedup_exact keepers → containmentOver)
  * against the raw operator's recorded cost on a duplication-bearing
  * fixture — the composition every dedup family prescribes for
  * replica-heavy corpora, and the reason the in-operator contraction
  * prototype was rejected (the pipeline gets the same pair-stream
  * shrink from the collapse it runs anyway, without taxing
  * low-duplication corpora). Mirrors [[Dedup.dedupAllpairsClean]]'s
  * keeper rule via the public gate surface. The collapsed answer is
  * DISTINCT-text containment pairs — the question a pipeline asks
  * after exact dedup — so row counts are expected to differ from the
  * lossless raw operator's (which re-expands replica pairs).
  * Usage: ContainmentCleanProbe <fixtureDir>
  */
object ContainmentCleanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val docs = graft.Tables.documents(spark, dir)

    def run(label: String): Unit = {
      val keepers = Dedup.dedupExact(spark, dir)
        .where(col("is_dup") === 0).select(col("doc_id"))
      val cleaned = docs.join(keepers, Seq("doc_id"), "left_semi")
      val t0 = System.nanoTime()
      val rows = Dedup.containmentOver(cleaned).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] collapse-first containment ($label): $wall%.1f s, $rows rows")
      graft.Graft.releaseState(spark)
    }
    run("warmup")
    run("timed")
    spark.stop()
  }
}
