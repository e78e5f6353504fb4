package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.MvRewrite

/** The materialized-view rewrite rule: a matching corpus aggregate
  * must physically scan the view (cheaper), produce identical results
  * (invisible), and refuse to fire when the corpus drifted from the
  * registered fingerprint or the query shape is not answerable by the
  * view (safe). */
class MvRewriteSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val corpus = "/root/testdata/sf0.001/documents.parquet"

  /** Paths the executed plan's file scans read from (descending into
    * AQE wrappers — a Sort above the rewrite hides the scan inside an
    * AdaptiveSparkPlanExec). */
  private def scanPaths(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec        => q +: nodes(q.plan)
      case other                    => other +: other.children.flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
  }

  private def theQuery(path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

  private def setOf(df: DataFrame) = df.collect().map(_.toSeq).toSet

  private def withView(corpusPath: String)(body: String => Unit): Unit = {
    val viewDir = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    graft.operators.Ivm.viewOf(spark.read.parquet(corpusPath))
      .write.mode("overwrite").parquet(viewDir)
    MvRewrite.register(spark, corpusPath, viewDir, Seq("source", "lang"),
      Map("count" -> "n_docs", "sum:n_chars" -> "sum_chars"))
    try body(viewDir)
    finally {
      MvRewrite.unregister(corpusPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(viewDir))
    }
  }

  test("a matching aggregate scans the VIEW, not the corpus — results identical") {
    val direct = setOf(theQuery(corpus)) // registry empty: the real aggregation
    withView(corpus) { viewDir =>
      val q = theQuery(corpus)
      val paths = scanPaths(q)
      assert(paths.exists(_.contains(viewDir)),
        s"expected a view scan in $paths")
      assert(!paths.exists(_.contains("documents.parquet")),
        s"corpus must not be scanned: $paths")
      assert(setOf(q) == direct, "the rewrite must be result-invisible")
    }
  }

  test("freshness guard: a drifted corpus file set disables the rewrite") {
    // copy the corpus into a scratch dir, register a view against it,
    // then add a file — the listing no longer matches the fingerprint
    val scratch = java.nio.file.Files.createTempDirectory("graft-mv-drift").toString
    spark.read.parquet(corpus).write.mode("overwrite").parquet(scratch)
    withView(scratch) { viewDir =>
      spark.read.parquet(corpus).limit(3)
        .write.mode("append").parquet(scratch)
      val q = theQuery(scratch)
      val paths = scanPaths(q)
      assert(!paths.exists(_.contains(viewDir)),
        s"stale view must not serve a drifted corpus: $paths")
      // and the answer reflects the NEW corpus, not the view
      assert(setOf(q) == setOf(
        spark.read.parquet(scratch).groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))))
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
  }

  test("non-matching shapes are left alone") {
    withView(corpus) { viewDir =>
      // a filter under the aggregate: the view cannot answer it
      val filtered = spark.read.parquet(corpus)
        .where(col("n_chars") > 100)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      assert(!scanPaths(filtered).exists(_.contains(viewDir)))
      // a different grouping
      val otherGroup = spark.read.parquet(corpus)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      assert(!scanPaths(otherGroup).exists(_.contains(viewDir)))
      // an aggregate the view does not carry
      val distinctAgg = spark.read.parquet(corpus)
        .groupBy(col("source"), col("lang"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      assert(!scanPaths(distinctAgg).exists(_.contains(viewDir)))
      // sum over a column the view does not materialize
      val otherSum = spark.read.parquet(corpus)
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("doc_id")).as("s"))
      assert(!scanPaths(otherSum).exists(_.contains(viewDir)))
    }
  }

  test("downstream operators still resolve over the rewritten subtree") {
    // the rewrite preserves output ExprIds: a parent filter + sort over
    // the aggregate must survive and see view-served values
    val direct = setOf(theQuery(corpus).where(col("n_docs") > 1).orderBy(col("source")))
    withView(corpus) { viewDir =>
      val q = theQuery(corpus).where(col("n_docs") > 1).orderBy(col("source"))
      assert(scanPaths(q).exists(_.contains(viewDir)))
      assert(setOf(q) == direct)
    }
  }
}
