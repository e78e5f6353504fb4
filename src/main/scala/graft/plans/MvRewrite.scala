package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference,
  Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** MATERIALIZED-VIEW QUERY REWRITE — the optimizer half of the IVM
  * story ([[graft.operators.Ivm]] keeps the view fresh; this rule makes
  * queries USE it): a logical `Aggregate` over a registered corpus that
  * matches the view's definition is rewritten to scan the maintained
  * view table instead — a 100-TB GROUP BY becomes a read of a few
  * thousand pre-aggregated rows, without the query author knowing the
  * view exists. This is the Calcite/warehouse "MV rewrite" feature at
  * the correct Spark altitude: a `Rule[LogicalPlan]` that swaps plan
  * subtrees, leaving all execution to the planner.
  *
  * Safety argument — the rewrite fires ONLY when all of:
  *   - the aggregate's child scans exactly the registered corpus
  *     (possibly under a column-pruning Project of plain attributes —
  *     anything else, e.g. a Filter, means the view does not answer
  *     the query);
  *   - the scan's CURRENT file set equals the file set recorded at
  *     registration — the FRESHNESS GUARD: a corpus that gained or
  *     lost files since the view was built silently disables the
  *     rewrite instead of serving stale aggregates (real systems key
  *     this on a snapshot version; over raw parquet the file listing
  *     IS the version);
  *   - grouping expressions are exactly the view's group columns, and
  *     every output is a group column, `count(literal)`, or
  *     `sum(registered column)` — no DISTINCT, no FILTER clauses —
  *     with output types matching the view's column types exactly.
  * The replacement preserves every output ExprId (aliases onto a fresh
  * view-relation instance), so parents of the Aggregate are untouched.
  * Anything not understood leaves the plan alone — the rule can make a
  * query cheaper, never different.
  */
object MvRewrite {

  private[plans] case class Registration(
    corpusFiles: Set[String],
    groupCols: Seq[String],
    // semantic agg key ("count" | "sum:<col>") → view column name
    aggMap: Map[String, String],
    viewRel: LogicalRelation)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]()

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  /** Register `viewDir` as the materialization of
    * `corpusDir GROUP BY groupCols` with the aggregates in `aggMap`.
    * Records the corpus file listing as the freshness fingerprint. */
  def register(spark: SparkSession, corpusDir: String, viewDir: String,
      groupCols: Seq[String], aggMap: Map[String, String]): Unit = {
    val corpusFiles = spark.read.parquet(corpusDir).inputFiles.map(norm).toSet
    val viewRel = spark.read.parquet(viewDir).queryExecution.analyzed match {
      case r: LogicalRelation => r
      case other => sys.error(s"expected a bare parquet relation for the view, got $other")
    }
    registry.put(norm(corpusDir), Registration(corpusFiles, groupCols, aggMap, viewRel))
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[MvRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new MvRewriteRule(spark)
  }

  def unregister(corpusDir: String): Unit = registry.remove(norm(corpusDir))

  private[plans] def registrationFor(rootPaths: Seq[org.apache.hadoop.fs.Path])
      : Option[Registration] =
    rootPaths.flatMap(p => Option(registry.get(norm(p.toString)))).headOption

  // --------------------------------------------------------- mv_rewrite
  /** Gate: materialize the per-(source, lang) view of the documents
    * corpus, register it, and run the PLAIN corpus aggregation — the
    * rule swaps in the view scan (MvRewriteSpec pins that the executed
    * plan reads the view files, not the corpus, and that a stale
    * fingerprint disables the swap). The oracle aggregates the corpus
    * directly: the rewrite must be result-invisible. */
  def mvRewrite(s: SparkSession, dir: String): DataFrame = {
    val corpus = s"$dir/documents.parquet"
    val viewDir = java.nio.file.Files.createTempDirectory("graft-mv-gate").toString
    graft.operators.Ivm.viewOf(s.read.parquet(corpus))
      .write.mode("overwrite").parquet(viewDir)
    register(s, corpus, viewDir, Seq("source", "lang"),
      Map("count" -> "n_docs", "sum:n_chars" -> "sum_chars"))
    try {
      val q = s.read.parquet(corpus)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      // bounded view-sized output: materialize so the scratch view and
      // registration can be reclaimed before returning
      val rows = q.collect()
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1), q.schema)
    } finally {
      unregister(corpus)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(viewDir))
    }
  }

  val mvRewriteSql: String =
    """SELECT source, lang, CAST(COUNT(1) AS BIGINT) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY source, lang""".stripMargin
}

/** The rule: `Aggregate(groups, aggs, [Project of attrs over] scan of
  * a registered fresh corpus)` → `Project(aliases, view scan)` with
  * every output ExprId preserved. */
class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The corpus relation under the aggregate, seen through at most one
    * column-pruning Project of bare attributes. */
  private def scanOf(plan: LogicalPlan): Option[LogicalRelation] = plan match {
    case r: LogicalRelation => Some(r)
    case Project(projList, r: LogicalRelation)
        if projList.forall(_.isInstanceOf[AttributeReference]) => Some(r)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _) =>
      (for {
        rel <- scanOf(child)
        fs <- rel.relation match {
          case h: HadoopFsRelation => Some(h)
          case _                   => None
        }
        reg <- MvRewrite.registrationFor(fs.location.rootPaths)
        // freshness: the scan's current files must be exactly the set
        // the view was built from
        if fs.location.inputFiles.map(f =>
          new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet == reg.corpusFiles
        // grouping must be exactly the view's group columns, as bare
        // attributes
        groupNames = groupingExprs.map {
          case a: AttributeReference => a.name
          case _                     => ""
        }
        if groupNames.sorted == reg.groupCols.sorted && !groupNames.contains("")
        // fresh relation instance per rewrite site (unique ExprIds)
        viewRel = reg.viewRel.newInstance()
        viewAttr = viewRel.output.map(a => a.name -> a).toMap
        rewritten <- {
          def mapped(ne: NamedExpression): Option[NamedExpression] = {
            def viewSide(vCol: String, like: NamedExpression): Option[NamedExpression] =
              viewAttr.get(vCol).filter(_.dataType == like.dataType)
                .map(va => Alias(va, like.name)(exprId = like.exprId))
            def aggKey(e: Expression): Option[String] = e match {
              case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
                ae.aggregateFunction match {
                  case c: Count => c.children match {
                    case Seq(Literal(v, _)) if v != null => Some("count")
                    case _                               => None
                  }
                  case s: Sum => s.child match {
                    case ar: AttributeReference => Some(s"sum:${ar.name}")
                    case _                      => None
                  }
                  case _ => None
                }
              case _ => None
            }
            ne match {
              case a: AttributeReference if reg.groupCols.contains(a.name) =>
                viewSide(a.name, a)
              case al @ Alias(a: AttributeReference, _)
                  if reg.groupCols.contains(a.name) =>
                viewSide(a.name, al)
              case al @ Alias(e, _) =>
                aggKey(e).flatMap(reg.aggMap.get).flatMap(viewSide(_, al))
              case _ => None
            }
          }
          val outs = aggExprs.map(mapped)
          if (outs.forall(_.isDefined)) Some(Project(outs.flatten, viewRel))
          else None
        }
      } yield rewritten).getOrElse(agg)
  }
}
