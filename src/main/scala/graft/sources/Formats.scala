package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format layer (SURVEY.md §2.5). The reference's only
  * connectors are S3 objects and the local FS, both as raw text
  * (`mr/worker.go:301-359`); Spark's DataSource V2 gives the engine
  * parquet/csv/json/text/orc on any Hadoop-compatible FS (file://,
  * hdfs://, s3a://) through one API. This wrapper pins the options that
  * make round-trips lossless (headers, timestamp formats, explicit
  * schemas — never inference in production paths).
  */
object Formats {

  /** Explicit-schema CSV read: schema inference is a full extra pass
    * over 100 TB and type-unstable — production reads declare schemas. */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .csv(path)

  /** JSON-lines: self-describing but schema-declared on read (same
    * rationale; also keeps column order/types stable). */
  def readJson(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .json(path)

  /** ORC: the other columnar lake format Spark ships natively —
    * same predicate-pushdown/column-pruning surface as parquet
    * (PushedFilters reach ORC's stripe/row-group stats), self-
    * describing schema, so no declared schema needed on read. */
  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Partitioned parquet sink — the lake layout: one directory level
    * per partition column enables partition pruning on read. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  // ------------------------------------------------ layout_schema_merge
  /** SCHEMA EVOLUTION across a table's file generations — the lake
    * reality every long-lived corpus hits: a crawler release adds a
    * column, and the table dir now holds files under BOTH schemas.
    * `mergeSchema` unions the parquet footers at planning time (footer
    * metadata only — no data pass at any corpus size) and old-schema
    * rows surface the new column as NULL; column pruning still applies
    * to the merged schema. The gate writes the documents table as two
    * generations into ONE directory — generation 1 (even doc_ids)
    * without the `quality` column, generation 2 (odd) with it — reads
    * the directory back merged, and aggregates per language with
    * null-sensitive counts, so the hash pins exactly the
    * old-rows-read-NULL semantics against an oracle that re-derives
    * the union relationally. Per-process scratch dir: the gate can run
    * concurrently from bench + verify (the snapshot_zmaintain
    * precedent). */
  def layoutSchemaMerge(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(s, dir)
    val tdir = java.nio.file.Files.createTempDirectory("graft-schemamerge").toString
    docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode(SaveMode.Append).parquet(tdir)
    docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") % 100).as("quality"))
      .write.mode(SaveMode.Append).parquet(tdir)
    s.read.option("mergeSchema", "true").parquet(tdir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        count(col("quality")).as("n_quality"),
        sum(col("quality")).as("sum_quality"))
  }

  val layoutSchemaMergeSql: String =
    """SELECT lang,
      |       CAST(COUNT(1) AS BIGINT) AS n,
      |       CAST(COUNT(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_quality,
      |       CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars % 100 END) AS BIGINT) AS sum_quality
      |FROM documents
      |GROUP BY lang""".stripMargin
}
