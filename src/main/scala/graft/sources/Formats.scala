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
}
