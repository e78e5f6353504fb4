package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Formats

class SourcesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  val fixtures = "/root/testdata/sf0.001"

  test("CSV round-trip preserves values and types (orders)") {
    val dir = Files.createTempDirectory("graft-src").toString
    val orig = Tables.orders(spark, fixtures)
    Formats.writeCsv(orig, s"$dir/orders_csv")
    val back = Formats.readCsv(spark, s"$dir/orders_csv", orig.schema)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }

  test("JSON round-trip preserves values (customer)") {
    val dir = Files.createTempDirectory("graft-src").toString
    val orig = Tables.customer(spark, fixtures)
    Formats.writeJson(orig, s"$dir/cust_json")
    val back = Formats.readJson(spark, s"$dir/cust_json", orig.schema)
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-src").toString
    Formats.writePartitioned(
      Tables.orders(spark, fixtures), s"$dir/orders_p", "o_orderstatus")
    // physical layout: one directory per status value
    val statusDirs = new java.io.File(s"$dir/orders_p").listFiles()
      .filter(_.getName.startsWith("o_orderstatus=")).map(_.getName).sorted
    assert(statusDirs.length >= 2, statusDirs.mkString(","))
    // a filter on the partition column must prune to one partition dir
    val df = spark.read.parquet(s"$dir/orders_p").where(col("o_orderstatus") === "F")
    val scan = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("o_orderstatus"),
      s"partition filter must prune: ${scan.metadata("PartitionFilters")}")
    assert(df.count() > 0)
  }
}
