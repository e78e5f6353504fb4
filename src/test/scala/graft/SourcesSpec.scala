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

  test("ORC round-trip preserves values; filters push into the ORC scan") {
    val dir = Files.createTempDirectory("graft-src").toString
    val orig = Tables.lineitem(spark, fixtures)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    Formats.writeOrc(orig, s"$dir/li_orc")
    val back = Formats.readOrc(spark, s"$dir/li_orc")
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
    // predicate pushdown reaches the ORC scan like it does parquet
    val plan = Formats.readOrc(spark, s"$dir/li_orc")
      .where(col("l_orderkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)"), plan)
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

  test("compaction rewrites a many-small-files directory into few target-size files, losslessly") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/li"
    val li = Tables.lineitem(spark, fixtures).select(col("l_orderkey"), col("l_quantity"))
    li.repartition(64).write.mode("overwrite").parquet(dir) // the small-file mess
    def files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 64)
    val expected = li.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

    val n = graft.sources.Compaction.compact(spark, dir, targetBytes = 64L << 20)
    assert(n == 1 && files.length == 1, s"6k rows fit one 64 MB target file, got $n")
    val back = spark.read.parquet(dir).collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(back == expected, "compaction must preserve the exact row multiset")
  }

  private def scanned(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val matching = df.collect().length.toLong
    val scan = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PushedFilters").contains("ThanOrEqual") ||
           scan.metadata("PushedFilters").contains("LessThan"),
      s"predicate must reach the reader: ${scan.metadata("PushedFilters")}")
    (scan.metrics("numOutputRows").value, matching)
  }

  test("range-sorted write enables row-group (zone-map) pruning; unsorted reads everything") {
    // The 100 TB layout lesson: sort-on-write gives every parquet file /
    // row group a narrow min-max envelope on the sort column, so a
    // selective time predicate skips whole row groups in the reader —
    // the same scan over a hash-shuffled layout decodes ~everything
    // (every row group spans the full value range). Measured via the
    // scan node's numOutputRows (rows the reader actually decoded).
    // The sort column is epoch-µs BIGINT — see the companion test for
    // why it must not be TIMESTAMP_NTZ.
    val dir = Files.createTempDirectory("graft-zonemap").toString
    val li = Tables.lineitem(spark, fixtures)
      .select(col("l_orderkey"),
        (col("l_shipdate").cast("timestamp").cast("long") * 1000000L).as("ship_us"),
        col("l_quantity"))
    li.repartitionByRange(8, col("ship_us"))
      .sortWithinPartitions(col("ship_us"))
      .write.mode("overwrite").parquet(s"$dir/sorted")
    li.repartition(8, col("l_orderkey")) // date-oblivious layout
      .write.mode("overwrite").parquet(s"$dir/unsorted")

    val total = li.count()
    val (lo, hi) = (883612800000000L, 891388800000000L) // 1998 Q1
    def q(path: String) = spark.read.parquet(path)
      .where(col("ship_us") >= lo && col("ship_us") < hi)
      .select(col("l_quantity"))
    val (sortedScan, m1) = scanned(q(s"$dir/sorted"))
    val (unsortedScan, m2) = scanned(q(s"$dir/unsorted"))
    assert(m1 == m2 && m1 > 0, "both layouts must return identical results")
    // sorted layout: only the row group(s) overlapping Q1-1998 decode
    assert(sortedScan < total / 4,
      s"zone maps must skip most row groups: scanned $sortedScan of $total")
    // unsorted layout: every row group overlaps the range — no skipping
    assert(unsortedScan > total / 2,
      s"hash layout should decode ~everything, got $unsortedScan of $total")
  }

  test("z-order layout prunes on the NON-sort dimension where a 1-D sort cannot") {
    // The 1-D zone-map test above shows sort-on-write pruning on the
    // sort column; this shows its blind spot and the fix. Layout A is
    // sorted by pk alone; layout B by the Morton key of (pk, sk). A
    // selective predicate on sk ONLY: layout A's row groups all span
    // the full sk range (decode ~everything), while each of layout B's
    // contiguous z-ranges bounds sk's HIGH BITS, so only the files
    // whose sk envelope overlaps the predicate decode — partial pruning
    // on a dimension the 1-D layout can't prune at all.
    import graft.sources.ZOrder
    val dir = Files.createTempDirectory("graft-zorder").toString
    // both dims need real spread for the demo (l_suppkey has only 10
    // distinct values at this SF — a row group whose sk-min is 1 can
    // never be skipped by sk < 8)
    val li = Tables.lineitem(spark, fixtures)
      .select(col("l_linenumber"),
        expr("l_partkey % 256").as("pk"), expr("l_orderkey % 256").as("sk"))
    li.repartitionByRange(32, col("pk"))
      .sortWithinPartitions(col("pk"))
      .write.mode("overwrite").parquet(s"$dir/pk_sorted")
    li.withColumn("z", ZOrder.zkey(col("pk"), col("sk")))
      .repartitionByRange(32, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z") // the layout survives; the key need not be stored
      .write.mode("overwrite").parquet(s"$dir/z_sorted")
    val total = li.count()
    def q(path: String) = spark.read.parquet(path)
      .where(col("sk") < 8).select(col("l_linenumber"))
    val (pkScan, m1) = scanned(q(s"$dir/pk_sorted"))
    val (zScan, m2) = scanned(q(s"$dir/z_sorted"))
    assert(m1 == m2 && m1 > 0, "both layouts must return identical results")
    assert(pkScan > total * 3 / 4,
      s"pk-sorted layout cannot prune sk: scanned $pkScan of $total")
    assert(zScan < total / 2,
      s"z-layout must skip sk-disjoint row groups: scanned $zScan of $total")
    assert(zScan < pkScan / 2,
      s"z-layout must beat the 1-D layout on the non-sort dimension: $zScan vs $pkScan")
  }

  test("z-maintained table: upsert + sorted compaction touch only the batch's buckets and preserve the z-layout") {
    import graft.sources.{ZMaintain, ZOrder}
    val dir = Files.createTempDirectory("graft-zmaintain").toString + "/t"
    val docs = Tables.documents(spark, fixtures)
    val base = docs.where(col("doc_id") % 3 =!= 0)
    ZMaintain.writeZBucketed(base, dir, "doc_id", ZMaintain.zDocs)
    def files(b: Long): Map[String, Long] = {
      val d = new java.io.File(s"$dir/bucket=$b")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = (0L until ZMaintain.NBuckets).map(b => b -> files(b)).toMap
    // a bucket-LOCALIZED batch: keys congruent 0 or 1 mod NBuckets
    val updates = docs
      .where(col("doc_id") % ZMaintain.NBuckets < 2 && col("doc_id") % 5 === 0)
      .withColumn("text", upper(col("text")))
    val touched = ZMaintain.upsertZBucketed(spark, dir, updates, "doc_id", ZMaintain.zDocs)
    assert(touched == Seq(0L, 1L), s"batch touches buckets 0,1 only: $touched")
    // untouched buckets: same files, byte-for-byte untouched (mtime)
    (2L until ZMaintain.NBuckets).foreach { b =>
      assert(files(b) == before(b), s"bucket $b must not be rewritten")
    }
    // content converges to the relational upsert (the snapshot_upsert core)
    val expected = graft.operators.Snapshots
      .upsertOver(base, updates, "doc_id").drop("op")
    val back = spark.read.parquet(dir).drop("bucket")
      .select(expected.columns.map(col): _*)
    assert(back.exceptAll(expected).count() == 0 && expected.exceptAll(back).count() == 0,
      "maintained table must equal the one-shot relational upsert")
    // z-layout restored on the touched buckets: each file internally
    // sorted by the recomputed z-key (the q43 ordering metric — the
    // min-max envelope discipline row-group pruning relies on)
    touched.foreach { b =>
      new java.io.File(s"$dir/bucket=$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val zs = spark.read.parquet(f.getAbsolutePath)
            .select(ZMaintain.zDocs.as("z")).collect().map(_.getLong(0))
          assert(zs.sameElements(zs.sorted),
            s"file ${f.getName} in bucket $b must be z-sorted after compaction")
        }
    }
  }

  test("z-maintained table: insert-only batch into a bucket with no directory; empty batch is a no-op") {
    import graft.sources.ZMaintain
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zmaintain-hole").toString + "/t"
    // base populates buckets {0, 1} ONLY — every other bucket dir is a
    // legal hole (empty write partitions produce no directory)
    val base = Seq((0L, "a"), (8L, "b"), (1L, "c"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")).cast("long"))
    ZMaintain.writeZBucketed(base, dir, "doc_id", ZMaintain.zDocs)
    assert(!new java.io.File(s"$dir/bucket=5").exists())
    // a batch whose only key lands in hole-bucket 5 must INSERT, not
    // crash on the missing directory read
    val batch = Seq((5L, "new"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")).cast("long"))
    val touched = ZMaintain.upsertZBucketed(spark, dir, batch, "doc_id", ZMaintain.zDocs)
    assert(touched == Seq(5L))
    val back = spark.read.parquet(dir).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == Map(0L -> "a", 8L -> "b", 1L -> "c", 5L -> "new"))
    // empty batch: no touched buckets, table untouched
    assert(ZMaintain.upsertZBucketed(spark, dir, batch.limit(0), "doc_id",
      ZMaintain.zDocs).isEmpty)
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("TIMESTAMP_NTZ sort column defeats row-group pruning (store epoch longs instead)") {
    // Same sorted layout, but keyed on the raw timestamp_ntz column:
    // the range predicate appears in PushedFilters yet the parquet
    // reader does not evaluate it against row-group stats for NTZ —
    // the scan decodes every row. This is WHY the engine carries event
    // time as epoch-µs BIGINT (ts_us) end to end; pinned here so a
    // future Spark that fixes NTZ pruning shows up as a failing assert.
    val dir = Files.createTempDirectory("graft-zonemap-ntz").toString
    val li = Tables.lineitem(spark, fixtures)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"))
    assert(li.schema("l_shipdate").dataType.typeName == "timestamp_ntz")
    li.repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/sorted")
    val df = spark.read.parquet(s"$dir/sorted")
      .where(col("l_shipdate") >= "1998-01-01" && col("l_shipdate") < "1998-04-01")
      .select(col("l_quantity"))
    val (scanRows, matching) = scanned(df)
    assert(matching > 0)
    assert(scanRows == li.count(),
      s"NTZ scan was expected to decode everything (got $scanRows) — " +
        "if Spark now prunes NTZ row groups, update SCALE.md and prefer the native column")
  }

  test("schema merge: old-generation rows read NULL in the added column; pruning survives the merge") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-schemaspec").toString
    val s = spark
    import s.implicits._
    Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
      .write.mode("append").parquet(dir)
    Seq((3L, "en", 7L), (4L, "fr", 9L)).toDF("doc_id", "lang", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "lang", "quality"))
    val rows = merged.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(rows == Map(1L -> -1L, 2L -> -1L, 3L -> 7L, 4L -> 9L),
      "generation-1 rows must surface NULL in the added column")
    // the at-scale claim: pruning still applies to the MERGED schema —
    // a 2-column projection must not read the added column
    val scan = merged.select(col("doc_id"), col("lang"))
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scan.nonEmpty &&
      !scan.head.metadata("ReadSchema").contains("quality"),
      s"merged-schema read must still prune columns: ${scan.head.metadata("ReadSchema")}")
  }
}
