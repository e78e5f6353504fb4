package graft

import java.io.File
import java.nio.ByteBuffer
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{IcebergExport, Manifest}

/** The Iceberg-shape export: tree layout, spec field-ids, bound
  * encoding, and the round-trip identity with the manifest table. */
class IcebergExportSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getInt(8))).sortBy(_._1).toSeq

  test("round-trip: the Avro read-back reconstructs the manifest table exactly") {
    val got = rows(IcebergExport.layoutExportIceberg(spark, dir))
    val want = rows(Manifest.layoutManifest(spark, dir)
      .select("bucket", "n_rows", "min_pk", "max_pk", "min_ok", "max_ok",
        "min_z", "max_z", "pruned"))
    assert(got.nonEmpty && got === want)
  }

  test("tree shape: version hint, v2 metadata JSON, spec'd partition transform, field ids") {
    IcebergExport.layoutExportIceberg(spark, dir).count()
    val root = new File(new File(sys.props("java.io.tmpdir")),
      s"graft-iceberg-export-${math.abs(dir.hashCode)}")
    val meta = new File(root, "metadata")
    assert(java.nio.file.Files.readString(
      new File(meta, "version-hint.text").toPath).trim == "1")
    val mj = java.nio.file.Files.readString(
      new File(meta, "v1.metadata.json").toPath)
    // the table-metadata keys an external reader resolves the tree by
    Seq("\"format-version\":2", "\"current-snapshot-id\":1",
      "\"manifest-list\":", "\"partition-specs\":",
      "\"transform\":\"truncate[", "\"schemas\":").foreach(k =>
      assert(mj.contains(k), s"metadata.json missing $k"))
    assert(new File(meta, "snap-1.avro").isFile &&
      new File(meta, "manifest-1.avro").isFile)
    // Iceberg field ids ride as Avro field props — the contract that
    // makes the file readable by ID rather than by name
    val df = IcebergExport.manifestEntrySchema.getField("data_file").schema()
    assert(df.getField("file_path").getObjectProp("field-id") == 100)
    assert(df.getField("file_format").getObjectProp("field-id") == 101)
    assert(df.getField("record_count").getObjectProp("field-id") == 103)
    assert(df.getField("lower_bounds").getObjectProp("field-id") == 125)
    assert(df.getField("upper_bounds").getObjectProp("field-id") == 128)
    assert(IcebergExport.manifestListSchema
      .getField("manifest_path").getObjectProp("field-id") == 500)
  }

  test("bounds use Iceberg single-value serialization (8-byte little-endian long)") {
    val b = IcebergExport.longBytes(0x0102030405060708L)
    assert(b.toSeq == Seq(8, 7, 6, 5, 4, 3, 2, 1).map(_.toByte))
    assert(IcebergExport.bytesLong(ByteBuffer.wrap(b)) == 0x0102030405060708L)
  }

  test("the gate's rows come from the FILES: altering the written tree alters the read-back") {
    val root = new File(new File(sys.props("java.io.tmpdir")), "graft-iceberg-spec")
    val stats = Seq((0L, 10L, 1L, 2L, 3L, 4L, 5L, 6L), (1L, 20L, 7L, 8L, 9L, 10L, 11L, 12L))
    IcebergExport.writeTree(root, stats)
    val a = IcebergExport.readTree(root).map(_.toSeq)
    IcebergExport.writeTree(root, stats.map { case (b, n, a1, a2, a3, a4, a5, a6) =>
      (b, n + 5, a1, a2, a3, a4, a5, a6) })
    val b = IcebergExport.readTree(root).map(_.toSeq)
    assert(a != b && a.map(_.head) == b.map(_.head),
      "read-back must reflect the on-disk tree, not a cached table")
    // and the box verdict derives from the DECODED envelopes
    val wide = Seq((0L, 1L, Manifest.PkLo, Manifest.PkHi, Manifest.OkLo,
      Manifest.OkHi, 0L, 1L))
    IcebergExport.writeTree(root, wide)
    assert(IcebergExport.readTree(root).head.getInt(8) == 0) // intersects
    val out = Seq((0L, 1L, Manifest.PkHi + 1, Manifest.PkHi + 2,
      Manifest.OkLo, Manifest.OkHi, 0L, 1L))
    IcebergExport.writeTree(root, out)
    assert(IcebergExport.readTree(root).head.getInt(8) == 1) // disjoint on pk
  }
}
