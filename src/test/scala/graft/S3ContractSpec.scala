package graft

import java.net.URI
import java.nio.file.Files
import org.apache.hadoop.fs.RawLocalFileSystem
import org.scalatest.funsuite.AnyFunSuite
import graft.mr.{Apps, MRJob}

/** A RawLocalFileSystem mounted on a NON-file:// scheme ("mocks3") —
  * the Hadoop-FileSystem-contract stand-in for S3 in a sandbox with no
  * S3 endpoint or hadoop-aws jar. Everything the MR path does against
  * s3a:// goes through this same abstraction: scheme resolution via
  * `fs.<scheme>.impl`, bucket/prefix LISTING (glob), whole-object read,
  * and committed sink write. Exercising them through a foreign scheme
  * proves none of the code is file://-special-cased. */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mocks3:///")
  override def getScheme: String = "mocks3"
}

class S3ContractSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("MR wc end-to-end over a non-file scheme (listing, read, sink)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mocks3.impl", classOf[MockS3FileSystem].getName)
    val in = Files.createTempDirectory("graft-mocks3-in")
    Files.writeString(in.resolve("a.txt"), "one fish two fish\n")
    Files.writeString(in.resolve("b.txt"), "red fish blue fish\n")
    Files.writeString(in.resolve("skip.dat"), "not matched by the glob\n")
    val out = s"${Files.createTempDirectory("graft-mocks3-out")}/mr-out"

    MRJob.runFiles(spark, s"mocks3://$in/*.txt", s"mocks3://$out",
      Apps.wcMap, Apps.wcReduce, nReduce = 3)

    // the sink landed through the mock scheme; read it back via plain
    // file:// to prove real bytes were committed to the backing store
    val got = spark.read.text(out).collect().map(_.getString(0)).sorted.toSeq
    val want = MRJob.sequential(Seq(
        ("a.txt", "one fish two fish\n"),
        ("b.txt", "red fish blue fish\n")),
      Apps.wcMap, Apps.wcReduce).sorted
    assert(got == want, s"mock-scheme MR output diverged: $got")
    assert(got.exists(_.startsWith("fish 4")))
  }
}
