package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("salted join == plain join on a skewed key distribution") {
    // 90% of fact rows hit one hot key — the classic straggler shape
    val big = (1 to 20000).map(i =>
      (if (i % 10 == 0) (i % 50).toLong else 1L, i.toLong)).toDF("k", "v")
    val small = (0L to 60L).map(k => (k, s"dim_$k")).toDF("sk", "name")

    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = SkewJoin.salted(big, small, col("k"), col("sk"), n = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("runFiles: whole-file job end to end to mr-out text files") {
    val in = java.nio.file.Files.createTempDirectory("graft-e2e-in")
    val out = java.nio.file.Files.createTempDirectory("graft-e2e-out").toString + "/result"
    java.nio.file.Files.writeString(in.resolve("a.txt"), "hello world hello")
    java.nio.file.Files.writeString(in.resolve("b.txt"), "world again")
    graft.mr.MRJob.runFiles(spark, in.toString, out,
      graft.mr.Apps.wcMap, graft.mr.Apps.wcReduce, nReduce = 3)
    val lines = spark.read.text(out).as[String].collect().sorted
    assert(lines.toSeq == Seq("again 1", "hello 2", "world 2"))
    // nReduce controls output fan-out: 3 part files
    val parts = new java.io.File(out).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 3)
  }
}
