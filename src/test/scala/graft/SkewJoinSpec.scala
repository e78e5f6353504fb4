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

  test("salt is a pure row function: stable under repartitioning and spread over buckets") {
    val big = (1 to 5000).map(i => (1L, i.toLong)).toDF("k", "v") // one hot key
    def salts(parts: Int): Map[Long, Int] = {
      val df = big.repartition(parts)
      df.withColumn("s", SkewJoin.saltCol(df, 8))
        .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    }
    val a = salts(2)
    val b = salts(31)
    // a rand()-based salt changes with the physical partitioning; the
    // row-hash salt must not (retry/speculation-proof distribution)
    assert(a == b)
    // and it actually spreads the hot key across all n salt buckets
    val sizes = a.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 8 && sizes.min > 300,
      s"hot key must spread over all 8 salts, got bucket sizes $sizes")
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
