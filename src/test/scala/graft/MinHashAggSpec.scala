package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MinHashAgg
import graft.operators.Dedup

/** The typed MinHash Aggregator must produce signatures identical to
  * the per-document mapPartitions kernel — same hash family, but as a
  * mergeable partial aggregate (map-side combine; works under any
  * partitioning and in streaming). */
class MinHashAggSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("aggregator signatures == kernel signatures on fixture docs") {
    val dir = "/root/testdata/sf0.001"
    val agg = new MinHashAgg(Dedup.K, Dedup.HashA.toArray, Dedup.HashB.toArray, Dedup.P)
    val viaAgg = Dedup.shingleHashes(spark, dir)
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sig"))
      .toDF("doc_id", "sig")
    val viaKernel = Dedup.minhashSignatures(spark, dir)
      .select(col("doc_id"), array((0 until Dedup.K).map(i => col(s"m$i")): _*).as("sig"))
    val a = viaAgg.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = viaKernel.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a.nonEmpty && a.size == b.size)
    for ((id, sig) <- a) assert(sig == b(id), s"doc $id signature mismatch")
  }

  test("aggregator is merge-order invariant (partitioning independence)") {
    val dir = "/root/testdata/sf0.001"
    val agg = new MinHashAgg(Dedup.K, Dedup.HashA.toArray, Dedup.HashB.toArray, Dedup.P)
    def sigs(parts: Int) = Dedup.shingleHashes(spark, dir)
      .repartition(parts).as[(Long, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("sig"))
      .collect().map(r => r._1 -> r._2).toMap
    assert(sigs(1) == sigs(13))
  }
}
