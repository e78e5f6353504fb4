package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.mr.{Apps, Formats, KV, MRJob}

class FormatsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  val kvs = Seq(KV("apple", "1"), KV("banana", "2"), KV("apple", "3"),
    KV("cherry", "multi word value"), KV("δοκιμή", "unicode"))

  test("intermediate JSON round-trips and partitions by key") {
    val dir = Files.createTempDirectory("graft-fmt").toString + "/inter"
    Formats.writeIntermediate(kvs.toDS(), dir, nReduce = 3)
    val back = Formats.readIntermediate(spark, dir).collect().sortBy(k => (k.key, k.value))
    assert(back.toSeq == kvs.sortBy(k => (k.key, k.value)))
  }

  test("output lines round-trip, values may contain spaces") {
    val dir = Files.createTempDirectory("graft-fmt").toString + "/out"
    Formats.writeOutputLines(kvs.toDS(), dir)
    val back = Formats.readOutputLines(spark, dir).collect().sortBy(k => (k.key, k.value))
    assert(back.toSeq == kvs.sortBy(k => (k.key, k.value)))
  }

  test("fnv32a matches Go hash/fnv New32a reference values") {
    // golden values computed from the FNV-1a spec (offset 2166136261,
    // prime 16777619), masked like the reference's ihash
    assert(Formats.fnv32a("") == (0x811c9dc5 & 0x7fffffff))
    assert(Formats.fnv32a("a") == (0xe40c292c & 0x7fffffff))
    assert(Formats.fnv32a("foobar") == (0xbf9cf968 & 0x7fffffff))
  }

  test("FnvPartitioner routes keys like ihash % nReduce") {
    val p = new Formats.FnvPartitioner(10)
    for (k <- Seq("apple", "banana", "", "δ"))
      assert(p.getPartition(k) == Formats.fnv32a(k) % 10)
    val parts = spark.sparkContext.parallelize(kvs.map(k => (k.key, k.value)))
      .partitionBy(p)
      .mapPartitionsWithIndex { (i, it) => it.map(kv => (i, kv._1)) }
      .collect()
    parts.foreach { case (i, key) => assert(i == Formats.fnv32a(key) % 10) }
  }

  test("retry parity: flaky map tasks do not change results (crash app intent)") {
    // mirrors the reference crash test (main/test-mr.sh:283-330): with
    // task retries enabled, transiently failing tasks must produce
    // byte-identical output to the no-failure run
    val corpus = (1 to 20).map(i => (s"f$i.txt", s"alpha beta f$i gamma " * 5))
    val golden = MRJob.run(corpus.toDS(), Apps.wcMap, Apps.wcReduce)
      .collect().sorted
    val attempts = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    val flakyMap: MRJob.MapF = (name, contents) => {
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() % 3 == 0 &&
          attempts.putIfAbsent(tc.partitionId(), 1) == null)
        throw new RuntimeException("injected transient failure")
      Apps.wcMap(name, contents)
    }
    val flaky = MRJob.run(corpus.toDS().repartition(6), flakyMap, Apps.wcReduce)
      .collect().sorted
    assert(flaky === golden)
  }
}
