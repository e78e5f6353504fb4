package graft.mr

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's on-disk formats (SURVEY.md §1.2), as optional
  * wire-compat sources/sinks. Spark's native shuffle replaces the
  * mr-X-Y materialization entirely (reference `mr/worker.go:150-175`);
  * these exist so data produced by the reference can be read, and
  * outputs can be byte-compatible with its `mr-out-Y` files.
  */
object Formats {

  /** Write KV pairs as the intermediate JSON object stream — one
    * `{"Key":...,"Value":...}` object per pair, partitioned `nReduce`
    * ways by the REFERENCE'S hash: routing goes through
    * [[FnvPartitioner]] (`ihash(key) % nReduce`,
    * reference `mr/worker.go:143-175`), not Spark's Murmur3 — a
    * reference worker reading bucket Y of these files must find exactly
    * the keys its own partitioner assigns to task Y, or its reduce
    * outputs are wrong (placement compat is the whole point of this
    * sink; [[fnv32a]]'s scaladoc makes the same promise). */
  def writeIntermediate(kv: Dataset[KV], path: String, nReduce: Int): Unit = {
    val spark = kv.sparkSession
    import spark.implicits._
    val routed = kv.rdd.map(r => (r.key, r.value))
      .partitionBy(new FnvPartitioner(nReduce))
      .map { case (k, v) => KV(k, v) }
    spark.createDataset(routed)
      .select(col("key").as("Key"), col("value").as("Value"))
      .write.mode("overwrite").json(path)
  }

  /** Read intermediate JSON back to KV (reference decode loop,
    * `mr/worker.go:206-216`). */
  def readIntermediate(spark: SparkSession, path: String): Dataset[KV] = {
    import spark.implicits._
    spark.read.schema("Key STRING, Value STRING").json(path)
      .select(col("Key").as("key"), col("Value").as("value")).as[KV]
  }

  /** Write the reference's output format: text lines `key SP value`
    * (`"%v %v\n"`, reference `mr/worker.go:240`), one file per
    * partition mirroring one mr-out-Y per reduce task. */
  def writeOutputLines(kv: Dataset[KV], path: String): Unit =
    kv.select(concat_ws(" ", col("key"), col("value")).as("value"))
      .write.mode("overwrite").text(path)

  /** Read mr-out files back to KV (split on the FIRST space — values
    * may contain spaces, e.g. the metadata app's joined lists). */
  def readOutputLines(spark: SparkSession, path: String): Dataset[KV] = {
    import spark.implicits._
    spark.read.text(path).as[String].map { line =>
      val i = line.indexOf(' ')
      if (i < 0) KV(line, "") else KV(line.take(i), line.drop(i + 1))
    }
  }

  /** FNV-32a hash exactly as the reference partitions intermediate
    * keys: `ihash(key) & 0x7fffffff` (reference `mr/worker.go:30-34`,
    * constants from Go's hash/fnv New32a). Partition assignment is not
    * output-observable (outputs are sort-merged before comparison,
    * reference `main/test-mr.sh:103`), but bit-identical placement
    * matters if intermediate files are exchanged with the reference. */
  def fnv32a(key: String): Int = {
    var h = 0x811c9dc5 // FNV-32 offset basis
    key.getBytes("UTF-8").foreach { b =>
      h = h ^ (b & 0xff)
      h = h * 0x01000193 // FNV-32 prime
    }
    h & 0x7fffffff
  }

  /** RDD partitioner reproducing the reference's task routing
    * (`ihash(key) % nReduce`). */
  class FnvPartitioner(nReduce: Int) extends Partitioner {
    override def numPartitions: Int = nReduce
    override def getPartition(key: Any): Int =
      fnv32a(String.valueOf(key)) % nReduce
    override def equals(other: Any): Boolean = other match {
      case p: FnvPartitioner => p.numPartitions == numPartitions
      case _ => false
    }
    override def hashCode: Int = numPartitions
  }
}
