package graft.tools

import org.apache.spark.sql.SparkSession

/** Job-level probe: run ANY registered gate and report, per Spark JOB,
  * wall duration / stage count / task count — plus the totals. The
  * iterative operators (CC loops, Pregel rounds, stream folds) spend
  * wall time in per-job scheduling and materialization barriers that
  * stage-level metrics cannot attribute; this shows how many actions a
  * query really runs and how the wall distributes across them, so
  * "too many jobs" hunts target the loop that actually burns the wall.
  * Usage: JobProbe <gateName> <sfDir> [minJobMs] */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val (name, dir) = (args(0), args(1))
    val minMs = if (args.length > 2) args(2).toLong else 0L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class J(start: Long, var end: Long, var stages: Int, var tasks: Int)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, J(js.time, js.time,
          js.stageInfos.size, js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId); if (j != null) j.end = je.time
      }
    })
    // warmup pass: JVM/codegen startup must not pollute the job report
    try graft.SparkEntry.queries(name)(spark, dir).count()
    catch { case e: Throwable => System.err.println(s"[jobprobe] warmup: $e") }
    graft.Graft.releaseState(spark)
    jobs.clear()
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    val all = jobs.asScala.toSeq.sortBy(_._1)
    println(f"[jobprobe] $name: $n rows, wall=$wall%.2f s, jobs=${all.size}, " +
      f"sum-job-wall=${all.map(j => j._2.end - j._2.start).sum / 1000.0}%.2f s")
    all.filter(j => j._2.end - j._2.start >= minMs).foreach { case (id, j) =>
      println(f"[job] $id%4d ${(j.end - j.start) / 1000.0}%7.2f s stages=${j.stages}%2d tasks=${j.tasks}%4d")
    }
    graft.Graft.releaseState(spark)
    spark.stop()
  }
}
