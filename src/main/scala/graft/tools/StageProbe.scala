package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic per-stage probe: run ANY registered gate with a listener
  * that reports, per stage, task count / total executor time / the
  * DOMINANT task — so single-task-serialization hunts (the
  * pipeline_full class, SCALE.md r11c) target the stage that actually
  * burns the wall instead of guessing from whole-query metrics.
  * Usage: StageProbe <gateName> <sfDir> */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val (name, dir) = (args(0), args(1))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    // shuffle/spill BYTES per stage (r14): the disk-exhaustion hunts
    // (dedup_allpairs at the distinct-heavy 100×) need to know which
    // stage writes the volume, not only which burns the wall
    val bytes = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        // the RDD scope names identify the physical operators the
        // stage executes — far more legible than the callsite
        val ops = i.rddInfos.map(_.name).distinct.mkString(" | ").take(160)
        stages.put(i.stageId, (ops, i.taskMetrics.executorRunTime, i.numTasks.toLong))
        val tm = i.taskMetrics
        bytes.put(i.stageId, (tm.shuffleReadMetrics.totalBytesRead,
          tm.shuffleWriteMetrics.bytesWritten, tm.diskBytesSpilled))
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          maxTask.merge(te.stageId, te.taskMetrics.executorRunTime,
            (a, b) => math.max(a, b))
    })
    // gc/cpu/deserialize attribution (r16): the 32-task zero-byte
    // stages burning ~0.3 s/task needed executorRunTime split into
    // cpuTime (real work), gc (allocation pressure) and deserialize
    // (closure/plan size) before any fix could be targeted
    val extra = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          extra.merge(te.stageId,
            (te.taskMetrics.jvmGCTime, te.taskMetrics.executorDeserializeTime,
              te.taskMetrics.executorCpuTime / 1000000L),
            (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    println(f"[probe] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (nm, total, ntasks)) =>
      val (sr, sw, sp) = bytes.getOrDefault(id, (0L, 0L, 0L))
      val (gc, des, cpu) = extra.getOrDefault(id, (0L, 0L, 0L))
      println(f"[stage] $id%3d tasks=$ntasks%3d total=${total / 1000.0}%8.1f s " +
        f"max-task=${maxTask.getOrDefault(id, 0L) / 1000.0}%8.1f s " +
        f"cpu=${cpu / 1000.0}%7.1f s gc=${gc / 1000.0}%5.1f s deser=${des / 1000.0}%5.1f s " +
        f"sread=${sr / (1 << 20)}%6d MB swrite=${sw / (1 << 20)}%6d MB " +
        f"spill=${sp / (1 << 20)}%6d MB  $nm")
    }
    graft.Graft.releaseState(spark)
    spark.stop()
  }
}
