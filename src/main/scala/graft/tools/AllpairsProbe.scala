package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** One-off stage probe for the all-pairs kernel: times each stage of
  * [[Dedup.allpairsOver]]'s pipeline in isolation at a given fixture
  * so skew work targets the stage that actually burns the wall.
  * Usage: AllpairsProbe <dir> */
object AllpairsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, args(0))

    if (args.length > 1 && args(1) == "STAGES") {
      // run the REAL gate with a per-stage listener: which stage holds
      // the dominant task?
      val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          stages.put(i.stageId, (i.name.takeWhile(_ != '\n').take(60),
            i.taskMetrics.executorRunTime, i.numTasks.toLong))
        }
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = ()
      })
      val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            maxTask.merge(te.stageId, te.taskMetrics.executorRunTime,
              (a, b) => math.max(a, b))
      })
      graft.operators.Dedup.dedupAllpairs(spark, args(0)).count()
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (name, total, ntasks)) =>
        println(f"[stage] $id%3d tasks=$ntasks%3d total=${total / 1000.0}%8.1f s max-task=${maxTask.getOrDefault(id, 0L) / 1000.0}%8.1f s  $name")
      }
      spark.stop(); return
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }

    import org.apache.spark.sql.expressions.Window
    val dg = Dedup.shinglesOf(docs).persist()
    time("shingles")(dg.count())
    val df = dg.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = dg.join(df, "s")
      .withColumn("rnk", row_number().over(byDoc.orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(byDoc))
    val prefix = ranked
      .where(col("rnk") <= expr("n - ((n * 3 + 4) div 5) + 1"))
      .select(col("s"), col("doc_id"), col("n"), col("rnk")).persist()
    time("prefix")(prefix.count())
    val raw = prefix.as("a").join(prefix.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    val filtered = raw
      .where(lit(Dedup.AllPairsTauPpm) * greatest(col("a.n"), col("b.n")) <=
        lit(1000000L) * least(col("a.n"), col("b.n")))
      .where(expr(s"1 + least(a.n - a.rnk, b.n - b.rnk) >= " +
        s"(${Dedup.AllPairsTauPpm} * (a.n + b.n) + ${1000000L + Dedup.AllPairsTauPpm} - 1) " +
        s"div ${1000000L + Dedup.AllPairsTauPpm}"))
    val cand = filtered
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct().persist()
    time("raw-candidate-join")(println("  raw rows: " + raw.count()))
    time("cand-distinct")(println("  cand rows: " + cand.count()))
    val candDocs = cand.select(col("da").as("doc_id"))
      .union(cand.select(col("db").as("doc_id"))).distinct().persist()
    time("cand-docs")(println("  cand docs: " + candDocs.count()))
    val docSets = dg.join(candDocs, Seq("doc_id"), "semi")
      .groupBy(col("doc_id")).agg(collect_list(col("s")).as("ss")).persist()
    time("doc-sets")(docSets.count())
    val inter = cand.select(col("da"), col("db"))
      .join(docSets.select(col("doc_id").as("da"), col("ss").as("ssa")), Seq("da"))
      .join(docSets.select(col("doc_id").as("db"), col("ss").as("ssb")), Seq("db"))
      .select(col("da"), col("db"),
        size(array_intersect(col("ssa"), col("ssb"))).cast("long").as("inter"))
    time("verify-packed")(inter.count())
    spark.stop()
  }
}
