package graft.tools
import org.apache.spark.sql.SparkSession

/** Executes a gate query and prints node-occurrence counts from the
  * FINAL adaptive plan (isFinalPlan=true) — the ground truth for
  * exchange-reuse / duplicate-kernel questions that the pre-execution
  * plan can't answer under AQE. Usage: FinalPlan <sfDir> <query> [needle...] */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    // Execute df's OWN plan (count() wraps df in a new Dataset whose
    // plan is the one that executes, leaving df's executedPlan
    // unfinalized — isFinalPlan=false, zero query stages, the exact
    // artifact this tool exists to avoid reading) without collecting:
    // toRdd runs the same queryExecution and foreach discards rows in
    // the executors, so row-explosive operators don't OOM the driver.
    // (df.rdd would NOT do: Dataset.rdd executes a separate
    // rddQueryExecution — the same wrong-plan trap as count().)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    if (args.length > 2 && args(2) == "DUMP") println(plan)
    else {
      val needles =
        if (args.length > 2) args.drop(2).toSeq
        else Seq("ReusedExchange", "MapPartitions", "FileScan parquet")
      needles.foreach { n =>
        println(s"[finalplan] ${args(1)} '$n': ${n.r.findAllIn(plan).length}")
      }
      // AQE prints a reused stage as a repeated ShuffleQueryStage id:
      // refs > distinct ids ⇒ stage-level reuse is happening
      val ids = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
      println(s"[finalplan] ${args(1)} shuffle-stage refs=${ids.length} distinct=${ids.distinct.length}")
    }
    spark.stop()
  }
}
