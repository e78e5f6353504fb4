package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.drop(1))
      println(name + ":\n" + graft.SparkEntry.queries(name)(spark, args(0))
        .queryExecution.executedPlan.toString
        .take(sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CHARS", "4000").toInt))
    spark.stop()
  }
}
