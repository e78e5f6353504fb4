package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs a gate's ORACLE SQL in Spark itself (temp views over the
  * fixture tables) and times it next to the gate's DataFrame form —
  * the A/B that separates "the declarative query is expensive" from
  * "the DataFrame build's hints/shape made it expensive". The SQL
  * twins are written for DuckDB but the relational subset used by the
  * q* gates parses in Spark unchanged; non-portable twins just error.
  *
  * Usage: SqlProbe <sfDir> <gateName> [cpus] */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[sqlprobe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s  ($rows rows)")
    }
    // SQL first (the hint-free shape — often the fast side of the A/B,
    // and the answer needed even when the df side would blow the
    // probe's time budget); SPARK_GRAFT_SQLPROBE_ONLY=sql|df restricts
    val mode = sys.env.getOrElse("SPARK_GRAFT_SQLPROBE_ONLY", "both")
    if (mode != "df") {
      time(s"$name sql (warm)") { spark.sql(graft.SparkEntry.oracleSql(name)).count() }
      time(s"$name sql") { spark.sql(graft.SparkEntry.oracleSql(name)).count() }
    }
    if (mode != "sql") {
      time(s"$name df (warm)") { graft.SparkEntry.queries(name)(spark, dir).count() }
      time(s"$name df") { graft.SparkEntry.queries(name)(spark, dir).count() }
    }
    spark.stop()
  }
}
