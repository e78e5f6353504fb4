package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.operators.EntityResolution

/** Streaming entity-resolution maintenance — the catalog-ingest shape:
  * each arriving record batch folds through the contracted ER
  * steady-state step ([[EntityResolution.erEntitiesVs]]: batch-new
  * names verified, snapshot endpoints contracted to prior entities,
  * delta propagation) into standing name-state (name, rep, cnt,
  * entity label) under [[SnapshotStream]]'s versioned
  * `_SUCCESS`-gated discipline. Bootstrap-from-empty is the same code
  * path (an empty predecessor degenerates the step to a from-scratch
  * build over the batch), and an at-least-once replayed batch
  * re-reads the same predecessor and rewrites its version
  * byte-identically — exactly-once state maintenance.
  *
  * Preconditions inherited from the batch twin (documented at
  * [[EntityResolution.erIncr]]): append-only keys, block cap not
  * newly binding. The StreamingSpec drives a checkpointed restart +
  * manual replay and pins the final state's record labeling against
  * the one-shot [[EntityResolution.erEntities]] recompute.
  */
object ErStream {

  /** foreachBatch sink: fold a part-shaped `batch` into the stored
    * name state (versions under `$tableDir/er`). */
  def erSink(tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val dir = s"$tableDir/er"
    val prev = SnapshotStream.versionsIn(s, dir).filter(_ < batchId).lastOption
      .map(v => s.read.parquet(s"$dir/v=$v"))
      .getOrElse(EntityResolution.emptyState(s))
    val next = EntityResolution.erEntitiesVs(s,
      EntityResolution.namesOfParts(batch),
      EntityResolution.dnOfState(prev),
      EntityResolution.priorOfState(prev))
    // the name state is CORPUS-SHAPED (one row per distinct name —
    // hundreds of millions at 100 TB), so the version write must fan
    // out: hash-partitioned by name across the shuffle width, never a
    // coalesce(1) funnel through one task. The sketch sinks' single
    // file is fine (|keys|-bounded state); this one is not.
    next.repartition(col("name")).write.mode("overwrite").parquet(s"$dir/v=$batchId")
  }

  /** The maintained name state (latest committed version). */
  def storedState(s: org.apache.spark.sql.SparkSession, tableDir: String): DataFrame = {
    val dir = s"$tableDir/er"
    val vs = SnapshotStream.versionsIn(s, dir)
    require(vs.nonEmpty, s"no ER state versions under $dir")
    s.read.parquet(s"$dir/v=${vs.last}")
  }
}
