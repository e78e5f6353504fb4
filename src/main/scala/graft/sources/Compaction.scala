package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the unglamorous operation that keeps a
  * 100 TB lake queryable. Streaming sinks, incremental ingestion, and
  * high-parallelism writes leave directories with thousands of KB-sized
  * files; every subsequent scan then pays per-file open/footer/listing
  * costs that dwarf the data read (and overwhelms driver listing at
  * millions of files).
  *
  * `compact` rewrites a parquet directory into ⌈bytes/target⌉ files of
  * ~target size via `repartition(n)` (round-robin — even output sizes
  * without assuming any column distribution), writing to a temp sibling
  * and swapping directories. EACH rename is atomic (HDFS/posix), but
  * the two-rename swap as a whole is not: a reader in the instant
  * between them sees no directory, and a crash there leaves the data
  * under the `.compact-old` backup — which is why the backup is deleted
  * ONLY after the swap-in succeeds, every rename's boolean result is
  * checked (Hadoop reports failure by returning false, not throwing),
  * and a failed swap-in restores the backup. For concurrent-reader
  * safety on object stores use a manifest/table format instead —
  * documented tradeoff.
  */
object Compaction {

  /** Returns the number of output files written. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Int =
    rewrite(spark, dir, targetBytes)((df, n) => df.repartition(n))

  /** Compaction that RESTORES a sort-on-write layout while it merges:
    * plain [[compact]]'s round-robin repartition deliberately assumes
    * nothing about the data — which also destroys any zone-map/z-order
    * layout the directory had, so every compaction would undo the
    * pruning the layout paid for at write time. This variant recomputes
    * the sort key per row (the key need not be stored — e.g.
    * [[ZOrder.zkey]] over two stored columns), range-partitions into
    * ⌈bytes/target⌉ files and sorts within each, leaving the directory
    * with disjoint per-file key envelopes — the same min-max pruning
    * contract as the original sort-on-write. */
  def compactSorted(spark: SparkSession, dir: String, targetBytes: Long,
                    sortKey: Column): Int =
    rewrite(spark, dir, targetBytes) { (df, n) =>
      df.repartitionByRange(n, sortKey).sortWithinPartitions(sortKey)
    }

  private def rewrite(spark: SparkSession, dir: String, targetBytes: Long)(
      shape: (DataFrame, Int) => DataFrame): Int = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(path)
    // a flat rewrite of a PARTITIONED layout would silently drop the
    // partitioning (and its pruning) — compact each leaf dir instead
    require(!entries.exists(e => e.isDirectory && e.getPath.getName.contains("=")),
      s"$dir is a partitioned layout; compact its leaf directories individually")
    val dataBytes = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(dataBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(path.getParent, s".${path.getName}.compact-tmp")
    shape(spark.read.parquet(dir), n)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = new Path(path.getParent, s".${path.getName}.compact-old")
    fs.delete(old, true)
    if (!fs.rename(path, old))
      // nothing moved yet — the live data is untouched; just clean tmp
      { fs.delete(tmp, true)
        throw new java.io.IOException(s"compact: could not move $path aside to $old") }
    if (!fs.rename(tmp, path)) {
      // swap-in failed with the live dir already moved aside: restore
      // the backup BEFORE failing — falling through to a delete here
      // would destroy the only remaining copy of the data
      val restored = fs.rename(old, path)
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"compact: swap-in of $tmp failed" +
          (if (restored) s"; original restored at $path"
           else s"; RESTORE ALSO FAILED — data remains at $old"))
    }
    fs.delete(old, true) // swap complete: the backup is now redundant
    n
  }
}
