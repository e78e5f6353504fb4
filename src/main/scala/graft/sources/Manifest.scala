package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-skipping manifest over a z-ordered layout — the Delta/Iceberg
  * data-skipping core as an explicit, oracle-checkable table. A 100-TB
  * table is only as queryable as its metadata: the planner never reads
  * a file whose min-max envelope cannot intersect the predicate, so
  * the STATS TABLE (one row per file: row count + per-column
  * envelopes) is the real index. This module materializes that
  * manifest and evaluates the pruning decision for a fixed
  * two-dimensional box predicate, making the usually-invisible skip
  * logic a hash-checked result.
  *
  * The layout model is deterministic so the oracle can replay it:
  * files are fixed-width z-ranges (bucket = zkey div width — the shape
  * `repartitionByRange(zkey).sortWithinPartitions(zkey)` produces,
  * with range bounds pinned instead of sampled) over the
  * [[MBits]]-bit dimensions (l_partkey mod 2^MBits, l_orderkey mod
  * 2^MBits) — both fully populated at every fixture SF, so every
  * bucket is a real file. Because z interleaves both dimensions,
  * EVERY bucket has a bounded envelope in BOTH columns — the box
  * predicate prunes buckets on either dimension, which is the whole
  * point of the z layout (a 1-D sort gives one perfect envelope and
  * one vacuous one; SourcesSpec's scan counters quantify the same
  * effect at the parquet row-group level).
  *
  * 100-TB shape: the manifest build is ONE map-side-combinable
  * aggregation (B·O(1) state; B = file count, the table every planner
  * holds in memory); the pruning decision is a constant-time envelope
  * test per manifest row, no data scan at all. ManifestSpec closes the
  * loop physically: it writes the layout partitioned by bucket,
  * answers the box query reading ONLY unpruned buckets, and checks
  * equality with the full scan.
  */
object Manifest {

  /** Bits per manifest dimension (domain 2^MBits each). */
  val MBits = 6

  /** Fixed file count (z-range width = 2^(2·MBits) / Buckets). */
  val Buckets = 64

  /** The box predicate the gate evaluates pruning for: a 16×16 box in
    * the 64×64 key space (≈1/16 of the data, hitting ~4 of 64 files). */
  val PkLo = 16L; val PkHi = 31L
  val OkLo = 32L; val OkHi = 47L

  private val m = 1L << MBits
  private val rangeWidth = (m * m) / Buckets

  /** (bucket, pk, ok, zkey) for every lineitem row under the pinned
    * layout model. */
  private[graft] def keyed(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr(s"l_partkey % $m").as("pk"), expr(s"l_orderkey % $m").as("ok"))
      .withColumn("zkey", ZOrder.zkey(col("pk"), col("ok")))
      .withColumn("bucket", expr(s"zkey div $rangeWidth"))

  /** The manifest: one row per z-range file with count + envelopes +
    * the pruning verdict for the fixed box. `pruned = 1` iff the
    * file's envelope cannot intersect the box on SOME dimension. */
  def layoutManifest(s: SparkSession, dir: String): DataFrame =
    keyed(s, dir)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
        min(col("ok")).as("min_ok"), max(col("ok")).as("max_ok"),
        min(col("zkey")).as("min_z"), max(col("zkey")).as("max_z"))
      .withColumn("pruned",
        (col("max_pk") < PkLo || col("min_pk") > PkHi ||
         col("max_ok") < OkLo || col("min_ok") > OkHi).cast("int"))

  val layoutManifestSql: String = {
    // same interleave fold as q43's oracle, over the manifest dims
    val zexpr =
      s"""CAST(list_sum(list_transform(generate_series(0, ${MBits - 1}),
         |    i -> (((l_partkey % $m) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i+1))
         |       + (((l_orderkey % $m) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))))
         |  AS BIGINT)""".stripMargin
    s"""WITH keyed AS (
       |  SELECT l_partkey % $m AS pk, l_orderkey % $m AS ok, $zexpr AS zkey
       |  FROM lineitem),
       |b AS (SELECT pk, ok, zkey, zkey // $rangeWidth AS bucket FROM keyed)
       |SELECT bucket, CAST(COUNT(1) AS BIGINT) AS n_rows,
       |       MIN(pk) AS min_pk, MAX(pk) AS max_pk,
       |       MIN(ok) AS min_ok, MAX(ok) AS max_ok,
       |       MIN(zkey) AS min_z, MAX(zkey) AS max_z,
       |       CAST(MAX(pk) < $PkLo OR MIN(pk) > $PkHi
       |         OR MAX(ok) < $OkLo OR MIN(ok) > $OkHi AS INT) AS pruned
       |FROM b GROUP BY bucket""".stripMargin
  }
}
