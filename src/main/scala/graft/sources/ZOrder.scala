package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — multi-dimensional row-group pruning,
  * the lakehouse answer to "my queries filter on TWO columns". A 1-D
  * sort-on-write (SourcesSpec's zone-map layout) gives perfect min-max
  * envelopes on the sort column and NONE on any other; interleaving the
  * bits of two key columns makes every contiguous z-range a bounded box
  * in BOTH dimensions, so each sorted file's min-max envelope constrains
  * both predicates at once — either-dimension filters skip row groups
  * (partially), instead of one dimension pruning perfectly and the
  * other scanning everything. The trade is quantified in SourcesSpec:
  * box/single-dimension queries over a z-sorted layout decode a
  * fraction ~sqrt of the 1-D case on the non-sort dimension.
  *
  * The key is a pure per-row integer expression (32 shift/mask terms,
  * whole-stage-codegen friendly — no UDF), so it also hash-checks
  * against a DuckDB replay; at 100 TB you compute it once at write
  * time: `df.repartitionByRange(N, zkey).sortWithinPartitions(zkey)
  * .write.parquet(...)`, exactly the sort-on-write recipe with z for
  * the sort column.
  */
object ZOrder {

  /** Bits interleaved per dimension (values must fit: v < 2^ZBits). */
  val ZBits = 16

  /** Morton key of two non-negative longs' low [[ZBits]] bits — `a`'s
    * bits land at odd positions, `b`'s at even. */
  def zkey(a: Column, b: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** Gate: the z-key over (l_partkey, l_suppkey) mod 2^[[ZBits]] for
    * every lineitem row — pins the interleave arithmetic cross-engine
    * (the layout benefit itself is measured in SourcesSpec, where scan
    * counters exist). */
  def q43ZOrder(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      zkey(expr(s"l_partkey % ${1 << ZBits}"), expr(s"l_suppkey % ${1 << ZBits}"))
        .as("zkey"))

  /** The same interleave as a per-row list fold in DuckDB. */
  val q43ZOrderSql: String = {
    val m = 1 << ZBits
    s"""SELECT l_orderkey, l_linenumber,
       |  CAST(list_sum(list_transform(generate_series(0, ${ZBits - 1}),
       |    i -> (((l_partkey % $m) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i+1))
       |       + (((l_suppkey % $m) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))))
       |    AS BIGINT) AS zkey
       |FROM lineitem""".stripMargin
  }
}
