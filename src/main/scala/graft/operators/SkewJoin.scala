package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A shuffle join puts every row of one key into one partition; a hot
  * key (a few % of 100 TB) turns into one straggler task. AQE's skew
  * split handles sort-merge joins it can see; this utility is the
  * explicit form for when you know the skew: the big side gets a random
  * salt in [0, n), the small side is replicated n ways, and the join
  * key becomes (key, salt) — spreading each hot key over n tasks.
  *
  * Result equality with the unsalted join is exact (spec-verified);
  * only the partitioning changes.
  */
object SkewJoin {

  /** Inner-join `big ⋈ small` on `bigKey === smallKey`, salted `n`
    * ways. `small` is replicated n× (keep it broadcast-small or n
    * modest).
    *
    * The salt is `pmod(hash(<all big columns>), n)` — a pure function
    * of the row, so it is stable under repartitioning, input reordering
    * and task retry (a `rand`-based salt depends on upstream partition
    * layout: a retried or differently-partitioned run would re-salt
    * rows differently, which breaks any downstream logic keyed on the
    * physical distribution and makes runs non-reproducible). Hashing
    * the whole row (not just the key — every row of a hot key shares
    * the key's hash!) spreads a hot key across salts; only fully
    * identical rows co-locate, which is the floor any deterministic
    * scheme has. */
  /** The deterministic per-row salt in [0, n). */
  private[graft] def saltCol(df: DataFrame, n: Int): Column =
    pmod(hash(df.columns.map(df(_)).toIndexedSeq: _*), lit(n))

  def salted(big: DataFrame, small: DataFrame,
             bigKey: Column, smallKey: Column, n: Int): DataFrame = {
    // withColumn would silently OVERWRITE a caller's __salt column and
    // the final drop would then remove the caller's data from the
    // output — refuse loudly instead
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "salted(): inputs must not already contain a __salt column")
    val saltedBig = big.withColumn("__salt", saltCol(big, n))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(saltedSmall,
        bigKey === smallKey && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
