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
    * modest). */
  def salted(big: DataFrame, small: DataFrame,
             bigKey: Column, smallKey: Column, n: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", (rand(seed = 7) * n).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(saltedSmall,
        bigKey === smallKey && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
