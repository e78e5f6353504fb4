package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over corpus-derived graphs.
  *
  * PageRank is THE canonical MapReduce application (named as the
  * motivating workload in Dean & Ghemawat's MapReduce paper and every
  * descendant framework, including the reference's lineage:
  * `/root/reference/6.5840/src/mr/coordinator.go` schedules exactly
  * the map→shuffle→reduce shape one PR iteration needs). Here it runs
  * over the near-duplicate pair graph the dedup family already
  * produces — centrality over the dup graph is how a production
  * pipeline picks the canonical representative of a duplicate cluster
  * (the most-connected copy, not an arbitrary min-id) and how crawl
  * frontiers weight recrawls.
  *
  * Arithmetic is FIXED-POINT INTEGER so the DuckDB oracle matches
  * bit-for-bit (the same discipline as the trained classifier's
  * integer gradients): every node starts with [[PrScale]] units of
  * mass; one round is
  *
  *   share(u)  = mass(u) div deg(u)            (integer floor div)
  *   pot       = (Σ dangling mass + Σ division remainders) div N
  *   mass'(v)  = 150000 + (85 · (Σ_{u→v} share(u) + pot)) div 100
  *
  * i.e. damped PageRank (d = 0.85, teleport 0.15·[[PrScale]]) with the
  * dangling-node mass and the flooring remainders redistributed
  * uniformly — mass is conserved up to the final flooring, and every
  * operation is order-invariant BIGINT arithmetic, so the result is
  * deterministic across engines, partitionings, and retries. Exactly
  * [[PrIters]] rounds run (no convergence test: a fixed round count is
  * what the unrolled-CTE oracle can replay exactly).
  *
  * Scale: per round one shuffle joins the O(N) mass table with the
  * localCheckpointed symmetric edge list on src (map-side partial sums
  * absorb in-degree skew on the dst aggregation — a supernode's
  * contributions combine per-partition before the exchange), plus a
  * broadcast singleton for the dangling pot. State per round is one
  * (doc_id, mass) table, localCheckpointed like [[Dedup.propagateMin]]
  * so lineage stays one round deep. K rounds on a 1000-executor
  * cluster cost K·shuffle(E) — the standard Pregel budget.
  */
object Graphs {

  /** Fixed PageRank round count (unrolled in the oracle). */
  val PrIters = 5

  /** Fixed-point scale: initial per-node mass (1.0 ≡ 1e6). */
  val PrScale = 1000000L

  /** PageRank over an arbitrary node/edge set: `nodes` is (doc_id),
    * `edges` is a SYMMETRIC (src, dst) list with no self-loops or
    * multi-edges (symmetrize one-direction pairs first). Returns
    * (doc_id, out_deg, pr_scaled, pr). */
  def pagerankOver(s: SparkSession, nodes: DataFrame, edges: DataFrame): DataFrame = {
    val nd = nodes.select(col("doc_id")).localCheckpoint()
    val sym = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = nd.count()

    var mass = nd.select(col("doc_id"), lit(PrScale).as("mass")).localCheckpoint()
    for (_ <- 1 to PrIters) {
      val wd = mass.join(deg, col("doc_id") === col("src"), "left")
        .select(col("doc_id"), col("mass"), coalesce(col("deg"), lit(0L)).as("deg"))
      // dangling mass + flooring remainders, redistributed uniformly
      // (integer div throughout — a double division here would round
      // differently from the oracle's `//` near integer boundaries)
      val pot = wd.agg(sum(when(col("deg") === 0L, col("mass"))
          .otherwise(col("mass") - col("deg") * expr("mass div deg"))).as("potsum"))
        .select(expr(s"potsum div ${n}L").cast("long").as("pot"))
      val contrib = wd.where(col("deg") > 0L)
        .select(col("doc_id"), expr("mass div deg").as("share"))
        .join(sym, col("doc_id") === col("src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("inc"))
      mass = nd.join(contrib, col("doc_id") === col("dst"), "left")
        .crossJoin(broadcast(pot))
        .select(col("doc_id"),
          (lit(150000L) +
            expr(s"(85 * (coalesce(inc, 0L) + pot)) div 100").cast("long")).as("mass"))
        .localCheckpoint()
    }
    nd.join(mass, "doc_id")
      .join(deg, col("doc_id") === col("src"), "left")
      .select(col("doc_id"), coalesce(col("deg"), lit(0L)).as("out_deg"),
        col("mass").as("pr_scaled"),
        (col("mass").cast("double") / lit(1e6)).as("pr"))
  }

  /** Gate entry: PageRank over the SimHash near-dup pair graph (the
    * pairs [[Dedup.dedupSimhashPairs]] already verifies, symmetrized).
    * Docs with no near-dup are dangling nodes and settle at the
    * teleport floor; cluster members rank by connectivity. */
  def graphPagerank(s: SparkSession, dir: String): DataFrame =
    pagerankOver(s, graft.Tables.documents(s, dir).select(col("doc_id")),
      Dedup.symmetrize(Dedup.dedupSimhashPairs(s, dir).select(col("da"), col("db"))))

  /** Unrolled-round oracle: the same integer updates as CTE stages
    * r1..r[[PrIters]], seeded from the simhash-pairs oracle. `//` is
    * DuckDB floor division — identical to Spark's `div` on the
    * non-negative masses here. Every chained CTE is `MATERIALIZED`:
    * wd_k is referenced twice (pot_k, con_k), so inlining would
    * re-evaluate r_{k-1} twice per round — a 2^K blow-up of the
    * simhash seed pipeline that turns a sub-second oracle into
    * minutes. */
  lazy val graphPagerankSql: String = {
    val rounds = (1 to PrIters).map { k =>
      val prev = s"r${k - 1}"
      s"""wd$k AS MATERIALIZED (
         |  SELECT r.doc_id, r.mass, COALESCE(d.deg, 0) AS deg
         |  FROM $prev r LEFT JOIN deg d ON r.doc_id = d.src),
         |pot$k AS MATERIALIZED (
         |  SELECT CAST(SUM(CASE WHEN deg = 0 THEN mass
         |                       ELSE mass - deg * (mass // deg) END)
         |              // (SELECT n FROM nn) AS BIGINT) AS pot
         |  FROM wd$k),
         |con$k AS MATERIALIZED (
         |  SELECT e.dst, CAST(SUM(w.mass // w.deg) AS BIGINT) AS inc
         |  FROM wd$k w JOIN sym e ON w.doc_id = e.src
         |  WHERE w.deg > 0 GROUP BY 1),
         |r$k AS MATERIALIZED (
         |  SELECT nd.doc_id,
         |         CAST(150000 + (85 * (COALESCE(c.inc, 0) + (SELECT pot FROM pot$k)))
         |              // 100 AS BIGINT) AS mass
         |  FROM nodes nd LEFT JOIN con$k c ON nd.doc_id = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH shp AS MATERIALIZED (${Dedup.dedupSimhashPairsSql}),
       |sym AS MATERIALIZED (SELECT da AS src, db AS dst FROM shp
       |        UNION ALL SELECT db AS src, da AS dst FROM shp),
       |deg AS MATERIALIZED (SELECT src, CAST(COUNT(1) AS BIGINT) AS deg FROM sym GROUP BY 1),
       |nodes AS MATERIALIZED (SELECT doc_id FROM documents),
       |nn AS MATERIALIZED (SELECT CAST(COUNT(1) AS BIGINT) AS n FROM documents),
       |r0 AS MATERIALIZED (SELECT doc_id, CAST($PrScale AS BIGINT) AS mass FROM nodes),
       |$rounds
       |SELECT nd.doc_id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS out_deg,
       |       r.mass AS pr_scaled, CAST(r.mass AS DOUBLE) / 1e6 AS pr
       |FROM nodes nd
       |JOIN r$PrIters r ON nd.doc_id = r.doc_id
       |LEFT JOIN deg d ON nd.doc_id = d.src""".stripMargin
  }
}
