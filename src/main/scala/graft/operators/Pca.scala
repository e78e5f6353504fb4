package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Top-principal-direction extraction over the embedding corpus —
  * integer fixed-point POWER ITERATION, the whitening/decorrelation
  * primitive a semantic-dedup or ANN pipeline runs before quantizing
  * (PQ distortion concentrates along the dominant axis; projecting it
  * out is the standard pre-rotation). All arithmetic is integer so the
  * projections hash-check cross-engine — the same discipline as
  * [[KMeans.embKmeans]]'s integer Lloyd rounds.
  *
  * Method: embeddings quantize to the established ×10⁶ integer kernel
  * (the [[VecKernel]] scale), truncation-divided to ×10³ so the Gram
  * aggregation stays far inside Int64 (|e₃| ≤ 10³ ⇒ a Gram cell ≤
  * 10⁶·N; the round-update product then carries ≤ d·10⁶·N·[[PcaNorm]]
  * ≈ 2^63/300 even at N = 10⁸). The d×d Gram is ONE map-side-combined
  * aggregation (the only corpus pass); [[PcaRounds]] power-iteration
  * rounds then run on the DRIVER over the collected d² longs — O(d²)
  * work per round, no cluster round-trips, the [[KMeans]] "driver
  * holds C×dim, corpus holds the data" split. Each round renormalizes
  * the iterate to max-abs [[PcaNorm]] by truncating integer division
  * (sign-folded so Spark's `div`, Scala's `/`, and the oracle's
  * CASE-wrapped `//` agree on negatives). The final pass projects
  * every embedding onto the fixed-point direction — a broadcast
  * literal, zero corpus shuffle.
  *
  * Scale note: beyond ~10⁸ rows the Gram cells themselves approach
  * Int64; production trains the direction on a bounded sample (the
  * [[KMeans.embPqTrained]] codebook discipline) and only the cheap
  * projection pass touches the full corpus.
  *
  * Oracle: the DuckDB twin replays the identical integer arithmetic —
  * Gram via an element self-join, each round an unrolled CTE pair
  * (matrix-vector product + renormalization), projection at the end —
  * so the gate hash-checks every projection value exactly.
  */
object Pca {

  /** Per-round renormalization target (max-abs of the iterate). */
  val PcaNorm = 1024L
  /** Fixed round count — the oracle unrolls exactly this many. */
  val PcaRounds = 6

  /** ×10³ element stream: (vec_id, i, e3), derived from the ×10⁶
    * kernel by truncating division (NOT a fresh float rounding, so it
    * can never disagree with the established quantization). */
  private def elems(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint) div 1000)")))
      .toDF("vec_id", "i", "e3")

  /** Driver-side truncating division (Scala `/` truncates; named for
    * symmetry with the oracle's sign-folded floor-div). */
  private def truncDiv(a: Long, b: Long): Long = a / b

  def embPca(s: SparkSession, dir: String): DataFrame = {
    val el = elems(s, dir)
    // ONE corpus pass: each partition accumulates its LOCAL d×d outer-
    // product sum in a flat long array and emits d² rows at the end —
    // the [[KMeans.embKmeans]] contrib idiom. (A first cut expressed
    // this as inline(flatten(transform(...))) over nested lambdas;
    // Catalyst evaluates the inner quantization lambda per OUTER index,
    // a d× blow-up that benched 7.5 s vs ~1 s for this shape.)
    import s.implicits._
    val gramRows = Tables.embeddings(s, dir)
      .select(col("embedding")).as[Seq[Float]]
      .mapPartitions { rows =>
        var acc: Array[Long] = null
        var d = 0
        rows.foreach { emb =>
          if (acc == null) { d = emb.length; acc = new Array[Long](d * d) }
          val ev = new Array[Long](d)
          var i = 0
          while (i < d) { ev(i) = math.round(emb(i).toDouble * 1000000.0) / 1000L; i += 1 }
          i = 0
          while (i < d) {
            var j = 0
            val evi = ev(i)
            while (j < d) { acc(i * d + j) += evi * ev(j); j += 1 }
            i += 1
          }
        }
        if (acc == null) Iterator.empty
        else {
          val dd = d
          (0 until dd * dd).iterator.map(k => (k / dd, k % dd, acc(k)))
        }
      }
      .toDF("i", "j", "p")
      .groupBy(col("i"), col("j")).agg(sum(col("p")).as("g"))
      .collect()
    val d = gramRows.map(_.getInt(0)).max + 1
    val g = Array.ofDim[Long](d, d)
    gramRows.foreach(r => g(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    // power iteration on the driver, integer fixed-point throughout
    var v = Array.fill(d)(PcaNorm)
    for (_ <- 1 to PcaRounds) {
      val u = Array.tabulate(d)(i => {
        var acc = 0L; var j = 0
        while (j < d) { acc += g(i)(j) * v(j); j += 1 }
        acc
      })
      val m = math.max(u.map(math.abs).max, 1L)
      v = u.map(x =>
        if (x >= 0) truncDiv(x * PcaNorm, m) else -truncDiv(-x * PcaNorm, m))
    }
    // projection pass: broadcast the d-long direction as a literal
    val vMap = v.zipWithIndex.map { case (x, i) => i -> x }.toMap
    el.select(col("vec_id"),
        (col("e3") * element_at(typedLit(vMap), col("i"))).as("c"))
      .groupBy(col("vec_id")).agg(sum(col("c")).as("proj"))
  }

  /** The identical arithmetic unrolled: Gram by element self-join,
    * [[PcaRounds]] CTE pairs, sign-folded truncating division. */
  val embPcaSql: String = {
    val rounds = (1 to PcaRounds).map { k =>
      val prev = s"v${k - 1}"
      s"""u$k AS (SELECT g.i AS i, CAST(SUM(g.g * $prev.v) AS BIGINT) AS u
         |        FROM g JOIN $prev ON g.j = $prev.i GROUP BY 1),
         |m$k AS (SELECT GREATEST(MAX(ABS(u)), 1) AS m FROM u$k),
         |v$k AS (SELECT i, CAST(CASE WHEN u >= 0 THEN (u * $PcaNorm) // m
         |                            ELSE -(((-u) * $PcaNorm) // m) END AS BIGINT) AS v
         |        FROM u$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH el AS (
       |  SELECT vec_id, i,
       |         CASE WHEN e6 >= 0 THEN e6 // 1000 ELSE -((-e6) // 1000) END AS e3
       |  FROM (
       |    SELECT vec_id, t.i AS i,
       |           CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000) AS BIGINT) AS e6
       |    FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t)),
       |g AS (SELECT a.i AS i, b.i AS j, CAST(SUM(a.e3 * b.e3) AS BIGINT) AS g
       |      FROM el a JOIN el b USING (vec_id) GROUP BY 1, 2),
       |v0 AS (SELECT DISTINCT i, CAST($PcaNorm AS BIGINT) AS v FROM el),
       |$rounds
       |SELECT el.vec_id, CAST(SUM(el.e3 * vr.v) AS BIGINT) AS proj
       |FROM el JOIN v$PcaRounds vr ON el.i = vr.i
       |GROUP BY 1""".stripMargin
  }
}
