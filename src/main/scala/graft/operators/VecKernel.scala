package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Primitive-array kernels for embedding math.
  *
  * Catalyst's higher-order functions (zip_with/aggregate) are
  * interpreted, not codegen'd — an all-pairs dot product through them
  * allocates a boxed array per pair and is ~30× slower than a tight
  * loop. Vector scoring is genuine per-partition imperative logic, so
  * these operators broadcast one side as primitive arrays and stream
  * the other through mapPartitions (the standard distributed shape for
  * brute-force scoring: corpus broadcast, probes partitioned).
  *
  * Determinism is preserved exactly: elements are the same ×10⁶-scaled
  * longs, summed in index order.
  */
object VecKernel {

  /** (vec_id ascending, scaled elements), optionally restricted by a
    * predicate PUSHED INTO THE SCAN (shows up as PushedFilters on the
    * parquet source) — callers that need only a subset (e.g. the O(√N)
    * IVF centroid set) must pass it here so driver traffic is the
    * subset, never the corpus. The unfiltered form is broadcastable
    * only for the brute-force baseline: N×dim longs (e.g. 1M vectors ×
    * 64 dims = 512 MB… at that size switch the probe side or shard the
    * corpus; fixture scales are far below). */
  private[operators] def collectScaled(s: SparkSession, dir: String,
                                       where: Option[Column] = None): (Array[Long], Array[Array[Long]]) = {
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val rows = where.fold(base)(base.where(_))
      .collect()
      .map { r =>
        val id = r.getLong(0)
        val arr = r.getSeq[Float](1).toArray
        val ev = new Array[Long](arr.length)
        var i = 0
        while (i < arr.length) { ev(i) = math.round(arr(i).toDouble * 1000000.0); i += 1 }
        (id, ev)
      }
      .sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  private[operators] def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Exact top-k neighbors by dot product for each probe id (probes
    * partitioned, corpus broadcast). Output: (query_id, neighbor_id,
    * dot_scaled, rank 1..k) with (dot desc, neighbor asc) total order. */
  def bruteTopk(s: SparkSession, dir: String, k: Int,
                probeFilter: Long => Boolean): DataFrame = {
    import s.implicits._
    val (ids, vecs) = collectScaled(s, dir)
    val bc = s.sparkContext.broadcast((ids, vecs))
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    Tables.embeddings(s, dir).select(col("vec_id")).as[Long]
      .filter(probeFilter)
      .repartition(nPart)
      .mapPartitions { probes =>
        val (ids, vecs) = bc.value
        val idx = ids.zipWithIndex.toMap
        probes.flatMap { q =>
          val qv = vecs(idx(q))
          // bounded selection: (dot desc, id asc) — k·N, no full sort
          val top = new Array[(Long, Long)](k) // (dot, id), worst last
          var filled = 0
          var j = 0
          while (j < ids.length) {
            if (ids(j) != q) {
              val d = dot(qv, vecs(j))
              val cand = (d, ids(j))
              if (filled < k || better(cand, top(filled - 1))) {
                var p = math.min(filled, k - 1)
                top(p) = cand
                while (p > 0 && better(top(p), top(p - 1))) {
                  val t = top(p); top(p) = top(p - 1); top(p - 1) = t; p -= 1
                }
                if (filled < k) filled += 1
              }
            }
            j += 1
          }
          (0 until filled).map(r => (q, top(r)._2, top(r)._1, r + 1))
        }
      }
      .toDF("query_id", "neighbor_id", "dot_scaled", "rank")
  }

  /** (dot desc, id asc) ordering. */
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sign-bit LSH signatures: for each vector, one H-bit signature long
    * whose bit j is the SIGN of the dot against hyperplane j. Planes
    * are computed from the same integer formula as the oracle SQL. The
    * (bands, bitsPerBand) operating point is NOT baked in here — band
    * keys are sliced out of the signature by
    * [[Similarity.vecBandCandidates]]. Output: (vec_id, sig). */
  def signatures(s: SparkSession, dir: String, h: Int): DataFrame = {
    import s.implicits._
    require(h <= 63, s"signature must fit one long, got h=$h")
    val dim = Tables.embeddings(s, dir).select(size(col("embedding"))).first().getInt(0)
    val planes: Array[Array[Long]] = Array.tabulate(h, dim)((j, i) =>
      ((1103515245L * (j + 1) + 12345L * (i + 1)) % 997L) - 498L)
    val bc = s.sparkContext.broadcast(planes)
    Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val planes = bc.value
        rows.map { case (id, emb) =>
          val ev = new Array[Long](emb.length)
          var i = 0
          while (i < ev.length) { ev(i) = math.round(emb(i).toDouble * 1000000.0); i += 1 }
          var sig = 0L
          var j = 0
          while (j < planes.length) {
            if (dot(ev, planes(j)) >= 0) sig |= (1L << j)
            j += 1
          }
          (id, sig)
        }
      }
      .toDF("vec_id", "sig")
  }

  /** IVF cell assignment + query probes in one pass: each vector's
    * nearest centroid (assignment) and its `nprobe` nearest centroids
    * (probe list), by exact integer dot against a broadcast centroid
    * set. Ties break to the smaller centroid id. Output:
    * (vec_id, cell, probes array). */
  def ivfCells(s: SparkSession, dir: String, nCentroids: Int, nprobe: Int): DataFrame = {
    import s.implicits._
    // only the C = O(√N) centroid rows ever reach the driver — the
    // predicate is pushed into the parquet scan (a full-corpus collect
    // here would be a guaranteed driver OOM at 100× scale)
    val (ids, vecs) = collectScaled(s, dir, Some(col("vec_id") < nCentroids))
    // guard here, not in the tasks: an empty centroid set would
    // otherwise surface as a cryptic NoSuchElementException on
    // ranked.head inside executors after retries
    require(ids.nonEmpty, s"empty centroid set: no vec_id < $nCentroids rows")
    val centroids: Array[(Long, Array[Long])] = ids.zip(vecs)
    val bc = s.sparkContext.broadcast(centroids)
    Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val cents = bc.value
        rows.map { case (id, emb) =>
          val ev = new Array[Long](emb.length)
          var i = 0
          while (i < ev.length) { ev(i) = math.round(emb(i).toDouble * 1000000.0); i += 1 }
          val scored = cents.map { case (cid, cv) => (dot(ev, cv), cid) }
          val ranked = scored.sortBy { case (d, cid) => (-d, cid) }
          (id, ranked.head._2, ranked.take(nprobe).map(_._2).toSeq)
        }
      }
      .toDF("vec_id", "cell", "probes")
  }

  /** IVF-PQ index build in ONE corpus pass: for each vector —
    *  - its coarse cell (nearest of `nCentroids` centroids by exact
    *    integer dot, ties to the smaller id) and its `nprobe` probe
    *    cells (the query-side fan-out),
    *  - its PQ codes (per-subspace exact integer L2 argmin over the
    *    `pqC`-entry codebook, ties to the smaller id) — the M-byte
    *    compressed representation that replaces the vector at scoring
    *    time, and
    *  - its ADC lookup table: lut[m·pqC + c] = ⟨query subvector m,
    *    codebook entry c⟩, so a candidate's approximate dot is M array
    *    reads instead of a dim-length multiply — the whole point of
    *    product quantization at 100 TB (the index stores M bytes/vector;
    *    scoring never touches raw vectors).
    *
    * Both centroid sets are O(√N·dim) / O(pqC·dim) broadcasts read via
    * pushed-down scans; the pass itself is shuffle-free. Output:
    * (vec_id, cell, probes, codes, lut).
    *
    * `where` restricts WHICH vectors are encoded without touching the
    * quantizer: centroids and codebook always come from the
    * training-time prefix, exactly the frozen-quantizer contract an
    * incremental index update needs — the encode kernel (the expensive
    * part: N·(C+pqC)·dim integer dots) runs over batch rows only. The
    * filter sits between scan and kernel; a mod predicate does not
    * reach PushedFilters (verified in the plan), which is fine at gate
    * scale and moot in production, where an arrival batch is its own
    * table/files and needs no predicate at all
    * (see [[Similarity.simIndexUpsert]]). */
  def ivfPqEncode(s: SparkSession, dir: String, nCentroids: Int, nprobe: Int,
                  pqC: Int, pqM: Int, where: Option[Column] = None): DataFrame =
    ivfPqEncodeWith(s, dir, collectQuantizer(s, dir, nCentroids, pqC),
      nprobe, pqC, pqM, where)

  /** The frozen quantizer as driver state: coarse centroids + PQ
    * codebook, collected once. Callers that encode SEVERAL frames
    * under one quantizer (index maintenance: stored side + arrival
    * batch) collect and broadcast it once through
    * [[ivfPqEncodeWith]] instead of paying the two pushed-scan
    * collects per encode call. */
  case class PqQuantizer(cids: Array[Long], cents: Array[Array[Long]],
                         cb: Array[Array[Long]])

  def collectQuantizer(s: SparkSession, dir: String, nCentroids: Int,
      pqC: Int): PqQuantizer = {
    val (cids, cents) = collectScaled(s, dir, Some(col("vec_id") < nCentroids))
    val (cbIds, cb) = collectScaled(s, dir, Some(col("vec_id") < pqC))
    require(cids.nonEmpty, s"empty centroid set: no vec_id < $nCentroids rows")
    // shared with embPq/embPqTrained: one place owns the dense-0-based
    // codebook and subspace-divisibility contract
    KMeans.requirePqCodebook(cbIds, cb)
    PqQuantizer(cids, cents, cb)
  }

  /** [[ivfPqEncode]] under a pre-collected quantizer (one broadcast
    * shared by every caller-side encode pass). */
  def ivfPqEncodeWith(s: SparkSession, dir: String, q: PqQuantizer,
      nprobe: Int, pqC: Int, pqM: Int, where: Option[Column]): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    ivfPqEncodeFrame(where.fold(base)(base.where(_)), q, nprobe, pqC, pqM)
  }

  /** The encode kernel over an ARBITRARY (vec_id, embedding) frame —
    * the entry streaming ingestion uses (a micro-batch of arriving
    * vectors is not a table path); [[ivfPqEncodeWith]] is this over
    * the embeddings-table scan. */
  def ivfPqEncodeFrame(vecs: DataFrame, q: PqQuantizer,
      nprobe: Int, pqC: Int, pqM: Int): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val (cids, cents, cb) = (q.cids, q.cents, q.cb)
    // the divisibility contract checks against KMeans.PqM — pin the
    // parameter to it
    require(pqM == KMeans.PqM, s"pqM ($pqM) must equal KMeans.PqM (${KMeans.PqM})")
    val bc = s.sparkContext.broadcast((cids, cents, cb))
    vecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val (cids, cents, cb) = bc.value
        val dsub = cb(0).length / pqM
        rows.map { case (id, emb) =>
          val ev = new Array[Long](emb.length)
          var i = 0
          while (i < ev.length) { ev(i) = math.round(emb(i).toDouble * 1000000.0); i += 1 }
          val ranked = cents.indices.map(c => (dot(ev, cents(c)), cids(c)))
            .sortBy { case (d, cid) => (-d, cid) }
          val codes = new Array[Int](pqM)
          var m = 0
          while (m < pqM) {
            // shared L2-argmin kernel — same strict-< smaller-id tie
            // rule as embPq/embPqTrained, owned in one place
            codes(m) = KMeans.bestPqCell(ev, cb, m, dsub)._1
            m += 1
          }
          val lut = new Array[Long](pqM * pqC)
          m = 0
          while (m < pqM) {
            var c = 0
            while (c < pqC) {
              var d = 0L; var k = m * dsub; val end = (m + 1) * dsub
              while (k < end) { d += ev(k) * cb(c)(k); k += 1 }
              lut(m * pqC + c) = d; c += 1
            }
            m += 1
          }
          (id, ranked.head._2, ranked.take(nprobe).map(_._2), codes.toSeq, lut.toSeq)
        }
      }
      .toDF("vec_id", "cell", "probes", "codes", "lut")
  }

  /** Scan size (bytes, from catalog/file statistics) up to which the
    * scaled-embedding table is broadcast in [[pairDots]]: 64 MB of
    * float32 parquet ≈ 200k × 64-dim vectors ≈ 100 MB of scaled longs
    * in memory, comfortably inside executor memory. */
  private val BroadcastVecBytes = 64L << 20

  /** Exact dots for an explicit candidate-pair frame: joins the scaled
    * vectors to both pair sides and scores with the codegen'd
    * [[graft.functions.DotProductI64]] expression — a pure declarative
    * plan, no driver-side vector collection, so it scales to corpora
    * that don't fit on the driver.
    *
    * The vector table is ~0.5 KB/row, far above the 10 MB
    * auto-broadcast threshold long before the corpus is actually big —
    * and letting it default to a shuffle join moves (pairs × 1 KB) over
    * the network (the 10× rehearsal measured 55 s for 11M candidate
    * pairs). Below [[BroadcastVecBytes]] of scan we force a broadcast
    * hash join (candidate pairs stream against an in-memory map, zero
    * pair shuffle); above it, the shuffle join is genuinely the right
    * plan (per-side data exceeds executor memory). The decision reads
    * plan STATISTICS (file sizes) — an earlier version ran a count()
    * action at DataFrame-construction time, which forced a full table
    * scan even on plan-only paths like explain(). */
  def pairDots(s: SparkSession, dir: String, pairs: DataFrame): DataFrame = {
    graft.functions.DotProductI64.register(s)
    val e = Tables.embeddings(s, dir).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * lit(1000000.0)).cast("long")).as("ev"))
    val scanBytes = Tables.embeddings(s, dir)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val ej = if (scanBytes <= BroadcastVecBytes) broadcast(e) else e
    pairs
      .join(ej.as("ea"), col("query_id") === col("ea.vec_id"))
      .join(ej.as("eb"), col("neighbor_id") === col("eb.vec_id"))
      .selectExpr("query_id", "neighbor_id",
        "dot_i64(ea.ev, eb.ev) as dot_scaled")
  }
}
