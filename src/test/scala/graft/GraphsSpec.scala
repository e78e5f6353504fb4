package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graphs

/** Pins the fixed-point PageRank semantics against an independent
  * driver-side re-implementation (Maps + the same integer update), so
  * the distributed join/agg plan is checked — not trusted — on
  * topologies with every structural case: a path (asymmetric degrees),
  * a star (supernode), dangling nodes, and an isolated node.
  */
class GraphsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Reference fixed-point PR: same update, no Spark. */
  private def refPr(nodes: Seq[Long], sym: Seq[(Long, Long)]): Map[Long, Long] = {
    val deg = sym.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    var mass = nodes.map(_ -> Graphs.PrScale).toMap
    for (_ <- 1 to Graphs.PrIters) {
      val pot = nodes.map { u =>
        val d = deg.getOrElse(u, 0L)
        if (d == 0L) mass(u) else mass(u) - d * (mass(u) / d)
      }.sum / n
      val inc = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => mass(u) / deg(u) }.sum
      }
      mass = nodes.map(u => u -> (150000L + (85L * (inc.getOrElse(u, 0L) + pot)) / 100L)).toMap
    }
    mass
  }

  private def run(nodes: Seq[Long], undirected: Seq[(Long, Long)]): Map[Long, Long] = {
    val sym = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = Graphs.pagerankOver(spark, nodes.toDF("doc_id"), sym.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = refPr(nodes, sym)
    assert(got == want)
    got
  }

  test("path + dangling + isolated nodes match the reference update exactly") {
    // 0-1-2-3 path, 4 and 5 isolated (dangling)
    val pr = run(0L to 5L, Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    // symmetry of the path: ends equal, middles equal and higher
    assert(pr(0L) == pr(3L) && pr(1L) == pr(2L) && pr(1L) > pr(0L))
    // dangling nodes sit at the teleport floor, below every path node
    assert(pr(4L) == pr(5L) && pr(4L) < pr(0L))
  }

  test("PR-argmax canonical semantics: hub beats min id on a hand-built star") {
    // two clusters in one corpus-like frame: a star hubbed at 5 (leaves
    // 1..4 — min-id canonical would be 1, centrality canonical is 5)
    // and an isolated pair {8, 9}; doc 7 is a singleton
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L).toDF("doc_id")
    val pairs = Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L), (8L, 9L)).toDF("da", "db")
    val sym = pairs.flatMap { r => val (a, b) = (r.getLong(0), r.getLong(1))
      Seq((a, b), (b, a)) }.toDF("src", "dst")
    val pr = Graphs.pagerankOver(spark, docs, sym)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pr(5L) > pr(1L), "hub must outrank leaves")
    // the gate query composes CC + PR on the minhash graph; pin the
    // argmax semantics on the star: the canonical is the hub
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(col("pr_scaled").desc, col("doc_id"))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (7L, 7L), (8L, 8L), (9L, 8L)).toDF("doc_id", "cluster_id")
    val canon = labels
      .join(pr.toSeq.toDF("doc_id", "pr_scaled"), "doc_id")
      .withColumn("canonical_id", first(col("doc_id")).over(w))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(canon(1L) == 5L && canon(5L) == 5L, "star canonical is the hub, not min id 1")
    assert(canon(7L) == 7L, "singleton is its own canonical")
    assert(canon(8L) == 8L && canon(9L) == 8L, "pair ties on PR, doc_id breaks it")
  }

  test("graphCanonical end-to-end: clusters match dedupCc, canonical is the cluster PR-argmax") {
    import graft.operators.{Dedup, Graphs}
    val dir = "/root/testdata/sf0.001"
    val canon = Graphs.graphCanonical(spark, dir).collect()
    val cc = Dedup.dedupCc(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(canon.length == cc.size, "one row per document")
    // same edge set by construction → identical cluster labels
    canon.foreach { r =>
      assert(r.getAs[Long]("cluster_id") == cc(r.getAs[Long]("doc_id")))
    }
    // exactly one canonical per cluster, and it is the (pr desc, id asc) argmax
    val byCluster = canon.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, rows) =>
      val want = rows.map(r => (r.getAs[Long]("pr_scaled"), r.getAs[Long]("doc_id")))
        .minBy { case (pr, id) => (-pr, id) }._2
      val marked = rows.filter(_.getAs[Int]("is_canonical") == 1).map(_.getAs[Long]("doc_id"))
      assert(marked.toSeq == Seq(want), s"cluster $cid canonical")
      rows.foreach(r => assert(r.getAs[Long]("canonical_id") == want))
      rows.foreach(r => assert(r.getAs[Long]("cluster_size") == rows.length))
    }
    // the whole point: at least one multi-doc cluster exists in the
    // fixture corpus, otherwise this test pins nothing
    assert(byCluster.exists(_._2.length > 1), "fixture has a non-trivial cluster")
  }

  test("star hub outranks its leaves; mass stays ~conserved") {
    val leaves = 1L to 8L
    val pr = run(0L +: leaves, leaves.map(l => (0L, l)))
    assert(leaves.map(pr).distinct.size == 1, "leaves are symmetric")
    assert(pr(0L) > pr(1L), "hub collects 8 shares per round")
    val total = pr.values.sum
    val ideal = 9L * Graphs.PrScale
    // flooring loses at most a few units per node per round
    assert(total <= ideal && total > ideal - 9L * Graphs.PrIters * 100L,
      s"mass $total vs ideal $ideal drifted more than flooring explains")
  }

  /** Reference synchronous LPA: same update, no Spark. */
  private def refLpa(nodes: Seq[Long], sym: Seq[(Long, Long)]): Map[Long, Long] = {
    var labels = nodes.map(u => u -> u).toMap
    for (_ <- 1 to Graphs.LpaIters) {
      val best = sym.groupBy(_._2).map { case (v, es) =>
        val counts = es.groupBy { case (u, _) => labels(u) }
          .map { case (l, g) => (l, g.size) }
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
      labels = nodes.map(u => u -> best.getOrElse(u, labels(u))).toMap
    }
    labels
  }

  private def runLpa(nodes: Seq[Long], undirected: Seq[(Long, Long)]): Map[Long, Long] = {
    val sym = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = Graphs.labelPropagationOver(spark,
        nodes.toDF("doc_id"), sym.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refLpa(nodes, sym)
    assert(got == want, s"LPA labels diverged: got $got want $want")
    got
  }

  test("LPA matches the reference update on cliques, a bridge, and an isolate") {
    // two 4-cliques joined by ONE bridge edge, plus an isolated node:
    // CC would merge the cliques; LPA must keep them distinct
    // communities and leave the isolate alone
    val cliqueA = Seq(1L, 2L, 3L, 4L)
    val cliqueB = Seq(10L, 11L, 12L, 13L)
    def cliqueEdges(vs: Seq[Long]) =
      for (i <- vs.indices; j <- i + 1 until vs.size) yield (vs(i), vs(j))
    val edges = cliqueEdges(cliqueA) ++ cliqueEdges(cliqueB) :+ (4L, 10L)
    val labels = runLpa(cliqueA ++ cliqueB :+ 99L, edges)
    assert(labels(99L) == 99L, "isolated node keeps its own label")
    assert(cliqueA.map(labels).distinct.size == 1, "clique A is one community")
    assert(cliqueB.map(labels).distinct.size == 1, "clique B is one community")
    assert(labels(1L) != labels(11L),
      "one bridge edge must not merge two cliques (that's CC's job)")
  }

  test("LPA is deterministic under partitioning and plurality-correct on a star") {
    // star: all leaves vote the hub's label; the hub adopts the
    // smallest leaf label (all neighbor labels tie at count 1)
    val leaves = 1L to 6L
    val labels = runLpa(0L +: leaves, leaves.map(l => (0L, l)))
    // partition-order invariance: a different layout yields identical labels
    val sym = leaves.flatMap(l => Seq((0L, l), (l, 0L)))
    val again = Graphs.labelPropagationOver(spark,
        (0L +: leaves).toDF("doc_id").repartition(7),
        sym.toDF("src", "dst").repartition(3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == labels)
  }

  test("iterative fixpoints survive injected task failures (retry parity)") {
    // the scale story's resilience leg: a K-round fixpoint whose edge
    // input transiently fails must, under Spark's task retries, land
    // the SAME labels and masses as the clean run — localCheckpoint
    // per round means a retry replays at most one round's lineage.
    val und = (1L to 30L).map(i => (i, 100L + i % 10))
    val nodes = (1L to 30L) ++ (100L to 109L)
    val sym = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    def lpa(edges: org.apache.spark.sql.DataFrame) =
      Graphs.labelPropagationOver(spark, nodes.toDF("doc_id"), edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pr(edges: org.apache.spark.sql.DataFrame) =
      Graphs.pagerankOver(spark, nodes.toDF("doc_id"), edges)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val goldenLpa = lpa(sym.toDF("src", "dst"))
    val goldenPr = pr(sym.toDF("src", "dst"))
    // proof-of-injection must be driver-visible: accumulator updates
    // from FAILED attempts are dropped, so count the RETRY attempts —
    // they only exist because attempt 0 threw
    val fired = spark.sparkContext.longAccumulator("retried-tasks")
    val flakyEdges = sym.toDS().repartition(6).mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() % 2 == 0) {
        if (tc.attemptNumber() == 0)
          throw new RuntimeException("injected transient failure")
        fired.add(1)
      }
      it
    }.toDF("src", "dst")
    assert(lpa(flakyEdges) == goldenLpa, "LPA labels must survive retries")
    assert(pr(flakyEdges) == goldenPr, "PR masses must survive retries")
    assert(fired.value > 0, "the injection must actually have fired")
  }

  test("graphCommunities refines (or equals) connected components on the fixture graph") {
    val dir = "/root/testdata/sf0.001"
    val comm = Graphs.graphCommunities(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same-community nodes must be connected (community ⊆ CC): check on
    // the simhash edge set via union-find over collected pairs
    val pairs = graft.operators.Dedup.dedupSimhashPairs(spark, dir)
      .select(col("da"), col("db")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    comm.groupBy(_._2).values.foreach { members =>
      val roots = members.keys.map(find).toSet
      assert(roots.size == 1,
        s"community spans ${roots.size} connected components")
    }
  }

  test("triangle counts: clique, wedge-only chain, and isolates on a hand-built graph") {
    // K4 on {0..3}: 4 triangles, every member in 3; a path 10-11-12
    // (one wedge, no triangle); a pendant triangle {20,21,22} plus a
    // tail 22-23; isolate 30
    val nodes = (Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L, 22L, 23L, 30L)).toDF("doc_id")
    val pairs = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (11L, 12L),
      (20L, 21L), (20L, 22L), (21L, 22L), (22L, 23L)).toDF("da", "db")
    val got = Graphs.trianglesOver(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L,
      10L -> 0L, 11L -> 0L, 12L -> 0L,
      20L -> 1L, 21L -> 1L, 22L -> 1L, 23L -> 0L, 30L -> 0L)
    assert(got == want)
  }

  test("degree-ordered enumeration matches the naive a<b<c count on the fixture graph") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.operators.Dedup.dedupSimhashPairs(spark, dir)
      .select(col("da"), col("db")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val eset = pairs.toSet
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- pairs; (b2, c) <- pairs if b2 == b && eset((a, c))) {
      naive(a) += 1; naive(b) += 1; naive(c) += 1
    }
    val got = Graphs.graphTriangles(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.filter(_._2 > 0L) == naive.toMap)
    // the near-dup graph on the fixture must actually contain triangles
    // (otherwise this gate pins nothing)
    assert(naive.nonEmpty, "fixture dup graph has no triangles")
  }

  test("jaccard link prediction: planted banding miss found, direct edges and hub-only overlap excluded") {
    // butterfly: 2 and 3 share neighbors {1, 4} but no direct edge ->
    // the planted "missed pair", common=2, J = 2/(2+2-2) = 1.0;
    // 1 and 4 also share {2, 3} with no edge -> symmetric prediction;
    // a hub 50 linked to everything under a tiny cap must contribute
    // NO wedges once its degree exceeds JacMaxCenterDeg (exercised
    // via jaccardOver on a hub wider than the cap)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("da", "db")
    val got = Graphs.jaccardOver(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map((2L, 3L) -> ((2L, 1000000L)), (1L, 4L) -> ((2L, 1000000L))),
      s"butterfly predictions wrong: $got")
    // hub wider than the cap: 0..JacMaxCenterDeg all linked to hub 999
    // only (a star) — no common-neighbor pair may be reported because
    // the only shared neighbor is the over-cap hub
    val star = (0L to Graphs.JacMaxCenterDeg.toLong)
      .map(i => (i, 999L)).toDF("da", "db")
    assert(Graphs.jaccardOver(star).collect().isEmpty,
      "over-cap hub must not generate predictions")
    // one UNDER the cap: the star's leaves all pair through the hub
    val small = (0L until Graphs.JacMinCommon.toLong + 1L)
      .map(i => (i, 999L)).toDF("da", "db")
    assert(Graphs.jaccardOver(small).collect().isEmpty,
      "leaves sharing ONE hub are below JacMinCommon and stay unreported")
  }

  test("bfs: distances, nearest-seed tie-breaks, the round cap, and unreachability") {
    // path 1-2-3-4-5 with seeds at both ends {1, 5}, plus an isolated
    // node 9 and a far chain 10-...-17 seeded only at 10 (length > cap)
    val chain = (10L to 17L).sliding(2).map(p => (p(0), p(1))).toSeq
    val nodes = (1L to 5L) ++ Seq(9L) ++ (10L to 17L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)) ++ chain
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val seeds = Seq(1L, 5L, 10L)
    val got = Graphs.bfsOver(spark, nodes.toDF("doc_id"),
        sym.toDF("src", "dst"), seeds.toDF("doc_id"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    // seeds are distance 0 from themselves
    for (s <- seeds) assert(got(s) == (0L, s, 1), s"seed $s: ${got(s)}")
    // node 3 is equidistant (2) from seeds 1 and 5: smallest seed wins
    assert(got(3L) == (2L, 1L, 1))
    assert(got(2L) == (1L, 1L, 1) && got(4L) == (1L, 5L, 1))
    // the far chain: reached up to the round cap, sentinel beyond it
    for (k <- 1 to Graphs.BfsIters)
      assert(got(10L + k) == (k.toLong, 10L, 1), s"chain node ${10 + k}: ${got(10L + k)}")
    for (id <- (10L + Graphs.BfsIters + 1) to 17L)
      assert(got(id) == (Graphs.BfsInf, -1L, 0), s"beyond-cap node $id: ${got(id)}")
    // isolated non-seed node: unreached
    assert(got(9L) == (Graphs.BfsInf, -1L, 0))
  }

  test("bfs convergence canary: positive on a deeper-than-cap chain, 0 at both fixture SFs") {
    // the far chain again: 7 hops from the only seed with a 5-round cap
    // — one more round WOULD still improve someone, and the canary must
    // say so (this is the failure a silent cap would ship as reached=0)
    val chain = (10L to 17L).sliding(2).map(p => (p(0), p(1))).toSeq
    val sym = chain.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    assert(Graphs.bfsResidual(spark, (10L to 17L).toDF("doc_id"),
      sym.toDF("src", "dst"), Seq(10L).toDF("doc_id")) > 0,
      "a truncated propagation must report a positive residual")
    // the real gate's graph: the fixed round count must reach the true
    // fixpoint at BOTH fixture SFs, so 'unreached' is a verdict, not an
    // artifact — a deeper graph at a new SF fails here loudly
    assert(Graphs.graphBfsResidual(spark, "/root/testdata/sf0.001") == 0L)
    assert(Graphs.graphBfsResidual(spark, "/root/testdata/sf0.01") == 0L)
  }

  test("k-core: cliques survive peeling, chains and pendants peel away") {
    // triangle {1,2,3} with a pendant 4 hanging off 1; a path 10-11-12;
    // an isolated node 20
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L),
      (10L, 11L), (11L, 12L))
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = Graphs.kcoreOver(spark, nodes.toDF("doc_id"), sym.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // the triangle is the 2-core: every member keeps its 2 in-core
    // neighbors (the pendant's removal does not break it)
    assert(got(1L) == (1, 2L) && got(2L) == (1, 2L) && got(3L) == (1, 2L), s"$got")
    // the pendant peels in round 1; the path peels from both ends
    for (id <- Seq(4L, 10L, 11L, 12L, 20L))
      assert(got(id) == (0, 0L), s"node $id must peel: ${got(id)}")
  }
}
