package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** MANIFEST-DRIVEN FILE SKIPPING as a Catalyst optimizer rule — the
  * piece that turns [[Manifest]]'s stats table from an oracle-checked
  * RESULT into live planner behavior, the way Delta/Iceberg data
  * skipping actually works: a filter over a z-laid-out table is
  * rewritten to also constrain the PARTITION column (`bucket IN
  * (survivors)`), and Spark's own partition pruning then never lists,
  * opens, or schedules the pruned directories. This is the correct
  * altitude for the extension — we inject a provably-implied predicate
  * and let FileSourceStrategy do the actual skipping, rather than
  * rebuilding a parquet reader.
  *
  * Safety argument (why the rewrite can never change results): bounds
  * are extracted only from TOP-LEVEL conjuncts of the filter that
  * literally compare a manifest dimension column with a literal, and a
  * bucket is pruned only when its stored [min, max] envelope is
  * PROVABLY DISJOINT from those bounds on some dimension — rows in a
  * pruned bucket cannot satisfy the filter. Anything the extractor
  * does not understand (ORs, casts, expressions over the dim) simply
  * contributes no bound, which can only keep more buckets. The rule
  * skips plans whose filter already references the bucket column, so
  * the fixpoint optimizer cannot re-inject.
  *
  * At 100 TB: the manifest is B·dims rows (B = file count — the table
  * every planner holds), cached on the driver per layout root; the
  * envelope test is O(B·dims) per query, and the reward is skipping
  * full partition DIRECTORIES — I/O, listing, and task scheduling —
  * exactly like a Delta OPTIMIZE ZORDER table under a box predicate.
  * ZPruneSpec measures it: the scan's numFiles metric drops to the
  * surviving buckets, with results bit-identical to the full scan.
  *
  * Wiring: [[graft.functions.GraftExtensions]] injects the rule at
  * session build; [[ZPrune.attach]] also adds it to
  * `spark.experimental.extraOptimizations` so driver-built sessions
  * get it at runtime. Both paths are idempotent.
  */
object ZPrune {

  /** Bits per manifest dimension — ONE constant with [[Manifest]] (the
    * gate evaluates Manifest's box against this layout, so a drift
    * between the two would quietly change the measured domain). */
  val MBits: Int = Manifest.MBits

  /** Per-bucket envelopes of one layout root: dim → (lo, hi). */
  private[sources] case class BucketEnv(bucket: Long, lo: Map[String, Long],
    hi: Map[String, Long])

  /** `bloomDim`/`blooms`: optional MEMBERSHIP half of the manifest —
    * one [[graft.functions.BloomAgg]] bitmap per bucket over a key
    * column, consulted for `key = v` / `key IN (...)` conjuncts that
    * min-max envelopes cannot skip (a key uniform across buckets has a
    * vacuous envelope everywhere). */
  private[sources] case class Layout(dims: Seq[String], envs: Seq[BucketEnv],
    bloomDim: Option[String] = None,
    blooms: Map[Long, IndexedSeq[Long]] = Map.empty)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Layout]()

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  /** Write `df` as a z-range-bucketed layout under `dir` (partition
    * dirs `bucket=N`, z-sorted within each) plus the stats manifest at
    * `_graft_manifest` (underscore-prefixed: invisible to Spark's file
    * listing, the `_SUCCESS` convention). `dimA`/`dimB` must be
    * non-negative columns < 2^[[MBits]]. */
  private[sources] def isIntegral(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  def writeLayout(df: DataFrame, dir: String, dimA: String, dimB: String,
      buckets: Int, bloomCol: Option[String] = None): Unit = {
    // INTEGRAL dims only: the rule's strict-inequality bound arithmetic
    // (`> v` → lower bound v+1) and the manifest's long envelopes are
    // both unsound on fractional values (a DOUBLE pk in (16, 17) would
    // round into an envelope that `pk > 16` then wrongly prunes)
    Seq(dimA, dimB).foreach { d =>
      require(isIntegral(df.schema(d).dataType),
        s"z-layout dims must be integral; $d is ${df.schema(d).dataType}")
    }
    // a re-written layout invalidates any previously-attached manifest:
    // stale envelopes would misprune the NEW data silently
    registry.remove(norm(dir))
    val m = 1L << MBits
    val width = math.max((m * m) / buckets, 1L)
    val keyed = df
      .withColumn("_z", ZOrder.zkey(col(dimA), col(dimB)))
      .withColumn("bucket", expr(s"_z div $width"))
    keyed
      .repartition(col("bucket"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(dir)
    val manifest = keyed.groupBy(col("bucket"))
      .agg(min(col(dimA)).as("lo_a"), max(col(dimA)).as("hi_a"),
        min(col(dimB)).as("lo_b"), max(col(dimB)).as("hi_b"))
      .select(col("bucket").cast("long"),
        explode(array(
          struct(lit(dimA).as("dim"), col("lo_a").cast("long").as("lo"),
            col("hi_a").cast("long").as("hi")),
          struct(lit(dimB).as("dim"), col("lo_b").cast("long").as("lo"),
            col("hi_b").cast("long").as("hi")))).as("e"))
      .select(col("bucket"), col("e.dim"), col("e.lo"), col("e.hi"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/_graft_manifest")
    bloomCol.foreach { bc =>
      require(isIntegral(df.schema(bc).dataType),
        s"bloom column must be integral; $bc is ${df.schema(bc).dataType}")
      val bloomUdaf = udaf(new graft.functions.BloomAgg)
      keyed.groupBy(col("bucket"))
        .agg(bloomUdaf(col(bc).cast("long")).as("words"))
        .select(col("bucket").cast("long"), lit(bc).as("dim"), col("words"))
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/_graft_bloom")
    }
  }

  /** Load `dir`'s manifest into the driver-side registry and make sure
    * the rule is active on `spark` (runtime injection via
    * `experimental.extraOptimizations` — idempotent). */
  def attach(spark: SparkSession, dir: String): Unit = {
    val rows = spark.read.parquet(s"$dir/_graft_manifest").collect()
    val dims = rows.map(_.getString(1)).distinct.toSeq.sorted
    val envs = rows.groupBy(_.getLong(0)).map { case (b, rs) =>
      BucketEnv(b,
        rs.map(r => r.getString(1) -> r.getLong(2)).toMap,
        rs.map(r => r.getString(1) -> r.getLong(3)).toMap)
    }.toSeq
    // the membership half is optional — present only when the layout
    // was written with a bloom column
    val bloomRows =
      if (new java.io.File(s"${norm(dir)}/_graft_bloom").exists())
        spark.read.parquet(s"$dir/_graft_bloom").collect()
      else Array.empty[org.apache.spark.sql.Row]
    val bloomDim = bloomRows.headOption.map(_.getString(1))
    val blooms = bloomRows.map { r =>
      r.getLong(0) -> r.getSeq[Long](2).toIndexedSeq
    }.toMap
    registry.put(norm(dir), Layout(dims, envs, bloomDim, blooms))
    val rule = new ZPruneRule(spark)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[ZPruneRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }

  private[sources] def layoutFor(rootPaths: Seq[org.apache.hadoop.fs.Path]): Option[Layout] =
    rootPaths.flatMap(p => Option(registry.get(norm(p.toString)))).headOption

  // ------------------------------------------------ layout_prune_scan
  /** Gate box predicate (the [[Manifest]] box) and bucket count. */
  val GateBuckets = 16

  /** Gate: build the z-range layout from lineitem, attach the rule,
    * and answer the box query THROUGH the pruned scan — the result
    * must equal the oracle's plain relational evaluation over the
    * source table, proving the injected partition filter is invisible
    * to semantics while ZPruneSpec separately proves it skips files.
    * The `bucket` column rides along so the layout assignment itself
    * is hash-checked (the oracle recomputes the interleave). */
  def layoutPruneScan(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val m = 1L << MBits
    val out = java.nio.file.Files.createTempDirectory("graft-zprune-gate").toString
    val df = graft.Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr(s"l_partkey % $m").as("pk"), expr(s"l_orderkey % $m").as("ok"))
    writeLayout(df, out, "pk", "ok", GateBuckets)
    attach(s, out)
    val result = s.read.parquet(out)
      .where(col("pk") >= Manifest.PkLo && col("pk") <= Manifest.PkHi &&
        col("ok") >= Manifest.OkLo && col("ok") <= Manifest.OkHi)
      .select(col("l_orderkey"), col("l_linenumber"), col("pk"), col("ok"),
        col("bucket").cast("long").as("bucket"))
    // the box result is bounded (~box-fraction of lineitem): materialize
    // it so the scratch layout and its registry entry can be reclaimed
    // NOW — a bench loop re-invoking this gate must not accumulate
    // layout copies under /tmp or envelopes on the driver
    val rows = result.collect()
    val materialized = s.createDataFrame(
      s.sparkContext.parallelize(rows.toIndexedSeq, 1), result.schema)
    registry.remove(norm(out))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    materialized
  }

  /** Plain relational twin — no layout, no rule: the same box over the
    * source rows with the bucket recomputed from the interleave. */
  val layoutPruneScanSql: String = {
    val m = 1L << MBits
    val width = math.max((m * m) / GateBuckets, 1L)
    val zexpr =
      s"""CAST(list_sum(list_transform(generate_series(0, ${MBits - 1}),
         |    i -> (((l_partkey % $m) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i+1))
         |       + (((l_orderkey % $m) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))))
         |  AS BIGINT)""".stripMargin
    s"""WITH keyed AS (
       |  SELECT l_orderkey, l_linenumber,
       |         l_partkey % $m AS pk, l_orderkey % $m AS ok,
       |         $zexpr // $width AS bucket
       |  FROM lineitem)
       |SELECT l_orderkey, l_linenumber, pk, ok, bucket
       |FROM keyed
       |WHERE pk >= ${Manifest.PkLo} AND pk <= ${Manifest.PkHi}
       |  AND ok >= ${Manifest.OkLo} AND ok <= ${Manifest.OkHi}""".stripMargin
  }
  // ------------------------------------------------ layout_bloom_scan
  /** The point key the bloom gate looks up (present at every fixture
    * SF; 3–7 lineitem rows). */
  val BloomKey = 7L

  /** Bloom-gate bucket count — finer than the box gate's so the
    * membership skip is visible at fixture scale. */
  val BloomBuckets = 64

  /** Gate: MEMBERSHIP data skipping — the case min-max envelopes
    * cannot touch. The layout's z dims are (l_suppkey mod 2^MBits,
    * l_partkey mod 2^MBits), so l_orderkey is UNIFORM across buckets:
    * every bucket's orderkey envelope spans the whole domain and a
    * point predicate `l_orderkey = K` prunes NOTHING by range. The
    * layout therefore stores one [[graft.functions.BloomAgg]] bitmap
    * per bucket over l_orderkey, and the rule consults it for
    * EqualTo/In conjuncts: only buckets that might contain K are
    * scanned (ZPruneSpec measures numFiles dropping to the true
    * buckets plus the sketch's small false-positive tail). The result
    * rides through the pruned scan and must equal the oracle's plain
    * filter — the skip must be semantically invisible.
    *
    * 100-TB shape: bitmaps are 4 KiB per file regardless of file size
    * (fixed-state mergeable aggregate, map-side combined), the probe
    * is O(files) driver work, and the reward is skipping every file
    * that provably lacks the key — Delta's bloom index / Parquet
    * column blooms, surfaced as an oracle-checked operator. */
  def layoutBloomScan(s: SparkSession, dir: String): DataFrame = {
    val m = 1L << MBits
    val out = java.nio.file.Files.createTempDirectory("graft-bloom-gate").toString
    val df = graft.Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr(s"l_suppkey % $m").as("sd"), expr(s"l_partkey % $m").as("pd"))
    writeLayout(df, out, "sd", "pd", BloomBuckets, bloomCol = Some("l_orderkey"))
    attach(s, out)
    val result = s.read.parquet(out)
      .where(col("l_orderkey") === BloomKey)
      .select(col("l_orderkey"), col("l_linenumber"), col("sd"), col("pd"),
        col("bucket").cast("long").as("bucket"))
    // bounded output (one order's lineitems): materialize, then reclaim
    // the scratch layout and its driver-side envelopes immediately
    val rows = result.collect()
    val materialized = s.createDataFrame(
      s.sparkContext.parallelize(rows.toIndexedSeq, 1), result.schema)
    registry.remove(norm(out))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    materialized
  }

  /** Plain relational twin — the same point lookup with the bucket
    * recomputed from the interleave; pruning must be invisible. */
  val layoutBloomScanSql: String = {
    val m = 1L << MBits
    val width = math.max((m * m) / BloomBuckets, 1L)
    val zexpr =
      s"""CAST(list_sum(list_transform(generate_series(0, ${MBits - 1}),
         |    i -> (((l_suppkey % $m) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i+1))
         |       + (((l_partkey % $m) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))))
         |  AS BIGINT)""".stripMargin
    s"""WITH keyed AS (
       |  SELECT l_orderkey, l_linenumber,
       |         l_suppkey % $m AS sd, l_partkey % $m AS pd,
       |         $zexpr // $width AS bucket
       |  FROM lineitem)
       |SELECT l_orderkey, l_linenumber, sd, pd, bucket
       |FROM keyed WHERE l_orderkey = $BloomKey""".stripMargin
  }
}

/** The rule. Matches `Filter(cond, relation-over-registered-layout)`,
  * extracts conservative per-dimension bounds from cond's top-level
  * conjuncts, and ANDs `bucket IN (surviving buckets)` when that
  * provably removes at least one bucket. */
class ZPruneRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    case other      => Seq(other)
  }

  private def longOf(l: Literal): Option[Long] = l.value match {
    case n: java.lang.Number => Some(n.longValue())
    case _                   => None
  }

  /** (dim → lower bound, dim → upper bound) from literal comparisons. */
  private def bounds(cs: Seq[Expression], dims0: Set[String])
      : (Map[String, Long], Map[String, Long]) = {
    // defense in depth on top of writeLayout's integral-dims contract:
    // the ±1 strict-bound arithmetic is only sound on integral columns,
    // so a comparison over a non-integral attribute (or a non-integral
    // literal, e.g. `pk > 16.5`) contributes no bound — which can only
    // keep MORE buckets, never prune a matching row
    def dims(a: Attribute): Boolean =
      dims0(a.name) && ZPrune.isIntegral(a.dataType)
    def longOfIntegral(l: Literal): Option[Long] =
      if (ZPrune.isIntegral(l.dataType)) longOf(l) else None
    var lo = Map.empty[String, Long]
    var hi = Map.empty[String, Long]
    def tightenLo(d: String, v: Long): Unit =
      lo = lo.updated(d, lo.get(d).fold(v)(math.max(_, v)))
    def tightenHi(d: String, v: Long): Unit =
      hi = hi.updated(d, hi.get(d).fold(v)(math.min(_, v)))
    cs.foreach {
      case GreaterThanOrEqual(a: Attribute, l: Literal) if dims(a) =>
        longOfIntegral(l).foreach(tightenLo(a.name, _))
      case GreaterThan(a: Attribute, l: Literal) if dims(a) =>
        longOfIntegral(l).foreach(v => tightenLo(a.name, v + 1))
      case LessThanOrEqual(a: Attribute, l: Literal) if dims(a) =>
        longOfIntegral(l).foreach(tightenHi(a.name, _))
      case LessThan(a: Attribute, l: Literal) if dims(a) =>
        longOfIntegral(l).foreach(v => tightenHi(a.name, v - 1))
      case EqualTo(a: Attribute, l: Literal) if dims(a) =>
        longOfIntegral(l).foreach { v => tightenLo(a.name, v); tightenHi(a.name, v) }
      // literal-on-the-left mirrors
      case GreaterThanOrEqual(l: Literal, a: Attribute) if dims(a) =>
        longOfIntegral(l).foreach(tightenHi(a.name, _))
      case GreaterThan(l: Literal, a: Attribute) if dims(a) =>
        longOfIntegral(l).foreach(v => tightenHi(a.name, v - 1))
      case LessThanOrEqual(l: Literal, a: Attribute) if dims(a) =>
        longOfIntegral(l).foreach(tightenLo(a.name, _))
      case LessThan(l: Literal, a: Attribute) if dims(a) =>
        longOfIntegral(l).foreach(v => tightenLo(a.name, v + 1))
      case EqualTo(l: Literal, a: Attribute) if dims(a) =>
        longOfIntegral(l).foreach { v => tightenLo(a.name, v); tightenHi(a.name, v) }
      case _ => () // not understood → contributes no bound (safe)
    }
    (lo, hi)
  }

  /** Point-lookup probe sets for the layout's bloom column: one entry
    * per understood conjunct; a bucket survives a conjunct when ANY of
    * its candidate values might be contained (so `key IN (a,b)` keeps
    * a bucket that might hold either). A conjunct with a non-integral
    * value or a non-literal member contributes NO probe — which can
    * only keep more buckets, the same conservative stance as
    * [[bounds]]. */
  private def bloomProbes(cs: Seq[Expression], layout: ZPrune.Layout)
      : Seq[Seq[Long]] = layout.bloomDim match {
    case None => Nil
    case Some(bd) =>
      def ok(a: Attribute) = a.name == bd && ZPrune.isIntegral(a.dataType)
      def v(l: Literal): Option[Long] =
        if (ZPrune.isIntegral(l.dataType)) longOf(l) else None
      cs.flatMap {
        case EqualTo(a: Attribute, l: Literal) if ok(a) => v(l).map(Seq(_))
        case EqualTo(l: Literal, a: Attribute) if ok(a) => v(l).map(Seq(_))
        case In(a: Attribute, ls) if ok(a) && ls.nonEmpty =>
          val vs = ls.collect { case l: Literal => v(l) }
          if (vs.size == ls.size && vs.forall(_.isDefined)) Some(vs.flatten)
          else None
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)) =>
      ZPrune.layoutFor(fs.location.rootPaths) match {
        case Some(layout) =>
          val bucketAttr = rel.output.find(_.name == "bucket")
          val alreadyConstrained =
            cond.references.exists(_.name == "bucket")
          if (bucketAttr.isEmpty || alreadyConstrained) f
          else {
            val cs = conjuncts(cond)
            val (lo, hi) = bounds(cs, layout.dims.toSet)
            val probes = bloomProbes(cs, layout)
            if (lo.isEmpty && hi.isEmpty && probes.isEmpty) f
            else {
              val survivors = layout.envs.filter { e =>
                !layout.dims.exists { d =>
                  hi.get(d).exists(_ < e.lo(d)) || lo.get(d).exists(_ > e.hi(d))
                }
              }.map(_.bucket).filter { b =>
                // a bucket with no stored bitmap is KEPT (safe), and a
                // false positive only keeps a bucket — never skips one
                probes.forall(vs => layout.blooms.get(b).forall(words =>
                  vs.exists(graft.functions.BloomAgg.mightContain(words, _))))
              }.sorted
              if (survivors.size >= layout.envs.size) f
              else {
                val attr = bucketAttr.get
                val lits = survivors.map { b =>
                  val v: Any = attr.dataType match {
                    case org.apache.spark.sql.types.IntegerType => b.toInt
                    case _                                      => b
                  }
                  Literal.create(v, attr.dataType).asInstanceOf[Expression]
                }
                Filter(CAnd(cond, In(attr, lits)), rel)
              }
            }
          }
        case None => f
      }
  }
}
