package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** 10× scale rehearsal: replicates the sf0.1 fixtures with shifted keys
  * into a scratch directory (≈6M lineitem rows, 50k docs/vectors, 1M
  * events) and times the headline operators there. The point is not the
  * absolute numbers — it's catching operators whose cost or memory
  * curves are super-linear before a real cluster does.
  *
  * Usage: scripts/run.sh graft.tools.ScaleRehearsal [outDir] [copies]
  * (SPARK_GRAFT_REHEARSAL_ONLY=a,b,c restricts the operator list —
  * the 100× pass times a focused subset, not all ~50.)
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-rehearsal")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-table gates (q38) saveAsTable into the warehouse; pin
      // it to tmp so the full-registry sweep never depends on CWD
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-rehearsal-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-table guard (not one lineitem-keyed guard for the whole
    // block) so a single stale/deleted table rebuilds without nuking
    // the rest — needed for the r13 dim-fixture repair below
    def replicate(table: String, shifts: Map[String, Long], nCopies: Int): Unit = {
      if (new java.io.File(s"$out/$table.parquet").exists()) return
      val base = spark.read.parquet(s"$src/$table.parquet")
      val union = (0 until nCopies).map { i =>
        shifts.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i * stride))
        }
      }.reduce(_ unionByName _)
      union.write.mode("overwrite").parquet(s"$out/$table.parquet")
    }

    {
      // dims stay as-is: ONE copy, shared content — the facts keep
      // their dim foreign keys unshifted, so dim keys must stay unique.
      // r13 FIXTURE FIX: the old form pushed dims through the same
      // `copies`-way union with no key shift, i.e. every dim row
      // duplicated `copies` times — silently multiplying every
      // fact→dim join's output by the copy count per dim hop (measured
      // at 100×: l⋈o⋈supplier = 1.84e9 rows instead of 18.4M, q6's
      // whole chain ~10¹¹ logical rows / 16,600 task-seconds for 5
      // output rows). Every pre-r13 10×/100× number for a dim-joining
      // gate measured that inflated workload — conservative direction
      // (the engine looked worse, never better), adjudicated in
      // SCALE.md r13d.
      Seq("region", "nation", "supplier", "part")
        .foreach(t => replicate(t, Map.empty, 1))
      replicate("customer", Map("c_custkey" -> 10000000L), copies)
      replicate("orders", Map("o_orderkey" -> 1000000000L, "o_custkey" -> 10000000L), copies)
      replicate("lineitem", Map("l_orderkey" -> 1000000000L), copies)
      replicate("events", Map("event_id" -> 100000000L, "user_id" -> 1000000L), copies)
      // the doc shift must preserve doc_id residues mod the two-table
      // stand-in moduli (BenchMod=97, IncomingMod=3), or each copy
      // rotates into a different benchmark/batch split and the
      // simulated benchmark balloons to the whole corpus (measured:
      // pipeline_full drops to 0 survivors at 100× with a 10M stride);
      // 10_010_400 = 97·3·34400; embeddings use the SAME stride so the
      // doc_id↔vec_id correspondence (search_hybrid's fusion join)
      // survives replication
      replicate("documents", Map("doc_id" -> 10010400L), copies)
      replicate("embeddings", Map("vec_id" -> 10010400L), copies)
    }

    // r12: the rehearsal covers the FULL registry by default — the two
    // r11 canaries (corpus_icp's silent 30-doc permutation loss,
    // dedup_allpairs' 11.6x wall) were both caught only because their
    // operators happened to be in the curated list, so coverage IS the
    // canary surface. SPARK_GRAFT_REHEARSAL_ONLY=a,b,c still restricts
    // for focused probes.
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    val names = sys.env.get("SPARK_GRAFT_REHEARSAL_ONLY") match {
      case Some(list) => list.split(",").toSeq
      case None => allNames
    }
    // per-task metrics listener: the 100×-class question is not only
    // wall time but whether any single task's memory footprint or
    // spill grows super-linearly — that's what OOMs a real executor
    // long before the driver notices. peakExecutionMemory is the
    // max unroll+execution memory any one task held; spills are the
    // pressure-release signal that memory WOULD have been exceeded.
    val peakMem = new java.util.concurrent.atomic.AtomicLong(0)
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          peakMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
          spilled.addAndGet(m.memoryBytesSpilled)
          maxTaskMs.getAndUpdate(p => math.max(p, m.executorRunTime))
        }
      }
    })
    names.foreach { n => // warmup pass then timed pass
      try {
        SparkEntry.queries(n)(spark, out).count()
        // drain the async listener bus BEFORE resetting: a warmup task's
        // trailing onTaskEnd landing after the reset would bleed warmup
        // memory/spill into the recorded timed-pass numbers (spilled is
        // additive, so the bleed inflates, never hides)
        Thread.sleep(300)
        peakMem.set(0); spilled.set(0); maxTaskMs.set(0)
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, out).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener bus drains async; 300 ms covers it
        println(f"[rehearsal] $n%-26s $wall%7.1f s  ($rows rows)  " +
          f"peak-task-mem=${peakMem.get / (1 << 20)}%d MB  " +
          f"spilled=${spilled.get / (1 << 20)}%d MB  max-task=${maxTaskMs.get}%d ms")
      } catch { case e: Throwable =>
        // a full-registry sweep must not die on one gate: record the
        // failure as its own line (a 10x-only failure IS a canary —
        // exactly what the sweep exists to surface) and keep going
        println(s"[rehearsal] $n FAILED: ${e.getClass.getSimpleName} ${e.getMessage}")
      } finally {
        graft.Graft.releaseState(spark) // caches + checkpointed state
      }
    }
    spark.stop()
  }
}
