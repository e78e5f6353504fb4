package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational2

/** Semantic checks for the second relational battery (q24–q30), plus
  * plan gates for the shapes that matter at scale: the range join must
  * never plan as a cartesian/nested-loop product, and pivot must stay a
  * single partial+final aggregation pass.
  */
class Relational2Spec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.sparkPlan

  test("q18 salted as-of equals the unsalted window at every bucket width") {
    import graft.operators.Relational
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val unsalted = rows(Relational.q18AsOf(spark, dir))
    assert(unsalted.nonEmpty)
    // hour-wide, day-wide, and effectively-unsalted (one giant bucket)
    for (bucketUs <- Seq(3600L * 1000 * 1000, 86400L * 1000 * 1000, Long.MaxValue)) {
      assert(rows(Relational.q18AsOfSalted(spark, dir, bucketUs)) == unsalted,
        s"salted as-of diverged at bucketUs=$bucketUs")
    }
    // the hour salt genuinely splits users across buckets (else the
    // test proves nothing)
    val nBkts = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts_us div ${3600L * 1000 * 1000}").as("b"))
      .distinct().groupBy("user_id").count()
      .agg(max("count")).as[Long].head()
    assert(nBkts > 1, "fixture must span multiple salt buckets")
  }

  test("q24 pivot: cell counts re-add to the orders total") {
    val piv = Relational2.q24Pivot(spark, dir)
    val cells = piv.agg(sum(col("n_f") + col("n_o") + col("n_p"))).as[Long].head()
    val total = Tables.orders(spark, dir).count()
    assert(piv.count() == 5 && cells == total)
  }

  test("q24 pivot plans as one partial+final aggregate (no distinct pre-pass)") {
    val aggs = plan(Relational2.q24Pivot(spark, dir))
      .collect { case h: HashAggregateExec => h }
    assert(aggs.size >= 2, "expect partial+final HashAggregate pair")
  }

  test("q25 decorrelated window == join-with-aggregate formulation") {
    val c = Tables.customer(spark, dir)
    val avgNat = c.groupBy(col("c_nationkey").as("nk"))
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("s"), count(lit(1)).as("n"))
    val expected = c.join(avgNat, col("c_nationkey") === col("nk"))
      .where(col("c_acctbal").cast("decimal(18,2)") * col("n") > col("s"))
      .select("c_custkey").as[Long].collect().toSet
    val got = Relational2.q25Correlated(spark, dir)
      .select("c_custkey").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("q26 posexplode: position-1 tokens count every document once") {
    val df = Relational2.q26PosExplode(spark, dir).cache()
    val nDocs = Tables.documents(spark, dir).count()
    val pos1 = df.where(col("pos") === 1).agg(sum("n")).as[Long].head()
    val posRange = df.agg(min("pos"), max("pos")).as[(Long, Long)].head()
    assert(pos1 == nDocs && posRange == ((1L, 5L)))
    df.unpersist()
  }

  test("q27 maps: three entries per part, brand lookup matches source") {
    val df = Relational2.q27Maps(spark, dir).cache()
    val nParts = Tables.part(spark, dir).count()
    assert(df.count() == 3 * nParts)
    assert(df.select("attr").distinct().as[String].collect().toSet ==
      Set("brand", "type", "size"))
    val mismatch = df.where(col("attr") === "brand" && col("val") =!= col("brand"))
    assert(mismatch.count() == 0)
    df.unpersist()
  }

  test("q28 regex: extraction reconstructs p_name; replace masks all vowels") {
    val joined = Relational2.q28Regex(spark, dir)
      .join(Tables.part(spark, dir), "p_partkey")
    assert(joined.where(concat_ws(" ", col("adj"), col("noun")) =!= col("p_name"))
      .count() == 0)
    assert(joined.where(col("type_masked").rlike("[AEIOU]")).count() == 0)
  }

  test("q29 window battery: quartiles bounded, first_value is the partition min") {
    val df = Relational2.q29WindowBattery(spark, dir).cache()
    assert(df.where(col("quartile") < 1 || col("quartile") > 4).count() == 0)
    assert(df.where(col("pct_rank") < 0 || col("pct_rank") > 1).count() == 0)
    val s = Tables.supplier(spark, dir)
    val firsts = s.groupBy("s_nationkey")
      .agg(min(struct(col("s_acctbal"), col("s_suppkey"))).as("m"))
      .select(col("s_nationkey").as("nk"), col("m.s_suppkey").as("expect_first"))
    assert(df.join(firsts, col("s_nationkey") === col("nk"))
      .where(col("first_sk") =!= col("expect_first")).count() == 0)
    df.unpersist()
  }

  test("q30 bucketed range join == naive theta join") {
    val ev = Tables.events(spark, dir)
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("ts_us"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts_us").as("p_ts"))
    val naive = c.join(p, col("p_ts") > col("ts_us") &&
        col("p_ts") <= col("ts_us") + 300000000L, "left")
      .groupBy("event_id").agg(count(col("p_id")).as("n_purch"))
      .as[(Long, Long)].collect().toMap
    val got = Relational2.q30RangeJoin(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == naive && got.nonEmpty)
  }

  test("q30 never plans as cartesian or nested-loop product") {
    val p = plan(Relational2.q30RangeJoin(spark, dir))
    assert(p.collect { case j: CartesianProductExec => j }.isEmpty)
    assert(p.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
  }

  test("q42 islands: bursts merge across the gap rule; ties and singletons hold; both windows share one exchange") {
    val d = java.nio.file.Files.createTempDirectory("graft-islands").toString
    val M = 60L * 1000000 // one minute in µs
    // user 1: burst of 3 within gaps ≤ 30 min, then a 31-min gap, then a
    // tie pair; user 2: a lone event
    Seq(
      (1L, 0L * M), (2L, 10L * M), (3L, 40L * M), // 0→10 (ok) →40 (ok: 30m exactly)
      (4L, 71L * M), (5L, 71L * M),               // 40→71 is 31 min: NEW island; tie stays together
      (6L, 5L * M))
      .map { case (id, us) => (id, us * 1000, if (id == 6L) 2L else 1L, "click", 1.0, "{}") } // ts column = long nanos (the fixture parquet contract Tables.events reads)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Relational2.q42Islands(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 3, s"got $got")
    assert(got((1L, 1L)) == ((0L, 40L * M, 3L)), "30-min gap is INSIDE the island (<=)")
    assert(got((1L, 2L)) == ((71L * M, 71L * M, 2L)), "tied timestamps share an island")
    assert(got((2L, 1L)) == ((5L * M, 5L * M, 1L)), "singleton island")
    // plan claim: lag-window, sum-window, and the aggregation ride ONE
    // exchange on user_id (the windows' sort satisfies all three).
    // sparkPlan predates EnsureRequirements, so read the prepared plan
    val prepared = Relational2.q42Islands(spark, d).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(prepared).length
    assert(exchanges == 1, s"expected one exchange:\n$prepared")
  }

  test("attribution conserves value, splits evenly, and covers every purchase once") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = Relational2.eventsAttribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getDouble(5)))
    val purchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("value")).as[(Long, Double)]
      .collect().toMap
    val byP = rows.groupBy(_._1)
    assert(byP.keySet == purchases.keySet, "every purchase appears, none twice-keyed")
    byP.foreach { case (pid, rs) =>
      val n = rs.head._3
      assert(rs.forall(_._3 == n))
      if (n == 0) {
        // direct attribution: one full-value row at click_id = -1
        assert(rs.toSeq == Seq((pid, -1L, 0L, purchases(pid))))
      } else {
        assert(rs.length == n.toInt && rs.map(_._2).distinct.length == rs.length,
          s"purchase $pid: $n distinct touches")
        assert(rs.forall(r => math.abs(r._4 - purchases(pid) / n) < 1e-12))
        assert(math.abs(rs.map(_._4).sum - purchases(pid)) < 1e-9,
          s"credits for $pid must sum to the purchase value")
      }
    }
    // the fixture must exercise the split path, or this pins nothing
    assert(byP.values.exists(_.head._3 >= 2), "need a multi-touch purchase at spec SF")
  }

  test("events_paths: user partition, time order, and coverage") {
    val ev = Tables.events(spark, dir)
    val nUsers = ev.select(col("user_id")).distinct().count()
    val rows = Relational2.eventsPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every user lands in exactly one path bucket
    assert(rows.map(_._3).sum == nUsers)
    rows.foreach { case (path, len, _) =>
      assert(len >= 1 && len <= 3)
      assert(path.split(">").length == len, s"path '$path' vs len $len")
    }
    // differential: rebuild one user's prefix by hand
    val u = ev.select(col("user_id")).head().getLong(0)
    val expect = ev.where(col("user_id") === u)
      .orderBy(col("ts_us"), col("event_id")).limit(3)
      .collect().map(_.getAs[String]("event_type")).mkString(">")
    assert(rows.exists(_._1 == expect),
      s"user $u's prefix '$expect' must appear as a path")
  }

  test("events_dau: first-seen cumulative reconciles with true distinct counts day by day") {
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts_us div ${Relational2.DayUs}").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Relational2.eventsDau(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // the load-bearing identity: cum_users(d) == |{u : first_seen(u) <= d}|
    // == |distinct users in the prefix| — the set-union semantics the
    // first-seen rewrite must reproduce
    val days = got.map(_._1)
    for (d <- days) {
      val prefix = ev.filter(_._2 <= d).map(_._1).distinct.length.toLong
      assert(got.toMap.apply(d)._4 == prefix, s"cum_users wrong at day $d")
    }
    // per-day dau/new/volume against a direct recount
    for ((d, (n, dau, nu, _)) <- got) {
      val todays = ev.filter(_._2 == d)
      assert(n == todays.length.toLong && dau == todays.map(_._1).distinct.length.toLong)
      val firstSeen = ev.groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).min) }
      assert(nu == firstSeen.count(_._2 == d).toLong)
    }
    // monotone non-decreasing cumulative, and dau never exceeds it
    assert(days.zip(days.drop(1)).forall { case (a, b) => a < b })
    val cums = got.map(_._2._4)
    assert(cums.zip(cums.drop(1)).forall { case (a, b) => a <= b })
    assert(got.forall { case (_, (_, dau, _, cum)) => dau <= cum })
  }

  test("events_ewma: constant series is a fixed point; a step converges monotonically to the new level") {
    import graft.operators.Relational2.{DayUs, EwmaK}
    val d = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    // type "flat": 4 events/day for 6 days; type "step": 1/day for 3
    // days then 9/day for 5 days
    val rows = (for (day <- 0L until 6L; k <- 0L until 4L)
        yield ("flat", day, k)) ++
      (for (day <- 0L until 8L; k <- 0L until (if (day < 3) 1L else 9L))
        yield ("step", day, k))
    rows.zipWithIndex.map { case ((et, day, _), i) =>
      (i.toLong, (day * DayUs + 1000L) * 1000L, 1L, et, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = Relational2.eventsEwma(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // constant series: s stays exactly x*K, deviation exactly 0
    for (day <- 0L until 6L)
      assert(out(("flat", day)) == ((4L, 4L * EwmaK, 0L)), s"flat day $day")
    // step: state climbs strictly toward (but below) the new level
    val climb = (3L until 8L).map(day => out(("step", day))._2)
    assert(climb.zip(climb.drop(1)).forall { case (a, b) => a < b })
    assert(climb.forall(s => s > 1L * EwmaK && s < 9L * EwmaK))
    // deviation shrinks as the state converges
    val devs = (3L until 8L).map(day => out(("step", day))._3)
    assert(devs.zip(devs.drop(1)).forall { case (a, b) => b < a })
  }

  test("events_rfm: scores bounded and monotone in their metrics, recency inverted, segment arithmetic") {
    val rows = Relational2.eventsRfm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))
    assert(rows.nonEmpty)
    for ((_, _, _, _, rs, fs, ms, seg) <- rows) {
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(seg == rs * 100 + fs * 10 + ms)
    }
    // monotone: a strictly larger metric can never score lower (same
    // fences for everyone); recency is INVERTED (more days = lower)
    for (w <- rows.sortBy(_._3).toSeq.sliding(2); Seq(a, b) = w if a._3 < b._3)
      assert(a._6 <= b._6, s"f_score must be monotone in f: $a vs $b")
    for (w <- rows.sortBy(_._2).toSeq.sliding(2); Seq(a, b) = w if a._2 < b._2)
      assert(a._5 >= b._5, s"r_score must be antitone in r_days: $a vs $b")
    for (w <- rows.sortBy(_._4).toSeq.sliding(2); Seq(a, b) = w if a._4 < b._4)
      assert(a._7 <= b._7, s"m_score must be monotone in m_cents: $a vs $b")
    // quintile fences actually spread the fixture population
    assert(rows.map(_._8).distinct.length >= 5,
      "fixture must produce several distinct segments")
  }

  test("dq_skew_report: internally consistent against the raw count table") {
    val r = graft.operators.Relational.dqSkewReport(spark, dir).head()
    val counts = Tables.orders(spark, dir).groupBy(col("o_custkey")).count()
      .collect().map(_.getLong(1)).sorted
    assert(r.getLong(0) == counts.length)           // n_keys
    assert(r.getLong(1) == counts.sum)              // n_rows
    assert(r.getLong(2) == counts.head && r.getLong(3) == counts.last)
    assert(r.getLong(7) == counts.last * 1000000L / counts.sum)
    // exact ceil-rank percentiles: the selection kernel must agree with
    // a brute walk of the sorted count array, element for element
    def ceilRank(p: Int): Long = counts(((p * counts.length + 99L) / 100L - 1).toInt)
    assert(r.getLong(4) == ceilRank(50))
    assert(r.getLong(5) == ceilRank(90))
    assert(r.getLong(6) == ceilRank(99))
  }
}
