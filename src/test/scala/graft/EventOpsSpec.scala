package graft

import graft.operators.EventOps
import java.sql.Timestamp

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // 6 events, 2 users, 2 types, spanning 2 hours.
  private lazy val events = Seq(
    (0L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0, """{"k": 1}"""),
    (1L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0, """{"k": 1}"""),
    (2L, ts("2024-01-01 00:40:00"), 2L, "view", 3.0, """{"k": 2}"""),
    (3L, ts("2024-01-01 01:10:00"), 1L, "click", 4.0, """{"k": 2}"""),
    (4L, ts("2024-01-01 01:15:00"), 2L, "view", 5.0, """{"k": 1}"""),
    (5L, ts("2024-01-01 03:00:00"), 2L, "view", 6.0, """{"k": 2}"""),
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("tumbling 1h windows: counts and sums per type") {
    val got = EventOps.tumblingCounts(events)
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (ts("2024-01-01 00:00:00"), "click", 2L, 3.0),
      (ts("2024-01-01 00:00:00"), "view", 1L, 3.0),
      (ts("2024-01-01 01:00:00"), "click", 1L, 4.0),
      (ts("2024-01-01 01:00:00"), "view", 1L, 5.0),
      (ts("2024-01-01 03:00:00"), "view", 1L, 6.0)))
  }

  test("sliding 1h/15m: each event lands in exactly 4 windows") {
    val got = EventOps.slidingCounts(events)
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(got.map(_._3).sum == 4L * events.count())
    // the 00:05 event's earliest window starts 23:15 the day before
    assert(got.head._1 == ts("2023-12-31 23:15:00"))
  }

  test("decayedCounts: hand-computed staircase weights, clamp at 50, " +
      "layout-deterministic") {
    // half-life 1 day; reference = max ts (day 10). ages: 0, 1, 2,
    // 10 days -> weights 1, 1/2, 1/4, 2^-10; plus one ancient event
    // (age 80 days) clamped to 2^-50
    val e = Seq(
      (0L, ts("2024-03-11 00:00:00"), 1L, "a", 0.0, "{}"),
      (1L, ts("2024-03-10 00:00:00"), 1L, "a", 0.0, "{}"),
      (2L, ts("2024-03-09 00:00:00"), 1L, "a", 0.0, "{}"),
      (3L, ts("2024-03-01 00:00:00"), 1L, "b", 0.0, "{}"),
      (4L, ts("2023-12-22 00:00:00"), 1L, "b", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.decayedCounts(e, halfLifeDays = 1)
      .as[(String, Long, Long)].collect().toSeq
    def e6(ks: Seq[Int]): Long =
      (ks.map(k => BigInt(1) << (50 - k)).sum * 1000000 /
        (BigInt(1) << 50)).toLong
    assert(got == Seq(
      ("a", 3L, e6(Seq(0, 1, 2))),      // 1 + .5 + .25 = 1750000
      ("b", 2L, e6(Seq(10, 50)))))      // 2^-10 + clamped 2^-50
    assert(got.head._3 == 1750000L)
    // partial weights just below a unit never round up spuriously
    assert(got(1)._3 == (1L << 40) * 1000000L / (1L << 50))
    // layout-invariant (integer sums commute)
    assert(EventOps.decayedCounts(e.repartition(7), halfLifeDays = 1)
      .as[(String, Long, Long)].collect().toSeq == got)
  }

  test("value outliers: hand-computed Tukey fences flag exactly the spike") {
    // 9 calm values 1..9 plus one 100.0 spike, one type
    val vals = (1 to 9).map(_.toDouble) :+ 100.0
    val df = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts("2024-01-01 00:00:00"), 1L, "m", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.valueOutliers(df)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    // p25 = 3.25, p75 = 7.75 (linear interpolation over 10 values),
    // IQR = 4.5 -> fences [-3.5, 14.5]: only the 100 is outside
    assert(got == Seq(("m", 10L, 1L, 1000L, -3.5, 14.5)))
  }

  test("value outliers on sf0.001: counts conserve, fences ordered") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val rows = EventOps.valueOutliers(ev)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == ev.count())
    rows.foreach { case (_, n, out, bp, lo, hi) =>
      assert(lo <= hi && out <= n && bp == out * 10000 / n)
    }
  }

  test("type transitions: hand-computed Markov counts in (ts, id) order") {
    val got = EventOps.typeTransitions(events)
      .as[(String, String, Long)].collect().toSeq
    // user 1: click(00:05) -> click(00:20) -> click(01:10)
    // user 2: view(00:40) -> view(01:15) -> view(03:00)
    assert(got == Seq(("click", "click", 2L), ("view", "view", 2L)))
    // ties on ts broken by event_id: duplicate-ts events stay ordered
    val dup = Seq(
      (10L, ts("2024-01-01 00:00:00"), 9L, "a", 0.0, "{}"),
      (11L, ts("2024-01-01 00:00:00"), 9L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val t2 = EventOps.typeTransitions(dup)
      .as[(String, String, Long)].collect().toSeq
    assert(t2 == Seq(("a", "b", 1L)))
  }

  test("inter-arrival gaps: exact integer µs, hand-computed per type") {
    val got = EventOps.interArrival(events)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // click (user 1): gaps 15 min, 50 min; view (user 2): 35 min, 105 min
    assert(got("click") == (("click", 2L, 15L * 60000000L,
      50L * 60000000L, (15L + 50L) * 60000000L / 2.0)))
    assert(got("view") == (("view", 2L, 35L * 60000000L,
      105L * 60000000L, (35L + 105L) * 60000000L / 2.0)))
  }

  test("rate anomaly: hand-computed z-scores from exact integer sums") {
    val got = EventOps.rateAnomaly(events)
      .as[(String, Timestamp, Long, Double, Double)].collect().toSeq
    // click hours: [2, 1]  -> mean 1.5, var 0.25, sd 0.5 -> z = ±1.0
    // view hours:  [1, 1, 1] -> sd 0 -> z = 0 by definition
    assert(got == Seq(
      ("click", ts("2024-01-01 00:00:00"), 2L, 1.5, 1.0),
      ("click", ts("2024-01-01 01:00:00"), 1L, 1.5, -1.0),
      ("view", ts("2024-01-01 00:00:00"), 1L, 1.0, 0.0),
      ("view", ts("2024-01-01 01:00:00"), 1L, 1.0, 0.0),
      ("view", ts("2024-01-01 03:00:00"), 1L, 1.0, 0.0)))
    // -0.0 never rendered (the CorpusOps render rule)
    assert(got.forall(r => !(r._5 == 0.0 && 1.0 / r._5 < 0)))
  }

  test("rate anomaly on sf0.001: z means/vars consistent per type") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val rows = EventOps.rateAnomaly(ev)
      .as[(String, Timestamp, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    // per type: mean column is constant and equals the count mean
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).distinct.length == 1)
      val mean = rs.map(_._3).sum.toDouble / rs.length
      assert(math.abs(rs.head._4 - mean) < 1e-3)
      // z-scores of a full population sum to ~0
      assert(math.abs(rs.map(_._5).sum) < 0.01 * rs.length)
    }
  }

  test("session windows: 30m gap splits sessions, end = last + gap") {
    val got = EventOps.sessionCounts(events)
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
    assert(got == Seq(
      // user 1: 00:05 + 00:20 merge (15m gap); 01:10 is its own session
      (1L, ts("2024-01-01 00:05:00"), ts("2024-01-01 00:50:00"), 2L),
      (1L, ts("2024-01-01 01:10:00"), ts("2024-01-01 01:40:00"), 1L),
      // user 2: 00:40 + 01:15 split (35m gap); 03:00 alone
      (2L, ts("2024-01-01 00:40:00"), ts("2024-01-01 01:10:00"), 1L),
      (2L, ts("2024-01-01 01:15:00"), ts("2024-01-01 01:45:00"), 1L),
      (2L, ts("2024-01-01 03:00:00"), ts("2024-01-01 03:30:00"), 1L)))
  }

  test("json prop extraction groups by k") {
    val got = EventOps.propStats(events)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == Seq((1, 3L, 8.0 / 3), (2, 3L, 13.0 / 3)).map {
      case (k, n, a) => (k, n, math.rint(a * 1e4) / 1e4) })
  }

  test("top users per type ranks by count desc, user asc") {
    val got = EventOps.topUsersPerType(events, 5)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("click", 1L, 3L, 1L),
      ("view", 2L, 3L, 1L)))
  }

  test("distinct users per type: bounded by total users, ignores nulls") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.events(spark, sfDir)
    val r = EventOps.distinctUsersPerType(e)
      .as[(String, Long)].collect().toMap
    val totalUsers = e.filter(col("user_id").isNotNull)
      .select("user_id").distinct().count()
    assert(r.nonEmpty && r.values.forall(n => n > 0 && n <= totalUsers))
    // null users never counted
    val withNull = e.limit(10)
      .withColumn("user_id", org.apache.spark.sql.functions
        .lit(null).cast("long"))
    assert(EventOps.distinctUsersPerType(withNull).count() == 0)
  }

  test("purchase attribution: every pair is same-user, click within the hour") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.events(spark, sfDir)
    val r = EventOps.purchaseAttribution(e)
    assert(r.count() > 0)
    assert(r.filter(col("c_ts") > col("p_ts")).count() == 0)
    assert(r.filter(
      col("c_ts") < col("p_ts") - org.apache.spark.sql.functions
        .expr("INTERVAL 1 hour")).count() == 0)
  }

  test("funnel: strict ordering per step, nulls after drop-off") {
    val fe = Seq(
      // user 1: full funnel in order
      (0L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
      (1L, ts("2024-01-01 00:10:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 00:20:00"), 1L, "purchase", 0.0, "{}"),
      // user 2: purchase BEFORE the click -> not converted
      (3L, ts("2024-01-01 00:00:00"), 2L, "view", 0.0, "{}"),
      (4L, ts("2024-01-01 00:30:00"), 2L, "purchase", 0.0, "{}"),
      (5L, ts("2024-01-01 00:40:00"), 2L, "click", 0.0, "{}"),
      // user 3: view only
      (6L, ts("2024-01-01 00:00:00"), 3L, "view", 0.0, "{}"),
      // user 4: click/purchase but never viewed -> absent entirely
      (7L, ts("2024-01-01 00:00:00"), 4L, "click", 0.0, "{}"),
      (8L, ts("2024-01-01 00:01:00"), 4L, "purchase", 0.0, "{}"),
      // user 5: click at the exact view instant -> strict '>' excludes
      (9L, ts("2024-01-01 00:00:00"), 5L, "view", 0.0, "{}"),
      (10L, ts("2024-01-01 00:00:00"), 5L, "click", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.funnel(fe)
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    assert(got(1L)._3.contains(ts("2024-01-01 00:10:00")) &&
      got(1L)._4.contains(ts("2024-01-01 00:20:00")))
    assert(got(2L)._3.contains(ts("2024-01-01 00:40:00")) && got(2L)._4.isEmpty)
    assert(got(3L)._3.isEmpty && got(3L)._4.isEmpty)
    assert(got(5L)._3.isEmpty)
    // corpus smoke: conversion counts are monotone down the funnel
    val corpus = EventOps.funnel(graft.sources.Tables.events(spark, sfDir))
    import org.apache.spark.sql.functions.{count => cnt, col}
    val (nv, nc, np) = corpus.agg(cnt(col("t_view")), cnt(col("t_click")),
      cnt(col("t_purchase"))).as[(Long, Long, Long)].head()
    assert(nv >= nc && nc >= np && np > 0)
  }

  test("binned interval join == naive nested loop, and plans an equi-join") {
    val e = graft.sources.Tables.events(spark, sfDir)
    val naive = EventOps.incidentEvents(e)
    val binned = EventOps.incidentEventsBinned(e)
    assert(naive.count() > 0)
    assert(naive.exceptAll(binned).isEmpty && binned.exceptAll(naive).isEmpty)
    // the whole point: the binned form joins on a hash key, the naive
    // form cannot
    val np = naive.queryExecution.executedPlan.toString
    val bp = binned.queryExecution.executedPlan.toString
    assert(np.contains("BroadcastNestedLoopJoin"),
      s"naive should be the nested loop:\n$np")
    assert(!bp.contains("BroadcastNestedLoopJoin"),
      s"binned must not nested-loop:\n$bp")
    assert(bp.contains("__bin"), s"binned should key on __bin:\n$bp")
    // boundary inclusivity: an event exactly at inc_ts ± 5min matches
    import java.sql.Timestamp
    def ev(id: Long, ts: String, t: String) =
      (id, Timestamp.valueOf(ts), 1L, t, 0.0, "{}")
    val fix = Seq(
      ev(0L, "2024-01-01 12:00:00", "error"),
      ev(1L, "2024-01-01 11:55:00", "view"),  // exactly -5min
      ev(2L, "2024-01-01 12:05:00", "view"),  // exactly +5min
      ev(3L, "2024-01-01 11:54:59", "view"),  // just outside
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.incidentEventsBinned(fix)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 0L), (1L, 0L), (2L, 0L)))
  }

  test("retention cohorts: first-day cohorts, offsets, distinct users") {
    val re = Seq(
      // user 1 joins day 0, returns day 1 and day 3 (twice on day 1 —
      // the distinct must collapse it)
      (0L, ts("2024-01-01 08:00:00"), 1L, "view", 0.0, "{}"),
      (1L, ts("2024-01-02 09:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-02 21:00:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-04 10:00:00"), 1L, "view", 0.0, "{}"),
      // user 2 joins day 1, returns day 2
      (4L, ts("2024-01-02 12:00:00"), 2L, "view", 0.0, "{}"),
      (5L, ts("2024-01-03 12:00:00"), 2L, "view", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.retentionCohorts(re)
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    def d(s: String) = java.sql.Date.valueOf(s)
    assert(got == Seq(
      (d("2024-01-01"), 0L, 1L), (d("2024-01-01"), 1L, 1L),
      (d("2024-01-01"), 3L, 1L),
      (d("2024-01-02"), 0L, 1L), (d("2024-01-02"), 1L, 1L)))
    // corpus invariants: every cohort has an offset-0 cell whose count
    // is the cohort's total membership (every user is active on their
    // own first day), and cells never exceed it
    val corpus = EventOps.retentionCohorts(
      graft.sources.Tables.events(spark, sfDir))
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    val day0 = corpus.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    assert(corpus.nonEmpty)
    corpus.foreach { case (c, _, n) => assert(n <= day0(c)) }
  }

  test("HLL sketch distinct: tight error and associative merges") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.events(spark, sfDir)
    val r = EventOps.distinctUsersSketch(e)
      .as[(String, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (t, approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"$t: approx $approx vs exact $exact")
    }
    // merge associativity: union of per-slice sketches estimates the
    // same population as one whole-stream sketch (the incremental
    // pattern: store per-partition sketches, union later)
    val slices = e.filter($"user_id".isNotNull)
      .withColumn("slice", pmod($"event_id", lit(4)))
      .groupBy("slice")
      .agg(hll_sketch_agg($"user_id", lit(14)).as("sk"))
    val merged = slices
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("n"))
      .as[Long].head()
    val exactAll = e.filter($"user_id".isNotNull)
      .select(countDistinct("user_id")).as[Long].head()
    assert(math.abs(merged - exactAll).toDouble / exactAll < 0.05,
      s"merged $merged vs exact $exactAll")
  }

  test("CMS counts: exact in the no-collision regime; merges exactly") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.events(spark, sfDir)
    // the exactness regime the oracle relies on: at this seed none of
    // the closed event-type set collides in every sketch row, so every
    // estimate equals the exact count (at ANY data volume — collisions
    // depend on the key strings and geometry, not the counts)
    val got = EventOps.eventTypeCmsCounts(e)
      .as[(String, Long)].collect().toMap
    val exact = e.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(got == exact, s"CMS estimates $got vs exact $exact")
    // CMS never under-counts, even outside the exact regime: force
    // collisions with a 4-cell-wide sketch and check the bound holds
    val tiny = EventOps.eventTypeCmsCounts(e, eps = 0.5, confidence = 0.6)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) => assert(tiny(t) >= n) }
    // mergeability (the 100 TB shape: per-slice sketch binaries merged
    // without re-reading events): slice sketches merge to the same
    // counters as the whole-stream sketch
    val skCol = "count_min_sketch(event_type, 0.001d, 0.99d, 42)"
    val slices = e.withColumn("slice", pmod($"event_id", lit(4)))
      .groupBy("slice").agg(expr(skCol).as("sk"))
      .select("sk").as[Array[Byte]].collect()
    val merged = slices.map(
        org.apache.spark.util.sketch.CountMinSketch.readFrom)
      .reduce { (a, b) => a.mergeInPlace(b); a }
    exact.foreach { case (t, n) =>
      assert(merged.estimateCount(t) == n,
        s"merged sketch $t: ${merged.estimateCount(t)} vs $n")
    }
  }

  test("sliding windows on sf0.001 conserve event count x4") {
    val e = graft.sources.Tables.events(spark, sfDir)
    val total = EventOps.slidingCounts(e)
      .agg(org.apache.spark.sql.functions.sum("n_events")).as[Long].head()
    assert(total == 4L * e.count())
  }
}
