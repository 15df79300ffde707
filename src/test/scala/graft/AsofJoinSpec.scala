package graft

import java.sql.Timestamp

import graft.operators.AsofJoin
import graft.sources.Tables

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asof picks the latest right row at-or-before each left time") {
    val left = Seq((1L, ts(10), "l10"), (1L, ts(20), "l20"),
      (1L, ts(5), "l5"), (2L, ts(10), "l2"))
      .toDF("k", "t", "name")
    val right = Seq((1L, ts(8), 100L), (1L, ts(10), 101L),
      (1L, ts(15), 102L), (3L, ts(1), 999L))
      .toDF("k", "t", "rid")
    val got = AsofJoin.asof(left, right, "k", "t", Seq("rid"))
      .select("k", "t", "name", "asof_rid").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
    assert(got == Set(
      (1L, 10L, "l10", Some(101L)), // tie: rt == lt is included
      (1L, 20L, "l20", Some(102L)),
      (1L, 5L, "l5", None),         // nothing at-or-before
      (2L, 10L, "l2", None),        // key with no right rows at all
    ))
  }

  test("forward asof picks the earliest right row at-or-after each left time") {
    val left = Seq((1L, ts(10), "l10"), (1L, ts(20), "l20"),
      (1L, ts(5), "l5"), (1L, ts(16), "l16"), (2L, ts(10), "l2"))
      .toDF("k", "t", "name")
    val right = Seq((1L, ts(8), 100L), (1L, ts(10), 101L),
      (1L, ts(15), 102L), (3L, ts(1), 999L))
      .toDF("k", "t", "rid")
    val got = AsofJoin.asof(left, right, "k", "t", Seq("rid"),
      forward = true)
      .select("k", "t", "name", "asof_rid").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
    assert(got == Set(
      (1L, 10L, "l10", Some(101L)), // tie: rt == lt is included
      (1L, 20L, "l20", None),       // nothing at-or-after
      (1L, 5L, "l5", Some(100L)),   // earliest future, not latest past
      (1L, 16L, "l16", None),       // 15 is in the past -> no match
      (2L, 10L, "l2", None),        // key with no right rows at all
    ))
  }

  test("forward bucketed == forward plain on the hot-key fixture") {
    import org.apache.spark.sql.functions._
    val left = (0 until 200)
      .map(i => (7L, ts(i * 131L), s"l$i")).toDF("k", "t", "name")
    val right = (0 until 150)
      .filter(i => i % 50 != 1)
      .map(i => (7L, ts(i * 173L), i.toLong)).toDF("k", "t", "rid")
    val hourly: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => date_trunc("hour", t)
    val plain = AsofJoin.asof(left, right, "k", "t", Seq("rid"),
      forward = true)
    val bucketed = AsofJoin.asof(left, right, "k", "t", Seq("rid"),
      timeBucket = Some(hourly), forward = true)
    assert(bucketed.count() == left.count())
    assert(plain.exceptAll(bucketed).isEmpty &&
      bucketed.exceptAll(plain).isEmpty)
  }

  test("nearest asof picks the closer direction, ties to the past") {
    import org.apache.spark.sql.functions.col
    val left = Seq(
      (1L, ts(10), "back-closer"),   // rights at 8 and 15 -> 8 (gap 2 vs 5)
      (1L, ts(13), "fwd-closer"),    // 8 vs 15 -> 15 (gap 5 vs 2)
      (1L, ts(30), "only-back"),     // nothing after 15 -> 15
      (1L, ts(5), "only-fwd"),       // nothing at-or-before -> 8
      (2L, ts(10), "tie-to-past"),   // rights at 7 and 13 -> 7
      (3L, ts(10), "no-match"),
    ).toDF("k", "t", "name")
    val right = Seq((1L, ts(8), 100L), (1L, ts(15), 102L),
      (2L, ts(7), 200L), (2L, ts(13), 201L))
      .toDF("k", "t", "rid").withColumn("rt", col("t"))
    val got = AsofJoin.asofNearest(left, right, "k", "t",
      Seq("rid", "rt"), rightTimeCol = "rt")
      .select("name", "asof_rid").collect()
      .map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == Map(
      "back-closer" -> Some(100L),
      "fwd-closer" -> Some(102L),
      "only-back" -> Some(102L),
      "only-fwd" -> Some(100L),
      "tie-to-past" -> Some(200L),
      "no-match" -> None))
  }

  test("asof output has exactly one row per left row") {
    val e = Tables.events(spark, sfDir)
    val out = AsofJoin.eventAsof(e)
    val purchases = e.filter($"event_type" === "purchase")
    assert(out.count() == purchases.count())
    assert(out.select("ev_id").distinct().count() == purchases.count())
  }

  test("time-bucketed asof: single hot key splits, output identical") {
    import org.apache.spark.sql.functions._
    // ONE key, 200 left + 150 right rows over ~7 hours: the plain form
    // puts all 350 rows in one window partition; hourly buckets split
    // them into 8 (key, bucket) groups, including left rows landing in
    // bucket gaps whose match must carry across several buckets.
    val left = (0 until 200)
      .map(i => (7L, ts(i * 131L), s"l$i")).toDF("k", "t", "name")
    val right = (0 until 150)
      .filter(i => i % 50 != 1) // punch holes -> cross-bucket carries
      .map(i => (7L, ts(i * 173L), i.toLong)).toDF("k", "t", "rid")
    val hourly: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => date_trunc("hour", t)
    val buckets = left.select(hourly($"t")).distinct().count()
    assert(buckets >= 7, s"fixture should span many buckets, got $buckets")
    val plain = AsofJoin.asof(left, right, "k", "t", Seq("rid"))
    val bucketed = AsofJoin.asof(left, right, "k", "t", Seq("rid"),
      timeBucket = Some(hourly))
    assert(bucketed.count() == left.count())
    assert(plain.exceptAll(bucketed).isEmpty &&
      bucketed.exceptAll(plain).isEmpty)
    // the heavy window really is partitioned by (key, bucket)
    val planStr = bucketed.queryExecution.executedPlan.toString
    assert(planStr.contains("__bkt"), "bucketed plan should key on __bkt")
  }

  test("timeBucket must be monotone: hour-of-day (wraps daily) diverges") {
    import org.apache.spark.sql.functions._
    // Rights on day 1 only (hours 0..23), lefts on day 2: every left's
    // true match is rid 23, the last right of day 1. `hour(t)` is NOT
    // monotone in time — it wraps at midnight — so a day-2 left in
    // wrapped bucket h finds day-1 hour-h's right IN ITS OWN bucket
    // (in-bucket stage, ordered by real time) and returns rid h
    // instead of 23. This pins WHY the docstring requires monotone
    // bucketing: the API cannot detect it, and the failure is silent
    // (same row count, wrong payloads).
    val left = (0 until 24)
      .map(i => (1L, ts(86400L + i * 3600L + 1800L), s"l$i"))
      .toDF("k", "t", "name")
    val right = (0 until 24)
      .map(i => (1L, ts(i * 3600L), i.toLong)).toDF("k", "t", "rid")
    val plain = AsofJoin.asof(left, right, "k", "t", Seq("rid"))
    val monotone = AsofJoin.asof(left, right, "k", "t", Seq("rid"),
      timeBucket = Some(t => date_trunc("hour", t)))
    val wrapping = AsofJoin.asof(left, right, "k", "t", Seq("rid"),
      timeBucket = Some(t => hour(t))) // non-monotone: wraps at midnight
    assert(plain.exceptAll(monotone).isEmpty &&
      monotone.exceptAll(plain).isEmpty,
      "monotone truncation must be exact")
    assert(!wrapping.exceptAll(plain).isEmpty,
      "a non-monotone bucket should diverge on multi-day data — if this " +
        "starts passing, the carry no longer depends on bucket order and " +
        "the docstring constraint can be relaxed")
    assert(wrapping.count() == left.count(),
      "the failure mode is silent: row count is unchanged")
  }

  test("time-bucketed asof equals plain on the events table") {
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, sfDir)
    val q = e.filter($"event_type" === "purchase")
      .select($"event_id".as("ev_id"), $"user_id", $"ts")
    val r = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("r_id"), $"ts".as("r_ts"))
    val plain = AsofJoin.asof(q, r, "user_id", "ts", Seq("r_id", "r_ts"))
    val bucketed = AsofJoin.asof(q, r, "user_id", "ts", Seq("r_id", "r_ts"),
      timeBucket = Some(t => date_trunc("hour", t)))
    assert(plain.exceptAll(bucketed).isEmpty &&
      bucketed.exceptAll(plain).isEmpty)
    assert(plain.count() > 0)
  }

  test("gap is non-negative and asof_ts <= ev_ts whenever matched") {
    val out = AsofJoin.eventAsof(Tables.events(spark, sfDir))
      .filter($"asof_id".isNotNull)
    assert(out.count() > 0)
    assert(out.filter($"gap_us" < 0).count() == 0)
    assert(out.filter($"asof_ts" > $"ev_ts").count() == 0)
  }
}
