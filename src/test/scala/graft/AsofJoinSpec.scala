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
