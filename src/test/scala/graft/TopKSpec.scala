package graft

import graft.functions.GroupTopK
import graft.operators.EventOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import scala.util.Random

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def topK(k: Int) = ColumnBridge.column(GroupTopK(
    ColumnBridge.expression(col("key")),
    ColumnBridge.expression(col("val")), k).toAggregateExpression())

  test("top-k equals the brute-force (val DESC, key ASC) head on random data") {
    val rnd = new Random(42)
    val rows = Seq.fill(500)((rnd.nextInt(3).toLong,
      rnd.nextInt(40).toLong, rnd.nextInt(10).toLong))
    val df = rows.toDF("g", "key", "val")
    val got = df.groupBy("g").agg(topK(5).as("top"))
      .select(col("g"), explode(col("top")).as("kv"))
      .select(col("g"), col("kv.key"), col("kv.val"))
      .as[(Long, Long, Long)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy { case (k, v) => (-v, k) }.take(5)
        .map { case (k, v) => (g, k, v) }
    }
    assert(got.sorted == want.sorted)
  }

  test("partition-invariant: 1-partition and 13-partition inputs agree") {
    val rnd = new Random(7)
    val rows = Seq.fill(2000)((rnd.nextInt(4).toLong,
      rnd.nextInt(1000).toLong, rnd.nextInt(20).toLong))
    val df = rows.toDF("g", "key", "val")
    def run(parts: Int) =
      df.repartition(parts).groupBy("g").agg(topK(7).as("top"))
        .select(col("g"), col("top"))
        .as[(Long, Seq[(Long, Long)])].collect().toMap
    // many val-ties at 20 distinct values: the key ASC tie-break must
    // make the answer independent of which partition saw which row
    assert(run(1) == run(13))
  }

  test("duplicate (key,val) rows do not evict distinct entries") {
    // selection semantics: 3 copies of (1,5) fill nothing — the heap
    // holds ROWS, and equal rows are interchangeable, so top-2 is
    // (1,5) twice, not (1,5) then (2,4)
    val df = Seq((0L, 1L, 5L), (0L, 1L, 5L), (0L, 1L, 5L), (0L, 2L, 4L))
      .toDF("g", "key", "val")
    val got = df.groupBy("g").agg(topK(2).as("top"))
      .select(explode(col("top")).as("kv"))
      .select(col("kv.key"), col("kv.val")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L), (1L, 5L)))
  }

  test("null keys and null values are skipped, not ranked") {
    val df = Seq((Some(1L), Some(10L)), (None, Some(99L)), (Some(2L), None),
      (Some(3L), Some(5L))).toDF("key", "val").withColumn("g", lit(0L))
    val got = df.groupBy("g").agg(topK(3).as("top"))
      .select(explode(col("top")).as("kv"))
      .select(col("kv.key"), col("kv.val")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (3L, 5L)))
  }

  test("aggregate form reproduces the window form on the events table") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val viaWindow = EventOps.topUsersPerType(events, 5).collect().toSeq
    val viaAgg = EventOps.topUsersPerTypeAgg(events, 5).collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("SQL registration: graft_top_k(key, val, k)") {
    graft.functions.GraftFunctions.register(spark)
    Seq((0L, 10L, 3L), (0L, 11L, 9L), (0L, 12L, 9L), (0L, 13L, 1L))
      .toDF("g", "key", "val").createOrReplaceTempView("topk_in")
    val got = spark.sql(
      "SELECT graft_top_k(key, val, 2) AS top FROM topk_in GROUP BY g")
      .select(explode(col("top")).as("kv"))
      .select(col("kv.key"), col("kv.val")).as[(Long, Long)].collect().toSeq
    // tie at val 9 resolves to the smaller key first
    assert(got == Seq((11L, 9L), (12L, 9L)))
  }
}
