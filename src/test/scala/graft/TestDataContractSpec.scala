package graft

import graft.sources.Tables
import org.apache.spark.sql.types._

/** Guards the contract between the driver-generated testdata and this
  * library's readers. The driver regenerates `/root/testdata` between
  * rounds and has already changed an encoding once (`events.ts` went
  * from Parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS), which silently
  * broke 19 queries and 26 tests in round 5). This suite pins the
  * post-normalization schema each reader must deliver, so the next
  * silent regeneration fails ONE named test here instead of scattering
  * analysis errors across every downstream suite.
  *
  * The `events` reader itself is encoding-tolerant (ns-as-long, µs
  * NTZ, or µs LTZ — see [[graft.sources.Tables.events]]); what this
  * spec asserts is the *normalized* contract: whatever is on disk,
  * consumers always see `ts: TimestampType` (LTZ, UTC session).
  */
class TestDataContractSpec extends SparkSpec {

  test("documents: expected columns and types") {
    val s = Tables.documents(spark, sfDir).schema
    assert(s("doc_id").dataType == LongType)
    assert(s("text").dataType == StringType)
    assert(s("lang").dataType == StringType)
    assert(s("source").dataType == StringType)
    assert(s("n_chars").dataType == LongType)
  }

  test("embeddings: vec_id long, embedding array<float>, label int") {
    val s = Tables.embeddings(spark, sfDir).schema
    assert(s("vec_id").dataType == LongType)
    assert(s("embedding").dataType == ArrayType(FloatType, containsNull = true))
    assert(s("label").dataType == IntegerType)
  }

  test("events: normalized ts is TIMESTAMP (LTZ) regardless of on-disk encoding") {
    val ev = Tables.events(spark, sfDir)
    val s = ev.schema
    assert(s("event_id").dataType == LongType)
    assert(s("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${s("ts").dataType}; " +
        "if the driver changed the parquet encoding again, extend the " +
        "sniff in graft.sources.Tables.events")
    assert(s("user_id").dataType == LongType)
    assert(s("event_type").dataType == StringType)
    assert(s("value").dataType == DoubleType)
    assert(s("props").dataType == StringType)
    // And it must survive the operations that broke in round 5:
    // unix_micros + interval arithmetic both need a real TIMESTAMP.
    val probe = ev.selectExpr(
      "unix_micros(ts) AS us",
      "unix_micros(ts - INTERVAL '5' MINUTE) AS us2").limit(1).collect()
    assert(probe.nonEmpty && probe.head.getLong(0) - probe.head.getLong(1) == 300000000L)
  }

  test("events: both ts encodings accepted (µs NTZ written file round-trips)") {
    // Write a tiny events slice with NTZ µs ts (what pandas/pyarrow
    // emit) and with LTZ ts (what Spark emits), read both back via
    // the sniffing reader, and require identical micros values.
    val tmp = java.nio.file.Files.createTempDirectory("graft-evt-contract").toString
    val base = Tables.events(spark, sfDir).limit(20).cache()
    val ltzDir = s"$tmp/ltz/events.parquet"
    val ntzDir = s"$tmp/ntz/events.parquet"
    base.write.mode("overwrite").parquet(ltzDir)
    base.selectExpr("event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(ntzDir)
    val ltz = Tables.events(spark, s"$tmp/ltz")
      .selectExpr("event_id", "unix_micros(ts) AS us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ntz = Tables.events(spark, s"$tmp/ntz")
      .selectExpr("event_id", "unix_micros(ts) AS us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ltz == ntz && ltz.size == 20)
    base.unpersist()
  }

  test("TPC-H-ish tables present with their join keys") {
    for ((t, key) <- Seq("region" -> "r_regionkey", "nation" -> "n_nationkey",
        "customer" -> "c_custkey", "supplier" -> "s_suppkey",
        "part" -> "p_partkey", "orders" -> "o_orderkey",
        "lineitem" -> "l_orderkey")) {
      val s = Tables.table(spark, sfDir, t).schema
      assert(s.fieldNames.contains(key), s"$t missing $key")
    }
  }
}
