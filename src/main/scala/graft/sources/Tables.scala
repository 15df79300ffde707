package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the test-data tables (`/root/testdata/sf*`). One place
  * owns each table's read-time normalization so every query, test, and
  * bench sees the same schema.
  */
object Tables {

  def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** events.parquet has shipped with `ts` in two encodings over time:
    * Parquet TIMESTAMP(NANOS) — which Spark rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless read as a raw long via the legacy
    * nanosAsLong conf — and plain TIMESTAMP(MICROS). Sniff the loaded
    * type instead of assuming: a LongType `ts` is the nanos path and
    * gets truncated to µs (the same wall-clock value DuckDB produces
    * when it narrows ns to its native µs timestamps, so the oracles
    * line up exactly); a timestamp `ts` passes through unchanged. */
  def events(s: SparkSession, dir: String): DataFrame = {
    // The NTZ→TIMESTAMP cast below is value-preserving ONLY under a
    // UTC session; any other zone would silently shift every event
    // time away from the DuckDB oracles. Pin it here (the one place
    // that owns the cast) rather than trusting every entry point.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // µs files infer as TIMESTAMP_NTZ; downstream operators use
        // unix_micros/interval arithmetic, which want TIMESTAMP. All
        // sessions run with session.timeZone=UTC, so the cast keeps
        // the stored micros value bit-for-bit.
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** TPC-H-ish star-schema tables (plain parquet, no normalization). */
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
