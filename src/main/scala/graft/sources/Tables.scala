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

  /** events.parquet stores ts as Parquet TIMESTAMP(NANOS), which Spark
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read it as a raw nanos
    * long via the legacy nanosAsLong conf, then truncate to micros —
    * the same wall-clock value DuckDB produces when it narrows ns to
    * its native µs timestamps, so the oracles line up exactly. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** TPC-H-ish star-schema tables (plain parquet, no normalization). */
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
