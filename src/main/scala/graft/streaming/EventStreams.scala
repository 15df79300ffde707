package graft.streaming

import graft.functions.Tokenizer
import graft.operators.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming forms of the event/word-count analytics.
  *
  * The aggregation bodies are shared with the batch operators
  * ([[graft.operators.EventOps]]) — Spark's unified batch/stream
  * planning means the same logical transform runs incrementally with
  * state in the streaming case. Batch-vs-stream equivalence is pinned
  * in StreamingSpec.
  *
  * Scale posture: stateful aggs keyed by (window, event_type) — state
  * store size is bounded by watermark eviction; file sources split by
  * file, `maxFilesPerTrigger` bounds per-batch volume.
  */
object EventStreams {

  /** Schema of the events table (streaming file sources must declare
    * their schema up front — no inference race at scale). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming file source over an events parquet directory. */
  def readEvents(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Tumbling-window counts + value sums per event_type — the exact
    * batch aggregation body ([[EventOps.windowedCounts]]), run
    * incrementally. With `watermark` set, append-mode sinks emit each
    * window once it can no longer receive late rows, and rows older
    * than the watermark are dropped. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
      watermark: Option[String] = None): DataFrame =
    EventOps.windowedCounts(
      watermark.fold(events)(events.withWatermark("ts", _)), windowDur)

  /** The reference pipeline as a stream: word counts over a streaming
    * Dataset of text lines (S1->T2->A3/X4 of SURVEY.md §2, incremental).
    * Complete/update-mode sink; counts accumulate across batches
    * exactly as the reference accumulates across its input batches
    * (reference: /root/reference/src/main.cpp:146-178 batch loop). */
  def wordCountStream(lines: DataFrame, textCol: String = "value"): DataFrame =
    lines
      .select(Tokenizer.explodeTokens(col(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count("*").as("cnt"))
}
