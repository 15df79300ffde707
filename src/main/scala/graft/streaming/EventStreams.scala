package graft.streaming

import java.sql.Timestamp

import graft.functions.Tokenizer
import graft.operators.EventOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Per-user running total — output row of [[EventStreams.userRunningCounts]]. */
final case class UserCount(user_id: Long, n_events: Long)

/** A closed per-user session — output row of [[EventStreams.userSessions]]. */
final case class UserSession(user_id: Long, s_start: Timestamp,
    s_end: Timestamp, n_events: Long)

/** State carried between micro-batches for one user's open session. */
final case class SessionState(start: Long, last: Long, n: Long)

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
    * their schema up front — no inference race at scale). `ts` is
    * declared as raw nanos (LongType): the source files store Parquet
    * TIMESTAMP(NANOS), which Spark can only read via the legacy
    * nanosAsLong conf — same normalization as the batch reader
    * ([[graft.sources.Tables.events]]). */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Post-normalization schema (ts as a proper timestamp). */
  val eventSchema: StructType = StructType(
    rawEventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampType) else f))

  /** Streaming file source over an events parquet directory, ts
    * normalized ns → µs exactly like the batch reader so batch and
    * stream agree to the microsecond. */
  def readEvents(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawEventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Streaming source over µs-timestamp event parquet (e.g. files this
    * engine wrote itself) — no nanos normalization needed. */
  def readEventsMicros(spark: SparkSession, path: String,
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

  /** Stream-stream interval join: purchases attributed to same-user
    * clicks in the preceding `window`, incrementally. Watermarks bound
    * BOTH sides' join state — clicks older than watermark - window can
    * never match a future purchase and are evicted; inner-join matches
    * emit as soon as both rows arrive (append mode). Identical join
    * predicate to the batch [[graft.operators.EventOps
    * .purchaseAttribution]], which StreamingSpec pins as its oracle. */
  def purchaseAttribution(events: DataFrame, window: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermarkDelay)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  /** Custom arbitrary state via `mapGroupsWithState`: per-user running
    * event totals carried across micro-batches. Run with
    * [[OutputMode.Update]] — each trigger emits only the users whose
    * totals changed. State is one long per user: at 10^9 users that is
    * GBs spread over the state store, partitioned by the groupBy key
    * like any shuffle. */
  def userRunningCounts(events: DataFrame): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          UserCount(user, n)
      }
  }

  /** Custom sessionization via `flatMapGroupsWithState` + event-time
    * timeout: semantics match the batch `session_window` gaps-and-
    * islands definition (session end = last event + gap). A session is
    * emitted when the watermark passes its end; still-open sessions
    * stay in state — exactly-once session output in append mode. The
    * built-in `session_window` covers the common case; this is the
    * template for state logic the built-ins can't express. */
  def userSessions(events: DataFrame, gapMinutes: Long = 30,
      watermarkDelay: String = "1 hour"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    // all state arithmetic in µs — java.sql.Timestamp.getTime would
    // floor to ms and drift from session_window's µs boundaries
    val gapUs = gapMinutes * 60000000L
    def tsOf(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    def close(user: Long, s: SessionState): UserSession =
      UserSession(user, tsOf(s.start), tsOf(s.last + gapUs), s.n)
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[(Long, Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Timestamp)],
            state: GroupState[SessionState]) =>
          if (!rows.hasNext && state.hasTimedOut) {
            // watermark passed the open session's end — close and emit
            val s = state.get
            state.remove()
            Iterator.single(close(user, s))
          } else {
            // fold this batch's events (sorted — micro-batches are not
            // ordered) into the open session, emitting any closed ones.
            // Strict < gap matches session_window's [start, end) bound.
            val ts = rows.map(_._2).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[UserSession]
            ts.foreach { t =>
              open = open match {
                case Some(s) if t - s.last < gapUs =>
                  Some(SessionState(s.start, t max s.last, s.n + 1))
                case Some(s) =>
                  closed += close(user, s)
                  Some(SessionState(t, t, 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire when the watermark passes session end (ms API)
              state.setTimeoutTimestamp((s.last + gapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
