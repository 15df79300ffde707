package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of join — for each left row, the most recent right
  * row with `rightTime <= leftTime` within the same key (the
  * trades/quotes lookup; Spark has no built-in).
  *
  * Implementation is the scale-correct union-tag pattern, NOT a range
  * join: both sides are stacked (right rows tagged 0, left rows tagged
  * 1), sorted per key by (time, tag), and the right row's payload is
  * carried forward with `last(ignoreNulls) OVER (... ROWS UNBOUNDED
  * PRECEDING)`. That is ONE hash shuffle on the key + a per-partition
  * sort — while a naive `l JOIN r ON key AND rt <= lt` + max-filter
  * explodes to O(n·m) pairs per key before pruning, and a broadcast
  * range join caps the right side's size. Ties (rt == lt) resolve to
  * "included", matching DuckDB's `ASOF ... ON l.t >= r.t`.
  *
  * At 100 TB: the shuffle carries each row exactly once; per-key data
  * is sort-spilled by the window operator, so a hot key degrades to a
  * disk sort, not an OOM. Time-bucketed pre-partitioning (carrying the
  * last row of the previous bucket forward) is the next refinement if
  * single keys exceed a partition.
  */
object AsofJoin {

  /** Generic form: returns `left`'s columns plus `asof_<p>` for each
    * payload column `p`, taken from the latest right row at-or-before
    * the left row's time; null when no right row precedes.
    *
    * @param left    query side (one output row per input row)
    * @param right   reference side; must carry `key`, `time`, and the
    *                `payload` columns (payload names must not collide
    *                with `key`/`time` or left's columns)
    */
  def asof(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame = {
    val lOther = left.columns.filterNot(c => c == key || c == time).toList
    // ONE struct carries the whole right-row payload: a per-column
    // last(ignoreNulls) would skip a null field independently and stitch
    // fields from DIFFERENT right rows when payload values are nullable.
    // The struct itself is never null for right rows (even if every
    // field is), so last(ignoreNulls) always picks one whole row.
    val payloadType = StructType(payload.map(c => right.schema(c)))
    val rTagged = right.select(
      col(key) :: col(time) :: lit(0).as("__tag") ::
        struct(payload.map(col): _*).as("__p") ::
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      col(key) :: col(time) :: lit(1).as("__tag") ::
        lit(null).cast(payloadType).as("__p") ::
        lOther.map(col): _*)
    // tie-break right-vs-right rows at equal time by the payload struct
    // so `last` is deterministic (left rows sort after either way —
    // their tag is higher).
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__tag").asc, col("__p").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__last_p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        (col(key) :: col(time) :: lOther.map(col)) ++
          payload.map(c => col(s"__last_p.$c").as(s"asof_$c")): _*)
  }

  /** Event-stream application: each `queryType` event joined to the
    * same user's most recent `refType` event at-or-before it, with the
    * gap in whole microseconds (null when the user never did `refType`
    * before). The gap is an exact BIGINT — a seconds-double rounded to
    * 4 places differs between engines on exact half-values (HALF_UP vs
    * HALF_EVEN), so the µs-native integer is the engine-neutral form. */
  def eventAsof(events: DataFrame, queryType: String = "purchase",
      refType: String = "click"): DataFrame = {
    val q = events.filter(col("event_type") === queryType)
      .select(col("event_id").as("ev_id"), col("user_id"), col("ts"))
    val r = events.filter(col("event_type") === refType)
      .select(col("user_id"), col("ts"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))
    asof(q, r, key = "user_id", time = "ts", payload = Seq("r_id", "r_ts"))
      .select(col("ev_id"), col("user_id"), col("ts").as("ev_ts"),
        col("asof_r_id").as("asof_id"), col("asof_r_ts").as("asof_ts"),
        (unix_micros(col("ts")) - unix_micros(col("asof_r_ts"))).as("gap_us"))
      .orderBy("ev_id")
  }
}
