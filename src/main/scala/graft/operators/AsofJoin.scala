package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of join — for each left row, the most recent right
  * row with `rightTime <= leftTime` within the same key (the
  * trades/quotes lookup; Spark has no built-in). `forward = true`
  * flips the direction: the EARLIEST right row with `rightTime >=
  * leftTime` (the next-event lookup — kdb's `aj` family covers both;
  * DuckDB oracles it as `ASOF ... ON l.t <= r.t`). Every stage below
  * is direction-symmetric: forward runs the identical plan with the
  * time (and bucket) orderings reversed and the per-bucket summary
  * taking the min rather than the max.
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
  * disk sort, not an OOM. When even the spilled sort of one key is too
  * big, opt into `timeBucket`: partitions become (key, bucket) — a hot
  * key splits across as many partitions as it spans buckets — and the
  * last right row of each bucket is carried forward through a
  * bucket-GRANULARITY window (rows = distinct (key, bucket), orders of
  * magnitude smaller than the event stream). Output is identical to
  * the unbucketed join (spec-pinned).
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
    * @param timeBucket hot-key refinement (see [[asofBucketed]]). The
    *                function MUST be monotone non-decreasing in time —
    *                a truncation like `date_trunc("hour", _)` or
    *                `unix_micros(_) / width`. The carry stage orders
    *                buckets by their VALUE and assumes earlier time ⇒
    *                same-or-earlier bucket; a non-monotone bucketing
    *                (e.g. `hour(_)`, which wraps daily) silently
    *                returns wrong matches (spec-pinned in
    *                AsofJoinSpec). Truncations of the time axis are
    *                monotone by construction — use those.
    */
  def asof(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String],
      timeBucket: Option[org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column] = None,
      forward: Boolean = false): DataFrame = {
    timeBucket match {
      case Some(b) => asofBucketed(left, right, key, time, payload, b, forward)
      case None => asofPlain(left, right, key, time, payload, forward)
    }
  }

  private def asofPlain(left: DataFrame, right: DataFrame, key: String,
      time: String, payload: Seq[String], forward: Boolean): DataFrame = {
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
    // forward = the same carry with time reversed: rights of equal
    // time still sort before lefts (tag asc), so a tie (rt == lt) is
    // included in both directions. The payload tie-break flips with
    // the direction so the window's choice at equal times equals the
    // bucketed path's boundary aggregate (max(struct) backward /
    // min(struct) forward).
    val tOrd = if (forward) col(time).desc else col(time).asc
    val pOrd = if (forward) col("__p").desc_nulls_last
      else col("__p").asc_nulls_last
    val w = Window.partitionBy(key)
      .orderBy(tOrd, col("__tag").asc, pOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__last_p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        (col(key) :: col(time) :: lOther.map(col)) ++
          payload.map(c => col(s"__last_p.$c").as(s"asof_$c")): _*)
  }

  /** Hot-key refinement: the same as-of semantics with the heavy
    * window partitioned by (key, bucket(time)) instead of key alone —
    * a single hot key splits across as many partitions as it spans
    * buckets. Three stages:
    *
    *  1. IN-BUCKET: the union-tag window of [[asofPlain]], partitioned
    *     by (key, bucket) — resolves every left row with a right
    *     predecessor in its own bucket.
    *  2. CARRY: per (key, bucket), the latest right payload —
    *     max(struct(time, payload)), the same (time, payload-struct)
    *     tie-break as the window sort — then a bucket-granularity
    *     union-tag window carries the latest PRECEDING bucket's last
    *     payload to each left bucket (left bucket rows sort before
    *     same-bucket summaries: a left row must not see its own
    *     bucket's future rights — those are already correct from
    *     stage 1 or genuinely after it).
    *  3. STITCH: left rows missing an in-bucket match take the carry.
    *
    * Cost: the event-sized shuffles are keyed by (key, bucket); the
    * only key-wide window runs over distinct (key, bucket) rows.
    * Result is identical to [[asofPlain]] by construction — PROVIDED
    * `bucket` is monotone non-decreasing in time: stage 2 orders by
    * bucket value, so "earlier bucket value" must imply "earlier
    * time". With a monotone bucket, a right row in an earlier bucket
    * always precedes a left row in a later one, and in-bucket
    * resolution handles the rest; with a non-monotone one (hour-of-day
    * wraps at midnight) the carry reads from the wrong buckets. */
  private def asofBucketed(left: DataFrame, right: DataFrame, key: String,
      time: String, payload: Seq[String],
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      forward: Boolean = false): DataFrame = {
    val lOther = left.columns.filterNot(c => c == key || c == time).toList
    val payloadType = StructType(payload.map(c => right.schema(c)))
    val rTagged = right.select(
      col(key) :: col(time) :: bucket(col(time)).as("__bkt") ::
        lit(0).as("__tag") :: struct(payload.map(col): _*).as("__p") ::
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      col(key) :: col(time) :: bucket(col(time)).as("__bkt") ::
        lit(1).as("__tag") :: lit(null).cast(payloadType).as("__p") ::
        lOther.map(col): _*)
    val tOrd = if (forward) col(time).desc else col(time).asc
    val pOrd = if (forward) col("__p").desc_nulls_last
      else col("__p").asc_nulls_last
    val w1 = Window.partitionBy(key, "__bkt")
      .orderBy(tOrd, col("__tag").asc, pOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = rTagged.unionByName(lTagged)
      .withColumn("__in_p", last(col("__p"), ignoreNulls = true).over(w1))
      .filter(col("__tag") === 1)
    // boundary right payload per (key, bucket): max over
    // (time, payload) replicates the window's last-row choice
    // including ties; forward takes the min — the bucket's EARLIEST
    // right is what a preceding-in-time left must see
    val bucketAgg = if (forward) min(struct(col(time), col("__p")))
      else max(struct(col(time), col("__p")))
    val bucketLast = rTagged
      .groupBy(col(key), col("__bkt"))
      .agg(bucketAgg.as("__tp"))
      .select(col(key), col("__bkt"), lit(1).as("__btag"),
        col("__tp").getField("__p").as("__bl"))
    val leftBuckets = lTagged.select(col(key), col("__bkt")).distinct()
      .select(col(key), col("__bkt"), lit(0).as("__btag"),
        lit(null).cast(payloadType).as("__bl"))
    val bOrd = if (forward) col("__bkt").desc else col("__bkt").asc
    val w2 = Window.partitionBy(key)
      .orderBy(bOrd, col("__btag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = bucketLast.unionByName(leftBuckets)
      .withColumn("__prev_p", last(col("__bl"), ignoreNulls = true).over(w2))
      .filter(col("__btag") === 0)
      .select(col(key), col("__bkt"), col("__prev_p"))
    inBucket.join(carry, Seq(key, "__bkt"), "left")
      .withColumn("__last_p", coalesce(col("__in_p"), col("__prev_p")))
      .select(
        (col(key) :: col(time) :: lOther.map(col)) ++
          payload.map(c => col(s"__last_p.$c").as(s"asof_$c")): _*)
  }

  /** NEAREST as-of: for each left row, whichever of the latest
    * at-or-before / earliest at-or-after right rows is closer in
    * time — ties (equidistant matches) go to the PAST match, so the
    * result is deterministic. Composed from the two directional
    * passes joined back on the left row's identity: two windows over
    * the same key shuffle, still no pair join anywhere.
    *
    * Left rows must be unique as full rows (carry an id — the usual
    * event_id shape); exact duplicates would multiply through the
    * identity join. `rightTimeCol` names the payload column carrying
    * the right row's own time (needed to measure each candidate's
    * distance); it must be one of `payload`. Output matches
    * [[asof]]'s shape. */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
      time: String, payload: Seq[String],
      rightTimeCol: String): DataFrame = {
    require(payload.contains(rightTimeCol),
      s"rightTimeCol $rightTimeCol must be one of payload $payload")
    val leftCols = left.columns.toSeq
    val back = asof(left, right, key, time, payload)
    val fwd = asof(left, right, key, time, payload, forward = true)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"asof_$c").as(s"__fwd_$c")): _*)
    // a missing match in either direction is infinitely far
    val bGap = unix_micros(col(time)) -
      unix_micros(col(s"asof_$rightTimeCol"))
    val fGap = unix_micros(col(s"__fwd_$rightTimeCol")) -
      unix_micros(col(time))
    val pickBack = col(s"asof_$rightTimeCol").isNotNull &&
      (col(s"__fwd_$rightTimeCol").isNull || bGap <= fGap)
    payload.foldLeft(back.join(fwd, leftCols)) { case (df, c) =>
      df.withColumn(s"asof_$c",
        when(pickBack, col(s"asof_$c")).otherwise(col(s"__fwd_$c")))
    }.drop(payload.map(c => s"__fwd_$c"): _*)
  }

  /** [[asofNearest]] over the event stream: each `queryType` event
    * joined to the same user's CLOSEST `refType` event in either
    * direction, gap emitted as the non-negative distance. */
  def eventAsofNearest(events: DataFrame, queryType: String = "click",
      refType: String = "purchase"): DataFrame = {
    val q = events.filter(col("event_type") === queryType)
      .select(col("event_id").as("ev_id"), col("user_id"), col("ts"))
    val r = events.filter(col("event_type") === refType)
      .select(col("user_id"), col("ts"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))
    asofNearest(q, r, key = "user_id", time = "ts",
      payload = Seq("r_id", "r_ts"), rightTimeCol = "r_ts")
      .select(col("ev_id"), col("user_id"), col("ts").as("ev_ts"),
        col("asof_r_id").as("asof_id"), col("asof_r_ts").as("asof_ts"),
        abs(unix_micros(col("ts")) - unix_micros(col("asof_r_ts")))
          .as("gap_us"))
      .orderBy("ev_id")
  }

  /** Event-stream application: each `queryType` event joined to the
    * same user's most recent `refType` event at-or-before it, with the
    * gap in whole microseconds (null when the user never did `refType`
    * before). The gap is an exact BIGINT — a seconds-double rounded to
    * 4 places differs between engines on exact half-values (HALF_UP vs
    * HALF_EVEN), so the µs-native integer is the engine-neutral form. */
  def eventAsof(events: DataFrame, queryType: String = "purchase",
      refType: String = "click",
      timeBucket: Option[org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column] = None,
      forward: Boolean = false): DataFrame = {
    val q = events.filter(col("event_type") === queryType)
      .select(col("event_id").as("ev_id"), col("user_id"), col("ts"))
    val r = events.filter(col("event_type") === refType)
      .select(col("user_id"), col("ts"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))
    // the gap is emitted non-negative in both directions: time TO the
    // match looking forward, time SINCE the match looking back
    val gap =
      if (forward) unix_micros(col("asof_r_ts")) - unix_micros(col("ts"))
      else unix_micros(col("ts")) - unix_micros(col("asof_r_ts"))
    asof(q, r, key = "user_id", time = "ts", payload = Seq("r_id", "r_ts"),
      timeBucket = timeBucket, forward = forward)
      .select(col("ev_id"), col("user_id"), col("ts").as("ev_ts"),
        col("asof_r_id").as("asof_id"), col("asof_r_ts").as("asof_ts"),
        gap.as("gap_us"))
      .orderBy("ev_id")
  }
}
