package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed global prefix-sum scaffold — THE pattern every
  * global-order operator here is built on (shard ranks, token
  * offsets, perplexity ranks, compaction byte totals). Spark plans an
  * unpartitioned cumulative window as a single-partition WindowExec —
  * every row on one task, the canonical 100 TB anti-pattern — so
  * instead: range-partition on the order key (partition ids then
  * follow key order), accumulate locally per partition, and add
  * broadcast per-partition offsets. Only the caller's (narrow)
  * columns ride the exchanges.
  *
  * Extracted after the fourth copy of the scaffold; the callers
  * ([[TrainingOps.trainingShards]], [[TrainingOps.packSequences]],
  * [[TrainingOps.perplexityBuckets]],
  * [[graft.sources.Layout.planCompaction]]) differ only in order key
  * and summed value.
  */
object PrefixSum {

  /** Adds `cum0` — the EXCLUSIVE prefix sum of `value` over `df` in
    * the ascending total order of `orderCols` (callers must pass a
    * total order; ties would make the sum nondeterministic). With
    * `value = lit(1L)`, `cum0` is the 0-based global rank. Returns
    * the augmented rows plus the one-row grand total (from the
    * per-partition offsets relation, so no extra pass over `df`). */
  def exclusive(df: DataFrame, orderCols: Seq[Column],
      value: Column): (DataFrame, DataFrame) = {
    require(orderCols.nonEmpty)
    Seq("__pid", "__v", "__lcum", "cum0").foreach(c =>
      require(!df.columns.contains(c), s"input already has a $c column"))
    val parted = df
      .repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
    val wLocal = Window.partitionBy("__pid")
      .orderBy(orderCols.map(_.asc): _*)
    val local = parted.withColumn("__lcum",
      coalesce(sum("__v").over(wLocal.rowsBetween(
        Window.unboundedPreceding, -1)), lit(0L)))
    // per-partition totals -> exclusive offsets: a numPartitions-row
    // relation, so the unpartitioned cumsum window is over ~dozens of
    // rows (the acceptable place for one — and the source of the
    // harmless WindowExec single-partition warning), join broadcast
    val offsets = local.groupBy("__pid").agg(sum("__v").as("__pn"))
      .withColumn("__off",
        coalesce(sum("__pn").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val total = offsets.agg(sum("__pn").as("total"))
    val out = local
      .join(broadcast(offsets.select("__pid", "__off")), "__pid")
      .withColumn("cum0", col("__off") + col("__lcum"))
      .drop("__pid", "__v", "__lcum", "__off")
    (out, total)
  }
}
