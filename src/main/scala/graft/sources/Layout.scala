package graft.sources

import graft.functions.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-layout clustering for write-time optimization.
  *
  * At 100 TB the scan is the dominant cost, and the lever on scans is
  * SKIPPING: engines prune parquet files/row groups whose min-max
  * statistics cannot satisfy the predicate. This module owns the
  * write-side of that bargain — producing layouts whose per-file
  * statistics are tight for the query columns:
  *
  *   - [[writeSorted]]: single-column (lexicographic) clustering —
  *     range-partition + sort; optimal for predicates on the leading
  *     column, useless for the others.
  *   - [[writeZOrdered]]: multi-column clustering on the Morton curve
  *     ([[graft.functions.ZOrder]]) — every clustered column gets
  *     usable (if looser) per-file bounds, so multi-dimensional range
  *     predicates skip most files.
  *
  * Both writers are fully distributed: `repartitionByRange` samples the
  * sort key (one extra pass over the key column only), then each task
  * sorts and writes its own range — no driver materialization, no
  * global sort barrier beyond the range exchange. `numFiles` plays the
  * role of the target file size at real scale (pick bytes/file, derive
  * the count).
  */
object Layout {

  /** Write `df` clustered by the interleaved z-value of `cols`. The
    * temporary key column never reaches the files. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 21): Unit = {
    df.withColumn("__z", ZOrder.zvalue(cols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` clustered lexicographically by `cols` (the
    * single-dimension baseline the spec contrasts against). */
  def writeSorted(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min, max] statistics of `cols` for a written parquet
    * directory — exactly the information a stats-based pruner uses,
    * recomputed from the data (via input_file_name) so the witness is
    * engine-neutral. One row per file: (file, c_min, c_max per col). */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Compaction planning — the table-maintenance step that turns a
    * small-files mess into target-size files: files ordered by their
    * layout key are binned into groups by the running byte total,
    * `group = cum_bytes_before DIV targetBytes` — consecutive files
    * land in the same group until it fills, so each group rewrites to
    * ~targetBytes and the layout's key-order clustering SURVIVES the
    * compaction (bin-packing by size alone would scramble the min-max
    * stats the layout bought). The prefix sum is the distributed
    * [[graft.operators.TrainingOps.packSequences]] shape:
    * range-partition on the order key, per-partition cumsum,
    * broadcast per-partition offsets — no single-partition window, so
    * planning a million-file table is itself distributed.
    *
    * Input: any (fileCol, bytesCol) relation (e.g. a catalog file
    * listing). Output: one row per file with its group and position —
    * the rewrite job's work list. */
  def planCompaction(files: DataFrame, targetBytes: Long,
      fileCol: String = "file",
      bytesCol: String = "bytes"): DataFrame = {
    require(targetBytes > 0)
    val narrow = files.select(col(fileCol).as("file"),
      col(bytesCol).cast("long").as("bytes"))
    val (withCum, _) = graft.operators.PrefixSum.exclusive(narrow,
      Seq(col("file")), col("bytes"))
    withCum
      .select(col("file"), col("bytes"),
        expr(s"cum0 DIV $targetBytes").as("group_id"),
        col("cum0"))
      .orderBy("file")
  }

  /** How many files of `path` a stats-based pruner must READ for an
    * axis-aligned box predicate `lo(c) <= c <= hi(c)`: files whose
    * [min, max] box intersects the query box. The complement is the
    * skipped-file count — the number the layout exists to maximize. */
  def filesIntersecting(spark: org.apache.spark.sql.SparkSession,
      path: String, box: Map[String, (Long, Long)]): Long = {
    val pred = box.map { case (c, (lo, hi)) =>
      col(s"${c}_max") >= lo && col(s"${c}_min") <= hi
    }.reduce(_ && _)
    fileStats(spark, path, box.keys.toSeq).filter(pred).count()
  }
}
