package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffled storage so co-located joins and
  * aggregations skip the exchange entirely.
  *
  * At 100 TB the dominant cost of a recurring fact-fact join is
  * re-shuffling both sides every run. Writing each side `bucketBy` the
  * join key (same bucket count both sides) pays that shuffle ONCE at
  * write time; every subsequent join reads matching buckets pairwise —
  * `SortMergeJoin` with no `Exchange` under it (asserted in
  * BucketingSpec). `sortBy` within buckets also drops the per-run sort.
  *
  * Buckets are Spark's hash partitioning persisted: bucket id =
  * pmod(hashExpr(key), n). Pick n so one bucket of the BIG side fits an
  * executor's memory at target scale (e.g. 100 TB / 4096 buckets ≈
  * 25 GB per bucket pre-compression — size accordingly).
  */
object Bucketing {

  /** Persist `df` as a bucketed, bucket-sorted table at `path`
    * (external table: catalog entry + parquet buckets at the path). */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      key: String, buckets: Int): Unit =
    writeBucketed(df, tableName, path, Seq(key), buckets)

  /** Multi-column variant — bucket AND sort by the full key list (a
    * join on exactly these columns reads the table with no Exchange
    * and no Sort under it). */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty)
    // One file per bucket: repartition on the bucket keys into exactly
    // `buckets` partitions (repartition's Murmur3-pmod IS the bucket-id
    // function, so each task holds one whole bucket). With multiple
    // files per bucket Spark discards the sortBy metadata at read time
    // and re-sorts under every join — the one-file layout is what makes
    // the probe leg Sort-free, not just Exchange-free.
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Join two same-key same-count bucketed tables — planned without a
    * shuffle on either side. The merge hint pins SortMergeJoin (this
    * helper is for two BIG sides; if one side is broadcast-small, a
    * plain broadcast join needs no co-location in the first place). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), key)
}
