package graft.sources

import graft.operators.CorpusOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted positional postings — the text-retrieval member of the
  * stored-index family ([[DedupIndexStore]], [[AnnIndexStore]]). The
  * full (term, doc_id, positions) inverted index is built from the
  * corpus ONCE and persisted bucketed by term, alongside the per-doc
  * token-length side table (the norms file of a classic search index,
  * bucketed by doc_id). Queries then serve from storage without
  * touching the corpus:
  *
  *  - [[phraseSearch]]: each phrase slot's scan carries a literal term
  *    the bucketed layout prunes to one bucket (SelectedBucketsCount —
  *    spec-pinned); per-slot input is the term's document frequency.
  *  - [[bm25Search]]: tf from posting-list lengths (term-set scan,
  *    bucket-pruned), dl and the corpus scalars from doclens — whose
  *    join leg reads with no Exchange and no Sort (bucket layout ==
  *    join layout), so only the |terms|-scale probe rows shuffle.
  *  - [[refreshPostings]]: fold accepted documents in by id-level
  *    merge — the base corpus is never re-read, and unlike the banded
  *    dedup indexes there is NO cap caveat: refresh == rebuild
  *    exactly.
  *
  * At 100 TB this is the difference between a phrase/retrieval query
  * costing a corpus tokenize and costing a few posting lists. Same
  * build-once registry, table naming, and exit-sweep conventions as
  * [[DedupIndexStore]] (shared via its `table` helper). */
object PostingsStore {

  final case class PostingsIndex(table: String, doclensTable: String)

  /** Persist the corpus's full positional index bucketed by term plus
    * its doclens side table bucketed by doc_id. The one corpus read of
    * the index lifecycle. */
  def writePostings(docs: DataFrame, buckets: Int = 8): PostingsIndex = {
    val key = DedupIndexStore.identityKey(docs)
    val params = s"pt|$buckets"
    PostingsIndex(
      DedupIndexStore.table("postings", key, params, Seq("term"),
        buckets)(CorpusOps.postingsRows(docs)),
      DedupIndexStore.table("doclens", key, params, Seq("doc_id"),
        buckets)(CorpusOps.doclensRows(docs)))
  }

  /** Exact consecutive-phrase search served FROM the stored index —
    * output identical to [[CorpusOps.phraseSearch]] over the same
    * corpus. */
  def phraseSearch(spark: SparkSession, idx: PostingsIndex,
      phrase: Seq[String]): DataFrame =
    CorpusOps.phraseFromPostings(spark.table(idx.table), phrase)

  /** Proximity co-occurrence served FROM the stored index — output
    * identical to [[CorpusOps.proximitySearch]] over the same corpus;
    * two bucket-pruned literal-term scans, pure array arithmetic. */
  def proximitySearch(spark: SparkSession, idx: PostingsIndex,
      anchor: String, near: String, window: Int): DataFrame =
    CorpusOps.proximityFromPostings(spark.table(idx.table), anchor,
      near, window)

  /** Okapi BM25 top-k served FROM the stored index — output identical
    * to [[CorpusOps.bm25]] over the same corpus. The doclens leg of
    * the dl join carries a merge hint and reads in its stored bucket
    * order, so it plans with no Exchange and no Sort. */
  def bm25Search(spark: SparkSession, idx: PostingsIndex,
      terms: Seq[String], k: Int = 10): DataFrame = {
    DedupIndexStore.enableBucketedSortOrder(spark)
    CorpusOps.bm25FromPostings(spark.table(idx.table),
      spark.table(idx.doclensTable).hint("merge"), terms, k)
  }

  /** Fold newly accepted documents into a stored postings index — the
    * maintenance half of the lifecycle (build once → serve → REFRESH
    * per accepted ingest). Id-level merge: the stored lists explode
    * back to (term, doc_id, pos) rows, the accepted batch's rows union
    * in (the only tokenize work), and the regroup reproduces EXACTLY
    * what a from-scratch build over (base ∪ accepted) would emit —
    * even for a re-ingested doc_id — because the grouping is the same;
    * doclens merges by id-level sum. No cap caveat (nothing is ever
    * dropped from a postings index). Writes NEW versioned tables — the
    * old version stays readable until swept. */
  def refreshPostings(spark: SparkSession, idx: PostingsIndex,
      accepted: DataFrame, buckets: Int = 8): PostingsIndex = {
    val key = DedupIndexStore.identityKey(accepted)
      .map(k => s"refresh|${idx.table}|$k")
    val params = s"pt|$buckets"
    PostingsIndex(
      DedupIndexStore.table("postings_r", key, params, Seq("term"),
        buckets)(
        spark.table(idx.table)
          .select(col("term"), col("doc_id"),
            explode(col("positions")).as("pos"))
          .unionByName(CorpusOps.postingRowsFlat(accepted))
          .groupBy("term", "doc_id")
          .agg(sort_array(collect_list(col("pos"))).as("positions"))),
      DedupIndexStore.table("doclens_r", key, params, Seq("doc_id"),
        buckets)(
        spark.table(idx.doclensTable)
          .unionByName(CorpusOps.doclensRows(accepted))
          .groupBy("doc_id").agg(sum("dl").as("dl"))))
  }
}
