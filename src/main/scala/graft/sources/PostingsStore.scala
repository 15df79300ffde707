package graft.sources

import graft.operators.CorpusOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted positional postings — the text-retrieval member of the
  * stored-index family ([[DedupIndexStore]], [[AnnIndexStore]]). The
  * full (term, doc_id, positions) inverted index is built from the
  * corpus ONCE and persisted bucketed by term; phrase queries then
  * serve from the stored relation without touching the corpus, and
  * each phrase slot's scan carries a literal term filter the bucketed
  * layout prunes to one bucket (SelectedBucketsCount — spec-pinned).
  * Per-slot input is the term's document frequency, not the corpus:
  * at 100 TB the difference between a phrase query costing a corpus
  * tokenize and costing a few posting lists. Same build-once registry
  * and exit-sweep conventions as [[DedupIndexStore]]. */
object PostingsStore {

  final case class PostingsIndex(table: String)

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val seq = new java.util.concurrent.atomic.AtomicInteger()

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)

  /** Persist the corpus's full positional index bucketed by term. */
  def writePostings(docs: DataFrame, buckets: Int = 8): PostingsIndex = {
    def write(name: String): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-idx-$name").toString
      DedupIndexStore.sweepAtExit(dir)
      Bucketing.writeBucketed(CorpusOps.postingsRows(docs), name, dir,
        Seq("term"), buckets)
      name
    }
    PostingsIndex(DedupIndexStore.identityKey(docs) match {
      case Some(k) =>
        val name = s"graft_idx_postings_${md5(k + s"|pt|$buckets")}"
        built.computeIfAbsent(name, write)
      case None =>
        write(s"graft_idx_postings_tmp${seq.incrementAndGet()}")
    })
  }

  /** Exact consecutive-phrase search served FROM the stored index —
    * output identical to [[CorpusOps.phraseSearch]] over the same
    * corpus. */
  def phraseSearch(spark: SparkSession, idx: PostingsIndex,
      phrase: Seq[String]): DataFrame =
    CorpusOps.phraseFromPostings(spark.table(idx.table), phrase)
}
