package graft

import graft.operators.CorpusOps
import graft.sources.PostingsStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The stored-postings round trip (the DedupIndexStoreSpec contract
  * for text retrieval): phrase search served from the persisted
  * positional index equals the corpus-scan operator, from a fresh
  * session, and each phrase slot's scan of the bucketed index prunes
  * to a strict subset of the buckets (the term is a literal). */
class PostingsStoreSpec extends SparkSpec {

  private val phrase = Seq("window", "fast", "query")

  private def corpus(s: org.apache.spark.sql.SparkSession) =
    s.read.parquet(s"$sfDir/documents.parquet")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("stored postings: fresh-session phrase search == corpus-scan " +
      "operator; per-slot scans bucket-prune on the literal term") {
    val inline = rows(CorpusOps.phraseSearch(corpus(spark), phrase))
    assert(inline.nonEmpty, "fixture phrase must match documents")
    val idx = PostingsStore.writePostings(corpus(spark))
    val fresh = spark.newSession()
    val probe = PostingsStore.phraseSearch(fresh, idx, phrase)
    assert(rows(probe) == inline)
    probe.collect()
    val scans = allNodes(probe.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table == idx.table) => f
    }
    assert(scans.size >= phrase.length,
      s"expected one stored-index scan per phrase slot, got ${scans.size}")
    scans.foreach { f =>
      val pruned = f.optionalBucketSet
      assert(pruned.isDefined && pruned.get.cardinality() < 8,
        s"slot scan reads every bucket (no term pruning):\n$f")
    }
  }

  test("duplicate phrase terms and a no-match phrase behave") {
    val docs = corpus(spark)
    val idx = PostingsStore.writePostings(docs)
    // duplicate-term phrase: both forms agree (slots share postings)
    val dup = Seq("fast", "fast")
    assert(rows(PostingsStore.phraseSearch(spark, idx, dup)) ==
      rows(CorpusOps.phraseSearch(docs, dup)))
    // phrase with an absent term: empty both ways
    val none = Seq("window", "zzznotaword")
    assert(PostingsStore.phraseSearch(spark, idx, none).isEmpty &&
      CorpusOps.phraseSearch(docs, none).isEmpty)
  }
}
