package graft.operators

import graft.functions.TextAnalysis._
import graft.functions.TextProfile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Document-level text-analysis queries over the `documents` table
  * (training-data pipeline extensions). All single-pass, narrow
  * projections (only `text`/`doc_id` reach the scan), no shuffles except
  * where an aggregation requires one — at 100 TB these are
  * embarrassingly parallel map stages plus one final sort/agg.
  */
object TextOps {

  /** Per-document token counts (whitespace + BPE-ish) and mean token
    * length — one single-pass [[graft.functions.TextProfile]] scan per
    * document (the two-step select keeps CollapseProject from
    * duplicating the non-cheap profile into every output column). */
  def textStats(docs: DataFrame): DataFrame = {
    val profile = ColumnBridge.column(
      TextProfile(ColumnBridge.expression(col("text"))))
    docs
      .select(col("doc_id"), profile.as("p"),
        length(col("text")).cast("long").as("n_chars_obs"))
      .select(
        col("doc_id"),
        col("p.n_tokens_ws").cast("long").as("n_tokens_ws"),
        col("p.n_tokens_bpe").cast("long").as("n_tokens_bpe"),
        col("n_chars_obs"),
        round(col("p.n_nonws").cast("double") / col("p.n_tokens_ws"), 4)
          .as("avg_token_len"),
      ).orderBy("doc_id")
  }

  /** Per-document quality features + composite score. */
  def textQuality(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val stopWords = graft.functions.TextAnalysis.LangStopwords.head._2
    val n = size(toks)
    val stopCnt = stopwordCount(toks, stopWords)
    docs.select(
      col("doc_id"),
      n.cast("long").as("n_tokens"),
      stopCnt.cast("long").as("stop_cnt"),
      round(stopCnt.cast("double") / n, 4).as("stop_ratio"),
      round(alphaRatio(col("text")), 4).as("alpha_ratio"),
      round(qualityScore(col("text")), 4).as("quality"),
    ).orderBy("doc_id")
  }

  /** Stopword-heuristic language ID next to the labeled lang. */
  def langIdQuery(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("lang"),
      langId(col("text")).as("lang_pred"),
    ).orderBy("doc_id")

  /** Whole-document fingerprints (exact-dedup keys). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      fingerprintMd5(col("text")).as("fp_md5"),
      fingerprintSha256(col("text")).as("fp_sha256"),
    ).orderBy("doc_id")

  /** Corpus stats by (lang, source): doc counts, char volume, mean
    * token count. One shuffle on the group keys; partial agg map-side. */
  def langStats(docs: DataFrame): DataFrame =
    docs.groupBy("lang", "source").agg(
      count("*").as("n_docs"),
      sum("n_chars").as("total_chars"),
      round(avg(tokenCountWs(col("text"))), 4).as("avg_tokens"),
    ).orderBy("lang", "source")
}
