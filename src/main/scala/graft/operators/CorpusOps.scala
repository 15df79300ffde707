package graft.operators

import graft.functions.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the training-data pipeline:
  * deterministic sampling, TF-IDF keyword extraction, Gopher-style
  * repetition/quality gates, and PII redaction. All are narrow
  * map/agg shapes — no driver-side loops, nothing that doesn't
  * partition — and every ratio-threshold comparison is computed in
  * INTEGER cross-multiplied form so the DuckDB oracle matches
  * bit-for-bit (a rounded ratio with a power-of-two denominator lands
  * on exact half-values where the engines' rounding modes disagree).
  */
object CorpusOps {

  // ---- deterministic sampling ----------------------------------------

  /** Stratified deterministic downsampling: keep a row iff the
    * engine-neutral 60-bit md5 hash of its `keyCol` mod 100 falls
    * under the stratum's percentage. Hash-threshold sampling (vs
    * `rand()`) is reproducible across runs/retries/engines, stable
    * under repartitioning, and needs no shuffle — the standard way to
    * downsample a dominant language/source in a 100 TB corpus. */
  def stratifiedHashSample(docs: DataFrame, rates: Map[String, Int],
      defaultPct: Int, stratumCol: String = "lang",
      keyCol: String = "doc_id"): DataFrame = {
    require(defaultPct >= 0 && defaultPct <= 100 &&
      rates.values.forall(p => p >= 0 && p <= 100))
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs
      .filter(pmod(md5Hash60(col(keyCol).cast("string")), lit(100)) < pct)
      .select(col(keyCol), col(stratumCol), col("source"))
      .orderBy(keyCol)
  }

  // ---- TF-IDF keyword extraction -------------------------------------

  /** Top-`k` terms per document by TF-IDF, deterministic tie-break on
    * the term. tf = count in doc / doc tokens; idf = ln(N / df).
    * Two aggregations (doc-term counts; document frequency) and one
    * window — df is a tiny relation (vocabulary-sized), joined back
    * broadcast-style; N arrives as a broadcast single-row cross join,
    * not a driver collect. */
  def tfIdf(docs: DataFrame, k: Int = 3): DataFrame = {
    val nDocs = docs.agg(count("*").as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count("*").as("tf"))
    val withTotal = tf.withColumn("n_tok",
      sum("tf").over(Window.partitionBy("doc_id")))
    val docFreq = tf.groupBy("term").agg(count("*").as("df"))
    val rank = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    withTotal
      .join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf").cast("double") / col("n_tok")) *
          log(col("n_docs").cast("double") / col("df")))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("score"), 4).as("score"))
      .orderBy("doc_id", "term")
  }

  // ---- Gopher-style quality gates ------------------------------------

  /** Per-document repetition/quality metrics (the Gopher/MassiveText
    * rule family) with an overall pass flag. All metrics are exact
    * integers; the thresholds are integer cross-multiplications:
    *   - enough tokens:      n_tokens >= minTokens
    *   - low 2-gram repeat:  n_dup_2grams * 100 <= maxDupPct * n_2grams
    *   - low top-token share: max_tf * 100 <= maxTopPct * n_tokens
    * Docs failing any gate get pass = false — the filter a curation
    * pipeline applies before training. */
  def qualityRules(docs: DataFrame, minTokens: Int = 50,
      maxDupPct: Int = 20, maxTopPct: Int = 10): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count("*").as("tf"))
      .groupBy("doc_id").agg(
        sum("tf").as("n_tokens"),
        count("*").as("n_distinct_tokens"),
        max("tf").as("max_tf"))
    val grams = docs
      .select(col("doc_id"), shingles(col("text"), 2).as("sh"))
      .select(col("doc_id"),
        size(col("sh")).cast("long").as("n_2grams"),
        size(array_distinct(col("sh"))).cast("long").as("n_distinct_2grams"))
    docs.select("doc_id")
      .join(tok, Seq("doc_id"), "left")
      .join(grams, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct_tokens"), lit(0L)).as("n_distinct_tokens"),
        coalesce(col("max_tf"), lit(0L)).as("max_tf"),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        (coalesce(col("n_2grams"), lit(0L))
          - coalesce(col("n_distinct_2grams"), lit(0L))).as("n_dup_2grams"))
      .withColumn("pass",
        col("n_tokens") >= minTokens &&
          col("n_dup_2grams") * 100 <= lit(maxDupPct) * col("n_2grams") &&
          col("max_tf") * 100 <= lit(maxTopPct) * col("n_tokens"))
      .orderBy("doc_id")
  }

  // ---- PII redaction -------------------------------------------------

  /** Patterns shared by Java regex and RE2 (no lookaround, no
    * backrefs) so Spark and DuckDB agree on every match. */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRegex = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Redact emails/phones from `textCol`: per-row match counts plus
    * the scrubbed text — a pure map stage (codegen'd regex, no UDF);
    * at 100 TB it rides the scan with zero shuffles. */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame =
    df
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRegex)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhoneRegex)))
      .withColumn("clean",
        regexp_replace(
          regexp_replace(col(textCol), EmailRegex, "<EMAIL>"),
          PhoneRegex, "<PHONE>"))

  /** Harness query: the corpus carries no PII, so plant a
    * deterministic contact line per document (same expression the
    * oracle uses), redact it, and fingerprint the scrubbed text. */
  def piiQuery(docs: DataFrame): DataFrame =
    redactPii(
      docs.select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or "),
          format_string("555-%03d-%04d",
            pmod(col("doc_id"), lit(1000)),
            pmod(col("doc_id"), lit(10000)))).as("text")))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        md5(col("clean")).as("clean_md5"))
      .orderBy("doc_id")
}
