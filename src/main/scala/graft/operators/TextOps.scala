package graft.operators

import graft.functions.ColumnOps.pairsOf
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

  /** Per-document quality features + composite score. Staged selects
    * act as CollapseProject barriers (non-cheap exprs referenced more
    * than once are not inlined), so the tokenization, stopword filter,
    * and alpha-ratio regex each run ONCE per row — the single-select
    * form re-derived the token array per output column. */
  def textQuality(docs: DataFrame): DataFrame = {
    val stopWords = graft.functions.TextAnalysis.LangStopwords.head._2
    docs
      .select(col("doc_id"), col("text"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n"),
        stopwordCount(col("toks"), stopWords).as("sc"),
        alphaRatio(col("text")).as("ar"))
      .select(
        col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        col("sc").cast("long").as("stop_cnt"),
        round(col("sc").cast("double") / col("n"), 4).as("stop_ratio"),
        round(col("ar"), 4).as("alpha_ratio"),
        round(least(lit(1.0), col("n").cast("double") / lit(50.0))
          * (lit(1.0) - col("sc").cast("double") / col("n"))
          * col("ar"), 4).as("quality"),
      ).orderBy("doc_id")
  }

  /** Stopword-heuristic language ID next to the labeled lang. */
  def langIdQuery(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("lang"),
      langId(col("text")).as("lang_pred"),
    ).orderBy("doc_id")

  /** Per-LINE language mix — the code-switch / mixed-language
    * detector a multilingual curation pass runs where the per-document
    * [[langIdQuery]] washes out minority-language content: each
    * non-empty line is language-ID'd independently (same stopword
    * argmax as the document form), then per document: line count, the
    * dominant line language (ties (cnt DESC, lang ASC) — a total
    * order), and the minority-line share in integer basis points. A
    * high `minor_bp` flags boilerplate-in-another-language, code-
    * switched forums, or concatenation bugs — docs a doc-level ID
    * confidently mislabels.
    *
    * Scale shape: one scan, lines explode map-side ((doc_id, lang)-
    * width rows into the shuffle — never line text), two aggregations
    * (per-(doc, lang) counts, then the per-doc argmax via max_by on
    * the (cnt, reversed-lang) struct — no window). */
  def langMix(docs: DataFrame): DataFrame = {
    val lines = docs
      .select(col("doc_id"),
        explode(split(col("text"), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .select(col("doc_id"), langId(col("line")).as("line_lang"))
    val counts = lines.groupBy("doc_id", "line_lang")
      .agg(count(lit(1)).as("cnt"))
    // argmax by (cnt DESC, lang ASC) without a window: max_by over a
    // struct ordered by (cnt, negated-lang-bytes) would need a string
    // negation, so flip the comparison onto a struct of (cnt,
    // reverse-rank of lang) — languages are a small closed set, so
    // rank them explicitly; unknown sorts last.
    val langs = graft.functions.TextAnalysis.LangStopwords.map(_._1) :+
      "unknown"
    val langRank = langs.zipWithIndex
      .map { case (l, i) => (l, langs.length - i) }
      .foldLeft(lit(0)) { case (acc, (l, r)) =>
        when(col("line_lang") === l, lit(r)).otherwise(acc) }
    counts.groupBy("doc_id")
      .agg(
        sum("cnt").as("n_lines"),
        max_by(col("line_lang"),
          struct(col("cnt"), langRank)).as("lang_major"),
        max(struct(col("cnt"), langRank)).getField("cnt").as("n_major"))
      .select(col("doc_id"), col("n_lines"), col("lang_major"),
        col("n_major"),
        expr("(n_lines - n_major) * 10000 DIV n_lines").as("minor_bp"))
      .orderBy("doc_id")
  }

  /** Harness form of [[langMix]]: the corpus is single-line, so give
    * it the deterministic lined twin (the q_line_dedup convention —
    * a plain substring replace both engines compute identically). */
  def langMixQuery(docs: DataFrame): DataFrame =
    langMix(docs.withColumn("text",
      regexp_replace(col("text"), lit(" value "), lit(" value\n"))))

  /** Whole-document fingerprints (exact-dedup keys). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      fingerprintMd5(col("text")).as("fp_md5"),
      fingerprintSha256(col("text")).as("fp_sha256"),
    ).orderBy("doc_id")

  /** Corpus-wide word n-gram frequencies, top `k` — the phrase-level
    * counterpart of word count (same partial-agg → shuffle → top-k
    * shape; the shingle construction is the codegen'd
    * [[graft.functions.WordShingles]] kernel). */
  def ngramCounts(docs: DataFrame, n: Int = 2, k: Int = 50): DataFrame =
    docs
      .select(explode(shingles(col("text"), n)).as("ngram"))
      .groupBy("ngram").agg(count("*").as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)

  /** Winnowed rolling-hash fingerprints per document
    * ([[graft.functions.RollingFingerprints]]): the content-overlap
    * sketch — two docs sharing any run of >= w+k-1 bytes share a
    * fingerprint. Exploded to (doc_id, pos, fp) rows; at scale the
    * groupBy(fp) inverted index over these rows finds cross-document
    * overlap without any pairwise comparison. */
  def rollingFingerprints(docs: DataFrame, k: Int = 8,
      w: Int = 4): DataFrame =
    docs
      .select(col("doc_id"),
        explode(ColumnBridge.column(graft.functions.RollingFingerprints(
          ColumnBridge.expression(col("text")), k, w))).as("e"))
      .select(col("doc_id"), col("e.pos").cast("long").as("pos"),
        col("e.fp").as("fp"))
      .orderBy("doc_id", "pos")

  /** Portable winnowing — the cross-engine witness for
    * [[rollingFingerprints]]: CHARACTER k-grams hashed with the
    * engine-neutral 60-bit md5 prefix, same rightmost-min selection
    * (the kernel's `portable = true` mode), so a DuckDB oracle
    * reproduces the result bit-for-bit. Still a single-pass map —
    * no gram explosion, no shuffle before the final sort; the
    * Rabin–Karp kernel stays the production fingerprinter (one
    * rolling update per gram vs one md5).
    *
    * Output (doc_id, pos, fp): pos is the 0-based char position of
    * each selected gram. Three independent formulations are pinned
    * equal in TextAnalysisSpec: this kernel, the declarative
    * window-function form ([[winnowedViaWindows]]), and a Scala
    * brute force. */
  def rollingFingerprintsPortable(docs: DataFrame, k: Int = 8,
      w: Int = 4): DataFrame =
    docs
      .select(col("doc_id"),
        explode(ColumnBridge.column(graft.functions.RollingFingerprints(
          ColumnBridge.expression(col("text")), k, w, portable = true)))
          .as("e"))
      .select(col("doc_id"), col("e.pos").cast("long").as("pos"),
        col("e.fp").as("fp"))
      .orderBy("doc_id", "pos")

  /** The same portable winnowing as pure declarative window functions
    * — per-window min by (hash asc, position desc) over exploded gram
    * hashes, deduped. Costs a text copy per gram row plus three
    * shuffles, so it exists as the independent cross-check of the
    * kernel's selection rule (TextAnalysisSpec), not as the query
    * path. */
  def winnowedViaWindows(docs: DataFrame, k: Int = 8,
      w: Int = 4): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("p").asc)
      .rowsBetween(-(w - 1), 0)
    docs
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        (length(col("text")) - (k - 1)).as("ng"), col("text"))
      .select(col("doc_id"), col("ng"),
        explode(sequence(lit(0), col("ng") - 1)).as("p"), col("text"))
      .select(col("doc_id"), col("ng"), col("p"),
        md5Hash60(col("text").substr(col("p") + 1, lit(k))).as("h"))
      .withColumn("sel",
        min(struct(col("h").as("h"), (-col("p")).as("np"))).over(win))
      .filter(col("p") >= w - 1 || col("p") === col("ng") - 1)
      .select(col("doc_id"), (-col("sel.np")).cast("long").as("pos"),
        col("sel.h").as("fp"))
      .distinct()
      .orderBy("doc_id", "pos")
  }

  /** Collocations: top-`k` bigrams by pointwise mutual information,
    * pmi = ln(p(ab) / (p(a)·p(b))) with p(ab) over bigram mass and
    * p(·) over unigram mass. `minCount` drops noise bigrams before
    * ranking (PMI's classic low-frequency blowup). Ranked on the
    * ROUNDED score with the bigram as tie-break — the ulp-stable
    * cross-engine ordering (same rationale as
    * [[CorpusOps.tfIdf]]). Two aggregations over one tokenize pass
    * each; the unigram joins are left to the planner — the vocabulary
    * is corpus-dependent cardinality, so forcing a broadcast would be
    * wrong at 100 TB (AQE broadcasts it when it measures small). Only
    * the single-row totals are broadcast by hint. */
  def collocations(docs: DataFrame, minCount: Long = 5L,
      k: Int = 20): DataFrame = {
    // both count relations are vocabulary-sized: checkpoint them so
    // the totals and the two unigram joins read the materialized
    // relation — without this the final plan re-runs the explode
    // lineages under every consuming branch (NINE Generates;
    // ReuseExchange collapses just one repeat — graft.ScanAudit).
    // Corpus cost drops to exactly two passes: one per n-gram order.
    val uni = docs
      .select(explode(wsTokens(col("text"))).as("w"))
      .groupBy("w").agg(count("*").as("c"))
      .localCheckpoint()
    val biAll = docs
      .select(explode(shingles(col("text"), 2)).as("bigram"))
      .groupBy("bigram").agg(count("*").as("c_ab"))
      .localCheckpoint()
    val bi = biAll.filter(col("c_ab") >= minCount)
    val n1 = uni.agg(sum("c").as("n1"))
    val n2 = biAll.agg(sum("c_ab").as("n2"))
    val scored = bi
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(uni.select(col("w").as("w1"), col("c").as("ca")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("cb")), "w2")
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      // + 0.0 normalizes IEEE negative zero: a ratio epsilon under 1
      // rounds to -0.0, which the driver's float canonicalization
      // renders "-0" in one engine and "0" in the other
      .withColumn("pmi", round(
        log((col("c_ab").cast("double") / col("n2")) /
          ((col("ca").cast("double") / col("n1")) *
            (col("cb").cast("double") / col("n1")))), 4) + lit(0.0))
    scored
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(k)
      .select(col("bigram"), col("c_ab"), col("pmi"))
      .orderBy("bigram")
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021
    * §A1.1 — the boilerplate/spam filters an LLM-training pipeline
    * runs before quality gating): most-frequent word/2-gram/3-gram
    * occurrence counts and duplicated word/2-gram mass, plus a
    * `repetitive` flag (top 2-gram covers > 20% of 2-grams, or > half
    * the tokens are repeated words). One single-pass
    * [[graft.functions.RepetitionProfile]] kernel scan per document —
    * no explode, no shuffle (the relational form shuffles every token
    * once per n-gram order); the two-step select is the usual
    * CollapseProject barrier. All outputs are exact integers — the
    * flag is an integer cross-multiplication, so the DuckDB oracle
    * reproduces it without float-rounding hazards. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val p = ColumnBridge.column(graft.functions.RepetitionProfile(
      ColumnBridge.expression(col("text"))))
    docs
      .select(col("doc_id"), p.as("p"))
      .select(col("doc_id"),
        col("p.n_tokens").as("n_tokens"),
        col("p.top1_cnt").as("top1_cnt"),
        col("p.top2_cnt").as("top2_cnt"),
        col("p.top3_cnt").as("top3_cnt"),
        col("p.dup_word_tokens").as("dup_word_tokens"),
        col("p.dup_2gram_tokens").as("dup_2gram_tokens"),
        ((col("p.top2_cnt") * 5 > col("p.n_tokens") - 1 &&
          col("p.n_tokens") > 1) ||
          col("p.dup_word_tokens") * 2 > col("p.n_tokens"))
          .cast("long").as("repetitive"))
      .orderBy("doc_id")
  }

  /** Corpus stats by (lang, source): doc counts, char volume, mean
    * token count. One shuffle on the group keys; partial agg map-side. */
  /** Per-source out-of-vocabulary rate against a reference vocabulary
    * — the tokenizer-health audit a pipeline runs when a corpus slice
    * and a trained tokenizer disagree (new domain, wrong language,
    * mojibake): a rising OOV share is the first symptom. `vocab` is a
    * one-column (`term`) relation — tokenizer vocabularies are
    * O(10⁴⁻⁵) rows, so it BROADCASTS and the whole operator is one
    * corpus scan + map-side join + per-source aggregate; the OOV
    * share is integer basis points (the [[CorpusOps.corpusHealth]]
    * convention — no float division crosses engines). Returns
    * (source, n_tokens, n_oov, oov_bp) ordered by source. */
  def oovRate(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(wsTokens(col("text"))).as("term"))
      .join(broadcast(vocab.select(col("term"), lit(1L).as("in_v"))
        .dropDuplicates("term")), Seq("term"), "left")
      .groupBy("source")
      .agg(count("*").as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bp", expr("n_oov * 10000 DIV n_tokens"))
      .orderBy("source")

  /** Vocabulary edit-distance pairs — typo/OCR-variant mining over
    * the corpus vocabulary (a rare token one or two edits from a
    * frequent one is the classic noise signature: scanner errors,
    * mojibake, concatenation artifacts — the frequencies ride along so
    * downstream cleaning can rank variant → canonical). Exact result:
    * every unordered vocabulary pair within Levenshtein `maxDist`,
    * with corpus frequencies.
    *
    * Candidate generation is FastSS/SymSpell deletion-neighborhood
    * blocking (Bocek et al. 2007, public algorithm): an inverted index
    * on DELETION KEYS — every string obtainable from a word by
    * deleting up to `maxDist` characters. Completeness: take an
    * optimal alignment witnessing ed(u,v) = d ≤ maxDist and delete
    * from each word its non-matched positions (substituted positions
    * on both sides, inserted ones on their own side); both words are
    * left holding the SAME subsequence having deleted ≤ d characters
    * each, so they share a key and the bucket pass emits the pair.
    * Exactness: every candidate is re-checked with the real
    * `levenshtein` before emission — blocking can only add work,
    * never results.
    *
    * Scale: after the one corpus scan every relation is VOCABULARY-
    * scale (|V| words; |V|·O(L²) deletion keys). Pairs are generated
    * per posting list by the codegen'd AllPairs kernel; lists are
    * naturally tiny (words sharing a key are within 2·maxDist of each
    * other), so candidate volume is bounded by bucket sizes, never
    * |V|². `minLen` must exceed maxDist + 1: shorter words reach
    * near-empty deletion keys shared by entire length classes — the
    * one skew trap of the scheme. */
  def vocabEditPairs(docs: DataFrame, maxDist: Int = 2,
      minLen: Int = 4): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"vocabEditPairs supports maxDist 1 or 2, got $maxDist")
    require(minLen > maxDist + 1,
      s"minLen=$minLen must exceed maxDist+1=${maxDist + 1} — shorter " +
        "words collapse to near-empty deletion keys (one bucket per " +
        "length class, the quadratic blowup blocking exists to avoid)")
    val vocab = docs
      .select(explode(wsTokens(col("text"))).as("word"))
      .filter(length(col("word")) >= minLen)
      .groupBy("word").agg(count("*").as("cnt"))
    // 0-, 1- (and for maxDist = 2: 2-) deletion keys as pure array
    // expressions — codegen'd, no UDF. substring is 1-based; i < j are
    // 0-based deleted positions; the del2 inner bound needs no empty
    // guard because length(word) ≥ minLen > 3 keeps both sequences
    // ascending (sequence(a, b) with a > b DESCENDS, it is not empty).
    val del1 =
      """transform(sequence(0, length(word) - 1), i ->
        |  concat(substring(word, 1, i),
        |         substring(word, i + 2, length(word))))""".stripMargin
    val del2 =
      """flatten(transform(sequence(0, length(word) - 2), i ->
        |  transform(sequence(i + 1, length(word) - 1), j ->
        |    concat(substring(word, 1, i),
        |           substring(word, i + 2, j - i - 1),
        |           substring(word, j + 2, length(word))))))""".stripMargin
    val keys =
      if (maxDist == 1) expr(s"array_union(array(word), $del1)")
      else expr(s"array_union(array(word), array_union($del1, $del2))")
    vocab
      .select(explode(keys).as("k"),
        struct(col("word"), col("cnt")).as("wc"))
      .groupBy("k").agg(collect_list(col("wc")).as("ws"))
      .filter(size(col("ws")) > 1)
      .select(explode(pairsOf(array_sort(col("ws")))).as("p"))
      // a pair can share many deletion keys — dedupe on the words (cnt
      // is functionally dependent on the word, so max is exact)
      .groupBy(col("p.a.word").as("word_a"), col("p.b.word").as("word_b"))
      .agg(max(col("p.a.cnt")).as("cnt_a"), max(col("p.b.cnt")).as("cnt_b"))
      .withColumn("dist",
        levenshtein(col("word_a"), col("word_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("word_a", "word_b", "dist", "cnt_a", "cnt_b")
      .orderBy("word_a", "word_b")
  }

  def langStats(docs: DataFrame): DataFrame =
    docs.groupBy("lang", "source").agg(
      count("*").as("n_docs"),
      sum("n_chars").as("total_chars"),
      round(avg(tokenCountWs(col("text"))), 4).as("avg_tokens"),
    ).orderBy("lang", "source")
}
