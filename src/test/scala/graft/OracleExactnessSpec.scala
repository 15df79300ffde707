package graft

import org.scalatest.funsuite.AnyFunSuite

/** Encodes the r8/r9/r10 cross-engine exactness lessons as a GATE
  * instead of reviewer memory (round-9 verdict stretch item): every
  * committed DuckDB oracle is scanned for the constructs that have
  * produced (or provably can produce) engine-dependent answers, and
  * any NEW use fails a named test until it is consciously allowlisted
  * here with the same scrutiny the existing uses got.
  *
  * The traps, and why:
  *  - `pow(` / engine `stddev`/`var_*`/`percentile` aggregates /
  *    `random` / one-arg `log(`: BANNED outright. pow and the moment
  *    aggregates accumulate in engine-defined order (Welford vs
  *    naive); random is nondeterministic; one-arg `log(` is ln in
  *    Spark but log10 in DuckDB — a silent semantics flip.
  *  - `round(`: DuckDB rounds half away from zero, Spark HALF_UP on
  *    a decimal view of the double — identical only when the operand
  *    is the IDENTICAL double on both engines and not an exact
  *    half-case (the r8 q_events_outliers −66.60125 lesson: fences
  *    moved to floor(x·10^4+0.5) integer arithmetic). Every
  *    allowlisted use is a final OUTPUT column computed from
  *    integer-exact or provably-identical-double inputs — never a
  *    value that feeds a comparison, join, or argmax.
  *  - float transcendentals (`log2(`/`ln(`/`sqrt(`): last-ulp libm
  *    drift. Allowlisted uses are rounded output columns (the
  *    `round(` rule) — the unigram trainer's weights moved OFF this
  *    list in r10 precisely because they feed a Viterbi argmax
  *    (integer Mitchell log2 now, `Unigram.mlog2Sql`).
  *  - integer division `//`: truncation on NEGATIVE operands is
  *    floor-vs-trunc engine-defined in general SQL; every
  *    allowlisted use divides provably non-negative operands
  *    (counts, E4-quantized magnitudes, positive scaled scores).
  *  - `quantile_cont`: interpolated order statistics — exact only
  *    when the interpolation arithmetic is replayed identically
  *    (q_rel_quantiles pins the closed (n−1)/4 integer positions).
  *
  * A test failing with "stale allowlist" means an oracle DROPPED the
  * pattern — update the list so the freeze stays tight in both
  * directions. */
class OracleExactnessSpec extends AnyFunSuite {

  private val oracles = SparkEntry.oracleSql

  private def hits(re: String): Set[String] = {
    val r = re.r
    oracles.collect {
      case (n, sql) if r.findFirstIn(sql).isDefined => n
    }.toSet
  }

  private def assertFrozen(label: String, re: String,
      allowed: Set[String]): Unit = {
    val got = hits(re)
    val fresh = (got -- allowed).toSeq.sorted
    val gone = (allowed -- got).toSeq.sorted
    assert(fresh.isEmpty,
      s"NEW oracle(s) using $label — prove the use is cross-engine " +
        s"exact (see class doc) and allowlist consciously: " +
        fresh.mkString(", "))
    assert(gone.isEmpty,
      s"stale $label allowlist entries (oracle no longer uses it): " +
        gone.mkString(", "))
  }

  test("banned outright: pow, moment aggregates, random, one-arg log") {
    for (re <- Seq("pow\\(", "stddev", "var_pop\\(", "var_samp\\(",
        "percentile", "\\blog\\(", "\\brandom\\(", "setseed")) {
      val got = hits(re).toSeq.sorted
      assert(got.isEmpty,
        s"oracle(s) using banned construct $re: ${got.mkString(", ")}")
    }
  }

  // round( — final output columns over integer-exact or
  // identical-double inputs only (cosines/z-scores/means/tf-idf...)
  private val RoundAllowed = Set(
    "q_ann_bruteforce", "q_ann_hamming", "q_ann_ivf_injected",
    "q_ann_ivf_injected_stored", "q_ann_ivf_injected_refresh",
    // the r12 stored/refresh/stream serve faces SHARE their inline
    // twins' oracle text verbatim (one answer, N plans), so every
    // construct below is the already-proven use counted once more
    "q_ann_ivfpq_injected", "q_ann_ivfpq_injected_stored",
    "q_ann_ivfpq_injected_refresh", "q_ann_ivfpq_stream",
    "q_ann_ivfpq_injected_compact",
    "q_ann_lsh_injected", "q_ann_pq_injected",
    "q_ann_pq_injected_stored", "q_bm25", "q_bm25_stored",
    "q_bm25_seg",
    "q_corpus_drift", "q_dedup_containment", "q_dedup_embedding",
    "q_dedup_embedding_lsh", "q_dedup_embedding_lsh09",
    "q_dedup_incr_embedding", "q_dedup_incr_embedding_stream",
    "q_dedup_incr_embedding_stored",
    // r13 maintenance twins of the allowlisted %4 oracle above —
    // identical round(cos, 4)-of-double arithmetic, only the split
    // predicates differ
    "q_dedup_incr_embedding_refresh", "q_dedup_incr_embedding_seg",
    "q_dedup_incr_embedding_compact",
    "q_dedup_incr_minhash", "q_dedup_incr_minhash_refresh",
    // r13 segment-regime twin of the refresh oracle above — same
    // round(jaccard, 4)-of-double output column, same split
    "q_dedup_incr_minhash_seg", "q_dedup_incr_minhash_compact",
    "q_dedup_incr_minhash_seg_stream",
    // r14 serve-telemetry fold regime — IncrMinhashMaintOracle
    // shared verbatim onto one more key
    "q_dedup_incr_minhash_amp_stream",
    "q_dedup_incr_minhash_stream", "q_dedup_incr_minhash_stored",
    "q_dedup_minhash", "q_dedup_ngram", "q_dedup_ngram_cosine",
    "q_dedup_ngram_df", "q_dedup_prefix", "q_dsir_topk",
    "q_dsir_weights", "q_embed_cohesion", "q_events_anomaly",
    "q_events_anomaly_stream", "q_events_gaps", "q_events_json",
    "q_events_sliding", "q_events_tumbling",
    "q_events_tumbling_stream", "q_hard_negatives",
    "q_lang_stats", "q_lm_bigram", "q_lm_surprisal",
    "q_mix_temperature", "q_nb_score_stream", "q_ppl_buckets",
    "q_probe_eval", "q_probe_train", "q_profile_corr",
    "q_quality_model",
    "q_rel_cube", "q_rel_groupsets", "q_rel_nation_rev",
    "q_rel_pivot", "q_rel_pricing", "q_rel_quantiles",
    // r14 bounded-error gates: the sketch rows' oracles replay the
    // SAME round(quantile_cont(...), 4) exact-percentile columns as
    // the allowlisted q_rel_quantiles twin (the booleans themselves
    // are integer rank arithmetic, never rounded)
    "q_rel_quantiles_approx", "q_rel_quantiles_kll",
    "q_rel_rollup", "q_rel_runsum", "q_rel_salted", "q_rel_sql",
    "q_rel_topn", "q_rel_trailing", "q_rel_window",
    "q_retrieval_rrf", "q_sem_decontaminate", "q_text_pmi",
    "q_text_quality", "q_text_rank", "q_text_stats", "q_tfidf")

  test("round( allowlist frozen (rounded OUTPUT columns only)") {
    assertFrozen("round(", "round\\(", RoundAllowed)
  }

  // float log2 — rounded output columns (surprisal/ppl/dsir scores)
  private val Log2Allowed = Set(
    "q_dsir_topk", "q_dsir_weights", "q_lm_bigram", "q_lm_surprisal",
    "q_nb_score_stream", "q_ppl_buckets", "q_probe_eval",
    "q_probe_train")

  test("log2( allowlist frozen (the unigram trainer must NOT rejoin " +
      "it — its weights feed an argmax and use integer Mitchell log2)") {
    assertFrozen("log2(", "log2\\(", Log2Allowed)
    for (q <- Seq("q_unigram_vocab", "q_unigram_encode"))
      assert(!Log2Allowed.contains(q) && !hits("log2\\(").contains(q),
        s"$q must stay libm-free (Unigram.mlog2Sql)")
  }

  private val LnAllowed = Set(
    "q_bm25", "q_bm25_stored", "q_bm25_seg", "q_corpus_drift",
    "q_retrieval_rrf", "q_text_pmi", "q_tfidf")

  test("ln( allowlist frozen") {
    assertFrozen("ln(", "\\bln\\(", LnAllowed)
  }

  private val SqrtAllowed = Set(
    "q_ann_bruteforce", "q_ann_hamming", "q_ann_ivf_injected",
    "q_ann_ivf_injected_stored", "q_ann_ivf_injected_refresh",
    "q_ann_ivfpq_injected", "q_ann_ivfpq_injected_stored",
    "q_ann_ivfpq_injected_refresh", "q_ann_ivfpq_stream",
    "q_ann_ivfpq_injected_compact",
    "q_ann_lsh_injected", "q_ann_pq_injected",
    "q_ann_pq_injected_stored", "q_dedup_embedding",
    "q_dedup_embedding_lsh", "q_dedup_embedding_lsh09",
    "q_dedup_incr_embedding", "q_dedup_incr_embedding_stream",
    "q_dedup_incr_embedding_stored",
    // r13 maintenance twins (same sqrt(na)*sqrt(nb) norm product)
    "q_dedup_incr_embedding_refresh", "q_dedup_incr_embedding_seg",
    "q_dedup_incr_embedding_compact",
    "q_dedup_ngram_cosine", "q_dedup_semantic",
    "q_dedup_semantic_cells", "q_embed_cohesion", "q_embed_mrl",
    "q_embed_rbo", "q_events_anomaly", "q_events_anomaly_stream",
    "q_hard_negatives", "q_mix_temperature", "q_profile_corr",
    "q_retrieval_rrf", "q_sem_decontaminate")

  test("sqrt( allowlist frozen") {
    assertFrozen("sqrt(", "sqrt\\(", SqrtAllowed)
  }

  // // — non-negative operands only (counts, E4 magnitudes,
  // positive scaled scores); negative-operand division is
  // floor-vs-trunc engine-defined
  private val IntDivAllowed = Set(
    "q_bpe_encode", "q_bpe_encode_injected", "q_chunk", "q_chunk_cdc",
    "q_compaction", "q_corpus_drift", "q_corpus_health",
    "q_curriculum", "q_dedup_diversity", "q_dedup_diversity_src",
    "q_dedup_sample", "q_dedup_sources", "q_dedup_weights",
    "q_delete_repack", "q_embed_mrl", "q_embed_profile",
    "q_embed_rbo", "q_events_decay", "q_events_decay_stream",
    "q_events_outlier_flags_stream", "q_events_outliers",
    "q_histogram", "q_key_skew", "q_lang_mix", "q_mix_temperature",
    "q_mix_unimax", "q_mm_features", "q_mm_frames", "q_mm_imagedup",
    "q_mm_imagedup_incr", "q_oov_rate", "q_pack_padding",
    "q_pack_seqs", "q_passage_dedup", "q_passage_rebuild",
    "q_pipeline", "q_quality_calibrated", "q_quality_thresholds",
    "q_quality_gate_stream", "q_salt_plan", "q_sample_weighted",
    "q_shard_summary", "q_shards",
    "q_span_corruption", "q_token_budget", "q_unigram_encode",
    "q_unigram_encode_injected", "q_unigram_vocab", "q_vocab_growth",
    "q_wordpiece_encode", "q_wordpiece_encode_trained",
    "q_wordpiece_pairs", "q_wordpiece_vocab")

  test("integer-division allowlist frozen (non-negative operands only)") {
    assertFrozen("//", "//", IntDivAllowed)
  }

  // r14: the two sketch-gate oracles replay the exact interpolated
  // percentiles next to their rank-gate booleans — the identical
  // closed-position arithmetic q_rel_quantiles pinned
  private val QuantileContAllowed = Set("q_rel_quantiles",
    "q_rel_quantiles_approx", "q_rel_quantiles_kll")

  test("quantile_cont allowlist frozen") {
    assertFrozen("quantile_cont", "quantile_cont", QuantileContAllowed)
  }

  test("SQL generators: the cascade builders' trap-construct profile " +
      "is parameter-invariant (generated text scanned like committed " +
      "literals)") {
    // The cascade builders emit oracle SQL programmatically; their
    // output AT THE COMMITTED parameterization already sits in
    // oracleSql and is scanned by every test above. This pins the
    // OTHER parameterizations: a regime-dependent branch (a future
    // "if (nMerges > K)" special case) cannot smuggle pow(/round(/
    // log2( into generated text at a rule count the committed scan
    // never sees — the profile of trap constructs must not depend on
    // the parameter at all.
    val traps = Seq("pow\\(", "stddev", "var_pop\\(", "var_samp\\(",
      "percentile", "\\blog\\(", "\\brandom\\(", "setseed",
      "round\\(", "log2\\(", "\\bln\\(", "sqrt\\(", "quantile_cont")
    def profile(sql: String): Set[String] =
      traps.filter(t => t.r.findFirstIn(sql).isDefined).toSet
    val gens: Seq[(String, Int => String)] = Seq(
      ("bpeVocabCascadeOracle",
        SparkEntry.bpeVocabCascadeOracle _),
      ("bpeEncodeCascadeOracle",
        SparkEntry.bpeEncodeCascadeOracle _),
      ("wordPieceVocabCascadeOracle",
        SparkEntry.wordPieceVocabCascadeOracle _),
      ("wordPieceEncodeTrainedOracle",
        SparkEntry.wordPieceEncodeTrainedOracle _),
      ("unigramEmRoundCtes",
        (r: Int) => SparkEntry.unigramEmRoundCtes(r, s"u_p${r - 1}")),
      ("unigramTopWithCharsSql",
        (k: Int) => SparkEntry.unigramTopWithCharsSql("u_seed", k)))
    for ((name, gen) <- gens) {
      val committed = profile(gen(SparkEntry.VocabCascadeRules))
      for (n <- Seq(1, 3, 40))
        assert(profile(gen(n)) == committed,
          s"$name($n) emits a different trap-construct profile than " +
            s"$name(${SparkEntry.VocabCascadeRules}) — a parameter-" +
            "dependent branch introduced or dropped a scanned " +
            "construct")
    }
  }

  test("construct occurrence totals frozen — an edit INSIDE an " +
      "already-allowlisted oracle still surfaces") {
    // The per-query allowlists above are binary: once a query is
    // allowlisted for round(, a second round( sneaking into the same
    // oracle passes unseen. Freezing the corpus-wide occurrence count
    // per construct makes ANY added or removed use cost one conscious
    // number change here.
    val totals = Seq(
      // r12 re-freeze: +8 round / +1 ln / +39 sqrt — every delta an
      // oracle-val SHARED onto a new stored/refresh/stream/compact
      // key with construct uses identical to the proven twins:
      // IvfInjected (+1 key: 1 round, 4 sqrt), PqInjected (+1 key:
      // 1 round, 5 sqrt), Bm25 (+1 key: 1 round, 1 ln), IvfPq (new
      // val x 5 keys: 1 round, 6 sqrt each).
      // r12 segment-lifecycle re-freeze: +1 round / +1 ln — Bm25Oracle
      // shared onto q_bm25_seg (the segment-list serve; the three
      // PhraseSearchOracle segment keys add no scanned constructs)
      // r14 re-freeze: +4 round / +4 quantile_cont — the two
      // quantile-sketch gate oracles (QuantileGateOracle, shared by
      // q_rel_quantiles_{approx,kll}) each replay the q_rel_quantiles
      // twin's two round(quantile_cont(...), 4) exact-percentile
      // columns; +1 round — IncrMinhashMaintOracle (1 round(jaccard))
      // shared verbatim onto the new q_dedup_incr_minhash_amp_stream
      // key; no other construct moved
      "round\\(" -> 107, "log2\\(" -> 32, "\\bln\\(" -> 7,
      "sqrt\\(" -> 136, "//" -> 149, "quantile_cont" -> 8)
    val diffs = totals.flatMap { case (re, want) =>
      val got = oracles.values.map(sql => re.r.findAllIn(sql).size).sum
      if (got != want) Some(s"$re: $got (frozen $want)") else None
    }
    assert(diffs.isEmpty,
      "construct occurrence totals changed — re-freeze consciously: " +
        diffs.mkString(", "))
  }

  test("every query has either an oracle or a documented rows-only " +
      "status (no silent oracle drops)") {
    // oracle keys must be a subset of query names — a typo'd key
    // would silently weaken the named query's check to rows-only
    val orphans = (oracles.keySet -- SparkEntry.queries.keySet)
      .toSeq.sorted
    assert(orphans.isEmpty,
      s"oracleSql keys with no matching query: ${orphans.mkString(", ")}")
  }
}
