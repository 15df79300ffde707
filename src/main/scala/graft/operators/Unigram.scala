package graft.operators

import graft.functions.TextAnalysis.wsTokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece
  * unigram model), hard-EM/Viterbi variant, at corpus scale. With
  * [[Bpe]] this completes the two tokenizer-training families a
  * pretraining pipeline ships: merge-based (BPE) and
  * likelihood-based (unigram), the latter the default in
  * SentencePiece/T5/mT5. Beyond the reference's surface (the whole
  * reference engine is `/root/reference/src/main.cpp:1-281`).
  *
  * Scale shape (the [[Bpe]] economics): the corpus is scanned exactly
  * ONCE into the word-frequency relation (vocabulary-scale), and
  * everything else — seed substring counts, every EM round, the
  * pruning cut — iterates over THAT relation or its candidate-span
  * expansion (|word| x maxPieceLen rows per distinct word), never the
  * corpus. The span relation is static across rounds (only the piece
  * weights change), so it is checkpointed once and each round is: one
  * broadcast join (spans x current piece weights), one group-to-array,
  * one Viterbi projection, one weighted count — all vocabulary-scale
  * jobs, ~2 shuffles each.
  *
  * The per-word Viterbi DP is a pure Catalyst `aggregate` fold over
  * character positions (state = best score + backpointer per prefix;
  * candidates = the word's piece-table matches, pre-joined as an
  * array). Higher-order functions are interpreted, not codegen'd —
  * acceptable OFF the corpus hot path by the repo's own rule, because
  * they run once per DISTINCT word, and encoding joins the segmented
  * vocabulary back broadcast onto the token stream exactly like
  * [[Bpe.encode]], so the corpus-side cost stays one scan + one
  * map-side join.
  *
  * Determinism (spec-pinned AND, as of r10, fully SQL-oracled at the
  * default fixed-round budget — the hard-EM loop unrolls into a
  * WITH-cascade of per-round recursive-CTE Viterbi replays, the
  * `q_bpe_vocab` convention): piece weights are integer E4
  * fixed-point add-one-smoothed log2-probabilities via the EXACT
  * integer Mitchell approximation ([[mlog2Sql]] — no libm float
  * anywhere), so Viterbi compares exact integer sums; ties prefer
  * the longer last piece via a
  * lexicographic (score, len) struct max, which is order-independent
  * because (end, len) determines the candidate uniquely. Every
  * single-character piece of the corpus is kept in-vocabulary through
  * seeding, every EM round, and the pruning cut, so every word stays
  * segmentable (full coverage — no unreachable DP state, no unk).
  * The SEED substring statistic is exact SQL and carries the oracled
  * face (`q_unigram_seed`), like `q_bpe_pairs` does for BPE. */
object Unigram {

  /** Hard ceiling on the seed vocabulary collected per training run —
    * the [[Bpe.MaxTrainableRules]] convention: the EM loop is
    * driver-coordinated vocabulary-scale jobs; train huge vocabs
    * locally over the exported (small) word-frequency relation. */
  val MaxSeedSize = 10000

  /** One corpus scan -> (word, cnt): the relation training iterates
    * on (shared shape with [[Bpe.wordSymbols]]). */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(wsTokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Candidate-span rows (word, j, len, piece): every substring of
    * every distinct word up to `maxPieceLen` chars, 0-based start j.
    * Static across EM rounds — only piece weights change. */
  private def spanRows(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("word"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), k ->
           |    named_struct('j', i - 1, 'len', k - i + 1,
           |      'piece', substring(word, i, k - i + 1)))))""".stripMargin))
        .as("s"))
      .select(col("word"), col("s.j").as("j"), col("s.len").as("len"),
        col("s.piece").as("piece"))

  /** Harness query: top-N seed pieces in the training total order —
    * the exact-SQL face of unigram training (every candidate piece
    * with its corpus-weighted occurrence mass, the statistic seeding
    * selects from; `q_bpe_pairs`' role for BPE). */
  def seedQuery(docs: DataFrame, maxPieceLen: Int = 4,
      topN: Int = 50): DataFrame = {
    val words = wordFreqs(docs).localCheckpoint()
    spanRows(words, maxPieceLen).join(words, "word")
      .groupBy("piece").agg(sum("cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(topN)
  }

  /** Integer E4 Mitchell log2 of a positive BIGINT — the piecewise-
    * linear log2 approximation (Mitchell 1962): `b*10^4 + (n - 2^b) *
    * 10^4 DIV 2^b` with `b = floor(log2 n)` via the binary-string
    * length. PURE integer arithmetic (bin/shift/DIV on positive
    * operands), so the value is bit-identical across engines — no
    * libm `log2` whose last-ulp drift could flip an E4 rounding and
    * through it a Viterbi argmax (the cross-engine `round(` trap the
    * WordPiece E12 quotient already avoids). Max error vs true log2
    * is ~0.086 bits (~860 E4 units), monotone non-decreasing —
    * harmless for a likelihood weight, decisive for oracle-ability. */
  private[graft] def mlog2Sql(x: String): String =
    s"((length(bin($x)) - 1) * 10000L + " +
      s"((($x) - shiftleft(1L, length(bin($x)) - 1)) * 10000L) DIV " +
      s"shiftleft(1L, length(bin($x)) - 1))"

  /** E4 fixed-point add-one-smoothed log2 piece weights — the exact
    * integer [[mlog2Sql]] form of `10^4 * log2((cnt+1)/(tot+|V|))`:
    * ONE in-plan total (a one-row broadcast, no driver collect); |V|
    * rides the same aggregate. Zero-count pieces stay in-vocabulary
    * with the smoothing floor — vocabulary closure is what guarantees
    * DP coverage. */
  private def weighted(pieces: DataFrame): DataFrame = {
    val tot = pieces.agg(sum("cnt").as("t"), count(lit(1)).as("v"))
    pieces.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        expr(s"${mlog2Sql("cnt + 1L")} - ${mlog2Sql("t + v")}")
          .cast("long").as("w"))
  }

  // DP over positions 1..n: state = array of (sc, bl) per prefix —
  // best integer score and the length of the best last piece. The
  // candidate max is a (sc, len)-lexicographic struct comparison:
  // score first, longer last piece on ties; (end, len) determines the
  // candidate uniquely, so the fold is order-independent under any
  // collect_list order. Unreachable-state sentinel -10^8 never wins
  // (single-char coverage guarantees a real candidate at every i).
  private val dpExpr =
    """aggregate(
      |  sequence(1, length(word)),
      |  array(named_struct('sc', CAST(0 AS BIGINT), 'bl', 0)),
      |  (acc, i) -> array_append(acc,
      |    aggregate(
      |      filter(spans, s -> s.j + s.len = i),
      |      named_struct('sc', CAST(-100000000 AS BIGINT), 'bl', 0),
      |      (best, s) -> IF(
      |        named_struct('sc', element_at(acc, s.j + 1).sc + s.w,
      |                     'bl', s.len) > best,
      |        named_struct('sc', element_at(acc, s.j + 1).sc + s.w,
      |                     'bl', s.len),
      |        best))))""".stripMargin

  // Backpointer walk: at most n hops (the fold runs n iterations and
  // idles once pos reaches 0), emitting pieces right-to-left.
  private val backExpr =
    """aggregate(
      |  sequence(1, length(word)),
      |  named_struct('pos', length(word),
      |    'ps', CAST(array() AS array<string>)),
      |  (st, x) -> IF(st.pos <= 0, st,
      |    named_struct(
      |      'pos', st.pos - element_at(bests, st.pos + 1).bl,
      |      'ps', array_append(st.ps,
      |        substring(word, st.pos - element_at(bests, st.pos + 1).bl + 1,
      |          element_at(bests, st.pos + 1).bl)))),
      |  st -> reverse(st.ps))""".stripMargin

  /** (word, pieces): Viterbi-best segmentation of every word under
    * the current weighted piece table (broadcast — vocabulary-scale,
    * bounded by [[MaxSeedSize]]). */
  private def viterbiSegments(spans: DataFrame,
      weightedPieces: DataFrame): DataFrame =
    spans
      .join(broadcast(weightedPieces.select("piece", "w")), "piece")
      .groupBy("word")
      .agg(collect_list(struct(col("j"), col("len"), col("w"))).as("spans"))
      .withColumn("bests", expr(dpExpr))
      .withColumn("pieces", expr(backExpr))
      .select(col("word"), col("pieces"))

  /** One hard-EM round: Viterbi-segment every word, re-count piece
    * usage weighted by word frequency, CLOSED over the current
    * vocabulary (unused pieces survive at count 0 — the smoothing
    * keeps them scored, coverage keeps the DP total). */
  private def emRound(spans: DataFrame, words: DataFrame,
      pieces: DataFrame): DataFrame = {
    val counts = viterbiSegments(spans, weighted(pieces))
      .join(words, "word")
      .select(explode(col("pieces")).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("cnt"))
    pieces.select("piece").join(counts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Train a unigram-LM piece vocabulary. Returns (piece, cnt, w)
    * ordered by the training total order: seed with the top
    * `seedSize` substrings (plus ALL single characters — coverage),
    * run `emRounds` hard-EM rounds, prune to the top `vocabSize`
    * pieces by usage (single characters again exempt), then one final
    * EM round re-scores the survivors. Every round checkpoints the
    * vocabulary-scale piece relation (the [[Clustering]] lineage
    * lesson); the word and span relations are built once. */
  def train(docs: DataFrame, vocabSize: Int = 60, maxPieceLen: Int = 4,
      seedSize: Int = 200, emRounds: Int = 2): DataFrame = {
    require(vocabSize > 0 && maxPieceLen >= 1 && emRounds >= 1)
    require(seedSize <= MaxSeedSize,
      s"seedSize=$seedSize exceeds MaxSeedSize=$MaxSeedSize: EM rounds " +
        "are driver-coordinated jobs; train huge vocabularies locally " +
        "over the (small) word-frequency relation")
    val words = wordFreqs(docs).localCheckpoint()
    val spans = spanRows(words, maxPieceLen).localCheckpoint()
    val seedCounts = spans.join(words, "word")
      .groupBy("piece").agg(sum("cnt").as("cnt")).localCheckpoint()
    // top-k cut that EXEMPTS single characters (coverage): chars come
    // from the same relation being cut, so counts stay one scale; the
    // max() only deduplicates chars that also made the top-k
    def topWithChars(rel: DataFrame, k: Int): DataFrame =
      rel.filter(length(col("piece")) === 1)
        .unionByName(rel.orderBy(col("cnt").desc, col("piece").asc)
          .limit(k))
        .groupBy("piece").agg(max("cnt").as("cnt"))
    var pieces = topWithChars(seedCounts, seedSize).localCheckpoint()
    for (_ <- 1 to emRounds)
      pieces = emRound(spans, words, pieces).localCheckpoint()
    val pruned = topWithChars(pieces, vocabSize).localCheckpoint()
    weighted(emRound(spans, words, pruned))
      .orderBy(col("cnt").desc, col("piece").asc)
  }

  /** Harness query: the trained piece table. Iterative + argmax-
    * driven, so rows-only like [[Bpe.trainQuery]]; UnigramSpec pins
    * it piece-for-piece against a plain-Scala trainer. */
  def trainQuery(docs: DataFrame): DataFrame = train(docs)

  /** ENCODE a corpus with a trained piece table — the serving step.
    * Segments the DISTINCT words (vocabulary-scale Viterbi, same DP),
    * joins back broadcast onto the token stream ([[Bpe.encode]]'s
    * shape): corpus-side cost is one scan + one map-side join.
    * Output per doc: piece stream, piece/token counts, fertility in
    * integer basis points. */
  def encode(docs: DataFrame, weightedPieces: DataFrame,
      maxPieceLen: Int = 4): DataFrame = {
    val words = docs.select(explode(wsTokens(col("text"))).as("word"))
      .distinct()
    val segs = viterbiSegments(spanRows(words, maxPieceLen),
      weightedPieces)
    docs
      .select(col("doc_id"),
        posexplode(wsTokens(col("text"))).as(Seq("pos", "word")))
      .join(broadcast(segs), "word")
      .groupBy("doc_id")
      .agg(
        array_join(flatten(transform(
          sort_array(collect_list(struct(col("pos"), col("pieces")))),
          s => s.getField("pieces"))), " ").as("uni_text"),
        sum(size(col("pieces"))).cast("long").as("n_pieces"),
        count(lit(1)).as("n_tok"))
      .select(col("doc_id"), col("uni_text"), col("n_pieces"),
        col("n_tok"),
        expr("n_pieces * 10000 DIV n_tok").as("fertility_bp"))
      .orderBy("doc_id")
  }

  /** Harness query: encode the corpus with its own freshly-trained
    * vocabulary (rows-only like [[Bpe.encodeQuery]]; UnigramSpec pins
    * segmentation parity and document reconstruction). */
  def encodeQuery(docs: DataFrame): DataFrame =
    encode(docs, train(docs))
}
