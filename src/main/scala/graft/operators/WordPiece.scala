package graft.operators

import graft.functions.TextAnalysis.wsTokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training + encode (Schuster & Nakajima,
  * ICASSP 2012 — BERT's tokenizer), completing the tokenizer family
  * next to [[Bpe]] (frequency-greedy merges) and [[Unigram]]
  * (likelihood-pruned pieces). Beyond the reference's surface (the
  * whole reference engine is `/root/reference/src/main.cpp:1-281`).
  *
  * WordPiece differs from BPE in exactly one place: the merge argmax
  * ranks pairs by LIKELIHOOD GAIN score = count(s1,s2) /
  * (count(s1) · count(s2)) instead of raw pair count — merging a pair
  * only when its symbols co-occur more than their independent
  * frequencies predict. Symbolization is BERT's: the word's first
  * character bare, every later character prefixed `##`; merging
  * (s1, s2) produces s1 + s2-without-`##` (the merged symbol keeps
  * s1's continuation status).
  *
  * Exact integer scoring cross-engine: score is quantized to the
  * E12 integer quotient  cnt·10^12 DIV (c1·c2)  computed in
  * DECIMAL(38,0) (products up to ~10^26 at 100 TB corpus scale stay
  * exact; the QUOTIENT is ≤ 10^12 since cnt ≤ min(c1, c2) ≤ c1·c2
  * for counts ≥ 1, so it always fits a BIGINT), with the training
  * total order (score_e12 DESC, s1 ASC, s2 ASC) — layout- and
  * engine-reproducible, the [[Bpe]] determinism convention. The E12
  * quantization is a declared refinement: two pairs whose true
  * rational scores differ only below 10^-12 tie and fall to the
  * (s1, s2) tie-break.
  *
  * Scale shape (the [[Bpe]] scaffold): ONE corpus scan into the
  * vocabulary-scale word-frequency relation; each training round is
  * two aggregations over that relation (symbol totals + adjacent-pair
  * counts), a 1-row argmax collect, and one merge-map projection with
  * `localCheckpoint` lineage truncation. Training is strictly
  * SEQUENTIAL — one merge per round: [[Bpe.train]]'s disjoint-prefix
  * batching is sound there because applying a merge only ever LOWERS
  * other pairs' counts, but a WordPiece merge lowers symbol totals
  * c(s1), c(s2) and therefore can RAISE other pairs' scores, so a
  * stale ranking prefix proves nothing about the next argmax.
  */
object WordPiece {

  /** One corpus scan -> (word, syms, cnt) with BERT symbolization:
    * first char bare, continuation chars `##`-prefixed. */
  def wordSymbols(docs: DataFrame): DataFrame =
    docs
      .select(explode(wsTokens(col("text"))).as("word"))
      .groupBy("word").agg(count("*").as("cnt"))
      .select(col("word"),
        expr("transform(sequence(1, length(word)), i -> " +
          "CASE WHEN i = 1 THEN substring(word, 1, 1) " +
          "ELSE '##' || substring(word, i, 1) END)").as("syms"),
        col("cnt"))

  /** The WordPiece scoring kernel over a (syms, cnt) relation:
    * adjacent-pair counts joined to both symbols' corpus totals, with
    * the E12-quantized likelihood score. Everything is vocabulary-
    * scale; symbol totals are a second aggregation over the same
    * checkpointed relation (alphabet-sized output, broadcast onto the
    * pair relation). */
  def scoredPairs(wordSyms: DataFrame): DataFrame = {
    val pairs = wordSyms
      .select(col("cnt"), explode(
        expr("CASE WHEN size(syms) >= 2 THEN " +
          "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(syms[i - 1] AS s1, syms[i] AS s2)) " +
          "ELSE CAST(array() AS array<struct<s1:string,s2:string>>) " +
          "END")).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum("cnt").as("cnt"))
    val symCounts = wordSyms
      .select(col("cnt").as("c"), explode(col("syms")).as("sym"))
      .groupBy("sym").agg(sum("c").as("c"))
    pairs
      .join(broadcast(symCounts.select(col("sym").as("s1"),
        col("c").as("c1"))), "s1")
      .join(broadcast(symCounts.select(col("sym").as("s2"),
        col("c").as("c2"))), "s2")
      .withColumn("score_e12",
        expr("CAST((CAST(cnt AS DECIMAL(38,0)) * 1000000000000) DIV " +
          "(CAST(c1 AS DECIMAL(38,0)) * CAST(c2 AS DECIMAL(38,0))) " +
          "AS BIGINT)"))
      .select("s1", "s2", "cnt", "c1", "c2", "score_e12")
  }

  /** Harness query: the initial-symbolization scored pairs, top 50 in
    * the training total order — the exactly-SQL-checkable face of the
    * WordPiece argmax (the [[Bpe.pairCountsQuery]] role). */
  def scoredPairsQuery(docs: DataFrame, topN: Int = 50): DataFrame =
    // checkpointed: pair counts and symbol totals both consume the
    // word-frequency relation — one corpus tokenize, not two (the
    // ScanAudit discipline; train() already checkpoints it)
    scoredPairs(wordSymbols(docs).localCheckpoint())
      .orderBy(col("score_e12").desc, col("s1").asc, col("s2").asc)
      .limit(topN)

  /** Greedy left-to-right application of one WordPiece merge (a, b):
    * the [[Bpe]] fold with the `##`-stripping merge name. */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    val merged = a + b.stripPrefix("##")
    aggregate(syms,
      expr("CAST(array() AS array<string>)"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) &&
          s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(s))))
  }

  /** Train `nMerges` WordPiece rules sequentially (see object doc for
    * why no batching). Returns (rank, s1, s2, merged, cnt, score_e12)
    * in training order; stops early when the best pair's count falls
    * below `minCount` (a high-score singleton pair is noise, the
    * standard guard). Rows-only as a harness query (argmax loop — no
    * closed SQL form); WordPieceSpec pins it rule-for-rule against a
    * plain-Scala reference trainer. */
  def train(docs: DataFrame, nMerges: Int,
      minCount: Long = 2L): DataFrame = {
    require(nMerges > 0 && nMerges <= Bpe.MaxTrainableRules)
    val spark = docs.sparkSession
    import spark.implicits._
    var wf = wordSymbols(docs).localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Long)]
    var done = false
    // checkpoint cadence: merges must APPLY sequentially (see object
    // doc), but they need not MATERIALIZE sequentially — up to 4
    // applyMerge folds nest in the lineage before a localCheckpoint
    // truncates it (deeper nests blow past the JIT method limit the
    // Bpe batching work measured), cutting materialization jobs 4x
    // with rule-for-rule identical output (WordPieceSpec).
    var sinceCkpt = 0
    while (rules.length < nMerges && !done) {
      val top = scoredPairs(wf)
        .orderBy(col("score_e12").desc, col("s1").asc, col("s2").asc)
        .limit(1).select("s1", "s2", "cnt", "score_e12")
        .as[(String, String, Long, Long)].collect()
      if (top.isEmpty || top.head._3 < minCount) done = true
      else {
        val (a, b, cnt, sc) = top.head
        rules += ((rules.length + 1L, a, b, a + b.stripPrefix("##"),
          cnt, sc))
        wf = wf.withColumn("syms", applyMerge(col("syms"), a, b))
        sinceCkpt += 1
        if (sinceCkpt == 4) { wf = wf.localCheckpoint(); sinceCkpt = 0 }
      }
    }
    rules.toSeq
      .toDF("rank", "s1", "s2", "merged", "cnt", "score_e12")
      .orderBy("rank")
  }

  /** The greedy longest-match-first WordPiece ENCODE against an
    * explicit vocabulary: the serving step, and — unlike
    * [[Bpe.encode]] / [[Unigram.encode]] — fully ORACLE-able, because
    * greedy longest-match is a deterministic walk a recursive CTE
    * replays exactly (no trained argmax state). The vocabulary is the
    * corpus's own single-character symbols (coverage: every in-corpus
    * word can fall back to chars) plus `extraPieces` (multi-char
    * pieces — injected literals in the harness, the
    * `q_ann_ivf_injected` convention, so the SQL twin embeds the
    * identical list). A position with NO vocab match marks the whole
    * word `[UNK]`, the standard WordPiece rule — reachable when the
    * char vocab comes from a TRAINING corpus via `vocabDocs` (the
    * serving deployment: vocab frozen at train time, encode sees new
    * text) and an encoded word carries an out-of-vocab character;
    * with the default self-derived vocab every word is coverable and
    * `n_unk` is provably 0.
    *
    * Scale shape: segmentation runs once per DISTINCT word
    * (vocabulary-scale — candidates are |word|·maxL substring probes
    * joined broadcast against the vocab, best match per position by
    * max length, then ONE `aggregate` fold walks the word), and
    * segmentations join back broadcast onto the exploded token stream
    * — corpus cost is one scan + a map-side join, the [[Bpe.encode]]
    * physics. Output per doc: piece text, piece/token/`[UNK]`-word
    * counts, fertility in integer basis points. */
  def encode(docs: DataFrame, extraPieces: Seq[String],
      vocabDocs: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // checkpointed: the distinct-word relation feeds the char vocab,
    // the candidate probes, and the segmentation — one corpus
    // tokenize, not three (the ScanAudit discipline)
    val words = docs
      .select(explode(wsTokens(col("text"))).as("word")).distinct()
      .localCheckpoint()
    val vocabWords = vocabDocs.fold(words)(
      _.select(explode(wsTokens(col("text"))).as("word")).distinct()
        .localCheckpoint())
    val charVocab = vocabWords.select(explode(
      expr("transform(sequence(1, length(word)), i -> " +
        "CASE WHEN i = 1 THEN substring(word, 1, 1) " +
        "ELSE '##' || substring(word, i, 1) END)")).as("piece"))
      .distinct()
    val vocab = charVocab
      .unionByName(extraPieces.toDF("piece")).distinct()
    val maxL = (1 +: extraPieces.map(_.stripPrefix("##").length)).max
    val best = words
      .select(col("word"),
        explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(col("word"), col("p"),
        explode(sequence(lit(1),
          least(lit(maxL), length(col("word")) - col("p") + 1))).as("l"))
      .withColumn("piece",
        when(col("p") === 1, expr("substring(word, p, l)"))
          .otherwise(concat(lit("##"), expr("substring(word, p, l)"))))
      .join(broadcast(vocab), "piece")
      .groupBy("word", "p")
      .agg(max(struct(col("l"), col("piece"))).as("m"))
      .groupBy("word")
      .agg(map_from_entries(
        collect_list(struct(col("p"), col("m")))).as("mm"))
    val segs = best
      .withColumn("seg", expr(
        "aggregate(sequence(1, length(word)), " +
          "named_struct('pos', 1, " +
          "'pieces', CAST(array() AS array<string>), 'unk', false), " +
          "(acc, i) -> CASE WHEN i != acc.pos THEN acc " +
          "WHEN mm[i] IS NOT NULL THEN named_struct(" +
          "'pos', acc.pos + mm[i].l, " +
          "'pieces', array_append(acc.pieces, mm[i].piece), " +
          "'unk', acc.unk) " +
          "ELSE named_struct('pos', acc.pos + 1, 'pieces', acc.pieces, " +
          "'unk', true) END, " +
          "acc -> named_struct(" +
          "'pieces', CASE WHEN acc.unk THEN array('[UNK]') " +
          "ELSE acc.pieces END, 'unk', acc.unk))"))
      .select(col("word"), col("seg.pieces").as("pieces"),
        col("seg.unk").as("unk"))
    docs
      .select(col("doc_id"),
        posexplode(wsTokens(col("text"))).as(Seq("pos", "word")))
      .join(broadcast(segs), "word")
      .groupBy("doc_id")
      .agg(
        array_join(flatten(transform(
          sort_array(collect_list(struct(col("pos"), col("pieces")))),
          s => s.getField("pieces"))), " ").as("wp_text"),
        sum(size(col("pieces"))).cast("long").as("n_pieces"),
        sum(when(col("unk"), 1L).otherwise(0L)).as("n_unk"),
        count("*").as("n_tok"))
      .select(col("doc_id"), col("wp_text"), col("n_pieces"),
        col("n_unk"), col("n_tok"),
        expr("n_pieces * 10000 DIV n_tok").as("fertility_bp"))
      .orderBy("doc_id")
  }
}
