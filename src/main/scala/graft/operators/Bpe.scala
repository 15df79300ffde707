package graft.operators

import graft.functions.TextAnalysis.wsTokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training (Sennrich et al. 2016) at corpus scale —
  * the step that produces the merge table a trained tokenizer ships
  * with. Beyond the reference's surface (the whole reference engine is
  * `/root/reference/src/main.cpp:1-281`; it tokenizes by byte class
  * and never builds a vocabulary).
  *
  * The scale design is the classic BPE trick: the corpus is scanned
  * exactly ONCE, into the word-frequency relation (vocabulary-scale —
  * millions of rows where the corpus is billions of documents), and
  * every training round iterates over THAT relation, never the
  * corpus. Each round is one explode + one (s1, s2)-keyed weighted
  * count with map-side partial aggregation, a ONE-row driver collect
  * (the argmax pair — index metadata, the [[Similarity.ivfCentroids]]
  * convention), and one map applying the merge; `localCheckpoint`
  * truncates the per-round lineage (the [[Clustering]] lesson).
  *
  * Determinism: the winning pair is argmax by (count DESC, s1 ASC,
  * s2 ASC) — a total order, so training is reproducible across runs,
  * layouts, and engines. Merges apply greedily left-to-right within
  * each word ("aaa" + (a,a) -> [aa, a]), the reference BPE rule.
  */
object Bpe {

  /** One corpus scan -> (word, syms, cnt): the relation training
    * iterates on. Symbols are the word's characters plus the classic
    * `</w>` end-of-word marker (so merges can learn word-final
    * units) — explicit substring indexing, no locale- or
    * regex-dependent splitting, so the oracle replicates it. */
  def wordSymbols(docs: DataFrame): DataFrame =
    docs
      .select(explode(wsTokens(col("text"))).as("word"))
      .groupBy("word").agg(count("*").as("cnt"))
      .select(col("word"),
        expr("array_append(transform(sequence(1, length(word)), " +
          "i -> substring(word, i, 1)), '</w>')").as("syms"),
        col("cnt"))

  /** Weighted adjacent-symbol-pair counts over a (syms, cnt)
    * relation — the kernel one BPE round argmaxes over. */
  def pairCounts(wordSyms: DataFrame): DataFrame =
    wordSyms
      // the size guard matters mid-training: a fully-merged word is a
      // single symbol, and sequence(1, 0) would run DESCENDING
      .select(col("cnt"), explode(
        expr("CASE WHEN size(syms) >= 2 THEN " +
          "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(syms[i - 1] AS s1, syms[i] AS s2)) " +
          "ELSE CAST(array() AS array<struct<s1:string,s2:string>>) " +
          "END")).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum("cnt").as("cnt"))

  /** Harness query: the initial-symbolization pair counts, top 50 by
    * the training total order — the exactly-SQL-checkable face of the
    * training kernel. */
  def pairCountsQuery(docs: DataFrame, topN: Int = 50): DataFrame =
    pairCounts(wordSymbols(docs))
      .orderBy(col("cnt").desc, col("s1").asc, col("s2").asc)
      .limit(topN)

  /** Greedy left-to-right application of one merge rule (a, b) to a
    * symbol array, as a fold: when the accumulator's last symbol is
    * `a` and the next is `b`, the pair fuses; the fused symbol then
    * participates in later comparisons (so "aaa" + (a,a) gives
    * [aa, a], not [aa, aa]). */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      expr("CAST(array() AS array<string>)"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) &&
          s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** Hard ceiling on trainable rules — see the scale note on
    * [[train]]. */
  val MaxTrainableRules = 1000

  /** Max merges applied per corpus scan in [[train]]'s batched exact
    * greedy. Bounds the expression depth of the one-projection merge
    * application (each batched rule nests another `aggregate` fold),
    * keeping the generated code well inside codegen limits. */
  val MaxMergesPerScan = 8

  /** Train `nMerges` BPE merge rules. Returns (rules, segmented):
    * rules = (rank, s1, s2, merged, cnt) in training order; segmented
    * = the word-frequency relation with all merges applied — the
    * trained tokenizer's view of the vocabulary. Training stops early
    * when no pair reaches `minCount` (the remaining rule slots would
    * be noise).
    *
    * SCALE SHAPE — batched exact greedy: naively each merge rank is
    * one SEQUENTIAL driver-coordinated Spark job (one vocabulary-
    * scale pair count + a 1-row argmax collect), because rule i's
    * counts depend on rule i−1's merge. But a PREFIX of one round's
    * stale ranking can be applied together without changing the
    * greedy order, which cuts driver round trips up to
    * [[MaxMergesPerScan]]×. Soundness argument (why the batch
    * reproduces sequential greedy EXACTLY):
    *
    *  1. Collect the top B+1 stale pairs in the training total order
    *     and accept the maximal pairwise-DISJOINT-symbol prefix,
    *     stopping at the first pair that shares a symbol with any
    *     accepted one (position k+1, count `stopCnt`). Disjoint
    *     merges cannot touch each other's occurrences, so accepted
    *     pair j's count is still exact after applying pairs 1..j−1.
    *  2. Any pair whose count CAN change (conflicting stale pairs,
    *     and brand-new pairs involving a merged symbol — a new pair's
    *     occurrences embed occurrences of some conflicting stale
    *     pair) is bounded by `stopCnt`, because every conflicting
    *     pair sits at rank ≥ k+1 in the stale order.
    *  3. Therefore sequential greedy at step j must pick accepted
    *     pair j — UNLESS a changed pair could TIE its count and win
    *     the (s1, s2) tie-break. Truncating the batch to members with
    *     cnt STRICTLY greater than `stopCnt` eliminates that case.
    *
    * The first pair is always accepted, so a round makes ≥1 rule of
    * progress and degenerates to the sequential loop only on
    * adversarial all-overlapping rankings. BpeSpec pins the result
    * rule-for-rule against a plain-Scala sequential trainer, so any
    * batching bug fails a named test, not an eyeball. A production
    * 32k-rule vocabulary is still better served by exporting the
    * (small, vocabulary-scale) `wordSymbols` relation and training
    * locally; `MaxTrainableRules` (=1000) enforces that boundary
    * loudly rather than letting a job queue for hours. */
  def train(docs: DataFrame, nMerges: Int,
      minCount: Long = 2L): (DataFrame, DataFrame) = {
    require(nMerges > 0 && minCount >= 1)
    require(nMerges <= MaxTrainableRules,
      s"nMerges=$nMerges exceeds MaxTrainableRules=$MaxTrainableRules: " +
        "BPE ranks are driver-coordinated jobs; train large " +
        "vocabularies locally over the (small) wordSymbols relation")
    val spark = docs.sparkSession
    import spark.implicits._
    var wf = wordSymbols(docs).localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var done = false
    while (rules.length < nMerges && !done) {
      val budget = nMerges - rules.length
      val batchCap = math.min(MaxMergesPerScan, budget)
      // B+1 rows: B batch candidates + 1 to witness the stop count
      // when the whole window is disjoint (bounded index metadata —
      // the Similarity.ivfCentroids collect convention)
      val top = pairCounts(wf)
        .orderBy(col("cnt").desc, col("s1").asc, col("s2").asc)
        .limit(batchCap + 1).as[(String, String, Long)].collect()
      val live = top.takeWhile(_._3 >= minCount)
      if (live.isEmpty) done = true
      else {
        // maximal disjoint prefix (step 1 of the soundness argument)
        val used = scala.collection.mutable.Set.empty[String]
        val prefix = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        var i = 0
        var conflict = false
        while (i < live.length && i < batchCap && !conflict) {
          val (a, b, _) = live(i)
          if (used.contains(a) || used.contains(b)) conflict = true
          else { prefix += live(i); used += a; used += b; i += 1 }
        }
        // stop count: the first conflicting/overflow pair if any
        // (steps 2–3 — strict inequality kills tie-break hazards)
        val stopCnt =
          if (i < top.length) Some(top(i)._3) else None
        val accepted0 = stopCnt match {
          case Some(c) => prefix.takeWhile(_._3 > c)
          case None => prefix
        }
        // progress guarantee: rank 1 of the stale order IS the next
        // sequential merge even when its count ties the stop count
        val accepted =
          if (accepted0.isEmpty) prefix.take(1) else accepted0
        var seg = col("syms")
        accepted.foreach { case (a, b, cnt) =>
          rules += ((rules.length + 1L, a, b, a + b, cnt))
          seg = applyMerge(seg, a, b)
        }
        wf = wf.withColumn("syms", seg).localCheckpoint()
        if (live.length < top.length && accepted.length == live.length)
          done = true // everything at or below minCount from here on
      }
    }
    (rules.toSeq.toDF("rank", "s1", "s2", "merged", "cnt"),
      wf)
  }

  /** Harness query: the trained merge table. Iterative + argmax-
    * driven, so no closed-form SQL oracle exists (rows-only entry);
    * BpeSpec pins it rule-for-rule against a plain-Scala reference
    * BPE trainer on the same corpus. */
  def trainQuery(docs: DataFrame, nMerges: Int = 30): DataFrame =
    train(docs, nMerges)._1.orderBy("rank")

  /** ENCODE a corpus with a trained merge table — the serving step
    * (train once, tokenize every future snapshot). The merge rules
    * fold into ONE projection (rule i is an `aggregate` lambda over
    * rule i−1's output — no per-rule job, no loop state), applied to
    * the DISTINCT words of the corpus (vocabulary-scale), and the
    * per-word segmentation joins back broadcast onto the exploded
    * token stream — so the corpus-side cost is one scan + one
    * map-side join regardless of rule count. Output per doc: the
    * space-joined piece stream (with `</w>` markers), piece and token
    * counts — fertility (pieces per word) is the tokenizer-quality
    * audit, in integer basis points. */
  def encode(docs: DataFrame,
      rules: Seq[(String, String)]): DataFrame = {
    val charSyms = expr(
      "array_append(transform(sequence(1, length(word)), " +
        "i -> substring(word, i, 1)), '</w>')")
    val segCol = rules.foldLeft(charSyms) {
      case (acc, (a, b)) => applyMerge(acc, a, b)
    }
    val segs = docs
      .select(explode(wsTokens(col("text"))).as("word"))
      .distinct()
      .select(col("word"), segCol.as("syms"))
    docs
      .select(col("doc_id"),
        posexplode(wsTokens(col("text"))).as(Seq("pos", "word")))
      .join(broadcast(segs), "word")
      .groupBy("doc_id")
      .agg(
        array_join(flatten(transform(
          sort_array(collect_list(struct(col("pos"), col("syms")))),
          s => s.getField("syms"))), " ").as("bpe_text"),
        sum(size(col("syms"))).cast("long").as("n_pieces"),
        count("*").as("n_tok"))
      .select(col("doc_id"), col("bpe_text"), col("n_pieces"),
        col("n_tok"),
        expr("n_pieces * 10000 DIV n_tok").as("fertility_bp"))
      .orderBy("doc_id")
  }

  /** Harness query: encode the corpus with its own freshly-trained
    * 30-rule table (rows-only like [[trainQuery]]; BpeSpec pins the
    * per-word segmentation equal to training's own segmented relation
    * and reconstruction of every document). */
  def encodeQuery(docs: DataFrame, nMerges: Int = 30): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = train(docs, nMerges)._1
      .orderBy("rank").select("s1", "s2")
      .as[(String, String)].collect().toSeq
    encode(docs, rules)
  }
}
