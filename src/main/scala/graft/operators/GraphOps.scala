package graft.operators

import graft.functions.TextAnalysis.shingles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality over corpus-derived graphs — the second
  * graph-algorithm family next to [[Clustering]]'s connected
  * components. The flagship use is TextRank (Mihalcea & Tarau, EMNLP
  * 2004): weighted PageRank over the word co-occurrence graph, the
  * classic unsupervised keyword-extraction pass an LLM-data pipeline
  * runs to profile what a corpus is "about" (and to build
  * topic-balanced mixtures from it).
  *
  * Scale posture (100 TB): the graph is VOCABULARY-scale, not
  * corpus-scale — one corpus pass builds the bigram counts, and every
  * PageRank iteration after that is a join + aggregation over the edge
  * list (both map-side partial-aggregated, both hash-partitioned on
  * the word key, so AQE coalesces them to the graph's real size). Each
  * iteration's rank relation is `localCheckpoint`ed, the [[Clustering]]
  * lesson: without it iteration t re-executes all t-1 predecessor
  * plans AND the corpus scan under every reference.
  *
  * Beyond the reference: `main.cpp:1-281` has no joins at all
  * (SURVEY.md §2 "Joins: none of any kind").
  */
object GraphOps {

  /** Undirected weighted word co-occurrence edges: adjacent-token
    * bigrams (the same `shingles(text, 2)` unit as
    * [[TextOps.collocations]]), counted corpus-wide, kept when the
    * DIRECTED count reaches `minCount` (the PMI convention —
    * filter-then-symmetrize), self-loops dropped, then symmetrized
    * with weights merged. Output: (src, dst, w) with both directions
    * present, w = c(src→dst) + c(dst→src).
    *
    * One corpus scan; everything downstream is vocabulary-scale. */
  def cooccurrenceEdges(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val bi = docs
      .select(explode(shingles(col("text"), 2)).as("bigram"))
      .groupBy("bigram").agg(count("*").as("c"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .filter(col("c") >= minCount && col("w1") =!= col("w2"))
    bi.select(col("w1").as("src"), col("w2").as("dst"), col("c"))
      .unionAll(bi.select(col("w2").as("src"), col("w1").as("dst"),
        col("c")))
      .groupBy("src", "dst").agg(sum("c").cast("double").as("w"))
  }

  /** TextRank: damped weighted PageRank over [[cooccurrenceEdges]],
    * run for a FIXED `iters` iterations (fixed, not to-convergence, so
    * the DuckDB oracle can unroll the same number of steps):
    *
    *   r₀(v)    = 1/N
    *   rₜ₊₁(v) = (1-d)/N + d · Σ_{u~v} (w(u,v) / W(u)) · rₜ(u)
    *
    * with W(u) = Σ_x w(u,x). The graph is symmetric by construction,
    * so every node has W(u) > 0 — no dangling-mass correction needed
    * (the standard PageRank complication simply cannot arise here).
    *
    * Ranks are doubles summed in engine-defined order, so the output
    * rounds to 6 dp (the [[TextOps.collocations]] convention) and the
    * top-k cut orders by (rounded rank DESC, word ASC) — deterministic
    * on both engines. Returns (word, rank) for the top `k` keywords,
    * ordered by word.
    *
    * The per-iteration count() / collect of N touches only the
    * checkpointed vocabulary-scale node list — the same documented
    * driver-scalar pattern as [[Similarity.ivfCentroids]]. */
  def textRank(docs: DataFrame, iters: Int = 4, damping: Double = 0.85,
      minCount: Long = 5L, k: Int = 20): DataFrame = {
    require(iters >= 1, s"textRank needs at least one iteration, got $iters")
    val edges = cooccurrenceEdges(docs, minCount).localCheckpoint()
    // W(u): total incident weight per source — vocabulary-scale, read
    // by every iteration's join, so checkpoint it once too.
    val wsum = edges.groupBy("src").agg(sum("w").as("wtot"))
      .localCheckpoint()
    val n = wsum.count() // = node count: every node sources >= 1 edge
    require(n > 0, "textRank: empty co-occurrence graph " +
      "(minCount too high for this corpus)")
    val base = lit((1.0 - damping) / n)
    // edges pre-normalized to transition weights w/W(u): the join that
    // would otherwise run per iteration runs once.
    val trans = edges.join(wsum, "src")
      .select(col("src"), col("dst"), (col("w") / col("wtot")).as("p"))
      .localCheckpoint()
    var rank = wsum.select(col("src").as("word"),
      lit(1.0 / n).as("r")).localCheckpoint()
    for (_ <- 1 to iters) {
      rank = trans
        .join(rank, trans("src") === rank("word"))
        .groupBy(col("dst").as("word"))
        .agg((base + lit(damping) * sum(col("p") * col("r"))).as("r"))
        .localCheckpoint()
    }
    rank
      .select(col("word"), round(col("r"), 6).as("rank"))
      .orderBy(col("rank").desc, col("word").asc)
      .limit(k)
      .orderBy("word")
  }
}
