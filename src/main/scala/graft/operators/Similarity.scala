package graft.operators

import graft.functions.Vectors._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact baseline. The (small) query set is
  *     broadcast, so the big side streams through one
  *     BroadcastNestedLoopJoin scan — no shuffle of the corpus; the
  *     only exchange is the per-query window top-k, whose input is
  *     already cut to |corpus| x |queries| scored rows.
  *   - [[lshTopK]]: the scale path. Signed-random-projection buckets
  *     (deterministic seeded hyperplanes) index the corpus; queries
  *     multi-probe all buckets within `probeHamming` bit flips, then
  *     score only the candidates. At 100 TB the bucket join replaces
  *     the full scan per query batch: cost ~ (corpus/2^bits) x probes
  *     per query.
  */
object Similarity {

  /** Deterministic unit-free hyperplanes from a fixed seed. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** The per-query top-k contract — (cos DESC, vec_id ASC) total
    * order, rounded output — defined ONCE for every scorer; `extra`
    * columns (e.g. labels) ride along after the core four. */
  private def scoredTopK(cand: DataFrame, k: Int,
      extra: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id") +: col("vec_id") +:
        // + 0.0: a tiny negative cosine rounds to IEEE -0.0, rendered
        // "-0" vs "0" across engines (the 10x-rehearsal dsir lesson)
        (round(col("cos"), 4) + lit(0.0)).as("cos") +: col("rank") +:
        extra.map(col): _*)
      .orderBy("query_id", "rank")
  }

  /** Exact cosine top-k of every corpus vector for each query vector
    * (self-matches excluded). `queryPred` selects the query rows out of
    * `embs` (kept small; it is broadcast). */
  def bruteForceTopK(embs: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val q = e.filter(queryPred).toDF("query_id", "qv")
    val scored = e
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    scoredTopK(scored, k)
  }

  /** Per-query recall@k of an approximate top-k relation against the
    * exact [[bruteForceTopK]] ranking, in basis points — the standard
    * ANN quality metric (Jégou et al. PAMI'11 §V), computed IN-PLAN so
    * the harness can gate on it. `approx` must carry (query_id,
    * vec_id) rows (any extra columns ignored). Both sides are k-row
    * bounded relations per query, so the intersection join and the
    * per-query count are |queries|·k-scale work; the only corpus-scale
    * cost is the exact scorer itself, which is the price of ground
    * truth (at 100 TB one runs this on a sampled query panel, not
    * every serve — the panel IS this relation with a tighter
    * queryPred). Integer bp math: ties in the exact ranking are
    * resolved by the shared (cos DESC, vec_id ASC) total order, so
    * recall is deterministic. */
  def recallAtK(embs: DataFrame, approx: DataFrame, queryPred: Column,
      k: Int): DataFrame = {
    val exact = bruteForceTopK(embs, queryPred, k)
      .select(col("query_id"), col("vec_id"))
    val hits = approx.select(col("query_id"), col("vec_id"))
      .join(exact, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_hits"), lit(0L)) * lit(10000L) / col("n_exact"))
          .cast("long").as("recall_bp"))
      .orderBy("query_id")
  }

  /** Bounded-error GATE over [[recallAtK]]: per query, TRUE iff
    * recall@k clears the per-query sanity floor `floorBp`, plus a
    * shared `panel_ok` column, TRUE iff the panel MEAN recall clears
    * `meanFloorBp` (the spec-pinned aggregate bound made
    * driver-visible). This is how an estimator becomes
    * answer-checkable without pretending its internals are portable:
    * the exact side (the query panel itself) replays in any engine,
    * and the booleans turn estimator drift into a hash mismatch —
    * the harness convention for every trained/approximate operator
    * (q_ann_ivf/lsh/pq). Floors sit under the measured recall
    * (graft.AnnRecallProbe, PERF.md §"ANN recall floors") so they
    * trip on regressions, not noise: the trained artifacts are
    * seed-deterministic, so measured recall per (dataset, family) is
    * a constant. The mean aggregate is one row over the ≤|queries|
    * panel — broadcast back, no second corpus pass. */
  def recallGate(embs: DataFrame, approx: DataFrame, queryPred: Column,
      k: Int, floorBp: Int, meanFloorBp: Int): DataFrame = {
    val r = recallAtK(embs, approx, queryPred, k)
    val m = r.agg(avg(col("recall_bp")).as("mean_bp"))
    r.crossJoin(broadcast(m))
      .select(col("query_id"),
        (col("recall_bp") >= floorBp).as("recall_ok"),
        (col("mean_bp") >= meanFloorBp).as("panel_ok"))
      .orderBy("query_id")
  }

  /** Hard-negative mining for contrastive training: for each anchor
    * (selected by `queryPred`, broadcast), the exact cosine top-k
    * among vectors with a DIFFERENT label — the near-boundary
    * negatives a contrastive or reranker objective learns most from
    * (easy negatives are information-free). Same physics as
    * [[bruteForceTopK]]: one corpus scan, anchors broadcast, the
    * label-inequality predicate rides the broadcast join (it also
    * excludes self-matches for free). This is the verification-scale
    * baseline; at 100 TB the anchor set goes through [[lshTopK]] /
    * [[ivfTopK]] candidate generation first and this scorer runs on
    * the candidate relation instead of the full scan. */
  def hardNegatives(embs: DataFrame, queryPred: Column,
      k: Int): DataFrame = {
    val e = embs.select(col("vec_id"), col("label"),
      toDoubleVec(col("embedding")).as("v"))
    val q = e.filter(queryPred).toDF("query_id", "q_label", "qv")
    val scored = e.join(broadcast(q), col("label") =!= col("q_label"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    scoredTopK(scored, k, extra = Seq("q_label", "label"))
      .select(col("query_id"), col("q_label"), col("vec_id"),
        col("label"), col("cos"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** HYBRID retrieval — Reciprocal Rank Fusion (Cormack et al.
    * SIGIR'09) of a lexical BM25 ranking and a dense cosine ranking:
    * the standard production RAG retrieval stack, where each leg
    * catches what the other misses (BM25 the exact-term matches dense
    * embeddings wash out, dense the paraphrases BM25 cannot see).
    * Each doc's fused score is Σ_legs 1/(rrfK + rank), summed over
    * the legs that ranked it (a doc absent from a leg contributes
    * nothing there — standard RRF).
    *
    * Scale shape: each leg is its own already-scale-shaped operator
    * ([[CorpusOps.bm25]]: one tokenize lineage, scalars broadcast;
    * [[bruteForceTopK]]: corpus streamed past the broadcast query —
    * at 100 TB the dense leg swaps in [[lshTopK]]/[[ivfTopK]]
    * candidates with no change here). The fusion itself touches only
    * the two ≤ n-row top lists — bounded relations, so the
    * unpartitioned rank windows and the full-outer merge are all
    * k-row work (the PrefixSum bounded-window convention).
    *
    * Dense-side ids are `vec_id` = `doc_id` (the testdata contract:
    * embeddings cover a prefix of the corpus — docs without a vector
    * simply never appear in the dense leg, as in any deployment where
    * the dense index lags the corpus). Absent ranks surface as 0 in
    * the output (ranks are 1-based) so the row stays scalar-typed for
    * the harness compare. Cross-engine exactness: ranks are integers;
    * 1/(rrfK+rank) and the ≤2-term sum are identical IEEE doubles on
    * both engines, rounded at 6 dp before the final cut. */
  def hybridRrf(docs: DataFrame, embs: DataFrame, terms: Seq[String],
      queryPred: Column, k: Int = 20, n: Int = 50,
      rrfK: Int = 60): DataFrame = {
    // bounded window: ≤ n rows post-limit (bm25 already cut to n)
    val lex = CorpusOps.bm25(docs, terms, k = n)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val dense = bruteForceTopK(embs, queryPred, n)
      .select(col("vec_id").as("doc_id"), col("rank").as("vec_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf", round(
        when(col("lex_rank") > 0,
          lit(1.0) / (lit(rrfK.toDouble) + col("lex_rank"))).otherwise(0.0) +
        when(col("vec_rank") > 0,
          lit(1.0) / (lit(rrfK.toDouble) + col("vec_rank"))).otherwise(0.0),
        6)).orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
      .orderBy("doc_id")
  }

  /** 1-bit (sign) embedding quantization: bit i = (v[i] >= 0), packed
    * into ceil(dim/32) words of 32 bits each, stored in BIGINTs. The
    * 32-bit word convention is deliberate: bit 31 is 2^31, far from
    * the BIGINT sign bit, so both engines build the identical
    * non-negative integers with plain shift-and-add — a 64-bit pack
    * would put bit 63 at 2^63 and overflow every SQL engine's signed
    * arithmetic (the reason the DuckDB twin can replay this
    * verbatim). IEEE note: -0.0 >= 0 is true in both engines, so the
    * sign rule has no negative-zero edge. 32x memory cut per vector
    * (64 float32 -> 2 longs) — the footprint that lets a 100 TB
    * corpus's index live in memory where the float vectors cannot. */
  def binaryQuantize(embs: DataFrame, dim: Int): DataFrame = {
    val w = (dim + 31) / 32
    embs.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("bits", expr(
        s"""transform(sequence(0, ${w - 1}), wd ->
           |  aggregate(sequence(0, 31), 0L, (acc, i) ->
           |    acc + IF(wd * 32 + i < $dim AND v[wd * 32 + i] >= 0,
           |      shiftleft(1L, i), 0L)))""".stripMargin))
      .select(col("vec_id"), col("bits"))
  }

  /** Harness face of [[binaryQuantize]]: packed words as CSV (the
    * mm_features convention — the harness compare wants scalar
    * columns) plus the positive-sign popcount. */
  def binaryQuantizeQuery(embs: DataFrame, dim: Int = 64): DataFrame =
    binaryQuantize(embs, dim)
      .select(col("vec_id"),
        array_join(transform(col("bits"), b => b.cast("string")), ",")
          .as("bits_csv"),
        expr("aggregate(transform(bits, b -> bit_count(b)), 0, " +
          "(acc, c) -> acc + c)").cast("long").as("n_pos"))
      .orderBy("vec_id")

  /** Hamming-candidate ANN with exact rerank — the 1-bit retrieval
    * scale path (Han et al.-style binary codes; the production
    * "binary quantization + rescoring" stack): the 32x-smaller sign
    * index ranks ALL corpus vectors by Hamming distance per query,
    * the top `m` survivors are re-scored with exact float cosine, and
    * the final answer is the cosine top `k`. Unlike [[lshTopK]] /
    * [[ivfTopK]] this is fully ORACLED: every step is a deterministic
    * total order (hamming ASC, vec_id ASC; then the scoredTopK
    * contract), and Hamming distance over sign bits EQUALS the
    * sign-disagreement count the DuckDB twin computes directly from
    * the floats — no packed representation needs to cross engines
    * (SimilaritySpec pins popcount-of-xor == sign-disagreement).
    *
    * Scale shape: the bit index streams past the broadcast query
    * bits (one scan of 2-long rows, not float vectors); the top-m cut
    * is a per-query window over already-scored scalar rows; the
    * rerank joins the |queries|*m candidate list BROADCAST against
    * the corpus scan, so full float vectors are only ever read for
    * the m survivors and never cross a shuffle. `queryPred` is
    * evaluated on the (vec_id, bits) index relation, so it may only
    * reference `vec_id` — an embedding-typed predicate belongs on a
    * pre-filtered `embs` instead. */
  def hammingTopK(embs: DataFrame, queryPred: Column, k: Int,
      m: Int, dim: Int = 64): DataFrame = {
    val bits = binaryQuantize(embs, dim)
    val qb = bits.filter(queryPred).toDF("query_id", "qbits")
    val ham = bits.join(broadcast(qb), col("vec_id") =!= col("query_id"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(bits, qbits, (x, y) -> bit_count(x ^ y)), " +
          "0, (acc, c) -> acc + c)").cast("long"))
      .select("query_id", "vec_id", "hamming")
    val wm = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("vec_id").asc)
    val cand = ham.withColumn("hrank", row_number().over(wm))
      .filter(col("hrank") <= m)
      .select("query_id", "vec_id", "hamming")
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val q = e.filter(queryPred).toDF("query_id", "qv")
    val scored = e
      .join(broadcast(cand), "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("cos", cosine(col("qv"), col("v")))
    scoredTopK(scored, k, extra = Seq("hamming"))
  }

  /** Matryoshka (MRL, Kusupati et al. 2022) truncation audit: for
    * each prefix dimension d, the per-query cosine top-k under the
    * TRUNCATED vectors vs the full-dimension top-k — recall@k per
    * (d, query) in integer basis points. This is the serving-dim
    * decision input for MRL-trained embeddings: the d where recall
    * plateaus is the cheapest index that loses nothing.
    *
    * One corpus pass scores EVERY dimension tier: the corpus streams
    * past the broadcast queries once, each tier's cosine is computed
    * from the row's sliced prefix (prefix dots share no state, so
    * they are independent expressions in one projection), and a
    * single explode turns the tier struct into (trunc_dim, cos) rows
    * — one window shuffle ranks all tiers at once (partitioned by
    * query AND tier, never one partition). Overlap vs the full-dim
    * set is read off the SAME lineage with a second window over the
    * (|queries| * |tiers| * k)-row post-limit relation (bounded;
    * partitioned by (query, vec)) — a self-join against the tier-0
    * slice would recompute the whole scored pass, the plan trap
    * PlanSpec pins against. Fully oracled: ranks are deterministic
    * (cos DESC, vec_id ASC), recall_bp is exact integer arithmetic,
    * and both engines fold the dot products left-to-right. */
  /** Shared tier ranking for the MRL audits: per (query, tier) cosine
    * top-k under each prefix dimension, tier 0 = full dimension.
    * One corpus pass (see [[mrlRecall]]'s scaladoc for the physics);
    * returns (query_id, trunc_dim, vec_id, rank). */
  private def mrlTierTopK(embs: DataFrame, dims: Seq[Int],
      queryPred: Column, k: Int): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1))
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val q = e.filter(queryPred).toDF("query_id", "qv")
    def cosAt(d: Int): Column = {
      val (qd, vd) = (slice(col("qv"), 1, d), slice(col("v"), 1, d))
      dot(qd, vd) / (sqrt(dot(qd, qd)) * sqrt(dot(vd, vd)))
    }
    // tier 0 = the full-dimension reference ranking
    val tiers = struct(lit(0).as("trunc_dim"),
      cosine(col("qv"), col("v")).as("cos")) +:
      dims.map(d => struct(lit(d).as("trunc_dim"), cosAt(d).as("cos")))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        explode(array(tiers: _*)).as("t"))
      .select(col("query_id"), col("vec_id"),
        col("t.trunc_dim").as("trunc_dim"), col("t.cos").as("cos"))
    val w = Window.partitionBy("query_id", "trunc_dim")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "trunc_dim", "vec_id", "rank")
  }

  def mrlRecall(embs: DataFrame, dims: Seq[Int], queryPred: Column,
      k: Int): DataFrame = {
    val topk = mrlTierTopK(embs, dims, queryPred, k)
    // bounded window: |queries| * (|dims| + 1) * k rows post-limit
    val wf = Window.partitionBy("query_id", "vec_id")
    topk
      .withColumn("in_full",
        max(when(col("trunc_dim") === 0, 1L).otherwise(0L)).over(wf))
      .filter(col("trunc_dim") =!= 0)
      .groupBy("trunc_dim", "query_id")
      .agg(sum(col("in_full")).as("overlap"))
      .withColumn("recall_bp", expr(s"overlap * 10000 DIV $k"))
      .orderBy("trunc_dim", "query_id")
  }

  /** Rank-Biased Overlap (Webber et al. TOIS 2010) between each
    * truncated-dimension ranking and the full-dimension ranking —
    * recall@k ([[mrlRecall]]) treats the top-k as a SET; RBO is the
    * top-WEIGHTED comparison (an agreement at rank 1 counts more
    * than one at rank k), the standard metric when serving quality
    * depends on the head of the list.
    *
    * RBO_k = (1−p)·Σ_{d=1..k} p^(d−1)·|A_d ∩ B_d|/d over prefix
    * depths d. Regrouped per common element v (ranks ra in A, rb in
    * B): RBO_k = (1−p)·Σ_v S(max(ra, rb)) — a (tier, query) whose
    * lists share NOTHING has an empty sum and emits NO row (its RBO
    * is 0; the oracle drops the same groups, so absence IS the
    * encoding) — with the suffix sums
    * S(m) = Σ_{d=m..k} p^(d−1)/d. ENGINE-EXACT by construction: the
    * k suffix sums are computed ONCE here in Scala, quantized to E12
    * integers, and embedded as the SAME literal table in the plan
    * and the DuckDB oracle — so the per-query aggregation is an
    * integer SUM (order-independent) and the output rbo_e12 =
    * Σ S_e12(max) DIV 10 (≈ RBO·10^12) (the (1−p) = 1/10 factor for p = 0.9) is
    * exact integer arithmetic end to end. No pow(), no float sums.
    *
    * Shape: the tier ranking relation self-pairs on (query, vec)
    * through one bounded window (the [[mrlRecall]] trick — never a
    * self-join that would recompute the scored pass), then one
    * integer aggregation. */
  def mrlRbo(embs: DataFrame, dims: Seq[Int], queryPred: Column,
      k: Int, p: Double = 0.9): DataFrame = {
    require(p > 0.0 && p < 1.0)
    // S_e12(m), 1-based; S(k+1) = 0 for elements absent from a list.
    // p^(d-1) by repeated multiplication, NOT pow(): every step is a
    // strict IEEE double op any runtime reproduces bit-for-bit, so
    // the oracle's literal table regenerates to identical integers
    // (pow() is libm-specific — the TrainingOps sqrt-not-pow lesson).
    val sE12: Array[Long] = {
      val pws = new Array[Double](k + 1)
      var pw = 1.0
      for (d <- 1 to k) { pws(d) = pw; pw *= p }
      val s = new Array[Double](k + 2)
      for (d <- k to 1 by -1) s(d) = s(d + 1) + pws(d) / d
      s.map(x => math.floor(x * 1e12 + 0.5).toLong)
    }
    val topk = mrlTierTopK(embs, dims, queryPred, k)
    val wf = Window.partitionBy("query_id", "vec_id")
    topk
      .withColumn("full_rank",
        max(when(col("trunc_dim") === 0, col("rank"))).over(wf))
      .filter(col("trunc_dim") =!= 0 && col("full_rank").isNotNull)
      .withColumn("s_e12",
        element_at(typedlit(sE12.toSeq),
          greatest(col("rank"), col("full_rank")).cast("int") + 1))
      .groupBy("trunc_dim", "query_id")
      .agg(count("*").as("n_common"),
        expr("sum(s_e12) DIV 10").as("rbo_e12"))
      .orderBy("trunc_dim", "query_id")
  }

  /** Semantic eval-set decontamination: every corpus vector whose
    * embedding cosine against ANY benchmark vector (selected by
    * `benchPred`) reaches `minCos` — the paraphrase-level leakage the
    * n-gram decontamination pass ([[CorpusOps.decontaminate]]) cannot
    * see, because a reworded eval question shares no shingles with
    * its source. The benchmark side is eval-set-sized, so it
    * BROADCASTS; the corpus is scanned once and scored map-side, and
    * only the (rare) flagged rows reach the per-vector aggregation —
    * the decontamination physics at 100 TB. The threshold compares
    * the ROUNDED cosine so the boundary is engine-exact.
    *
    * Output per flagged corpus vector: how many benchmark vectors it
    * collides with and the worst (max) cosine. */
  def semanticDecontaminate(embs: DataFrame, benchPred: Column,
      minCos: Double): DataFrame = {
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val bench = e.filter(benchPred).toDF("bench_id", "bv")
    e.filter(!benchPred)
      .join(broadcast(bench),
        round(cosine(col("v"), col("bv")), 4) >= minCos)
      .groupBy("vec_id")
      .agg(count("*").as("n_bench_hits"),
        round(max(cosine(col("v"), col("bv"))), 4).as("max_cos"))
      .orderBy("vec_id")
  }

  private def unitVec(c: Array[Double]): Array[Double] = {
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0.0) c else c.map(_ / n)
  }

  /** Deterministic IVF centroids from `e` (vec_id, v), in two stages:
    *
    *  1. SEEDS: collect a hash-ordered sample of `8 * nCells` vectors
    *     (uniform over the corpus regardless of how ids correlate with
    *     geometry — first-N ids routinely do: ingest order clusters by
    *     source) and greedily pick up to `nCells` farthest-point seeds
    *     from it (k-means++-style, min-max-cosine) — one seed per
    *     DISTINCT cluster direction: already-chosen candidates are
    *     excluded and seeding stops early when every remaining sample
    *     duplicates a seed direction, so a degenerate sample yields
    *     fewer (honest) cells instead of identical centroids.
    *  2. REFINE: `iters` rounds of distributed spherical k-means. Each
    *     round is one map-side argmax assignment + one (cell, dim)-
    *     keyed sum shuffle of nCells×dim partial-aggregated rows, then
    *     a tiny driver collect (nCells×dim doubles — index metadata,
    *     not data). Empty cells keep their previous centroid. */
  def ivfCentroids(e: DataFrame, nCells: Int,
      iters: Int = 2): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = e
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(8 * nCells)
      .select("v").collect().map(_.getSeq[Double](0).toArray).map(unitVec)
    require(sample.nonEmpty, "ivfCentroids on an empty relation")
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // farthest point = lowest maximum cosine to any chosen seed; ties
    // resolve to the earliest sample position (deterministic). Chosen
    // indices are excluded and the loop STOPS once every remaining
    // candidate duplicates a seed direction (max-cos ~ 1): re-picking
    // sample(0) forever — the old behavior on a degenerate sample —
    // filled the index with identical centroids. Fewer distinct
    // directions than nCells ⇒ fewer cells, which is the honest index
    // for that geometry (spec-pinned on an all-duplicates fixture).
    val seeds = scala.collection.mutable.ArrayBuffer(sample(0))
    val chosen = scala.collection.mutable.BitSet(0)
    // maxCos(i) = max cosine of sample(i) to any seed so far, updated
    // incrementally as seeds land (O(sample x seeds) total, not per pick)
    val maxCos = Array.fill(sample.length)(-2.0)
    var frontier = 0 // seeds whose contribution is already in maxCos
    var exhausted = false
    while (seeds.size < nCells && !exhausted) {
      while (frontier < seeds.size) {
        val s = seeds(frontier)
        var i = 0
        while (i < sample.length) {
          if (!chosen(i)) {
            val d = dotp(sample(i), s)
            if (d > maxCos(i)) maxCos(i) = d
          }
          i += 1
        }
        frontier += 1
      }
      var best = -1; var bestV = Double.MaxValue
      var i = 0
      while (i < sample.length) {
        if (!chosen(i) && maxCos(i) < bestV) { bestV = maxCos(i); best = i }
        i += 1
      }
      if (best < 0 || bestV >= 1.0 - 1e-9) exhausted = true
      else { seeds += sample(best); chosen += best }
    }
    var cents: Array[Array[Double]] = seeds.toArray
    val dim = cents.headOption.map(_.length).getOrElse(0)
    var it = 0
    while (it < iters) {
      val cs = array(cents.map(c => dot(col("v"), typedlit(c.toSeq))): _*)
      // element-wise member sums: explode to (cell, pos) — the shuffle
      // carries partial-aggregated nCells×dim rows, not vectors
      val sums = e
        .withColumn("cs", cs)
        .withColumn("cell",
          (array_position(col("cs"), array_max(col("cs"))) - 1).cast("int"))
        .select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(sum("col").as("s"))
        .collect()
      val next = cents.map(_.clone())
      sums.groupBy(_.getAs[Int]("cell")).foreach { case (cell, rows) =>
        val v = new Array[Double](dim)
        rows.foreach(r => v(r.getAs[Int]("pos")) = r.getAs[Double]("s"))
        val u = unitVec(v)
        // mean direction = direction of the sum (spherical k-means)
        if (u.exists(_ != 0.0)) next(cell) = u
      }
      cents = next
      it += 1
    }
    cents
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned
    * into `nCells` Voronoi cells around centroid vectors; queries score
    * only the vectors in their `nProbe` closest cells.
    *
    * Centroids come from [[ivfCentroids]] (hash-sampled seeds + 2
    * spherical k-means rounds, deterministic) unless a trained set is
    * injected via `centroids` — the production shape, where the index
    * is built ONCE and reused across query batches: the default path
    * re-trains (1 + `kmeansIters` full-corpus jobs + driver collects)
    * on EVERY call, which is only acceptable for one-shot queries —
    * repeated callers should train via [[ivfCentroids]] and inject. Cell assignment is
    * an argmax over `nCells` codegen'd dot products per row, entirely
    * map-side; the candidate join is a hash join on the cell id.
    * Candidate volume per query ~= nProbe/nCells of the corpus — the
    * classic recall/cost dial. Output schema matches
    * [[bruteForceTopK]]; recall < 1 by construction (spec-pinned vs
    * brute force).
    */
  def ivfTopK(embs: DataFrame, queryPred: Column, k: Int,
      nCells: Int = 16, nProbe: Int = 4, kmeansIters: Int = 2,
      centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    require(nProbe <= nCells)
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val cents: Array[Array[Double]] =
      centroids.getOrElse(ivfCentroids(e, nCells, kmeansIters))
    ivfProbeFrom(ivfAssign(e, cents), cents,
      e.filter(queryPred).toDF("query_id", "qv"), k, nProbe)
  }

  /** The (vec_id, v, cell) cell-assignment relation — IVF's
    * materialize-once index half ([[graft.sources.AnnIndexStore]]
    * persists it PARTITIONED by cell, so a probe's nProbe-cell read
    * prunes every other cell's files). |v| is constant across cells,
    * so argmax of dot-with-unit-centroid IS the nearest cell by
    * cosine. */
  private[graft] def ivfAssign(e: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    val cs = array(cents.map(c => dot(col("v"), typedlit(c.toSeq))): _*)
    e.withColumn("cs", cs)
      .withColumn("cell",
        (array_position(col("cs"), array_max(col("cs"))) - 1).cast("int"))
      .select("vec_id", "v", "cell")
  }

  /** Per-query probed cells: (query_id, qv, cell) for the nProbe
    * closest centroids — the driver-bounded side of the candidate
    * join (|queries| x nProbe rows). */
  private[graft] def ivfProbes(queries: DataFrame,
      cents: Array[Array[Double]], nProbe: Int): DataFrame = {
    val cellScores =
      array(cents.map(c => dot(col("qv"), typedlit(c.toSeq))): _*)
    val probeRank = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cell").asc)
    queries
      .select(col("query_id"), col("qv"), posexplode(cellScores))
      .toDF("query_id", "qv", "cell", "score")
      .withColumn("r", row_number().over(probeRank))
      .filter(col("r") <= nProbe)
      .select("query_id", "qv", "cell")
  }

  /** Probe half of [[ivfTopK]] — the assignment relation passed in,
    * fresh or read back from cell-partitioned parquet. */
  private[graft] def ivfProbeFrom(idx: DataFrame,
      cents: Array[Array[Double]], queries: DataFrame, k: Int,
      nProbe: Int): DataFrame = {
    val probes = ivfProbes(queries, cents, nProbe)
    val cand = idx.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    scoredTopK(cand, k)
  }

  /** Per-label embedding cluster cohesion in ONE LINEAR pass: the
    * mean pairwise cosine inside each label, computed via the sum
    * identity
    *
    *   Σ_{i≠j} ⟨u_i, u_j⟩ = ‖Σ_i u_i‖² − n      (u = unit vectors)
    *
    * so the O(n²)-pair measure costs one O(n·d) aggregation — a
    * (label, dim)-keyed partial sum over posexploded unit
    * coordinates, then per-label arithmetic. No pair join exists in
    * the plan; at 100 TB this is the difference between measuring
    * cluster quality and not measuring it. Labels with one vector
    * are dropped (the measure is undefined); zero vectors are
    * excluded before normalization. Output rounded to 4 decimals
    * (cross-engine float-sum ulps, the [[CorpusOps.tfIdf]] rule). */
  def labelCohesion(embs: DataFrame): DataFrame = {
    val u = embs
      .select(col("label"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nr", sqrt(normSq(col("v"))))
      .filter(col("nr") > 0)
      .select(col("label"), transform(col("v"), x => x / col("nr")).as("u"))
    val dimSums = u
      .select(col("label"), posexplode(col("u")))
      .groupBy("label", "pos").agg(sum("col").as("s"))
      .groupBy("label").agg(sum(col("s") * col("s")).as("sumsq"))
    val counts = u.groupBy("label").agg(count("*").as("n"))
    counts.join(dimSums, "label")
      .filter(col("n") >= 2)
      .select(col("label"), col("n"),
        // + 0.0 normalizes IEEE -0.0 (near-orthogonal labels round to
        // zero from below; "-0" vs "0" breaks the driver's compare)
        (round((col("sumsq") - col("n")) /
          (col("n") * (col("n") - lit(1.0))), 4) + lit(0.0)).as("mean_cos"))
      .orderBy("label")
  }

  /** Product-quantization codebooks (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the
    * `dim`-dim space splits into `m` contiguous subspaces of
    * `dim / m` dims; each subspace gets its own `k`-centroid codebook.
    * Training runs DRIVER-SIDE on a hash-ordered sample
    * (deterministic, uniform regardless of id/geometry correlation —
    * the [[ivfCentroids]] sampling argument): farthest-point seeding
    * then `iters` Lloyd rounds per subspace, all on `sampleSize`
    * subvectors — index-metadata economics (the m·k·dsub doubles ARE
    * the index; PQ literature trains on samples of this order). The
    * distributed work is encoding and search, never training.
    *
    * Returns codebooks(m)(k)(dsub). Empty clusters keep their
    * previous centroid; a degenerate sample yields duplicate
    * centroids, which argmin encoding resolves to the first —
    * harmless (same reconstruction). */
  def pqCodebooks(e: DataFrame, m: Int, k: Int, dim: Int,
      sampleSize: Int = 4096, iters: Int = 5): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val sample: Array[Array[Double]] = e
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(sampleSize)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "pqCodebooks on an empty relation")
    def distSq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    Array.tabulate(m) { mi =>
      val subs = sample.map(_.slice(mi * dsub, (mi + 1) * dsub))
      // farthest-point seeds: maximize min distance to chosen seeds,
      // ties to the earliest sample position (deterministic)
      val seeds = scala.collection.mutable.ArrayBuffer(subs(0))
      val minD = subs.map(distSq(_, subs(0)))
      while (seeds.size < k) {
        var best = 0; var bestV = -1.0
        var i = 0
        while (i < subs.length) {
          if (minD(i) > bestV) { bestV = minD(i); best = i }
          i += 1
        }
        val s = subs(best)
        seeds += s
        i = 0
        while (i < subs.length) {
          val d = distSq(subs(i), s)
          if (d < minD(i)) minD(i) = d
          i += 1
        }
      }
      var cents = seeds.toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k, dsub)(0.0)
        val counts = new Array[Long](k)
        subs.foreach { x =>
          var bi = 0; var bd = Double.MaxValue; var ci = 0
          while (ci < k) {
            val d = distSq(x, cents(ci))
            if (d < bd) { bd = d; bi = ci }
            ci += 1
          }
          counts(bi) += 1
          var j = 0
          while (j < dsub) { sums(bi)(j) += x(j); j += 1 }
        }
        cents = Array.tabulate(k)(ci =>
          if (counts(ci) == 0) cents(ci)
          else sums(ci).map(_ / counts(ci)))
        it += 1
      }
      cents
    }
  }

  /** Encode `(vec_id, v)` to `(vec_id, codes, vnorm)`: codes(i) is the
    * argmin-distance centroid of subspace i (the `-2·dot + ‖c‖²`
    * expansion drops the row-constant ‖x‖² term, so argmin distance =
    * argmax of `dot(x,c) − ‖c‖²/2`) — ONE codegen'd
    * [[graft.functions.PqCodes]] kernel per row, not m·k unrolled dot
    * expressions (which blow past the JIT compilation threshold at
    * production codebook sizes — the [[graft.functions.SrpBuckets]]
    * lesson). vnorm rides along because asymmetric-distance search
    * approximates the DOT product; turning it into a cosine needs the
    * true norm (one double next to the m-byte code — still ~32x
    * smaller than the raw vector).
    *
    * Ragged codebooks (subspaces with fewer distinct centroids) pad
    * to the widest subspace with copies of that subspace's FIRST
    * centroid: a padded copy ties with index 0 and strict `>` keeps
    * the first, so codes are provably unchanged by padding. */
  def pqEncode(e: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame =
    e.select(col("vec_id"), pqCodesColumn(codebooks, col("v")).as("codes"),
      sqrt(normSq(col("v"))).as("vnorm"))

  /** The fused [[graft.functions.PqCodes]] encoder as a column over an
    * arbitrary input vector — shared by [[pqEncode]] (raw vectors) and
    * [[ivfPqTopK]] (cell residuals). */
  private def pqCodesColumn(codebooks: Array[Array[Array[Double]]],
      in: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val dsub = codebooks(0)(0).length
    val m = codebooks.length
    val kMax = codebooks.map(_.length).max
    val flat = Array.tabulate(m * kMax) { idx =>
      val cb = codebooks(idx / kMax)
      cb(if (idx % kMax < cb.length) idx % kMax else 0)
    }
    val halfNorms = flat.map(c => c.map(x => x * x).sum / 2.0)
    ColumnBridge.column(graft.functions.PqCodes(
      ColumnBridge.expression(in), flat, halfNorms, m, kMax, dsub))
  }

  /** The composed slice + per-centroid [[graft.functions.DotProduct]]
    * formulation of [[pqEncode]] — the readability and parity witness
    * the fused kernel is spec-pinned against. Generates m·k unrolled
    * dot expressions (JIT-hostile at production codebook sizes);
    * never the product path. */
  def pqEncodeComposed(e: DataFrame,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val dsub = codebooks(0)(0).length
    val codeCols = codebooks.zipWithIndex.map { case (cb, mi) =>
      val sub = slice(col("v"), mi * dsub + 1, dsub)
      val scores = array(cb.map(c =>
        dot(sub, typedlit(c.toSeq)) -
          lit(c.map(x => x * x).sum / 2.0)): _*)
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    e.select(col("vec_id"), array(codeCols: _*).as("codes"),
      sqrt(normSq(col("v"))).as("vnorm"))
  }

  /** PQ approximate top-k with asymmetric distance computation and
    * exact re-ranking — the compressed-domain member of the ANN
    * family (brute force = exact scan, IVF = prune by cell, LSH =
    * prune by bucket, PQ = scan EVERYTHING but 32x smaller):
    *
    *  1. the corpus encodes once to (vec_id, m codes, norm) — at 100 TB
    *     the 256-byte float vectors become ~m bytes, so the ADC scan
    *     reads ~1/32 the bytes of a brute-force scan and the whole
    *     index may fit in memory a raw corpus never could;
    *  2. each query precomputes its m×k lookup table of subspace dot
    *     products ONCE (`lut`); per corpus row the approximate dot is
    *     m table lookups — `zip_with(lut, codes)` + `aggregate`, all
    *     codegen'd, no per-row dot products;
    *  3. the top `refine·k` by approximate cosine per query are
    *     re-ranked by EXACT cosine (one broadcast-candidate join back
    *     to the raw vectors — |queries|·refine·k rows), which repairs
    *     most quantization error: output schema and the reported
    *     `cos` match [[bruteForceTopK]] exactly, only the candidate
    *     CHOICE is approximate (recall spec-pinned).
    *
    * Codebooks come from [[pqCodebooks]] unless injected (the
    * production build-once-reuse shape, as [[ivfTopK]]). */
  def pqTopK(embs: DataFrame, queryPred: Column, k: Int,
      m: Int = 8, kCodes: Int = 16, refine: Int = 4, dim: Int = 64,
      codebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    require(refine >= 1)
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val cbs = codebooks.getOrElse(pqCodebooks(e, m, kCodes, dim))
    pqProbeFrom(pqEncode(e, cbs), e, e.filter(queryPred)
      .toDF("query_id", "qv"), cbs, k, refine)
  }

  /** The ADC search + exact-rerank tail of [[pqTopK]], from explicit
    * codes / raw-vector / query relations — what a STORED PQ index
    * serves through ([[graft.sources.AnnIndexStore.probePq]]): the
    * compressed-domain scan reads the persisted m-byte codes (the
    * relation PQ exists to store — ~32x smaller than the corpus) and
    * only the refine·k candidates per query touch the raw vectors. */
  /** Per-query ADC lookup table over `qv`:
    * lut(mi)(ci) = dot(q_mi, codebook(mi)(ci)) — shared by the PQ and
    * IVF-PQ probes (one expression, two consumers, kept in sync by
    * construction). */
  private def pqLutColumn(cbs: Array[Array[Array[Double]]]): Column = {
    val dsub = cbs(0)(0).length
    array(cbs.zipWithIndex.map { case (cb, mi) =>
      val sub = slice(col("qv"), mi * dsub + 1, dsub)
      array(cb.map(c => dot(sub, typedlit(c.toSeq))): _*)
    }: _*)
  }

  private[graft] def pqProbeFrom(codes: DataFrame, vecs: DataFrame,
      queries: DataFrame, cbs: Array[Array[Array[Double]]], k: Int,
      refine: Int): DataFrame = {
    val lutCol = pqLutColumn(cbs)
    val q = queries
      .select(col("query_id"), col("qv"), lutCol.as("lut"),
        sqrt(normSq(col("qv"))).as("qnorm"))
    val adc = codes
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("approx",
        aggregate(zip_with(col("lut"), col("codes"),
            (l, c) => element_at(l, c + 1)),
          lit(0.0), (acc, x) => acc + x) / (col("qnorm") * col("vnorm")))
    val probeRank = Window.partitionBy("query_id")
      .orderBy(col("approx").desc, col("vec_id").asc)
    val cand = adc
      .withColumn("r", row_number().over(probeRank))
      .filter(col("r") <= refine * k)
      .select("query_id", "qv", "vec_id")
    // cand is refine·k rows per query — bounded small by the same
    // queries-broadcast-small contract the probe side already relies
    // on — so the rerank builds on the candidates and streams the
    // vecs side with NO distribution requirement. That is also the
    // union-partitioning fence for SEGMENTED stored vecs: a broadcast
    // join never consults the union's claimed partitioning, so the
    // columnar-concat hazard (see PERF.md) cannot misalign it.
    val rescored = broadcast(cand).join(vecs, Seq("vec_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    scoredTopK(rescored, k)
  }

  /** IVF-PQ approximate top-k — the production FAISS composition
    * (IVFADC, Jégou et al. TPAMI'11 §IV): the corpus partitions into
    * `nCells` Voronoi cells (the coarse quantizer, [[ivfAssign]]), and
    * each vector stores an m-byte PQ code of its RESIDUAL v − c(cell)
    * — residuals concentrate near the origin, so the same codebook
    * budget quantizes them far better than raw vectors. A query scans
    * ONLY its `nProbe` cells' codes: approx dot = q·c(cell) +
    * Σ_m lut[m][code_m] — the per-(query, cell) constant q·c hoisted
    * out of the per-row loop, the rest m table lookups per row
    * (`zip_with` + `aggregate`, codegen'd). The top `refine·k` by
    * approximate cosine rerank by exact cosine, [[pqTopK]]'s repair
    * step. Both models inject (`centroids` + `codebooks` ARE the
    * trained index — the build-once shape of [[ivfTopK]]/[[pqTopK]]);
    * defaults train per call, acceptable only for one-shot queries.
    *
    * Scale shape: the index relation is (vec_id, cell, codes, vnorm)
    * — cell-partitionable AND ~32x smaller than the corpus, the
    * combination that serves web-scale ANN from storage
    * ([[graft.sources.AnnIndexStore.writeIvfPqIndex]]); per query
    * batch the scan reads nProbe/nCells of the code relation and the
    * raw vectors surface only for refine·k candidates. */
  def ivfPqTopK(embs: DataFrame, queryPred: Column, k: Int,
      nCells: Int = 16, nProbe: Int = 4, m: Int = 8, kCodes: Int = 16,
      refine: Int = 4, dim: Int = 64, kmeansIters: Int = 2,
      centroids: Option[Array[Array[Double]]] = None,
      codebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    require(nProbe <= nCells && refine >= 1)
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val cents = centroids.getOrElse(ivfCentroids(e, nCells, kmeansIters))
    val cbs = codebooks.getOrElse(
      ivfPqCodebooks(e, cents, m, kCodes, dim))
    ivfPqProbeFrom(ivfPqIndexRows(e, cents, cbs), e,
      e.filter(queryPred).toDF("query_id", "qv"), cents, cbs, k,
      nProbe, refine)
  }

  /** Train IVF-PQ residual codebooks — [[pqCodebooks]] over the
    * RESIDUALS v − c(cell), never the raw vectors: the model must
    * quantize what it will encode (residuals concentrate near the
    * origin; a raw-scale codebook systematically degrades ADC
    * quality). The trained-model half callers persist and inject. */
  def ivfPqCodebooks(e: DataFrame, cents: Array[Array[Double]],
      m: Int, kCodes: Int, dim: Int): Array[Array[Array[Double]]] =
    pqCodebooks(residuals(ivfAssign(e, cents), cents)
      .select(col("vec_id"), col("rv").as("v")), m, kCodes, dim)

  /** v − c(cell) per assigned row, via one flat literal of the
    * centroid matrix (codegen-friendly: no per-cell branch). */
  private def residuals(assign: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    val dim = cents(0).length
    val flat = typedlit(cents.flatten.toSeq)
    assign.withColumn("rv",
      zip_with(col("v"), sequence(lit(0), lit(dim - 1)),
        (x, i) => x - element_at(flat, col("cell") * dim + i + 1)))
  }

  /** The IVF-PQ index relation: (vec_id, cell, codes, vnorm) — the
    * residual-encoded, cell-addressed, norm-carrying form a
    * deployment persists partitioned by cell. */
  private[graft] def ivfPqIndexRows(e: DataFrame,
      cents: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]]): DataFrame =
    residuals(ivfAssign(e, cents), cents)
      .select(col("vec_id"), col("cell"),
        pqCodesColumn(cbs, col("rv")).as("codes"),
        sqrt(normSq(col("v"))).as("vnorm"))

  /** The probe half of [[ivfPqTopK]], from explicit index / raw-vector
    * relations (fresh or reopened from storage). */
  private[graft] def ivfPqProbeFrom(idx: DataFrame, vecs: DataFrame,
      queries: DataFrame, cents: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]], k: Int, nProbe: Int,
      refine: Int): DataFrame = {
    // residual-codebook LUT + the q·c(cell) constant, per probed cell
    val lutCol = pqLutColumn(cbs)
    val qcCol = element_at(
      array(cents.map(c => dot(col("qv"), typedlit(c.toSeq))): _*),
      col("cell") + 1)
    val qc = ivfProbes(queries, cents, nProbe)
      .select(col("query_id"), col("qv"), col("cell"),
        lutCol.as("lut"), qcCol.as("qc"),
        sqrt(normSq(col("qv"))).as("qnorm"))
    val adc = idx.join(broadcast(qc), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx",
        (col("qc") + aggregate(zip_with(col("lut"), col("codes"),
            (l, c) => element_at(l, c + 1)),
          lit(0.0), (acc, x) => acc + x))
          / (col("qnorm") * col("vnorm")))
    val probeRank = Window.partitionBy("query_id")
      .orderBy(col("approx").desc, col("vec_id").asc)
    val cand = adc
      .withColumn("r", row_number().over(probeRank))
      .filter(col("r") <= refine * k)
      .select("query_id", "qv", "vec_id")
    // cand is refine·k rows per query — bounded small by the same
    // queries-broadcast-small contract the probe side already relies
    // on — so the rerank builds on the candidates and streams the
    // vecs side with NO distribution requirement. That is also the
    // union-partitioning fence for SEGMENTED stored vecs: a broadcast
    // join never consults the union's claimed partitioning, so the
    // columnar-concat hazard (see PERF.md) cannot misalign it.
    val rescored = broadcast(cand).join(vecs, Seq("vec_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    scoredTopK(rescored, k)
  }

  /** SRP-LSH approximate top-k: bucket the corpus into `nTables`
    * independent signed-random-projection tables (OR-amplification),
    * multi-probe each table's buckets within `probeHamming` bit flips,
    * union the candidates, and score only those. Same output schema as
    * [[bruteForceTopK]]; recall < 1 by construction (no oracle).
    *
    * Scale shape: the corpus index is |corpus| x nTables rows keyed by
    * (table, bucket) — built once, shuffle-partitioned on the key, so
    * the candidate join is a hash join on (table, bucket) against the
    * broadcast probe set. Candidate volume per query ~=
    * nTables x probes x |corpus| / 2^nPlanes, independent of |queries|.
    */
  def lshTopK(embs: DataFrame, queryPred: Column, k: Int,
      nPlanes: Int = 8, probeHamming: Int = 2, nTables: Int = 4,
      dim: Int = 64, seed: Long = 42L,
      planes: Option[Seq[Seq[Seq[Double]]]] = None): DataFrame = {
    // `planes` injects trained/known tables (the ivfTopK centroids
    // convention): axis-aligned unit planes fold dot(v, e_j) to v[j],
    // making the bucket code a closed-form sign pattern DuckDB can
    // replay — the fully-oracled serve regime (q_ann_lsh_injected)
    val tables = planes.getOrElse((0 until nTables)
      .map(t => hyperplanes(nPlanes, dim, seed + t)))
    // ragged injected tables would silently generate head-sized probe
    // masks for every other table (wrong buckets, no error) — reject
    require(tables.nonEmpty && tables.head.length <= 30 &&
      tables.forall(_.length == tables.head.length),
      "all LSH tables must share one plane count")
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    // corpus index: one (table, bucket) entry per table — all codes
    // from the single srpBucketsAll kernel call (the per-table
    // composition generates JIT-hostile method sizes as tables grow)
    val idx = e.select(col("vec_id"), col("v"),
        posexplode(srpBucketsAll(col("v"), tables)))
      .toDF("vec_id", "v", "t", "bucket")
    // all bit-flip masks with popcount <= probeHamming, precomputed;
    // each table's bucket is computed once and the masks applied via a
    // transform over a literal array (one bucket expression per table,
    // not per probe — keeps generated code small).
    val masks = (0 until (1 << tables.head.length))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val q = e.filter(queryPred).toDF("query_id", "qv")
      .select(col("query_id"), col("qv"),
        posexplode(srpBucketsAll(col("qv"), tables)))
      .toDF("query_id", "qv", "t", "qbucket")
      .select(col("query_id"), col("qv"), col("t"),
        explode(transform(typedlit(masks),
          m => col("qbucket").bitwiseXOR(m))).as("bucket"))
    val cand = idx.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "qv", "vec_id", "v")
      .dropDuplicates("query_id", "vec_id") // union across tables/probes
      .withColumn("cos", cosine(col("qv"), col("v")))
    scoredTopK(cand, k)
  }

  /** Int8 embedding quantization — symmetric per-vector max-abs
    * scaling, the standard 4x storage/bandwidth compression before an
    * ANN index (float32 → one byte per dimension + one scale).
    * code_i = floor(v_i · 127 / scale + 0.5): round-half-toward-+∞ via
    * floor BECAUSE floor is exact in IEEE-754 on every engine, while
    * `round()` half-cases are implementation-defined across engines —
    * with all arithmetic forced to double, the oracle reproduces every
    * code bit-for-bit. A zero vector (scale 0) quantizes to zeros
    * instead of NaN-poisoned codes. Pure map over the scan: zero
    * shuffles at any scale; reconstruction is code_i · scale / 127
    * with per-dimension error ≤ scale/254 (spec-pinned, along with
    * top-k recall of a reconstructed brute-force search). */
  def int8Quantize(embs: DataFrame): DataFrame = {
    val vd = transform(col("embedding"), x => abs(x.cast("double")))
    embs
      .select(col("vec_id"), col("embedding"),
        array_max(vd).as("scale"))
      .select(col("vec_id"), col("scale"),
        when(col("scale") === 0d,
          transform(col("embedding"), _ => lit(0)))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") * lit(127) / col("scale") +
              lit(0.5)).cast("int")))
          .as("codes"))
      .orderBy("vec_id")
  }

  /** The int8 codes reconstructed to float vectors — what an ANN
    * search actually scores against after quantized storage. */
  def int8Reconstruct(embs: DataFrame): DataFrame =
    int8Quantize(embs)
      .select(col("vec_id"),
        transform(col("codes"),
          c => (c.cast("double") * col("scale") / lit(127))
            .cast("float")).as("embedding"))
}
