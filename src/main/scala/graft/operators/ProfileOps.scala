package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-profiling operators — the ANALYZE/data-quality pass a 100 TB
  * ingest runs before anything else touches the corpus: per-column
  * null/distinct/min-max statistics, hot-key skew diagnostics, and
  * value-distribution histograms. Beyond the reference's surface (the
  * whole reference engine is `/root/reference/src/main.cpp:1-281`; it
  * has no catalog, no statistics, and no notion of a column).
  *
  * Everything is engine-neutral: counts and bin ids are integer
  * arithmetic, shares are integer basis points (cross-multiplied, no
  * float ratios), min/max are aggregated in the column's native type
  * and cast to string only afterwards (a pre-cast min would compare
  * lexicographically — "100" < "99").
  */
object ProfileOps {

  /** Per-column profile: one row per profiled column with the row
    * count, null count, exact distinct count, and min/max rendered as
    * strings (aggregated natively, cast after — see object doc).
    *
    * ONE aggregation pass over the scan: Spark plans the N exact
    * `count(distinct)`s as a single Expand-based aggregate — one scan,
    * but the Expand replicates each row N times into the shuffle. That
    * is the exact-profile cost; for wide tables at 100 TB pass
    * `approxDistinct = true` and the distinct counts come from
    * HyperLogLog partial aggregates instead — no Expand, one
    * map-side-combined shuffle of sketch bytes, estimates within ~5%
    * (and the result leaves the cross-engine-exact regime, so the
    * harness oracles the exact path and the spec pins approx ≈ exact).
    *
    * String-cast caveat: integer and string columns render identically
    * across engines; float columns hit engine-specific scientific-
    * notation thresholds — profile those with `histogramInt` over a
    * scaled integer instead, or accept rows-only checking.
    */
  def profileTable(df: DataFrame, columns: Seq[String] = Nil,
      approxDistinct: Boolean = false): DataFrame = {
    val cs = if (columns.nonEmpty) columns else df.columns.toSeq
    cs.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"profileTable: column name '$c' is not a plain identifier"))
    val aggs = cs.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    // unpivot the single wide row to one row per column
    val stackArgs = cs
      .map(c => s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c")
      .mkString(", ")
    one
      .selectExpr("__n_rows", s"stack(${cs.length}, $stackArgs) AS " +
        "(col_name, __nn, n_distinct, min_val, max_val)")
      .select(
        col("col_name"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col("__nn")).as("n_nulls"),
        col("n_distinct"),
        col("min_val"),
        col("max_val"))
      .orderBy("col_name")
  }

  /** Pairwise Pearson correlation matrix over fixed-point numeric
    * columns — the profiling signal behind feature selection and
    * redundant-column detection. ENGINE-EXACT to the last step: each
    * value is scaled to an integer at `scale` decimal places with
    * floor(x·10^s + 0.5) (floor is IEEE-exact where round() half
    * cases are engine-defined — the int8Quantize rule), every moment
    * (n, Σx, Σx², Σxy) is an exact DECIMAL(38,0) integer sum (order-
    * independent, layout-invariant), and the one float each output
    * row carries is the final
    *   (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²))
    * computed from identical integers on both engines, rounded at
    * 4 dp (+0.0 normalizes −0.0). A zero-variance column correlates
    * as 0 by convention (the rateAnomaly σ=0 rule) instead of
    * dividing by zero.
    *
    * Scale shape: ONE scan computes every moment in a single
    * map-side-combined aggregation (|cols|² aggregates over a 1-row
    * result); the pair rows are a projection of that single row —
    * no shuffle beyond the one partial-agg exchange, at any corpus
    * size. Never use the engine's `corr` aggregate here: its
    * streaming co-moment accumulation is float and order-dependent,
    * so two engines (or two layouts) disagree in the last ulps. */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
      scale: Int = 2): DataFrame = {
    require(cols.size >= 2 && scale >= 0 && scale <= 6)
    cols.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"correlationMatrix: column name '$c' is not a plain identifier"))
    val f = math.pow(10, scale).toLong
    val scaled = df.select(cols.map(c =>
      expr(s"CAST(floor($c * $f + 0.5) AS DECIMAL(38,0))")
        .as(s"s_$c")): _*)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs: Seq[Column] =
      (count(lit(1)).cast("decimal(38,0)").as("n") +:
        cols.map(c => sum(col(s"s_$c")).as(s"sx_$c"))) ++
        cols.map(c => sum(col(s"s_$c") * col(s"s_$c")).as(s"sxx_$c")) ++
        pairs.map { case (a, b) =>
          sum(col(s"s_$a") * col(s"s_$b")).as(s"sxy_${a}_$b") }
    val one = scaled.agg(aggs.head, aggs.tail: _*)
    def varTerm(c: String): Column =
      (col(s"sxx_$c") * col("n") - col(s"sx_$c") * col(s"sx_$c"))
        .cast("double")
    val rows = pairs.map { case (a, b) =>
      val num = (col(s"sxy_${a}_$b") * col("n") -
        col(s"sx_$a") * col(s"sx_$b")).cast("double")
      val den = sqrt(varTerm(a)) * sqrt(varTerm(b))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(den === 0d, 0d).otherwise(num / den).as("r"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        (round(col("p.r"), 4) + lit(0.0)).as("corr"))
      .orderBy("col_a", "col_b")
  }

  /** Per-DIMENSION profile of an embedding column — the health check
    * an embedding table needs that row-level profiling cannot see:
    * dead dimensions (a truncated or masked model head), mean drift
    * (a normalization bug between model versions), and range
    * explosions (a missing L2 normalize). One row per dimension with
    * exact integer moments in E6 fixed point: count, sum, min, max,
    * sum of squares (E12), truncated mean, and a dead flag
    * (range < `deadRangeE6`).
    *
    * Exactness: each value is quantized floor(v·10⁶) AFTER the exact
    * float32→float64 cast — both engine-identical IEEE ops — so every
    * aggregate is an integer sum in any order. Headroom: q² ≤ 10¹²
    * for unit-scale embeddings, so sumsq is exact up to ~9·10⁶ rows
    * per dimension in a long; beyond that (a 100 TB embedding table),
    * quantize E3 (headroom ~9·10¹² rows) or route the one sumsq
    * through DECIMAL(38,0) — the decayedCounts precedent.
    *
    * Scale shape: one scan, posexplode fans out (dim, q)-width rows
    * map-side, one map-side-combined aggregation by dimension — the
    * vector column itself never crosses an exchange. */
  def embeddingProfile(embs: DataFrame,
      deadRangeE6: Long = 1000L): DataFrame =
    embs
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        floor(col("v").cast("double") * lit(1000000.0)).cast("long")
          .as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum("q").as("sum_e6"),
        min("q").as("min_e6"),
        max("q").as("max_e6"),
        sum(col("q") * col("q")).as("sumsq_e12"))
      .withColumn("mean_e6", expr("sum_e6 DIV n"))
      .withColumn("is_dead",
        col("max_e6") - col("min_e6") < deadRangeE6)
      .orderBy("dim")

  /** Hot-key skew diagnostic: the `k` heaviest values of `key` with
    * their row counts, share in integer basis points (cnt·10000 DIV
    * total — exact cross-engine, no float ratio), and rank. A null key
    * is a value here — the null bucket is routinely the worst skew
    * offender, so hiding it would defeat the diagnostic; the rank
    * tie-break is (cnt DESC, key ASC NULLS FIRST), explicit because
    * the engines' default null ordering differs.
    *
    * Shape at scale: the raw stream partial-aggregates to |keys| rows
    * map-side; the top-k is a distributed `orderBy().limit(k)`
    * (TakeOrderedAndProject — per-partition heaps, never a global
    * sort), and the rank window runs over the k surviving rows only.
    * This is the operator you run BEFORE choosing a partition key —
    * its output is exactly the salting decision input ([[Salting]]). */
  def keySkew(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    require(k > 0)
    // the |keys|-row count relation feeds BOTH the share total and the
    // top-k; checkpointing it keeps the raw table to ONE scan (without
    // it Catalyst re-runs the count lineage under each branch —
    // plan-pinned in PlanSpec)
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = counts.agg(sum("cnt").as("__total"))
    val ord = Seq(col("cnt").desc, col(key).asc_nulls_first)
    val top = counts
      .crossJoin(broadcast(total))
      .withColumn("share_bp", expr("cnt * 10000 DIV __total"))
      .orderBy(ord: _*)
      .limit(k)
    top
      // bounded window: ≤ k rows post-limit (source of a harmless
      // WindowExec single-partition warning)
      .withColumn("rank",
        row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select(col("rank"), col(key), col("cnt"), col("share_bp"))
      .orderBy("rank")
  }

  /** Heaps-law vocabulary growth curve: cumulative distinct token
    * count at every `step`-document checkpoint, documents taken in
    * engine-neutral 60-bit-md5 hash order (deterministic and
    * layout-independent — "arrival order" on a distributed ingest is
    * not a thing). The curve is a tokenizer/corpus-health audit: a
    * healthy natural-language corpus grows sub-linearly (Heaps' law);
    * a curve that stays linear means unbounded novel-token production
    * (OCR noise, serial numbers, broken tokenization), one that goes
    * flat almost immediately means templated or duplicated content.
    *
    * Shape: document ranks in hash order come from the [[PrefixSum]]
    * scaffold over a (doc_id, hash)-width relation — never a
    * single-partition window, and the wide text column stays OUT of
    * the range exchange. The token stream is deduplicated per
    * document in the map (`array_distinct` before the explode), joins
    * the narrow rank relation on doc_id, and a word's first
    * occurrence is then a plain min-aggregate; new-word counts bucket
    * by checkpoint and the one unpartitioned cumulative window runs
    * over the ≤ |docs|/step checkpoint rows (the acceptable place for
    * one). `n` picks the vocabulary unit: 1 = tokens, ≥ 2 = word
    * n-gram shingles (the single-pass [[graft.functions.WordShingles]]
    * kernel) — the n-gram curve keeps growing long after a small
    * token vocabulary saturates, which is what makes it the sharper
    * novelty probe. Returns (checkpoint, n_docs, new_words,
    * cum_words). */
  def vocabGrowth(docs: DataFrame, step: Long = 100L,
      n: Int = 1): DataFrame = {
    require(step > 0, s"vocabGrowth needs step > 0, got $step")
    require(n >= 1, s"vocabGrowth needs n >= 1, got $n")
    import graft.functions.TextAnalysis.{md5Hash60, shingles, wsTokens}
    val ids = docs.select(col("doc_id"),
      md5Hash60(col("doc_id").cast("string")).as("h"))
    val (ranked, _) = PrefixSum.exclusive(
      ids, Seq(col("h"), col("doc_id")), lit(1L))
    val ranks = ranked.select(col("doc_id"), (col("cum0") + 1L).as("rk"))
    val units = if (n == 1) wsTokens(col("text"))
                else shingles(col("text"), n)
    val docWords = docs.select(col("doc_id"),
      explode(array_distinct(units)).as("word"))
    val firsts = docWords.join(ranks, "doc_id")
      .groupBy("word").agg(min("rk").as("fr"))
    val total = docs.agg(count(lit(1)).as("__n"))
    firsts
      .select(expr(s"(fr + ${step - 1}) DIV $step").as("checkpoint"))
      .groupBy("checkpoint").agg(count(lit(1)).as("new_words"))
      .crossJoin(broadcast(total))
      .select(col("checkpoint"),
        least(col("checkpoint") * step, col("__n")).as("n_docs"),
        col("new_words"))
      // bounded window: ≤ ⌈n_docs/step⌉ checkpoint rows, post-
      // aggregation (harmless WindowExec single-partition warning)
      .withColumn("cum_words",
        sum("new_words").over(Window.orderBy("checkpoint")))
      .orderBy("checkpoint")
  }

  /** Equi-width integer histogram of `valueCol` over [`lo`, `hi`):
    * bin = (x − lo)·nBins DIV (hi − lo), clamped into [0, nBins−1] so
    * out-of-range values land in the edge bins (they stay visible —
    * a distribution profile that silently drops outliers hides the
    * data-quality signal it exists to surface). All-integer arithmetic
    * (exact cross-engine); bin bounds are emitted so the result is
    * self-describing. Empty bins are absent (no generator join); at
    * 100 TB this is one map-side-combined aggregation to ≤ nBins rows.
    */
  def histogramInt(df: DataFrame, valueCol: String, nBins: Int,
      lo: Long, hi: Long): DataFrame = {
    require(nBins > 0 && hi > lo,
      s"histogramInt needs nBins > 0 and hi > lo, got nBins=$nBins [$lo,$hi)")
    val span = hi - lo
    df
      .filter(col(valueCol).isNotNull)
      .select(expr(
        s"least(greatest(($valueCol - $lo) * $nBins DIV $span, 0L), " +
          s"${nBins - 1}L)").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .select(
        col("bin"),
        expr(s"$lo + bin * $span DIV $nBins").as("bin_lo"),
        expr(s"$lo + (bin + 1) * $span DIV $nBins").as("bin_hi"),
        col("n"))
      .orderBy("bin")
  }

  /** Schema/statistics drift between two snapshots — [[profileTable]]
    * run on each side and full-outer joined per column: row/null/
    * distinct counts side by side plus a `range_changed` flag
    * (null-safe min/max comparison). The companion to
    * [[distributionDrift]]: that one watches a chosen categorical's
    * SHAPE, this one watches every column's summary statistics — the
    * cheap always-on monitor that catches a refresh silently nulling
    * a column or exploding a cardinality. A column present in only
    * one snapshot (schema drift proper) survives the full-outer join
    * with nulls on the missing side. Cost: one profile aggregation
    * per side; the join runs on |columns| rows. */
  def profileDrift(before: DataFrame, after: DataFrame,
      columns: Seq[String] = Nil): DataFrame = {
    def side(df: DataFrame, suffix: String) =
      profileTable(df, columns).select(col("col_name"),
        col("n_rows").as(s"n_rows_$suffix"),
        col("n_nulls").as(s"n_nulls_$suffix"),
        col("n_distinct").as(s"n_distinct_$suffix"),
        col("min_val").as(s"__mn_$suffix"),
        col("max_val").as(s"__mx_$suffix"))
    side(before, "a").join(side(after, "b"), Seq("col_name"), "full_outer")
      .withColumn("range_changed",
        !(col("__mn_a") <=> col("__mn_b")) ||
          !(col("__mx_a") <=> col("__mx_b")))
      .select(col("col_name"), col("n_rows_a"), col("n_rows_b"),
        col("n_nulls_a"), col("n_nulls_b"),
        col("n_distinct_a"), col("n_distinct_b"), col("range_changed"))
      .orderBy("col_name")
  }

  /** Distribution drift between two corpus snapshots — the per-bucket
    * Population Stability Index terms, the standard monitor for "did
    * this week's crawl change shape" on a continuously-ingested
    * corpus. For each categorical bucket (the `keyCols` tuple):
    * psi = (p_a − p_b) · ln(p_a / p_b), with Laplace-smoothed shares
    * p = (cnt + 1) / (total + |buckets|) so buckets present in only
    * one snapshot contribute finite mass instead of ±∞. Each term is
    * ≥ 0; their sum is the corpus PSI (industry rule of thumb: < 0.1
    * stable, > 0.25 investigate). Counts are exact integers; the one
    * float per row is ROUNDED to 6 decimals (the cross-engine
    * ulp-stability rule, cf. [[TrainingOps.lmSurprisal]]).
    *
    * Scale shape: each snapshot collapses to a bucket-count relation
    * in one map-side-combined aggregation (the only data-scale pass);
    * everything after — the full-outer bucket join, the totals, the
    * PSI arithmetic — runs on |buckets| rows. The checkpoint keeps
    * the bucket relation to one computation under its two consumers
    * (totals + output), the [[keySkew]] lesson. */
  def distributionDrift(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "distributionDrift needs at least one key column")
    val ks = keyCols.map(col)
    val ca = before.groupBy(ks: _*).agg(count(lit(1)).as("cnt_a"))
    val cb = after.groupBy(ks: _*).agg(count(lit(1)).as("cnt_b"))
    val buckets = ca.join(cb, keyCols, "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .localCheckpoint()
    val tot = buckets.agg(sum("cnt_a").as("__ta"), sum("cnt_b").as("__tb"),
      count(lit(1)).as("__k"))
    val pa = (col("cnt_a") + lit(1)).cast("double") / (col("__ta") + col("__k"))
    val pb = (col("cnt_b") + lit(1)).cast("double") / (col("__tb") + col("__k"))
    buckets.crossJoin(broadcast(tot))
      .withColumn("psi", round((pa - pb) * log(pa / pb), 6))
      .select(ks ++ Seq(col("cnt_a"), col("cnt_b"), col("psi")): _*)
      .orderBy(ks: _*)
  }
}
