package graft.operators

import graft.functions.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline (north star;
  * beyond the reference's surface).
  *
  * Scale posture (100 TB):
  *   - exact dedup: one hash shuffle on the 16-byte fingerprint; partial
  *     aggregation kicks in map-side, so duplicate-heavy corpora shrink
  *     before the exchange.
  *   - n-gram Jaccard: inverted-index self-join on shingles. `maxDocFreq`
  *     caps posting-list length (drops shingles shared by more than that
  *     many docs) — the standard skew guard: a stop-shingle appearing in
  *     1M docs would otherwise explode into 10^12 join rows.
  *   - MinHash+LSH: per-doc signatures are a map-only pass (array
  *     expressions, no shuffle); candidate generation shuffles on
  *     (band, bucket); verification joins candidates back to shingle
  *     arrays and computes exact Jaccard — O(candidates), not O(n²).
  *   - SimHash: one shuffle (groupBy doc) with 64 partial-agg sums;
  *     pair generation blocks on 16-bit simhash bands (pigeonhole: any
  *     pair within Hamming distance 3 shares one of the 4 bands).
  */
object Dedup {

  /** Exact dedup by content fingerprint: one row per distinct text,
    * keeping the smallest doc_id (deterministic survivor). */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(fingerprintMd5(col("text")).as("fp_md5"))
      .agg(min("doc_id").as("keep_doc_id"), count("*").as("n_copies"))
      .orderBy("fp_md5")

  /** (doc_id, shingle) inverted-index rows: distinct word n-grams. */
  def shingleIndex(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(shingles(col("text"), n))).as("shingle"))

  /** Exact n-gram Jaccard near-dup pairs >= threshold, via an
    * inverted-index join. `maxDocFreq` (0 = off) drops shingles whose
    * document frequency exceeds it, bounding join fan-out at scale. */
  def ngramJaccard(docs: DataFrame, n: Int, threshold: Double,
      maxDocFreq: Long = 0L): DataFrame = {
    val idx0 = shingleIndex(docs, n)
    val idx =
      if (maxDocFreq <= 0) idx0
      else {
        val rare = idx0.groupBy("shingle")
          .agg(count("*").as("df")).filter(col("df") <= maxDocFreq)
          .select("shingle")
        // using-join puts the key column first; restore (doc_id, shingle)
        // order since downstream renames are positional.
        idx0.join(rare, "shingle").select("doc_id", "shingle")
      }
    val sizes = idx.groupBy("doc_id").agg(count("*").as("n_sh"))
    val a = idx.toDF("doc_a", "shingle")
    val b = idx.toDF("doc_b", "shingle")
    val common = a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count("*").as("common"))
    common
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signature column: for hash i, min over shingles of
    * xxhash64(shingle, i). Pure array expressions — map-only, no
    * shuffle, whole-stage codegen. */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleArr, s => xxhash64(s, i))))

  /** MinHash + LSH banding + exact-Jaccard verification.
    * Output schema/semantics identical to [[ngramJaccard]]: because
    * candidates are verified with exact Jaccard, the result differs from
    * the exact join only by LSH misses (prob ~(1-s^r)^b; ~1e-22 for
    * s=0.99, r=4, b=16) — so it shares the same oracle. */
  def minhashLsh(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    val withShingles = docs.select(col("doc_id"),
      array_distinct(shingles(col("text"), n)).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = withShingles.select(col("doc_id"), col("sh"),
      minhashSignature(col("sh"), numHashes).as("sig"))
    // (doc_id, band, bucket): bucket = hash of the band's r-slice.
    val bucketsKeyed = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        j => xxhash64(slice(col("sig"), j * r + 1, lit(r)), j))))
      .toDF("doc_id", "band", "bucket")
    val cand = bucketsKeyed.toDF("doc_a", "band", "bucket")
      .join(bucketsKeyed.toDF("doc_b", "band", "bucket"),
        Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // verify candidates with exact Jaccard on the shingle sets
    val shA = withShingles.toDF("doc_a", "sh_a")
    val shB = withShingles.toDF("doc_b", "sh_b")
    cand.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash per document: bit i is set iff the token-frequency-
    * weighted sum of (+1/-1 for bit i of xxhash64(token)) is positive.
    * One shuffle (groupBy doc_id) with 64 partial-aggregated sums. */
  def simhash(docs: DataFrame): DataFrame = {
    val tokHash = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$i"))
    tokHash.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` (<= 3 guaranteed found:
    * 4 disjoint 16-bit bands, pigeonhole). Output: doc_a, doc_b,
    * hamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val banded = sh.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(j =>
          shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xffffL))): _*)))
      .toDF("doc_id", "simhash", "band", "key")
    val cand = banded.toDF("doc_a", "sh_a", "band", "key")
      .join(banded.toDF("doc_b", "sh_b", "band", "key"), Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
    cand
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs >= threshold. Exact all-pairs —
    * correct at verification scale; the LSH-bucketed path in
    * [[Similarity]] is the 100 TB candidate generator. Cosine is
    * computed in double with a fixed left-to-right summation order so
    * the DuckDB oracle reproduces it bit-for-bit. */
  def embeddingNearDup(embs: DataFrame, threshold: Double): DataFrame = {
    val e = embs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val a = e.toDF("vec_a", "va")
    val b = e.toDF("vec_b", "vb")
    val dot = aggregate(zip_with(col("va"), col("vb"), _ * _),
      lit(0.0), _ + _)
    val na = aggregate(transform(col("va"), x => x * x), lit(0.0), _ + _)
    val nb = aggregate(transform(col("vb"), x => x * x), lit(0.0), _ + _)
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", dot / (sqrt(na) * sqrt(nb)))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }
}
