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

  private def scoredTopK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        round(col("cos"), 4).as("cos"), col("rank"))
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

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned
    * into `nCells` Voronoi cells around centroid vectors; queries score
    * only the vectors in their `nProbe` closest cells.
    *
    * Centroids here are the first `nCells` corpus vectors (normalized,
    * collected to the driver like the SRP hyperplanes — nCells rows,
    * not data); a production index swaps in sampled k-means|| centroids
    * without touching the query path. Cell assignment is an argmax over
    * `nCells` codegen'd dot products per row, entirely map-side; the
    * candidate join is a hash join on the cell id. Candidate volume per
    * query ~= nProbe/nCells of the corpus — the classic recall/cost
    * dial. Output schema matches [[bruteForceTopK]]; recall < 1 by
    * construction (spec-pinned vs brute force).
    */
  def ivfTopK(embs: DataFrame, queryPred: Column, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    require(nProbe <= nCells)
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    // centroids: deterministic, tiny driver collect (like hyperplanes)
    val cents: Array[Array[Double]] = e.orderBy("vec_id").limit(nCells)
      .collect().map(_.getSeq[Double](1).toArray)
      .map { c =>
        val norm = math.sqrt(c.map(x => x * x).sum)
        c.map(_ / norm)
      }
    def cellScores(v: Column): Column =
      array(cents.map(c => dot(v, typedlit(c.toSeq))): _*)
    // |v| is constant across cells, so argmax of dot-with-unit-centroid
    // IS the nearest cell by cosine
    val idx = e
      .withColumn("cs", cellScores(col("v")))
      .withColumn("cell",
        (array_position(col("cs"), array_max(col("cs"))) - 1).cast("int"))
      .select("vec_id", "v", "cell")
    val probeRank = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cell").asc)
    val probes = e.filter(queryPred).toDF("query_id", "qv")
      .select(col("query_id"), col("qv"),
        posexplode(cellScores(col("qv")))).toDF("query_id", "qv", "cell", "score")
      .withColumn("r", row_number().over(probeRank))
      .filter(col("r") <= nProbe)
      .select("query_id", "qv", "cell")
    val cand = idx.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
    scoredTopK(cand, k)
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
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    require(nPlanes <= 30)
    val tables = (0 until nTables)
      .map(t => t -> hyperplanes(nPlanes, dim, seed + t))
    val e = embs.select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    // corpus index: one (table, bucket) entry per table
    val idx = e.withColumn("tb", explode(array(tables.map { case (t, p) =>
        struct(lit(t).as("t"), srpBucket(col("v"), p).as("bucket"))
      }: _*)))
      .select(col("vec_id"), col("v"), col("tb.t"), col("tb.bucket"))
    // all bit-flip masks with popcount <= probeHamming, precomputed;
    // each table's bucket is computed once and the masks applied via a
    // transform over a literal array (one bucket expression per table,
    // not per probe — keeps generated code small).
    val masks = (0 until (1 << nPlanes))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val q = e.filter(queryPred).toDF("query_id", "qv")
      .withColumn("tq", explode(array(tables.map { case (t, p) =>
        struct(lit(t).as("t"), srpBucket(col("qv"), p).as("qbucket"))
      }: _*)))
      .select(col("query_id"), col("qv"), col("tq.t"),
        explode(transform(typedlit(masks),
          m => col("tq.qbucket").bitwiseXOR(m))).as("bucket"))
    val cand = idx.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "qv", "vec_id", "v")
      .dropDuplicates("query_id", "vec_id") // union across tables/probes
      .withColumn("cos", cosine(col("qv"), col("v")))
    scoredTopK(cand, k)
  }
}
