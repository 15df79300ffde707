package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the operator
  * that turns near-dup candidate PAIRS (from [[Dedup]]) into duplicate
  * CLUSTERS, the unit survivor selection actually needs: cluster id =
  * the minimum doc_id reachable through any chain of near-dup pairs
  * (a ~ b ~ c groups {a,b,c} even when a ≁ c directly).
  *
  * Implementation: iterative min-label propagation, fully declarative —
  * each round is `labels ∪ (edges ⋈ labels) → groupBy(min)`, i.e. one
  * hash-join shuffle plus one aggregation shuffle, both map-side
  * partial-aggregated. Labels only ever decrease, so the fixpoint check
  * (`new < old` anywhere) is exact; `localCheckpoint` after each round
  * truncates the growing lineage, which would otherwise re-execute the
  * whole upstream dedup per iteration.
  *
  * Scale posture (100 TB): rounds = graph diameter. Near-dup graphs are
  * dense blobs of mutually-similar documents — diameter is small
  * (2–4), so 3–5 rounds on an edge list that is orders of magnitude
  * smaller than the corpus. For adversarial long-chain graphs the
  * O(log n)-round alternating large-star/small-star scheme (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) drops
  * in behind the same signature; pair graphs from LSH dedup do not
  * need it.
  */
object Clustering {

  /** Components of `nodes` (single `id` column) under `edges`
    * (`a`, `b` columns, undirected). Nodes absent from every edge are
    * singleton clusters of themselves. Returns (id, cluster) with
    * cluster = min reachable id. */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val e = edges.toDF("a", "b")
    // Symmetrize once and pin: every iteration re-reads this relation,
    // not the (expensive) lineage that produced the pairs.
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    var labels = nodes.toDF("id").distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val viaNeighbor = sym
        .join(labels.select(col("id").as("b"), col("lbl")), "b")
        .select(col("a").as("id"), col("lbl"))
      val next = labels.union(viaNeighbor)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      converged = next
        .join(labels.select(col("id"), col("lbl").as("prev")), "id")
        .filter(col("lbl") < col("prev"))
        .isEmpty
      labels = next
      round += 1
    }
    labels
  }

  /** Near-dup clustering of the documents table: n-gram-Jaccard pairs
    * at `threshold` → connected components → (doc_id, cluster); docs
    * with no near-dup are their own cluster. Downstream dedup keeps
    * `doc_id == cluster` (the minimum of each component). */
  def nearDupClusters(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val pairs = Dedup.ngramJaccard(docs, n, threshold)
      .select(col("doc_a"), col("doc_b"))
    connectedComponents(pairs, docs.select(col("doc_id")))
      .select(col("id").as("doc_id"), col("lbl").as("cluster"))
      .orderBy("doc_id")
  }
}
