package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** TextRank / co-occurrence graph: hand-built graph parity against an
  * exact in-test PageRank, plus the structural invariants (symmetry,
  * self-loop and minCount handling, rank mass conservation, layout
  * determinism). */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // Directed bigrams: "a b"x2, "b a"x1, "b c"x1, "c b"x1 →
  // undirected edges a–b (w=3), b–c (w=2).
  private def tinyCorpus = Seq(
    (1L, "a b a b"),
    (2L, "b c b")).toDF("doc_id", "text")

  test("cooccurrenceEdges: symmetric, merged weights, no self-loops") {
    val e = GraphOps.cooccurrenceEdges(tinyCorpus, minCount = 1)
      .as[(String, String, Double)].collect().toSet
    assert(e == Set(
      ("a", "b", 3.0), ("b", "a", 3.0),
      ("b", "c", 2.0), ("c", "b", 2.0)))
  }

  test("cooccurrenceEdges: minCount filters DIRECTED counts pre-merge") {
    // "a b" appears twice, "b a" once: minCount=2 keeps only the
    // directed a→b count, so the undirected weight is 2, not 3.
    val e = GraphOps.cooccurrenceEdges(tinyCorpus, minCount = 2)
      .as[(String, String, Double)].collect().toSet
    assert(e == Set(("a", "b", 2.0), ("b", "a", 2.0)))
    // self-loops never survive: "x x x" yields only the x→x bigram
    val loops = GraphOps.cooccurrenceEdges(
      Seq((1L, "x x x")).toDF("doc_id", "text"), minCount = 1)
    assert(loops.isEmpty)
  }

  /** Exact reference PageRank on the tiny graph, same formula. */
  private def refRanks(iters: Int, d: Double): Map[String, Double] = {
    val edges = Map( // src -> (dst, w)
      "a" -> Seq(("b", 3.0)),
      "b" -> Seq(("a", 3.0), ("c", 2.0)),
      "c" -> Seq(("b", 2.0)))
    val wtot = edges.view.mapValues(_.map(_._2).sum).toMap
    val n = edges.size
    var r = edges.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.toSeq
        .flatMap { case (src, out) =>
          out.map { case (dst, w) => dst -> (w / wtot(src)) * r(src) }
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = r.keys.map(v => v -> ((1.0 - d) / n + d * contrib(v))).toMap
    }
    r
  }

  test("textRank matches an exact in-test PageRank on a hand graph") {
    val got = GraphOps.textRank(tinyCorpus, iters = 4, minCount = 1)
      .as[(String, Double)].collect().toMap
    val want = refRanks(4, 0.85)
    assert(got.keySet == want.keySet)
    for ((w, r) <- want)
      assert(math.abs(got(w) - r) < 1e-6, s"word=$w got=${got(w)} want=$r")
    // symmetric graph, no dangling nodes: rank mass is conserved at 1
    assert(math.abs(got.values.sum - 1.0) < 1e-5)
  }

  test("textRank is deterministic under physical layout") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val r1 = GraphOps.textRank(docs, minCount = 2).collect().toSeq
    val r2 = GraphOps.textRank(docs.repartition(13), minCount = 2)
      .collect().toSeq
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("textRank fails loudly on an empty graph") {
    val ex = intercept[IllegalArgumentException] {
      GraphOps.textRank(tinyCorpus, minCount = 100)
    }
    assert(ex.getMessage.contains("empty co-occurrence graph"))
  }
}
