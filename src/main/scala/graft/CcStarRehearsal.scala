package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the alternating-star clustering path
  * (`q_dedup_cc_star`'s operator, operators/Clustering.alternatingStar
  * — Kiveris et al., SoCC'14), the one clustering face without a
  * decade table until round 13. Two regimes:
  *
  *   - **near-dup graphs** (the production input): the same
  *     n-gram-Jaccard pair relation the propagation/incremental CC
  *     rehearsals cluster, per testdata decade. Pairs are
  *     materialized OUTSIDE the timed arms so both algorithms time
  *     the clustering alone; both arms report label counts so
  *     equality is visible in the output.
  *   - **adversarial chains** (the input the star path exists for): a
  *     synthetic n-node path graph per decade — diameter n, the
  *     worst case that makes label propagation O(n) rounds
  *     (`connectedComponents`' require names this escape hatch). The
  *     arm reports the OBSERVED round count next to log2(n): the
  *     O(log n) bound is the result, the wall clock just corroborates
  *     it.
  *
  * Usage: `sbt "runMain graft.CcStarRehearsal [sfDir ...]"` — each
  * sfDir is one near-dup decade (default: the three local decades);
  * SPARK_GRAFT_CHAIN_NODES overrides the chain ladder (comma ints).
  * Prints one JSON line per (face, arm). */
object CcStarRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/testdata/sf1",
        "/tmp/testdata/sf10")
    val chainNodes = sys.env.getOrElse("SPARK_GRAFT_CHAIN_NODES",
      "10000,100000,1000000").split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Clustering, Dedup}

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    sfDirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // materialize the pair relation once (parquet round-trip, the
      // rehearsal convention for shared inputs) so neither arm pays
      // the shingle join inside its timer
      val pairsPath = java.nio.file.Files
        .createTempDirectory("graft-ccstar-pairs").toString
      Dedup.ngramJaccard(docs, n = 3, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
        .write.mode("overwrite").parquet(pairsPath)
      val pairs = spark.read.parquet(pairsPath)
      val nodes = docs.select(col("doc_id"))
      val nEdges = pairs.count()
      val (nProp, sProp) = timed {
        Clustering.clustersFromPairs(pairs, nodes).count()
      }
      val rounds = new AtomicInteger(-1)
      val (nStar, sStar) = timed {
        Clustering.alternatingStar(
          pairs.toDF("doc_a", "doc_b"), nodes.toDF("doc_id"),
          roundCounter = Some(rounds))
          .count()
      }
      println(f"""{"face":"ccstar","arm":"neardup","sf":"$dir",""" +
        f""""edges":$nEdges,"prop_sec":$sProp%.1f,"prop_labels":$nProp,""" +
        f""""star_sec":$sStar%.1f,"star_labels":$nStar,""" +
        f""""star_rounds":${rounds.get()}}""")
    }

    chainNodes.foreach { n =>
      // path graph 0-1-2-...-(n-1): diameter n-1 — propagation's
      // worst case, the star path's home turf
      val edges = spark.range(n - 1)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val nodes = spark.range(n).toDF("id")
      val rounds = new AtomicInteger(-1)
      val (labels, sec) = timed {
        Clustering.alternatingStar(edges, nodes, maxIter = 50,
          roundCounter = Some(rounds))
          .agg(count("*"), countDistinct("lbl")).collect()(0)
      }
      val log2n = (math.log(n.toDouble) / math.log(2.0))
      println(f"""{"face":"ccstar","arm":"chain","n":$n,""" +
        f""""sec":$sec%.1f,"rounds":${rounds.get()},""" +
        f""""log2_n":$log2n%.1f,"labels":${labels.getLong(0)},""" +
        f""""components":${labels.getLong(1)}}""")
    }
    spark.stop()
  }
}
