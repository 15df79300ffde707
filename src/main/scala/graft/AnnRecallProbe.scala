package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.functions.Vectors

/** Measure per-query recall@k of the TRAINED ANN families (IVF /
  * SRP-LSH / PQ — the ones whose candidate choice is approximate by
  * design) against the exact brute-force ranking, at each testdata
  * scale factor. This is the measurement behind the recall floors in
  * the harness gates (SparkEntry `q_ann_{ivf,lsh,pq}` →
  * [[Similarity.recallGate]]): the trained artifacts are
  * seed-deterministic, so per-(dataset, family) recall is a constant
  * and a floor set under the observed minimum trips on code
  * regressions, never on noise. Results land in PERF.md §"ANN recall
  * floors".
  *
  * Usage: `sbt "runMain graft.AnnRecallProbe [sfDir ...]"`
  * (defaults to sf0.001 sf0.01 sf0.1).
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val k = 10
    val pred = col("vec_id") < 5
    dirs.foreach { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val ev = e.select(col("vec_id"),
        Vectors.toDoubleVec(col("embedding")).as("v"))
      val cents = Similarity.ivfCentroids(ev, nCells = 16, iters = 2)
      val cbs = Similarity.pqCodebooks(ev, m = 8, k = 16, dim = 64)
      val fams = Seq(
        "ivf" -> Similarity.ivfTopK(e, pred, k, centroids = Some(cents)),
        "lsh" -> Similarity.lshTopK(e, pred, k),
        "pq" -> Similarity.pqTopK(e, pred, k, codebooks = Some(cbs)))
      fams.foreach { case (name, approx) =>
        val rows = Similarity.recallAtK(e, approx, pred, k)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val per = rows.map { case (q, bp) => s"q$q=$bp" }.mkString(" ")
        val min = rows.map(_._2).min
        println(f"$dir%-28s $name%-4s min_bp=$min%5d  $per")
      }
    }
    spark.stop()
  }
}
