package graft

import org.apache.spark.sql.SparkSession

/** Scale rehearsal for the SEQUENTIAL tokenizer trainers — the one
  * heavy family whose 10× story was asserted but unmeasured
  * (round-8 verdict, missing #3). The claim under test: per-round
  * trainer cost is VOCABULARY-scale (the word-frequency relation),
  * so 10× corpus volume — whose replica tagging also grows the
  * vocabulary ~10× — should cost ≤ ~10× per training run, and the
  * per-round `localCheckpoint` chain must not accumulate
  * (the Clustering lesson).
  *
  * Trains FRESH each timed run at the production budgets (BPE 30
  * merges, WordPiece 20, unigram-LM full EM) — deliberately bypassing
  * the harness caches ([[SparkEntry]]'s `unigramCache` /
  * `bpeRulesCache`), which exist for cross-query reuse and would turn
  * a rehearsal run into a cache read.
  *
  * Usage: `sbt "runMain graft.TrainerRehearsal <sfDir> [runs]"`;
  * run against /root/testdata/sf0.1 and the tools/make_sf.py 10×
  * replica set, compare medians (PERF.md records the table).
  */
object TrainerRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-trainer-rehearsal")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .localCheckpoint() // time the trainers, not the scan

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val jobs: Seq[(String, () => Unit)] = Seq(
      ("bpe_train_30", () =>
        assert(operators.Bpe.train(docs, nMerges = 30)._1.count() > 0)),
      ("wordpiece_train_20", () =>
        assert(operators.WordPiece.train(docs, nMerges = 20).count() > 0)),
      ("unigram_train", () =>
        assert(operators.Unigram.train(docs).count() > 0)))
    val rows = jobs.map { case (name, job) =>
      job() // warm-up (codegen)
      val ts = Seq.fill(runs) { System.gc(); time(job()) }
      // bounded pinned state: the per-round localCheckpoint chains
      // must release superseded rounds, or repeated training leaks
      val pinned = spark.sparkContext.getPersistentRDDs.size
      (name, median(ts), ts.min, ts.max, pinned)
    }
    println(f"== trainer rehearsal on $dir ($runs runs) ==")
    rows.foreach { case (n, med, mn, mx, pinned) =>
      println(f"$n%-22s median $med%7.2f s  [$mn%.2f, $mx%.2f]  " +
        f"pinnedRDDs=$pinned")
    }
    spark.stop()
  }
}
