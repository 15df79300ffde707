package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query MEDIAN-of-3 seconds.
  *
  * Why median-of-3 with an untimed warm-up (round-3 lesson): at these
  * scale factors per-query times are dominated by Spark fixed costs
  * and swing 4-9x run-to-run — a best-of-2 bench "regressed" queries
  * whose code had not changed. The warm-up pays per-query codegen
  * compilation; the median of 3 timed runs resists a single GC/
  * scheduler hiccup; the emitted spread ([min, max] per query) lets a
  * reader judge whether a cross-round delta clears the noise floor
  * before attributing it to code.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // pinned (not derived from data size) so plans are identical
      // across rounds and machines — a bench that re-plans is not
      // measuring the same query
      .config("spark.sql.shuffle.partitions", cpus)
      // one planning regime for the whole run (the stored-index probes
      // would flip this mid-run otherwise): report bucketed-scan sort
      // order — safe, Spark still verifies one-file-per-bucket before
      // trusting it (see sources/DedupIndexStore)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Silence WindowExec's single-partition warning IN THE BENCH ONLY:
    // every global-window site in the library is a bounded post-limit
    // relation and says so at the call site (CorpusOps/ProfileOps/
    // Similarity/TrainingOps/PrefixSum — audited, r8 verdict item 4);
    // hundreds of repeats of a known-benign warning bury the real
    // ones. Library code stays un-suppressed for users.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // session warm-up: pay scheduler/codegen startup (~4s) before any
    // timer starts, so the first query's number is the query's, not
    // the JVM's.
    spark.range(1000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    // noop sink: materializes every row (incl. sorts/projections that a
    // bare count() would let the optimizer elide) without disk I/O.
    // optional comma-separated query-name filter for local iteration;
    // the driver leaves it unset and benches everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Deterministic measurement order (a Map literal iterates in
    // arbitrary hash order): plain queries first, name-sorted, then
    // every drained-stream query LAST. The drains run full streaming
    // replays (state stores, chunk-file sources, memory sinks) whose
    // JVM debris — state-store providers, streaming-query threads,
    // accumulated heap — otherwise lands on whatever carried query
    // happens to hash after them (the r10 +23% uniform drift). The
    // queries themselves are unchanged; only neighbors moved.
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    val (drains, carried) = selected.toSeq.sortBy(_._1)
      .partition(_._1.endsWith("_stream"))
    val results = (carried ++ drains).map { case (name, fn) =>
      def once(): Option[Double] =
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      // runs are caught independently: one transient failure must not
      // discard the other runs' successful measurements
      once() // per-query warm-up (codegen compilation) — untimed
      // Drain collectable garbage from the PREVIOUS queries before the
      // timer starts: at this scale a query is ~0.5 s of fixed cost, so
      // a single major GC landing inside a timed run doubles or triples
      // the reading. Round-7 lesson: q_vocab_unk read 2.12 s in the
      // full 175-query bench but 0.75-1.0 s in isolation with an
      // UNCHANGED plan (2 scans / 2 tokenizes / 4 exchanges, verified
      // by ScanAudit + a stage-by-stage profile of four alternative
      // formulations, all within noise) — the delta was accumulated-
      // heap collection debt from neighbors, not the query.
      System.gc()
      val first = Seq.fill(timedRuns)(once()).flatten
      // Adaptive re-measurement (round-7 verdict item 6, tightened in
      // round 9): when the spread exceeds 2x the minimum, the batch
      // was noise-dominated (GC debt / JIT churn from neighbors — the
      // q_vocab_unk lesson above), so the MEASUREMENT is redone, not
      // merely padded: five fresh runs, each preceded by its own
      // gc() drain, REPLACE the noisy batch for both the median and
      // the recorded [min,max]. Appending extra samples (the r8 form)
      // fixed the median but left the noisy extremes in the spread,
      // which round diffing then read as instability
      // (q_dedup_containment: 1.69-9.18 s recorded, clean in
      // isolation). A spread still above 2x after per-run drains is
      // real and stays reported.
      val runs = (if (first.nonEmpty && first.max > 2 * first.min)
        Seq.fill(5) { System.gc(); once() }.flatten
      else first).sorted
      name -> runs
    }
    def j(v: Double): String = f"$v%.6f"
    def j3(v: Double): String = f"$v%.3f"
    val errors = results.collect { case (n, rs) if rs.isEmpty => n }.toList
    // a failed query records -1, never an elapsed time — a failure must
    // be distinguishable from a fast success in the emitted JSON.
    // Even counts (even SPARK_GRAFT_BENCH_RUNS, or a partially-failed
    // query surviving 2 of 3 runs) average the two middle values:
    // rs(len/2) alone is the UPPER middle — the MAX of two survivors —
    // which biased exactly the noisy-failure cases this bench targets.
    val medians = results.map { case (n, rs) =>
      n -> (if (rs.isEmpty) -1.0
            else if (rs.length % 2 == 1) rs(rs.length / 2)
            else (rs(rs.length / 2 - 1) + rs(rs.length / 2)) / 2.0)
    }
    // Full fidelity (6-dp medians, [min,max] spread, per-query rc) goes
    // to a FILE; stdout gets ONE line capped well under 2000 chars.
    // Round-4 lesson: the harness that consumes stdout keeps only the
    // final ~2000 characters, and the r4 line (spread + rc maps inline,
    // ~6 KB) overflowed it — the round recorded parsed:null, i.e. no
    // bench signal at all. The stdout map lists queries most-expensive
    // first and stops at a char budget; anything omitted is the cheap
    // tail, counted in "omitted" and present in the detail file.
    val detailFile = new java.io.File("BENCH_DETAIL.json").getAbsoluteFile
    val detail = {
      val med = medians.map { case (k, v) => s"\"$k\":${j(v)}" }
        .mkString("{", ",", "}")
      val spread = results.map { case (k, rs) =>
        val s = if (rs.isEmpty) "[]" else s"[${j(rs.head)},${j(rs.last)}]"
        s"\"$k\":$s"
      }.mkString("{", ",", "}")
      val rc = results.map { case (k, rs) =>
        s"\"$k\":${if (rs.isEmpty) 1 else 0}"
      }.mkString("{", ",", "}")
      val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      // heap: -Xmx as the JVM resolved it — pins WHICH memory regime
      // produced these numbers (the r14 8g-vs-24g A/B would have been
      // self-documenting with this field)
      s"""{"queries":$med,"spread":$spread,"rc":$rc,"runs":$timedRuns,"errors":$errJson,"heap_mb":${Runtime.getRuntime.maxMemory() >> 20},"sf":"$sfDir"}"""
    }
    val pw = new java.io.PrintWriter(detailFile, "UTF-8")
    try pw.println(detail) finally pw.close()
    val total = medians.map(_._2).filter(_ >= 0).sum
    val byCost = medians.toSeq.sortBy { case (_, v) => -v }
    val budget = 1200 // chars for the stdout queries map
    val kept = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    var omitted = 0
    byCost.foreach { case (k, v) =>
      val entry = s"\"$k\":${j3(v)}"
      if (used + entry.length + 1 <= budget) { kept += entry; used += entry.length + 1 }
      else omitted += 1
    }
    val qs = kept.mkString("{", ",", "}")
    // stdout errors are CAPPED (full list lives in the detail file):
    // round 5 emitted 19 error names inline and the line overflowed the
    // driver's ~2000-char stdout window again — parsed:null, no bench
    // signal. "errored" (a count, leading) survives any truncation.
    val errShown = errors.sorted.take(8)
    val errJson = (errShown.map("\"" + _ + "\"") ++
      (if (errors.length > errShown.length)
        Seq("\"+" + (errors.length - errShown.length) + " more\"")
      else Nil)).mkString("[", ",", "]")
    // stop BEFORE printing: the JSON line must be the last thing this
    // main writes to stdout — executor/shutdown chatter landing after
    // it is the remaining suspect for the driver's parsed:null (the
    // consumer tail-parses stdout; r12 verdict item 8). Raise the log
    // threshold to ERROR first so stop()'s own WARN chatter (temp
    // checkpoint cleanup etc.) can't land between stop and the line.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    val summary = s"""{"metric":"total","value":${j3(total)},"unit":"sec","errored":${errors.length},"queries":$qs,"omitted":$omitted,"detail":"${detailFile}","runs":$timedRuns,"errors":$errJson,"sf":"$sfDir"}"""
    // belt + braces vs stdout-parsing consumers (r13 verdict item 3 /
    // advice): the SAME line also lands in a file, structurally —
    // BENCH_DETAIL.json has full fidelity, BENCH_SUMMARY.json has the
    // exact stdout line. build.sbt's StdoutOutput + showSuccess=false
    // make the stdout copy a bare, final line.
    val sw = new java.io.PrintWriter(
      new java.io.File("BENCH_SUMMARY.json").getAbsoluteFile, "UTF-8")
    try sw.println(summary) finally sw.close()
    println(summary)
    System.out.flush()
    // A bench with errored queries must not read as clean to automation
    // keying on the exit code (round-5 advice: rc was 0 with 19 errors).
    if (errors.nonEmpty) sys.exit(2)
  }
}
