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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
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
      val runs = Seq.fill(timedRuns)(once()).flatten.sorted
      name -> runs
    }
    def j(v: Double): String = f"$v%.6f"
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
    val qs = medians.map { case (k, v) => s"\"$k\":${j(v)}" }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, rs) =>
      val s = if (rs.isEmpty) "[]"
        else s"[${j(rs.head)},${j(rs.last)}]"
      s"\"$k\":$s"
    }.mkString("{", ",", "}")
    val rc = results.map { case (k, rs) =>
      s"\"$k\":${if (rs.isEmpty) 1 else 0}"
    }.mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = medians.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${j(total)},"unit":"sec","queries":$qs,"spread":$spread,"rc":$rc,"runs":$timedRuns,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
