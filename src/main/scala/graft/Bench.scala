package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: pay session/codegen/scheduler startup (~4s) before any
    // timer starts, so the first query's number is the query's, not
    // the JVM's.
    spark.range(1000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    // noop sink: materializes every row (incl. sorts/projections that a
    // bare count() would let the optimizer elide) without disk I/O.
    // Best of 2 runs per query: the first run pays per-query codegen
    // compilation, which at this sf is the same order as the query
    // itself — the repeat isolates execution from one-time JIT cost.
    // A failed query records -1, never its elapsed time — a failure must
    // be distinguishable from a fast success in the emitted JSON.
    var errors = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
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
      // discard the other run's successful measurement
      val runs = Seq(once(), once()).flatten
      if (runs.isEmpty) errors ::= name
      name -> (if (runs.isEmpty) -1.0 else runs.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
