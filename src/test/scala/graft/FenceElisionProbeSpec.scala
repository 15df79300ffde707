package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Empirical pin of WHICH explicit repartition fences Spark 4.1.2's
  * EnsureRequirements can remove over a Union of co-bucketed scans
  * claiming hash(k) under `buckets == spark.sql.shuffle.partitions`
  * (the r14 hazard conf). r15 advice disputed the r14 comment's
  * "subset rule" elision model for superset-key fences; this spec is
  * the ground truth the PostingsStore scaladoc now cites:
  *
  *  - a fence keyed EXACTLY on the claimed key (hash(k)) is elided
  *    (semanticEquals path — the r14 crash mechanism for the dedup
  *    stores' same-key fences);
  *  - a fence keyed on a SUPERSET (k, v) is NOT elided by a hash(k)
  *    claim — `optimizeOutRepartition` requires partitioning
  *    equality, not distribution satisfaction;
  *  - a fence keyed on a DISJOINT key (v) is NOT elided either.
  */
class FenceElisionProbeSpec extends SparkSpec {
  import spark.implicits._

  // AdaptiveSparkPlanExec is a LeafExecNode, so a tree collect sees
  // nothing under it — count in the plan STRING (the house idiom,
  // PlanSpec).
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("fence elision over a claimed-partitioning Union: exact key yes, superset/disjoint no") {
    val dir = Files.createTempDirectory("graft-fence").toString
    val df = (0 until 256).map(i => (i % 16, i)).toDF("k", "v")
    Bucketing.writeBucketed(df, "fence_a", s"$dir/a", Seq("k"), 8)
    Bucketing.writeBucketed(df, "fence_b", s"$dir/b", Seq("k"), 8)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8") // == buckets
      val u = spark.table("fence_a").unionByName(spark.table("fence_b"))

      // same-key fence: union claims hash(k), fence is hash(k) -> elided
      val same = u.repartition(col("k")).groupBy("k").agg(sum("v"))
      assert(shuffles(same) == 0,
        s"expected the same-key fence elided, plan:\n${same.queryExecution.executedPlan}")

      // superset-key fence: hash(k, v) != hash(k) -> must survive
      val superset = u.repartition(col("k"), col("v"))
        .groupBy("k", "v").agg(count(lit(1)))
      assert(shuffles(superset) == 1,
        s"expected the (k,v) fence kept, plan:\n${superset.queryExecution.executedPlan}")

      // disjoint-key fence: hash(v) -> must survive
      val disjoint = u.repartition(col("v")).groupBy("v").agg(count(lit(1)))
      assert(shuffles(disjoint) == 1,
        s"expected the (v) fence kept, plan:\n${disjoint.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.sql("DROP TABLE IF EXISTS fence_a")
      spark.sql("DROP TABLE IF EXISTS fence_b")
    }
  }
}
