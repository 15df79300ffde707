package graft

import java.nio.file.Files

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpec {

  test("co-located join of bucketed tables plans with no shuffle") {
    val dir = Files.createTempDirectory("graft-buckets")
    val orders = Tables.table(spark, sfDir, "orders")
    val customer = Tables.table(spark, sfDir, "customer")
    try {
      Bucketing.writeBucketed(orders, "b_orders",
        s"$dir/orders", "o_custkey", buckets = 8)
      Bucketing.writeBucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer",
        s"$dir/customer", "o_custkey", buckets = 8)
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_customer",
        "o_custkey")
      // correctness: same as joining the unbucketed sources
      val want = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      assert(joined.count() == want.count())
      // the point: no Exchange anywhere in the join plan — the bucketed
      // layout IS the hash partitioning
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
