package graft

import graft.operators.RelationalOps
import graft.sources.Tables.table
import org.apache.spark.sql.Row

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def customers = table(spark, sfDir, "customer")
  private def orders = table(spark, sfDir, "orders")

  test("approx quantiles stay within the GK rank-error bound") {
    import org.apache.spark.sql.functions._
    val got = RelationalOps.orderValueQuantilesApprox(orders)
      .select("o_orderstatus", "p50_approx", "p95_approx")
      .as[(String, Double, Double)].collect()
    assert(got.nonEmpty)
    val acc = 10000
    got.foreach { case (st, p50, p95) =>
      val vals = orders.filter(col("o_orderstatus") === st)
        .select("o_totalprice").as[Double].collect().sorted
      val n = vals.length
      // GK guarantees an element within rank error n/accuracy of the
      // target rank; ±1 extra element of slack absorbs the rank
      // convention difference vs the interpolating exact percentile
      def within(q: Double, v: Double): Boolean = {
        val err = math.max(1, n / acc) + 1
        val target = math.round(q * (n - 1)).toInt
        val lo = vals(math.max(0, target - err))
        val hi = vals(math.min(n - 1, target + err))
        v >= lo - 1e-3 && v <= hi + 1e-3
      }
      assert(within(0.5, p50), s"$st p50=$p50 outside rank bound")
      assert(within(0.95, p95), s"$st p95=$p95 outside rank bound")
    }
  }

  test("rollup emits detail, subtotal, and grand-total levels") {
    val r = RelationalOps.orderRollup(orders).collect()
    val byGid = r.groupBy(_.getAs[Long]("gid"))
    // gid 0 = detail rows, 1 = per-status subtotals, 3 = grand total
    assert(byGid.keySet == Set(0L, 1L, 3L))
    assert(byGid(3L).length == 1)
    val total = byGid(3L).head.getAs[Long]("n_orders")
    assert(total == orders.count())
    // each level partitions the same order count
    assert(byGid(0L).map(_.getAs[Long]("n_orders")).sum == total)
    assert(byGid(1L).map(_.getAs[Long]("n_orders")).sum == total)
    // null-ness of the group columns matches the grouping level
    assert(byGid(1L).forall(row => row.isNullAt(row.fieldIndex("o_orderpriority"))
      && !row.isNullAt(row.fieldIndex("o_orderstatus"))))
  }

  test("KLL quantiles stay within the rank-error bound; merges are lossless-grade") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge
    // rank-error check against exact percentiles on the orders table:
    // KLL k=200 normalized rank error ~1.65%; a rank-eps-correct p50
    // lies between the exact p48 / p52 style bounds — use value bounds
    // derived from exact percentiles at q +- 3*eps
    val eps = 0.05 // generous 3-sigma-ish envelope for k=200
    val rows = RelationalOps.orderValueQuantilesKll(orders)
      .as[(String, Double, Double, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    val bounds = orders.groupBy("o_orderstatus").agg(
      expr(s"percentile(o_totalprice, ${0.5 - eps})").as("p50lo"),
      expr(s"percentile(o_totalprice, ${0.5 + eps})").as("p50hi"),
      expr(s"percentile(o_totalprice, ${0.95 - eps})").as("p95lo"),
      expr(s"percentile(o_totalprice, ${math.min(1.0, 0.95 + eps)})")
        .as("p95hi"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    rows.foreach { case (st, p50, _, p95, _, _) =>
      val b = bounds(st)
      assert(p50 >= b._2 - 1e-6 && p50 <= b._3 + 1e-6,
        s"$st p50 $p50 outside [${b._2}, ${b._3}]")
      assert(p95 >= b._4 - 1e-6 && p95 <= b._5 + 1e-6,
        s"$st p95 $p95 outside [${b._4}, ${b._5}]")
    }
    // slice-merge: per-slice partial sketches merged on the reducer
    // (forced by a repartition) give answers within the same bound —
    // the partial/final path IS the persist-then-union path
    def kllOf(df: org.apache.spark.sql.DataFrame) = {
      val c = ColumnBridge.column(graft.functions.KllQuantiles(
        ColumnBridge.expression(col("o_totalprice")),
        qs = Seq(0.5)).toAggregateExpression())
      df.agg(c.as("q")).select(element_at(col("q"), 1)).as[Double].head()
    }
    val merged = kllOf(orders.repartition(13))
    val single = kllOf(orders.coalesce(1))
    val lo = orders.agg(expr(s"percentile(o_totalprice, ${0.5 - eps})"))
      .as[Double].head()
    val hi = orders.agg(expr(s"percentile(o_totalprice, ${0.5 + eps})"))
      .as[Double].head()
    assert(merged >= lo && merged <= hi, s"merged p50 $merged outside bound")
    assert(single >= lo && single <= hi, s"single p50 $single outside bound")
    // empty group: empty array, not a crash
    val empty = orders.filter(lit(false))
    val c0 = ColumnBridge.column(graft.functions.KllQuantiles(
      ColumnBridge.expression(col("o_totalprice")),
      qs = Seq(0.5)).toAggregateExpression())
    assert(empty.agg(c0.as("q")).select(size(col("q")))
      .as[Int].head() == 0)
  }

  test("grouping sets emit exactly the requested levels") {
    val r = RelationalOps.orderGroupingSets(orders).collect()
    val byGid = r.groupBy(_.getAs[Long]("gid"))
    // gid 0 = (status, priority) cells, 2 = priority subtotals
    // (status aggregated out), 3 = grand total — and NO gid 1: the
    // per-status level a rollup would force is deliberately absent
    assert(byGid.keySet == Set(0L, 2L, 3L))
    val total = byGid(3L).head.getAs[Long]("n_orders")
    assert(total == orders.count())
    assert(byGid(0L).map(_.getAs[Long]("n_orders")).sum == total)
    assert(byGid(2L).map(_.getAs[Long]("n_orders")).sum == total)
    // priority-subtotal rows: status null, priority present
    assert(byGid(2L).forall(row =>
      row.isNullAt(row.fieldIndex("o_orderstatus")) &&
        !row.isNullAt(row.fieldIndex("o_orderpriority"))))
    // and the priority subtotals equal an independent plain groupBy
    import org.apache.spark.sql.functions._
    val want = orders.groupBy("o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    byGid(2L).foreach { row =>
      assert(row.getAs[Long]("n_orders") ==
        want(row.getAs[String]("o_orderpriority")))
    }
  }

  test("semi and anti join partition the customer table") {
    val withU = RelationalOps.customersWithOrders(customers, orders)
    val without = RelationalOps.customersWithoutOrders(customers, orders)
    assert(withU.count() + without.count() == customers.count())
    // disjoint key sets
    assert(withU.select("c_custkey")
      .intersect(without.select("c_custkey")).count() == 0)
    // semi never duplicates a customer with many matching orders
    assert(withU.select("c_custkey").distinct().count() == withU.count())
  }

  test("set ops: union = intersect + except of either side") {
    val ops = RelationalOps.customerSetOps(customers, orders)
      .groupBy("op").count().as[(String, Long)].collect().toMap
    val seg = customers.filter($"c_mktsegment" === "BUILDING").count()
    assert(ops("intersect") + ops("except") == seg)
    assert(ops("union") >= seg && ops.getOrElse("intersect", 0L) >= 0)
  }

  test("top customers per nation: at most n per nation, ranked by acctbal") {
    val r = RelationalOps.topCustomersPerNation(customers,
      table(spark, sfDir, "nation"), n = 3).collect()
    r.groupBy(_.getAs[String]("n_name")).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val bals = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("acctbal"))
      assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
    }
  }

  test("running spend is monotone per customer and ends at the total") {
    val rows = RelationalOps.runningCustomerSpend(orders).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    val totals = orders.groupBy("o_custkey")
      .sum("o_totalprice").as[(Long, Double)].collect().toMap
    byCust.foreach { case (ck, rs) =>
      val cum = rs.map(_.getAs[Double]("cum_spend")) // already output-ordered
      assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
      assert(math.abs(cum.last - totals(ck)) < 0.01)
    }
  }

  test("saltPlan: ceil factors for over-target keys only, clamped at budget") {
    import graft.operators.Salting
    // key "hot" owns 10/20 rows (5000 bp), "warm" 6/20 (3000 bp),
    // four cold keys 1/20 (500 bp) each; target 1000 bp
    val rows = (1 to 10).map(_ => "hot") ++ (1 to 6).map(_ => "warm") ++
      Seq("c1", "c2", "c3", "c4")
    val df = rows.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "k")
    val plan = Salting.saltPlan(df, "k", targetShareBp = 1000L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(plan.keySet == Set("hot", "warm")) // cold keys need nothing
    assert(plan("hot") == (("hot", 10L, 5000L, 5L)))  // ceil(5000/1000)
    assert(plan("warm") == (("warm", 6L, 3000L, 3L)))
    // the replication budget clamps the factor
    val clamped = Salting.saltPlan(df, "k", targetShareBp = 1000L,
      maxSalt = 3).as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(clamped("hot") == 3L && clamped("warm") == 3L)
    // composition: the planned factor through saltedJoin keeps the
    // join result identical to unsalted (the Salting invariant)
    val small = Seq(("hot", 1L), ("warm", 2L), ("c1", 3L)).toDF("k", "v")
    val salted = Salting.saltedJoin(df, small, "k", plan("hot")._4.toInt)
      .collect().map(_.toString).sorted.toSeq
    val plain = df.join(small, "k")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    // and the PER-KEY form consumes the plan relation directly: hot
    // keys spread by their own factor, cold keys unreplicated, result
    // still identical to the unsalted join
    val planned = Salting.saltedJoinPlanned(df, small, "k",
      Salting.saltPlan(df, "k", targetShareBp = 1000L))
      .collect().map(_.toString).sorted.toSeq
    assert(planned == plain)
    // an EMPTY plan (nothing hot) degrades to the plain join exactly
    val noHot = Salting.saltedJoinPlanned(df, small, "k",
      Salting.saltPlan(df, "k", targetShareBp = 9999L))
      .collect().map(_.toString).sorted.toSeq
    assert(noHot == plain)
  }

  test("salted join result equals the unsalted join, and salt spreads keys") {
    import graft.operators.Salting
    val li = table(spark, sfDir, "lineitem")
    val sup = table(spark, sfDir, "supplier")
    val salted = Salting.supplierRevenueSalted(li, sup, salt = 8)
      .collect().map(_.toString).toSeq
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum(
          li("l_extendedprice") * (org.apache.spark.sql.functions.lit(1.0)
            - li("l_discount"))), 4).as("revenue"),
        org.apache.spark.sql.functions.count("*").as("n_items"))
      .orderBy("s_suppkey").collect().map(_.toString).toSeq
    assert(salted == plain)
    // the salt really fans a single hot key over multiple values
    val salts = Salting.saltedJoin(
      li.limit(2000).select("l_suppkey", "l_quantity"),
      sup.select("s_suppkey").withColumnRenamed("s_suppkey", "l_suppkey"),
      "l_suppkey", 8)
    assert(salts.count() == 2000)
  }

  test("quantiles interpolate linearly on a known distribution") {
    val df = Seq(("O", 10.0), ("O", 20.0), ("O", 30.0), ("O", 40.0))
      .toDF("o_orderstatus", "o_totalprice")
    val r = RelationalOps.orderValueQuantiles(df).collect().head
    assert(r.getAs[Double]("p25") == 17.5) // 10 + 0.75*(20-10)
    assert(r.getAs[Double]("p50") == 25.0)
    assert(r.getAs[Double]("p75") == 32.5)
    assert(r.getAs[Long]("n_orders") == 4L)
  }

  test("pivot reports 0 (not null) for an empty count cell") {
    // craft orders with NO 'P' rows: the pinned 'P' columns must read
    // n=0 / price=null, matching the FILTER-aggregate oracle semantics
    val df = Seq(("1-URGENT", "F", 10.0), ("1-URGENT", "O", 20.0),
      ("5-LOW", "F", 30.0))
      .toDF("o_orderpriority", "o_orderstatus", "o_totalprice")
    val r = graft.operators.RelationalOps.ordersByPriorityPivot(df).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[Long]("P_n") == 0L)
      assert(row.isNullAt(row.fieldIndex("P_price")))
    }
    assert(r.head.getAs[Long]("F_n") == 1L)
  }

  test("pricing summary covers every (returnflag, linestatus) exactly once") {
    val li = table(spark, sfDir, "lineitem")
    val r = RelationalOps.pricingSummary(li).collect()
    assert(r.map(row => (row.getString(0), row.getString(1))).distinct.length
      == r.length)
    assert(r.map(_.getAs[Long]("n_items")).sum
      == li.filter($"l_shipdate" <= "2000-12-31").count())
  }

  test("shipping priority returns at most n rows, revenue-descending") {
    val r = RelationalOps.shippingPriority(customers, orders,
      table(spark, sfDir, "lineitem"), n = 10).collect()
    assert(r.length <= 10)
    val rev = r.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("trailingSpend: RANGE frame includes the 7-day boundary and peers") {
    import java.sql.Timestamp
    def o(key: Long, day: Int, price: Double) =
      (key, 1L, Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), price)
    // day 1 | day 8 (exactly 7 days later: IN frame) | day 9 twice
    // (peers: same ts share one frame) — day 1 ages out by day 9
    val df = Seq(o(1, 1, 10.0), o(2, 8, 20.0), o(3, 9, 30.0),
      o(4, 9, 40.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val r = RelationalOps.trailingSpend(df).collect()
      .map(x => (x.getLong(0), x.getLong(3), x.getDouble(4))).toSeq
    assert(r == Seq(
      (1L, 1L, 10.0),
      (2L, 2L, 30.0),   // the 7-day-old order is inside the frame
      (3L, 3L, 90.0),   // both peers visible to each other
      (4L, 3L, 90.0)))
  }

  test("orderNavigation: hand-computed gaps, leads, and quartiles") {
    import java.sql.Timestamp
    def o(key: Long, cust: Long, day: Int, price: Double) =
      (key, cust, Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), price)
    // customer 1: four orders a day apart, prices shuffled so the
    // date order and the price order differ; customer 2: a singleton
    val df = Seq(o(1, 1, 1, 30.0), o(2, 1, 2, 10.0), o(3, 1, 3, 40.0),
      o(4, 1, 4, 20.0), o(5, 2, 9, 99.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val r = RelationalOps.orderNavigation(df).collect()
      .map(x => (x.getLong(0), Option(x.get(4)), Option(x.get(5)),
        x.getLong(6))).toSeq
    val day = 86400000000L
    assert(r == Seq(
      // (key, gap to previous, next key, price quartile within cust)
      (1L, None, Some(2L), 3L),       // price 30 -> 3rd quartile of 4
      (2L, Some(day), Some(3L), 1L),  // price 10 -> 1st
      (3L, Some(day), Some(4L), 4L),  // price 40 -> 4th
      (4L, Some(day), None, 2L),      // price 20 -> 2nd
      (5L, None, None, 1L)))          // singleton: sole quartile 1
  }

  test("refIntegrity: orphans, null keys, and clean edges counted exactly") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "b"), (2L, "c"),  // matched
      (9L, "d"), (9L, "e"),             // orphaned key, twice
      (null, "f")                       // null key: not an orphan
    ).toDF("fk", "payload")
    val got = RelationalOps.refIntegrity(Seq(
      ("dirty", child, "fk", parent, "pk"),
      ("clean", child.filter(child("fk").isin(1L, 2L)), "fk", parent, "pk")))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("clean", 3L, 0L, 0L), ("dirty", 6L, 1L, 2L)))
  }

  test("quantile rank gates: TRUE on the real sketches, and a " +
      "corrupted median trips the p50 gate") {
    import org.apache.spark.sql.functions._
    val gk = RelationalOps.orderValueQuantilesApproxGate(orders)
    assert(gk.count() > 0)
    assert(gk.filter(not(col("p50_ok")) || not(col("p95_ok"))).count()
      == 0, "GK gate tripped on the real sketch")
    val kll = RelationalOps.orderValueQuantilesKllGate(orders)
    assert(kll.filter(not(col("p50_ok")) || not(col("p95_ok"))).count()
      == 0, "KLL gate tripped on the real sketch")
    // corruption drill: claim each group's MIN is its median — the
    // in-plan rank check must fail every group (this is the failure
    // the harness's all-TRUE oracle would then hash-mismatch)
    val bad = orders.groupBy("o_orderstatus").agg(
      min("o_totalprice").as("p50_x"), max("o_totalprice").as("p95_x"),
      round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_exact"),
      round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95_exact"),
      count("*").as("n_orders"))
    val gated = RelationalOps.quantileRankGate(orders, bad,
      "p50_x", "p95_x", epsBp = 100)
    assert(gated.count() > 0 && gated.filter(col("p50_ok")).count() == 0,
      "min-as-median must fail the p50 rank gate in every group")
  }
}
