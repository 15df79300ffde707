package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key rehearsal: measure the skew-handling operators against
  * their plain twins on a fixture where one key genuinely dominates
  * (tools/make_skew.py plants one user / one supplier at ~20% of
  * rows in the 10x replica). The correctness gates already prove the
  * twins EQUAL; this main measures whether the skew machinery WINS —
  * per-variant wall time, median of `runs` after one warm-up.
  *
  * The salted-join comparison disables broadcast (the operator exists
  * for the regime where the small side CANNOT broadcast) and measures
  * three ways: plain sort-merge with AQE skew splitting off (the
  * straggler), salted with it off (the manual fix), and plain with
  * AQE skew splitting on (the runtime fix) — so the table shows what
  * each mechanism buys, not just that salting helps.
  *
  * Usage: `sbt "runMain graft.SkewRehearsal [skewDir] [runs]"`
  * (default /tmp/testdata/sf1.0skew — build it with make_sf.py 10 +
  * make_skew.py first).
  */
object SkewRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/testdata/sf1.0skew")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String, conf: Map[String, String] = Map.empty)(
        df: => DataFrame): Double = {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        def once(): Double = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up (codegen)
        System.gc()
        val med = Seq.fill(runs)(once()).sorted.apply(runs / 2)
        println(f"$name%-34s ${med}%8.2f s")
        med
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val events = graft.sources.Tables.events(spark, dir)
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val supplier = spark.read.parquet(s"$dir/supplier.parquet")

    println(s"== hot-key rehearsal on $dir (local[$cpus], $runs runs) ==")

    // ---- as-of join: per-user window vs (user, hour-bucket) window ----
    // the raw asof core, not the harness query: eventAsof's trailing
    // orderBy(ev_id) is a full result sort both variants pay equally,
    // which only masks the window-partitioning delta being measured
    val q = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("ev_id"), col("user_id"), col("ts"))
    val r = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))
    val asofPlain = time("asof plain (per-user window)") {
      graft.operators.AsofJoin.asof(q, r, key = "user_id", time = "ts",
        payload = Seq("r_id", "r_ts"))
    }
    val asofBucketed = time("asof bucketed (user x hour)") {
      graft.operators.AsofJoin.asof(q, r, key = "user_id", time = "ts",
        payload = Seq("r_id", "r_ts"),
        timeBucket = Some(t => date_trunc("hour", t)))
    }

    // ---- shuffle join on the hot supplier key ----
    val noBroadcast = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val aqeSkewOff = noBroadcast +
      ("spark.sql.adaptive.skewJoin.enabled" -> "false")
    def plainRevenue: DataFrame = {
      val li = lineitem.select(col("l_suppkey").as("s_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      li.join(supplier.select("s_suppkey", "s_name"), "s_suppkey")
        .groupBy("s_suppkey", "s_name")
        .agg(round(sum("rev"), 4).as("revenue"), count("*").as("n_items"))
        .orderBy("s_suppkey")
    }
    val joinPlain = time("join plain SMJ (AQE skew off)", aqeSkewOff) {
      plainRevenue
    }
    val joinSalted = time("join salted x8 (AQE skew off)", aqeSkewOff) {
      graft.operators.Salting.supplierRevenueSalted(lineitem, supplier, 8)
    }
    // ---- PLANNED per-key salting (q_salt_plan -> saltedJoinPlanned):
    // hot keys spread by their own ceil(share/target) factor, cold
    // keys unreplicated — the cost uniform x8 pays on every key. The
    // plan is a reusable artifact (a deployment stores it next to the
    // skew diagnostic), so it is built once outside the timer and its
    // build cost reported separately.
    val planT0 = System.nanoTime()
    val plan = graft.operators.Salting
      .saltPlan(lineitem.select(col("l_suppkey").as("s_suppkey")),
        "s_suppkey")
      .localCheckpoint()
    val nHot = plan.count()
    println(f"salt plan build: ${(System.nanoTime() - planT0) / 1e9}%.2f s" +
      s" ($nHot hot keys)")
    val joinPlanned = time("join salted planned (AQE skew off)",
        aqeSkewOff) {
      val li = lineitem.select(col("l_suppkey").as("s_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      graft.operators.Salting.saltedJoinPlanned(li,
          supplier.select("s_suppkey", "s_name"), "s_suppkey", plan)
        .groupBy("s_suppkey", "s_name")
        .agg(round(sum("rev"), 4).as("revenue"), count("*").as("n_items"))
        .orderBy("s_suppkey")
    }
    // AQE's skew split keys on ABSOLUTE partition size (default
    // threshold 256 MB) — the rehearsal's hot partition is ~40 MB, so
    // at defaults AQE correctly declines to split what production-
    // sized data WOULD trigger. Scale the thresholds down by the same
    // ratio the fixture is scaled down, so the mechanism itself is
    // what gets measured.
    // forceOptimizeSkewedJoin matters here: the groupBy(s_suppkey)
    // DOWNSTREAM of the join reuses the join's hash partitioning, so
    // splitting the skewed partition would introduce an extra
    // shuffle — by default AQE declines the split entirely in that
    // situation, leaving the straggler in place.
    val aqeSkewScaled = noBroadcast ++ Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val joinAqe = time("join plain SMJ (AQE skew scaled)", aqeSkewScaled) {
      plainRevenue
    }

    // ---- per-type top users: window sort vs bounded-heap aggregate ----
    val topWindow = time("top-users window form") {
      graft.operators.EventOps.topUsersPerType(events, 5)
    }
    val topHeap = time("top-users heap aggregate") {
      graft.operators.EventOps.topUsersPerTypeAgg(events, 5)
    }

    println(f"asof bucketed win: ${asofPlain / asofBucketed}%.2fx; " +
      f"salted win: ${joinPlain / joinSalted}%.2fx; " +
      f"planned-salt win: ${joinPlain / joinPlanned}%.2fx; " +
      f"AQE win: ${joinPlain / joinAqe}%.2fx; " +
      f"heap-vs-window: ${topWindow / topHeap}%.2fx")
    spark.stop()
  }
}
