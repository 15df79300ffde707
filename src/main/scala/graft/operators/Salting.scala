package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for extreme join skew.
  *
  * AQE's skew-join splitting handles most skew at runtime; explicit
  * salting remains the tool when one key dominates so hard that even a
  * split partition's build side overflows, or when AQE is unavailable
  * (streaming joins, pre-3.x clusters). The trade: the small side is
  * replicated `salt`× through the shuffle.
  *
  * Mechanics: every big-side row gets a uniform salt in [0, salt); the
  * small side is exploded once per salt value; the join key becomes
  * (key, salt), so a hot key's rows spread over `salt` reducers instead
  * of one. The join RESULT is identical to the unsalted join for any
  * salt assignment — correctness does not depend on the salt function,
  * only load balance does (spec-pinned).
  */
object Salting {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salt` ways.
    * The big side's salt is derived deterministically from xxhash64
    * over the row's columns directly so retried tasks re-derive
    * identical salts — a rand() salt is also correct but breaks
    * task-retry determinism guarantees for downstream zipWith-style
    * consumers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** [[saltedJoin]] driven by a [[saltPlan]] relation — PER-KEY salt:
    * each hot key spreads by exactly its planned factor, cold keys
    * (absent from the plan) pay NO replication at all, which is the
    * whole point of planning over uniform salting (uniform replicates
    * the small side for EVERY key). The join result is identical to
    * the unsalted join for any plan — the plan only moves load
    * (spec-pinned, the [[saltedJoin]] invariant). The plan relation
    * is hot-key-sized and broadcasts to both sides. */
  def saltedJoinPlanned(big: DataFrame, small: DataFrame, key: String,
      plan: DataFrame): DataFrame = {
    val factors =
      broadcast(plan.select(col(key), col("salt_factor")))
    val saltedBig = big.join(factors, Seq(key), "left")
      .withColumn("__sf", coalesce(col("salt_factor"), lit(1L)))
      .withColumn("__salt",
        pmod(xxhash64(big.columns.map(col): _*), col("__sf")).cast("int"))
      .drop("salt_factor", "__sf")
    val saltedSmall = small.join(factors, Seq(key), "left")
      .withColumn("__sf", coalesce(col("salt_factor"), lit(1L)))
      .withColumn("__salt",
        explode(sequence(lit(0), (col("__sf") - 1).cast("int"))))
      .drop("salt_factor", "__sf")
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt PLAN — the decision output between
    * [[graft.operators.ProfileOps.keySkew]] (the diagnostic) and
    * [[saltedJoin]] (the mechanism): every key whose row share
    * exceeds `targetShareBp` basis points, with the salt factor that
    * spreads it back under target — ceil(share/target), clamped at
    * `maxSalt` (each unit of salt replicates the small side once, so
    * the clamp is the replication budget). Keys at or under target
    * are absent: they need no salting, and at corpus scale the plan
    * relation stays hot-key-sized, the right input for a per-key
    * salt map (uniform salting pays replication for every key;
    * AQE splits only at runtime — this is the PLANNED middle).
    *
    * Integer end-to-end (shares and ceilings in basis points), one
    * map-side-combined count over the key column only. */
  def saltPlan(df: DataFrame, key: String, targetShareBp: Long = 70L,
      maxSalt: Int = 64): DataFrame = {
    require(targetShareBp > 0 && targetShareBp < 10000,
      s"targetShareBp=$targetShareBp must be in (0, 10000)")
    require(maxSalt > 0)
    // the |keys|-row relation feeds the total and the plan (the
    // keySkew checkpoint rule: one raw-table scan)
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = counts.agg(sum("cnt").as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_bp", expr("cnt * 10000 DIV __total"))
      .filter(col("share_bp") > targetShareBp)
      .withColumn("salt_factor", least(lit(maxSalt.toLong),
        expr(s"(share_bp + $targetShareBp - 1) DIV $targetShareBp")))
      .select(col(key), col("cnt"), col("share_bp"), col("salt_factor"))
      .orderBy(col("cnt").desc, col(key).asc_nulls_first)
  }

  /** Salted supplier revenue: lineitem (big, skewable on l_suppkey)
    * ⋈ supplier (small, replicated) → per-supplier revenue. Same result
    * as the plain join — the oracle proves it. */
  def supplierRevenueSalted(lineitem: DataFrame, supplier: DataFrame,
      salt: Int = 8): DataFrame = {
    val li = lineitem.select(col("l_suppkey").as("s_suppkey"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    saltedJoin(li, supplier.select("s_suppkey", "s_name"), "s_suppkey", salt)
      .groupBy("s_suppkey", "s_name")
      .agg(round(sum("rev"), 4).as("revenue"), count("*").as("n_items"))
      .orderBy("s_suppkey")
  }
}
