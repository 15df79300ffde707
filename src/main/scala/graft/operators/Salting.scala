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
