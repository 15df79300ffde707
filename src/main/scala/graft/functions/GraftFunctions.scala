package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.ColumnBridge

/** SQL registration for the graft kernels: after
  * `GraftFunctions.register(spark)`, plain SQL can call
  *
  *   - `graft_dot(a, b)`            — codegen'd array dot product
  *   - `graft_text_profile(text)`   — single-pass token/char counters
  *   - `graft_all_pairs(arr)`       — candidate pairs of an array
  *   - `graft_shingles(text, n)`    — word n-gram shingles
  *   - `graft_heavy_hitters(col, k)`— Misra–Gries top frequencies
  *   - `graft_token_stats(text)`    — single-pass quality-gate stats
  *   - `graft_rolling_fp(text, k, w)` — winnowed rolling fingerprints
  *
  * so the engine's SQL entry point ([[graft.SparkEntry]] `q_rel_sql`
  * style queries) reaches the same kernels the DataFrame API uses. In a
  * deployment these registrations live in a
  * `SparkSessionExtensions` (`spark.sql.extensions`) so every session
  * gets them at startup; `register` applies the identical bindings to
  * an already-running session (which is what tests and notebooks have).
  */
object GraftFunctions {

  private def arity(fn: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${es.length}")

  /** Resolve a foldable int argument (literal, CAST of literal,
    * constant arithmetic — the builder runs before constant folding, so
    * evaluate rather than pattern-match on Literal). */
  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case f if f.foldable && f.dataType == org.apache.spark.sql.types.IntegerType =>
      f.eval().asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$fn expects a constant int argument, got $other")
  }

  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "graft_dot",
      es => { arity("graft_dot", es, 2); DotProduct(es(0), es(1)) })
    ColumnBridge.registerFunction(spark, "graft_text_profile",
      es => { arity("graft_text_profile", es, 1); TextProfile(es(0)) })
    ColumnBridge.registerFunction(spark, "graft_all_pairs",
      es => { arity("graft_all_pairs", es, 1); AllPairs(es(0)) })
    ColumnBridge.registerFunction(spark, "graft_shingles",
      es => { arity("graft_shingles", es, 2)
        WordShingles(es(0), intArg(es(1), "graft_shingles")) })
    ColumnBridge.registerFunction(spark, "graft_heavy_hitters",
      es => { arity("graft_heavy_hitters", es, 2)
        HeavyHitters(es(0), intArg(es(1), "graft_heavy_hitters"))
          .toAggregateExpression() })
    ColumnBridge.registerFunction(spark, "graft_token_stats",
      es => { arity("graft_token_stats", es, 1); TokenStats(es(0)) })
    ColumnBridge.registerFunction(spark, "graft_rolling_fp",
      es => { arity("graft_rolling_fp", es, 3)
        RollingFingerprints(es(0), intArg(es(1), "graft_rolling_fp"),
          intArg(es(2), "graft_rolling_fp")) })
  }
}
