package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression combinators. */
object ColumnOps {

  /** Let-binding for column expressions: evaluate `v` exactly once per
    * row and reference the result any number of times in `body`.
    *
    * Why this exists: Catalyst's `CollapseProject` freely inlines an
    * aliased expression into every use site, including into lambda
    * bodies of higher-order functions — where it is then re-evaluated
    * *per array element*. An expensive aliased column (a regex token
    * array, a 64-hash MinHash signature) referenced inside a
    * `transform` lambda silently turns O(1) work per row into O(n).
    * Wrapping the value in a 1-element array and binding it to a
    * lambda variable pins a single evaluation; the optimizer cannot
    * substitute through a lambda binding.
    */
  def bind(v: Column, body: Column => Column): Column =
    element_at(transform(array(v), x => body(x)), 1)

  /** All unordered pairs of a (pre-sorted) array column, as
    * `array<struct<a, b>>` with a < b in array order. O(k^2) output for
    * a k-element array — callers bound k (bucket size) upstream.
    * Backed by the codegen'd [[AllPairs]] kernel (the equivalent
    * higher-order-function chain is interpreted per element and was the
    * dedup operators' hot spot). */
  def pairsOf(arr: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      AllPairs(org.apache.spark.sql.graft.ColumnBridge.expression(arr)))
}
