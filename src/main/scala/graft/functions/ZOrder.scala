package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data clustering.
  *
  * The 100 TB problem this solves is LAYOUT, not compute: a parquet
  * lake is pruned by per-file/row-group min-max statistics, and a
  * single-column sort gives selective stats on that one column only —
  * a predicate on any other column still reads every file. Interleaving
  * the bits of several columns into one sort key (the Morton curve)
  * makes files cover small axis-aligned boxes in the key space, so
  * min-max pruning works for predicates on ANY prefix-free subset of
  * the z-ordered columns (the technique behind Delta/Iceberg Z-ORDER
  * clustering; Morton 1966).
  *
  * Built entirely from codegen'd bitwise built-ins (shiftright/
  * shiftleft/bitwiseAND + sum) — the whole key is one whole-stage-
  * codegen projection, no UDF, no custom Expression needed.
  */
object ZOrder {

  /** The interleaved z-value of `cols`: bit `i` of column `k` lands at
    * position `i * cols.size + k`. Columns must be non-negative
    * integers < 2^bits (the caller picks `bits` for its domain;
    * `bits * cols.size` must fit a signed long). Rows violating the
    * domain produce undefined interleavings (garbage-in); see
    * [[zvalueChecked]] for the guarded variant.
    */
  def zvalue(cols: Seq[Column], bits: Int = 21): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits=$bits x ${cols.size} cols must fit in a signed long")
    val m = cols.size
    val terms = for {
      (c, k) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * m + k)
    // bit positions are disjoint, so + is | — and stays in codegen
    terms.reduce(_ + _)
  }

  /** [[zvalue]] that fails per-row (null) when an input is outside
    * [0, 2^bits) instead of silently interleaving garbage. */
  def zvalueChecked(cols: Seq[Column], bits: Int = 21): Column = {
    val inDomain = cols
      .map(c => c.cast("long").between(0L, (1L << bits) - 1))
      .reduce(_ && _)
    when(inDomain, zvalue(cols, bits))
  }
}
