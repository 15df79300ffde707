package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Dense-vector column math over `array<float>` embedding columns.
  * Everything is computed in double with a fixed left-to-right fold so
  * results are bit-reproducible across engines (the DuckDB oracles
  * mirror the same summation order). The dot-product kernel is a
  * native codegen'd Catalyst expression ([[DotProduct]]) — the
  * higher-order-function formulation is interpreted and ~100x slower
  * in the all-pairs hot path.
  */
object Vectors {

  /** Widen array<float> -> array<double> (exact). */
  def toDoubleVec(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normSq(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Signed-random-projection LSH bucket: bit i of the result is the
    * sign of dot(v, plane_i). Planes are passed as literal arrays
    * (deterministic, seeded); nPlanes <= 30.
    *
    * Composition note: this unrolls one [[DotProduct]] per plane —
    * fine for ONE table's code, but banding nTables x nPlanes this way
    * generates a method too large for the JIT (it runs interpreted).
    * Multi-table banding goes through [[srpBucketsAll]]. */
  def srpBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedlit(p)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** All LSH tables' SRP codes at once: `array<int>` with element t =
    * table t's bucket, via the single tight-loop [[SrpBuckets]] kernel
    * (bit-identical to [[srpBucket]] per table — KernelProps). Every
    * table must have the same plane count. */
  def srpBucketsAll(v: Column, tables: Seq[Seq[Seq[Double]]]): Column = {
    require(tables.nonEmpty && tables.forall(_.length == tables.head.length))
    ColumnBridge.column(SrpBuckets(ColumnBridge.expression(v),
      tables.flatten.map(_.toArray).toArray,
      tables.length, tables.head.length))
  }
}
