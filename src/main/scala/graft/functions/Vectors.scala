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
    * (deterministic, seeded); nPlanes <= 30. */
  def srpBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedlit(p)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
