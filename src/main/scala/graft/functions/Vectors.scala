package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embedding columns.
  * Everything is computed in double with a fixed left-to-right fold so
  * results are bit-reproducible across engines (the DuckDB oracles
  * mirror the same summation order). Pure `functions._` expressions —
  * codegen'd, no UDFs.
  */
object Vectors {

  /** Widen array<float> -> array<double> (exact). */
  def toDoubleVec(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def normSq(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), _ + _)

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
