package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All product-quantization codes for one vector in one codegen'd
  * kernel: result[mi] = argmax over the `k` centroids of subspace mi
  * of `dot(sub(v, mi), c) − ‖c‖²/2` (the −2·dot + ‖c‖² nearest-
  * centroid expansion with the row-constant ‖x‖² dropped), ties to
  * the FIRST centroid.
  *
  * Why not compose slice + [[ArrayMath.DotProduct]] per (subspace,
  * centroid)? That unrolls m·k dot expressions — 128 at the default
  * 8×16 geometry, and kilobytes past the JIT compilation threshold at
  * production codebook sizes (8×256), the same failure mode that
  * motivated [[SrpBuckets]]: the encode loop, the one pass over the
  * full corpus, would run in the bytecode interpreter. This kernel is
  * three tight primitive loops over a referenced `double[][]`
  * centroid matrix.
  *
  * Bit-compatibility with the composed form (spec-pinned): the dot is
  * the same left-to-right fold bounded by the shorter operand, the
  * half-norms are precomputed with the identical Scala expression the
  * composed form folds into its literals, and strict `>` keeps the
  * first of tied centroids — matching `array_position(scores,
  * array_max(scores))`.
  *
  * Centroid layout: `centroids(mi * k + ci)` = centroid ci of
  * subspace mi (each row `dsub` long); `halfNorms` aligned. Both are
  * broadcast-referenced driver objects, not literal expression nodes.
  */
case class PqCodes(child: Expression, centroids: Array[Array[Double]],
    halfNorms: Array[Double], m: Int, k: Int, dsub: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(m >= 1 && k >= 1 && dsub >= 1 &&
    centroids.length == m * k && halfNorms.length == m * k,
    s"centroids/halfNorms must hold m*k rows, got ${centroids.length}")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_codes"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nv = v.numElements()
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      var best = 0
      var bestScore = Double.NegativeInfinity
      var ci = 0
      while (ci < k) {
        val row = centroids(mi * k + ci)
        var s = 0.0
        var i = 0
        while (i < dsub && base + i < nv) {
          s += v.getDouble(base + i) * row(i)
          i += 1
        }
        val score = s - halfNorms(mi * k + ci)
        if (score > bestScore) { bestScore = score; best = ci }
        ci += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("pqCentroids", centroids, "double[][]")
      val hn = ctx.addReferenceObj("pqHalfNorms", halfNorms, "double[]")
      val out = ctx.freshName("out")
      val nv = ctx.freshName("nv")
      val mi = ctx.freshName("mi")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val ci = ctx.freshName("ci")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val score = ctx.freshName("score")
      s"""
         |int[] $out = new int[$m];
         |int $nv = $a.numElements();
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $base = $mi * $dsub;
         |  int $best = 0;
         |  double $bestScore = Double.NEGATIVE_INFINITY;
         |  for (int $ci = 0; $ci < $k; $ci++) {
         |    double[] $row = $cents[$mi * $k + $ci];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dsub && $base + $i < $nv; $i++) {
         |      $s += $a.getDouble($base + $i) * $row[$i];
         |    }
         |    double $score = $s - $hn[$mi * $k + $ci];
         |    if ($score > $bestScore) { $bestScore = $score; $best = $ci; }
         |  }
         |  $out[$mi] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqCodes = copy(child = newChild)
}
