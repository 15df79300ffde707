package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All signed-random-projection bucket codes for one vector, across
  * every LSH table, in one codegen'd kernel: result[t] = the t-th
  * table's `nPlanes`-bit code, bit p set iff dot(v, plane(t, p)) > 0.
  *
  * Why not compose [[Vectors.srpBucket]] per table? That route unrolls
  * nTables x nPlanes `DotProduct` expressions — at the production
  * regime (16 planes x 32 tables) a single projection of 512 dot
  * products whose generated method is kilobytes past the JIT's
  * compilation threshold, so the hottest loop of the LSH path runs in
  * the bytecode INTERPRETER (measured: the banding stage alone cost
  * ~3 s at sf0.1 on 6,000 vectors). This expression is three tight
  * primitive loops over a referenced `double[][]` plane matrix —
  * small generated code, JIT-friendly, zero per-row allocation beyond
  * the result array.
  *
  * Bit-compatibility: the per-plane dot is the same fixed
  * left-to-right fold as [[ArrayMath.DotProduct]] (bounded by the
  * shorter of vector/plane), and the bucket bit rule is the same
  * strict `> 0`, so codes are bit-identical to the composed form —
  * KernelProps pins the equivalence.
  *
  * Plane matrix layout: `planes(t * nPlanes + p)` = plane p of table
  * t. The matrix is a broadcast-referenced driver object (tables x
  * planes x dim doubles — KBs), not literal expression nodes.
  */
case class SrpBuckets(child: Expression, planes: Array[Array[Double]],
    nTables: Int, nPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nPlanes >= 1 && nPlanes <= 30 && nTables >= 1 &&
    planes.length == nTables * nPlanes,
    s"planes must hold nTables*nPlanes rows, got ${planes.length}")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_srp_buckets"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var code = 0
      var p = 0
      while (p < nPlanes) {
        val row = planes(t * nPlanes + p)
        val n = math.min(v.numElements(), row.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * row(i); i += 1 }
        if (s > 0) code |= (1 << p)
        p += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val code = ctx.freshName("code")
      s"""
         |int[] $out = new int[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  int $code = 0;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    double[] $row = $pl[$t * $nPlanes + $p];
         |    int $n = java.lang.Math.min($a.numElements(), $row.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $a.getDouble($i) * $row[$i];
         |    }
         |    if ($s > 0) $code |= (1 << $p);
         |  }
         |  $out[$t] = $code;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SrpBuckets = copy(child = newChild)
}
