package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`)
  * is a higher-order function — `CodegenFallback`, interpreted per
  * element, and it allocates the zipped array. This expression
  * participates in whole-stage codegen with a tight primitive loop:
  * the hot path of every embedding-similarity operator
  * (all-pairs near-dup, brute-force top-k, SRP-LSH bucketing).
  *
  * Summation is a fixed left-to-right fold (i = 0..n-1), identical to
  * both the higher-order-function route and DuckDB's `list_sum` over
  * the elementwise product — so oracle comparisons are bit-exact.
  *
  * Nulls: null input array => null result (standard null-intolerant
  * binary expression). Array elements are assumed non-null (embedding
  * vectors); lengths may differ — the shorter bounds the loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Seq is covariant, so Seq[DataType] satisfies the
  // Seq[AbstractDataType] contract (AbstractDataType is private[sql]).
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
