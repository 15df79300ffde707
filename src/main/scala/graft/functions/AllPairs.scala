package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All unordered pairs (i < j, array order) of an array column, as
  * `array<struct<a, b>>` — the candidate-pair generator at the heart
  * of every LSH/posting-list dedup operator.
  *
  * The higher-order-function formulation
  * (`flatten(transform(a, (x,i) => transform(slice(a, i+2, ...), ...)))`)
  * is interpreted per element and allocates a sliced array per outer
  * element — O(n²) with large constants on exactly the arrays that are
  * already the operators' hot spot (posting lists, LSH buckets). This
  * expression is one static double loop; codegen invokes it directly
  * (same call-a-static-kernel pattern as [[TextProfile]]).
  *
  * Elements of any type are supported; values are copied out of the
  * (possibly buffer-backed) input array so the result owns its data.
  * Null input array => null; elements are assumed non-null.
  */
case class AllPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array input, got ${other.catalogString}")
  }

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elementType), StructField("b", elementType))))

  override def prettyName: String = "graft_all_pairs"

  override def nullSafeEval(input: Any): Any =
    AllPairs.pairs(input.asInstanceOf[ArrayData], elementType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elementType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AllPairs.pairs($c, $et);")
  }

  override protected def withNewChildInternal(newChild: Expression): AllPairs =
    copy(child = newChild)
}

object AllPairs {

  /** Copy one element out of a (possibly unsafe) array. */
  private def copyOf(v: Any): Any = v match {
    case r: org.apache.spark.sql.catalyst.InternalRow => r.copy()
    case a: ArrayData => a.copy()
    case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
    case other => other
  }

  def pairs(arr: ArrayData, et: DataType): ArrayData = {
    val n = arr.numElements()
    // n*(n-1)/2 in Int overflows (to a negative array size) past ~65k
    // elements; internal callers cap buckets at 10k but the
    // SQL-registered graft_all_pairs is unbounded, so fail actionably.
    require(n <= 65535,
      s"graft_all_pairs: input array has $n elements; the pair count " +
        s"n*(n-1)/2 would exceed Int range. Cap the group (e.g. a " +
        s"maxBucket filter) before generating pairs.")
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) { elems(i) = copyOf(arr.get(i, et)); i += 1 }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
