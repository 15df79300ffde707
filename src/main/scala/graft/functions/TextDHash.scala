package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass fake-luma dHash over a text payload: box-average the
  * code-point sequence onto an 8x9 grid, bit r*8+c = 1 iff
  * grid(r, c+1) > grid(r, c) — the [[graft.operators.MultiModal]]
  * perceptual-near-dup harness kernel.
  *
  * The arithmetic is EXACTLY the DuckDB oracle's (floor-division box
  * bounds on n = code-point count, integer box sums, floor-average,
  * two's-complement bit 63) — the higher-order-function formulation it
  * replaces computed the same 72 cells through interpreted
  * slice/aggregate lambdas and dominated the query's profile; this is
  * one JIT-compiled loop inside whole-stage codegen (the
  * [[TextProfile]] pattern). Callers gate on >= 72 code points (grid
  * underflow — the imageDHash >= 9x8 px rule); shorter inputs return
  * 0L and must be filtered out upstream.
  */
case class TextDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_text_dhash"

  override def nullSafeEval(input: Any): Any =
    TextDHash.dhash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextDHash.dhash($c);")

  override protected def withNewChildInternal(newChild: Expression): TextDHash =
    copy(child = newChild)
}

object TextDHash {

  /** One pass; called from generated code. */
  def dhash(s: UTF8String): Long = {
    val str = s.toString
    // code points, matching substring()/ord() character semantics
    val n = str.codePointCount(0, str.length)
    if (n < 72) return 0L
    val cp = new Array[Long](n)
    var i = 0
    var k = 0
    while (i < str.length) {
      val c = str.codePointAt(i)
      cp(k) = c.toLong
      k += 1
      i += Character.charCount(c)
    }
    // prefix sums make every box sum O(1): ps(i) = sum of cp(0..i-1)
    val ps = new Array[Long](n + 1)
    i = 0
    while (i < n) { ps(i + 1) = ps(i) + cp(i); i += 1 }
    val nL = n.toLong
    var hash = 0L
    var r = 0
    while (r < 8) {
      val lo = r * nL / 8
      val m = (r + 1) * nL / 8 - lo
      var prev = 0L
      var c = 0
      while (c < 9) {
        val a = lo + c * m / 9
        val b = lo + (c + 1) * m / 9
        val cell = (ps(b.toInt) - ps(a.toInt)) / (b - a)
        if (c > 0 && cell > prev) hash |= 1L << (r * 8 + (c - 1))
        prev = cell
        c += 1
      }
      r += 1
    }
    hash
  }
}
