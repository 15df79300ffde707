package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles in one pass: `\S+` tokens, windows of `n`
  * joined by a single space — `array<string>`, empty when the document
  * has fewer than `n` tokens.
  *
  * Replaces the higher-order-function chain
  * (`transform(sequence(...), i => concat_ws(" ", slice(toks, ...)))`),
  * which is interpreted per shingle and re-slices the token array each
  * time. Here tokens are found as byte ranges of the UTF-8 input
  * (ASCII whitespace split — exactly java.util.regex `\S+` over the
  * same text) and each shingle is one byte-copy; the codegen calls the
  * static kernel like [[TextProfile]].
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1)

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** `\s` in java.util.regex default mode: ASCII whitespace only. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def shingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // token byte ranges
    var count = 0
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var start = -1
    while (i < bytes.length) {
      if (!isWs(bytes(i))) { if (start < 0) start = i }
      else if (start >= 0) {
        starts.add(start); ends.add(i); count += 1; start = -1
      }
      i += 1
    }
    if (start >= 0) { starts.add(start); ends.add(bytes.length); count += 1 }
    if (count < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count - n + 1)
    var k = 0
    while (k <= count - n) {
      // shingle = bytes of tokens k..k+n-1 with single spaces between
      var len = n - 1
      var t = k
      while (t < k + n) { len += ends.get(t) - starts.get(t); t += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      t = k
      while (t < k + n) {
        val tl = ends.get(t) - starts.get(t)
        System.arraycopy(bytes, starts.get(t), buf, pos, tl)
        pos += tl
        if (t < k + n - 1) { buf(pos) = ' '; pos += 1 }
        t += 1
      }
      out(k) = UTF8String.fromBytes(buf)
      k += 1
    }
    new GenericArrayData(out)
  }
}
