package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass phrase matcher over a text payload: tokenize by the
  * `\S+` rule ([[TextAnalysis.WsTokenRegex]] — runs of
  * non-whitespace, whitespace = Java regex `\s` = space, \t, \n,
  * \x0B, \f, \r) and count OVERLAPPING occurrences of the literal
  * token phrase, returning the packed long
  *
  *   (n_hits << 32) | (first_pos + 1),   0 = no match
  *
  * (first_pos is the 0-based token offset of the first hit; both
  * halves fit comfortably — a doc with 2^31 tokens is not a doc).
  *
  * Exists for the same reason as [[TextDHash]]: the
  * `filter(sequence(...))` higher-order-function formulation of the
  * same test runs its lambda INTERPRETED per token per phrase offset
  * and dominated q_phrase_projected's profile (4.4 s vs the window
  * form's 0.6 s at sf0.1); this is one JIT-compiled loop inside
  * whole-stage codegen. The phrase rides the expression as a
  * constructor constant (a reference object in generated code), so
  * the match loop never allocates per row beyond the token walk.
  * Semantics pinned equal to the lambda form in CorpusOpsSpec.
  */
case class PhraseHits(child: Expression, phrase: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(phrase.nonEmpty && phrase.forall(_.nonEmpty))

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_phrase_hits"

  @transient private lazy val phraseArr: Array[String] = phrase.toArray

  override def nullSafeEval(input: Any): Any =
    PhraseHits.hits(input.asInstanceOf[UTF8String], phraseArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phrase", phraseArr,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PhraseHits.hits($c, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PhraseHits = copy(child = newChild)
}

object PhraseHits {

  /** Java-regex `\s` exactly — the `\S+` tokenizer's complement. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  /** One pass; called from generated code. */
  def hits(s: UTF8String, phrase: Array[String]): Long = {
    val str = s.toString
    val n = str.length
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(str.charAt(i))) i += 1
      if (i > start) toks.add(str.substring(start, i))
    }
    val p = phrase.length
    val m = toks.size()
    var nHits = 0
    var first = -1
    var t = 0
    while (t + p <= m) {
      var j = 0
      while (j < p && toks.get(t + j) == phrase(j)) j += 1
      if (j == p) {
        nHits += 1
        if (first < 0) first = t
      }
      t += 1
    }
    if (nHits == 0) 0L else (nHits.toLong << 32) | (first + 1).toLong
  }
}
