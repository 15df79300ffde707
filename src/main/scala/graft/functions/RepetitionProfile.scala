package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document repetition signals — the Gopher-style
  * repetition filters (Rae et al. 2021, "Scaling Language Models",
  * §A1.1: top n-gram fraction, duplicate n-gram fraction) used to
  * drop boilerplate/spam before LLM training. ONE scan of the string,
  * no explode, no shuffle:
  *
  *   n_tokens       whitespace tokens
  *   top1_cnt       occurrences of the most frequent word
  *   top2_cnt       occurrences of the most frequent 2-gram
  *   top3_cnt       occurrences of the most frequent 3-gram
  *   dup_word_tokens  tokens whose word occurs more than once
  *   dup_2gram_tokens 2-gram positions whose gram occurs more than once
  *
  * All counts are exact integers — fractions (and gates) are left to
  * the caller as integer cross-multiplications, the engine-neutral
  * form (a rounded double splits Spark and DuckDB on half-values; see
  * CorpusOps.qualityRules for the same pattern).
  *
  * The relational formulation (explode n-grams → groupBy(doc, gram) →
  * max per doc, once per n) shuffles every token of the corpus once
  * per n-gram order just to reduce each document to six numbers.
  * Per-document statistics with document-bounded state belong in a
  * map-side kernel (the [[TokenStats]]/[[TextProfile]] pattern):
  * state is three hash maps bounded by one document, freed per row.
  * Tokenization matches `\S+` (ASCII whitespace), same convention as
  * [[TokenStats]], so the DuckDB oracle splits on the same rule.
  */
case class RepetitionProfile(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top1_cnt", LongType, nullable = false),
    StructField("top2_cnt", LongType, nullable = false),
    StructField("top3_cnt", LongType, nullable = false),
    StructField("dup_word_tokens", LongType, nullable = false),
    StructField("dup_2gram_tokens", LongType, nullable = false)))

  override def prettyName: String = "graft_repetition_profile"

  override def nullSafeEval(input: Any): Any =
    RepetitionProfile.profile(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionProfile.profile($c);")

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionProfile = copy(child = newChild)
}

object RepetitionProfile {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private def maxValue(m: java.util.HashMap[String, Long]): Long = {
    var mx = 0L
    val it = m.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > mx) mx = v }
    mx
  }

  private def dupMass(m: java.util.HashMap[String, Long]): Long = {
    var s = 0L
    val it = m.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > 1L) s += v }
    s
  }

  /** One pass; called from generated code. Exact counts — state is
    * bounded by one document, not the corpus. */
  def profile(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    val c1 = new java.util.HashMap[String, Long]()
    val c2 = new java.util.HashMap[String, Long]()
    val c3 = new java.util.HashMap[String, Long]()
    var nTok = 0L
    var prev1: String = null
    var prev2: String = null
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(str.charAt(i))) i += 1
        val tok = str.substring(start, i)
        nTok += 1
        c1.merge(tok, 1L, (a, b) => a + b)
        if (prev1 != null) c2.merge(prev1 + " " + tok, 1L, (a, b) => a + b)
        if (prev2 != null)
          c3.merge(prev2 + " " + prev1 + " " + tok, 1L, (a, b) => a + b)
        prev2 = prev1
        prev1 = tok
      }
    }
    new GenericInternalRow(Array[Any](
      nTok, maxValue(c1), maxValue(c2), maxValue(c3),
      dupMass(c1), dupMass(c2)))
  }
}
