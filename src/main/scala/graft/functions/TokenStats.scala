package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document token statistics for the quality gates:
  * token count, distinct-token count, the top token's frequency, and
  * 2-gram total/distinct counts — ONE scan of the string, no explode,
  * no shuffle.
  *
  * The relational formulation (explode tokens → two groupBys → join
  * back) shuffles every token of a 100 TB corpus twice just to reduce
  * each document to five numbers. Per-document statistics with
  * document-bounded state belong in a map-side kernel: state is two
  * small hash structures per row, freed immediately.
  *
  * Tokenization matches `\S+` exactly (java.util.regex `\s` =
  * ASCII [ \t\n\x0B\f\r], same convention as [[TextProfile]]), so the
  * outputs equal the exploded-regex formulation and the same DuckDB
  * oracle verifies both. Codegen calls the static [[TokenStats.stats]]
  * kernel (the [[TextProfile]] pattern).
  */
case class TokenStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("max_tf", LongType, nullable = false),
    StructField("n_2grams", LongType, nullable = false),
    StructField("n_distinct_2grams", LongType, nullable = false)))

  override def prettyName: String = "graft_token_stats"

  override def nullSafeEval(input: Any): Any =
    TokenStats.stats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStats.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** One pass; called from generated code. Exact counts (string-keyed
    * hash state, no probabilistic shortcuts) — the state is bounded by
    * one document, not the corpus. */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    val counts = new java.util.HashMap[String, Long]()
    val grams = new java.util.HashSet[String]()
    var nTok = 0L
    var prevTok: String = null
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(str.charAt(i))) i += 1
        val tok = str.substring(start, i)
        nTok += 1
        val c = counts.get(tok)
        counts.put(tok, if (c == 0L) 1L else c + 1L)
        if (prevTok != null) grams.add(prevTok + " " + tok)
        prevTok = tok
      }
    }
    var maxTf = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > maxTf) maxTf = v }
    val n2 = if (nTok >= 2) nTok - 1 else 0L
    new GenericInternalRow(Array[Any](
      nTok, counts.size.toLong, maxTf, n2, grams.size.toLong))
  }
}
