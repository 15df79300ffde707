package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The per-document `bits`-wide SimHash fingerprint in ONE pass over
  * the text: `\S+` tokens found as byte ranges (the [[WordShingles]]
  * ASCII-whitespace walk), ONE hash per token occurrence, `bits`
  * signed vote counters bumped ±1 by the hash's bit `i`, and the final
  * fold `bit i set iff votes(i) > 0` — Charikar's SimHash with unit
  * token weights (duplicated tokens vote once per occurrence, exactly
  * the explode-then-sum semantics of the aggregate form).
  *
  * Replaces two interpreted shapes that computed the same value:
  * the batch aggregate (explode every token to a row, 64 independent
  * `sum(when(shiftright(h, i) & 1, 1, -1))` partial aggregates, one
  * shuffle) and the streaming projection (a nested higher-order-
  * function fold allocating a 60-element array per token). Both now
  * call this kernel: batch as `select(simhash_bits(text))` — the
  * fingerprint never needs a shuffle at all, it is a pure projection
  * computed inside the scan stage — and the stream as the same
  * projection over the arriving micro-batch (zero state; the
  * [[TextDHash]] / [[MinHashMins]] kernel precedent).
  *
  * Two hash modes, selected by `portable`:
  *   - `portable = true`: the repo-standard engine-neutral md5-60
  *     token hash (`('0x' || substr(md5(t),1,15))::BIGINT` — the
  *     [[MinHashMins.md5Hash60]] bytes), so the DuckDB oracle replays
  *     the fingerprint bit-for-bit. Use with `bits <= 60`.
  *   - `portable = false`: Spark's own `xxhash64` (XXH64, seed 42)
  *     per token — the production default where no oracle is needed
  *     (one 8-byte hash vs a full md5); identical to
  *     `xxhash64(token_column)` value-for-value (spec-pinned).
  *
  * Returns null when the document has no tokens — the aggregate form
  * emits NO row for such a document (explode of an empty array), so
  * batch callers `.filter(isNotNull)`; the streaming projection's
  * documented fold-to-zero semantics are `coalesce(kernel, 0L)`.
  */
case class SimhashBits(child: Expression, bits: Int, portable: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits > 0 && bits <= 64 && (!portable || bits <= 60),
    s"bits=$bits out of range (64 max, 60 max portable)")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_simhash_bits"

  override def nullSafeEval(input: Any): Any =
    SimhashBits.fingerprint(input.asInstanceOf[UTF8String], bits, portable)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("simhashBoxed")
      s"""
      Long $boxed =
        graft.functions.SimhashBits.fingerprint($c, $bits, $portable);
      ${ev.isNull} = ($boxed == null);
      ${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();"""
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimhashBits = copy(child = newChild)
}

object SimhashBits {

  /** `\s` in java.util.regex default mode: ASCII whitespace only —
    * the complement of the `\S+` token regex every text operator
    * shares ([[WordShingles]]). */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** One pass; called from generated code. Boxed return so codegen can
    * see the no-token case (null) without a second text walk. */
  def fingerprint(s: UTF8String, bits: Int, portable: Boolean):
      java.lang.Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](bits)
    var tokens = 0
    var i = 0
    var start = -1
    while (i <= bytes.length) {
      val atEnd = i == bytes.length
      if (!atEnd && !isWs(bytes(i))) { if (start < 0) start = i }
      else if (start >= 0) {
        val h =
          if (portable) MinHashMins.md5Hash60(bytes, start, i - start)
          else XXH64.hashUnsafeBytes(bytes,
            Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        tokens += 1
        start = -1
      }
      i += 1
    }
    if (tokens == 0) return null
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
}
