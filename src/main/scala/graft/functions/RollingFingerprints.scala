package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed rolling-hash document fingerprints (the MOSS scheme):
  * Rabin–Karp hashes of every `k`-byte gram, then one fingerprint per
  * window of `w` consecutive grams — the rightmost minimum — deduped
  * across overlapping windows.
  *
  * Output `array<struct<pos int, fp long>>` in position order. The
  * winnowing guarantee: any match of length >= w + k - 1 bytes between
  * two documents shares at least one fingerprint, while only ~2/(w+1)
  * of grams are kept — the document-similarity sketch that works by
  * CONTENT OVERLAP (plagiarism/quotation detection) where shingle-set
  * Jaccard works by whole-document similarity.
  *
  * One pass, codegen'd via the static-kernel pattern
  * ([[TextProfile]]); hashes use fixed 64-bit polynomial arithmetic
  * (base 1000003, natural overflow) so fingerprints are stable across
  * engines and runs.
  */
case class RollingFingerprints(child: Expression, k: Int, w: Int,
    portable: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && w >= 1)

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))))

  override def prettyName: String = "graft_rolling_fp"

  override def nullSafeEval(input: Any): Any =
    if (portable) RollingFingerprints.winnowMd5(input.asInstanceOf[UTF8String], k, w)
    else RollingFingerprints.winnow(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "winnowMd5" else "winnow"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingFingerprints.$fn($c, $k, $w);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprints = copy(child = newChild)
}

object RollingFingerprints {

  val Base = 1000003L

  /** Rabin–Karp hashes of all k-grams of the UTF-8 bytes, then
    * rightmost-min winnowing over windows of `w` grams. */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val hashes = new Array[Long](n)
    var h = 0L
    var pow = 1L // Base^(k-1)
    var i = 0
    while (i < k) {
      h = h * Base + (bytes(i) & 0xff)
      if (i < k - 1) pow *= Base
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * Base + (bytes(i + k - 1) & 0xff)
      hashes(i) = h
      i += 1
    }
    select(hashes, w)
  }

  /** Engine-neutral variant: CHARACTER k-grams hashed with the 60-bit
    * md5 prefix ([[graft.functions.TextAnalysis.md5Hash60]] — the
    * value DuckDB computes as ('0x' || substr(md5(g),1,15))::BIGINT),
    * same winnowing selection. One md5 per gram instead of a rolling
    * update — ~k× the hash work of [[winnow]], which is why the
    * Rabin–Karp path stays the production default — but still a
    * single-pass map with no gram explosion or shuffle, unlike the
    * window-function formulation it replaces in the oracled query. */
  def winnowMd5(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    // Gram positions count Unicode CODEPOINTS (what Spark's
    // length/substr and DuckDB's length/substr both count), not UTF-16
    // code units — Java-String indexing would shift every position
    // after a non-BMP character and could split surrogate pairs.
    val cpCount = str.codePointCount(0, str.length)
    val n = cpCount - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](cpCount + 1)
    var u = 0
    var cp = 0
    while (u < str.length) {
      starts(cp) = u
      u += Character.charCount(str.codePointAt(u))
      cp += 1
    }
    starts(cpCount) = str.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(str.substring(starts(i), starts(i + k))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex digits = (first 8 bytes as unsigned big-endian) >>> 4
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      hashes(i) = h >>> 4
      i += 1
    }
    select(hashes, w)
  }

  /** O(n) monotonic-deque sliding minimum over the gram hashes.
    * Popping `>=` from the back makes ties resolve to the NEWER index
    * — exactly rightmost-min (robust) winnowing. Fewer grams than a
    * window: one window. */
  private def select(hashes: Array[Long], w: Int): ArrayData = {
    val n = hashes.length
    val out = new java.util.ArrayList[Any]()
    var lastPicked = -1
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i2 = 0
    val firstWindowEnd = math.min(w, n)
    while (i2 < n) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i2)) tail -= 1
      deque(tail) = i2
      tail += 1
      val j = i2 - w + 1 // window start once i2 completes a window
      if (j > 0 && deque(head) < j) head += 1
      if (i2 >= firstWindowEnd - 1) {
        val best = deque(head)
        if (best != lastPicked) {
          out.add(new GenericInternalRow(Array[Any](best, hashes(best))))
          lastPicked = best
        }
      }
      i2 += 1
    }
    new GenericArrayData(out.toArray)
  }
}
