package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All MinHash component minima of a document's word-`n`-gram shingle
  * set in ONE pass over the text: tokenize + shingle (the
  * [[WordShingles]] byte walk), ONE portable md5-60 per shingle, and
  * `numHashes` affine wrap-mixes `h·A(i) + B(i)` (mod 2^64, two's-
  * complement — Java long arithmetic, which ANSI-mode column
  * arithmetic would refuse) with running signed minima — the
  * classic one-hash-many-mixes MinHash economy (Broder's permutation
  * family over a shared base hash).
  *
  * Replaces the diversity estimator's previous shape — explode every
  * (shingle × component) row, md5 EACH (16 md5 calls per shingle),
  * and shuffle the 16×|shingles| relation into a (doc, i) min
  * aggregate. Here the corpus-side output is |docs| rows of
  * `numHashes` longs; no shingle ever leaves the scan stage
  * (the [[TextDHash]] / [[SrpBuckets]] kernel precedent).
  *
  * Exactly replayable by the DuckDB oracle: the base hash is the
  * repo-standard md5Hash60 (`('0x' || substr(md5(s), 1, 15))::BIGINT`),
  * the mix runs in HUGEINT mod 2^64 and folds to signed BIGINT (the
  * `q_fingerprint_rolling` convention), and min compares the same
  * signed values. Duplicate shingles cannot change a minimum, so no
  * distinct pass exists on either side. Returns null when the
  * document has fewer than `n` tokens (no shingles) — filter
  * upstream.
  */
case class MinHashMins(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && numHashes >= 1 && numHashes <= 64)

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash_mins"

  override def nullSafeEval(input: Any): Any =
    MinHashMins.mins(input.asInstanceOf[UTF8String], n, numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashMins.mins($c, $n, $numHashes);
      ${ev.isNull} = (${ev.value} == null);""")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashMins = copy(child = newChild)
}

object MinHashMins {

  /** Golden-ratio multiplier (odd) — A(i) = KnuthA·(2i+1) stays odd,
    * so every mix is a bijection of the 2^64 ring. */
  val KnuthA = 0x9E3779B97F4A7C15L

  /** splitmix64's second constant — B(i) = MixB·i. */
  val MixB = 0x94D049BB133111EBL

  /** Component-i affine constants (wrapping): shared with the oracle
    * builder so SQL and kernel cannot drift. */
  def a(i: Int): Long = KnuthA * (2L * i + 1L)
  def b(i: Int): Long = MixB * i.toLong

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(bytes) as a 60-bit long — byte-wise
    * form of `conv(substring(md5(s), 1, 15), 16, 10)`. */
  def md5Hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(bytes, off, len)
    val dig = d.digest()
    var h = 0L
    var j = 0
    while (j < 7) { h = (h << 8) | (dig(j) & 0xFFL); j += 1 }
    (h << 4) | ((dig(7) >> 4) & 0xFL)
  }

  /** One pass; called from generated code. Returns null when the text
    * has fewer than `n` tokens. */
  def mins(s: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val shingles = WordShingles.shingles(s, n)
    val count = shingles.numElements()
    if (count == 0) return null
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var k = 0
    while (k < count) {
      val sh = shingles.getUTF8String(k)
      val bytes = sh.getBytes
      val h = md5Hash60(bytes, 0, bytes.length)
      var i = 0
      while (i < numHashes) {
        val v = h * a(i) + b(i) // wrapping — the mix IS mod 2^64
        if (v < out(i)) out(i) = v
        i += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }
}
