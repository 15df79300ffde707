package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin–Lang–Liberty, FOCS'16; Apache
  * DataSketches) as a Catalyst `TypedImperativeAggregate`: streaming
  * quantiles with a provable normalized-rank-error bound (~1.65% at
  * the default k=200, 99% confidence) in O(k·log n) space.
  *
  * Why next to `percentile_approx`: Spark's built-in GK variant
  * answers one query over one pass, but its state is not a
  * first-class object you can keep. The KLL buffer serializes to the
  * standard DataSketches byte layout — persist per-slice sketch blobs
  * (day/source/shard) and answer quantiles over ANY slice union later
  * by merging, the same incremental-index economics as the HLL / CMS
  * / theta members of the sketch family. Merges are rank-error-
  * preserving by construction (mergeability is the KLL paper's core
  * property).
  *
  * Output: `array<double>` — one value per requested quantile `qs`,
  * inclusive search criteria (the DataSketches default). Null inputs
  * are skipped; an empty group yields an empty array (downstream
  * filters on `size(...) > 0`, mirroring how Spark's
  * `percentile_approx` yields null).
  */
case class KllQuantiles(
    child: Expression,
    qs: Seq[Double],
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8, s"KLL k must be >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0,1], got $qs")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(DoubleType)

  override def prettyName: String = "graft_kll_quantiles"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"graft_kll_quantiles: non-numeric input $other")
    })
    buf
  }

  override def merge(buf: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(qs.map(q =>
      buf.getQuantile(q, QuantileSearchCriteria.INCLUSIVE): Any).toArray)

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapify returns a read-only view over compact bytes for some
    // layouts; merge into a fresh writable heap sketch so the buffer
    // stays updatable after deserialization
    val fresh = KllDoublesSketch.newHeapInstance(k)
    fresh.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    fresh
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren.head)
}
