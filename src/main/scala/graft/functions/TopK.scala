package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-`k`: the `k` best `(key, val)` rows per group by
  * `(val DESC, key ASC)`, as a mergeable Catalyst
  * `TypedImperativeAggregate` — the aggregate form of "top-k per
  * group".
  *
  * Why it exists: the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`)
  * shuffles EVERY input row to its group's reducer and sorts the whole
  * group before discarding all but k rows. This aggregate is
  * partial-aggregated map-side like any COUNT: each map partition
  * ships at most `k` entries per group (16 bytes each), the reducer
  * merges heaps, and no sort of the full group ever runs — at 100 TB
  * the exchange carries `k x partitions` rows per group instead of
  * `|group|`.
  *
  * Correctness under merge: selection (no arithmetic) commutes with
  * partitioning — top-k(A ∪ B) = top-k(top-k(A) ∪ top-k(B)) — so
  * partial heaps lose nothing the final answer needs. The total order
  * `(val DESC, key ASC)` makes the result deterministic under ties and
  * reproducible by ANSI-SQL window oracles.
  *
  * Keys and values are LONG (the high-cardinality entities this exists
  * for — user ids, doc ids, fingerprints — are integer ids at scale;
  * string heavy-hitter keys are [[HeavyHitters]]' regime). Null keys
  * and null values are skipped, matching aggregate-function null
  * semantics. Output: `array<struct<key long, val long>>` ordered best
  * first; `posexplode` turns position into the rank.
  */
case class GroupTopK(
    key: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, s"GroupTopK k must be positive, got $k")

  override def children: Seq[Expression] = Seq(key, value)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType), StructField("val", LongType))))

  override def prettyName: String = "graft_top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && value.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_k expects (bigint key, bigint val), got " +
        s"(${key.dataType.simpleString}, ${value.dataType.simpleString})")

  /** Heap ordering with the WORST retained entry at the head (the
    * eviction candidate): entry x ranks above y iff x has the smaller
    * val, or equal val and the larger key — the exact inverse of the
    * output order (val DESC, key ASC). Entries are (val, key). */
  private val worstFirst: Ordering[(Long, Long)] =
    new Ordering[(Long, Long)] {
      override def compare(x: (Long, Long), y: (Long, Long)): Int = {
        val c = java.lang.Long.compare(y._1, x._1) // smaller val = worse
        if (c != 0) c else java.lang.Long.compare(x._2, y._2) // larger key = worse
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def insert(buf: mutable.PriorityQueue[(Long, Long)],
      entry: (Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(entry)
    else if (worstFirst.compare(entry, buf.head) < 0) {
      // strictly better than the current worst — replace it; an EQUAL
      // entry (duplicate row) is a no-op either way
      buf.dequeue()
      buf.enqueue(entry)
    }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null)
      insert(buf, (vv.asInstanceOf[Long], kv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    // dequeueAll drains worst-first; reverse for best-first output
    val worstToBest = buf.clone().dequeueAll
    new GenericArrayData(worstToBest.reverseIterator.map {
      case (v, kk) => new GenericInternalRow(Array[Any](kk, v)): Any
    }.toArray)
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, kk) => out.writeLong(v); out.writeLong(kk) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val v = in.readLong(); val kk = in.readLong()
      buf.enqueue((v, kk))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GroupTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GroupTopK =
    copy(key = newChildren(0), value = newChildren(1))
}
