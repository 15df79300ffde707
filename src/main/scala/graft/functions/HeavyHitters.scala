package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters: approximate top frequencies in ONE pass
  * with a fixed `capacity`-entry summary, as a Catalyst
  * `TypedImperativeAggregate` — partial-aggregated map-side, merged on
  * the reducer like any built-in aggregate.
  *
  * Why it exists: exact top-k over a key column costs a full
  * `groupBy(key).count()` shuffle of every distinct key. At 100 TB the
  * word dictionary may not be a problem, but user-ids / URLs / doc
  * fingerprints are; this summary ships `capacity` entries per map
  * partition regardless of cardinality.
  *
  * Guarantees (standard MG bounds, preserved under merge): any item
  * with true frequency > n/(capacity+1) is present in the summary, and
  * each reported count is an underestimate by at most n/(capacity+1).
  * When the number of distinct items never exceeds `capacity`, no
  * decrements happen and every count is EXACT — the oracle-checked
  * query runs in that regime; the eviction regime is spec-tested
  * against the guarantee.
  *
  * Output: `array<struct<word string, cnt long>>` ordered
  * (cnt DESC, word ASC).
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0)

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("cnt", LongType))))

  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def decrementAll(buf: mutable.HashMap[UTF8String, Long],
      by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buf.mapValuesInPlace((_, c) => c - by)
    buf.foreach { case (k, c) => if (c <= 0) dead += k }
    dead.foreach(buf.remove)
  }

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity =>
          buf.update(key.clone(), 1L) // clone: input strings may be reused buffers
        case None => decrementAll(buf, 1L)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything —
      // the merge-preserving MG reduction (Agarwal et al., "Mergeable
      // Summaries", PODS'12)
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      decrementAll(buf, d)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (w, c) => (-c, w) }
    new GenericArrayData(sorted.map { case (w, c) =>
      new GenericInternalRow(Array[Any](w, c)): Any
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}
