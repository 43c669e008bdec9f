package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates beyond what Spark ships (SURVEY §7.6 "novel
  * sketch"): SpaceSaving heavy-hitters (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams", ICDT 2005).
  *
  * SpaceSaving keeps at most `capacity` counters. A seen item increments its
  * counter; an unseen item evicts the minimum counter and inherits its count
  * as overestimation error. Guarantees: every item with true frequency
  * > N/capacity is retained, counts overestimate by at most the recorded
  * `err`, and — the property the oracle checks — when the number of
  * distinct items never exceeds `capacity`, nothing is evicted and every
  * count is EXACT with err = 0.
  *
  * Scale shape: each partition builds one bounded map (update is O(1)
  * amortized via a hash map; eviction scans for the min, amortized fine at
  * capacity ≤ ~64k), partial buffers are merged pairwise on the reduce side
  * (counts and errors add; overflow trims back to capacity keeping the
  * largest counts). Memory is O(capacity) per partition regardless of
  * input size — the reason to use it over an exact GROUP BY at 100 TB is
  * exactly that the shuffle carries `capacity` rows per partition, not one
  * row per distinct key.
  */
object SketchAggs {

  private type SSMap = mutable.HashMap[String, (Long, Long)] // item -> (count, err)

  /** SpaceSaving top-k sketch over a string column. Returns the retained
    * (item, cnt, err) entries sorted by (cnt desc, item asc); callers
    * explode and LIMIT for the final top-k. */
  case class SpaceSavingTopK(
      child: Expression,
      capacity: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[SSMap] {
    require(capacity > 0, s"capacity must be positive: $capacity")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", StringType),
      StructField("cnt", LongType),
      StructField("err", LongType))))

    override def createAggregationBuffer(): SSMap = mutable.HashMap.empty

    override def update(buf: SSMap, input: InternalRow): SSMap = {
      val v = child.eval(input)
      if (v != null) add(buf, v.toString, 1L, 0L)
      buf
    }

    private def add(buf: SSMap, item: String, cnt: Long, err: Long): Unit =
      buf.get(item) match {
        case Some((c, e)) => buf.update(item, (c + cnt, e + err))
        case None if buf.size < capacity => buf.update(item, (cnt, err))
        case None =>
          // evict the min counter; the newcomer inherits its count as error
          val (mItem, (mCnt, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
          buf.remove(mItem)
          buf.update(item, (mCnt + cnt, mCnt + err))
      }

    override def merge(buf: SSMap, other: SSMap): SSMap = {
      other.foreach { case (item, (c, e)) =>
        buf.get(item) match {
          case Some((c0, e0)) => buf.update(item, (c0 + c, e0 + e))
          case None => buf.update(item, (c, e))
        }
      }
      if (buf.size > capacity) {
        // keep the `capacity` largest counts (deterministic tie-break on item)
        val keep = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
        buf.clear()
        keep.foreach { case (i, ce) => buf.update(i, ce) }
      }
      buf
    }

    override def eval(buf: SSMap): Any = {
      val sorted = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }
      new GenericArrayData(sorted.map { case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
      }.toArray[Any])
    }

    override def serialize(buf: SSMap): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (i, (c, e)) =>
        out.writeUTF(i); out.writeLong(c); out.writeLong(e)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): SSMap = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val m: SSMap = mutable.HashMap.empty
      var i = 0
      while (i < n) { m.update(in.readUTF(), (in.readLong(), in.readLong())); i += 1 }
      m
    }

    override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): SpaceSavingTopK = copy(child = c.head)
    override def prettyName: String = "topk_freq"
  }

  /** Column API: `topkFreq($"item", 1024)` → array<struct<item,cnt,err>>. */
  def topkFreq(col: Column, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(col), capacity)
        .toAggregateExpression())
}
