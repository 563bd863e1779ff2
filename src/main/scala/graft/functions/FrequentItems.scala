package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary for [[FrequentItemsAgg]]: at most
  * `capacity` counters; every item with true frequency > n/(capacity+1)
  * is guaranteed to hold a counter when eval runs. Counter values are
  * LOWER bounds of true counts (each decrement round subtracts uniformly).
  */
final class MGBuffer(val capacity: Int) {
  val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String): Unit = {
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1L)
      case None if counters.size < capacity => counters.update(item, 1L)
      case None =>
        // classical decrement round: every counter -1, drop zeros, the
        // arriving item is not inserted (its single occurrence cancels
        // against one unit of every tracked item)
        val dead = mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { k =>
          val v = counters(k) - 1L
          if (v <= 0L) dead += k else counters.update(k, v)
        }
        dead.foreach(counters.remove)
    }
  }

  /** Standard MG merge: add counts, then shrink back to capacity by
    * subtracting the (capacity+1)-th largest count from everything.
    */
  def mergeFrom(other: MGBuffer): Unit = {
    other.counters.foreach { case (k, v) =>
      counters.update(k, counters.getOrElse(k, 0L) + v)
    }
    if (counters.size > capacity) {
      val cut = counters.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      counters.keysIterator.foreach { k =>
        val v = counters(k) - cut
        if (v <= 0) dead += k else counters.update(k, v)
      }
      dead.foreach(counters.remove)
    }
  }
}

/** `frequent_items(item, capacity)` — Misra-Gries heavy hitters as a
  * TypedImperativeAggregate: O(capacity) state per group at ANY input
  * size, with the classical guarantee that every item of frequency
  * > n/(capacity+1) appears in the output. Output is
  * array<struct<item, min_count>> ranked (min_count desc, item asc);
  * counts are lower bounds.
  *
  * The scale story mirrors TopKByScore: partial aggregation caps every
  * mapper at `capacity` counters per group, the shuffle carries
  * O(groups × capacity), and the merge is the standard MG summary merge
  * (counts add, then uniform shrink) — this is the sketch to use when
  * "top tokens over 100 TB of text" must not shuffle the full vocabulary.
  * Oracled in x27 via the containment contract (the sketch's candidate
  * set must cover the exact heavy hitters).
  */
case class FrequentItemsAgg(
    itemExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("min_count", LongType))))
  override def prettyName: String = "frequent_items"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (capacity <= 0) TypeCheckResult.TypeCheckFailure(
      s"frequent_items requires capacity >= 1, got $capacity")
    else if (itemExpr.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"frequent_items expects a string item, got ${itemExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGBuffer, other: MGBuffer): MGBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MGBuffer): Any = {
    val ranked = buffer.counters.toSeq.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(ranked.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeInt(buffer.counters.size)
    buffer.counters.foreach { case (k, v) =>
      // explicit length + raw bytes, NOT writeUTF: writeUTF throws past
      // 64 KiB and a single unbroken >64 KiB token (base64 blob) would
      // kill the whole aggregation at shuffle time
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.counters.update(new String(kb, "UTF-8"), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItemsAgg =
    copy(itemExpr = newChildren(0))
}
