package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-K state for [[TopKByScore]]: a size-capped min-heap over
  * (score, id), ordered so the head is the weakest entry (lowest score;
  * among equal scores the largest id — ids ascend in the final ranking).
  * State is O(k) regardless of input size.
  */
final class TopKBuffer(val k: Int) {
  // (score desc, id asc) is the output ranking; heap keeps the inverse at
  // its head so push() evicts the weakest.
  private val ord: Ordering[(Double, Long)] = Ordering.fromLessThan { (a, b) =>
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
  }
  val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord)

  def push(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (ord.lt((score, id), heap.head)) { heap.dequeue(); heap.enqueue((score, id)) }
  }

  /** Entries ranked (score desc, id asc). */
  def sorted: Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (s, i) => (-s, i) }
}

/** `top_k_by(score, id, k)` — a TypedImperativeAggregate producing the
  * top-k (score, id) pairs per group as array<struct<score,id>> ranked
  * (score desc, id asc).
  *
  * This is the scale shape for grouped top-K (e.g. K nearest neighbors
  * per query vector): partial aggregation caps every mapper's output at
  * k rows per group, so the shuffle carries O(groups × k) instead of the
  * full candidate set, and no sort/window runs downstream. The
  * row_number-window formulation shuffles every candidate row.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "top_k_by"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(s"top_k_by requires k >= 1, got $k")
    } else (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by expects (double score, bigint id), got (${s.sql}, ${i.sql}) — cast explicitly")
    }
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buffer.push(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => buffer.push(s, i) }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val rows = buffer.sorted.map { case (s, i) => InternalRow(s, i) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buffer.heap.toSeq
    out.writeInt(buffer.k)
    out.writeInt(entries.size)
    entries.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.push(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
