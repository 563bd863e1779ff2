package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** `kll_sketch_agg(value, k)` — a KLL quantile sketch over a double
  * column as a TypedImperativeAggregate, serialized to BINARY: the
  * quantile member of the re-aggregatable-partial family (HLL for
  * distincts is Spark-native; Misra-Gries for heavy hitters is
  * [[FrequentItemsAgg]]). State is O(k·log(n/k)) per group at any input
  * size (~2–3 KB at the k=200 default), partials combine map-side, and
  * the stored bytes re-merge later via [[KllMergeAgg]] — what a daily
  * rollup TABLE stores so percentile questions never re-scan raw data.
  *
  * KLL's rank guarantee at k=200 is ~1.65% (99% confidence, Karnin/
  * Lang/Liberty 2016), but its compaction draws real randomness — so,
  * like the HLL estimate, the sketch output is NOT run-deterministic
  * and must be consumed through an error contract (exact value rides
  * along, a flag asserts the estimate landed inside a generous rank
  * window), never emitted raw into a hash-compared result.
  */
case class KllSketchAgg(
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 8) TypeCheckResult.TypeCheckFailure(s"kll_sketch_agg needs k >= 8, got $k")
    else if (valueExpr.dataType != DoubleType) TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg expects a double value, got ${valueExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = valueExpr.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapified compact images are read-only; merge into a writable one
    val w = KllDoublesSketch.newHeapInstance(k)
    w.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    w
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(valueExpr = newChildren(0))
}

/** `kll_merge_agg(sketch_bytes, k)` — second-level union of serialized
  * [[KllSketchAgg]] partials: the rollup-table read path. Rank
  * guarantees survive arbitrary re-merging (KLL is a mergeable
  * summary), which is the whole point of storing partials.
  */
case class KllMergeAgg(
    sketchExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(sketchExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 8) TypeCheckResult.TypeCheckFailure(s"kll_merge_agg needs k >= 8, got $k")
    else if (sketchExpr.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg expects serialized sketch bytes, got ${sketchExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = sketchExpr.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val w = KllDoublesSketch.newHeapInstance(k)
    w.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    w
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(sketchExpr = newChildren(0))
}

/** `kll_quantile(sketch_bytes, rank)` — quantile-value probe of a
  * serialized KLL sketch (inclusive search criterion). Eval-only
  * (CodegenFallback): it runs on rollup-table rows — O(types × days),
  * never per corpus row — so codegen would buy nothing.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"kll_quantile expects sketch bytes, got ${left.dataType.sql}")
    else if (right.dataType != DoubleType) TypeCheckResult.TypeCheckFailure(
      s"kll_quantile expects a double rank, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(sketch: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(rank.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
