package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group state for [[MmrSelect]]: the top-`shortlist`
  * candidates by (rel desc, id asc) with their vectors — the knnBrute
  * shortlist semantics, maintained map-side so partial aggregation caps
  * every mapper at O(shortlist) entries per group and the shuffle never
  * carries the full scored candidate set.
  */
final class MmrBuffer(val shortlist: Int) {
  val entries = new ArrayBuffer[(Long, Double, Array[Float])]()

  private def rank(): Unit = {
    // distinctBy AFTER the (rel desc, id asc, vec-hash asc) sort keeps
    // the highest-rel entry per id: a caller feeding the same id twice
    // (e.g. candidates unioned from two lists) must not inflate the
    // greedy loop's candidate count — duplicate survivors made
    // eval's argmax run out of fresh ids and NPE (round-11 ADVICE).
    // The trailing vec-hash key pins the DEGENERATE same-id-same-rel-
    // different-vector case: without it, distinctBy kept whichever
    // entry arrived first, and arrival order here depends on which
    // partition's partial buffer merges first — the kept VECTOR (which
    // feeds the diversity term) was nondeterministic across runs (the
    // weightedSampleStream full-row-hash rule, applied to the buffer)
    val s = entries.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && (a._1 < b._1 ||
        (a._1 == b._1 && vecCompare(a._3, b._3) < 0)))
    }.distinctBy(_._1)
    entries.clear(); entries ++= s.take(shortlist)
  }

  // deterministic total order over vectors: length-first, then
  // lexicographic on raw float bits (exact, no float-compare pitfalls).
  // Allocation-free element-wise compare (round-11 ADVICE): the prior
  // form built an O(dim) hex string on EVERY tie comparison inside the
  // sort — unsigned-int bit compare yields the identical order (the hex
  // strings were zero-padded, i.e. an unsigned lexicographic encoding)
  // without the string churn.
  private def vecCompare(a: Array[Float], b: Array[Float]): Int = {
    if (a.length != b.length) return Integer.compare(a.length, b.length)
    var i = 0
    while (i < a.length) {
      val c = java.lang.Integer.compareUnsigned(
        java.lang.Float.floatToIntBits(a(i)), java.lang.Float.floatToIntBits(b(i)))
      if (c != 0) return c
      i += 1
    }
    0
  }

  def push(id: Long, rel: Double, vec: Array[Float]): Unit = {
    entries += ((id, rel, vec))
    if (entries.size > shortlist) rank()
  }

  /** Shortlist ranked (rel desc, id asc). */
  def sorted: Seq[(Long, Double, Array[Float])] = { rank(); entries.toSeq }
}

/** `mmr_select(id, rel, vec, shortlist, k, lambda)` — shortlisting AND
  * greedy maximal-marginal-relevance selection fused into ONE
  * TypedImperativeAggregate: feed it every scored candidate row; each
  * mapper keeps only its local top-`shortlist` by relevance, merge
  * re-trims, and finalize runs the greedy (step t maximizes
  * λ·rel − (1−λ)·max sim-to-selected, ties by id) over the ≤ shortlist
  * survivors. One shuffle of O(groups × shortlist) rows and ONE stage
  * regardless of k — the unrolled-window form
  * ([[graft.ext.Similarity.mmrRerank]]) costs k−1 serial bounded jobs.
  *
  * Determinism: pair sims in finalize run the exact float→double
  * left-associated fold of [[VectorKernels.cosineFloat]], so the
  * selection is row-identical to the unrolled form (MmrSpec pins it).
  */
case class MmrSelect(
    idExpr: Expression,
    relExpr: Expression,
    vecExpr: Expression,
    shortlist: Int,
    k: Int,
    lambda: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MmrBuffer] {

  override def children: Seq[Expression] = Seq(idExpr, relExpr, vecExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType), StructField("id", LongType))))
  override def prettyName: String = "mmr_select"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (k <= 0 || shortlist < k) {
      TypeCheckResult.TypeCheckFailure(
        s"mmr_select requires shortlist >= k >= 1, got ($shortlist, $k)")
    } else (idExpr.dataType, relExpr.dataType, vecExpr.dataType) match {
      case (LongType, DoubleType, ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (i, r, v) => TypeCheckResult.TypeCheckFailure(
        s"mmr_select expects (bigint id, double rel, array<float> vec), " +
          s"got (${i.sql}, ${r.sql}, ${v.sql}) — cast explicitly")
    }
  }

  override def createAggregationBuffer(): MmrBuffer = new MmrBuffer(shortlist)

  override def update(buffer: MmrBuffer, input: InternalRow): MmrBuffer = {
    val id = idExpr.eval(input)
    val rel = relExpr.eval(input)
    val vec = vecExpr.eval(input)
    if (id != null && rel != null && vec != null) {
      buffer.push(id.asInstanceOf[Long], rel.asInstanceOf[Double],
        vec.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray())
    }
    buffer
  }

  override def merge(buffer: MmrBuffer, other: MmrBuffer): MmrBuffer = {
    other.entries.foreach { case (i, r, v) => buffer.push(i, r, v) }
    buffer
  }

  // the exact arithmetic of VectorKernels.cosineFloat on plain arrays
  private def cosF(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def eval(buffer: MmrBuffer): Any = {
    val cands = buffer.sorted
    val selected = ArrayBuffer[(Long, Double, Array[Float])]()
    if (cands.nonEmpty) {
      selected += cands.head // argmax rel, ties already id-ascending
      var done = false
      while (!done && selected.size < math.min(k, cands.size)) {
        var best: (Long, Double) = null
        cands.foreach { case c @ (id, rel, vec) =>
          if (!selected.exists(_._1 == id)) {
            var ms = Double.NegativeInfinity
            selected.foreach { s =>
              val sim = cosF(vec, s._3); if (sim > ms) ms = sim
            }
            val score = lambda * rel - (1 - lambda) * ms
            if (best == null || score > best._2 ||
                (score == best._2 && id < best._1)) best = (id, score)
          }
        }
        // defense in depth: cands are id-distinct (rank()), so a pass
        // without a fresh id cannot happen — but a null argmax must end
        // the greedy, never dereference (round-11 ADVICE NPE)
        if (best == null) done = true
        else selected += cands.find(_._1 == best._1).get
      }
    }
    new GenericArrayData(selected.zipWithIndex.map { case ((id, _, _), i) =>
      InternalRow(i + 1, id)
    }.toArray[Any])
  }

  override def serialize(buffer: MmrBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.shortlist)
    out.writeInt(buffer.entries.size)
    buffer.entries.foreach { case (id, rel, vec) =>
      out.writeLong(id); out.writeDouble(rel)
      out.writeInt(vec.length); vec.foreach(out.writeFloat)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MmrBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MmrBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) {
      val id = in.readLong(); val rel = in.readDouble()
      val dim = in.readInt()
      val vec = Array.fill(dim)(in.readFloat())
      buf.push(id, rel, vec)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MmrSelect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MmrSelect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MmrSelect =
    copy(idExpr = newChildren(0), relExpr = newChildren(1),
      vecExpr = newChildren(2))
}
