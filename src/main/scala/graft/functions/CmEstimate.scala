package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[CmEstimate]]; static forwarder so whole-stage
  * codegen calls `graft.functions.CmKernels.estimate` directly.
  *
  * The probe pattern is a small top-K frame cross-joined with ONE
  * broadcast serialized sketch, so every row of a task carries the same
  * sketch bytes; a per-thread last-deserialized cache turns
  * deserialization into once-per-task. Content equality (not reference)
  * because unsafe-row reads may copy the byte array per row.
  */
object CmKernels {
  // SoftReference so the GC can reclaim the last sketch (serialized bytes
  // + ~1MB deserialized table at tight eps) once the query is done —
  // pooled executor threads outlive any one query, so a hard ThreadLocal
  // would pin the pair for the JVM lifetime.
  private val cache = new ThreadLocal[
    java.lang.ref.SoftReference[(Array[Byte], org.apache.spark.util.sketch.CountMinSketch)]]

  def estimate(bytes: Array[Byte], term: UTF8String): Long = {
    val ref = cache.get()
    var c = if (ref == null) null else ref.get()
    if (c == null || !java.util.Arrays.equals(c._1, bytes)) {
      val sk = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      c = (bytes, sk)
      cache.set(new java.lang.ref.SoftReference(c))
    }
    // String probe: CountMinSketchImpl hashes a String via its UTF-8
    // bytes — the same path count_min_sketch's aggregate used to add
    // StringType values, so probe and build see identical hashes.
    c._2.estimateCount(term.toString)
  }
}

/** `cm_estimate(sketch_bytes, term)` — point-frequency probe of a
  * serialized Count-Min sketch inside the plan, so sketch queries stay
  * pure dataflow (build the sketch as a 1-row aggregate, broadcast it,
  * probe per row) instead of collecting sketch bytes to the driver.
  */
case class CmEstimate(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cm_estimate"

  override def nullSafeEval(sketch: Any, term: Any): Any =
    CmKernels.estimate(sketch.asInstanceOf[Array[Byte]], term.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, t) => s"graft.functions.CmKernels.estimate($sk, $t)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmEstimate =
    copy(left = newLeft, right = newRight)
}
