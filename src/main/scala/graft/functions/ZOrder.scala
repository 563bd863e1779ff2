package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Runtime kernel for [[ZOrder2]]; static forwarder for codegen. */
object ZOrderKernels {
  /** Morton (Z-order) interleave of two non-negative 32-bit ints into a
    * 64-bit key: bit b of x lands at position 2b, bit b of y at 2b+1.
    * Classic magic-number bit spreading, O(1) per row.
    */
  def interleave2(x: Int, y: Int): Long =
    spread(x & 0xffffffffL) | (spread(y & 0xffffffffL) << 1)

  private def spread(vIn: Long): Long = {
    var v = vIn & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }
}

/** `zorder_key(x, y)` — Morton interleave of two int columns, the
  * multi-dimensional clustering key for data layout: sorting a table by
  * this key before write (`Ingest.appendSorted`) co-locates rows that
  * are close in BOTH dimensions, so min/max footer stats prune files for
  * range predicates on either column — the standard lakehouse Z-ORDER.
  * Pure integer bit math: the x28 oracle reproduces it bit-for-bit as a
  * generated 64-term SQL expression.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects (int, int), got (${l.sql}, ${r.sql}) — cast explicitly")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.interleave2(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderKernels.interleave2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}
