package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Runtime kernels for [[CosineSimilarityExpr]] — static-forwarder object
  * so generated code calls `graft.functions.VectorKernels.cosine(...)`
  * directly (no boxing beyond the ArrayData handles, no intermediate
  * array allocation, accumulation in array order for determinism).
  */
object VectorKernels {
  /** Null on length mismatch or any null element — matching what the
    * composed-builtin form yields (zip_with null-pads, aggregate
    * null-propagates), so the two stay interchangeable on dirty data.
    */
  def cosineFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** `cosine_sim(a, b)` over Array[Float]/Array[Double] columns — native
  * Catalyst expression with codegen.
  *
  * Rationale (SURVEY §7.3 preference order): the built-in composition
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is correct but materializes
  * a zipped intermediate array per row pair — at ANN scale (corpus ×
  * queries candidate pairs) that allocation dominates. This expression
  * reads both ArrayData buffers in one fused loop (dot + both norms),
  * allocation-free. Accumulation order matches the built-in form, so
  * results are bit-identical.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullIntolerant: Boolean = true

  private lazy val isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects two array<float> or two array<double> columns, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (isFloat) VectorKernels.cosineFloat(x, y) else VectorKernels.cosineDouble(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (isFloat) "cosineFloat" else "cosineDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosTmp")
      s"""
      java.lang.Double $tmp = graft.functions.VectorKernels.$kernel($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}
