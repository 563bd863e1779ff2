package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Runtime kernel for [[PqCodesExpr]] — static object so generated code
  * calls it directly (the [[VectorKernels]] pattern): all `m` subspace
  * codes of one vector in a single fused pass over the ArrayData buffer,
  * no intermediate arrays, no boxing beyond the output.
  */
object PqKernels {
  /** Per subspace j: the code of the L2-nearest codeword to the j-th
    * subvector. Arithmetic is the bit-exact twin of the SQL form the
    * x38 oracle replays: x widens float→double exactly, squared
    * differences accumulate LEFT-TO-RIGHT in double from 0.0, and a
    * strict `<` keeps the FIRST (smallest-code) minimum on ties. A null
    * element nulls ONLY its own subspace's code (the zip_with form
    * null-poisons every d2 of that subspace, not the others); an empty
    * codebook for a subspace also yields null.
    */
  def encode(v: ArrayData, cws: Array[Array[Array[Double]]], subDim: Int,
      isFloat: Boolean): ArrayData = {
    val m = cws.length
    // named guard (round-11 ADVICE): a short vector used to surface as a
    // raw ArrayIndexOutOfBoundsException from generated code, and a long
    // one silently dropped its trailing dims — both are caller bugs
    // (vector dim must equal m*subDim exactly), so fail with the dims
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_codes: vector has ${v.numElements()} dims, codebook expects " +
          s"m*subDim = $m*$subDim = ${m * subDim}")
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val ks = cws(j)
      var nullSeen = false
      var i = 0
      while (i < subDim && !nullSeen) {
        if (v.isNullAt(j * subDim + i)) nullSeen = true
        i += 1
      }
      if (nullSeen || ks.length == 0) out(j) = null
      else {
        var best = 0
        var bestD = Double.PositiveInfinity
        var k = 0
        while (k < ks.length) {
          val cw = ks(k)
          var d = 0.0
          var p = 0
          while (p < subDim) {
            val x =
              if (isFloat) v.getFloat(j * subDim + p).toDouble
              else v.getDouble(j * subDim + p)
            val diff = x - cw(p)
            d += diff * diff
            p += 1
          }
          if (d < bestD) { bestD = d; best = k }
          k += 1
        }
        out(j) = best.toLong
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codebook wrapper with STRUCTURAL equality (round-11 ADVICE): a bare
  * `Array[Array[Array[Double]]]` case-class field compares by reference,
  * so two pq_codes expressions built from separate collects of the same
  * codebook were never `semanticEquals` — invisible to canonicalization
  * and to [[graft.plans.ExtractExpensiveSubexpressions]]' CSE. Deep
  * equals/hashCode make expression equality well-defined.
  */
final class PqCodebook(val cws: Array[Array[Array[Double]]])
    extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case p: PqCodebook => java.util.Arrays.deepEquals(
      cws.asInstanceOf[Array[AnyRef]], p.cws.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    java.util.Arrays.deepHashCode(cws.asInstanceOf[Array[AnyRef]])
  override def toString: String =
    s"PqCodebook(m=${cws.length}, k=${cws.headOption.map(_.length).getOrElse(0)})"
}

/** `pq_codes(embedding)` with the codebooks bound as a reference object —
  * the codegen form of PQ encoding (SURVEY §7.3 preference order: native
  * Expression over interpreted higher-order lambdas in hot paths). The
  * lambda composition evaluates ~k·m interpreted aggregate/zip_with
  * closures per row; this expression is one fused loop. Registered in
  * [[graft.plans.ExtractExpensiveSubexpressions]] so the per-code
  * `element_at` projections share ONE evaluation per row even after
  * CollapseProject inlines them.
  */
case class PqCodesExpr(child: Expression, codebook: PqCodebook,
    subDim: Int) extends UnaryExpression {

  private def cws: Array[Array[Array[Double]]] = codebook.cws

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "pq_codes"
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes expects array<float> or array<double>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], cws, subDim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cwsRef = ctx.addReferenceObj("pqCws", cws, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernels.encode($v, $cwsRef, $subDim, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
}
