package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[NfcNormalize]] — static forwarder so whole-stage
  * codegen calls it directly. `java.text.Normalizer` is stateless and
  * thread-safe, so no per-thread instance is needed; the fast-path check
  * (`isNormalized`) skips the rewrite for already-composed text, which
  * is the overwhelmingly common case in a real corpus (ASCII and
  * NFC-composed UTF-8 pass it in one scan without allocating).
  */
object NfcKernels {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(str)` — Unicode canonical composition (NFC), the
  * standard first pass of corpus text cleaning: the same user-visible
  * text can arrive byte-different (e.g. `e` + U+0301 COMBINING ACUTE vs
  * precomposed `é`), which silently defeats exact/dedup hashing and
  * inflates token counts. Normalizing to NFC before fingerprinting
  * makes canonically-equivalent strings byte-identical.
  *
  * Spark has no builtin for this; a native codegen expression keeps the
  * pass inside whole-stage codegen (the preferred extension path —
  * cheaper than a UDF by the serialization round-trip, and the
  * `isNormalized` fast path makes the common ASCII case allocation-free
  * beyond the toString bridge). DuckDB's `nfc_normalize` implements the
  * identical Unicode canonical composition, which makes the operator
  * oracle-comparable byte-for-byte.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
