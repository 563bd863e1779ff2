package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[DedupTokens]] — static forwarder so whole-stage
  * codegen calls it directly. One pass over the UTF-8 bytes: tokens
  * split on single spaces, first occurrence kept in order via a hash
  * set, empty tokens dropped (the x107 contract). Works on the raw
  * UTF8String slices — no decode to java.lang.String, no regex, no
  * intermediate array — so per-row cost is O(bytes) with a set probe
  * per token, vs the composed array form's O(tokens²) array_position
  * scans (equality property-pinned in FunctionsSpec).
  */
object DedupTokensKernel {
  def dedup(s: UTF8String): UTF8String = {
    // byte-level split is safe: 0x20 never occurs inside a multi-byte
    // UTF-8 sequence, so byte slices between spaces are valid UTF-8
    val bytes = s.getBytes
    val n = bytes.length
    val seen = new java.util.HashSet[UTF8String]()
    val out = new Array[Byte](n)
    var outLen = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start) { // non-empty token
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          if (seen.add(tok)) {
            if (outLen > 0) { out(outLen) = ' '.toByte; outLen += 1 }
            System.arraycopy(bytes, start, out, outLen, i - start)
            outLen += i - start
          }
        }
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, outLen))
  }
}

/** `dedup_tokens(str)` — within-string repeated-token removal keeping
  * first-occurrence order: the x107 intra-doc cleaning pass as a native
  * one-pass codegen expression. The composed-builtin twin
  * (split → indexed filter on array_position → array_join) is the
  * oracle-expressible form x107 registers; this kernel is the
  * giant-document scale path its docs promise — O(len) with a hash-set
  * probe per token instead of O(tokens²) array scans, and no per-row
  * array materialization.
  */
case class DedupTokens(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dedup_tokens"

  override def nullSafeEval(input: Any): Any =
    DedupTokensKernel.dedup(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DedupTokensKernel.dedup($c)")

  override protected def withNewChildInternal(newChild: Expression): DedupTokens =
    copy(child = newChild)
}
