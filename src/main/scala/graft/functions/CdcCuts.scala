package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[CdcCuts]]; static forwarder for codegen. */
object CdcKernels {

  // 256-entry gear table (FastCDC / Xia et al. FAST'16): one table load +
  // shift + add per position. Seeds are code, not data — every executor
  // and every run agree.
  private val gear: Array[Long] =
    Array.tabulate(256)(i => graft.functions.splitmix64(0x51ca4cdcL + i))

  /** Gear-hash content-defined cut positions (1-based codepoint
    * positions; a cut lands AFTER the position). The hash is a pure
    * rolling function of the last ~64 codepoints (`h = (h << 1) +
    * gear[cp & 0xFF]` — older codepoints shift out), so cut positions
    * are a function of local CONTENT: two documents sharing a suffix
    * emit identical cuts once past the divergence point's 64-codepoint
    * horizon and one shared cut (`minChunk` suppression re-synchronizes
    * there). A boundary fires when the low `maskBits` of the hash are
    * zero — expected chunk length 2^maskBits + minChunk. No cut at the
    * final position (the last chunk already ends there); `minChunk`
    * suppresses pathological runs of near-empty chunks exactly as
    * FastCDC's minimum-size rule does.
    */
  def gearCuts(s: UTF8String, mask: Long, minChunk: Int): ArrayData = {
    val str = s.toString
    val total = str.codePointCount(0, str.length)
    val out = new java.util.ArrayList[AnyRef]()
    var h = 0L
    var pos = 0
    var lastCut = 0
    var ci = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      ci += Character.charCount(cp)
      pos += 1
      h = (h << 1) + gear(cp & 0xFF)
      if (pos - lastCut >= minChunk && pos < total && (h & mask) == 0L) {
        out.add(java.lang.Long.valueOf(pos.toLong))
        lastCut = pos
      }
    }
    new GenericArrayData(out.toArray())
  }
}

/** `cdc_cuts(text)` — gear-hash content-defined chunk boundaries as a
  * native codegen expression: O(1) per position (table load + shift +
  * add + mask test), where the oracle-portable windowed-md5 formulation
  * ([[graft.ext.TextDedup.cdcChunks]]) pays a full md5 of the window at
  * EVERY position. Same dual-path pattern as MinHash's
  * portable-md5 / xxhash64 split: the md5 form is what DuckDB can
  * replay bit-for-bit, this is what production runs at 100 TB. Both are
  * content-defined — boundaries move with the content, so shifted
  * copies still share downstream chunks (CdcSpec proves it for each).
  */
case class CdcCuts(child: Expression, maskBits: Int, minChunk: Int)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(maskBits > 0 && maskBits < 63, "maskBits must be in (0, 63)")
  require(minChunk >= 1, "minChunk must be >= 1")

  private val mask: Long = (1L << maskBits) - 1

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_cuts"

  override def nullSafeEval(input: Any): Any =
    CdcKernels.gearCuts(input.asInstanceOf[UTF8String], mask, minChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcKernels.gearCuts($c, ${mask}L, $minChunk)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}
