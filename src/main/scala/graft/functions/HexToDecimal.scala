package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[HexToDecimal]]; a plain object so whole-stage
  * codegen can call the static forwarder `graft.functions.HexConv.parse`.
  */
object HexConv {
  /** 10^38 - 1: max magnitude representable by DecimalType(38,0). */
  private val Max = new BigInteger("9".repeat(38))

  /** Parse an optionally-`0x`-prefixed hex string to an unscaled Decimal.
    * Returns null for null/empty/garbage input or magnitude > 10^38-1
    * (documented saturation→null; uint256 values past ~2^126 cannot fit
    * in Spark's widest decimal).
    */
  def parse(s: UTF8String): Decimal = {
    if (s == null) return null
    var str = s.toString.trim
    if (str.startsWith("0x") || str.startsWith("0X")) str = str.substring(2)
    val n = str.length
    if (n == 0) return null
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      val ok = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      if (!ok) return null
      i += 1
    }
    val bi = new BigInteger(str, 16)
    if (bi.compareTo(Max) > 0) null
    else Decimal(new java.math.BigDecimal(bi), DecimalType.MAX_PRECISION, 0)
  }
}

/** `hex_to_decimal(hexStr)` — arbitrary-precision hex → DecimalType(38,0).
  *
  * The reference converts uint256 swap amounts with Python's bigint
  * `int(x, 16)` (`/root/reference/generate_report_dag.py:88,102`). Spark's
  * built-in `conv(s, 16, 10)` saturates at 64 bits, so this is the one
  * genuinely custom Catalyst expression parity requires (SURVEY §7.3):
  * codegen-friendly, null-intolerant, null on malformed input.
  */
case class HexToDecimal(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType]; AbstractDataType itself is
  // private[sql] in Spark 4 so it cannot be named here.
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DecimalType(DecimalType.MAX_PRECISION, 0)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hex_to_decimal"

  override def nullSafeEval(input: Any): Any =
    HexConv.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HexConv.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): HexToDecimal =
    copy(child = newChild)
}
