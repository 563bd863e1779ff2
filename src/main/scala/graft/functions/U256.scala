package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[U256Limbs]]; static forwarder object so
  * whole-stage codegen calls `graft.functions.U256Conv.limbs` directly.
  *
  * A Starknet uint256 is two 128-bit felt halves
  * (`/root/reference/generate_report_dag.py:88,102` parses the hex with
  * Python bigint `int(x, 16)`), so its decimal value spans up to 78
  * digits — past Spark's widest Decimal(38,0), which is why
  * [[HexToDecimal]] documents a ~2^126 saturation ceiling. The limb
  * representation lifts that ceiling: the value is decomposed into five
  * base-10^18 limbs (little-endian), each of which fits a long, and —
  * crucially for aggregation — each of which can be SUMMED as a
  * Decimal(38,0) across ~10^20 rows before overflow, with one carry
  * normalization at the very end. That keeps a 256-bit group-sum inside
  * whole-stage codegen: parse (this kernel) → five built-in decimal
  * sums → a pure-Column carry/render projection (`graft.functions
  * .u256_sum_dec` / `u256_render`).
  */
object U256Conv {
  /** 10^18 — limb base. (10^18-1)^2 < Long.MaxValue^2 and, as a
    * Decimal(38,0) partial sum, N·10^18 stays exact to N ~ 10^20 rows.
    */
  val Base: Long = 1000000000000000000L

  private val BigBase = BigInteger.valueOf(Base)

  /** Parse an optionally-`0x`-prefixed hex string of ≤ 64 digits (a
    * uint256) into five base-10^18 limbs, little-endian. Null for
    * null/empty/garbage/oversized input — same dirty-data contract as
    * [[HexConv.parse]] / `pad_address` (never corrupt-in-place).
    */
  def limbs(s: UTF8String): ArrayData = {
    if (s == null) return null
    var str = s.toString.trim
    if (str.startsWith("0x") || str.startsWith("0X")) str = str.substring(2)
    val n = str.length
    if (n == 0 || n > 64) return null
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      val ok = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      if (!ok) return null
      i += 1
    }
    var v = new BigInteger(str, 16)
    val out = new Array[Long](5)
    var j = 0
    while (j < 5) {
      val qr = v.divideAndRemainder(BigBase)
      out(j) = qr(1).longValueExact()
      v = qr(0)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Render five carry-normalized base-10^18 limbs (little-endian, each
    * < 10^18 except the raw top) to the exact decimal string — the fused
    * per-row companion of the Column-level `u256_render`: one pass over
    * long limbs with zero Decimal/BigInteger arithmetic. Null for a
    * malformed array (wrong arity).
    */
  def render(a: ArrayData): UTF8String = {
    if (a == null || a.numElements() != 5) return null
    val sb = new java.lang.StringBuilder(96)
    sb.append(a.getLong(4))
    var i = 3
    while (i >= 0) {
      val s = java.lang.Long.toString(a.getLong(i))
      var p = 18 - s.length
      while (p > 0) { sb.append('0'); p -= 1 }
      sb.append(s)
      i -= 1
    }
    var start = 0
    val last = sb.length - 1
    while (start < last && sb.charAt(start) == '0') start += 1
    UTF8String.fromString(sb.substring(start))
  }

  /** Same validation as [[limbs]], rendered straight to the exact decimal
    * string (canonical BigInteger base-10, no leading zeros, "0" for 0).
    */
  def decString(s: UTF8String): UTF8String = {
    if (s == null) return null
    var str = s.toString.trim
    if (str.startsWith("0x") || str.startsWith("0X")) str = str.substring(2)
    val n = str.length
    if (n == 0 || n > 64) return null
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      val ok = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      if (!ok) return null
      i += 1
    }
    UTF8String.fromString(new BigInteger(str, 16).toString)
  }
}

/** `u256_limbs(hexStr)` — uint256 hex → array<long> of five base-10^18
  * limbs (little-endian), the scale path past [[HexToDecimal]]'s
  * Decimal(38,0) ceiling (ROADMAP "uint256 ceiling").
  *
  * The limb decomposition is the whole trick: downstream SUM/render are
  * ordinary codegen'd decimal arithmetic (see [[U256Conv]]), so a
  * 256-bit column aggregates with map-side partials and no per-row
  * object churn beyond this parse.
  */
case class U256Limbs(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "u256_limbs"

  override def nullSafeEval(input: Any): Any =
    U256Conv.limbs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.U256Conv.limbs($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): U256Limbs =
    copy(child = newChild)
}

/** `u256_render_limbs(limbs)` — five carry-normalized base-10^18 limbs
  * (the [[U256Limbs]] output, little-endian) → exact decimal string, in
  * one fused codegen kernel.
  *
  * This exists because the alternative — five `element_at(u256_limbs(h),
  * i)` children feeding the Column-level carry/render — evaluates the
  * limb PARSE up to five times per row (subexpression elimination does
  * not reliably fuse across the array accesses) and runs ~10
  * Decimal(38,0) ops per row for a carry that normalized limbs don't
  * need (measured 2.5 s of q40's 4.9 s at sf0.1). Taking the array
  * keeps parse and render at exactly one evaluation each.
  */
case class U256RenderLimbs(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "u256_render_limbs"

  override def nullSafeEval(input: Any): Any =
    U256Conv.render(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.U256Conv.render($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): U256RenderLimbs =
    copy(child = newChild)
}

/** `u256_dec(hexStr)` — uint256 hex → exact decimal string (≤ 78
  * digits), one parse per row. The per-row companion of the limb path:
  * same parse/validation contract as [[U256Limbs]], rendering via
  * `BigInteger.toString` instead of limb assembly (single pass, no
  * intermediate array). Property-tested equal to
  * `u256_render(u256_limbs(x))` in U256Spec.
  */
case class U256DecString(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "u256_dec"

  override def nullSafeEval(input: Any): Any =
    U256Conv.decString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.U256Conv.decString($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): U256DecString =
    copy(child = newChild)
}
