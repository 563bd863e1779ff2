package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Runtime kernel for [[Md5Prefix60]]; static forwarder object so
  * whole-stage codegen calls `graft.functions.Md5Kernels.prefix60`
  * directly. One MessageDigest instance per thread (digest objects are
  * stateful and not thread-safe; allocation per row would dominate).
  */
object Md5Kernels {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5 digest of `bytes` on the thread-local instance. */
  def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = md5.get()
    md.reset()
    md.digest(bytes)
  }

  /** First 60 bits of a digest as a non-negative long — equal to parsing
    * its first 15 hex chars: the top 7.5 bytes = (first 8 bytes
    * big-endian) >>> 4.
    */
  def prefix60OfDigest(d: Array[Byte]): Long = {
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  /** Hex chars [8i, 8i+8) of a digest as an unsigned 32-bit value =
    * big-endian word i (bytes 4i..4i+3).
    */
  def word32OfDigest(d: Array[Byte], i: Int): Long =
    ((d(4 * i) & 0xffL) << 24) | ((d(4 * i + 1) & 0xffL) << 16) |
    ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL)

  /** First 60 bits of md5(bytes) as a non-negative long — bit-identical
    * to `('0x' || substr(md5(x), 1, 15))::BIGINT` (DuckDB) and to
    * `conv(substring(md5(x), 1, 15), 16, 10)` (Spark built-ins).
    */
  def prefix60(bytes: Array[Byte]): Long = prefix60OfDigest(digest(bytes))
}

/** `md5_prefix60(bytes)` — the engine-portable 60-bit content hash as a
  * native codegen expression.
  *
  * Same value as the composed-builtin form
  * `conv(substring(md5(x), 1, 15), 16, 10).cast(long)` (property-tested
  * against it in FunctionsSpec), but without materializing the 32-char
  * hex string and re-parsing it through conv's string radix conversion —
  * the portable MinHash/SimHash family calls this once per shingle/word,
  * so it sits on the hot path of every dedup query.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any =
    Md5Kernels.prefix60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Kernels.prefix60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}
