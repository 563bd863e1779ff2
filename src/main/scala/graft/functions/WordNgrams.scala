package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[WordNgrams]]; static forwarder for codegen. */
object NgramKernels {
  /** Word n-grams of `s` split on single spaces, in order, joined by a
    * space; `distinct` keeps first occurrences only. Splitting keeps
    * empty tokens (leading/trailing/double spaces) — exactly
    * `split(text, " ", -1)` — so results are bit-compatible with the
    * composed-builtin form and with DuckDB's `string_split(text, ' ')`.
    */
  def ngrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val str = s.toString
    val words = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    val len = str.length
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        words.add(str.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = words.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](m - n + 1)
    val seen = if (distinct) new java.util.HashSet[String]() else null
    var j = 0
    while (j <= m - n) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.get(j + k))
        k += 1
      }
      val g = sb.toString
      if (seen == null || seen.add(g)) out.add(UTF8String.fromString(g))
      j += 1
    }
    new GenericArrayData(out.toArray())
  }

  /** Overlapping character n-grams by Unicode codepoint — see
    * [[CharNgrams]]. One forward pass records every codepoint's byte
    * offset, then each gram is a zero-copy byte-range view — O(m·n)
    * total. (A substringSQL-per-position loop is O(m²): every call
    * rescans the variable-width bytes from offset 0 to find codepoint i
    * — round-4 review finding.)
    */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val offs = new Array[Int](len + 1)
    var i = 0
    var m = 0
    while (i < len) {
      offs(m) = i
      m += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(m) = len
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](m - n + 1)
    var j = 0
    while (j <= m - n) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_ngrams(text)` as a native codegen expression — one pass per row.
  *
  * Rationale (round-2 profiling): the composed-builtin form
  * `transform(sequence(0, size(words)-n), i -> concat_ws(' ',
  * slice(words, i+1, n)))` is a higher-order expression chain Spark
  * evaluates interpreted (no whole-stage codegen for lambda functions),
  * re-evaluating the `split` subtree per element — measured 2.7 s just
  * to explode 260 k shingles at sf0.1. This kernel is O(len) per row
  * inside codegen; the shingle stage feeds every MinHash/Jaccard query,
  * so it sits on the dedup hot path. Property-tested against the
  * composed form (FunctionsSpec).
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(n > 0, "n must be positive")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (distinct) "word_shingles" else "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    NgramKernels.ngrams(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramKernels.ngrams($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `char_ngrams(text, n)` — all overlapping character n-grams, in order,
  * WITH duplicates (profile training and scoring need multiplicities).
  *
  * Positions are Unicode codepoints via `UTF8String.substringSQL`, so a
  * CJK character counts as one position — bit-compatible with
  * `substr(text, i, n)` in Spark SQL and DuckDB (both codepoint-based).
  * Empty array when the text has fewer than `n` codepoints. Same
  * codegen rationale as [[WordNgrams]]: the composed
  * `transform(sequence(...), i -> substring(...))` form is an
  * interpreted higher-order chain.
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(n > 0, "n must be positive")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    NgramKernels.charNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramKernels.charNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}
