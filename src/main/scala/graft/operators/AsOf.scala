package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (backward) join — for each left row, attach the most recent
  * right row with `rightTs <= leftTs` within the same key. Spark has no
  * native as-of join; per the preference order (SURVEY §7.3 / spark
  * guide) this composes built-ins before reaching for a custom
  * `SparkPlan`:
  *
  * union both sides tagged → one hash partition by key + per-partition
  * sort by (ts, side, tieBreak) → running `last(right_payload, ignoreNulls)`
  * window → keep left rows. Cost class = sort-merge join (one shuffle,
  * one sort), with none of the range-explosion a between-join would have;
  * the window frame is running (rowsBetween unbounded..current), so state
  * per key is one row — this shape holds at 100 TB.
  *
  * A right row exactly at `leftTs` matches (>= semantics): right rows
  * sort before left rows at equal timestamps. Ties between right rows at
  * the same timestamp resolve by `tieBreak` (latest wins).
  */
object AsOf {

  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      tieBreak: Seq[String] = Nil,
      rightPrefix: String = "right_"): DataFrame = {

    val rightStruct = StructType(right.schema.fields)

    val lSide = left.select(
      col(leftKey).as("__k"),
      col(leftTs).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(rightStruct).as("__r"))

    val rSide = right.select(
      col(rightKey).as("__k"),
      col(rightTs).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      lit(null).cast(StructType(left.schema.fields)).as("__l"),
      struct(right.columns.toIndexedSeq.map(col): _*).as("__r"))

    val ordering: Seq[Column] =
      Seq(col("__t").asc, col("__side").asc) ++
        tieBreak.map(c => col(s"__r.$c").asc_nulls_first)

    val w = Window.partitionBy(col("__k"))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lSide.unionByName(rSide)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__match.$c").as(s"$rightPrefix$c"))
    matched.select((leftCols ++ rightCols).toIndexedSeq: _*)
  }

  /** Inner flavor: left rows with no matching right row are dropped. */
  def joinInner(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      tieBreak: Seq[String] = Nil,
      rightPrefix: String = "right_"): DataFrame = {
    val out = join(left, right, leftKey, rightKey, leftTs, rightTs, tieBreak, rightPrefix)
    out.filter(col(s"$rightPrefix$rightTs").isNotNull)
  }
}
