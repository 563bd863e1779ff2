package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval-containment) join — the operator Spark lacks
  * natively: pair left rows whose numeric point falls inside a right
  * row's `[lo, hi]` interval, with an optional equi-key.
  *
  * Naive formulation is a theta join (`BroadcastNestedLoopJoin` or a
  * cartesian product) — O(|L|·|R|) comparisons, the plan that dies at
  * scale. This operator turns it into candidate generation + exact
  * filter, the same shape as the LSH family: quantize the point to a
  * bucket of width `bucketWidth`, explode each interval to the buckets
  * it covers (`(hi-lo)/bucketWidth + 1` rows — choose bucketWidth on the
  * order of the typical interval so that's ~2), then a plain shuffled
  * equi-join on (key, bucket) and a final exact `BETWEEN`. Every
  * matching pair appears exactly once (the left point lives in exactly
  * one bucket). At 100 TB this is one hash shuffle on (key, bucket),
  * AQE-splittable, no nested loop anywhere.
  */
object RangeJoin {

  /** Inner range join: rows of `left` × matching rows of `right` where
    * `left(pointCol)` ∈ [`right(loCol)`, `right(hiCol)`] and the equi
    * keys match. Point/lo/hi must be integral (epoch days/seconds — cast
    * dates/timestamps before calling). Column name collisions between
    * the two inputs are the caller's responsibility (alias first).
    */
  def joinRange(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__bucket", floorDiv(col(pointCol), bucketWidth))
    val r = right.withColumn("__bucket",
      explode(sequence(floorDiv(col(loCol), bucketWidth),
        floorDiv(col(hiCol), bucketWidth))))
    l.join(r, l("__bucket") === r("__bucket") && col(leftKey) === col(rightKey)
        && col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Left-join flavor aggregated to a per-left-row match count — the
    * common analytics shape ("orders in the trailing week of each
    * event") without materializing unmatched nulls through the bucket
    * join: count matches on the inner candidate join, then re-attach to
    * the full left side with a zero default.
    */
  def countInRange(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightKey: String,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    val counts = joinRange(left.select(leftId, leftKey, pointCol), right,
        leftKey, rightKey, pointCol, loCol, hiCol, bucketWidth)
      .groupBy(col(leftId)).agg(count(lit(1)).as("n_matches"))
    left.select(col(leftId))
      .join(counts, Seq(leftId), "left")
      .select(col(leftId), coalesce(col("n_matches"), lit(0L)).as("n_matches"))
  }

  // integer floor division: subtract the non-negative remainder, then
  // divide with Catalyst's IntegralDivide (Column./ on longs is DOUBLE
  // division, which silently coarsens buckets past 2^53 — epoch-nanos
  // territory). Domain: points within w of Long.MinValue would overflow
  // the subtraction — epoch-scale values are nowhere near it.
  private def floorDiv(c: Column, w: Long): Column = {
    val cl = c.cast("long")
    val exact = cl - pmod(cl, lit(w))
    org.apache.spark.sql.graft.Internal.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Internal.expression(exact),
        org.apache.spark.sql.graft.Internal.expression(lit(w))))
  }
}
