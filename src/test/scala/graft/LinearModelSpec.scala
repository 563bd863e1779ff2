package graft

import org.apache.spark.sql.functions._

import graft.ext.LinearModel

class LinearModelSpec extends SparkSuite {

  test("detBig: known 3x3 determinant and sign") {
    val m = Array(
      Array(BigInt(2), BigInt(0), BigInt(1)),
      Array(BigInt(1), BigInt(3), BigInt(2)),
      Array(BigInt(1), BigInt(1), BigInt(1)))
    assert(LinearModel.detBig(m) == BigInt(2 * (3 - 2) - 0 + (1 - 3)))
  }

  test("separable labels are recovered exactly") {
    // y = 1 iff x1 >= 60: least squares on (1, x1) puts the 0.5 crossing
    // between the two clusters, so the decision recovers y on every row
    val in = spark.range(0, 200).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0, col("id") % 50 + 60).otherwise(col("id") % 50)
        .as("x1"))
    val out = LinearModel.weakLabelClassifier(
      in, Seq(col("x1")), col("x1") >= 60)
    assert(out.filter(col("y") =!= col("yhat")).count() == 0)
    assert(out.filter(col("yhat") === 1).count() == 100)
  }

  test("decision is partitioning-invariant") {
    val in = spark.range(0, 300).select(
      col("id").as("doc_id"),
      (col("id") % 13).as("x1"), (col("id") % 7).as("x2"))
    def run(df: org.apache.spark.sql.DataFrame) =
      LinearModel.weakLabelClassifier(df,
        Seq(col("x1"), col("x2")), col("doc_id") % 3 === 0, "doc_id")
        .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSet
    assert(run(in) == run(in.repartition(17)))
  }

  test("linearly dependent features fail named") {
    val in = spark.range(0, 50).select(
      col("id").as("doc_id"), (col("id") % 5).as("x1"),
      (col("id") % 5 * 2).as("x2"))
    val e = intercept[IllegalArgumentException] {
      LinearModel.weakLabelClassifier(in,
        Seq(col("x1"), col("x2")), col("doc_id") % 2 === 0)
    }
    assert(e.getMessage.contains("singular design"))
  }

  test("incremental refit is batch-split-invariant and equals the all-at-once fit") {
    val in = spark.range(0, 400).select(
      col("id").as("doc_id"),
      (col("id") % 11).as("x1"), (col("id") % 6).as("x2"))
    val feats = Seq(col("x1"), col("x2"))
    val label = col("doc_id") % 4 === 0
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val whole = rows(LinearModel.weakLabelClassifier(in, feats, label))
    val twoWay = rows(LinearModel.incrementalClassifier(
      Seq(in.filter(col("doc_id") % 2 === 0), in.filter(col("doc_id") % 2 =!= 0)),
      feats, label))
    val threeWay = rows(LinearModel.incrementalClassifier(
      Seq(in.filter(col("doc_id") % 3 === 0), in.filter(col("doc_id") % 3 === 1),
        in.filter(col("doc_id") % 3 === 2)),
      feats, label))
    assert(twoWay == whole)
    assert(threeWay == whole)
  }

  test("mergeStats folds sums and maxes cell-wise") {
    val a = spark.range(0, 100).select(col("id").as("doc_id"),
      (col("id") % 9).as("x1"))
    val fa = a.filter(col("doc_id") < 60)
    val fb = a.filter(col("doc_id") >= 60)
    def stats(df: org.apache.spark.sql.DataFrame) =
      LinearModel.fitStats(
        df.select(col("doc_id"), (col("doc_id") % 2 === 0).cast("long").as("y"),
          lit(1L).as("x0"), col("x1").cast("long").as("x1")), 2)
    val merged = LinearModel.mergeStats(stats(fa), stats(fb), 2).collect()(0)
    val whole = stats(a).collect()(0)
    assert(merged == whole)
  }

  test("margin_sign refines yhat: zero margin only at the boundary") {
    val in = spark.range(0, 120).select(
      col("id").as("doc_id"), (col("id") % 4).as("x1"))
    val out = LinearModel.weakLabelClassifier(
      in, Seq(col("x1")), col("doc_id") % 2 === 0).collect()
    out.foreach { r =>
      val (yhat, sign) = (r.getInt(2), r.getInt(3))
      assert(if (sign > 0) yhat == 1
             else if (sign < 0) yhat == 0
             else yhat == 1)
    }
  }
}
