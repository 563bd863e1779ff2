package graft

import org.apache.spark.sql.functions._

/** [[graft.operators.PageRank]]: hand-computed fixpoint on a symmetric
  * pair + isolated node, agreement with a driver-side double reference
  * on a path graph (decimal rounding bounds the divergence), and
  * repartition-invariance of the decimal arithmetic.
  */
class PageRankSpec extends SparkSuite {
  import spark.implicits._
  import graft.operators.PageRank

  test("symmetric pair + isolated node: hand-computed fixpoint") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val out = PageRank.run(nodes, edges, "id", "a", "b")
      .orderBy("id").collect()
    // N=3, p0=1/3→0.333333; the pair exchanges its full mass each round
    // (deg 1 both sides), so 0.05 + 0.85·0.333333 rounds back to
    // 0.333333 — a fixpoint; the isolated node holds the damping base.
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq == Seq(
      (1L, 1L, "0.333333"), (2L, 1L, "0.333333"), (3L, 0L, "0.050000")))
  }

  test("path graph agrees with a driver-side double reference within decimal-rounding slack") {
    val ids = (1L to 5L).toSeq
    val nodes = ids.toDF("id")
    val edgeList = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = edgeList.toDF("a", "b")
    val out = PageRank.run(nodes, edges, "id", "a", "b")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(2).toDouble).toMap

    // plain double PageRank, same topology and constants
    val und = edgeList ++ edgeList.map { case (a, b) => (b, a) }
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = ids.map(_ -> 1.0 / ids.size).toMap
    for (_ <- 0 until 3) {
      val contrib = und.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => pr(src) / deg(src) }.sum).toMap
      pr = ids.map(i => i ->
        (0.15 / ids.size + 0.85 * contrib.getOrElse(i, 0.0))).toMap
    }
    // each of 3 rounds rounds contributions and ranks at 6dp: tolerance
    // a few ulps of 1e-6 scaled by the damping geometric series
    ids.foreach { i =>
      assert(math.abs(out(i) - pr(i)) < 5e-6,
        s"node $i: ${out(i)} vs reference ${pr(i)}")
    }
    // degree-1 endpoints rank below the degree-2 middle
    assert(out(3L) > out(1L) && out(3L) > out(5L))
  }

  test("repartition-invariant: decimal sums make the result partitioning-independent") {
    val docs = sources.Tables.documents(spark, sf).filter(col("doc_id") < 120)
    val nodes = docs
      .filter(size(graft.functions.word_shingles(col("text"), 4)) > 0)
      .select(col("doc_id"))
    val edges = graft.ext.TextDedup.sharedShingleEdges(docs, "lang", 4)
    val base = PageRank.run(nodes, edges, "doc_id", "doc_a", "doc_b")
      .orderBy("doc_id").collect().toSeq
    val shuffled = PageRank.run(
      nodes.repartition(7), edges.repartition(5), "doc_id", "doc_a", "doc_b")
      .orderBy("doc_id").collect().toSeq
    assert(base == shuffled)
    assert(base.nonEmpty)
  }
}
