package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Incremental component maintenance (round-10): folding edge batches
  * into a standing assignment must equal from-scratch CC over all edges
  * ever seen, in any batch split, including cross-batch merges that
  * relabel standing nodes the batch never touches.
  */
class CcIncrementalSpec extends SparkSuite {
  import spark.implicits._

  private def empty: DataFrame =
    Seq.empty[(Long, Long)].toDF("node", "component")

  private def edgesDf(e: Seq[(Long, Long)]): DataFrame =
    e.toDF("a", "b")

  private def fold(batches: Seq[Seq[(Long, Long)]]): Map[Long, Long] =
    batches.foldLeft(empty) { (st, b) =>
      ConnectedComponents.incrementalAssign(st, edgesDf(b))
        .localCheckpoint(false)
    }.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def full(e: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(edgesDf(e))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cross-batch merge relabels standing nodes the batch never touches") {
    // batch0: {1,2} and {3,4}; batch1's single edge (2,3) merges them —
    // node 4 is absent from batch1 yet must relabel 3 -> 1
    val b0 = Seq((1L, 2L), (3L, 4L))
    val b1 = Seq((2L, 3L))
    val got = fold(Seq(b0, b1))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("equals from-scratch CC under every split of a braided graph") {
    val all = Seq((10L, 20L), (20L, 30L), (40L, 50L), (30L, 40L),
      (60L, 70L), (80L, 90L), (70L, 80L), (5L, 95L))
    val expect = full(all)
    // three different batchings, including singleton batches
    val splits = Seq(
      Seq(all),
      Seq(all.take(4), all.drop(4)),
      all.map(Seq(_)))
    splits.foreach { s =>
      assert(fold(s) == expect, s"split of sizes ${s.map(_.size)}")
    }
  }

  test("re-folding an already-folded batch is a no-op (idempotence)") {
    val b = Seq((1L, 2L), (2L, 3L))
    val once = fold(Seq(b))
    val twice = fold(Seq(b, b))
    assert(once == twice)
  }

  test("new nodes arriving later join existing components through one edge") {
    val got = fold(Seq(Seq((1L, 2L)), Seq((2L, 100L), (200L, 201L))))
    assert(got(100L) == 1L && got(200L) == 200L && got(201L) == 200L)
  }

  test("null endpoints are dropped, matching the batch null contract") {
    val st = ConnectedComponents.incrementalAssign(empty,
      Seq((Some(1L), Some(2L)), (Some(3L), None), (None, Some(4L)))
        .toDF("a", "b"))
    val got = st.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("standing relabel stays a broadcast join — the standing table never shuffles") {
    val st = fold(Seq(Seq((1L, 2L), (3L, 4L)))) // warm a standing map
    val standing = st.toSeq.toDF("node", "component")
    val plan = ConnectedComponents.incrementalAssign(standing,
      edgesDf(Seq((2L, 3L)))).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  // ---- removeAssign (deletion maintenance) ----

  private def remove(standing: Map[Long, Long], edges: Seq[(Long, Long)],
      del: Seq[Long]): Map[Long, Long] =
    ConnectedComponents.removeAssign(
      standing.toSeq.toDF("node", "component"), edgesDf(edges),
      del.toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // from-scratch truth over the surviving graph: CC over edges with both
  // endpoints surviving, singletons keep their own id
  private def survivorTruth(nodes: Seq[Long], edges: Seq[(Long, Long)],
      del: Seq[Long]): Map[Long, Long] = {
    val d = del.toSet
    val kept = edges.filter { case (a, b) => !d(a) && !d(b) }
    val labs = full(kept)
    nodes.filterNot(d).map(n => n -> labs.getOrElse(n, n)).toMap
  }

  test("deleting a bridge splits its component; other components untouched") {
    // chain 1-2-3-4-5 plus separate pair {10,11}; deleting 3 splits the
    // chain into {1,2} and {4,5}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val standing = full(edges)
    val got = remove(standing, edges, Seq(3L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      10L -> 10L, 11L -> 10L))
  }

  test("deleting a non-bridge leaves the component connected (minus the node)") {
    // triangle 1-2-3: every node is redundant; delete 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val got = remove(full(edges), edges, Seq(3L))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("deleting the min-id node relabels the survivors to the new minimum") {
    val edges = Seq((1L, 2L), (2L, 3L))
    val got = remove(full(edges), edges, Seq(1L))
    assert(got == Map(2L -> 2L, 3L -> 2L))
  }

  test("deleting singletons and unknown nodes is harmless") {
    val edges = Seq((1L, 2L))
    val standing = full(edges) ++ Map(7L -> 7L) // 7 is a standing singleton
    val got = remove(standing, edges, Seq(7L, 999L))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("equals from-scratch CC over the surviving graph (property, 5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 13)
      val edges = Seq.fill(50)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val standing = full(edges)
      val del = rnd.shuffle(nodes).take(1 + rnd.nextInt(6))
      val got = remove(standing, edges, del)
      val want = survivorTruth(nodes, edges, del)
      assert(got == want, s"seed $seed del=$del:\n  got  $got\n  want $want")
    }
  }

  test("grow-then-forget composes: removeAssign after incrementalAssign folds") {
    val b0 = Seq((1L, 2L), (3L, 4L))
    val b1 = Seq((2L, 3L), (5L, 6L))
    val standing = fold(Seq(b0, b1))
    val got = remove(standing, b0 ++ b1, Seq(2L))
    // deleting 2 cuts 1 off; 3-4 stay joined; 5-6 untouched
    assert(got == Map(1L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 5L))
  }
}
