package graft

import graft.operators.ConnectedComponents

/** Equality property across all four CC variants on seeded random
  * graphs — split from CcSpec so the (deliberately heavy: 25 full
  * fixpoint runs) property suite can run in its own forked JVM in
  * parallel with the rest of the test wall.
  */
class CcPropertySpec extends SparkSuite {
  import spark.implicits._

  test("alternating-star, hybrid, and min-label all agree on random graphs (property, 5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // sparse-ish: chains and blobs both appear across seeds
      val edges = Seq.fill(50)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("a", "b")
      val alt = ConnectedComponents.labels(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = ConnectedComponents.labelsMinLabel(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hyb = ConnectedComponents.labelsHybrid(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // default path, plus a switchAfter=1 run that FORCES the
      // contract-then-star composition even on these shallow graphs
      val ada = ConnectedComponents.labelsAdaptive(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val adaForced = ConnectedComponents.labelsAdaptive(df, switchAfter = 1, localThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(alt == ref, s"seed $seed: alternating-star != min-label")
      assert(hyb == ref, s"seed $seed: hybrid != min-label")
      assert(ada == ref, s"seed $seed: adaptive != min-label")
      assert(adaForced == ref, s"seed $seed: adaptive(switchAfter=1) != min-label")
      val loc = ConnectedComponents.labelsLocal(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(loc == ref, s"seed $seed: local union-find != min-label")
    }
  }

  test("local and distributed paths share null-endpoint semantics (nulls drop)") {
    // pre-fix, labelsLocal NPE'd on a null endpoint while the
    // distributed path silently dropped it — and the adaptive gate
    // routes small graphs local, so small vs large graphs got
    // different null semantics (round-7 advisory)
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 3L), (null, 4L), (5L, null), (6L, 7L))
      .toDF("a", "b")
    val loc = ConnectedComponents.labelsLocal(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents.labelsMinLabel(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 6L -> 6L, 7L -> 6L))
    assert(loc == dist, "null semantics diverged between local and distributed")
  }
}
