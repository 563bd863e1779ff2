package graft

import graft.operators.ConnectedComponents

/** Round-count contrasts on deep chains — the log-diameter evidence for
  * the star phase and the switch behavior of the adaptive default.
  * Split from CcSpec (each case runs tens of fixpoint rounds) so the
  * chain contrasts run in their own forked JVM in parallel with the
  * rest of the test wall.
  */
class CcChainSpec extends SparkSuite {
  import spark.implicits._

  test("adaptive: shallow graphs finish in the min-label phase; chains switch to stars") {
    // blob: star of 6 nodes — diameter 2, converges in min-label rounds
    val blob = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L)).toDF("a", "b")
    val (blobLabs, blobRounds) = ConnectedComponents.labelsAdaptiveWithRounds(blob, localThreshold = 0)
    assert(blobLabs.collect().forall(_.getLong(1) == 1L))
    assert(blobRounds <= 3, s"shallow blob should converge without switching, took $blobRounds")
    // chain of diameter 40: min-label alone needs 40 rounds; adaptive
    // must stay within switchAfter + log-rounds
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val (labs, rounds) = ConnectedComponents.labelsAdaptiveWithRounds(chain, maxIter = 25, localThreshold = 0)
    assert(labs.collect().forall(_.getLong(1) == 0L))
    assert(rounds <= 18, s"adaptive should switch to stars on the chain, took $rounds rounds")
  }

  test("adaptive stall-bail: flat changed-counts switch to stars before the round budget") {
    // 20 parallel chains of diameter 20 (420 nodes): min-label's
    // changed-count stays ~flat (~300/round — a moving frontier, well
    // above the 64-change noise floor), so the stall detector must hand
    // over to the star phase around round 3 instead of burning the full
    // 12-round switchAfter budget the way a single sub-floor chain does
    val chains = (0L until 20L).flatMap(c =>
      (0L until 20L).map(i => (c * 100 + i, c * 100 + i + 1))).toDF("a", "b")
    val (labs, rounds) = ConnectedComponents.labelsAdaptiveWithRounds(chains, localThreshold = 0)
    val got = labs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 20L).forall(c =>
      (0L to 20L).forall(i => got(c * 100 + i) == c * 100)))
    assert(rounds <= 10,
      s"stall-bail should beat the 12-round min-label budget, took $rounds")
  }

  test("hybrid handles self-loops, pairs, and long chains like the default") {
    val pairsAndLoops = Seq((3L, 3L), (1L, 2L), (2L, 2L), (7L, 9L)).toDF("a", "b")
    val got = ConnectedComponents.labelsHybrid(pairsAndLoops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 7L -> 7L, 9L -> 7L))
    // the contraction halves the effective diameter; star rounds stay log
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val (labs, rounds) = ConnectedComponents.labelsHybridWithRounds(chain, maxIter = 25)
    assert(labs.collect().forall(_.getLong(1) == 0L))
    assert(rounds <= 10, s"hybrid should stay log-round on chains, took $rounds")
  }

  test("long chain: alternating-star rounds grow with log(diameter), not diameter") {
    // 0–1–2–…–40: diameter 40
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val (altLabs, altRounds) = ConnectedComponents.labelsWithRounds(chain, maxIter = 25)
    val (refLabs, refRounds) = ConnectedComponents.labelsMinLabelWithRounds(chain, maxIter = 60)
    assert(altLabs.collect().forall(_.getLong(1) == 0L))
    assert(refLabs.collect().forall(_.getLong(1) == 0L))
    assert(refRounds >= 40, s"min-label should need ~diameter rounds, took $refRounds")
    assert(altRounds <= 10, s"alternating-star should collapse the chain fast, took $altRounds")
  }
}
