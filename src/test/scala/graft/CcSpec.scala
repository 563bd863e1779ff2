package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents
import graft.ext.TextDedup

/** Connected-components cluster collapse (x33): min-label propagation
  * finds whole near-dup clusters, not just pairs.
  */
class CcSpec extends SparkSuite {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to one component labeled by its min node") {
    // 5–4–3–2–1 forces label 1 to walk the full diameter
    val got = comps(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct labels") {
    val got = comps(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L)))
    assert(got.collect { case (k, v) if k < 10 => v }.toSet == Set(1L))
    assert(got(11L) == 10L && got(10L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L && got(22L) == 20L)
  }

  test("edge orientation does not matter") {
    assert(comps(Seq((2L, 7L), (9L, 7L))) == comps(Seq((7L, 2L), (7L, 9L))))
  }

  test("assign: nodes without edges become singleton components, sizes correct") {
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = ConnectedComponents.assign(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (9L, 9L, 1L)))
  }

  test("labels agree with brute-force transitive closure on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    // brute force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = nodes.map { n =>
      val root = find(n)
      n -> nodes.filter(m => find(m) == root).min
    }.toMap
    assert(comps(edges) == expected)
  }

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
      val adaForced = ConnectedComponents.labelsAdaptive(df, switchAfter = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(alt == ref, s"seed $seed: alternating-star != min-label")
      assert(hyb == ref, s"seed $seed: hybrid != min-label")
      assert(ada == ref, s"seed $seed: adaptive != min-label")
      assert(adaForced == ref, s"seed $seed: adaptive(switchAfter=1) != min-label")
    }
  }

  test("adaptive: shallow graphs finish in the min-label phase; chains switch to stars") {
    // blob: star of 6 nodes — diameter 2, converges in min-label rounds
    val blob = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L)).toDF("a", "b")
    val (blobLabs, blobRounds) = ConnectedComponents.labelsAdaptiveWithRounds(blob)
    assert(blobLabs.collect().forall(_.getLong(1) == 1L))
    assert(blobRounds <= 3, s"shallow blob should converge without switching, took $blobRounds")
    // chain of diameter 40: min-label alone needs 40 rounds; adaptive
    // must stay within switchAfter + log-rounds
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val (labs, rounds) = ConnectedComponents.labelsAdaptiveWithRounds(chain, maxIter = 25)
    assert(labs.collect().forall(_.getLong(1) == 0L))
    assert(rounds <= 18, s"adaptive should switch to stars on the chain, took $rounds rounds")
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

  test("self-loops and isolated-by-self-edge nodes keep their labels") {
    val got = comps(Seq((3L, 3L), (1L, 2L), (2L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
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

  test("sharedShingleEdges finds pairs sharing >= minShared 4-grams; maxDf drops stop-shingles") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over", "en"),
      (2L, "a lazy dog saw the quick brown fox run", "en"), // shares "the quick brown fox"
      (3L, "completely different words entirely here now", "en"),
      (4L, "the quick brown fox jumps over", "fr")           // same text, other block
    ).toDF("doc_id", "text", "lang")
    val e = TextDedup.sharedShingleEdges(docs, "lang", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(e == Set((1L, 2L, 1L)))
    // with a df cap of 1, the shared shingle (df=2) is dropped → no edges
    assert(TextDedup.sharedShingleEdges(docs, "lang", 4, maxDf = 1).count() == 0)
  }
}
