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

  test("self-loops and isolated-by-self-edge nodes keep their labels") {
    val got = comps(Seq((3L, 3L), (1L, 2L), (2L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
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
