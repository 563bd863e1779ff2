package graft

import org.scalatest.funsuite.AnyFunSuite

/** The chained cross-round bench comparator (round-14, r13 verdict
  * item 1) as pure functions. Round 13 proved an ~8% probe-blind host
  * phase (two all-clean windows, 177.60 vs 192.50 s, identical code),
  * so the valid cross-round signal is the PRODUCT of common-query
  * subtotal ratios through every promoted clean reference — composed
  * mechanically here, not by hand in BASELINE.md prose. These tests
  * pin the composition arithmetic, the per-link common-set
  * restriction, and the refuse-to-answer boundaries.
  */
class MoversChainSpec extends AnyFunSuite {

  private val eps = 1e-12

  test("commonSumRatio: subtotal ratio over the shared keys only") {
    val ref = Map("a" -> 1.0, "b" -> 2.0, "onlyRef" -> 100.0)
    val cand = Map("a" -> 2.0, "b" -> 4.0, "onlyCand" -> 100.0)
    // shared = {a, b}: (2+4)/(1+2) = 2.0 — the 100s never enter
    assert(math.abs(Bench.commonSumRatio(ref, cand).get - 2.0) < eps)
  }

  test("commonSumRatio: -1.0 failure sentinels and zero times are excluded on BOTH sides") {
    val ref = Map("a" -> 1.0, "fail" -> -1.0, "z" -> 0.0)
    val cand = Map("a" -> 1.5, "fail" -> 3.0, "z" -> 9.0)
    assert(math.abs(Bench.commonSumRatio(ref, cand).get - 1.5) < eps)
    val cand2 = Map("a" -> 1.5, "b" -> -1.0)
    val ref2 = Map("a" -> 3.0, "b" -> 1.0)
    assert(math.abs(Bench.commonSumRatio(ref2, cand2).get - 0.5) < eps)
  }

  test("commonSumRatio: empty common set refuses to answer") {
    assert(Bench.commonSumRatio(Map("a" -> 1.0), Map("b" -> 1.0)).isEmpty)
    assert(Bench.commonSumRatio(Map.empty, Map("b" -> 1.0)).isEmpty)
    // all-excluded overlap is as empty as no overlap
    assert(Bench.commonSumRatio(Map("a" -> -1.0), Map("a" -> 1.0)).isEmpty)
  }

  test("chainedRatioVsAnchor: single-node chain is one direct link") {
    val anchor = Map("a" -> 1.0, "b" -> 1.0)
    val cur = Map("a" -> 1.1, "b" -> 0.9)
    assert(math.abs(Bench.chainedRatioVsAnchor(Seq(anchor), cur).get - 1.0) < eps)
  }

  test("chainedRatioVsAnchor: the composition is the product of per-link ratios") {
    // anchor -> mid doubles the shared subtotal; mid -> current halves
    // it again over a DIFFERENT shared set: product must read 1.0 even
    // though no single pair of end profiles shares all keys.
    val anchor = Map("a" -> 1.0, "b" -> 1.0)
    val mid = Map("a" -> 2.0, "b" -> 2.0, "new1" -> 5.0)
    val cur = Map("a" -> 1.0, "b" -> 1.0, "new1" -> 2.5)
    val r = Bench.chainedRatioVsAnchor(Seq(anchor, mid), cur).get
    assert(math.abs(r - 2.0 * 0.5) < eps, s"expected 1.0, got $r")
  }

  test("chainedRatioVsAnchor: newcomers in later profiles never pollute an earlier link") {
    val anchor = Map("a" -> 1.0)
    // mid carries a huge newcomer; the anchor->mid link must see only
    // "a" (ratio 1.0), and the mid->cur link sees {a, new1} (ratio 2.0)
    val mid = Map("a" -> 1.0, "new1" -> 1000.0)
    val cur = Map("a" -> 2.0, "new1" -> 2000.0)
    val r = Bench.chainedRatioVsAnchor(Seq(anchor, mid), cur).get
    assert(math.abs(r - 2.0) < eps, s"expected 2.0, got $r")
  }

  test("chainedRatioVsAnchor: the r12->r13 shape — a fast phase on the shared set composes with the final link") {
    // miniature of the real chain: shared-set ratio 0.92 anchor->ref,
    // then the current run reads 1.05 vs the ref on its shared set
    val anchor = Map("a" -> 50.0, "b" -> 50.0)
    val ref = Map("a" -> 46.0, "b" -> 46.0, "x" -> 60.0)
    val cur = Map("a" -> 48.3, "b" -> 48.3, "x" -> 63.0)
    val r = Bench.chainedRatioVsAnchor(Seq(anchor, ref), cur).get
    assert(math.abs(r - 0.92 * 1.05) < 1e-9, s"got $r")
  }

  test("chainedRatioVsAnchor: empty chain and broken links refuse to answer") {
    assert(Bench.chainedRatioVsAnchor(Nil, Map("a" -> 1.0)).isEmpty)
    // a disjoint middle node breaks the chain: no number, not 1.0
    val r = Bench.chainedRatioVsAnchor(
      Seq(Map("a" -> 1.0), Map("z" -> 1.0)), Map("z" -> 1.0, "a" -> 1.0))
    assert(r.isEmpty, "a link with an empty common set must disable the field")
  }

  test("the committed bench_chain.jsonl composes against the committed reference run itself") {
    // integration pin on the real artifacts: the chain's nodes parse
    // via refQueries, the last node IS bench_reference.json's profile
    // (so the final link vs that profile reads exactly 1.0), and the
    // composed ratio vs the r12 anchor equals the anchor->ref link.
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("bench_chain.jsonl")).toArray.map(_.toString)
      .map(_.trim).filter(_.startsWith("{"))
    assert(lines.length >= 2, "chain must hold the r12 anchor plus the current reference")
    val chain = lines.toSeq.map(Bench.refQueries)
    val refLine = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_reference.json")), "UTF-8")
    val ref = Bench.refQueries(refLine)
    assert(chain.last == ref,
      "bench_chain.jsonl's last line must stay in sync with bench_reference.json " +
        "(append the new line whenever a reference is promoted)")
    // the current reference composed through the chain equals the
    // composition through the chain's prefix (the final link is a
    // self-link of ratio exactly 1)
    val viaPrefix = Bench.chainedRatioVsAnchor(chain.dropRight(1), ref).get
    val composed = Bench.chainedRatioVsAnchor(chain, ref).get
    assert(math.abs(composed - viaPrefix) < 1e-9,
      s"the reference's self-link must be ratio-preserving: $composed vs $viaPrefix")
    // the chain's FIRST link (r12 anchor -> r13 reference), pinned to
    // the measured value — a stable historical fact
    val firstLink = Bench.chainedRatioVsAnchor(Seq(chain.head), chain(1)).get
    assert(math.abs(firstLink - 0.9213) < 0.001,
      s"the r12->r13 link drifted from the measured 0.9213: $firstLink")
  }

  test("benchOutFile: opt-out default (round-15, r14 verdict item 6) — no default invocation can displace the committed artifact") {
    // an explicit env claim owns the output, clean or dirty (the
    // builder's promote step claims bench_full_last.json this way)
    assert(Bench.benchOutFile(Some("/tmp/side.json"), windowClean = true) == "/tmp/side.json")
    assert(Bench.benchOutFile(Some("/tmp/side.json"), windowClean = false) == "/tmp/side.json")
    assert(Bench.benchOutFile(Some("bench_full_last.json"), windowClean = true) == "bench_full_last.json")
    // DEFAULT (driver-style invocation, env unset): a clean run lands
    // in the uncommitted side file, a dirty run in the quarantine file —
    // bench_full_last.json is never a default target
    assert(Bench.benchOutFile(None, windowClean = true) == "bench_full_run.json")
    assert(Bench.benchOutFile(None, windowClean = false) == "bench_full_dirty.json")
    // an empty env value is unset, not a redirect to ""
    assert(Bench.benchOutFile(Some(""), windowClean = true) == "bench_full_run.json")
  }
}
