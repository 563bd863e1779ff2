package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mid-run scan-probe abort decision (round-13, r12 verdict item 4)
  * as a pure function — pinned against the shapes of the traced r12
  * probe series: the settle-hot head must never abort, sustained steal
  * must, and a late-run burst must trip the trailing-window sensor that
  * the median alone missed (the r12 driver run paid a full ~7-minute
  * dirty run because only its TAIL was stolen).
  */
class BenchSensorSpec extends AnyFunSuite {
  private val clean = 0.16

  test("too few probes: no decision") {
    assert(Bench.scanAbortReason(Seq(0.5, 0.5, 0.5, 0.5, 0.5), clean).isEmpty)
  }

  test("the settle-hot head alone never aborts (r12 calibration: probes 1-3 read 0.22-0.28 on live runs)") {
    assert(Bench.scanAbortReason(
      Seq(0.28, 0.25, 0.22, 0.16, 0.17, 0.16, 0.16), clean).isEmpty)
  }

  test("sustained steal trips the settled-median sensor") {
    val r = Bench.scanAbortReason(Seq(0.28, 0.25, 0.22, 0.24, 0.25, 0.26), clean)
    assert(r.exists(_.contains("median")), s"expected median breach, got $r")
  }

  test("a late-run burst trips the TRAILING-window sensor while the median stays in band (the r12 steal-tail shape)") {
    // 9 settled probes at the warm floor, then the tail goes 1.5-1.6x:
    // median over settled = 0.16 (in band), last 3 all breach the 1.40
    // tail band
    val series = Seq(0.28, 0.25, 0.22) ++ Seq.fill(9)(0.16) ++ Seq(0.24, 0.26, 0.25)
    val r = Bench.scanAbortReason(series, clean)
    assert(r.exists(_.contains("trailing")), s"expected trailing breach, got $r")
  }

  test("a SINGLE tail spike does not abort (GC/compaction one-offs)") {
    val series = Seq(0.28, 0.25, 0.22) ++ Seq.fill(9)(0.16) ++ Seq(0.16, 0.45, 0.16)
    assert(Bench.scanAbortReason(series, clean).isEmpty)
    // nor two of three
    val series2 = Seq(0.28, 0.25, 0.22) ++ Seq.fill(9)(0.16) ++ Seq(0.45, 0.16, 0.45)
    assert(Bench.scanAbortReason(series2, clean).isEmpty)
  }

  test("three consecutive MILDLY-hot tail probes (<=1.4x, the GC-adjacent clean shape) stay live — the tail band sits above the median band on purpose") {
    // the r13 clean run read a 1.35x single probe near the heavy
    // streaming cluster; a sustained ~1.3x tail from run-local GC must
    // not kill a live run the end-of-run gate would pass
    val series = Seq(0.28, 0.25, 0.22) ++ Seq.fill(9)(0.16) ++ Seq(0.21, 0.22, 0.21)
    assert(Bench.scanAbortReason(series, clean).isEmpty)
  }

  test("a clean full-run series stays live end to end") {
    val series = Seq(0.28, 0.25, 0.22) ++ Seq.fill(20)(0.17)
    (6 to series.size).foreach { n =>
      assert(Bench.scanAbortReason(series.take(n), clean).isEmpty,
        s"clean series aborted at probe $n")
    }
  }

  // ---- movers-audit reference parse (round-12 advisory, pinned r13) ----

  test("refQueries extracts the per-query map from a one-line bench JSON") {
    val line = """{"metric":"total","value":9.0,"unit":"sec","queries":{"q01":1.5,"x02":7.5},"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.refQueries(line) == Map("q01" -> 1.5, "x02" -> 7.5))
  }

  test("refQueries parses the REAL full-line format — audit object (nested braces) before queries, failed sentinels inside") {
    val line = """{"metric":"total","value":9.0,"unit":"sec","anchor":"q41","window_clean":true,""" +
      """"audit":{"ref":"bench_reference.json","common_n":2,"common_sum_ratio":1.001,"movers":{"q05":[1.000,2.000]}},""" +
      """"failed":["x99"],"queries":{"q01":1.5,"x02":7.5,"x99":-1.0},"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.refQueries(line) == Map("q01" -> 1.5, "x02" -> 7.5, "x99" -> -1.0))
  }

  test("a malformed reference line throws (the caller logs it by name instead of silently erasing the audit)") {
    intercept[IllegalArgumentException] { Bench.refQueries("{}") }
  }

  test("precheck_clean is always a boolean; disabled reads clean=false + enabled=false (round-12 advisory)") {
    assert(Bench.precheckFields(0, 0, clean = false) ==
      """"precheck_attempts":0,"precheck_enabled":false,"precheck_clean":false""")
    // even a (vacuously) true flag cannot leak through a disabled precheck
    assert(Bench.precheckFields(0, 0, clean = true).endsWith("\"precheck_clean\":false"))
    assert(Bench.precheckFields(12, 3, clean = true) ==
      """"precheck_attempts":3,"precheck_enabled":true,"precheck_clean":true""")
  }

  test("phaseBand: provisional memlat bands split the observed clusters; unknown on no samples (round-15, r14 verdict item 3)") {
    // the four recorded rows classify onto their documented bands
    assert(Bench.phaseBand(111.7) == "fast")
    assert(Bench.phaseBand(121.1) == "normal")
    assert(Bench.phaseBand(123.3) == "normal")
    assert(Bench.phaseBand(141.2) == "hot")
    // boundaries and the degenerate no-sample case
    assert(Bench.phaseBand(116.9) == "fast")
    assert(Bench.phaseBand(117.0) == "normal")
    assert(Bench.phaseBand(130.0) == "normal")
    assert(Bench.phaseBand(130.1) == "hot")
    assert(Bench.phaseBand(0.0) == "unknown")
    // single definition site (round-16, r15 verdict item 6): the band
    // table must be expressed through the named constants, so a re-fit
    // edits one place and this spec catches any drift
    assert(Bench.phaseBand(Bench.PhaseBandFastMaxNs - 0.1) == "fast")
    assert(Bench.phaseBand(Bench.PhaseBandFastMaxNs) == "normal")
    assert(Bench.phaseBand(Bench.PhaseBandNormalMaxNs) == "normal")
    assert(Bench.phaseBand(Bench.PhaseBandNormalMaxNs + 0.1) == "hot")
  }

  test("precheckBandLine: advisory phase prediction from precheck memlat samples — never a gate, names the band (round-16, r15 verdict item 4)") {
    assert(Bench.precheckBandLine(Seq(110.0, 112.0, 111.0))
      .contains("predicted band fast"))
    assert(Bench.precheckBandLine(Seq(145.0, 141.0, 150.0))
      .contains("predicted band hot"))
    assert(Bench.precheckBandLine(Seq(122.0)).contains("predicted band normal"))
    assert(Bench.precheckBandLine(Nil).contains("predicted band unknown"))
    // the line is explicit that it is advisory
    assert(Bench.precheckBandLine(Seq(122.0)).contains("never gating"))
  }

  test("memlat and turbo probes: sane readings, repeatable within an order of magnitude") {
    Bench.memlatProbeNs(); Bench.turboProbeMops() // JIT throwaways
    val l1 = Bench.memlatProbeNs(); val l2 = Bench.memlatProbeNs()
    assert(l1 > 5.0 && l1 < 2000.0, s"implausible latency reading: $l1 ns/hop")
    assert(math.max(l1, l2) / math.min(l1, l2) < 10.0, s"memlat unstable: $l1 vs $l2")
    val t1 = Bench.turboProbeMops(); val t2 = Bench.turboProbeMops()
    assert(t1 > 10.0 && t1 < 100000.0, s"implausible turbo reading: $t1 Mops")
    assert(math.max(t1, t2) / math.min(t1, t2) < 10.0, s"turbo unstable: $t1 vs $t2")
  }

  test("membw probe: returns a sane aggregate bandwidth and is repeatable within an order of magnitude") {
    Bench.membwProbeGBps() // JIT/page-touch throwaway
    val a = Bench.membwProbeGBps()
    val b = Bench.membwProbeGBps()
    assert(a > 1.0 && a < 2000.0, s"implausible bandwidth reading: $a GB/s")
    assert(math.max(a, b) / math.min(a, b) < 10.0,
      s"membw samples unstable beyond an order of magnitude: $a vs $b")
  }
}
