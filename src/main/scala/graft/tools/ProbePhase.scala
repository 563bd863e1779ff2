package graft.tools

/** Standalone host-phase probe sampler (round-16, r15 verdict item 4):
  * prints memlat/turbo/membw samples plus the predicted `phase_band`
  * without paying for a bench run — the tool that collects the
  * same-field (memlat, turbo) pairs deciding whether single-core turbo
  * is excluded as a phase sensor (the bandwidth precedent) or adopted.
  *
  *   sbt 'runMain graft.tools.ProbePhase [samples]'
  */
object ProbePhase {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5)
    // JIT/page-touch throwaways
    graft.Bench.membwProbeGBps(); graft.Bench.memlatProbeNs(); graft.Bench.turboProbeMops()
    val rows = (1 to n).map { i =>
      val lat = graft.Bench.memlatProbeNs()
      val turbo = graft.Bench.turboProbeMops()
      val bw = graft.Bench.membwProbeGBps()
      println(f"[phase] sample $i: memlat $lat%6.1f ns  turbo $turbo%6.1f Mops  membw $bw%5.1f GB/s")
      (lat, turbo, bw)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val (lats, turbos, bws) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    println(f"[phase] median: memlat ${med(lats)}%6.1f ns  turbo ${med(turbos)}%6.1f Mops  " +
      f"membw ${med(bws)}%5.1f GB/s  band=${graft.Bench.phaseBand(med(lats))}")
  }
}
