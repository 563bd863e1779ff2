package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Synthetic SHUFFLE anchor (round 9): the q41 anchor is pure CPU
    * (decimal limb arithmetic) and reads 1.0 on windows where every
    * shuffle-bearing query uniformly drifts ~10% (the r9 bench: anchor
    * 1.02 while the median shared-query ratio vs the r8-close clean run
    * was 1.091) — CPU contention and shuffle/page-cache contention are
    * different dimensions, and a one-dimensional gate misses the
    * second. This probe is content-independent (range → wide hash agg →
    * noop, fixed sizes, no data files, code that never changes with the
    * registry), so its drift measures the window, not the engine.
    * Clean min on this host: ~0.95-1.03 s at local[32] (first run after
    * JVM start is ~3 s of JIT — always discard it).
    */
  def shuffleProbeSec(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val t0 = System.nanoTime()
    spark.range(0, 20000000L, 1, 32)
      .groupBy((col("id") % 1000000L).as("k")).agg(count(lit(1)))
      .write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Scan/IO anchor: a fixed two-column sum over the bench corpus's
    * lineitem parquet — senses page-cache and scheduler contention the
    * CPU anchor misses. Clean band ~0.21-0.26 s warm at sf0.1/local[32].
    * Because contention is BURSTY, one edge-of-run sample proves
    * nothing; Bench interleaves this probe through both passes and
    * reports the MEDIAN — a window-average sensor, not a point one.
    */
  def scanProbeSec(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.functions.{col, sum}
    val t0 = System.nanoTime()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")))
      .write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }
  /** Mid-run scan-probe abort decision, PURE so the sensor is
    * unit-testable against traced probe series (BenchSensorSpec) — the
    * r12 steal-tail episode could only be diagnosed post-hoc because the
    * decision logic lived inline. Two sensors over the settled samples
    * (the first 3 in-run probes are JIT/GC-settle, systematically hot,
    * and excluded — the round-12 calibration):
    *   - settled MEDIAN factor > 1.25: sustained steal across the run;
    *   - min of the LAST 3 settled probes > 1.40 (round-13, r12 verdict
    *     item 4): a LATE-run burst — the r12 driver run went dirty in
    *     the tail, stayed under the median band for ~7 minutes, and
    *     still paid the full run before quarantine. Requiring ALL of
    *     the trailing 3 to breach keeps a single GC/compaction spike
    *     from aborting a live run, and the tail band sits ABOVE the
    *     median's 1.25 on purpose (round-13 review): single interleaved
    *     probes read up to ~1.35× from run-local GC pressure even on
    *     probe-clean windows (the r13 clean run's probe 11 read 0.216 s
    *     = 1.35×), so a 1.25 tail band could kill a live run near the
    *     heavy streaming-query cluster — clear steal reads 1.4-1.6×+
    *     sustained, which the 1.40 band still catches in 3 probes
    *     (~75 queries ≈ 2 min into the burst).
    * Returns the reason to abort, or None. The end-of-run windowClean
    * gate (1.15 over ALL samples) stays authoritative — these sensors
    * are an optimization; a missed abort just quarantines.
    */
  def scanAbortReason(scanSamples: Seq[Double], cleanSec: Double): Option[String] = {
    if (scanSamples.size < 6) None
    else {
      val settled = scanSamples.drop(3)
      val medFac = settled.sorted.apply(settled.size / 2) / cleanSec
      val tail3 = settled.takeRight(3)
      val tailMinFac = tail3.min / cleanSec
      if (medFac > 1.25)
        Some(f"settled scan median factor $medFac%.2f over ${settled.size} probes")
      else if (tailMinFac > 1.40)
        Some(f"trailing-window breach: last 3 settled scan probes all above band " +
          f"(min factor $tailMinFac%.2f)")
      else None
    }
  }

  /** Extract the per-query timing map from a one-line bench JSON (the
    * movers-audit reference read). Minimal on purpose (no JSON library
    * on the classpath): the end of the `queries` object anchors on the
    * trailing `,"sf":` key — the LAST field by construction — rather
    * than the first '}', so a future nested value inside queries cannot
    * truncate the extraction (round-12 advisory). Throws on malformed
    * input; the audit caller logs the failure by name instead of
    * silently erasing the audit (round-11 advisory). Pure and
    * spec-pinned (BenchSensorSpec, round-13 r12 verdict item 7).
    */
  def refQueries(refLine: String): Map[String, Double] = {
    val qStart = refLine.indexOf("\"queries\":{")
    require(qStart >= 0, "no \"queries\" object in reference line")
    val sfAnchor = refLine.lastIndexOf(",\"sf\":")
    val qEnd = if (sfAnchor > qStart) refLine.lastIndexOf("}", sfAnchor)
               else refLine.indexOf("}", qStart)
    require(qEnd > qStart, "unterminated \"queries\" object in reference line")
    val body = refLine.substring(qStart + "\"queries\":{".length, qEnd)
    body.split(",").filter(_.contains(":")).map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.replace("\"", "").trim -> v.toDouble
    }.toMap
  }

  /** Memory-BANDWIDTH probe (round-14, the r13 verdict item-1 stretch):
    * the ~8% fast/normal host phase proven by round 13's ABAB runs is
    * INVISIBLE to all three existing probes (CPU anchor, shuffle,
    * scan) — two probe-pristine same-code windows read 177.60 and
    * 192.50 s. The ABAB movers (wide aggregates, codec passes) point
    * at memory bandwidth / turbo residency as the hidden dimension, so
    * this kernel measures it directly: `threads` striding summers over
    * one shared 256 MB long array (sequential scan per thread —
    * bandwidth-bound, not cache-bound; the array is allocated once and
    * reused). Returns aggregate READ GB/s; the max of a few samples is
    * the window's ceiling. RECORDED, not gated: until a few rounds of
    * (membw, total) pairs exist there is no clean band to enforce —
    * the field exists so the next cross-round comparison can test the
    * bandwidth hypothesis against data instead of movers-audit
    * inference.
    */
  def membwProbeGBps(threads: Int = 8): Double = {
    val a = MembwArray
    val per = a.length / threads
    val sink = new java.util.concurrent.atomic.AtomicLong
    // start gate: thread creation/start cost stays OUTSIDE the timed
    // window, and the last thread takes the length % threads tail so
    // the reported bytes (the full array) match the bytes actually
    // read for ANY thread count, not just divisors of 32M (round-15,
    // the r14 ADVICE)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val ts = (0 until threads).map { t =>
      val th = new Thread { override def run(): Unit = {
        gate.await()
        var s = 0L
        var i = t * per
        val end = if (t == threads - 1) a.length else i + per
        while (i < end) { s += a(i); i += 1 }
        sink.addAndGet(s)
        ()
      } }
      th.start(); th
    }
    val t0 = System.nanoTime()
    gate.countDown()
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    if (sink.get() == Long.MinValue) System.err.println("") // keep the sum live
    (a.length.toDouble * 8 / (1L << 30)) / sec
  }
  private lazy val MembwArray: Array[Long] = {
    val a = new Array[Long](256 * 1024 * 1024 / 8)
    java.util.Arrays.fill(a, 1L)
    a
  }

  /** Memory-LATENCY probe (round-14, second phase-sensor candidate):
    * the bandwidth kernel was EXCLUDED by same-field data (medians flat
    * to ~2% across windows whose totals spread 6.5% — BASELINE.md), so
    * the next candidates target the dimensions bandwidth doesn't: this
    * one is a serial pointer chase over a 64 MB single-cycle random
    * permutation (Sattolo) — every load depends on the previous one, so
    * the reading is pure cache-miss LATENCY in ns/hop, insensitive to
    * bandwidth and parallelism. 2M hops ≈ 150-250 ms per sample.
    * Recorded, not gated (the membw protocol).
    */
  def memlatProbeNs(): Double = {
    val a = MemlatArray
    val hops = 2000000
    var i = 0
    var p = 0
    val t0 = System.nanoTime()
    while (i < hops) { p = a(p); i += 1 }
    val ns = System.nanoTime() - t0
    if (p == -1) System.err.println("") // keep the chase live
    ns.toDouble / hops
  }
  private lazy val MemlatArray: Array[Int] = {
    val n = 16 * 1024 * 1024 // 64 MB of ints — past any L3 on this host
    val a = Array.tabulate(n)(identity)
    val rnd = new java.util.Random(12345L)
    var i = n - 1
    while (i > 0) { // Sattolo: a uniformly random SINGLE-cycle permutation
      val j = rnd.nextInt(i)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a
  }

  /** Single-core TURBO probe (round-14, third phase-sensor candidate):
    * one serially-dependent integer multiply-add chain — no memory, no
    * parallelism — so the reading is effective single-core clock in
    * Mops/s; a host phase driven by turbo residency or hypervisor
    * frequency capping shows here and nowhere else. ~50 ms per sample.
    * Recorded, not gated.
    */
  def turboProbeMops(): Double = {
    val iters = 100000000
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    val t0 = System.nanoTime()
    while (i < iters) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    if (x == 0L) System.err.println("") // keep the chain live
    iters / sec / 1e6
  }

  /** PROVISIONAL host-phase self-label off the memlat median (round-15,
    * the r14 verdict item 3): across four same-field windows the
    * pointer-chase latency tracks window class MONOTONICALLY — 111.7
    * ns/hop on the fast-band baseline window, 121.1/121.6/123.3 on the
    * mid-band pair + close row, 141.2 on the warm gate-clean close
    * window — while turbo stays within ~1.5% (close to excluded, the
    * bandwidth precedent) and membw is already excluded. The bands
    * split the observed clusters at their midpoints: fast < 117,
    * normal 117-130, hot > 130; "unknown" when no mid-run samples
    * exist. SELF-LABELING only, never gated — the label lets a future
    * cross-round comparison bucket rows by phase without re-deriving
    * the audit chain, and the thresholds are re-fit as the dataset
    * grows (BASELINE.md keeps the rows).
    */
  def phaseBand(memlatMedNs: Double): String =
    if (memlatMedNs <= 0) "unknown"
    else if (memlatMedNs < PhaseBandFastMaxNs) "fast"
    else if (memlatMedNs <= PhaseBandNormalMaxNs) "normal"
    else "hot"
  /** The ONE definition site of the provisional band cut-points
    * (round-16, r15 verdict item 6): cluster midpoints from the six
    * same-field windows recorded in BASELINE.md's phase table
    * (fast 111.7 / normal 121.1-126.7 / hot 141.2-145.1 ns). When the
    * dataset grows enough to re-fit them, change THESE constants —
    * BenchSensorSpec asserts the band table against them and BASELINE.md
    * cites them by name, so the three can no longer drift apart.
    */
  val PhaseBandFastMaxNs: Double = 117.0
  val PhaseBandNormalMaxNs: Double = 130.0

  /** The precheck's advisory phase line (round-16, r15 verdict item 4):
    * predict the window's band from a handful of memlat samples BEFORE
    * the 6-minute run, so a hot-window attempt is visible at attempt
    * time instead of post-hoc in the self-label. NEVER gating (the
    * phase protocol: bands are recorded and labeled, not enforced) —
    * the returned line is printed to stderr verbatim. Pure for
    * BenchSensorSpec.
    */
  def precheckBandLine(memlatSamples: Seq[Double]): String = {
    val med = if (memlatSamples.isEmpty) 0.0
      else memlatSamples.sorted.apply(memlatSamples.size / 2)
    f"[bench] precheck phase (advisory, never gating): memlat $med%.1f ns -> " +
      s"predicted band ${phaseBand(med)}"
  }

  /** Common-query subtotal ratio between two per-query timing maps:
    * cand-sum / ref-sum over the keys both carry with positive times
    * (failed queries land as -1.0 sentinels and must not poison the
    * subtotal). None when the common set is empty — a link that cannot
    * be computed must not silently read 1.0.
    */
  def commonSumRatio(ref: Map[String, Double], cand: Map[String, Double]): Option[Double] = {
    val common = ref.keySet.intersect(cand.keySet)
      .filter(k => ref(k) > 0 && cand(k) > 0).toSeq
    if (common.isEmpty) None
    else Some(common.map(cand).sum / common.map(ref).sum)
  }

  /** Phase-corrected position vs the persistent anchor (round-14, r13
    * verdict item 1). Round 13 proved an ~8% probe-blind host phase —
    * two all-clean windows read 177.60 s and 192.50 s on identical
    * code — so RAW totals are not a valid cross-round signal. The
    * valid comparator is the CHAIN of common-query subtotal ratios
    * through every promoted clean reference: each link compares two
    * profiles over the queries BOTH ran (newcomers never pollute an
    * earlier link), and the product walks the current run back to the
    * anchor row (the r12-final 127.53 s/172 profile in
    * bench_chain.jsonl). `chain` is the ordered node list (anchor
    * first, current promoted reference last); the final link is
    * chain.last vs `current`. None if the chain is empty or any link's
    * common set is — a partial chain must not report a number.
    */
  def chainedRatioVsAnchor(chain: Seq[Map[String, Double]],
      current: Map[String, Double]): Option[Double] = {
    if (chain.isEmpty) None
    else (chain :+ current).sliding(2).foldLeft(Option(1.0)) {
      case (acc, Seq(a, b)) => for (x <- acc; r <- commonSumRatio(a, b)) yield x * r
      case (acc, _) => acc
    }
  }

  /** Full-line artifact path. Round-14 made the redirect opt-IN
    * (SPARK_GRAFT_BENCH_OUT names a side file) and the driver's
    * per-round invocation still dirtied the committed
    * bench_full_last.json — it doesn't set the hook. Round-15 (r14
    * verdict item 6) flips the polarity to opt-OUT: by default a clean
    * run lands in bench_full_run.json (an uncommitted side file) and a
    * dirty run in bench_full_dirty.json — NO default invocation can
    * displace the committed artifact. Writing bench_full_last.json now
    * requires the explicit claim SPARK_GRAFT_BENCH_OUT=
    * bench_full_last.json, which only the builder's promote step sets
    * (when it also appends the line to bench_chain.jsonl and updates
    * bench_reference.json — promotion is one deliberate act, not a
    * side effect of running).
    */
  def benchOutFile(envOut: Option[String], windowClean: Boolean): String =
    envOut.filter(_.nonEmpty).getOrElse(
      if (windowClean) "bench_full_run.json" else "bench_full_dirty.json")

  /** The precheck JSON fragment. `precheck_clean` is ALWAYS a boolean
    * (round-12 ADVICE: the prior build emitted the string "disabled" at
    * tries=0 — a union type that broke any consumer parsing it as
    * bool); a disabled precheck reads clean=false (not verified) with
    * enabled=false carrying the why (round-11 advisory: clean=true with
    * attempts=0 was vacuous). Pure and spec-pinned (BenchSensorSpec).
    */
  def precheckFields(tries: Int, attempts: Int, clean: Boolean): String =
    s""""precheck_attempts":$attempts,""" +
    s""""precheck_enabled":${tries > 0},"precheck_clean":${clean && tries > 0}"""

  /** Queries that are multi-pass BY CONTRACT — real micro-batch
    * streaming folds (N triggers × scheduler floor) or serial training
    * iterations (Lloyd passes, BPE merge loops, incremental-CC folds).
    * Their wall cost at bench scale is orchestration floor, not
    * dataflow; the bench JSON reports their subtotal separately so
    * drift triage can see which slice of the total is floor-bound.
    * Maintained alongside the registry: add new stream/training
    * queries here when registering them.
    */
  val StreamingContractQueries: Set[String] = Set(
    "x52_kmeans_fit", "x53_semdedup_kmeans", "x57_bpe_fit", "x58_bpe_encode",
    "x93_kmeans_inertia", "x100_incremental_cc", "x109_cc_forget",
    "x111_component_stream", "x112_bpe_fit_batched", "x113_grouped_sample_stream",
    "x114_fitted_codebook_recall", "x116_bm25_index_stream",
    "x117_bm25_retract_stream", "x118_ann_production_ladder", "x119_grouped_sample_rekey",
    "x120_dedup_index_retract", "x121_grouped_sample_forgotten",
    "x122_emb_index_retract", "x123_cdc_index_retract",
    "x124_grouped_sample_ledger", "x125_dedup_stream_retract",
    // round-13 stream/wave queries (back-filled round-14 — the set's
    // own contract says new stream queries join it at registration;
    // these were registered without the membership update, so the r13
    // subtotal under-counted the contract family)
    "x126_emb_dedup_stream_retract", "x127_cdc_novelty_stream_retract",
    "x128_ivf_index_upsert", "x130_ivf_refit_swap", "x132_asof_snapshot",
    "x133_sketch_rebuild", "x134_classifier_retract", "x138_model_asof",
    "x139_rollup_ivm",
    // round-14 stream/wave queries
    "x140_ivf_policy_loop", "x141_floor_compaction", "x142_ivm_contrast",
    "x143_bucketed_resolve", "x144_training_cut",
    // round-15 stream/wave queries
    "x145_bucketed_asof_floor", "x146_fused_probe_exchanges",
    "x149_pack_stream",
    // round-16 stream/wave queries
    "x150_cdc_gear_stream", "x151_pack_chunk_view", "x152_bm25_bucketed")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed-log queries (x143) use catalog tables — keep the
      // warehouse out of the repo working tree
      .config("spark.sql.warehouse.dir",
        graft.util.Scratch.tempDir("graft-bench-wh") + "/warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    // JVM/codegen warmup outside the timed region: one shuffle + one agg
    // over synthetic data, plus one tiny parquet read to initialize the
    // vectorized reader path, so the first timed query doesn't absorb
    // session bring-up (JIT + codegen compiler + reader init, not query
    // cost).
    spark.range(0, 100000, 1, 4).groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k"))
      .count().count()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // PRE-CHECK (round-11, from the r10 verdict): round 10 burned 16
    // six-minute full runs on hypervisor-stolen windows the gate then
    // rejected. The three probes cost ~3 s — check them FIRST and wait
    // for a clean window (bounded retries) before paying for the run.
    // The steal is invisible to guest load and wanders minute-to-minute
    // (BASELINE.md r10-late), so a short sleep between attempts
    // genuinely samples different windows. Tunables:
    //   SPARK_GRAFT_PRECHECK_TRIES (default 12; 0 disables)
    //   SPARK_GRAFT_PRECHECK_WAIT_SEC (default 25)
    // Budget at defaults ~5-6 min worst case — comparable to one wasted
    // full run. If no window passes, proceed anyway: the in-run gate
    // still stamps window_clean=false and the audit object quantifies
    // the drift.
    val precheckTries = sys.env.getOrElse("SPARK_GRAFT_PRECHECK_TRIES", "12").toInt
    val precheckWaitSec = sys.env.getOrElse("SPARK_GRAFT_PRECHECK_WAIT_SEC", "25").toInt
    // clean references shared by the precheck and the in-run gate
    val AnchorName = "q41_u256_sum"
    val AnchorCleanSec = 1.55
    val ShuffleCleanSec = 1.00
    val ScanCleanSec = 0.16 // warm in-bench floor (interleaved probes run cache-warm)
    // the scan probe's precheck samples run on a colder cache than the
    // interleaved in-run median; use the documented warm single-sample
    // band (~0.21-0.26 s, BASELINE.md) as the precheck reference
    val ScanPrecheckCleanSec = 0.22
    var precheckAttempts = 0
    // disabled (tries=0) must not read as a verified window (round-11
    // advisory — precheck_clean:true with attempts:0 was vacuous): the
    // JSON keeps precheck_clean=false and adds precheck_enabled=false
    // so the distinction stays machine-readable without a union type
    // (round-12 ADVICE).
    var precheckClean = false
    if (precheckTries > 0) {
      // JIT throwaways so attempt 1 measures the window, not compilation
      try { SparkEntry.queries(AnchorName)(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => () }
      shuffleProbeSec(spark)
      scanProbeSec(spark, sfDir)
      // advisory phase prediction BEFORE the run (round-16, r15 verdict
      // item 4): a hot window is named at attempt time; never gates
      memlatProbeNs() // JIT/page-touch throwaway
      System.err.println(precheckBandLine((1 to 3).map(_ => memlatProbeNs())))
      while (!precheckClean && precheckAttempts < precheckTries) {
        precheckAttempts += 1
        val cpu = try {
          val t0 = System.nanoTime()
          SparkEntry.queries(AnchorName)(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9 / AnchorCleanSec
        } catch { case _: Throwable => 1.0 }
        val sh = shuffleProbeSec(spark) / ShuffleCleanSec
        val sc = scanProbeSec(spark, sfDir) / ScanPrecheckCleanSec
        precheckClean = cpu <= 1.10 && sh <= 1.15 && sc <= 1.15
        System.err.println(f"[bench] precheck $precheckAttempts/$precheckTries: " +
          f"cpu $cpu%.2f shuffle $sh%.2f scan $sc%.2f -> " +
          (if (precheckClean) "CLEAN, starting run" else "dirty"))
        if (!precheckClean && precheckAttempts < precheckTries)
          Thread.sleep(precheckWaitSec * 1000L)
      }
      if (!precheckClean) {
        // SPARK_GRAFT_PRECHECK_ABORT=1: exit without running — the
        // mid-round retry mode (a failed attempt costs ~3 s of probes
        // per try instead of a 6-minute dirty run). The driver's
        // per-round invocation leaves it unset and always produces a
        // bench line.
        if (sys.env.get("SPARK_GRAFT_PRECHECK_ABORT").contains("1")) {
          System.err.println(s"[bench] precheck exhausted $precheckTries windows without a clean one — aborting (SPARK_GRAFT_PRECHECK_ABORT=1)")
          spark.stop()
          sys.exit(3)
        }
        System.err.println(s"[bench] precheck exhausted $precheckTries windows without a clean one — " +
          "running anyway; expect window_clean=false")
      }
    }
    // Multi-pass, report the per-query minimum: single-pass numbers
    // swing ±20% on this box (shared-host noise + first-evaluation JIT /
    // codegen compilation), and the min of passes is the stable estimate
    // of the plan's actual cost (documented in BASELINE.md). The second
    // pass runs in REVERSE query order, so one sustained contention
    // window covers different queries in each pass and can't poison both
    // samples of the same query (the round-5 bench recorded phantom
    // 2-6x regressions exactly because both forward passes sat in the
    // same noisy window). Queries whose two samples still disagree
    // badly get a third targeted sample.
    // A failing query must not hide as a ~0 s timing (the round-7 data
    // regeneration broke q48's type resolution and the swallowed error
    // benched as 0.006 s — visible only because the correctness gate
    // also caught it). Record failures and surface them on stderr plus
    // an n_errors field; the timing maps keep the driver's schema.
    val errors = scala.collection.mutable.LinkedHashSet[String]()
    def time(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // noop sink = full evaluation of every output column (count()
      // would let Catalyst prune whole operators — a window/join whose
      // columns the count never reads vanishes from the plan, timing
      // nothing)
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case e: Throwable =>
        if (errors.add(name))
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // multi-dimensional window sensing (round 9): one discarded shuffle
    // probe (JIT), then a post-warmup shuffle sample; scan probes
    // interleaved every 25 queries through BOTH passes (bursty
    // contention makes edge-of-run samples meaningless — the median
    // over the run is the window sensor); one closing shuffle sample.
    shuffleProbeSec(spark) // JIT throwaway
    // membw: one JIT/page-touch throwaway, then max of 3 (the phase
    // sensor candidate — recorded, not gated)
    membwProbeGBps()
    val membwStart = (1 to 3).map(_ => membwProbeGBps()).max
    System.err.println(f"[bench] membw probe (start): $membwStart%.1f GB/s")
    val shuffleSamples = scala.collection.mutable.ArrayBuffer(shuffleProbeSec(spark))
    val scanSamples = scala.collection.mutable.ArrayBuffer[Double]()
    // mid-run shuffle samples (every other scan probe): the round-11
    // driver run passed the precheck and went dirty MID-RUN (end-of-run
    // shuffle probe 1.506) — the steal is shuffle-dimension-visible, so
    // the abort sensor needs both probe kinds. These samples feed ONLY
    // the abort decision, never the end-of-run windowClean gate (whose
    // min-of-edges semantics stay as documented).
    val midShuffleSamples = scala.collection.mutable.ArrayBuffer[Double]()
    // mid-run membw samples (every scan-probe cycle): the round-14
    // attempt-3 run read 14.8 GB/s at start vs 39.4 at end — the phase
    // candidate SWINGS within a run, so edge samples alone cannot
    // characterize a window; one probe costs ~10-30 ms. Traced to
    // stderr and summarized as a median field; never gated.
    val membwSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val memlatSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val turboSamples = scala.collection.mutable.ArrayBuffer[Double]()
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; if (s.isEmpty) 0.0 else s(s.size / 2)
    }
    val abortMode = sys.env.get("SPARK_GRAFT_PRECHECK_ABORT").contains("1")
    var sinceProbe = 0
    def maybeScanProbe(): Unit = {
      sinceProbe += 1
      if (sinceProbe >= 25) {
        sinceProbe = 0
        scanSamples += scanProbeSec(spark, sfDir)
        if (scanSamples.size % 2 == 0) midShuffleSamples += shuffleProbeSec(spark)
        membwSamples += membwProbeGBps()
        memlatSamples += memlatProbeNs()
        turboSamples += turboProbeMops()
        // per-sample trace: mid-run drift triage needs the SERIES, not
        // just the end-of-run median (the round-12 abort calibration
        // was blind without it)
        System.err.println(f"[bench] probe ${scanSamples.size}: scan ${scanSamples.last}%.3f s" +
          (if (scanSamples.size % 2 == 0) f", shuffle ${midShuffleSamples.last}%.3f s" else "") +
          f", membw ${membwSamples.last}%.1f GB/s" +
          f", memlat ${memlatSamples.last}%.0f ns, turbo ${turboSamples.last}%.0f Mops")
        // round-12 (from the r11 verdict): under ABORT=1, a window that
        // goes dirty mid-run costs a partial run, not a full dirty
        // artifact. Decision logic + calibration rationale live in
        // scanAbortReason (pure, BenchSensorSpec-pinned): settle-sample
        // skip, 1.25 median band, and the round-13 trailing-window
        // sensor for late-run bursts (the r12 driver run went dirty in
        // the TAIL and still paid the full ~7 minutes). The mid-run
        // SHUFFLE probes read ~1.6 s even on quiet windows (interleaved
        // probes fight the run's GC/JIT state; the 1.00 s baseline holds
        // only at the run's idle edges), so they carry NO abort band —
        // they are traced for triage only.
        if (abortMode) {
          scanAbortReason(scanSamples.toSeq, ScanCleanSec).foreach { reason =>
            System.err.println(s"[bench] MID-RUN WINDOW BREACH (abort mode): $reason — " +
              "aborting, no artifact written")
            spark.stop()
            sys.exit(3)
          }
        }
      }
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    // CPU-dimension mid-run sentinel (abort mode): the diagnostic run
    // that calibrated the scan abort sat on a window whose scan/shuffle
    // probes stayed in band while the CPU anchor drifted to 1.24× — the
    // whole 7-minute run was wasted on a dimension the interleaved
    // probes don't sense. When pass 1 reaches the anchor query, a
    // >1.25× sample triggers ONE confirming re-run (a single sample is
    // burst-prone); two hot samples abort.
    def anchorBreached(sample: Double): Boolean =
      abortMode && sample > 1.25 * AnchorCleanSec && {
        val again = try {
          val t0 = System.nanoTime()
          SparkEntry.queries(AnchorName)(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          // a FAILED confirm run is non-exonerating (round-12 ADVICE:
          // mapping it to 0.0 suppressed the abort precisely when the
          // re-run died under the same contention being detected) — the
          // hot first sample stands, and the failure is named
          System.err.println(s"[bench] anchor confirm re-run failed " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}) — treating as non-exonerating")
          Double.MaxValue
        }
        math.min(sample, again) > 1.25 * AnchorCleanSec
      }
    val p1 = names.map { n =>
      maybeScanProbe()
      val t = time(n)
      if (n == AnchorName && anchorBreached(t)) {
        System.err.println(f"[bench] MID-RUN WINDOW BREACH (abort mode): CPU anchor $t%.2f s " +
          f"(clean ${AnchorCleanSec}%.2f), confirmed by re-run — aborting, no artifact written")
        spark.stop()
        sys.exit(3)
      }
      n -> t
    }.toMap
    val p2 = names.reverse.map { n => maybeScanProbe(); n -> time(n) }.toMap
    shuffleSamples += shuffleProbeSec(spark)
    val membwEnd = (1 to 3).map(_ => membwProbeGBps()).max
    System.err.println(f"[bench] membw probe (end): $membwEnd%.1f GB/s")
    val results = names.map { name =>
      val (a, b) = (p1(name), p2(name))
      val best = math.min(a, b)
      // both samples may sit in the same noise tail only if the window
      // spanned the whole run; a >1.4x spread with >0.3s absolute gap is
      // the contamination signature — buy one more sample for just those
      val settled =
        if (math.max(a, b) > best * 1.4 && math.abs(a - b) > 0.3) math.min(best, time(name))
        else best
      name -> settled
    }
    // ms precision keeps the one-line JSON short enough for the driver's
    // fixed-size output tail to capture the line from its opening brace
    // (full-precision doubles pushed the "metric" prefix out of the
    // window in rounds 2-3 → BENCH_r{N}.json "parsed": null)
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // A failed query's fast-fail elapsed must not mix into totals or the
    // per-query history (a break that fails in 6 ms would LOWER the
    // headline): failed queries carry a -1.0 sentinel in the maps, are
    // excluded from every total, and are named in a "failed" array on
    // BOTH the full and compact lines (round-7 advisory).
    val qs = results.map { case (k, v) =>
        "\"" + k + "\":" + (if (errors.contains(k)) "-1.0" else fmt(v))
      }.mkString("{", ",", "}")
    val ok = results.filterNot { case (k, _) => errors.contains(k) }
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val failedArr = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Host-noise anchor: q41_u256_sum is content-independent (decimal
    // limb arithmetic, no data-dependent skew) with a documented clean
    // band of 1.4-1.7 s on this host (BASELINE.md). host_factor =
    // anchor / clean-midpoint self-reports how contended the bench
    // window was (three rounds of cross-round comparisons were
    // confounded by 1.35-1.4x host slowdowns before this field).
    // The anchor is a GATE, not a divisor (round-8 verdict): dividing
    // the total by host_factor over-corrects, because the per-query
    // min-of-passes already rejects many contended samples — r8's
    // "adjusted 49.9 s" vs the repo's own 71.1 s clean reference for
    // the identical registry was a ~30% phantom speedup. So: emit
    // window_clean (host_factor <= 1.15); a dirty window means RE-RUN
    // on a quieter one rather than trusting any rescaling. The divided
    // number survives only as adj_value_lower_bound — an optimistic
    // floor (true clean total lies in [lower_bound, value]), never a
    // headline. An anchor below the clean band clamps to factor 1.0 —
    // a fast host is not "negative noise".
    val anchorSec = results.toMap.get(AnchorName)
      .filterNot(_ => errors.contains(AnchorName)).getOrElse(0.0)
    val hostFactor = if (anchorSec > 0) math.max(1.0, anchorSec / AnchorCleanSec) else 1.0
    val shuffleSec = shuffleSamples.min
    val scanMed = medianOf(scanSamples.toSeq)
    val shuffleFactor = math.max(1.0, shuffleSec / ShuffleCleanSec)
    val scanFactor = if (scanMed > 0) math.max(1.0, scanMed / ScanCleanSec) else 1.0
    // thresholds tightened from (1.15, 1.3, 1.5) on round-9 evidence:
    // a run with factors (1.13, 1.19, 1.19) passed the loose gate while
    // its total sat 21% above the pristine-window reference (73.5 s vs
    // 89.1 s on identical code) — the factors track real drift nearly
    // linearly, so the bands must sit close to 1. A pristine window
    // reads (1.00, 1.02, 1.00); legitimate clean runs that trip these
    // occasionally just re-run.
    val windowClean = hostFactor <= 1.10 && shuffleFactor <= 1.15 && scanFactor <= 1.15
    if (!windowClean)
      System.err.println(f"[bench] WINDOW NOT CLEAN: cpu anchor ${anchorSec}%.2f s " +
        f"(factor $hostFactor%.2f), shuffle probe $shuffleSec%.2f s (factor $shuffleFactor%.2f), " +
        f"scan probe median $scanMed%.2f s (factor $scanFactor%.2f) — " +
        "re-run on a quieter window; do not rescale")
    // Per-family subtotals (round-12, from the r11 verdict): the
    // by-contract multi-pass queries (streaming micro-batch folds +
    // serial training iterations) are ~20% of the wall total and
    // dominated by orchestration floor, not dataflow cost — drift triage
    // should read the split directly instead of re-deriving which part
    // of the total is scheduler floor. Partition: q* = relational
    // surface; x* in the contract set = streaming/serial-by-contract;
    // remaining x* = extension dataflows.
    val subtotalRelational = ok.filter(_._1.startsWith("q")).map(_._2).sum
    val subtotalStreaming = ok.filter(kv => StreamingContractQueries(kv._1)).map(_._2).sum
    val subtotalExtension = total - subtotalRelational - subtotalStreaming
    val anchorFields =
      s""""anchor":"$AnchorName","anchor_sec":${fmt(anchorSec)},""" +
      s""""anchor_clean_sec":${fmt(AnchorCleanSec)},"host_factor":${fmt(hostFactor)},""" +
      s""""shuffle_anchor_sec":${fmt(shuffleSec)},"shuffle_factor":${fmt(shuffleFactor)},""" +
      s""""scan_anchor_med":${fmt(scanMed)},"scan_factor":${fmt(scanFactor)},""" +
      s""""membw_start_gbps":${fmt(membwStart)},"membw_end_gbps":${fmt(membwEnd)},""" +
      s""""membw_med_gbps":${fmt(medianOf(membwSamples.toSeq))},""" +
      s""""memlat_med_ns":${fmt(medianOf(memlatSamples.toSeq))},""" +
      s""""phase_band":"${phaseBand(medianOf(memlatSamples.toSeq))}",""" +
      s""""turbo_med_mops":${fmt(medianOf(turboSamples.toSeq))},""" +
      s""""window_clean":$windowClean,"adj_value_lower_bound":${fmt(total / hostFactor)},""" +
      s""""subtotal_relational":${fmt(subtotalRelational)},""" +
      s""""subtotal_extension":${fmt(subtotalExtension)},""" +
      s""""subtotal_streaming_contract":${fmt(subtotalStreaming)},""" +
      precheckFields(precheckTries, precheckAttempts, precheckClean)
    // Embedded movers audit (round-11, from the r10 verdict): the
    // round-close drift-vs-regression triage (tools/movers.py) now
    // lands IN the bench JSON, so a judge or the driver reads the
    // common-sum ratio and the >1.3x mover list without re-deriving
    // them from BASELINE.md prose. The reference is the committed
    // bench_reference.json (the audited clean comparator — update it
    // whenever a probe-clean run lands). Ratio near 1.0 with scattered
    // small movers = window drift; a persistent named mover = real.
    val audit: String = try {
      val refLine = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench_reference.json")), "UTF-8")
      // cross-sf times are incommensurable — only audit same-sf runs
      // (dev smokes at sf0.01 would otherwise emit a nonsense ratio)
      val refSf = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(refLine).map(_.group(1))
      if (!refSf.contains(sfDir)) throw new IllegalStateException("sf mismatch")
      val refQ: Map[String, Double] = refQueries(refLine)
      val candQ = results.toMap
      val common = refQ.keySet.intersect(candQ.keySet)
        .filterNot(errors.contains).filter(k => refQ(k) > 0).toSeq.sorted
      if (common.isEmpty) "" else {
        val sr = common.map(refQ).sum
        val sc = common.map(candQ).sum
        val movers = common.filter { k =>
          val (a, b) = (refQ(k), candQ(k))
          math.max(a, b) > 0.3 && (b > 1.3 * a || a > 1.3 * b)
        }.sortBy(k => -(candQ(k) / refQ(k)))
        val moversJson = movers.map(k =>
          "\"" + k + "\":[" + fmt(refQ(k)) + "," + fmt(candQ(k)) + "]").mkString("{", ",", "}")
        s""","audit":{"ref":"bench_reference.json","common_n":${common.size},""" +
        s""""common_sum_ratio":${fmt(sc / sr)},"movers":$moversJson}"""
      }
    } catch { case e: Throwable =>
      // a malformed/format-drifted reference must not silently erase the
      // audit from the output (round-11 advisory) — name the failure
      System.err.println(s"[bench] movers audit unavailable: ${e.getClass.getSimpleName}: ${e.getMessage}")
      ""
    }
    // Chained comparator vs the persistent anchor (round-14, r13
    // verdict item 1): compose common-subtotal ratios through
    // bench_chain.jsonl (anchor-first ordered clean references; the
    // LAST line must stay in sync with bench_reference.json — append
    // the new line whenever a reference is promoted) and close with
    // the current run. Same-sf lines only; failures disable the field
    // by name rather than emitting a wrong number.
    val chainFields: String = try {
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("bench_chain.jsonl")).toArray.map(_.toString)
        .map(_.trim).filter(_.startsWith("{"))
      val sameSf = lines.filter { l =>
        "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(l).map(_.group(1)).contains(sfDir)
      }
      if (sameSf.length != lines.length)
        throw new IllegalStateException(s"chain sf mismatch (${lines.length - sameSf.length} foreign-sf lines)")
      val chain = sameSf.toSeq.map(refQueries)
      val candQ = results.toMap -- errors
      chainedRatioVsAnchor(chain, candQ) match {
        case Some(r) =>
          s""","chain_len":${chain.size},"chained_ratio_vs_anchor":${fmt(r)}"""
        case None => throw new IllegalStateException("empty chain or empty common set on a link")
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] chained anchor ratio unavailable: ${e.getClass.getSimpleName}: ${e.getMessage}")
      ""
    }
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$anchorFields$audit$chainFields,""" +
      s""""failed":$failedArr,"queries":$qs,"sf":"$sfDir"}"""
    println(fullLine)
    // The registry outgrew the driver's fixed-size stdout tail: at 110
    // queries the full line is ~3 KB, so the tail (last ~2000 chars)
    // truncates its opening brace and the headline total is invisible
    // (BENCH_r06.json). Persist the full line to a repo file the judge
    // can read, and END stdout with a compact line — headline total plus
    // the slowest queries, hard-capped to fit the tail with room for
    // sbt's trailing "[success]" line — so the LAST parseable JSON line
    // always carries the totals.
    // Quarantine (round-12, from the r11 verdict): a dirty-window run
    // must never displace the last CLEAN artifact — round 11's driver
    // run passed the precheck, went dirty mid-run, and overwrote the
    // working tree's bench_full_last.json with stolen-window numbers.
    // Clean runs own bench_full_last.json; dirty runs write their full
    // output to bench_full_dirty.json and leave the clean file alone.
    val fullFile = benchOutFile(sys.env.get("SPARK_GRAFT_BENCH_OUT"), windowClean)
    if (sys.env.get("SPARK_GRAFT_BENCH_OUT").exists(_.nonEmpty))
      System.err.println(s"[bench] SPARK_GRAFT_BENCH_OUT set: full output lands in $fullFile")
    else if (!windowClean)
      System.err.println(s"[bench] dirty window: full output quarantined to $fullFile " +
        "(committed artifacts untouched)")
    else
      System.err.println(s"[bench] full output lands in the side file $fullFile — promoting a " +
        "clean reference requires SPARK_GRAFT_BENCH_OUT=bench_full_last.json (opt-out default, round-15)")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(fullFile),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    val bySlowest = ok.sortBy(-_._2)
    // compact line carries only the audit's headline ratio (the movers
    // map can be arbitrarily long; the full line has it)
    val auditRatio = "\"common_sum_ratio\":([0-9.]+)".r
      .findFirstMatchIn(audit).map(m => s""","audit_ratio":${m.group(1)}""").getOrElse("")
    val head = new StringBuilder(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},""" +
      s""""n_errors":${errors.size},"failed":$failedArr,$anchorFields$auditRatio$chainFields,""" +
      s""""full":"$fullFile","queries":{""")
    val tailBudget = 1600 // chars for the compact line, incl. closing
    var first = true
    for ((k, v) <- bySlowest) {
      val frag = (if (first) "" else ",") + "\"" + k + "\":" + fmt(v)
      if (head.length + frag.length < tailBudget - 40) { head ++= frag; first = false }
    }
    head ++= s"""},"sf":"$sfDir"}"""
    println(head.toString)
    spark.stop()
  }
}
