package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
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
    val names = SparkEntry.queries.keys.toSeq.sorted
    val p1 = names.map(n => n -> time(n)).toMap
    val p2 = names.reverse.map(n => n -> time(n)).toMap
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
    val AnchorName = "q41_u256_sum"
    val AnchorCleanSec = 1.55
    val anchorSec = results.toMap.get(AnchorName)
      .filterNot(_ => errors.contains(AnchorName)).getOrElse(0.0)
    val hostFactor = if (anchorSec > 0) math.max(1.0, anchorSec / AnchorCleanSec) else 1.0
    val windowClean = hostFactor <= 1.15
    if (!windowClean)
      System.err.println(s"[bench] WINDOW NOT CLEAN: anchor $AnchorName " +
        f"${anchorSec}%.2f s vs clean $AnchorCleanSec s (host_factor $hostFactor%.2f) — " +
        "re-run on a quieter window; do not rescale")
    val anchorFields =
      s""""anchor":"$AnchorName","anchor_sec":${fmt(anchorSec)},""" +
      s""""anchor_clean_sec":${fmt(AnchorCleanSec)},"host_factor":${fmt(hostFactor)},""" +
      s""""window_clean":$windowClean,"adj_value_lower_bound":${fmt(total / hostFactor)}"""
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$anchorFields,""" +
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
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_full_last.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    val bySlowest = ok.sortBy(-_._2)
    val head = new StringBuilder(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},""" +
      s""""n_errors":${errors.size},"failed":$failedArr,$anchorFields,""" +
      s""""full":"bench_full_last.json","queries":{""")
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
