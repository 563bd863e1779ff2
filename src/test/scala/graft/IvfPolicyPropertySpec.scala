package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Seeded lifecycle fuzz for the gauge-triggered IVF refit policy
  * (round-14, x140): random re-embed/delete scripts replayed against an
  * INDEPENDENT in-memory reimplementation of the whole loop —
  * per-arrival assignment against the then-current structure, install
  * fit, integer TV gauge, strict-> trigger, refit (deterministic
  * policy: the two smallest live ids), re-assignment, fit re-stamp.
  * The engine's policy log, final structure, and final stored
  * assignments must all match the replay exactly. The designed x140
  * script fires on one known wave; this pins arbitrary firing
  * patterns, including none and several.
  */
class IvfPolicyPropertySpec extends SparkSuite {
  import spark.implicits._

  private val Dim = 8
  private val NDocs = 6
  private val NWaves = 4
  private val ThresholdBp = 2500L

  private def vec(rnd: scala.util.Random): Array[Float] =
    Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < Dim) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def argmaxCell(v: Array[Float], cents: Seq[(Long, Array[Float])]): Long = {
    val scored = cents.map { case (id, c) => id -> cos(v, c) }
    val best = scored.maxBy(_._2)._2
    // refuse near-ties: a 1-ulp engine-vs-replay difference must not be
    // able to flip the assignment this test compares
    val sorted = scored.map(_._2).sorted.reverse
    if (sorted.size > 1)
      assert(sorted.head - sorted(1) > 1e-9, "degenerate near-tie in the fuzz corpus — reseed")
    scored.filter(_._2 == best).map(_._1).min
  }

  private def tvBp(now: Map[Long, Long], fit: Map[Long, Long]): Long = {
    val (nn, nf) = (now.values.sum, fit.values.sum)
    if (nn == 0L || nf == 0L) 10000L
    else (now.keySet ++ fit.keySet).toSeq
      .map(c => math.abs(now.getOrElse(c, 0L) * nf - fit.getOrElse(c, 0L) * nn))
      .sum * 10000L / (2L * nn * nf)
  }

  private def runSeed(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val initCents = Seq(100L -> vec(rnd), 101L -> vec(rnd))
    val waves: Seq[Seq[(Long, Option[Array[Float]])]] = (0 until NWaves).map { w =>
      val actions = (0L until NDocs).flatMap { id =>
        val r = rnd.nextDouble()
        if (w == 0 || r < 0.35) Some(id -> Some(vec(rnd)))
        else if (r < 0.5) Some(id -> None)
        else None
      }
      if (actions.nonEmpty) actions else Seq(0L -> Some(vec(rnd)))
    }

    // ---- independent replay ------------------------------------------
    val liveVec = mutable.Map[Long, Array[Float]]()
    val liveCell = mutable.Map[Long, Long]()
    var cents = initCents
    var fit: Option[Map[Long, Long]] = None
    var fitSeq = -1L
    val expectedLog = mutable.Buffer[(Long, Long, Long, Boolean)]()
    waves.zipWithIndex.foreach { case (w, b) =>
      w.foreach {
        case (id, Some(v)) =>
          liveVec(id) = v; liveCell(id) = argmaxCell(v, cents)
        case (id, None) =>
          liveVec.remove(id); liveCell.remove(id)
      }
      val occ = liveCell.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }.toMap
      val nLive = occ.values.sum
      if (fit.isEmpty) {
        fit = Some(occ); fitSeq = b.toLong
        expectedLog += ((b.toLong, nLive, 0L, false))
      } else {
        val tv = tvBp(occ, fit.get)
        val fired = nLive > 0 && tv > ThresholdBp
        expectedLog += ((b.toLong, nLive, tv, fired))
        if (fired) {
          cents = liveVec.keys.toSeq.sorted.take(2).map(id => id -> liveVec(id))
          liveVec.foreach { case (id, v) => liveCell(id) = argmaxCell(v, cents) }
          fit = Some(liveCell.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }.toMap)
          fitSeq = b.toLong
        }
      }
    }

    // ---- engine run ---------------------------------------------------
    val root = tempDir(s"graft-ivfpol-prop$seed")
    waves.zipWithIndex.foreach { case (w, i) =>
      writeWaveTo(root + "/src", i,
        w.map { case (id, v) => (id, v.orNull) }.toDF("vec_id", "embedding"))
    }
    val stream = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
    StreamingIngest.ivfPolicyStream(stream, root + "/vecs", root + "/versions",
      root + "/ckpt", initCents.toDF("vec_id", "embedding"),
      root + "/cents", root + "/fit", root + "/gauge", ThresholdBp,
      centroidPolicy = df => df.orderBy(col("vec_id")).limit(2)
        .select(col("vec_id"), col("embedding")))
    val gotLog = StreamingIngest.ivfPolicyLog(spark, root + "/gauge")
      .orderBy(col("wave")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(gotLog == expectedLog.toSeq,
      s"seed $seed: policy log diverged\n engine: $gotLog\n replay: ${expectedLog.toSeq}")
    val gotCents = spark.read.parquet(root + "/cents")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(gotCents == cents.map(_._1).toSet,
      s"seed $seed: final structure diverged (engine $gotCents, replay ${cents.map(_._1).toSet})")
    val gotCells = StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
      .select(col("vec_id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCells == liveCell.toMap,
      s"seed $seed: final stored assignments diverged")
    assert(spark.read.parquet(root + "/fit").select("fit_seq").head().getLong(0) == fitSeq,
      s"seed $seed: fit reference stamped at the wrong seq")
    // round-15 (r14 verdict item 5): the standing additive occupancy
    // view the gauge now reads must be bit-equal to the O(live)
    // group-by it replaced — under arbitrary churn INCLUDING refits
    // (which reset it) and deletions (subtract-only waves)
    val viewOcc = StreamingIngest.readOccView(spark, root + "/vecs").get._1
    val groupByOcc = StreamingIngest.resolvedIvfVectors(
        spark, root + "/vecs", root + "/versions")
      .groupBy(col("cell_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viewOcc == groupByOcc,
      s"seed $seed: occupancy view diverged from the O(live) group-by " +
        s"(view $viewOcc, truth $groupByOcc)")
    assert(viewOcc == liveCell.values.groupBy(identity)
        .map { case (c, xs) => c -> xs.size.toLong }.toMap,
      s"seed $seed: occupancy view diverged from the replay")

    // ---- bucketed twin (round-15): the SAME waves through
    // ivfPolicyStreamBucketed must match the SAME replay — policy log,
    // final structure, stored assignments, and the occupancy view
    val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
    val (vt, vv) = (s"ivfpb_${tag}_vecs", s"ivfpb_${tag}_vers")
    try {
      val bstream = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
      StreamingIngest.ivfPolicyStreamBucketed(bstream, vt, vv, root + "/bckpt",
        initCents.toDF("vec_id", "embedding"),
        root + "/bcents", root + "/bfit", root + "/bgauge", ThresholdBp,
        centroidPolicy = df => df.orderBy(col("vec_id")).limit(2)
          .select(col("vec_id"), col("embedding")),
        buckets = 4)
      val bLog = StreamingIngest.ivfPolicyLog(spark, root + "/bgauge")
        .orderBy(col("wave")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
      assert(bLog == expectedLog.toSeq,
        s"seed $seed: BUCKETED policy log diverged\n engine: $bLog\n replay: ${expectedLog.toSeq}")
      assert(spark.read.parquet(root + "/bcents")
        .select("vec_id").collect().map(_.getLong(0)).toSet == cents.map(_._1).toSet,
        s"seed $seed: bucketed final structure diverged")
      assert(StreamingIngest.resolvedIvfVectorsBucketed(spark, vt, vv)
        .select(col("vec_id"), col("cell_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap == liveCell.toMap,
        s"seed $seed: bucketed final stored assignments diverged")
      assert(StreamingIngest.readOccView(spark, root + "/bgauge").get._1
        == viewOcc, s"seed $seed: bucketed occupancy view diverged")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $vt")
      spark.sql(s"DROP TABLE IF EXISTS $vv")
    }
  }

  test("seeded random churn: the engine's policy log, structure, and assignments match an independent replay of the whole control loop") {
    Seq(5L, 23L, 404L).foreach(runSeed)
  }

  // ---- occ-view staleness heal (round-16, the r15 ADVICE medium) --------
  // The one-batch delta in updateOccView is only valid against a base
  // stamped exactly batchId-1. A view lost in the swap-rename crash
  // window, a deleted _occ_view dir, or a resume of a pre-view stream
  // previously fed the delta an EMPTY/stale base: subtracting a
  // re-embedded doc's old cell then wedged the negative-count require()
  // on every replay. The heal rebuilds the base from the batchId-capped
  // full group-by (the packWatermarkBefore idiom). These tests drive the
  // real streams wave-by-wave (same checkpoint, AvailableNow) and
  // vandalize the view between invocations.

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rmrf))
    p.delete(); ()
  }

  private def copyDir(src: java.io.File, dst: java.io.File): Unit = {
    dst.mkdirs()
    Option(src.listFiles()).foreach(_.foreach { f =>
      val t = new java.io.File(dst, f.getName)
      if (f.isDirectory) copyDir(f, t)
      else java.nio.file.Files.copy(f.toPath, t.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    })
  }

  test("occ-view heal: a deleted view dir and a stale-stamped view both rebuild from the capped resolve instead of wedging (round-16 ADVICE)") {
    // two far-apart centroids so a re-embed provably MOVES cells: the
    // old code's empty-base delta then drives that cell negative
    val e1 = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    def near(base: Array[Float], eps: Float): Array[Float] =
      base.zipWithIndex.map { case (v, i) => if (i == 7) eps else v }
    val initCents = Seq(100L -> e1, 101L -> e2)
    val root = tempDir("graft-ivfpol-heal")
    val viewDir = new java.io.File(
      StreamingIngest.occViewDir(root + "/vecs"))
    def runWaves(): Unit = {
      val stream = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
      StreamingIngest.ivfPolicyStream(stream, root + "/vecs", root + "/versions",
        root + "/ckpt", initCents.toDF("vec_id", "embedding"),
        root + "/cents", root + "/fit", root + "/gauge", 9999L)
    }
    def truthOcc(): Map[Long, Long] =
      StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
        .groupBy(col("cell_id")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // wave 0: docs 0-2 in cell 100's basin, doc 3 in 101's
    writeWaveTo(root + "/src", 0, Seq(
      0L -> near(e1, 0.01f), 1L -> near(e1, 0.02f),
      2L -> near(e1, 0.03f), 3L -> near(e2, 0.01f))
      .toDF("vec_id", "embedding"))
    runWaves()
    assert(StreamingIngest.readOccView(spark, root + "/vecs").get._1 == truthOcc())
    // CASE 1 — view dir lost entirely (pre-view resume / deleted dir):
    // wave 1 re-embeds doc 3 across the basin boundary; the old code's
    // empty base went {cell(101): -1} and wedged
    rmrf(viewDir)
    writeWaveTo(root + "/src", 1, Seq(3L -> near(e1, 0.04f))
      .toDF("vec_id", "embedding"))
    runWaves()
    val afterHeal = StreamingIngest.readOccView(spark, root + "/vecs").get
    assert(afterHeal._1 == truthOcc(),
      s"healed view diverged from the group-by truth: $afterHeal vs ${truthOcc()}")
    assert(afterHeal._2 == 1L, "healed view must carry the healing batch's stamp")
    // CASE 2 — STALE view (stamp older than batchId-1): restore a copy
    // of the stamp-1 view after wave 2 lands, then wave 3 must refuse
    // the one-batch delta against it and rebuild
    val staleCopy = new java.io.File(root + "/view-stale-copy")
    copyDir(viewDir, staleCopy)
    writeWaveTo(root + "/src", 2, Seq(0L -> near(e2, 0.05f))
      .toDF("vec_id", "embedding"))
    runWaves() // view now stamped 2
    rmrf(viewDir); copyDir(staleCopy, viewDir) // view stamped 1, next batch is 3
    writeWaveTo(root + "/src", 3, Seq(1L -> near(e2, 0.06f))
      .toDF("vec_id", "embedding"))
    runWaves()
    val afterStale = StreamingIngest.readOccView(spark, root + "/vecs").get
    assert(afterStale._1 == truthOcc(),
      s"stale-stamp heal diverged: $afterStale vs ${truthOcc()}")
    assert(afterStale._2 == 3L)
  }

  test("occ-view heal: bucketed loop — deleted view dir rebuilds from the bucketed capped resolve (round-16 ADVICE)") {
    val e1 = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    def near(base: Array[Float], eps: Float): Array[Float] =
      base.zipWithIndex.map { case (v, i) => if (i == 7) eps else v }
    val initCents = Seq(100L -> e1, 101L -> e2)
    val root = tempDir("graft-ivfpol-healb")
    val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
    val (vt, vv) = (s"ivfheal_${tag}_vecs", s"ivfheal_${tag}_vers")
    try {
      def runWaves(): Unit = {
        val stream = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
        StreamingIngest.ivfPolicyStreamBucketed(stream, vt, vv, root + "/ckpt",
          initCents.toDF("vec_id", "embedding"),
          root + "/cents", root + "/fit", root + "/gauge", 9999L, buckets = 4)
      }
      def truthOcc(): Map[Long, Long] =
        StreamingIngest.resolvedIvfVectorsBucketed(spark, vt, vv)
          .groupBy(col("cell_id")).count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      writeWaveTo(root + "/src", 0, Seq(
        0L -> near(e1, 0.01f), 1L -> near(e2, 0.02f))
        .toDF("vec_id", "embedding"))
      runWaves()
      rmrf(new java.io.File(StreamingIngest.occViewDir(root + "/gauge")))
      writeWaveTo(root + "/src", 1, Seq(1L -> near(e1, 0.03f))
        .toDF("vec_id", "embedding"))
      runWaves()
      val healed = StreamingIngest.readOccView(spark, root + "/gauge").get
      assert(healed._1 == truthOcc(),
        s"bucketed healed view diverged: $healed vs ${truthOcc()}")
      assert(healed._2 == 1L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $vt")
      spark.sql(s"DROP TABLE IF EXISTS $vv")
    }
  }

  test("occupancyDriftBp: counts past 2^31 read exactly (round-15, r14 verdict item 2 — the Long fold wrapped here and could misfire the policy)") {
    // hand-computable case whose old Long numerator provably wrapped:
    // (3/4, 1/4) vs (1/4, 3/4) at 4e9 per side — num = 1.6e19 > 2^63.
    // TV distance of the distributions is exactly 1/2 = 5000 bp.
    val big = 1000000000L
    assert(StreamingIngest.occupancyDriftBp(
      Map(0L -> 3 * big, 1L -> big), Map(0L -> big, 1L -> 3 * big)) == 5000L)
    // identical huge distributions read 0, not a wrapped artifact
    assert(StreamingIngest.occupancyDriftBp(
      Map(0L -> 5 * big, 1L -> 7 * big), Map(0L -> 5 * big, 1L -> 7 * big)) == 0L)
    // scale invariance: TV depends only on the distributions, and the
    // floored integer quotient scales exactly (num and denominator both
    // pick up k^2) — so the gauge at k=1e9 must agree bit-for-bit with
    // the small-count evaluation the Long-era arithmetic handled. The
    // small-count side doubles as the independent reference: it agrees
    // with this spec's own Long-fold replay (tvBp) where that is exact.
    val rnd = new scala.util.Random(77L)
    (1 to 50).foreach { _ =>
      val cells = 1 + rnd.nextInt(20)
      val now = (0 until cells).map(c => c.toLong -> (rnd.nextInt(100) + 1).toLong).toMap
      val fit = (0 until cells).map(c => c.toLong -> (rnd.nextInt(100) + 1).toLong).toMap
      val small = StreamingIngest.occupancyDriftBp(now, fit)
      assert(small == tvBp(now, fit), "small-count gauge must match the Long reference")
      val scaled = StreamingIngest.occupancyDriftBp(
        now.map { case (k, v) => k -> v * big }, fit.map { case (k, v) => k -> v * big })
      assert(scaled == small,
        s"gauge not scale-exact at 1e9x: $scaled vs $small on $now vs $fit")
    }
    // degenerate conventions survive huge counts
    assert(StreamingIngest.occupancyDriftBp(Map.empty, Map(0L -> 9 * big)) == 10000L)
    assert(StreamingIngest.occupancyDriftBp(Map(0L -> 9 * big), Map.empty) == 10000L)
  }
}
