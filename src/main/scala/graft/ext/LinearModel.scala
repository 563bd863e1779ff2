package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Weak-label quality classifier — the "train a filter on proxy labels"
  * stage of a pretraining curation pipeline (label a few trusted/untrusted
  * sources, fit a linear probe on cheap per-doc features, score the whole
  * corpus). The fit is linear least squares via the NORMAL EQUATIONS:
  *
  *   A = XᵀX,  b = Xᵀy,  w = A⁻¹b,  ŷ = 1 iff wᵀx ≥ 1/2
  *
  * Exactness device: features are small integers, so A and b are exact
  * 64-bit integer sums (one map-side-combined aggregate — order
  * independent, the only corpus pass). The d×d solve happens on the
  * driver in BigInt via Cramer (A is a Gram matrix of an
  * intercept-bearing full-rank design, so det(A) > 0), and the per-doc
  * decision wᵀx ≥ 1/2 is cross-multiplied into the integer comparison
  *
  *   2·Σᵢ det(Aᵢ)·xᵢ  ≥  det(A)
  *
  * evaluated distributed in Decimal(38,0) — no floating point anywhere,
  * so a DuckDB oracle running the same Leibniz expansion in HUGEINT
  * hash-matches bit for bit.
  *
  * Scale posture: the corpus cost is ONE aggregate of d(d+3)/2 long sums
  * plus one decision projection — both map-side, no shuffle beyond the
  * d²-cell partial merge. The exact-integer Cramer path is the ORACLE
  * device, not the production solver: entries grow ~N·maxX² and det ~
  * entriesᵈ, so int128 headroom runs out around N ≈ 10⁸ docs at 7-bit
  * features (the guard below fails NAMED, never silently). At 100 TB
  * you keep the identical aggregation shape, demean/scale the features,
  * and solve the tiny system in doubles on the driver.
  */
object LinearModel {

  /** Per-row (id, y, x0..xd) feature frame — the only corpus projection
    * both the fit aggregate and the decision read.
    */
  private[graft] def featFrame(docs: DataFrame, features: Seq[Column],
      label: Column, idCol: String,
      passthrough: Seq[String] = Nil): DataFrame = {
    val xs = lit(1L) +: features.map(_.cast("long"))
    docs.select(
      (col(idCol) +: passthrough.map(col) :+ label.cast("long").as("y")) ++
        xs.zipWithIndex.map { case (c, i) => c.as(s"x$i") }: _*)
  }

  /** The fit's SUFFICIENT STATISTICS as one aggregated row: XᵀX cells
    * and Xᵀy as long sums, per-feature maxes for the overflow guard.
    * Integer sums and maxes are associative+commutative, so these
    * partials are MERGEABLE — two batches' stats cell-wise combined
    * ([[mergeStats]]) equal the stats of the concatenated corpus, which
    * is what makes the incremental refit ([[incrementalClassifier]])
    * provably batch-split-invariant.
    */
  def fitStats(feat: DataFrame, d: Int): DataFrame =
    feat.agg(statCells(d).head, statCells(d).tail: _*)

  private def statCells(d: Int): Seq[Column] =
    (for (i <- 0 until d; j <- i until d)
      yield sum(col(s"x$i") * col(s"x$j")).as(s"a${i}_$j")) ++
    (0 until d).map(i => sum(col(s"x$i") * col("y")).as(s"b$i")) ++
    (0 until d).map(i => max(col(s"x$i")).as(s"m$i"))

  /** Cell-wise fold of any number of stats rows: sums add, maxes max. */
  def foldStats(stats: DataFrame, d: Int): DataFrame = {
    val cells =
      (for (i <- 0 until d; j <- i until d)
        yield sum(col(s"a${i}_$j")).as(s"a${i}_$j")) ++
      (0 until d).map(i => sum(col(s"b$i")).as(s"b$i")) ++
      (0 until d).map(i => max(col(s"m$i")).as(s"m$i"))
    stats.agg(cells.head, cells.tail: _*)
  }

  /** Cell-wise fold of two stats rows. */
  def mergeStats(standing: DataFrame, arrival: DataFrame, d: Int): DataFrame =
    foldStats(standing.unionByName(arrival), d)

  /** Subtraction arm of a RETRACTABLE stats fold (round-13, x134): a
    * superseded doc version's contribution leaves the standing
    * statistics EXACTLY by folding in its negation — integer sums have
    * an inverse, the precise contrast to x133's monotone sketch
    * registers, which do not. The guard maxes are the monotone part
    * HERE: max has no inverse either, so they go to 0 in this arm and
    * the fold keeps the HISTORICAL per-feature max — a CONSERVATIVE
    * overflow guard (may fail sooner than the live corpus requires,
    * never later; correctness of the solve never depends on m).
    */
  def negateStats(stats: DataFrame, d: Int): DataFrame = {
    val cells =
      (for (i <- 0 until d; j <- i until d)
        yield (-col(s"a${i}_$j")).as(s"a${i}_$j")) ++
      (0 until d).map(i => (-col(s"b$i")).as(s"b$i")) ++
      (0 until d).map(i => lit(0L).as(s"m$i"))
    stats.select(cells: _*)
  }

  /** Score `docs` with the model solved from an externally-maintained
    * sufficient-statistics row (the x134 standing fold): the
    * [[weakLabelClassifier]] decision path with the fit aggregate
    * replaced by the caller's statistics. Null cells (a fold whose
    * every term skipped a column) read as 0.
    */
  def scoreWithStats(stats: DataFrame, docs: DataFrame,
      features: Seq[Column], label: Column,
      idCol: String = "doc_id"): DataFrame = {
    val d = features.size + 1
    scoreFromStats(stats.na.fill(0L).collect()(0),
      featFrame(docs, features, label, idCol), d, idCol)
  }

  /** Fit on `features` (small non-negative integer columns; an intercept
    * is prepended) against 0/1 `label`, then score every row: output
    * (idCol, y, yhat, margin_sign) where margin_sign ∈ {-1,0,1} is the
    * exact sign of 2·Σ det(Aᵢ)xᵢ − det(A).
    */
  def weakLabelClassifier(docs: DataFrame, features: Seq[Column],
      label: Column, idCol: String = "doc_id",
      passthrough: Seq[String] = Nil): DataFrame = {
    val d = features.size + 1
    // pinned: consumed by the fit aggregate AND the decision projection
    val f = featFrame(docs, features, label, idCol, passthrough)
      .localCheckpoint(false)
    scoreFromStats(fitStats(f, d).collect()(0), f, d, idCol, passthrough)
  }

  /** Incremental refit — the re-aggregatable-partial pattern (HLL/KLL
    * rollups) applied to MODEL FITTING: each arrival batch contributes
    * one stats row, the standing statistics fold cell-wise (O(1) state,
    * O(batch) per arrival — raw history is never re-scanned), and the
    * refit solves from the folded row. Because the fold is exact integer
    * arithmetic, the model after B arrivals is IDENTICAL to the
    * all-at-once fit — so the oracle for the incremental query is the
    * batch SQL, blind to the batching.
    */
  def incrementalClassifier(batches: Seq[DataFrame], features: Seq[Column],
      label: Column, idCol: String = "doc_id"): DataFrame = {
    require(batches.nonEmpty, "incrementalClassifier: no batches")
    val d = features.size + 1
    val feats = batches.map(b =>
      featFrame(b, features, label, idCol).localCheckpoint(false))
    var standing = fitStats(feats.head, d).localCheckpoint(false)
    feats.tail.foreach { f =>
      standing = mergeStats(standing, fitStats(f, d), d).localCheckpoint(false)
    }
    scoreFromStats(standing.collect()(0), feats.reduce(_ unionByName _), d, idCol)
  }

  private def scoreFromStats(g: org.apache.spark.sql.Row, f: DataFrame,
      d: Int, idCol: String, passthrough: Seq[String] = Nil): DataFrame = {
    val a = Array.tabulate(d, d)((i, j) =>
      BigInt(g.getAs[Long](s"a${math.min(i, j)}_${math.max(i, j)}")))
    val b = Array.tabulate(d)(i => BigInt(g.getAs[Long](s"b$i")))
    val det = detBig(a)
    require(det > 0, s"LinearModel: singular design (det=$det) — " +
      "features are linearly dependent over this corpus")
    val dets = Array.tabulate(d) { k =>
      detBig(Array.tabulate(d, d)((i, j) => if (j == k) b(i) else a(i)(j)))
    }
    // int128 headroom guard: the decision value 2·Σ|detᵢ|·maxXᵢ + det must
    // stay inside Decimal(38,0) / HUGEINT; fail named, never null
    val bound = 2 * (0 until d).map(i =>
      dets(i).abs * BigInt(math.max(g.getAs[Long](s"m$i"), 1L))).sum + det.abs
    require(bound < BigInt(10).pow(37),
      s"LinearModel: exact-integer decision would overflow " +
        s"(|2Σdetᵢxᵢ-det| bound ~1e${bound.toString.length - 1}); " +
        "demean/scale features or solve in doubles at this corpus size")
    val margin = (0 until d).map(i =>
      lit(new java.math.BigDecimal(dets(i).bigInteger))
        .cast(DecimalType(38, 0)) * col(s"x$i").cast(DecimalType(38, 0)))
      .reduce(_ + _) * lit(2) - lit(new java.math.BigDecimal(det.bigInteger))
    val pt = passthrough.map(col)
    f.select(col(idCol) +: pt :+ col("y").cast("int").as("y") :+
        margin.as("__m"): _*)
      .select(col(idCol) +: pt :+ col("y") :+
        (col("__m") >= 0).cast("int").as("yhat") :+
        (when(col("__m") > 0, 1).when(col("__m") < 0, -1).otherwise(0)
          .cast("int").as("margin_sign")): _*)
  }

  /** Exact determinant by cofactor expansion — d ≤ ~6 driver-side. */
  private[graft] def detBig(m: Array[Array[BigInt]]): BigInt =
    if (m.length == 1) m(0)(0)
    else (0 until m.length).map { j =>
      val minor = m.drop(1).map(r =>
        r.zipWithIndex.collect { case (v, c) if c != j => v })
      val s = if (j % 2 == 0) BigInt(1) else BigInt(-1)
      s * m(0)(j) * detBig(minor)
    }.sum
}
