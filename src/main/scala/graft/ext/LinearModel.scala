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

  /** Fit on `features` (small non-negative integer columns; an intercept
    * is prepended) against 0/1 `label`, then score every row: output
    * (idCol, y, yhat, margin_sign) where margin_sign ∈ {-1,0,1} is the
    * exact sign of 2·Σ det(Aᵢ)xᵢ − det(A).
    */
  def weakLabelClassifier(docs: DataFrame, features: Seq[Column],
      label: Column, idCol: String = "doc_id"): DataFrame = {
    val d = features.size + 1
    val xs = lit(1L) +: features.map(_.cast("long"))
    // pinned: consumed by the fit aggregate AND the decision projection
    val f = docs.select(
      (col(idCol) +: label.cast("long").as("y") +:
        xs.zipWithIndex.map { case (c, i) => c.as(s"x$i") }): _*)
      .localCheckpoint(false)
    val sums =
      (for (i <- 0 until d; j <- i until d)
        yield sum(col(s"x$i") * col(s"x$j")).as(s"a${i}_$j")) ++
      (0 until d).map(i => sum(col(s"x$i") * col("y")).as(s"b$i")) ++
      (0 until d).map(i => max(col(s"x$i")).as(s"m$i"))
    val g = f.agg(sums.head, sums.tail: _*).collect()(0)
    val a = Array.tabulate(d, d)((i, j) =>
      BigInt(g.getAs[Long](s"a${math.min(i, j)}_${math.max(i, j)}")))
    val b = Array.tabulate(d)(i => BigInt(g.getAs[Long](s"b$i")))
    val det = detBig(a)
    require(det > 0, s"weakLabelClassifier: singular design (det=$det) — " +
      "features are linearly dependent over this corpus")
    val dets = Array.tabulate(d) { k =>
      detBig(Array.tabulate(d, d)((i, j) => if (j == k) b(i) else a(i)(j)))
    }
    // int128 headroom guard: the decision value 2·Σ|detᵢ|·maxXᵢ + det must
    // stay inside Decimal(38,0) / HUGEINT; fail named, never null
    val bound = 2 * (0 until d).map(i =>
      dets(i).abs * BigInt(math.max(g.getAs[Long](s"m$i"), 1L))).sum + det.abs
    require(bound < BigInt(10).pow(37),
      s"weakLabelClassifier: exact-integer decision would overflow " +
        s"(|2Σdetᵢxᵢ-det| bound ~1e${bound.toString.length - 1}); " +
        "demean/scale features or solve in doubles at this corpus size")
    val margin = (0 until d).map(i =>
      lit(new java.math.BigDecimal(dets(i).bigInteger))
        .cast(DecimalType(38, 0)) * col(s"x$i").cast(DecimalType(38, 0)))
      .reduce(_ + _) * lit(2) - lit(new java.math.BigDecimal(det.bigInteger))
    f.select(col(idCol), col("y").cast("int").as("y"),
        margin.as("__m"))
      .select(col(idCol), col("y"),
        (col("__m") >= 0).cast("int").as("yhat"),
        when(col("__m") > 0, 1).when(col("__m") < 0, -1).otherwise(0)
          .cast("int").as("margin_sign"))
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
