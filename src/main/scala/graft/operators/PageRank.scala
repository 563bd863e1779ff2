package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-iteration PageRank over an undirected edge list — the
  * iterative-graph primitive beyond [[ConnectedComponents]]'s reachability:
  * within a near-dup cluster, the highest-PR document is the most-central
  * copy (the one sharing content with the most other copies, weighted by
  * how promiscuous those copies are), a keep-rule signal complementary to
  * x63's quality argmax; on citation/link graphs the same kernel ranks
  * sources for crawl prioritization.
  *
  * Each iteration is the canonical distributed formulation: one join of the
  * edge list against the current rank vector on the source endpoint (plus
  * the precomputed degree), one aggregation of contributions by destination
  * — contributions shuffle on dst, nothing is ever materialized beyond the
  * O(nodes) rank vector. The edge list and degree table are computed once
  * and lazily checkpointed so the 3-deep plan does not re-derive them per
  * iteration.
  *
  * Determinism contract (graft.Q): a naive double PageRank is
  * partition-order-DEPENDENT (float sums over varying neighbor sets), so
  * per-edge contributions `pr/deg` — one IEEE division of
  * exact-decimal-derived doubles — are rounded once to Decimal(38,6) and
  * summed IN DECIMAL; the damping update is two IEEE ops on those exact
  * decimals, rounded once per node per iteration. Constants are emitted via
  * Double.toString round-trip ([[baseSql]]) so the oracle parses identical
  * bit patterns. No dangling-mass redistribution: with an undirected edge
  * list every edge-incident node has out-degree ≥ 1, and isolated nodes
  * simply hold the damping base — mirrored exactly by the oracle.
  */
object PageRank {

  /** `nodes`: one row per vertex (`idCol`). `edges`: unique undirected
    * pairs (`srcCol` < `dstCol` by convention; symmetrized here).
    * Output: `idCol`, `degree` (0 for isolated nodes), `pagerank`
    * (canonical Decimal(38,6) string).
    */
  def run(nodes: DataFrame, edges: DataFrame, idCol: String,
      srcCol: String, dstCol: String, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint(false)
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    // the node-id frame is referenced by p0, every iteration's left join,
    // and the count scalar — checkpoint once so an expensive upstream
    // node derivation (x67's shingle filter) runs once, not 2+iters times
    val ids = nodes.select(col(idCol).as("id")).localCheckpoint(false)
    val n = ids.agg(count(lit(1)).as("n"))
    def dec(c: Column): Column = c.cast(DecimalType(38, 6))
    var pr = ids.crossJoin(broadcast(n))
      .select(col("id"), dec(lit(1.0) / col("n").cast("double")).as("pr"))
    for (_ <- 0 until iters) {
      val contrib = und
        .join(pr.select(col("id").as("src"), col("pr")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"),
          dec(col("pr").cast("double") / col("deg").cast("double")).as("c"))
        .groupBy(col("id")).agg(dec(sum(col("c"))).as("s"))
      pr = ids.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(n))
        .select(col("id"),
          dec(lit(1.0 - damping) / col("n").cast("double") +
            lit(damping) * coalesce(col("s").cast("double"), lit(0.0))).as("pr"))
    }
    pr.join(deg.select(col("src").as("id"), col("deg")), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("deg"), lit(0L)).as("degree"),
        col("pr").cast("string").as("pagerank"))
  }

  /** The damping constants as the exact decimal strings of the doubles the
    * Spark plan uses (Double.toString round-trip — both engines parse the
    * identical bit pattern; note `1.0 - 0.85` is NOT the double nearest
    * 0.15, so the oracle must not write the literal `0.15`).
    */
  def baseSql(damping: Double = 0.85): (String, String) =
    ((1.0 - damping).toString, damping.toString)
}
