package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the cluster-collapse stage of
  * near-duplicate removal: LSH / shared-shingle candidate pairs form a
  * graph, and a whole component must dedup to ONE surviving document
  * (pairwise dedup alone leaves B–C alive after A–B and A–C both drop
  * A's partner — the chain A~B~C is one cluster).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the minimum label among
  * itself and its neighbors; at fixpoint the label is the component's
  * minimum node id — which doubles as the canonical (kept) document id.
  *
  * Scale posture:
  *   - Each round is two shuffles (neighbor-min aggregation keyed by the
  *     propagation target, then the label update join keyed by node) —
  *     all partial+final hash aggregates and equi-joins; no per-node
  *     driver state. The only driver-side scalar is the per-round
  *     changed-label count (the convergence test — same class as the
  *     ingest watermark read).
  *   - Rounds = graph diameter. Dedup graphs are dense blobs of mutual
  *     near-dups, so diameters stay single-digit in practice; `maxIter`
  *     bounds the worst case. (The alternating large-star/small-star
  *     contraction of Kiveris et al. converges in O(log d) rounds and is
  *     the upgrade path if a corpus ever exhibits long chains.)
  *   - `localCheckpoint(eager)` truncates the per-round lineage — an
  *     iterative plan otherwise doubles in depth every round and
  *     re-executes the whole history at each action.
  */
object ConnectedComponents {

  /** Component labels for every node appearing in `edges` (undirected;
    * pass each pair once in either orientation). Output: `node`,
    * `component` (= min node id of the component), both LONG.
    */
  def labels(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    // Symmetrize so one aggregation sees every neighbor of every node.
    val sym = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)

    var labs = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label among each node's neighbors (shuffle 1: by b, then by a)
      val nbrMin = sym
        .join(labs.select(col("node").as("b"), col("component")), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min("component").as("nbr_min"))
      // ONE materialization per round: the updated labels carry a
      // per-row changed flag, so the convergence count is a scan of the
      // just-checkpointed blocks — not a separate join job re-deriving
      // nbrMin × labs (measured: one fewer Spark job per round, which is
      // what fixpoint wall-time is made of at bounded input sizes).
      // New label = min(own, neighbor min); every node in `sym` has a
      // neighbor, so the left-join null arm is a safety net only.
      val updated = labs
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"),
          (coalesce(col("nbr_min"), col("component")) < col("component"))
            .cast("int").as("__changed"))
        .localCheckpoint(true)
      val changed = updated.filter(col("__changed") === 1).count()
      labs = updated.drop("__changed")
      if (changed == 0) converged = true
      iter += 1
    }
    require(converged,
      s"connected components did not converge in $maxIter rounds — " +
        "raise maxIter (graph diameter exceeds the bound)")
    labs
  }

  /** Attach the component id (and its size) to every row of `nodes`:
    * rows absent from the edge graph are singleton components of
    * themselves. Output: nodes' `idCol`, `component`, `cluster_size`.
    */
  def assign(nodes: DataFrame, edges: DataFrame, idCol: String = "doc_id",
      srcCol: String = "a", dstCol: String = "b", maxIter: Int = 25): DataFrame = {
    val labs = labels(edges, srcCol, dstCol, maxIter)
      .withColumnRenamed("node", idCol)
    val assigned = nodes.select(col(idCol).cast("long"))
      .join(labs, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("component"))
    val sizes = assigned.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, Seq("component"))
      .select(col(idCol), col("component"), col("cluster_size"))
  }
}
