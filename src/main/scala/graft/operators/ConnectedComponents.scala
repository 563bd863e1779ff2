package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the cluster-collapse stage of
  * near-duplicate removal: LSH / shared-shingle candidate pairs form a
  * graph, and a whole component must dedup to ONE surviving document
  * (pairwise dedup alone leaves B–C alive after A–B and A–C both drop
  * A's partner — the chain A~B~C is one cluster).
  *
  * Interchangeable algorithms, identical output (`node`, `component` =
  * min node id of the component):
  *
  *   - [[labels]] (default) = [[labelsAdaptive]]: below
  *     [[LocalEdgeThreshold]] edges, ONE single-task union-find
  *     ([[labelsLocal]] — at bounded sizes fixpoint wall-time is job
  *     scheduling, not compute; the same size-adaptive strategy switch
  *     as Spark's broadcast-join threshold); above it, min-label rounds
  *     (the cheapest per round) until fixpoint or a switch threshold, then
  *     contract by the current labels and finish with alternating-star.
  *     Chosen by measurement (SCALING.md round 6, `tools.CcBench`): real
  *     near-dup graphs are dense and SHALLOW — min-label converges in
  *     4-10 rounds and beats alternating-star's heavier rounds there
  *     (x35 graph: 0.99s vs 1.57s) — while the star phase caps the
  *     worst case at threshold + log(diameter) rounds on deep chains
  *     (the round-4-flagged risk; pure min-label pays full diameter,
  *     46.6s vs 7.3s on 1000 diameter-99 chains).
  *   - [[labelsWithRounds]] / star phase: alternating large-star/
  *     small-star contraction (Kiveris et al., "Connected Components in
  *     MapReduce and Beyond", SoCC'14). Rounds grow with log(diameter):
  *     1000 diameter-99 chains converge in 8 alternating rounds vs 100
  *     min-label rounds (measured; CcChainSpec locks the shape at
  *     diameter 40).
  *   - [[labelsMinLabel]]: iterative min-label propagation to fixpoint —
  *     rounds = graph diameter. The independently simple reference
  *     implementation; CcPropertySpec property-tests all variants equal on
  *     random graphs.
  *   - [[labelsHybrid]]: one min-label contraction then stars — measured
  *     slower than both specialists on their home turf (CcBench); kept
  *     as a library variant, not the default.
  *
  * Scale posture (both):
  *   - Every round is a constant number of hash aggregates and
  *     equi-joins over the (checkpointed) edge/label frame — no per-node
  *     driver state. The only driver-side scalars are the per-round
  *     convergence probes (same class as the ingest watermark read).
  *   - `localCheckpoint(eager)` truncates the per-round lineage — an
  *     iterative plan otherwise doubles in depth every round and
  *     re-executes the whole history at each action.
  *   - Star rounds keep edges directed big→small, so `min` aggregates
  *     monotonically shrink targets; the edge set is bounded by the
  *     input edge count throughout (large-star emits one edge per
  *     (node, larger-neighbor) pair, small-star one per (node,
  *     smaller-neighbor) — never a blowup).
  */
object ConnectedComponents {
  // Null contract (all variants): an edge with a null endpoint is
  // dropped before labeling — a null id cannot name a node. Pre-round-8
  // the distributed paths kept half-null edges (emitting a null node
  // row) while the local path NPE'd, so the adaptive size gate gave
  // small and large graphs different null semantics (round-7 advisory);
  // CcPropertySpec now asserts local == distributed on null input.

  /** Large-star: for every node u (over both edge orientations), connect
    * each strictly larger neighbor v > u to m = min(Γ(u) ∪ {u}).
    * Emitted edges always point big→small (v > u ≥ m).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    // No distinct here: smallStar's terminal distinct canonicalizes the
    // round's output, so dedup-ing the intermediate frame would only add
    // an exchange (CcPropertySpec's 5-seed equality property covers this).
    sym.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
  }

  /** Small-star: edges arrive big→small; for every source u, connect u
    * and all its (smaller) targets to m = min of those targets. Keeps
    * the big→small invariant (every emitted source exceeds m).
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min("v").as("m"))
    val rewired = e.join(mins, Seq("u"))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    rewired.union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Component labels for every node appearing in `edges` (undirected;
    * pass each pair once in either orientation). Output: `node`,
    * `component` (= min node id of the component), both LONG.
    * Adaptive min-label→star strategy — see the object doc and
    * [[labelsAdaptiveWithRounds]].
    */
  def labels(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25): DataFrame =
    labelsAdaptiveWithRounds(edges, srcCol, dstCol, maxIter)._1

  /** Pure alternating-star labels plus the number of alternating rounds
    * it took — the observable the long-chain smoke case measures, and
    * the finishing phase of [[labelsAdaptiveWithRounds]].
    */
  def labelsWithRounds(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25): (DataFrame, Int) = {
    // Lazy checkpoint of the raw edge frame: the first action below
    // materializes (caches + lineage-truncates) it, so the upstream edge
    // producer — typically a whole LSH candidate pipeline — runs exactly
    // once, and both derivations (canonical edges now, the node universe
    // at the end) read cached blocks.
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b")).na.drop().localCheckpoint(false)
    // Every node of the input graph, self-loops and isolates-with-self-edge
    // included — the label set must cover them even though the star
    // rounds drop degenerate edges.
    val nodes = e0.select(col("a").as("node"))
      .union(e0.select(col("b").as("node")))
      .distinct()

    // Canonical big→small start state (small-star's input invariant).
    var e = e0.filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint(false)

    // Fixpoint fingerprint: (row count, sum of per-edge xxhash64). Both
    // round frames are distinct sets, so equal (count, checksum) ⇒ set
    // equality (up to a 64-bit hash-sum collision) — replacing the former
    // count() + exceptAll() pair of convergence jobs. The frames are
    // LAZY-checkpointed, so this aggregate doubles as the materializing
    // action: ONE Spark job per round computes the round, caches its
    // blocks, truncates lineage, and reads off the convergence scalars.
    // The hash is summed as decimal: a long sum would overflow (an ANSI
    // error) after a few billion-magnitude hashes.
    def fingerprint(df: DataFrame): (Long, Option[java.math.BigDecimal]) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(20,0)"))).first()
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDecimal(1)))
    }
    var state = fingerprint(e)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextState = fingerprint(next)
      if (nextState == state) converged = true
      e = next
      state = nextState
      iter += 1
    }
    require(converged,
      s"connected components did not converge in $maxIter alternating rounds — " +
        "raise maxIter")
    // Star-forest invariant at the detected fixpoint — insurance against
    // a false fixpoint slipping through the probabilistic fingerprint
    // equality (a ~2^-64 hash-sum collision). Two conditions TOGETHER
    // define a star forest: (1) at most one outgoing edge per node (the
    // label join below cannot fan out), and (2) no edge target is itself
    // an edge source (out-degree alone would accept a chain like
    // 3→2→1, which labels node 3 with 2 instead of 1). Both checked in
    // ONE job / one shuffle: per-node (out-degree, in-degree) via a
    // union-tagged aggregate, then a single-row rollup — a separate
    // semi-join probe for (2) measurably slowed the CC family ~15%.
    val inv = e.select(col("u").as("n"), lit(1L).as("out"), lit(0L).as("in"))
      .unionAll(e.select(col("v").as("n"), lit(0L).as("out"), lit(1L).as("in")))
      .groupBy("n").agg(sum("out").as("o"), sum("in").as("i"))
      .agg(max("o").as("max_out"),
        count_if(col("o") > 0 && col("i") > 0).as("chained"))
      .first()
    require(inv.isNullAt(0) || inv.getLong(0) == 1L,
      "connected components fixpoint is not a star forest — " +
        s"a node has ${inv.getLong(0)} outgoing edges")
    require(inv.isNullAt(0) || inv.getLong(1) == 0L,
      s"connected components fixpoint is not a star forest — ${inv.getLong(1)} nodes are " +
        "both edge source and target (chained state; raise maxIter or report a fingerprint collision)")
    // Fixpoint edges are (node → component-min) stars; roots and
    // self-loop-only nodes label themselves.
    val labs = nodes
      .join(e.select(col("u").as("node"), col("v").as("component")), Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
    (labs, iter)
  }

  /** Hybrid: ONE min-label contraction round, then alternating-star on
    * the contracted graph (round-5 stretch item). Rationale: dedup blob
    * graphs are dense and shallow — a single cheap pass mapping every
    * node to the min of its closed neighborhood collapses most of each
    * blob to its minimum immediately, so the (per-round more expensive)
    * star rounds run on a much smaller edge set; long chains still
    * finish in log rounds because the star phase takes over. Output is
    * identical to [[labels]] (CcPropertySpec property-tests the three variants
    * equal on seeded random graphs).
    *
    * Correctness of the composition: m(u) = min(Γ(u) ∪ {u}) is in u's
    * component, and the global component minimum c has m(c) = c, so
    * contracting (a,b) → (m(a), m(b)) preserves components and keeps
    * each component's minimum as a contracted node; the star phase then
    * labels m(u) with c, and label(u) = label(m(u)) — with u itself (or
    * m(u)) as the fallback for nodes the contraction already isolated.
    */
  def labelsHybrid(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25): DataFrame =
    labelsHybridWithRounds(edges, srcCol, dstCol, maxIter)._1

  /** [[labelsHybrid]] plus total rounds (contraction round included). */
  def labelsHybridWithRounds(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25): (DataFrame, Int) = {
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b")).na.drop().localCheckpoint(false)
    val nodes = e0.select(col("a").as("node"))
      .union(e0.select(col("b").as("node")))
      .distinct()
    // m(u) over the symmetrized graph; nodes with no proper neighbor
    // (isolates, pure self-loops) simply don't appear and fall through
    // the coalesce below.
    val sym = e0.filter(col("a") =!= col("b"))
    val m = sym.select(col("a"), col("b"))
      .union(sym.select(col("b").as("a"), col("a").as("b")))
      .groupBy("a").agg(min("b").as("mn"))
      .select(col("a").as("node"), least(col("a"), col("mn")).as("m"))
      .localCheckpoint(false)
    // contract edges through m on both endpoints; self-loops vanish
    val contracted = sym
      .join(m.select(col("node").as("a"), col("m").as("ma")), Seq("a"))
      .join(m.select(col("node").as("b"), col("m").as("mb")), Seq("b"))
      .filter(col("ma") =!= col("mb"))
      .select(col("ma"), col("mb"))
    val (inner, starRounds) = labelsWithRounds(contracted, "ma", "mb", maxIter)
    val labs = nodes
      .join(m, Seq("node"), "left")
      .select(col("node"), coalesce(col("m"), col("node")).as("mu"))
      .join(inner.select(col("node").as("mu"), col("component")), Seq("mu"), "left")
      .select(col("node"), coalesce(col("component"), col("mu")).as("component"))
    (labs, starRounds + 1)
  }

  /** Reference twin: iterative min-label propagation (rounds = graph
    * diameter). Identical output to [[labels]]; see the object doc.
    */
  def labelsMinLabel(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25): DataFrame =
    labelsMinLabelWithRounds(edges, srcCol, dstCol, maxIter)._1

  /** [[labelsMinLabel]] plus its round count. */
  def labelsMinLabelWithRounds(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25): (DataFrame, Int) = {
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b")).na.drop().localCheckpoint(false)
    val (_, labs, iter, converged) = minLabelRounds(e0, maxIter)
    require(converged,
      s"connected components did not converge in $maxIter rounds — " +
        "raise maxIter (graph diameter exceeds the bound)")
    (labs, iter)
  }

  /** Shared min-label machinery: symmetrized graph + up to `cap`
    * propagation rounds. Returns (sym, labels, rounds, converged) — the
    * caller decides whether non-convergence is an error
    * ([[labelsMinLabelWithRounds]]) or the signal to switch strategies
    * ([[labelsAdaptiveWithRounds]]). All checkpoints are lazy: each
    * round's convergence count doubles as the job that materializes,
    * caches, and lineage-truncates the round's label frame.
    */
  private def minLabelRounds(e0: DataFrame, cap: Int,
      bailOnStall: Boolean = false): (DataFrame, DataFrame, Int, Boolean) = {
    // Symmetrize so one aggregation sees every neighbor of every node.
    val sym = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(false)

    var labs = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
      .localCheckpoint(false)

    var iter = 0
    var converged = false
    var stalled = false
    var prevChanged = Long.MaxValue
    while (!converged && !stalled && iter < cap) {
      // min label among each node's neighbors (shuffle 1: by b, then by a)
      val nbrMin = sym
        .join(labs.select(col("node").as("b"), col("component")), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min("component").as("nbr_min"))
      // ONE materialization per round: the updated labels carry a
      // per-row changed flag, so the convergence count is a scan of the
      // just-cached blocks — not a separate join job re-deriving
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
        .localCheckpoint(false)
      val changed = updated.filter(col("__changed") === 1).count()
      labs = updated.drop("__changed")
      if (changed == 0) converged = true
      // Stall detection (adaptive callers only): on blob graphs — the
      // shape this phase exists for — the changed-count collapses
      // geometrically (a clique settles in one round); on chain-y graphs
      // it stays ~flat (propagation moves a frontier, it doesn't shrink
      // one), and every further min-label round is a wasted diameter
      // step. Bail to the star phase once a round retires < 30% of the
      // previous round's changes (after 3 full rounds, so blobs with a
      // slow first step aren't misread — measured on x53's
      // within-cell similarity graph: 12 capped rounds + 3 star → 3
      // stalled rounds + star, 15 → ~9 total rounds).
      // the >= 64 floor keeps endgame noise (a blob graph's last few
      // stragglers, where 5→4 changes reads as a 0.8 ratio) from
      // triggering a pointless strategy switch two rounds before natural
      // convergence
      else if (bailOnStall && iter >= 2 && changed >= 64L &&
          changed * 10L > prevChanged * 7L)
        stalled = true
      prevChanged = changed
      iter += 1
    }
    (sym, labs, iter, converged)
  }

  /** Edge-count bound under which [[labelsAdaptiveWithRounds]] runs the
    * whole fixpoint as ONE single-task union-find instead of distributed
    * rounds — the same size-adaptive physical-strategy switch Spark
    * itself makes at the broadcast-join threshold. Rationale: at bounded
    * sizes fixpoint wall-time is per-round JOB SCHEDULING, not compute —
    * x53's 1,215-pair cell graph spent ~4.5 s on 8 distributed rounds
    * that a local union-find retires in one task. The crossover is far
    * above the threshold: the ~1,998,000-edge chain forest `CcBench
    * --big` actually generates (range(2M) minus every 1000th edge →
    * 2000 chains) measures 1.37 s local (shuffle-to-one-task included)
    * vs 25.6 s / 14 rounds distributed (SCALING.md round 7). 2^20
    * edges bound the single task at ~100 MB of union-find state
    * (LongMap keys + boxed values for ≤2·edges nodes) — a fraction of
    * executor task memory. Post-blocking dedup graphs are usually this
    * small even at corpus scale (blocking exists precisely to bound
    * them); when they are not, the count gate sends them down the
    * distributed log-diameter path unchanged.
    */
  val LocalEdgeThreshold: Long = 1L << 20

  /** Single-task union-find (union by rank + path compression, then a
    * min-member sweep per root): output contract identical to [[labels]]
    * — every node appearing in `edges` labeled with its component's min
    * node id. CcPropertySpec property-tests it equal to the distributed
    * variants on seeded random graphs.
    */
  def labelsLocal(edges: DataFrame, srcCol: String = "a",
      dstCol: String = "b"): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // null endpoints drop here exactly as they drop out of the
    // distributed path's joins — without the filter, .as[(Long, Long)]
    // NPEs on a null endpoint and small (local-path) graphs would get
    // different null semantics than large ones (round-7 advisory)
    edges.select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .na.drop()
      .as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = new scala.collection.mutable.LongMap[Long]()
        val rank = new scala.collection.mutable.LongMap[Int]()
        def add(x: Long): Unit =
          if (!parent.contains(x)) { parent(x) = x; rank(x) = 0 }
        def find(x0: Long): Long = {
          var r = x0
          while (parent(r) != r) r = parent(r)
          var c = x0
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          add(a); add(b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            val (hi, lo) = if (rank(ra) < rank(rb)) (rb, ra) else (ra, rb)
            parent(lo) = hi
            if (rank(hi) == rank(lo)) rank(hi) += 1
          }
        }
        // snapshot before the sweep: find()'s path compression mutates
        // `parent` and LongMap iteration is not mutation-safe
        val ks = parent.keysIterator.toArray
        val minOf = new scala.collection.mutable.LongMap[Long]()
        ks.foreach { n =>
          val r = find(n)
          if (n < minOf.getOrElse(r, Long.MaxValue)) minOf(r) = n
        }
        ks.iterator.map(n => (n, minOf(find(n))))
      }
      .toDF("node", "component")
  }

  /** The default strategy ([[labels]]): min-label rounds until fixpoint,
    * a progress stall (changed-count no longer collapsing geometrically —
    * the chain-graph signature; see the stall note in `minLabelRounds`),
    * or `switchAfter` rounds, then contract the graph by the current
    * labels and finish with alternating-star. Composition correctness:
    * after k rounds lab(u) = min of u's k-hop neighborhood, which is in
    * u's component, and the component minimum c always has lab(c) = c —
    * so contracting (a,b) → (lab(a), lab(b)) preserves components, keeps
    * each component's min as a contracted node, and the star phase's
    * label of lab(u) IS u's component min.
    *
    * Why this split wins (measured, `tools.CcBench` / SCALING.md round
    * 6): real near-dup graphs converge in ≤10 cheap min-label rounds
    * (x35: 0.99s min-label vs 1.57s alternating-star — at small sizes
    * wall time is per-round job overhead, and a min-label round is one
    * join+agg vs the star round's two transforms + distinct); deep
    * chains — where pure min-label pays full diameter (46.6s vs 7.3s at
    * diameter 99) — hit the switch and finish in log rounds on a graph
    * the first `switchAfter` rounds already shrank by that factor.
    * Worst-case rounds: switchAfter + O(log diameter).
    */
  def labelsAdaptive(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25, switchAfter: Int = 12,
      localThreshold: Long = LocalEdgeThreshold): DataFrame =
    labelsAdaptiveWithRounds(edges, srcCol, dstCol, maxIter, switchAfter,
      localThreshold)._1

  /** [[labelsAdaptive]] plus total rounds across both phases. `maxIter`
    * bounds each phase, not their sum. `localThreshold` is the
    * [[LocalEdgeThreshold]] size gate (0 disables it — the round-count
    * specs pin the distributed machinery that way); the gating count
    * doubles as the job that materializes the lazily-checkpointed edge
    * frame, which the first distributed round needed anyway.
    */
  def labelsAdaptiveWithRounds(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25, switchAfter: Int = 12,
      localThreshold: Long = LocalEdgeThreshold): (DataFrame, Int) = {
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b")).na.drop().localCheckpoint(false)
    if (localThreshold > 0 && e0.count() <= localThreshold)
      return (labelsLocal(e0, "a", "b"), 1)
    val (sym, labs, iter, converged) =
      minLabelRounds(e0, math.min(switchAfter, maxIter), bailOnStall = true)
    if (converged) (labs, iter)
    else {
      val contracted = sym.filter(col("a") =!= col("b"))
        .join(labs.select(col("node").as("a"), col("component").as("la")), Seq("a"))
        .join(labs.select(col("node").as("b"), col("component").as("lb")), Seq("b"))
        .filter(col("la") =!= col("lb"))
        .select(col("la"), col("lb"))
      val (inner, starRounds) = labelsWithRounds(contracted, "la", "lb", maxIter)
      val out = labs
        .join(inner.select(col("node").as("component"), col("component").as("__final")),
          Seq("component"), "left")
        .select(col("node"), coalesce(col("__final"), col("component")).as("component"))
      (out, iter + starRounds)
    }
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

  /** Incremental component maintenance: fold a batch of NEW edges into a
    * standing `(node, component)` assignment WITHOUT re-labeling the
    * edge history — the production path when near-dup graphs grow by
    * arrival (re-running full CC per batch re-shuffles every edge ever
    * seen; this touches O(batch) plus one standing relabel join).
    *
    * Equivalence to full CC over all edges ever folded: every standing
    * component is CONTRACTED to its representative (= its min node id),
    * batch edges are rewritten into representative space plus implicit
    * node→rep links, and the mini-CC over that contracted graph labels
    * each touched representative with the minimum representative it now
    * connects to. Contraction preserves connectivity, and since each
    * rep was already the minimum of its old cluster, the minimum over
    * merged reps IS the minimum over all member nodes — so labels stay
    * the canonical min-node-id convention, batch after batch, in any
    * arrival order (CcIncrementalSpec asserts equality with the
    * from-scratch [[assign]] and idempotence under re-fold).
    *
    * Cost shape: the mini-CC is O(batch edges); the remap (touched old
    * rep → new rep) is bounded by batch node count and BROADCAST into
    * the standing relabel, so the standing table is one map-side pass —
    * never shuffled on the component key. Nodes never seen in any edge
    * are absent from the output (the [[assign]] coalesce convention adds
    * them as singletons at read time).
    */
  def incrementalAssign(standing: DataFrame, edges: DataFrame,
      srcCol: String = "a", dstCol: String = "b", maxIter: Int = 25): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b")).na.drop()
    val st = standing.select(col("node").cast("long").as("node"),
      col("component").cast("long").as("component"))
    // batch nodes with their current representative (their own id when
    // unseen); pinned — the contracted edges and the new-node split both
    // consume it
    val bn = e0.select(col("a").as("node")).union(e0.select(col("b").as("node")))
      .distinct()
      .join(st, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("rep"),
        col("component").isNotNull.as("seen"))
      .localCheckpoint(false)
    val er = e0
      .join(bn.select(col("node").as("a"), col("rep").as("ra")), Seq("a"))
      .join(bn.select(col("node").as("b"), col("rep").as("rb")), Seq("b"))
      .select(col("ra").as("a"), col("rb").as("b"))
    // mini-CC in representative space; every batch node's rep appears
    // (each batch node is an edge endpoint), so this is total over bn
    val miniLabels = labels(er, maxIter = maxIter).localCheckpoint(false)
    val remap = miniLabels.select(col("node").as("component"),
      col("component").as("__new"))
    val relabeled = st.join(broadcast(remap), Seq("component"), "left")
      .select(col("node"), coalesce(col("__new"), col("component")).as("component"))
    val newNodes = bn.filter(!col("seen"))
      .join(miniLabels.select(col("node").as("rep"), col("component")), Seq("rep"))
      .select(col("node"), col("component"))
    relabeled.unionByName(newNodes)
  }

  /** Deletion maintenance — [[incrementalAssign]]'s subtractive partner,
    * the "forget these documents" pass a corpus under deletion requests
    * runs: drop `deleted` nodes from a standing `(node, component)`
    * assignment and re-label ONLY the components they touched. Removal
    * is harder than growth: a deleted node can be the BRIDGE holding a
    * component together, so its loss may split one component into many —
    * which no local patch detects. The honest unit of rework is the
    * affected component, and nothing else:
    *
    *   1. deletion set and the (few) affected component ids are
    *      broadcast;
    *   2. unaffected standing rows pass through in one map-side filter
    *      (never shuffled);
    *   3. the edge history is scanned once, filtered to SURVIVING
    *      affected nodes on both endpoints (a component-partitioned
    *      edge store turns that scan into partition pruning at 100 TB);
    *   4. mini-CC re-labels the O(affected-component) surviving
    *      subgraph; survivors isolated by the deletion fall back to
    *      singleton own-id labels.
    *
    * Labels keep the canonical min-node-id convention (mini-CC over raw
    * surviving nodes, not contracted reps — contraction is unsound here
    * because the old rep may be deleted or split away). Equivalence to
    * from-scratch CC over the surviving edge set is asserted in
    * CcIncrementalSpec (seeded random graphs + the bridge-split case).
    *
    * The surviving-affected-node filters are deliberately UNHINTED:
    * deletions usually touch small components (AQE broadcasts them),
    * but a deletion landing in a corpus-scale component degrades to a
    * shuffle join instead of an executor OOM.
    */
  def removeAssign(standing: DataFrame, edges: DataFrame,
      deleted: DataFrame, srcCol: String = "a", dstCol: String = "b",
      maxIter: Int = 25): DataFrame = {
    val del = deleted.select(col("node").cast("long").as("node")).distinct()
      .localCheckpoint(false)
    val st = standing.select(col("node").cast("long").as("node"),
      col("component").cast("long").as("component"))
    val ac = st.join(broadcast(del), Seq("node"))
      .select(col("component")).distinct().localCheckpoint(false)
    val unaffected = st.join(broadcast(ac), Seq("component"), "left_anti")
      .select(col("node"), col("component"))
    // surviving members of affected components; pinned — feeds the two
    // edge-endpoint filters and the final singleton coalesce
    val surv = st.join(broadcast(ac), Seq("component"), "left_semi")
      .join(broadcast(del), Seq("node"), "left_anti")
      .select(col("node")).localCheckpoint(false)
    val e = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b")).na.drop()
      .join(surv.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(surv.select(col("node").as("b")), Seq("b"), "left_semi")
    val relabeled = surv
      .join(labels(e, maxIter = maxIter), Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
    unaffected.unionByName(relabeled)
  }
}
