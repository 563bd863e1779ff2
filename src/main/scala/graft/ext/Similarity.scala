package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity
import graft.operators.Ranks

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`): brute-force cosine top-k as the correctness
  * baseline, random-hyperplane LSH bucketing as the scale path.
  *
  * Scale posture: brute force broadcasts the (small) query set and scans
  * the corpus once — fine for O(queries × corpus) flops when queries are
  * few; the LSH variant turns candidate generation into an equi-join on a
  * bucket id, which shuffles on the bucket key and never materializes the
  * cross product — the shape to run at 10^9 vectors (buckets ≈ IVF cells).
  */
object Similarity {

  /** Exact top-k cosine neighbors of each query vector via one scan of
    * the corpus; queries broadcast. Deterministic: double accumulation in
    * array order, ties broken by neighbor id.
    *
    * Top-K per query runs through the bounded-heap aggregate
    * ([[graft.functions.TopKByScore]]): partial aggregation caps each
    * mapper at k candidates per query, so the shuffle carries
    * O(queries × k) rows — the window formulation (`knnBruteWindow`)
    * shuffles the entire scored candidate set.
    */
  def knnBrute(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    topKRanked(scoredCandidates(queries, corpus), k)

  /** Shared rank tail of every knn* variant: bounded-heap top-k per qid,
    * flattened to (qid, rank, neighbor_id).
    */
  private def topKRanked(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("qid"))
      .agg(graft.functions.top_k_by(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"))

  /** Window-based formulation, kept as the reference implementation the
    * aggregate is tested against.
    */
  def knnBruteWindow(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    Ranks.topKPerGroup(scoredCandidates(queries, corpus), Seq("qid"), k,
        Seq(col("sim").desc, col("neighbor_id")))
      .select(col("qid"), col("rank"), col("neighbor_id"))

  /** Hard-negative mining for contrastive/embedding training: for each
    * anchor vector, the top-k most-similar corpus vectors with a
    * DIFFERENT label — maximally confusable non-matches, the negatives
    * that actually move a contrastive loss. Same cost shape as
    * [[knnBrute]] (anchors broadcast, bounded-heap top-k); the label
    * inequality rides the join condition so the heap never sees
    * positives. At corpus scale swap the scored-candidates side for the
    * LSH/IVF candidate generators exactly as the knn* family does.
    * Output: `qid, rank, neighbor_id, neg_label`.
    */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = anchors.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      col("label").as("q_label"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
      col("label").as("neg_label"))
    val scored = c.join(broadcast(q),
        col("neighbor_id") =!= col("qid") && col("neg_label") =!= col("q_label"))
      .withColumn("sim", cosine_similarity(col("qv"), col("nv")))
    val ranked = scored.groupBy(col("qid"))
      .agg(graft.functions.top_k_by(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"))
    // labels ride back via one map-side join: the O(anchors × k) ranked
    // frame broadcasts over the corpus, never the other way around
    c.select(col("neighbor_id"), col("neg_label"))
      .join(broadcast(ranked), Seq("neighbor_id"))
      .select(col("qid"), col("rank"), col("neighbor_id"), col("neg_label"))
  }

  private def scoredCandidates(queries: DataFrame, corpus: DataFrame): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    c.join(broadcast(q), col("neighbor_id") =!= col("qid"))
      .withColumn("sim", cosine_similarity(col("qv"), col("nv")))
  }

  val Planes = 8
  val Dim = 64

  /** Deterministic ±1 hyperplane matrix for a given dimension (splitmix64
    * of the flat index) — seeds are code, not data, so every run and
    * every executor agrees. Public (round-2) so the DuckDB oracles can
    * embed the literal sign matrix and reproduce buckets bit-exactly.
    */
  def planeSigns(dim: Int): Array[Array[Double]] =
    Array.tabulate(Planes, dim) { (p, d) =>
      if ((graft.functions.splitmix64(p * dim + d + 1) & 1L) == 1L) 1.0 else -1.0
    }

  val JlDim = 16

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix (Achlioptas
    * 2003: ±1 entries preserve pairwise distances in expectation exactly
    * like Gaussian projections, at integer-multiply cost), `JlDim × dim`.
    * Seed stream is offset from [[planeSigns]]'s so the two matrices are
    * independent; seeds are code, not data, so every executor and the
    * DuckDB oracle agree on the literal matrix.
    */
  def jlSigns(dim: Int): Array[Array[Double]] =
    Array.tabulate(JlDim, dim) { (p, d) =>
      if ((graft.functions.splitmix64(0x51000000L + p * dim + d) & 1L) == 1L) 1.0 else -1.0
    }

  /** JL projection R^dim → R^JlDim: component p = Σ_d sign(p,d)·v_d,
    * computed as the same left-associated zip_with fold as [[lshBucket]]
    * (±1 multiplies are exact, so the oracle mirrors the sum as signed
    * adds bit-for-bit). Dimension mismatch fails loudly, as lshBucket.
    */
  def jlProject(v: Column, dim: Int = Dim): Column = {
    val signs = jlSigns(dim)
    val proj = array((0 until JlDim).map { p =>
      val plane = array(signs(p).toIndexedSeq.map(lit): _*)
      aggregate(zip_with(v, plane, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
    when(size(v) === dim, proj).otherwise(raise_error(
      concat(lit(s"jlProject: expected $dim-dim embedding, got "), size(v).cast("string"))))
  }

  /** KNN in the JL-projected space: the dimensionality-reduction scale
    * path for brute-force ANN — at 100 TB the projected corpus is
    * dim/JlDim (4×) smaller in bytes and every distance costs JlDim
    * multiplies instead of dim, while JL's distance-preservation bound
    * keeps top-k recall high (measured against exact x06 in
    * SimilaritySpec). Projection is map-side; per-vector norms are
    * computed once at projection time; candidate scoring is the x06
    * broadcast + bounded-heap shape, so shuffles carry O(queries × k).
    * Rank-only output (fp-eval-independent: both engines run the same
    * IEEE sums — see the oracle's mirrored fold order).
    */
  def knnJl(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def projectedWithNorm(df: DataFrame, id: String, p: String, n: String): DataFrame =
      df.select(col("vec_id").as(id), jlProject(col("embedding")).as(p))
        .withColumn(n, sqrt(dot(col(p), col(p))))
    val q = projectedWithNorm(queries, "qid", "qp", "qn")
    val c = projectedWithNorm(corpus, "neighbor_id", "np", "nn")
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("qid"))
      .withColumn("sim", dot(col("qp"), col("np")) / (col("qn") * col("nn")))
    scored.groupBy(col("qid"))
      .agg(graft.functions.top_k_by(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"))
  }

  /** Random-hyperplane LSH bucket id (0..2^Planes-1) of an embedding.
    * Vectors whose length differs from `dim` fail loudly (raise_error)
    * instead of silently collapsing into one bucket — a dimension
    * mismatch would otherwise degrade every LSH consumer to an O(n²)
    * single-bucket self-join.
    */
  def lshBucket(v: Column, dim: Int = Dim): Column = {
    val signs = planeSigns(dim)
    val bucket = (0 until Planes).map { p =>
      val plane = array(signs(p).toIndexedSeq.map(lit): _*)
      val dot = aggregate(
        zip_with(v, plane, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    when(size(v) === dim, bucket).otherwise(raise_error(
      concat(lit(s"lshBucket: expected $dim-dim embedding, got "), size(v).cast("string"))))
  }

  /** IVF-style ANN: partition the corpus into cells around C centroids
    * (deterministic stride sample of the corpus itself — a kmeans init,
    * not the iterated fit, which is enough for a cell structure), then
    * restrict each query's candidates to its `nprobe` nearest cells.
    *
    * Scale path: centroids are broadcast-sized (C ≪ corpus); cell
    * assignment is one broadcast join + argmax; candidate generation is
    * an equi-join on cell id. At 10^9 vectors this is the inverted-file
    * layout every vector store uses; recall grows with nprobe.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cells = centroids.select(col("vec_id").as("cell_id"), col("embedding").as("cv"))
    corpus.join(broadcast(cells))
      .withColumn("csim", cosine_similarity(col("embedding"), col("cv")))
      .groupBy(col("vec_id"), col("embedding"))
      .agg(graft.functions.top_k_by(col("csim"), col("cell_id"), 1).as("top"))
      .select(col("vec_id"), col("embedding"), col("top").getItem(0).getField("id").as("cell_id"))
  }

  /** Lloyd refinement of an IVF centroid set: assign every vector to its
    * nearest centroid, replace each centroid with the element-wise mean
    * of its members. Each iteration is one broadcast join + one
    * aggregation over (cell, dimension) — no all-pairs work, so iterating
    * stays linear in the corpus. A cell that loses every member keeps its
    * previous centroid (deterministic empty-cell retention, round-2:
    * silent attrition shrank the cell structure and with it nprobe's
    * effective coverage).
    */
  def kmeansIterate(corpus: DataFrame, centroids: DataFrame, iters: Int): DataFrame = {
    var cents = centroids
    for (_ <- 0 until iters) {
      val updated = ivfAssign(corpus, cents)
        .select(col("cell_id"), posexplode(col("embedding")))
        .groupBy(col("cell_id"), col("pos"))
        .agg(avg(col("col")).as("v"))
        .groupBy(col("cell_id"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("v")))),
          e => e.getField("v").cast("float")).as("embedding"))
        .select(col("cell_id").as("vec_id"), col("embedding").as("__new"))
      cents = cents.select(col("vec_id"), col("embedding").as("__prev"))
        .join(updated, Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("__new"), col("__prev")).as("embedding"))
    }
    cents
  }

  /** Deterministic CLUSTERED corpus derived from an existing embedding
    * table: `v_i = center(i % k) + scale · e_i`, where cluster `j`'s
    * center is the RAW embedding of row `j · anchorStride` (existing
    * corpus rows as centers — no literal matrices, so the DuckDB oracle
    * reproduces every float with the same join + per-element
    * `CAST(c[d] AS DOUBLE) + scale * CAST(e[d] AS DOUBLE)`). Output
    * embeddings are `array<double>`.
    *
    * Purpose (round-10 verdict item): x89 measures IVF/IVF-PQ recall on
    * the deliberately WORST-case uniform-cosine corpus, where cell
    * pruning has nothing to exploit. Real embedding corpora cluster;
    * this derivation plants that structure with known geometry — with
    * the default `k = 13` (coprime to the stride-62 centroid sampling:
    * 62·m mod 13 = 10m mod 13 walks every residue), every cluster owns
    * at least one stride-sampled IVF cell anchor, so the same index
    * parameters that read recall 0.58 on uniform data can show what
    * the structure actually buys. `scale = 0.3` keeps clusters coherent
    * (within-cluster cosine ≈ 1/(1+scale²) ≈ 0.92 when centers and
    * perturbations are near-orthogonal) while leaving enough
    * within-cluster spread for rankings to be non-trivial.
    * `centerStride = 38` keeps every center row present down to the
    * 500-row sf0.01 corpus (12 · 38 = 456) — a larger stride silently
    * drops whole clusters where the center row does not exist.
    */
  /** Anchor-presence prechecks already paid, keyed by the corpus plan's
    * canonical-form fingerprint + derivation params (round-11 ADVICE;
    * key strengthened round-12 ADVICE): the eager distinct + left-anti
    * collect turned these lazy builders into ones launching Spark jobs
    * at construction, and bench paths construct them repeatedly — same
    * corpus plan + same params ⇒ same verdict, so one paid check covers
    * every later call this JVM. The key combines an md5 of the
    * CANONICALIZED analyzed plan's string form WITH the 32-bit
    * `semanticHash()` (rationale at [[planFingerprint]]) — a 32-bit
    * collision between two different corpora would have silently
    * skipped the fail-fast for the second one, which is exactly the
    * failure the check exists to catch; at 128+32 bits that path is
    * gone for file-backed plans, and the structural hash still pins
    * in-memory relations whose string form omits their data.
    * Values are only ever `true` (a failed check throws). Documented
    * residual (accepted): a caller that MUTATES the data under an
    * identical plan (same path, rewritten files) re-uses the verdict —
    * the transform's output is still correct, but a newly-missing
    * anchor row fails lazily (silently smaller corpus) instead of via
    * the named require. Bench/registry corpora are immutable testdata,
    * and a mutating caller can construct from a fresh path to re-arm.
    */
  private val anchorsChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int, Long, Long)]()

  private[ext] def planFingerprint(df: DataFrame): String = {
    // ALL THREE components on purpose (round-13 review): the md5 of the
    // canonicalized string form widens the 32-bit hash to 128 bits for
    // plan STRUCTURE (operators, filters, schema) — but a
    // LogicalRelation's string form does NOT name its file paths (they
    // enter plan equality only through the file index's 32-bit
    // hashCode) and a LocalRelation's string form omits its DATA, so
    // the digest explicitly folds in every leaf relation's root paths,
    // and the structural semanticHash (which does cover LocalRelation
    // data) rides along. Any one alone mis-caches a case the others pin:
    // same-schema corpora at different paths collide in the bare string,
    // different in-memory corpora collide in string+paths, and 32 bits
    // alone is the collision window the round-12 ADVICE flagged.
    val analyzed = df.queryExecution.analyzed
    val leafPaths = analyzed.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      case _ => Nil
    }
    val canonMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest((analyzed.canonicalized.toString + " " +
        leafPaths.mkString("|")).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    canonMd5 + ":" + analyzed.semanticHash()
  }

  def clusteredCorpus(emb: DataFrame, k: Int = 13, centerStride: Long = 38L,
      scale: Double = 0.3): DataFrame = {
    val centers = emb.select(col("vec_id").as("__aid"), col("embedding").as("__cv"))
    // Named precondition (round-11 ADVICE): the inner join below DROPS
    // every row of a cluster whose center row (vec_id = (id%k)*stride)
    // is absent — a non-contiguous or too-small corpus would silently
    // shrink the derived corpus instead of failing. The needed-center
    // set is ≤ k ids, so the check is one column-pruned aggregate over
    // vec_id plus a bounded collect — paid once per (corpus, params).
    val cacheKey = (planFingerprint(emb), k, centerStride, -1L)
    if (!anchorsChecked.contains(cacheKey)) {
      val needed = emb
        .select((pmod(col("vec_id"), lit(k)) * centerStride).as("__aid")).distinct()
      val missing = needed.join(centers.select(col("__aid")), Seq("__aid"), "left_anti")
        .orderBy(col("__aid")).limit(k + 1)
        .collect().map(_.getLong(0))
      require(missing.isEmpty,
        s"clusteredCorpus: center rows missing for vec_id(s) ${missing.mkString(", ")} " +
          s"(k=$k, centerStride=$centerStride) — every (id % k) * centerStride must " +
          "exist as a corpus vec_id or its whole cluster would be silently dropped")
      anchorsChecked.add(cacheKey)
    }
    emb.select(col("vec_id"), col("embedding"),
        (pmod(col("vec_id"), lit(k)) * centerStride).as("__aid"))
      .join(broadcast(centers), Seq("__aid"))
      .select(col("vec_id"),
        zip_with(col("__cv"), col("embedding"),
          (c, e) => c.cast("double") + lit(scale) * e.cast("double")).as("embedding"))
  }

  /** [[clusteredCorpus]] with ANISOTROPIC (diagonally stretched)
    * residuals — the round-11 corpus for the fitted-codebook A/B:
    * `v_i = center(i % k) + scale · (stretch ⊙ e_i)`, where `stretch`
    * is the raw embedding of one fixed anchor row (`stretchId`) applied
    * ELEMENTWISE — so the within-cluster spread has per-dimension
    * standard deviation proportional to `|stretch_d|` instead of the
    * isotropic cloud [[clusteredCorpus]] plants. This is the structure
    * [[pqResidualCodebooksFitted]] exists to find (real embedding
    * corpora carry direction-dependent residual variance; the isotropic
    * corpus deliberately lacks it, which is why fitting LOST recall
    * there — SCALING.md round-10): per subspace, Lloyd re-allocates
    * codewords along the high-variance dimensions and lowers
    * quantization MSE, while the init codebook is 16 raw residual
    * samples whose placement ignores the ellipse's shape. Measured
    * (StructuredCorpusSpec / SCALING.md round-11): fitted BEATS init at
    * every shortlist here — 0.52→0.60 / 0.72→0.82 / 0.92→0.98 at
    * shortlist 12/24/48, sf0.1 — the exact reversal of the isotropic
    * table. Deliberately CONTINUOUS (no sub-lobes): mass concentrated
    * at points makes fitted codewords land exactly on the lobes, ties
    * every same-lobe approx score, and the shortlist then admits by id
    * — the raw-PQ collapse pathology reappearing one level down, and
    * why a two-sub-centers-per-cell design measured WORSE than init at
    * shortlist 12 when this corpus was built.
    *
    * Same deterministic existing-rows-as-anchors derivation as
    * [[clusteredCorpus]] (no literal matrices), so a DuckDB oracle
    * reproduces every float with two joins and one fused per-element
    * expression. All anchor ids are checked present (the round-11
    * clusteredCorpus precondition); defaults keep
    * `max(12·38, 7) = 456 < 500`, the sf0.01 corpus floor.
    */
  def structuredCorpus(emb: DataFrame, k: Int = 13, centerStride: Long = 38L,
      stretchId: Long = 7L, scale: Double = 0.3): DataFrame = {
    val anchors = emb.select(col("vec_id").as("__aid"), col("embedding").as("__av"))
    val centerId = pmod(col("vec_id"), lit(k)) * centerStride
    val cacheKey = (planFingerprint(emb), k, centerStride, stretchId)
    if (!anchorsChecked.contains(cacheKey)) {
      val needed = emb.select(centerId.as("__aid"))
        .unionByName(emb.sparkSession.range(1).select(lit(stretchId).as("__aid")))
        .distinct()
      val missing = needed.join(anchors.select(col("__aid")), Seq("__aid"), "left_anti")
        .orderBy(col("__aid")).limit(k + 2)
        .collect().map(_.getLong(0))
      require(missing.isEmpty,
        s"structuredCorpus: anchor rows missing for vec_id(s) ${missing.mkString(", ")} " +
          s"(k=$k, centerStride=$centerStride, stretchId=$stretchId)")
      anchorsChecked.add(cacheKey)
    }
    emb.select(col("vec_id"), col("embedding"), centerId.as("__cid"),
        lit(stretchId).as("__sid"))
      .join(broadcast(anchors.select(col("__aid").as("__cid"), col("__av").as("__cv"))), Seq("__cid"))
      .join(broadcast(anchors.select(col("__aid").as("__sid"), col("__av").as("__sv"))), Seq("__sid"))
      .select(col("vec_id"),
        zip_with(col("__cv"),
          zip_with(col("__sv"), col("embedding"),
            (s, e) => lit(scale) * s.cast("double") * e.cast("double")),
          (c, se) => c.cast("double") + se).as("embedding"))
  }

  def strideCentroids(corpus: DataFrame, c: Int): DataFrame = {
    // deterministic stride sample over vec_id as the centroid set: the
    // first c stride hits BY ID (an unordered limit would pick an
    // arbitrary, partitioning-dependent subset once the corpus has more
    // than c stride hits — round-2 review finding)
    val stride = math.max(1L, 1000L / c)
    corpus.select(col("vec_id"), col("embedding"))
      .filter(pmod(col("vec_id"), lit(stride)) === 0 &&
        col("vec_id") < lit(stride * c))
  }

  def knnIvf(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int, assignedOpt: Option[DataFrame] = None): DataFrame = {
    // assignedOpt: a caller composing several probes of the same index
    // (x89/x92 run the IVF and IVF-PQ ladders side by side) passes the
    // checkpointed ivfAssign output once instead of paying N×C twice
    val indexed = assignedOpt.getOrElse(ivfAssign(corpus, centroids))
    val cells = centroids.select(col("vec_id").as("cell_id"), col("embedding").as("cv"))
    // each query probes its nprobe nearest cells
    val probes = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(broadcast(cells))
      .withColumn("csim", cosine_similarity(col("qv"), col("cv")))
      .groupBy(col("qid"), col("qv"))
      .agg(graft.functions.top_k_by(col("csim"), col("cell_id"), nprobe).as("top"))
      .select(col("qid"), col("qv"), explode(col("top.id")).as("cell_id"))
    val scored = indexed.select(col("cell_id"), col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("qid"))
      .withColumn("sim", cosine_similarity(col("qv"), col("nv")))
    topKRanked(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: candidates from shared LSH
    * buckets, kept when cosine ≥ threshold — the vector-space member of
    * the dedup family (exact / MinHash / SimHash / embedding).
    */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val withBucket = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding")).as("bucket"))
    val a = withBucket.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine_similarity(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
    // no distinct: each vector lives in exactly one bucket, so a pair can
    // appear at most once (unlike the multi-band MinHash join)
  }

  /** Greedy batch-vs-standing-index embedding dedup verdicts (round-8)
    * — the batch API under `StreamingIngest.embeddingDedupStream`, and
    * the vector twin of `TextDedup.incrementalDedupBanded`: a batch
    * vector KEEPS iff nothing in the standing index (any id) and no
    * smaller-id rival in its own batch sits above `threshold` cosine in
    * its LSH bucket. Exact-cosine verification; per-batch cost
    * O(batch · touched buckets).
    *
    * Round 9: the corpus probe and the in-batch rival probe are TWO
    * separate bucket equi-joins whose dup ids union, instead of one
    * join against an index∪rivals union frame. Semantics are identical
    * (corpus rivals matched at any id via the old id Long.MinValue
    * sentinel; now they simply carry no id predicate), but the index
    * side of the corpus join is a BARE scan — so when the standing
    * index is a bucketed-on-`bucket` catalog table
    * (`Bucketing.writeBucketed`), its HashPartitioning satisfies the
    * join's clustering and the planner shuffles only the batch side.
    * The union form structurally forbade that: a union of index and
    * batch frames has no single table layout, so the corpus-sized index
    * re-shuffled EVERY batch — the dominant per-batch cost at scale
    * (EmbDedupStreamSpec locks the plan contrast, the
    * IncrementalDedupSpec pattern).
    * Output: `vec_id, bucket, embedding, keep` (1 = survivor).
    *
    * Round-13 `excludeSelf`: under the versioned-index regime a doc's
    * UPDATE probes an index still serving its own previous version, and
    * "near-dup of your own last crawl" is not a dedup signal — when
    * true, index matches with the batch row's own `vec_id` are dropped
    * (the `incrementalDedupBanded` flag; the index frame must then
    * carry `vec_id`). Default false keeps the byte-identical original
    * plan: the index side stays a BARE (bucket, embedding) scan so a
    * bucketed standing index still avoids the per-batch re-shuffle.
    */
  def embeddingDedupVerdicts(indexVectors: DataFrame, batch: DataFrame,
      threshold: Double, excludeSelf: Boolean = false): DataFrame = {
    // reuse a caller-materialized bucket column when present (the fused
    // streaming loop checkpoints ONE bucketing pass for both the probe
    // and the index append); otherwise bucket here
    val bucketed =
      if (batch.columns.contains("bucket"))
        batch.select(col("vec_id"), col("embedding"), col("bucket"))
      else batch.select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding")).as("bucket"))
    val corpusSide =
      if (excludeSelf)
        indexVectors.select(col("bucket"), col("embedding").as("vx"),
          col("vec_id").as("__id_x"))
      else indexVectors.select(col("bucket"), col("embedding").as("vx"))
    val corpusJoined = corpusSide.join(bucketed, Seq("bucket"))
    val corpusDups =
      (if (excludeSelf) corpusJoined.filter(col("__id_x") =!= col("vec_id"))
       else corpusJoined)
      .filter(cosine_similarity(col("embedding"), col("vx")) >= threshold)
      .select(col("vec_id"))
    val rivalDups = bucketed.join(
        bucketed.select(col("bucket"), col("embedding").as("vx"),
          col("vec_id").as("id_x")), Seq("bucket"))
      .filter(col("id_x") < col("vec_id"))
      .filter(cosine_similarity(col("embedding"), col("vx")) >= threshold)
      .select(col("vec_id"))
    val dups = corpusDups.unionAll(rivalDups)
      .distinct().withColumn("__dup", lit(1))
    bucketed.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"), col("embedding"),
        when(col("__dup").isNotNull, 0).otherwise(1).as("keep"))
  }

  /** Semantic decontamination (round-8): for every EVAL vector, how
    * many train-split vectors sit above `threshold` cosine in its LSH
    * bucket — the embedding-space analogue of the gram-overlap
    * decontamination (x30/x46): paraphrased or re-rendered benchmark
    * content shares no 5-gram but still lands next to its source in
    * embedding space. Candidates come from the shared-bucket equi-join
    * (never a cross product); `max_cos` is an exact float MAX (single
    * comparisons, no accumulation — deterministic cross-engine, the
    * x15 precedent), and every eval vector keeps a row (zero-hit evals
    * report 0/null/0). Output:
    * `eval_id, n_train_hits, max_cos, contaminated`.
    */
  def semanticDecontamination(corpus: DataFrame, isEval: Column,
      threshold: Double): DataFrame = {
    val withBucket = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding")).as("bucket"), isEval.as("is_eval"))
    val eval = withBucket.filter(col("is_eval"))
      .select(col("bucket"), col("vec_id").as("eval_id"), col("embedding").as("ev"))
    val train = withBucket.filter(!col("is_eval"))
      .select(col("bucket"), col("vec_id").as("train_id"), col("embedding").as("tv"))
    val hits = eval.join(train, Seq("bucket"))
      .withColumn("cs", cosine_similarity(col("ev"), col("tv")))
      .filter(col("cs") >= threshold)
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_train_hits"), max(col("cs")).as("max_cos"))
    corpus.filter(isEval).select(col("vec_id").as("eval_id"))
      .join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_train_hits"), lit(0L)).as("n_train_hits"),
        col("max_cos"),
        (coalesce(col("n_train_hits"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  /** ANN recall@k as DATA (round-8): per query, how many of the exact
    * top-k an approximate variant recovered — the x73/x75 pattern
    * (justify the approximation with a measured table, not a claim)
    * applied to the knn family; `tools.RecallSweep` is its ad-hoc
    * ancestor. Both inputs are (qid, rank, neighbor_id) frames from any
    * two knn* variants. All-integer output (`recall_bp` in basis
    * points), so the row is oracle-exact. Cost: one equi-join + one agg
    * over O(queries × k) rows — free next to either knn pass.
    * Output: `qid, n_true, n_hits, recall_bp`.
    */
  def annRecall(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("qid"), col("neighbor_id"))
      .join(approx.select(col("qid"), col("neighbor_id")).withColumn("__hit", lit(1)),
        Seq("qid", "neighbor_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hits"))
      .select(col("qid"), col("n_true"), col("n_hits"),
        expr("CAST(n_hits * 10000 DIV n_true AS BIGINT)").as("recall_bp"))

  /** Rank-sensitive retrieval eval — MRR's per-query row: where does the
    * true best neighbor (exact rank-1) land in the approximate system's
    * top-k? `rank_in_sys` 0 means missed; `rr_fp` is the reciprocal rank
    * in exact fixed point (10⁶ DIV rank — no float, so it hash-matches
    * cross-engine; mean(rr_fp)/10⁶ is MRR@k). Complements [[annRecall]]:
    * recall says WHETHER the truth was retrieved, MRR says how highly it
    * was ranked. One O(queries) join of two already-bounded rank frames.
    */
  def retrievalMrr(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.filter(col("rank") === 1).select(col("qid"), col("neighbor_id"))
      .join(approx.select(col("qid"), col("neighbor_id"),
          col("rank").cast("long").as("rank_in_sys")),
        Seq("qid", "neighbor_id"), "left")
      .select(col("qid"), col("neighbor_id").as("true_top1"),
        coalesce(col("rank_in_sys"), lit(0L)).as("rank_in_sys"),
        coalesce(expr("CAST(1000000 DIV rank_in_sys AS BIGINT)"), lit(0L))
          .as("rr_fp"))

  /** Multi-probe LSH: each query also probes the `Planes` buckets at
    * Hamming distance 1 from its own (one hyperplane bit flipped) —
    * the standard recall lever that costs (Planes+1)× candidates
    * instead of another full hash table.
    */
  def knnLshMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      lshBucket(col("embedding")).as("bucket0"))
    val probes = col("bucket0") +:
      (0 until Planes).map(p => col("bucket0").bitwiseXOR(lit(1 << p)))
    val probed = q.select(col("qid"), col("qv"),
      explode(array(probes: _*)).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
      lshBucket(col("embedding")).as("bucket"))
    val scored = c.join(broadcast(probed), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("qid"))
      .withColumn("sim", cosine_similarity(col("qv"), col("nv")))
    topKRanked(scored, k)
  }

  /** Scalar int8 quantization of the embedding column (symmetric
    * max-abs linear — the faiss `SQ8`/vector-store memory layout):
    * per vector, `scale = 127 / max|v_i|` and `code_i = floor(v_i ·
    * scale)` ∈ [-128, 127]. A 4× memory cut (and the prerequisite for
    * int8-SIMD distance kernels) that costs ~0.4% max relative error per
    * component at 64 dims — the standard first compression step before
    * IVF/PQ at 10^9-vector scale. Map-side only: no shuffle, no state.
    *
    * Determinism (what makes x37 oracle-able): max of floats is exact,
    * the one division and each product are single IEEE double ops, and
    * `floor` — unlike `round` — has no tie convention to disagree on
    * across engines. All-zero vectors take scale 0 and all-zero codes
    * rather than a NaN-poisoned division.
    *
    * Output: vec_id, max_abs, scale, codes (array<long>), plus the exact
    * integer code_sum used by the oracle hash check.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val maxAbs = array_max(transform(col("embedding"), x => abs(x))).cast("double")
    emb
      .select(col("vec_id"), col("embedding"), maxAbs.as("max_abs"))
      .withColumn("scale",
        when(col("max_abs") === 0.0, lit(0.0)).otherwise(lit(127.0) / col("max_abs")))
      .withColumn("codes",
        transform(col("embedding"), x => floor(x.cast("double") * col("scale"))))
      .withColumn("code_sum",
        aggregate(col("codes"), lit(0L), (acc, v) => acc + v))
      .drop("embedding")
  }

  val PqM = 8 // subspaces
  val PqK = 16 // codewords per subspace

  /** Product-quantization codebooks derived deterministically from the
    * corpus: codeword `k` of subspace `j` is the j-th subvector of the
    * k-th stride-sampled corpus vector ([[strideCentroids]] — the same
    * "sample IS the init" move as the IVF cells; a k-means-refined
    * codebook would drop in without changing the encode shape). Output:
    * (subspace, code 0..k-1, codeword array<float>) — m·k rows, always
    * broadcast-sized (PQ codebooks are kilobytes at any corpus scale).
    */
  def pqCodebooks(corpus: DataFrame, m: Int = PqM, k: Int = PqK, dim: Int = Dim): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // single-partition window over k rows — dense deterministic code ids
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    strideCentroids(corpus, k)
      .withColumn("code", (row_number().over(w) - 1).cast("long"))
      .select(col("code"), explode(sequence(lit(0), lit(m - 1))).as("subspace"), col("embedding"))
      .select(col("subspace"), col("code"),
        slice(col("embedding"), col("subspace") * subDim + 1, lit(subDim)).as("codeword"))
  }

  /** Residualize a corpus against an IVF cell structure: each vector
    * becomes `v − centroid(cell(v))` (FAISS-IVFPQ's quantization input —
    * residuals concentrate near the origin once cells capture the
    * coarse structure, so the same codeword budget spends itself on the
    * fine, within-cell differences instead of re-describing the cell).
    * Output keeps `cell_id` (the decode side adds the centroid back);
    * `embedding` is the residual as `array<double>`. One broadcast
    * assign + one map-side zip_with — no extra shuffle over [[ivfAssign]].
    */
  def residualize(corpus: DataFrame, centroids: DataFrame): DataFrame =
    residualizeAssigned(ivfAssign(corpus, centroids), centroids)

  /** [[residualize]] for a frame that already carries `cell_id` (e.g.
    * the [[ivfAssign]] output a caller is reusing) — skips the second
    * assignment pass, which is the expensive half.
    */
  def residualizeAssigned(assigned: DataFrame, centroids: DataFrame): DataFrame =
    assigned
      .join(broadcast(centroids.select(col("vec_id").as("cell_id"),
        col("embedding").as("__cv"))), Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        zip_with(col("embedding"), col("__cv"),
          (a, b) => a.cast("double") - b.cast("double")).as("embedding"))

  /** Residual-PQ codebooks (round-10, the documented FAISS-parity gap):
    * codewords are the RESIDUALS of an offset-stride corpus sample
    * against the same cell structure the index probes — offset 31 so the
    * sample is disjoint from the stride-62 cell anchors, whose own
    * residuals are zero and would collapse the codebook. Same
    * deterministic sample-IS-the-init move as [[pqCodebooks]]; output
    * shape identical (subspace, code, codeword), codewords
    * `array<double>`.
    */
  def pqResidualCodebooks(corpus: DataFrame, centroids: DataFrame,
      m: Int = PqM, k: Int = PqK, dim: Int = Dim): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val sample = corpus.select(col("vec_id"), col("embedding"))
      .filter(pmod(col("vec_id"), lit(62L)) === 31 &&
        col("vec_id") < lit(31L + 62L * k))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    residualize(sample, centroids)
      .withColumn("code", (row_number().over(w) - 1).cast("long"))
      .select(col("code"), explode(sequence(lit(0), lit(m - 1))).as("subspace"), col("embedding"))
      .select(col("subspace"), col("code"),
        slice(col("embedding"), col("subspace") * subDim + 1, lit(subDim)).as("codeword"))
  }

  /** Lloyd-refined residual-PQ codebooks (round-10, the fidelity lever
    * the raw-vs-residual A/B left on the table): start from the
    * sample-is-the-init [[pqResidualCodebooks]] and run `iters` k-means
    * iterations PER SUBSPACE over every corpus residual's subvector —
    * the FAISS training step. Each iteration is one broadcast join +
    * bounded-heap argmin + one fixed-point mean aggregate per
    * (subspace, code); the deterministic empty-code retention and the
    * floor(x·1e6) integer means are the [[kmeansFitExact]] idiom, so a
    * DuckDB oracle could replay the fit bit-exactly if one is ever
    * registered. Cost: iters corpus passes at training time; the
    * SEARCH shape is unchanged — fitted codebooks drop into
    * [[knnIvfPq]] wherever the init codebooks did.
    *
    * Measured caveat (SCALING.md round-10): on the SYNTHETIC clustered
    * corpus, whose residuals are isotropic by construction, fitting
    * REDUCES recall (0.32 → 0.26 at shortlist 12) — Lloyd means on
    * structureless data contract codeword norms ~26% (0.145 → 0.108,
    * converged by iteration 2, `tools.CbNormProbe`), tilting the
    * reconstruction toward the centroid and washing out within-cell
    * cosine discrimination. The trainer earns its corpus passes only
    * when residuals have structure to find — which real embedding
    * corpora have and the synthetic perturbations deliberately lack.
    */
  def pqResidualCodebooksFitted(corpus: DataFrame, centroids: DataFrame,
      iters: Int = 2, m: Int = PqM, k: Int = PqK, dim: Int = Dim): DataFrame = {
    val subDim = dim / m
    val scale = 1000000L
    val pts = residualize(corpus, centroids)
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("subspace"), col("embedding"))
      .select(col("subspace"), col("vec_id"),
        slice(col("embedding"), col("subspace") * subDim + 1, lit(subDim)).as("sub"))
      .localCheckpoint(false)
    val dimSums = (1 to subDim).map(i =>
      sum(floor(element_at(col("sub"), i) * scale).cast("long")).as(s"__s$i"))
    val dimMeans = array((1 to subDim).map(i =>
      col(s"__s$i").cast("double") / (col("n") * lit(scale)).cast("double")): _*)
    var cb = pqResidualCodebooks(corpus, centroids, m, k, dim).localCheckpoint(false)
    for (_ <- 0 until iters) {
      val d2 = aggregate(
        zip_with(col("sub"), col("codeword"),
          (x, c) => (x.cast("double") - c.cast("double")) * (x.cast("double") - c.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
      val assigned = pts.join(broadcast(cb), Seq("subspace"))
        .withColumn("d2", d2)
        .groupBy(col("subspace"), col("vec_id"), col("sub"))
        .agg(graft.functions.top_k_by(-col("d2"), col("code"), 1).as("top"))
        .select(col("subspace"), col("sub"),
          col("top").getItem(0).getField("id").as("code"))
      val means = assigned.groupBy(col("subspace"), col("code"))
        .agg(count(lit(1)).as("n"), dimSums: _*)
        .select(col("subspace"), col("code"), dimMeans.as("__new"))
      cb = cb.select(col("subspace"), col("code"), col("codeword").as("__prev"))
        .join(means, Seq("subspace", "code"), "left")
        .select(col("subspace"), col("code"),
          coalesce(col("__new"), col("__prev")).as("codeword"))
        .localCheckpoint(false)
    }
    cb
  }

  /** Collect a codebook table into per-subspace codeword literals — the
    * model-artifact collect exception (the TextStats language-profile
    * class): k·m rows ≈ kilobytes at ANY corpus scale, by construction.
    * Returns (per-subspace codewords ordered by code, element-is-float).
    */
  private def codebookArrays(codebooks: DataFrame, m: Int)
      : (IndexedSeq[Seq[Seq[Double]]], Boolean) = {
    val isFloat = codebooks.schema("codeword").dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    val rows = codebooks
      .select(col("subspace").cast("int"), col("code").cast("long"), col("codeword"))
      .collect()
    val byS = (0 until m).map { j =>
      rows.filter(_.getInt(0) == j).sortBy(_.getLong(1)).toSeq
        .map(_.getSeq[Any](2).map {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d.doubleValue()
        }.toSeq)
    }
    (byS, isFloat)
  }

  private def codebookLit(cws: Seq[Seq[Double]], isFloat: Boolean): Column =
    if (isFloat) typedlit(cws.map(_.map(_.toFloat)))
    else typedlit(cws)

  /** PQ encode (faiss-PQ shape, the 10^9-vector memory layout: m log2(k)
    * bits per vector instead of 4·dim bytes): each vector splits into `m`
    * subvectors; each subvector takes the code of its L2-nearest codeword
    * in that subspace.
    *
    * Round-10 shape: MAP-SIDE via the [[graft.functions.PqCodesExpr]]
    * codegen kernel with the codebooks bound as a reference object —
    * zero shuffles, one fused loop per row, exactly how a production
    * encoder runs (FAISS encodes against in-memory codebooks; at 10^9
    * vectors the previous explode + broadcast-join + two-aggregate form
    * shuffled O(N·m) rows for a model artifact measured in kilobytes).
    * The float→double widening of codewords is exact, squared distances
    * accumulate left-to-right in double, and argmin ties break to the
    * smallest code — so codes are bit-identical to the exchange form,
    * property-pinned in ExtSpec and replayed by x38's oracle.
    * [[pqEncodeExchange]] keeps the dataflow form as the reference twin.
    * Output: vec_id, c0..c{m-1}.
    */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int = PqM, dim: Int = Dim): DataFrame = {
    val subDim = dim / m
    val (byS, _) = codebookArrays(codebooks, m)
    val cwsArr: Array[Array[Array[Double]]] =
      byS.map(_.map(_.toArray).toArray).toArray
    val codes = graft.functions.pq_codes(col("embedding"), cwsArr, subDim)
    // the per-code element_at projections collapse onto ONE kernel eval
    // per row: PqCodesExpr is registered in ExtractExpensiveSubexpressions
    corpus.select(col("vec_id"), codes.as("__codes"))
      .select((col("vec_id") +:
        (0 until m).map(j => element_at(col("__codes"), j + 1).as(s"c$j"))): _*)
  }

  /** The original exchange-based encode (explode → broadcast join →
    * bounded-heap argmin → pivot), kept as the reference twin the
    * map-side form is property-tested code-identical against.
    */
  def pqEncodeExchange(corpus: DataFrame, codebooks: DataFrame, m: Int = PqM, dim: Int = Dim): DataFrame = {
    val subDim = dim / m
    val sub = corpus
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("subspace"), col("embedding"))
      .select(col("vec_id"), col("subspace"),
        slice(col("embedding"), col("subspace") * subDim + 1, lit(subDim)).as("sub"))
    val d2 = aggregate(
      zip_with(col("sub"), col("codeword"),
        (x, c) => (x.cast("double") - c.cast("double")) * (x.cast("double") - c.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    // top_k_by ranks (score desc, id asc): score = -d2 → min distance,
    // ties to the smallest code
    val best = sub.join(broadcast(codebooks), Seq("subspace"))
      .withColumn("d2", d2)
      .groupBy(col("vec_id"), col("subspace"))
      .agg(graft.functions.top_k_by(-col("d2"), col("code"), 1).as("top"))
      .select(col("vec_id"), col("subspace"), col("top").getItem(0).getField("id").as("code"))
    val wide = (0 until m).map(j =>
      max(when(col("subspace") === j, col("code"))).as(s"c$j"))
    best.groupBy(col("vec_id")).agg(wide.head, wide.tail: _*)
  }

  /** PQ decode: rebuild the quantized approximation of each vector by
    * concatenating its m codewords. Round-10 shape: a pure projection —
    * each codeword is an `element_at` into the literal codebook
    * (kilobytes), so decode adds NO join and no exchange; ranking
    * against the reconstruction still computes exactly what an ADC scan
    * computes (distance decomposes over subspaces), so [[pqDecode]] + a
    * brute rank IS the PQ ANN search path, just without the LUT
    * constant-factor trick a SIMD kernel would add.
    * [[pqDecodeJoin]] keeps the join form as the reference twin.
    */
  def pqDecode(codes: DataFrame, codebooks: DataFrame, m: Int = PqM): DataFrame = {
    val (byS, isFloat) = codebookArrays(codebooks, m)
    val parts = (0 until m).map { j =>
      element_at(codebookLit(byS(j), isFloat), (col(s"c$j") + 1).cast("int"))
    }
    codes.select(col("vec_id"), concat(parts: _*).as("embedding"))
  }

  /** The original join-based decode, kept as the reference twin. */
  def pqDecodeJoin(codes: DataFrame, codebooks: DataFrame, m: Int = PqM): DataFrame = {
    val joined = (0 until m).foldLeft(codes) { (df, j) =>
      val cbj = codebooks.filter(col("subspace") === j)
        .select(col("code").as(s"c$j"), col("codeword").as(s"cw$j"))
      df.join(broadcast(cbj), Seq(s"c$j"))
    }
    joined.select(col("vec_id"),
      concat((0 until m).map(j => col(s"cw$j")): _*).as("embedding"))
  }

  /** IVF-PQ composite ANN (round 9) — the production-standard layout
    * (FAISS IVFPQ) assembled from the two proven halves: the inverted
    * file restricts candidates to the query's `nprobe` nearest cells
    * ([[knnIvf]]'s probe), and within those cells candidates are scored
    * against their PQ RECONSTRUCTIONS ([[pqDecode]] — mathematically
    * the ADC scan, the x39 note) so the index carries only
    * `(vec_id, cell_id, m codes)` per vector: ~9 bytes instead of
    * 4·dim. The approx scores cut a `shortlist` per query
    * (bounded-heap, no window), and ONLY the shortlist joins back to
    * raw embeddings for the exact re-rank — the standard
    * compressed-first/exact-last ladder, so full vectors are touched
    * O(queries · shortlist) times, never O(queries · corpus/C · nprobe).
    * `residual = true` (round-10, the FAISS-parity default): candidates
    * are PQ-encoded as RESIDUALS against their cell centroid
    * ([[residualize]], codebooks from [[pqResidualCodebooks]]) and the
    * reconstruction adds the centroid back — same search shape, the
    * codeword budget spent on within-cell differences. `residual =
    * false` keeps the raw-vector form (codebooks from [[pqCodebooks]])
    * for A/B contrast.
    * Output: `qid, rank, neighbor_id` — the knn-family shape.
    */
  def knnIvfPq(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, k: Int, nprobe: Int, shortlist: Int,
      residual: Boolean = true, assignedOpt: Option[DataFrame] = None): DataFrame = {
    val assigned = assignedOpt.getOrElse(ivfAssign(corpus, centroids))
    val indexed = assigned.select(col("vec_id"), col("cell_id"))
    val cells = centroids.select(col("vec_id").as("cell_id"), col("embedding").as("cv"))
    val probes = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(broadcast(cells))
      .withColumn("csim", cosine_similarity(col("qv"), col("cv")))
      .groupBy(col("qid"), col("qv"))
      .agg(graft.functions.top_k_by(col("csim"), col("cell_id"), nprobe).as("top"))
      .select(col("qid"), col("qv"), explode(col("top.id")).as("cell_id"))
    val candIds = indexed.select(col("cell_id"), col("vec_id").as("neighbor_id"))
      .join(broadcast(probes.select(col("qid"), col("cell_id"))), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("qid"))
      .select(col("qid"), col("neighbor_id"))
    // encode/decode ONLY the distinct candidate set: a production index
    // precomputes the codes at ingest time, so query-time PQ work must
    // be O(candidates) — in this self-contained form that means the
    // non-probed cells' vectors are never encoded, decoded, or joined
    // (same answer: per-vector codes don't depend on which slice is
    // encoded). Measured at sf0.1: 2.50 s -> 2.02 s for the registered
    // shape (10 queries probing 4/16 cells touch most of this corpus;
    // the saving grows as C rises and the probed fraction shrinks).
    // no .distinct(): the left_semi probes below already dedup their
    // probe side, so a pre-distinct is one extra shuffle for nothing
    val candVecIds = candIds.select(col("neighbor_id").as("vec_id"))
    // residual mode semi-joins the ASSIGNED frame so the encode reuses
    // the cell_id already computed for candidate generation instead of
    // paying the N×C assign pass a second time; raw mode keeps slicing
    // the corpus directly (it never needs a cell)
    val encodeInput =
      if (residual)
        residualizeAssigned(
          assigned.join(candVecIds, Seq("vec_id"), "left_semi"), centroids)
      else corpus.join(candVecIds, Seq("vec_id"), "left_semi")
    val reconBase = pqDecode(pqEncode(encodeInput, codebooks), codebooks)
    val recon =
      if (residual)
        // decode yields the residual reconstruction; add the centroid back
        reconBase.join(encodeInput.select(col("vec_id"), col("cell_id")), Seq("vec_id"))
          .join(broadcast(centroids.select(col("vec_id").as("cell_id"),
            col("embedding").as("__cv"))), Seq("cell_id"))
          .select(col("vec_id").as("neighbor_id"),
            zip_with(col("__cv"), col("embedding"),
              (c, r) => c.cast("double") + r.cast("double")).as("rv"))
      else reconBase.select(col("vec_id").as("neighbor_id"), col("embedding").as("rv"))
    val qs = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cand = candIds.join(recon, Seq("neighbor_id"))
      .join(broadcast(qs), Seq("qid"))
      // residual reconstructions are array<double>; widen a float query
      // side to match (float→double is exact, so sims are unchanged)
      .withColumn("approx_sim", cosine_similarity(
        if (residual) col("qv").cast("array<double>") else col("qv"), col("rv")))
    val short = cand.groupBy(col("qid"), col("qv"))
      .agg(graft.functions.top_k_by(col("approx_sim"), col("neighbor_id"), shortlist).as("top"))
      .select(col("qid"), col("qv"), explode(col("top.id")).as("neighbor_id"))
    val exact = short.join(
        corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
        Seq("neighbor_id"))
      .withColumn("sim", cosine_similarity(col("qv"), col("nv")))
    topKRanked(exact, k)
  }

  /** Occupancy-derived IVF-PQ shortlist (round-11 verdict item 5): a
    * FIXED shortlist is a silent scale trap — candidates per query grow
    * as `nprobe · N/C` while a constant shortlist admits a shrinking
    * fraction of them, so recall at shortlist 12 fell 1.00 → 0.32 just
    * moving sf0.01 → sf0.1 on identical index parameters (SCALING.md
    * round-10). Derive it instead from what the query actually sees:
    * `shortlist = max(2k, ceil(frac · nprobe · meanCellOccupancy))` —
    * the exact re-rank then touches a constant FRACTION of the probed
    * candidates at any corpus size, and recall stops depending on N
    * (measured flat across sf0.01 → sf0.1 at frac 0.25; SCALING.md
    * round-11). The mean occupancy is one 1-row aggregate collect — the
    * bounded model-artifact scalar exception (a production index knows
    * it from ingest-time stats without any scan at all). Cost scales
    * honestly: the shortlist is O(N/C), i.e. the exact re-rank stays
    * proportional to one probed cell — the same asymptotic a bigger
    * `nprobe` pays, spent on rank depth instead of cell count.
    */
  def occupancyShortlist(assigned: DataFrame, nprobe: Int, k: Int,
      frac: Double = 0.25): Int = {
    val row = assigned.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n"))
      .agg(avg(col("n"))).head()
    // empty assignment → avg is null → the 2k floor (nothing to size by)
    val meanOcc = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    math.max(2 * k, math.ceil(frac * nprobe * meanOcc).toInt)
  }

  /** [[knnIvfPq]] with the shortlist auto-sized by
    * [[occupancyShortlist]] — assigns once and shares the frame with
    * the search (the assignedOpt seam), so the sizing adds no pass.
    */
  def knnIvfPqAuto(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, codebooks: DataFrame, k: Int, nprobe: Int,
      frac: Double = 0.25, residual: Boolean = true,
      assignedOpt: Option[DataFrame] = None): DataFrame = {
    val assigned = assignedOpt.getOrElse(
      ivfAssign(corpus, centroids).localCheckpoint(false))
    knnIvfPq(queries, corpus, centroids, codebooks, k, nprobe,
      shortlist = occupancyShortlist(assigned, nprobe, k, frac),
      residual = residual, assignedOpt = Some(assigned))
  }

  /** recall@k of an approximate KNN result against the exact one: the
    * fraction of each query's true top-k the approximation recovered,
    * averaged over queries. Both inputs use the (qid, rank, neighbor_id)
    * shape the knn* functions emit.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): Double = {
    val a = approx.filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"))
    val e = exact.filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"))
    // denominator = actual exact rows, not nQueries*k: a query whose true
    // neighbor list is shorter than k must not depress recall
    val denom = e.count()
    if (denom == 0) return 0.0
    val hits = e.join(a, Seq("qid", "neighbor_id"), "left_semi").count()
    hits.toDouble / denom
  }

  /** ANN via LSH: candidates share the query's bucket; exact cosine rank
    * within the bucket. Recall < 1 by construction; bucket count scales
    * with `Planes`.
    */
  def knnLsh(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      lshBucket(col("embedding")).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
      lshBucket(col("embedding")).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("qid"))
      .withColumn("sim", cosine_similarity(col("qv"), col("nv")))
    Ranks.topKPerGroup(scored, Seq("qid"), k, Seq(col("sim").desc, col("neighbor_id")))
      .select(col("qid"), col("rank"), col("neighbor_id"), col("bucket"))
  }

  /** Exact-arithmetic k-means fit (the published SemDeDup clustering
    * shape): `iters` Lloyd iterations from the deterministic
    * [[strideCentroids]] init, then each vector's cell under the FINAL
    * centroids plus that cell's population. Output: `vec_id`, `cell_id`,
    * `cell_size`.
    *
    * Engine-exact by construction, unlike [[kmeansIterate]]'s float
    * means: centroid updates sum FIXED-POINT longs (floor(v·10⁶), the
    * x50/x37 idiom — integer addition commutes, so the fit is
    * partition-order-independent) and divide once into a double;
    * assignment is cosine over doubles accumulated in array order with
    * (sim desc, cell_id asc) tie-breaks ([[graft.functions.TopKByScore]]).
    * A cell that loses every member keeps its previous centroid (same
    * retention rule as [[kmeansIterate]]).
    *
    * Scale shape: centroids are broadcast-sized (c ≪ corpus) so each
    * iteration is one broadcast join + ONE cell-keyed hash aggregate
    * carrying `dims` fixed-point sums (map-side combine; one shuffle per
    * iteration, no row explosion) — no all-pairs work, linear in the
    * corpus per iteration; the cell_size join at the end reuses the final
    * assignment's shuffle. At very wide embeddings (≥ several hundred
    * dims) a per-dim aggregate column list stresses codegen — there the
    * posexplode → (cell, pos) aggregate shape [[kmeansIterate]] uses
    * trades one extra shuffle for bounded expression width.
    */
  /** Per-iteration k-means convergence as DATA (round-10 verdict item):
    * the fit loop of [[kmeansFitExact]] with the objective emitted per
    * iteration — `inertia_micro` = Σ_v floor((1 − best_cos(v)) · 1e6)
    * under the centroids entering iteration `iter` (iter 0 = the stride
    * init), an order-insensitive integer SUM so the value hash-matches
    * cross-engine (the x41 idiom). `non_increasing` compares each row to
    * its predecessor: for THIS fit (cosine assignment + arithmetic-mean
    * update, i.e. unnormalized spherical k-means) monotonicity is an
    * empirical observation, not a theorem — the mean direction is not
    * the Σcos maximizer — which is exactly why convergence should be
    * reported as data instead of assumed; a fit that wobbles shows a 0
    * in the table. Iteration count is the caller's: the x78/x89
    * "justify the approximation with a measured table" pattern applied
    * to the fit itself.
    * Output: `iter, n_vectors, inertia_micro, non_increasing`.
    */
  def kmeansInertia(emb: DataFrame, c: Int = 8, iters: Int = 4,
      dims: Int = Dim): DataFrame = {
    val scale = 1000000L
    // checkpointed: every one of the 2·iters+1 serial jobs below reads
    // `e` (assign joins + mean joins) — one materialization, not 9 scans
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("ev"))
      .localCheckpoint(false)
    def best(cents: DataFrame): DataFrame =
      e.join(broadcast(cents))
        .withColumn("csim", cosine_similarity(col("ev"), col("cv")))
        .groupBy(col("vec_id"))
        .agg(graft.functions.top_k_by(col("csim"), col("cell_id"), 1).as("top"))
        .select(col("vec_id"),
          col("top").getItem(0).getField("id").as("cell_id"),
          col("top").getItem(0).getField("score").as("cs"))
    val dimSums = (1 to dims).map(i =>
      sum(floor(element_at(col("ev"), i) * scale).cast("long")).as(s"__s$i"))
    val dimMeans = array((1 to dims).map(i =>
      col(s"__s$i").cast("double") / (col("n") * lit(scale)).cast("double")): _*)
    var cents = strideCentroids(emb, c)
      .select(col("vec_id").as("cell_id"),
        transform(col("embedding"), x => x.cast("double")).as("cv"))
    var rows: DataFrame = null
    for (t <- 0 to iters) {
      val a = best(cents).localCheckpoint(false)
      val row = a.agg(count(lit(1)).as("n_vectors"),
          sum(floor((lit(1.0) - col("cs")) * lit(1000000.0)).cast("long"))
            .as("inertia_micro"))
        .select(lit(t).as("iter"), col("n_vectors"), col("inertia_micro"))
      rows = if (rows == null) row else rows.unionAll(row)
      if (t < iters) {
        val means = a.join(e, Seq("vec_id"))
          .groupBy(col("cell_id"))
          .agg(count(lit(1)).as("n"), dimSums: _*)
          .select(col("cell_id"), dimMeans.as("__new"))
        cents = cents.select(col("cell_id"), col("cv").as("__prev"))
          .join(means, Seq("cell_id"), "left")
          .select(col("cell_id"), coalesce(col("__new"), col("__prev")).as("cv"))
          .localCheckpoint(false)
      }
    }
    // iters+1 rows: the unpartitioned lag window is bounded by the
    // iteration count, never the corpus
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("iter"))
    rows.withColumn("non_increasing",
      (col("iter") === 0 ||
        col("inertia_micro") <= lag(col("inertia_micro"), 1).over(w)).cast("int"))
  }

  def kmeansFitExact(emb: DataFrame, c: Int = 8, iters: Int = 2,
      dims: Int = Dim): DataFrame = {
    val scale = 1000000L
    // the kmeansInertia note: every serial assign/means job reads `e`
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("ev"))
      .localCheckpoint(false)
    def nearest(cents: DataFrame): DataFrame =
      e.join(broadcast(cents))
        .withColumn("csim", cosine_similarity(col("ev"), col("cv")))
        .groupBy(col("vec_id"))
        .agg(graft.functions.top_k_by(col("csim"), col("cell_id"), 1).as("top"))
        .select(col("vec_id"),
          col("top").getItem(0).getField("id").as("cell_id"))
    var cents = strideCentroids(emb, c)
      .select(col("vec_id").as("cell_id"),
        transform(col("embedding"), x => x.cast("double")).as("cv"))
    val dimSums = (1 to dims).map(i =>
      sum(floor(element_at(col("ev"), i) * scale).cast("long")).as(s"__s$i"))
    val dimMeans = array((1 to dims).map(i =>
      col(s"__s$i").cast("double") / (col("n") * lit(scale)).cast("double")): _*)
    for (_ <- 0 until iters) {
      val means = nearest(cents).join(e, Seq("vec_id"))
        .groupBy(col("cell_id"))
        .agg(count(lit(1)).as("n"), dimSums: _*)
        .select(col("cell_id"), dimMeans.as("__new"))
      cents = cents.select(col("cell_id"), col("cv").as("__prev"))
        .join(means, Seq("cell_id"), "left")
        .select(col("cell_id"), coalesce(col("__new"), col("__prev")).as("cv"))
        .localCheckpoint(false)
    }
    val fin = nearest(cents)
    val sizes = fin.groupBy(col("cell_id")).agg(count(lit(1)).as("cell_size"))
    fin.join(sizes, Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"), col("cell_size"))
  }

  /** SemDeDup as published (Abbas et al. 2023): cluster the corpus with
    * k-means ([[kmeansFitExact]]), generate near-dup candidate pairs only
    * WITHIN each cell (cosine ≥ `threshold`), and collapse pair chains to
    * whole components (component = min vec_id — keep one per cluster).
    * Output matches x35's LSH-bucketed variant: `vec_id`, `component`,
    * `cluster_size` — the two differ only in candidate generation
    * (trained cells vs random hyperplane buckets).
    *
    * Scale posture: within-cell pairing is an equi-join on `cell_id`,
    * never all-pairs across the corpus; per-cell pair work is bounded by
    * choosing c ∝ corpus/target-cell-size (SemDeDup's own recipe —
    * k grows with n), exactly the bucket-population argument behind the
    * LSH cap. The kmeans fit itself is linear per iteration (broadcast
    * centroids), and the component collapse is the log-diameter CC
    * operator.
    */
  def semDedupKmeans(emb: DataFrame, c: Int = 8, iters: Int = 2,
      threshold: Double = 0.35): DataFrame = {
    // lazy checkpoint: the self-join below would otherwise evaluate the
    // whole iterative fit TWICE (once per side), and the CC collapse's
    // first action triggers it — measured 4.35s → ~2s at sf0.1
    val cells = kmeansFitExact(emb, c, iters)
      .select(col("vec_id"), col("cell_id"))
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .localCheckpoint(false)
    val pairs = cells.select(col("cell_id"), col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(cells.select(col("cell_id"), col("vec_id").as("id_b"), col("embedding").as("vb")),
        Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine_similarity(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
    graft.operators.ConnectedComponents.assign(
      emb.select(col("vec_id")), pairs, "vec_id", "id_a", "id_b")
  }

  /** Per-group embedding centroids over the first `dims` dimensions —
    * the class-mean primitive behind SemDeDup cluster centers, quality-
    * classifier prototypes, and IVF cell refinement. Sums run on FIXED-
    * POINT integers (floor(v·10⁶), the x37 idiom): integer addition is
    * commutative, so the aggregate is partition-order-independent and
    * engine-exact where a naive double sum is neither; the mean is one
    * final double division of exact longs. One hash aggregate with
    * map-side combine; output is |groups| rows.
    */
  def groupCentroids(emb: DataFrame, groupCol: String = "label",
      dims: Int = 4): DataFrame = {
    val scale = 1000000L
    val sums = (1 to dims).map(i =>
      sum(floor(element_at(col("embedding"), i).cast("double") * scale).cast("long"))
        .as(s"s$i"))
    val means = (1 to dims).map(i =>
      (col(s"s$i").cast("double") / (col("n_vecs") * lit(scale)).cast("double"))
        .as(s"c${i - 1}"))
    emb.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_vecs"), sums: _*)
      .select(col(groupCol) +: col("n_vecs") +: means: _*)
  }

  /** MMR (maximal-marginal-relevance) diversified re-rank — the RAG
    * retrieval stage that trades relevance against redundancy: from each
    * query's exact top-`shortlist` candidates, greedily select `k` where
    * step t maximizes λ·rel − (1−λ)·max(sim to already-selected).
    *
    * Scale posture: candidate generation is [[knnBrute]]'s bounded-heap
    * top-k (swap in any knn* variant at scale — the re-rank only ever
    * sees queries×shortlist rows), the shortlist re-joins the corpus
    * through a BROADCAST of the shortlist side, and the greedy loop runs
    * k−1 bounded jobs over the pinned queries×shortlist² pairs frame —
    * the corpus is never touched again. Greedy selection is inherently
    * sequential in k, but k is the per-query result budget (≤ tens), not
    * a data dimension.
    *
    * Determinism: rel and pair sims are the left-associated double cosine
    * kernel; score arithmetic is λ-scaled subtraction of those exact
    * doubles, ties broken by neighbor id — so a DuckDB oracle running the
    * same unrolled greedy over the same generated-SQL cosines agrees
    * rank-for-rank, bit for bit.
    */
  /** [[mmrRerank]]'s one-stage scale path: shortlisting AND the greedy
    * fused into the [[graft.functions.MmrSelect]] aggregate, fed the raw
    * scored candidates — each mapper keeps its local top-`shortlist` by
    * relevance, the shuffle carries O(queries × shortlist) rows, and the
    * greedy runs in finalize. ONE job regardless of k, where the
    * unrolled form pays k−1 serial bounded jobs (the serial-depth class
    * the BPE bound documents). Pair sims in finalize are the exact
    * cosineFloat fold, so the output is row-identical to [[mmrRerank]]
    * (MmrSpec pins it — the q43/x98 "safe rewrite must not change a
    * single row" pattern).
    */
  def mmrRerankAgg(queries: DataFrame, corpus: DataFrame, shortlist: Int = 8,
      k: Int = 4, lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"mmrRerankAgg: need shortlist >= k >= 1 (got $shortlist, $k)")
    scoredCandidates(queries, corpus)
      .groupBy(col("qid"))
      .agg(graft.functions.mmr_select(col("neighbor_id"), col("sim"),
        col("nv"), shortlist, k, lambda).as("sel"))
      .select(col("qid"), explode(col("sel")).as("s"))
      .select(col("qid"), col("s.rank").as("mmr_rank"),
        col("s.id").as("neighbor_id"))
  }

  def mmrRerank(queries: DataFrame, corpus: DataFrame, shortlist: Int = 8,
      k: Int = 4, lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"mmrRerank: need shortlist >= k >= 1 (got $shortlist, $k)")
    val c = corpus.select(col("vec_id"), col("embedding"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // pinned: consumed by the pairs build and every greedy pass
    val cand = broadcast(knnBrute(queries, corpus, shortlist))
      .join(c, col("neighbor_id") === col("vec_id"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("neighbor_id"),
        cosine_similarity(col("qv"), col("embedding")).as("rel"),
        col("embedding").as("nv"))
      .localCheckpoint(false)
    val pairs = cand.select(col("qid"), col("neighbor_id").as("a_id"),
        col("nv").as("av"))
      .join(cand.select(col("qid"), col("neighbor_id").as("b_id"),
        col("nv").as("bv")), Seq("qid"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("qid"), col("a_id"), col("b_id"),
        cosine_similarity(col("av"), col("bv")).as("s"))
      .localCheckpoint(false)
    // per-qid windows over <= shortlist rows — bounded frames
    val wRel = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("rel").desc, col("neighbor_id").asc)
    var selected = cand.withColumn("rr", row_number().over(wRel))
      .filter(col("rr") === 1)
      .select(col("qid"), col("neighbor_id"), lit(1).as("mmr_rank"))
      .localCheckpoint(false)
    for (t <- 2 to k) {
      val ms = pairs
        .join(selected.select(col("qid"), col("neighbor_id").as("b_id")),
          Seq("qid", "b_id"))
        .groupBy(col("qid"), col("a_id")).agg(max(col("s")).as("ms"))
        .withColumnRenamed("qid", "__mq")
      val wScore = org.apache.spark.sql.expressions.Window
        .partitionBy("qid")
        .orderBy((lit(lambda) * col("rel") - lit(1 - lambda) * col("ms")).desc,
          col("neighbor_id").asc)
      val next = cand
        .join(selected.select(col("qid"), col("neighbor_id")),
          Seq("qid", "neighbor_id"), "left_anti")
        .join(ms, col("qid") === col("__mq") &&
          col("neighbor_id") === col("a_id"))
        .drop("__mq", "a_id")
        .withColumn("rr", row_number().over(wScore))
        .filter(col("rr") === 1)
        .select(col("qid"), col("neighbor_id"), lit(t).as("mmr_rank"))
      selected = selected.union(next).localCheckpoint(false)
    }
    selected.select(col("qid"), col("mmr_rank"), col("neighbor_id"))
  }
}
