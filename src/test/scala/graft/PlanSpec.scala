package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Physical-plan posture locks: these are the properties SCALING.md and
  * README's scale section promise. A regression that un-pushes a filter,
  * drops a broadcast, or turns top-K into a global sort fails here, not
  * in production.
  */
class PlanSpec extends SparkSuite {

  private def plan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf) ++ p.subqueries.flatMap(s => collectAll(s)(pf))

  test("q01: filter and projection reach the parquet scan") {
    val p = plan(SparkEntry.queries("q01_scan_prune")(spark, sf))
    val scan = collectAll(p) { case f: FileSourceScanExec => f }.head
    assert(scan.dataFilters.nonEmpty, "predicate not pushed to the scan")
    assert(scan.requiredSchema.fieldNames.toSet ==
      Set("l_orderkey", "l_linenumber", "l_extendedprice"),
      s"column pruning lost: ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q05: top-K plans TakeOrderedAndProject, not a global sort") {
    val p = plan(SparkEntry.queries("q05_topk")(spark, sf))
    assert(collectAll(p) { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject:\n$p")
  }

  test("q04: all five dimension joins broadcast; exactly one agg shuffle") {
    val p = plan(SparkEntry.queries("q04_double_dim_join")(spark, sf))
    val bcasts = collectAll(p) { case b: BroadcastExchangeLike => b }
    assert(bcasts.size == 5, s"expected 5 broadcast exchanges, got ${bcasts.size}")
    val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
    // just the groupBy — no trailing cosmetic sort since round 2
    assert(shuffles.size == 1, s"expected 1 shuffle (agg), got ${shuffles.size}")
  }

  test("q18: the max(ts) pin is a broadcast, not a collect, and the dim join broadcasts") {
    val p = plan(SparkEntry.queries("q18_report_pairs")(spark, sf))
    val bcasts = collectAll(p) { case b: BroadcastExchangeLike => b }
    assert(bcasts.size >= 2, s"expected broadcasts for scalar pin + dim, got ${bcasts.size}")
    assert(collectAll(p) { case t: TakeOrderedAndProjectExec => t }.nonEmpty)
  }

  test("custom expressions stay inside WholeStageCodegen (no fallback to interpreted eval)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // under AQE codegen stages materialize per query-stage at execution;
    // disable it so the static plan shows them
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p11 = SparkEntry.queries("q11_hex_to_decimal")(spark, sf)
        .queryExecution.executedPlan
      val codegenned = collectAll(p11) { case w: WholeStageCodegenExec => w }
      assert(codegenned.exists(_.toString.contains("hex_to_decimal")),
        s"HexToDecimal not inside a codegen stage:\n$p11")

      val emb = graft.sources.Tables.embeddings(spark, sf)
      val pCos = graft.ext.Similarity.knnBrute(emb.filter(emb("vec_id") < 5), emb, 3)
        .queryExecution.executedPlan
      val cosStages = collectAll(pCos) { case w: WholeStageCodegenExec => w }
      assert(cosStages.exists(_.toString.contains("cosine_sim")),
        s"CosineSimilarityExpr not inside a codegen stage:\n$pCos")

      // the round-10-late cleaner kernels (x107/x108) stay codegen'd too
      for ((name, frag) <- Seq("x107_intradoc_dedup" -> "dedup_tokens",
          "x108_nfc_normalize" -> "nfc_normalize")) {
        val p = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
        assert(collectAll(p) { case w: WholeStageCodegenExec => w }
          .exists(_.toString.contains(frag)),
          s"$frag not inside a codegen stage in $name:\n$p")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("x29: literal-map scoring — zero broadcasts (corpus frames never broadcast), no window") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // round-9 shape: the trained profile ships as a literal map and
      // the gram explode runs once in the (checkpointed) training job;
      // the per-doc scores attach onto the doc frame WITHOUT a
      // broadcast hint (the round-8 form hinted broadcast on the
      // per-doc scores frame — unbounded driver memory at corpus
      // scale, flagged by the round-8 advisory). At tiny SF Catalyst
      // auto-broadcasts from size stats, which is fine — the scale
      // property to lock is that NOTHING FORCES it: with
      // auto-broadcast disabled the attach must degrade to a shuffle
      // join (a lingering hint would broadcast regardless of this
      // conf). No window (the argmax is a when-chain), and scoring
      // reads the cached gram frame — the corpus explode must NOT
      // reappear in it.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = SparkEntry.queries("x29_lang_id_ngram")(spark, sf).queryExecution.executedPlan
      val bcasts = collectAll(p) { case b: BroadcastExchangeLike => b }
      assert(bcasts.isEmpty,
        s"x29 must not force-broadcast corpus-sized frames, got ${bcasts.size}:\n$p")
      assert(collectAll(p) { case w: WindowExec => w }.isEmpty,
        s"literal-map x29 must not plan a window:\n$p")
      assert(!p.toString.contains("char_ngrams"),
        s"scoring must reuse the cached gram frame, not re-explode:\n$p")

      // the gram kernel's codegen status is pinned on the declarative
      // reference form (the literal path runs it inside the training job)
      val ref = graft.ext.TextStats.languageIdNgram(
        graft.sources.Tables.documents(spark, sf)).queryExecution.executedPlan
      assert(collectAll(ref) { case w: WholeStageCodegenExec => w }
        .exists(_.toString.contains("char_ngrams")),
        s"char_ngrams not inside a codegen stage:\n$ref")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  test("x06: bounded-heap knn has no window sort and only the agg shuffles") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val p = plan(graft.ext.Similarity.knnBrute(emb.filter(emb("vec_id") < 10), emb, 5))
    assert(collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "knnBrute must not plan a window")
  }

  test("q35: range join plans as equi-join candidate generation, never a nested loop") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val p = plan(SparkEntry.queries("q35_range_join")(spark, sf))
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"range join degenerated to BroadcastNestedLoopJoin:\n$p")
    assert(collectAll(p) { case j: CartesianProductExec => j }.isEmpty,
      s"range join degenerated to a cartesian product:\n$p")
  }

  test("x03: bucket-local pair generation — one signature aggregation, no self-join") {
    import org.apache.spark.sql.execution.joins.{BaseJoinExec}
    val p = plan(SparkEntry.queries("x03_minhash_pairs")(spark, sf))
    assert(collectAll(p) { case j: BaseJoinExec => j }.isEmpty,
      s"candidate pairs should come from in-bucket expansion, not a join:\n$p")
  }

  test("x22: corpus top-k plans TakeOrderedAndProject over the gram aggregate") {
    val p = plan(SparkEntry.queries("x22_ngram_counts")(spark, sf))
    assert(collectAll(p) { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject:\n$p")
  }

  test("x37: scalar quantization is map-side only — zero exchanges") {
    val p = plan(SparkEntry.queries("x37_quantize_int8")(spark, sf))
    assert(collectAll(p) { case e: ShuffleExchangeLike => e }.isEmpty,
      s"quantization must not shuffle:\n$p")
  }

  test("x38: PQ encode is map-side only — zero joins, zero exchanges (round-10 kernel form)") {
    // the codebooks are collected at plan-BUILD time (kilobyte model
    // artifact, the TextStats language-profile class) and bound into
    // the PqCodesExpr kernel as a reference object, so the QUERY plan
    // is scan -> project: encoding 10^9 vectors shuffles nothing
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val p = plan(SparkEntry.queries("x38_pq_codes")(spark, sf))
    assert(collectAll(p) { case j: BaseJoinExec => j }.isEmpty,
      s"map-side encode must not join:\n$p")
    assert(collectAll(p) { case e: ShuffleExchangeLike => e }.isEmpty,
      s"map-side encode must not shuffle:\n$p")
    // and the kernel evaluates ONCE per row: the extracted __codes alias
    // survives as a single pq_codes call feeding all m element_at's
    assert(p.toString.split("pq_codes").length - 1 == 1,
      s"expected exactly one pq_codes evaluation in the plan:\n$p")
  }

  test("x60: chunking is scan->generate->project — zero exchanges, no window") {
    val p = plan(SparkEntry.queries("x60_chunk_overlap")(spark, sf))
    assert(collectAll(p) { case e: ShuffleExchangeLike => e }.isEmpty,
      s"chunking must not shuffle:\n$p")
    assert(collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      s"chunking must not plan a window:\n$p")
  }

  test("x61: epoch order joins only the broadcast offsets; the sole global window is nShards-row") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    val p = plan(SparkEntry.queries("x61_epoch_order")(spark, sf))
    assert(collectAll(p) { case j: SortMergeJoinExec => j }.isEmpty,
      s"offsets must broadcast, never sort-merge:\n$p")
    // two windows: the per-shard rank (partitioned) and the offsets
    // cumulative sum (single-partition but bounded at nShards rows)
    val wins = collectAll(p) { case w: WindowExec => w }
    val global = wins.filterNot(_.partitionSpec.nonEmpty)
    assert(global.size <= 1, s"at most one single-partition window (the counts frame):\n$p")
    global.foreach { w =>
      // it must sit above the shard-count aggregate, not the corpus
      assert(collectAll(w) { case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }.nonEmpty,
        s"the global window must order the aggregated counts frame, not doc rows:\n$w")
    }
  }

  test("q46: sliding window plans a single Expand + hash aggregate, no join") {
    import org.apache.spark.sql.execution.ExpandExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val p = plan(SparkEntry.queries("q46_sliding_window")(spark, sf))
    assert(collectAll(p) { case e: ExpandExec => e }.size == 1,
      s"expected exactly one Expand for the 2-window membership:\n$p")
    assert(collectAll(p) { case j: BaseJoinExec => j }.isEmpty,
      s"sliding windows must not join:\n$p")
  }

  test("q50: calendar predicate prunes date partitions at planning time") {
    val p = plan(SparkEntry.queries("q50_partition_prune")(spark, sf))
    val scan = collectAll(p) { case f: FileSourceScanExec => f }.head
    assert(scan.partitionFilters.nonEmpty,
      s"calendar predicate did not become a partition filter:\n$scan")
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 7, s"expected the 7-day week to read 7 date partitions, read $selected")
    // the unfiltered layout really does carry more partitions than the scan read
    val all = plan(graft.pipeline.Derived.eventsByDate(spark, sf).groupBy("event_type").count())
    val allScan = collectAll(all) { case f: FileSourceScanExec => f }.head
    assert(allScan.selectedPartitions.partitionCount == 30,
      s"fixture should carry 30 date partitions, has ${allScan.selectedPartitions.partitionCount}")
  }

  test("q43: conditional-salt skew join scans fact and dim exactly once each") {
    // pre-round-8 the join phase ran hot-slice ∪ cold-remainder — two
    // scans of the fact table; the single conditional-salt join must
    // keep exactly one scan per input (the sampled detection pass is a
    // separate eager job, deliberately outside this plan)
    val p = plan(SparkEntry.queries("q43_skew_join")(spark, sf))
    val scans = collectAll(p) { case f: FileSourceScanExec => f }
    val byTable = scans.groupBy(_.relation.location.rootPaths.head.getName)
    assert(byTable.getOrElse("lineitem.parquet", Nil).size == 1,
      s"fact must scan once, got ${byTable.view.mapValues(_.size).toMap}")
    assert(byTable.getOrElse("orders.parquet", Nil).size == 1,
      s"dim must scan once, got ${byTable.view.mapValues(_.size).toMap}")
  }

  test("x77: payloads never enter a shuffle; the only exchange is the cluster agg") {
    val p = plan(SparkEntry.queries("x77_image_phash_dedup")(spark, sf))
    val shuffles = collectAll(p) { case e: ShuffleExchangeLike => e }
    assert(shuffles.nonEmpty, "expected the perceptual-cluster aggregate exchange")
    shuffles.foreach { e =>
      assert(!e.child.output.exists(_.name == "payload"),
        s"binary payload crossed a shuffle:\n$e")
    }
  }

  test("only O(1)-row build sides ever nested-loop (scalar pins, query/centroid sets)") {
    // the full-registry audit: any BroadcastNestedLoopJoin or cartesian
    // in any declared query must build from a bounded tiny side — q10/q18
    // (1-row max(ts) pin), x06 (10-row query set), x14 (9-row centroids),
    // x29 (langs-count-row score grid), x39 (x06's query set vs the PQ
    // reconstruction), x40 (1-row count-min sketch aggregate probed by
    // cm_estimate — the de-drivered round-5 shape), x48 (1-row binding-
    // source pin crossed onto the |sources|-row count frame), x46 (the
    // |splits|×|splits| pair frame — both sides O(1) distinct splits),
    // x52/x53 (8-row k-means centroid set broadcast onto the corpus),
    // x54 (1-row corpus-totals frame crossed onto query-term postings),
    // x55 (1-row binding-source pin, the x48 shape), x56 (10-row anchor
    // set non-equi broadcast, the x06 shape), x59 (1-row model-totals
    // pin crossed onto the 64-row bucket-model frame), x62 (source-count-
    // sized signature frame paired with itself — model artifact, never
    // corpus rows)
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // (x29 left this list in round 8: the literal-map rewrite removed
    // its langs-grid crossJoin)
    val allowed = Set("q10_time_window", "q18_report_pairs", "x06_knn_brute",
      "x13_approx_distinct", "x14_knn_ivf", "x25_approx_quantile",
      "x39_pq_recon_knn", "x40_count_min",
      "x48_domain_mix", "x46_split_overlap", "x52_kmeans_fit",
      "x53_semdedup_kmeans", "x54_bm25_retrieval", "x55_temperature_mix",
      "x56_hard_negatives", "x57_bpe_fit", "x58_bpe_encode",
      "x59_dsir_select", "x62_source_overlap",
      // round-7: 1-row broadcast pins — x64 crossJoins the corpus-totals
      // scalar into both rankers (the x54 shape), x65 the vocabulary-size
      // scalar into the smoothed conditional, x67 the node-count scalar
      // into each PageRank update, x69 the max-doc-id scalar into the
      // bucket projection
      "x64_hybrid_rrf", "x65_bigram_lm_fit", "x67_pagerank_dup",
      "x69_vocab_growth",
      // x66: broadcast bounded query set joined on an inequality only —
      // the x06_knn_brute shape; x70: the 1-row global-rollup pin
      "x66_knn_jl_project", "x70_skew_diagnostics",
      // round-8: x78 embeds x06's brute side (10-row query set BNL) as
      // the exact baseline its recall is measured against
      "x78_ann_recall",
      // round-9: IVF-PQ probes cross-join the 16-row centroid set (and
      // x89 additionally carries x06's query-set pin) — the same
      // bounded-build-side class as x14
      "x88_knn_ivfpq", "x89_ivfpq_recall",
      // round-10: x92 is x89 over the derived clustered corpus — same
      // bounded query-set / centroid-set pins; x97 crosses the 1-row
      // corpus-total-weight scalar onto the |sources|-row allocation
      // frame (the x48/x54 shape)
      "x92_clustered_recall", "x97_sample_allocation",
      // round-10 late: x106 carries x06's brute side (10-row query-set
      // BNL) as the exact truth its MRR is measured against; x103's
      // fused form feeds mmr_select from the same broadcast-query
      // inequality join
      "x106_retrieval_mrr", "x103_mmr_rerank",
      // x98 crosses the 1-row pilot-threshold scalar onto the priority
      // frame (absent when the sf0.001 pilot is empty and the fallback
      // single-pass plan builds instead)
      "x98_weighted_sample_threshold",
      // round-11: x114 is x92's recall shape on the structured corpus,
      // x115 the same shape with two shortlist cuts — both carry the
      // bounded query-set (10-row brute) / centroid-set pins
      "x114_fitted_codebook_recall", "x115_shortlist_scale_trap",
      // x116 is x54's scoring tail off the standing index — the same
      // 1-row corpus-stats cross pin
      "x116_bm25_index_stream",
      // round-12: x117 is the same scoring tail off the RESOLVED index
      // (the 1-row stats pin again); x118 is x114's recall shape at the
      // auto shortlist — bounded query-set / centroid-set pins
      "x117_bm25_retract_stream", "x118_ann_production_ladder",
      // round-16: x152 is x117's scoring tail off the BUCKETED resolved
      // index — the identical 1-row corpus-stats cross pin
      "x152_bm25_bucketed",
      // round-13: x128 serves knnIvf off the resolved live index — the
      // same bounded centroid-set (9-row stride sample) / query-set
      // pins as x14; x129 additionally carries x06's brute side (10-row
      // query-set BNL) as the exact truth its two recall arms measure
      // against — the x78/x89 class
      "x128_ivf_index_upsert", "x129_ivf_drift_recall",
      // x130 serves the same knnIvf shape off the refit-swapped log;
      // x131 is the two bounded-centroid-set assignment broadcasts
      "x130_ivf_refit_swap", "x131_ivf_drift_gauge",
      // x135's two cross attaches are 1-row scalar totals (corpus token
      // sum + capped-set sums) broadcast onto the |sources|-row frame;
      // x136 runs the same plan chain under its realization pass
      "x135_epoch_allocation", "x136_epoch_realize",
      // x137 is the x06 brute class: the 10-row quantized query side
      // broadcast under the non-equi candidate join, plus x06's truth
      "x137_int8_knn",
      // round-14: x140's serve tail is x128's knnIvf (bounded
      // centroid-set / 10-row query-set pins) plus x129's brute truth
      // side — the policy loop itself (gauge + refit) broadcasts
      // nothing data-sized
      "x140_ivf_policy_loop")
    SparkEntry.registry.foreach { q =>
      val p = plan(q.build(spark, sf))
      val bnl = collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }
      if (bnl.nonEmpty)
        assert(allowed.contains(q.name),
          s"${q.name} plans an unexpected BroadcastNestedLoopJoin:\n${bnl.head}")
      // a full cartesian is never acceptable in any declared query — the
      // O(1)-build-side shapes above all broadcast, they never CP
      val cp = collectAll(p) { case j: CartesianProductExec => j }
      assert(cp.isEmpty, s"${q.name} plans a CartesianProduct:\n${cp.headOption.getOrElse("")}")
    }
  }

  test("round-10 scan budgets hold: pinned shared frames keep repeated table scans out") {
    // tools.ScanAudit's findings, locked: these plans re-scanned their
    // fact table 6-21x because every consumer of a shared derived frame
    // re-derived it from the raw scan (runtime ReusedExchange=0 across
    // all of them). After the round-10 pins the FINAL plan carries only
    // the intrinsic scans below — a dropped localCheckpoint shows up
    // here as a count jump, not as a silent 2-6x I/O regression at
    // scale. (Scans inside the pinned subtrees run once as their own
    // jobs and are invisible to this count by design.)
    val budgets = Map(
      "q52_funnel" -> ("events", 2),            // was 7: p's purchase pass + the distinct-user universe
      "x14_knn_ivf" -> ("embeddings", 2),       // was 4: corpus assign + query set
      "x51_incremental_dedup" -> ("documents", 2), // was 7: train-side sign + batch-side sign
      "x46_split_overlap" -> ("documents", 0),  // was 6: all consumers read the pinned gram/total frames
      "x62_source_overlap" -> ("documents", 0), // was 6
      "x69_vocab_growth" -> ("documents", 3),   // was 4: max-id pin + bucket projection feed the one (word,bucket) pass
      "x72_source_tv_distance" -> ("documents", 1), // was 4: the one corpus pass into the pinned count frame
      "x88_knn_ivfpq" -> ("embeddings", 10),    // was 21: intrinsic probe/encode/re-rank touches
      "x89_ivfpq_recall" -> ("embeddings", 11), // was 20
      // round-10 close: the map-side claims of the scrub and the
      // single-pass sample are exactly one corpus scan each; x97's
      // three (sample + per-source agg + total) are each map-only to
      // re-derive — the pin-vs-rederive rule's re-derive side
      "x95_pii_scrub" -> ("documents", 1),
      "x96_weighted_sample" -> ("documents", 1),
      "x97_sample_allocation" -> ("documents", 3),
      // round-10 late: x101 is one pass into the per-group window; x102's
      // decision projection and x103's greedy output read only their
      // pinned frames (fit aggregate / pairs+candidate subtrees run once
      // as their own jobs behind the checkpoint)
      "x101_grouped_weighted_sample" -> ("documents", 1),
      "x102_quality_classifier" -> ("documents", 0),
      // fused mmr_select form: one corpus scan + the broadcast query set
      "x103_mmr_rerank" -> ("embeddings", 2),
      // x104/x105 read only their pinned feature frames; x106's brute
      // truth + IVF assign/probe sides are the intrinsic corpus touches
      "x104_incremental_classifier" -> ("documents", 0),
      "x105_classifier_audit" -> ("documents", 0),
      "x106_retrieval_mrr" -> ("embeddings", 4),
      // round-10 late map-side cleaners: exactly one corpus scan, no joins
      "x107_intradoc_dedup" -> ("documents", 1),
      "x108_nfc_normalize" -> ("documents", 1),
      // x110: one scan per snapshot side of the full-outer diff
      "x110_corpus_diff" -> ("documents", 2))
    def scansOf(p: SparkPlan): Seq[String] =
      p.collectWithSubqueries {
        case a: AdaptiveSparkPlanExec => scansOf(a.initialPlan)
        case f: FileSourceScanExec =>
          Seq(f.relation.location.rootPaths.headOption
            .fold("?")(_.getName.stripSuffix(".parquet")))
      }.flatten
    budgets.foreach { case (name, (table, budget)) =>
      val p = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      val n = scansOf(p).count(_ == table)
      assert(n <= budget,
        s"$name scans $table ${n}x in the final plan (budget $budget) — a shared-frame pin was dropped")
    }
  }
}
