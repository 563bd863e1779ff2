package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke: amplify the corpus N× (key-shifted copies, written
  * once to a scratch dir) and time representative queries against it, to
  * observe how the plans behave one order of magnitude past the bench
  * scale — the "would this survive a 100× scale-up" check with measured
  * numbers instead of intuition.
  *
  *   sbt 'runMain graft.tools.ScaleSmoke /root/testdata/sf0.1 /tmp/graft-scale 10'
  */
object ScaleSmoke {

  def amplify(spark: SparkSession, srcDir: String, outDir: String, factor: Int,
      only: Option[Set[String]] = None): Unit = {
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    def write(name: String, shift: (DataFrame, Int) => DataFrame): Unit = if (wanted(name)) {
      val base = spark.read.parquet(s"$srcDir/$name.parquet")
      val amplified = (0 until factor).map(i => shift(base, i)).reduce(_ unionAll _)
      amplified.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    val K = 1000000000L
    write("lineitem", (df, i) => df.withColumn("l_orderkey", col("l_orderkey") + lit(i * K)))
    write("orders", (df, i) => df.withColumn("o_orderkey", col("o_orderkey") + lit(i * K)))
    write("events", (df, i) => df.withColumn("event_id", col("event_id") + lit(i * K)))
    write("documents", (df, i) => df.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
    write("embeddings", (df, i) => df.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
    // dims copied as-is (stay broadcast-sized, as they would in production)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      if (wanted(t))
        spark.read.parquet(s"$srcDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  val Targets = Seq(
    "q02_group_agg", "q04_double_dim_join", "q08_dedup_last_write",
    "q19_reingest_dedup", "q18_report_pairs", "q25_sessionize",
    "x01_dedup_exact", "x03_minhash_pairs", "x06_knn_brute",
    // round-2 operators
    "q34_window_funcs", "q35_range_join",
    "x16_minhash_portable", "x22_ngram_counts", "x26_tfidf_top_terms",
    // round-3/4 operators
    "q40_u256_decimal", "q41_u256_sum", "x29_lang_id_ngram",
    "x30_decontaminate", "x31_source_cap", "q43_skew_join",
    // round-4 closing-session operators
    "x36_dup_span_coverage", "x37_quantize_int8", "x38_pq_codes",
    "x41_lm_score", "q46_sliding_window", "q47_correlated_subquery",
    "q48_range_frame",
    // round-6 operators: date-partition pruning (30 partitions, 10x rows
    // per partition), deterministic sharding, vocab coverage, and x35 —
    // the one CC query whose INPUT actually scales with amplification
    // (x33 bounds itself to doc_id < 300 for its oracle, so amplifying
    // the corpus would only time the enlarged scan, not CC)
    "q50_partition_prune", "x44_shard_assign", "x45_vocab_oov",
    "x35_semantic_dedup",
    // round-6 closing-session operators: x47 is the gram-heavy one (its
    // posting pass is linear in corpus tokens); x46's distinct
    // (split, gram) set also grows with the corpus
    "x46_split_overlap", "x47_strip_dup_spans",
    // post-close-out operators whose cost grows with the corpus: BM25's
    // posting build, DSIR's gram aggregate, chunking's generate
    // expansion, the source-overlap distinct + pair join
    "x54_bm25_retrieval", "x59_dsir_select", "x60_chunk_overlap",
    "x62_source_overlap",
    // round-7 operators whose cost grows with the corpus: hybrid RRF's
    // shared posting build, the bigram-LM pair aggregate, CDC's
    // per-position hashing + chunk-hash aggregate, vocab-growth's word
    // explode. (x66 runs on the constant-size embeddings table and
    // x67 bounds itself to doc_id < 300 for its oracle, the x33 note.)
    "x64_hybrid_rrf", "x65_bigram_lm_fit", "x68_cdc_chunks",
    "x69_vocab_growth",
    // round-8 sweep (round-7 verdict item 5): q51's double-window and
    // q52's three filtered min-agg chains grow with events; x72's
    // pairwise-bucket join and x74's payload-hash aggregate grow with
    // documents. x76 and x77 bound themselves (doc_id < 300 / < 200)
    // for their oracles, so their rows measure that the profiling-class
    // queries stay FLAT as the corpus grows — the scan prunes on
    // doc_id, everything downstream is sample-sized (the x33 note).
    "q51_exact_median", "q52_funnel", "x72_source_tv_distance",
    "x74_media_dedup", "x76_effective_tokens", "x77_image_phash_dedup",
    // round-8 late additions whose cost grows with the corpus: x79's
    // LSH-pair verification joins, x80's bloom build + exact probe
    // join, q54's window family over events, x82's scan + tiny agg,
    // x83's BPE vocab fit + encode join. (x78/x84 run on the
    // constant-size embeddings table; x81/x85 bound themselves to
    // doc_id < 100 / < 50 for their closed-form codec oracles.)
    "x79_minhash_calibration", "x80_bloom_dedup", "q54_window_navigation",
    "x82_padding_efficiency", "x83_tokenizer_fertility",
    // round-9: q53's hourly agg + per-type rank-median double window
    // grows with events (the one r8 newcomer with no ×10 row, r8-verdict
    // item 7). x86/x87 bound themselves (doc_id < 100 / < 60) for their
    // codec oracles, so their rows measure the flat-profile property —
    // the scan prunes on doc_id, codec work is sample-sized (x77 note).
    "q53_volume_anomaly", "x86_file_ingest_phash", "x87_video_phash_dedup",
    // x88's corpus side (cell assignment, candidate encode, shortlist)
    // grows with the amplified embeddings table; the query set stays 10
    "x88_knn_ivfpq",
    // x90's partial-sketch build scans events (corpus-linear map-side
    // sketch updates); the merge level stays O(types x days)
    "x90_sketch_rollup",
    // round-10: x92's derivation join + both recall ladders scan the
    // amplified embeddings table (queries stay 10); x93's five assigns
    // + four fixed-point mean aggregates are each corpus-linear.
    // (x91 exercises a temp-dir round-trip, not a scalable scan.)
    "x92_clustered_recall", "x93_kmeans_inertia",
    // round-10 close: x95's injected-PII regex scan is pure map-side
    // corpus-linear row work; x94 bounds itself to doc_id < 300 for its
    // recursive-CC oracle, so its row measures the flat-profile
    // property — the scan prunes on doc_id, the CC + split stay
    // sample-sized (the x33/x76 note).
    "x94_cluster_safe_split", "x95_pii_scrub",
    // x96's priority computation is map-side corpus-linear with a
    // bounded per-partition heap (sample stays 100); x97 adds one
    // source-keyed aggregate over the same scan.
    "x96_weighted_sample", "x97_sample_allocation",
    // x98's pilot + survivor scans are each corpus-linear; the exact
    // selection runs on the ~2n survivor set regardless of corpus size
    "x98_weighted_sample_threshold",
    // x99's partial build scans events (corpus-linear map-side sketch
    // updates); the merge level stays O(types x days). The exact
    // verification side carries a per-type sort that also grows.
    "x99_quantile_rollup",
    // x100 bounds itself to doc_id < 300 for its recursive-CC oracle:
    // its row measures the flat-profile property (the x94 note), with
    // the two-fold incremental machinery on top.
    "x100_incremental_cc",
    // round-10 late: x101 is one corpus-linear pass into a source-keyed
    // window (budget stays 10/source); x102's fit aggregate + decision
    // projection are each one map-side corpus pass; x103's brute
    // candidate generation scans the amplified embeddings (queries stay
    // 10) while the pairs/greedy stages are query-bounded.
    "x101_grouped_weighted_sample", "x102_quality_classifier",
    "x103_mmr_rerank",
    // x104 pays two batch fit aggregates + the decision pass (all
    // corpus-linear map-side); x105 adds one hash aggregate to x102;
    // x106's brute truth + IVF probe sides scan the amplified
    // embeddings (queries stay 10, ranks stay bounded)
    "x104_incremental_classifier", "x105_classifier_audit",
    "x106_retrieval_mrr",
    // round-10 late cleaners: both pure map-side per-row transforms
    // (one corpus scan, zero shuffle) — the rows pin corpus-linearity
    "x107_intradoc_dedup", "x108_nfc_normalize",
    // x109 bounds itself to doc_id < 300 for its recursive-CC oracle
    // (the x94/x100 note): its row measures the flat-profile property,
    // with the removeAssign machinery on top
    "x109_cc_forget",
    // x110: two map-side hash scans + one co-partitioned full-outer
    // join on doc_id — the whole thing grows corpus-linearly
    "x110_corpus_diff",
    // round-11: x111 bounds itself to doc_id < 300 for its recursive-CC
    // oracle (the x94/x100/x109 note) — its row measures the
    // flat-profile property with the full streaming grow+forget
    // machinery on top. x112's vocab-sized fit frames don't grow under
    // amplification (shifted doc_ids copy the same words), so its row
    // pins that the deep fit's cost is vocab-bound, not corpus-bound,
    // past the one corpus-linear word-count pass. x113 is one
    // corpus-linear pass per wave into a source-keyed window (budget
    // stays 10/source). x114's derivation, Lloyd training passes, and
    // both ladders scan the amplified embeddings (queries stay 10);
    // x115 likewise with two shortlist cuts off one candidate chain —
    // NOTE the auto shortlist itself grows as N/C (125 -> ~1250 at
    // x10), which is the formula's documented contract (re-rank stays
    // proportional to one probed cell).
    "x111_component_stream", "x112_bpe_fit_batched",
    "x113_grouped_sample_stream", "x114_fitted_codebook_recall",
    "x115_shortlist_scale_trap",
    // round-12: x117 adds the version log + the doc-keyed resolve join
    // to x116's postings-linear profile (stale versions are a bounded
    // constant of the update script, compaction drops them); x118 is
    // the one-ladder subset of x114's corpus-linear profile plus a
    // 1-row occupancy aggregate; x119's per-wave priority pass is
    // corpus-linear, standing state O(sources × 10), move/backfill
    // waves are sample-sized
    "x117_bm25_retract_stream", "x118_ann_production_ladder",
    "x119_grouped_sample_rekey",
    // x120 is x51's probe cost plus the versioned-band resolve join —
    // the x117 profile on the band log (live bands bounded by the
    // corpus, stale versions a bounded constant of the update script)
    "x120_dedup_index_retract",
    // x121 is x119's profile (per-wave priority passes + sample-sized
    // update waves) plus one min-over-versions aggregate
    "x121_grouped_sample_forgotten",
    // x116's per-wave tokenize + append and the read-back's df/stats
    // re-aggregation are all postings-linear; query-term scoring joins
    // stay O(query-term postings)
    "x116_bm25_index_stream",
    // round-13: x122 is the x120 profile on the vector index — per-wave
    // bucketing is corpus-linear, the resolve join O(live vectors), the
    // probe one bucket equi-join over a 2x-corpus probe set. x123's
    // per-wave chunking is corpus-linear on the PORTABLE md5-per-position
    // form (the oracle's chunker — the production gear-hash path is the
    // 5x-cheaper one CdcBench measures); the resolve join is doc-keyed,
    // the probe O(eval chunks). x124 is x121's profile with the
    // per-group trim at n+ledger — same per-wave priority passes,
    // standing state O(sources x 13).
    "x122_emb_index_retract", "x123_cdc_index_retract",
    // x125 fuses x51's verdict probe with x120's versioned maintenance:
    // per-wave portable-md5 signing is the corpus-linear term (shared by
    // probe and append — one pass), the resolve join O(live bands), the
    // probe O(batch x touched buckets)
    "x124_grouped_sample_ledger", "x125_dedup_stream_retract",
    // round-13 late additions: x126 fuses embedding-dedup verdicts with
    // the versioned vector index (per-wave LSH bucketing corpus-linear,
    // 2x-corpus probe wave by design); x127 fuses CDC novelty with the
    // doc-attributed chunk index (portable chunker — the x123 caveat
    // applies to its x100); x128 maintains the IVF serving index
    // incrementally (per-wave assignment O(batch x C), serve off the
    // resolved inverted file)
    "x126_emb_dedup_stream_retract", "x127_cdc_novelty_stream_retract",
    "x128_ivf_index_upsert",
    // x130 is the rare-offline-event whole-corpus pass (refit + reassign
    // + swap) — corpus-linear BY DESIGN; the row quantifies what the
    // event costs next to the per-arrival loop it amortizes against
    "x130_ivf_refit_swap",
    // x132: doc-store waves are corpus-linear appends; each as-of arm is
    // the live-read shape (one id-keyed equi-join against the capped
    // max-seq aggregate) — four arms, no corpus re-scan. x133: the
    // distinct-text aggregates are corpus-linear scans of the retained
    // log (~1.5x corpus) and the live resolve. x134 adds to the wave
    // appends one fit aggregate per batch over O(batch) rows plus the
    // id-keyed previous-version read; the refit solve is driver-side
    // O(d^3) on a 1-row collect.
    "x132_asof_snapshot", "x133_sketch_rebuild", "x134_classifier_retract",
    // x135 is one corpus-linear per-source token aggregate; the whole
    // water-filling scan (sort, prefix sums, cutoff, redistribution)
    // runs on |sources| rows with two 1-row broadcast scalar attaches
    "x135_epoch_allocation",
    // x136 adds to x135 ONE corpus pass under a broadcast 20-row plan
    // join (copies counted arithmetically, never materialized)
    "x136_epoch_realize",
    // x137's quantize pass and both candidate sides scan the amplified
    // embeddings (queries stay 10, ranks bounded — the x06 brute class)
    "x137_int8_knn",
    // x138 is x134's wave profile plus one capped fold and one as-of
    // resolve — both log-sized, the scoring pass corpus-linear
    "x138_model_asof",
    // x139's per-wave delta aggregates are O(batch) map-side sums; the
    // read is one group-keyed sum over the delta log (groups-sized)
    "x139_rollup_ivm",
    // round-14: x140 is the x128 maintenance profile plus an O(live)
    // occupancy gauge per wave (one group-by over the stored
    // assignments, no cosine) and, on the firing wave, the x130
    // whole-corpus refit; the serve tail is x129's recall join. x141 is
    // the x132 doc-store wave profile split across two stream runs with
    // one below-floor fold (id-keyed, below-floor slice only) between
    // them; the as-of arms stay the live-read shape. x142 runs BOTH
    // maintenance regimes over the same waves: the additive deltas are
    // O(batch), the monotone policy pays the corpus-linear rebuild on
    // each of the two retraction waves — the rebuild term IS the
    // measured contrast.
    "x140_ivf_policy_loop", "x141_floor_compaction", "x142_ivm_contrast",
    // x143 is the x132 wave profile on the bucketed table layout (each
    // append repartitions the batch to `buckets` tasks); the resolve is
    // the shuffle-free bucket-local join. x144 is x138's profile (wave
    // appends + stats folds) plus one model-sized manifest commit/read.
    "x143_bucketed_resolve", "x144_training_cut",
    // round-15: x140's gauge is now the O(batch) standing-view update
    // (the comment above predates the r14-verdict-item-5 migration);
    // x145 is x141's floor-compaction profile on the bucketed layout —
    // the as-of arms are the shuffle-free bucket-local join. x146 is
    // the x125 fusion on a 1/8 slice with the per-batch probe plan
    // recorded — the exchange series itself is the measured object.
    "x145_bucketed_asof_floor", "x146_fused_probe_exchanges",
    // x147 is one tokenize pass + a sources-sized offsets window + ONE
    // source-keyed window shuffle — the two-level cumsum; the naive
    // global-window form it replaces would single-partition the corpus
    "x147_concat_chunk_pack",
    // x148 adds one ~corpus-sized explode + two bounded aggregations on
    // top of x147's dataflow; output stays model-sized (the histogram)
    "x148_chunk_segment_histogram",
    // x149 is x147 run incrementally: per wave one batch cumsum + one
    // map-side sum over the pack log (the watermark read)
    "x149_pack_stream",
    // round-16: x150 is x123's wave profile on the PRODUCTION gear
    // chunker (CdcCuts codegen + xxhash64 ids) — the path whose ×100
    // rows the md5 oracle-chunker caveat kept out of the table — plus
    // one batch rechunk of the final corpus for the equivalence flag
    "x150_cdc_gear_stream",
    // x151 is x149's dataflow plus one O(batch) chunk-incidence delta
    // append per wave and a rollup-log sum at read
    "x151_pack_chunk_view",
    // x152 is x117's wave profile on the bucketed table layout — the
    // posting build is corpus-linear, the resolve shuffle-free
    "x152_bm25_bucketed")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-smoke")
      // the bucketed-log queries (x120/x122/x123/x125-x128/x143/x145)
      // land catalog tables — keep the warehouse out of the working tree
      .config("spark.sql.warehouse.dir",
        graft.util.Scratch.tempDir("graft-scale-wh") + "/warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    // --epoch-contrast: run ONLY the synthetic epoch-order contrast
    // (needs no corpus, no srcDir/outDir/factor args) and exit.
    if (args.contains("--epoch-contrast")) {
      epochOrderContrast(spark); spark.stop(); return
    }
    val Array(srcDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    // --contrast-only: run just the cap/CC contrast cases below (their
    // only corpus need is documents), skipping the query sweep — the
    // mode that makes the ×100 contrast measurement affordable to rerun.
    val contrastOnly = args.contains("--contrast-only")
    // --skew-contrast: run only the q43 detection-cost contrast
    // (needs lineitem + orders) and exit.
    val skewContrast = args.contains("--skew-contrast")
    val needed =
      if (skewContrast) Some(Set("lineitem", "orders"))
      else if (contrastOnly) Some(Set("documents"))
      else None
    // a "factor scope srcMtime" marker guards against silently measuring
    // a stale scale: an outDir amplified at ×10 must not satisfy a ×100
    // run just because its files exist, a documents-only (contrast)
    // refresh must not certify the whole dir for a later full sweep, and
    // a REGENERATED source corpus must not be served from amplified
    // copies of the old one (the Derived.eventsByDate staleness class)
    val wantScope =
      if (skewContrast) "skew" else if (contrastOnly) "documents" else "full"
    def latestMtime(f: java.io.File): Long =
      if (f.isDirectory)
        (f.lastModified() +:
          Option(f.listFiles()).getOrElse(Array.empty).map(latestMtime).toSeq).max
      else f.lastModified()
    val srcMtime = latestMtime(new java.io.File(srcDir))
    val marker = new java.io.File(s"$outDir/.amplify-marker")
    val (markedFactor, markedScope, markedSrc) =
      scala.util.Try {
        val Array(f, sc, sm) = java.nio.file.Files.readString(marker.toPath).trim.split(" ")
        (f.toInt, sc, sm.toLong)
      }.getOrElse((-1, "", -1L))
    val fresh = markedFactor == factor && markedSrc == srcMtime &&
      (markedScope == "full" || markedScope == wantScope)
    if (!fresh) {
      if (marker.exists())
        println(s"[scale] outDir is x$markedFactor/$markedScope/src@$markedSrc, " +
          s"need x$factor/$wantScope/src@$srcMtime — re-amplifying")
      println(s"[scale] amplifying $srcDir x$factor -> $outDir" +
        (if (contrastOnly) " (documents only)" else ""))
      amplify(spark, srcDir, outDir, factor, needed)
      new java.io.File(outDir).mkdirs()
      java.nio.file.Files.writeString(marker.toPath, s"$factor $wantScope $srcMtime")
    }
    // SCALE_ONLY=x60_chunk_overlap,x62_source_overlap runs a subset of
    // the sweep (fresh amplify rules above still apply); unknown names
    // fail loudly — a typo must not read as a successful empty sweep
    val onlyTargets = sys.env.get("SCALE_ONLY").map(_.split(",").map(_.trim).toSet)
    onlyTargets.foreach { names =>
      val unknown = names.diff(Targets.toSet)
      require(unknown.isEmpty, s"SCALE_ONLY names not in Targets: ${unknown.mkString(", ")}")
    }
    if (skewContrast) { skewDetectContrast(spark, outDir); spark.stop(); return }
    (if (contrastOnly) Seq.empty
     else Targets.filter(t => onlyTargets.forall(_.contains(t)))).foreach { name =>
      // the BUILD is inside the timed region: queries with driver-side
      // fixpoint loops (x33/x35's connected components) do their real
      // work during construction, and timing only the final frame's
      // evaluation reported a misleading 0.2s for exactly those
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, outDir)
      // noop sink: full evaluation of every output column. count() would
      // let Catalyst prune whole operators (a window/join whose columns
      // the count never reads disappears from the plan) and report
      // flattering non-numbers for exactly the operators under test.
      df.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      // count AFTER the timer on purpose: it re-executes (a pruned plan),
      // but running it before would warm page cache/JIT for the timed
      // region — the timed run must be the cold one
      println(f"[scale] $name%-22s $secs%8.2fs  rows=${df.count()}")
    }

    // LSH cap contrast: the registered x03 above runs with the default
    // per-bucket cap (TextDedup.DefaultMaxBucket). Measure the uncapped
    // variant next to it — the pre-round-5 superlinear behavior — and
    // report what the cap discarded, so "bounded pair growth" is a
    // measured row, not a claim.
    if (onlyTargets.isEmpty) {
      import graft.ext.TextDedup
      val docs = spark.read.parquet(s"$outDir/documents.parquet")
      val sigs = TextDedup.minhashSignaturesPortable(docs)
      // persist so the post-timer count reads cached blocks instead of
      // re-running the deliberately superlinear uncapped pipeline; the
      // cache write is part of the timed pass (same for both variants).
      val uncapped = TextDedup.candidatePairsFrom(sigs, maxBucket = 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      uncapped.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val uncappedRows = uncapped.count()
      uncapped.unpersist()
      println(f"[scale] x03_uncapped          $secs%8.2fs  rows=$uncappedRows")
      val capped = TextDedup.candidatePairsFrom(sigs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t1 = System.nanoTime()
      capped.write.mode("overwrite").format("noop").save()
      val secsCapped = (System.nanoTime() - t1) / 1e9
      val cappedRows = capped.count()
      capped.unpersist()
      println(f"[scale] x03_capped            $secsCapped%8.2fs  rows=$cappedRows")
      val dropped = TextDedup.oversizedBuckets(sigs).collect() // O(oversized buckets), tiny
      // per_bucket_pair_expansions is work avoided per bucket, NOT distinct
      // pairs lost (a pair can recur across bands / survive elsewhere);
      // distinct_pair_delta is the actual output difference.
      println(s"[scale] x03 cap=${TextDedup.DefaultMaxBucket}: " +
        s"buckets_dropped=${dropped.length} " +
        s"per_bucket_pair_expansions=${dropped.map(_.getLong(3)).sum} " +
        s"distinct_pair_delta=${uncappedRows - cappedRows}")
    }

    // CC round-count contrast on a long-chain graph: 1000 disjoint
    // diameter-99 chains (100k nodes). Min-label needs ~diameter rounds;
    // alternating-star collapses in ~log(diameter) — the round-4 flagged
    // scale risk, now measured side by side.
    if (onlyTargets.isEmpty) {
      import graft.operators.ConnectedComponents
      val edges = spark.range(100000L).filter(col("id") % 100 =!= 99)
        .selectExpr("id AS a", "id + 1 AS b")
      val t0 = System.nanoTime()
      val (labsAlt, roundsAlt) = ConnectedComponents.labelsWithRounds(edges, maxIter = 30)
      val compsAlt = labsAlt.select("component").distinct().count()
      println(f"[scale] cc_chain_altstar     ${(System.nanoTime() - t0) / 1e9}%8.2fs  " +
        s"rounds=$roundsAlt comps=$compsAlt")
      val t1 = System.nanoTime()
      val (labsMin, roundsMin) = ConnectedComponents.labelsMinLabelWithRounds(edges, maxIter = 150)
      val compsMin = labsMin.select("component").distinct().count()
      println(f"[scale] cc_chain_minlabel    ${(System.nanoTime() - t1) / 1e9}%8.2fs  " +
        s"rounds=$roundsMin comps=$compsMin")
    }

    // Incremental-dedup cost-shape contrast (x51 / dedupedCorpusStream's
    // claim): replay the corpus in 5 arrival batches. The incremental
    // path signs ONLY the batch and probes the standing band index, so
    // per-batch cost should stay ~flat; the naive alternative re-signs
    // and re-pairs the whole accumulated corpus every arrival, so its
    // per-batch cost grows with the corpus. Both timed per batch, side
    // by side — "O(batch), not O(corpus)" as measured rows.
    if (onlyTargets.isEmpty) {
      import graft.ext.TextDedup
      val docs = spark.read.parquet(s"$outDir/documents.parquet")
      val B = 5
      val batches = (0 until B).map(i =>
        docs.filter(pmod(col("doc_id"), lit(B)) === i))
      var index: DataFrame = null
      batches.zipWithIndex.foreach { case (b, i) =>
        val t0 = System.nanoTime()
        val sigs = TextDedup.minhashSignatures(b).localCheckpoint(false)
        val verdicts =
          if (index == null)
            TextDedup.incrementalDedupBanded(TextDedup.signatureBands(sigs).limit(0), sigs)
          else TextDedup.incrementalDedupBanded(index, sigs)
        val kept = verdicts.filter(col("keep") === 1).select("doc_id")
        val newBands = TextDedup.signatureBands(
          sigs.join(kept, Seq("doc_id"), "left_semi"))
        // eager checkpoint = the batch's index append, inside the timer;
        // it also truncates lineage so batch k+1 never recomputes k
        index = (if (index == null) newBands else index.unionAll(newBands))
          .localCheckpoint(true)
        println(f"[scale] incdedup_batch$i      ${(System.nanoTime() - t0) / 1e9}%8.2fs  " +
          s"index_bands=${index.count()}")
      }
      var acc: DataFrame = null
      batches.zipWithIndex.foreach { case (b, i) =>
        val t0 = System.nanoTime()
        acc = if (acc == null) b else acc.unionAll(b)
        val pairs = TextDedup.candidatePairs(acc).count()
        println(f"[scale] rededup_batch$i       ${(System.nanoTime() - t0) / 1e9}%8.2fs  " +
          s"corpus_pairs=$pairs")
      }
    }

    if (onlyTargets.isEmpty) epochOrderContrast(spark)
    spark.stop()
  }

  /** q43 detection-cost contrast (round-8, verdict item 1's "done" row):
    * skewAwareJoin with full-scan Misra-Gries detection vs the sampled
    * default (2% Bernoulli) vs the plain join floor, on the amplified
    * fact/dim pair. Through round 7 the full detection pass made q43 the
    * registry's only plan scanning its fact input twice; the sampled
    * pass should price detection at ~the sample fraction, putting the
    * skew-aware join within ~1.15x of the plain join. Standalone via
    * `--skew-contrast` (amplifies only lineitem + orders).
    */
  def skewDetectContrast(spark: SparkSession, dir: String): Unit = {
    import graft.operators.Salt
    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
    val dim = spark.read.parquet(s"$dir/orders.parquet")
    def agg(df: DataFrame): Unit = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").format("noop").save()
    // min of two passes per variant, plain join FIRST — a single cold
    // pass hands whichever variant runs last the page-cache advantage
    // (Bench's noise rationale)
    val cases: Seq[(String, () => Unit)] = Seq(
      "q43_plain_join" -> (() =>
        agg(fact.join(dim, fact("l_orderkey") === dim("o_orderkey")))),
      "q43_known_hot" -> (() =>
        agg(Salt.skewAwareJoin(fact, dim, "l_orderkey", "o_orderkey",
          col("l_linenumber"), nSalts = 8, knownHot = Some(Seq("1", "7"))))),
      "q43_detect_sampled" -> (() =>
        agg(Salt.skewAwareJoin(fact, dim, "l_orderkey", "o_orderkey",
          col("l_linenumber"), nSalts = 8, detectFraction = 0.02))),
      "q43_detect_fullscan" -> (() =>
        agg(Salt.skewAwareJoin(fact, dim, "l_orderkey", "o_orderkey",
          col("l_linenumber"), nSalts = 8, detectFraction = 1.0))))
    cases.foreach { case (label, run) =>
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[scale] $label%-21s $secs%8.2fs")
    }
  }

  /** Epoch-order contrast (x61's claim): a deterministic global training
    * permutation via per-shard ranks + broadcast prefix counts vs the
    * naive global row_number, which serializes the whole corpus through
    * ONE window task. Same task class (emit doc_id -> position), 10M
    * synthetic ids, both fully evaluated through a noop write. The
    * permutations differ by construction (shard-major vs hash-major);
    * the contrast is throughput of the ordering mechanism itself.
    * Standalone via `--epoch-contrast` (needs no amplified corpus).
    */
  def epochOrderContrast(spark: SparkSession): Unit = {
    import graft.ext.{TextDedup, TextStats}
    import org.apache.spark.sql.expressions.Window
    val n = sys.env.getOrElse("SCALE_EPOCH_N", "10000000").toLong
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val t0 = System.nanoTime()
    TextStats.epochOrder(ids, nShards = 64)
      .write.mode("overwrite").format("noop").save()
    println(f"[scale] epoch_order_sharded  ${(System.nanoTime() - t0) / 1e9}%8.2fs  " +
      s"n=$n shards=64")
    val t1 = System.nanoTime()
    val h = TextDedup.portableHash(col("doc_id").cast("string"), "epoch0")
    ids.select(col("doc_id"), h.as("h"))
      .withColumn("epoch_pos", row_number().over(Window.orderBy(col("h"), col("doc_id"))))
      .write.mode("overwrite").format("noop").save()
    println(f"[scale] epoch_order_global   ${(System.nanoTime() - t1) / 1e9}%8.2fs  " +
      s"n=$n (single window task)")
  }
}
