package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.word_shingles

/** Large-scale text deduplication operators for training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH (shingle→minhash→band→bucket-join),
  * SimHash, and exact n-gram Jaccard over candidate pairs.
  *
  * Scale posture: nothing here compares all pairs. Exact dedup is one
  * hash aggregation; MinHash/LSH reduces near-dup search to an equi-join
  * on (band, band_hash) buckets — the standard shape that holds at 100 TB
  * because candidate generation is linear and the bucket join is a plain
  * shuffled hash join (skewed buckets are split by AQE).
  */
object TextDedup {

  /** Exact duplicate groups by content hash: one row per distinct text,
    * the surviving doc (min id) and the multiplicity.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).cast("long").as("keep_id"), count(lit(1)).as("n_copies"))

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands

  /** MinHash signatures as an explode→min-aggregate dataflow:
    * one row per (doc, distinct shingle), then `NumHashes` seeded
    * xxhash64 min-aggregates per doc (permutation i = xxhash64(sh, i)).
    *
    * Deliberately NOT a nested array expression over a shingle array:
    * Catalyst's CollapseProject would inline the shingle construction
    * into every one of the 16 components (observed 60×+ recompute).
    * The aggregate form computes shingles exactly once per doc, gets
    * map-side partial aggregation, and shuffles only (doc_id, 16 longs)
    * — the shape that holds at 100 TB.
    *
    * Output: doc_id, s0..s{NumHashes-1}. Docs with no shingle (< 3
    * words) drop out (explode of an empty array).
    */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // hash each shingle STRING once; the per-permutation hashes remix the
    // resulting 8-byte long (xxhash64 over a long is ~free next to
    // re-hashing the string 16×) — the standard one-hash MinHash trick
    val sh = docs
      .select(col(idCol).as("doc_id"), explode(word_shingles(col(textCol), 3)).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val aggs = (0 until NumHashes).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"s$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  private def bandStructs: Column = array((0 until Bands).map { b =>
    val comps = (0 until RowsPerBand).map(r => col(s"s${b * RowsPerBand + r}"))
    struct(lit(b).as("band"), xxhash64(comps: _*).as("band_hash"))
  }: _*)

  private def sigArray: Column = array((0 until NumHashes).map(i => col(s"s$i")): _*)

  /** (doc_id, band, band_hash) rows: the LSH bucketing of the signature.
    * Docs sharing a (band, band_hash) bucket are near-dup candidates.
    */
  def lshBands(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    minhashSignatures(docs, idCol, textCol)
      .select(col("doc_id"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))

  /** Banding under the portable family, with a collision-free string
    * band key (`s_i` components joined by '_') instead of a band hash —
    * reproducible in any engine, which is what lets the band bucketing
    * itself carry an oracle (x02). At scale the band_hash form is the
    * production path (8-byte key vs a string); semantics are identical
    * up to hash collisions.
    */
  def lshBandsPortable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bandKeys = array((0 until Bands).map { b =>
      val comps = (0 until RowsPerBand).map(r => col(s"s${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), concat_ws("_", comps: _*).as("band_key"))
    }: _*)
    minhashSignaturesPortable(docs, idCol, textCol)
      .select(col("doc_id"), explode(bandKeys).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_key").as("band_key"))
  }

  /** Near-duplicate candidate pairs via the LSH bucket equi-join, with
    * the signature-estimated Jaccard (fraction of equal components).
    * The self-join keys on (band, band_hash) — a plain shuffled hash
    * join over buckets, never an all-pairs product.
    */
  def candidatePairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    candidatePairsFrom(minhashSignatures(docs, idCol, textCol), maxBucket)

  /** Default per-(band, band_hash) bucket cap for candidate generation.
    * A bucket of k docs expands to k·(k-1)/2 pairs — the ONE measured
    * superlinear path in the engine (SCALING.md: 27.3M pairs at ×100 dup
    * saturation, C(100,2) per bucket). What the cap does and does NOT
    * guard (measured, SCALING.md round 6): buckets past 256 are runaway
    * boilerplate/stop-shingle collisions and get clipped (35 such
    * buckets at ×100, 1.67M avoided expansions, 1.3% output delta); a
    * merely dup-saturated corpus (~100 docs per bucket) stays UNDER the
    * default, so global saturation is intentionally not capped away —
    * the mitigation for that is pipeline order, exact dedup (x01)
    * before LSH. 256 bounds any one bucket at C(256,2) ≈ 33k pairs.
    * `maxBucket = 0` disables the cap (exact output).
    */
  val DefaultMaxBucket = 256

  /** Candidate generation over any (doc_id, s0..s15) signature frame —
    * shared by the xxhash64 fast path and the oracled portable family.
    *
    * Formulated as groupBy-bucket + in-bucket pair expansion rather than
    * a bucket self-join (round-2): the self-join evaluated the signature
    * subtree twice (no exchange reuse across differently-aliased sides)
    * and paid two shuffles; this shape computes signatures once and
    * shuffles once. In-bucket expansion is quadratic in bucket size on
    * purpose — candidate pairs ARE that quadratic set (the join emitted
    * the same rows); LSH's premise is that buckets stay small. Buckets
    * larger than `maxBucket` are dropped (defaulted on — see
    * [[DefaultMaxBucket]]); [[oversizedBuckets]] reports what a given
    * cap discards so the drop is observable, not silent.
    */
  def candidatePairsFrom(signatures: DataFrame, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val banded = signatures
      .select(col("doc_id"), sigArray.as("sig"), explode(bandStructs).as("bb"))
      .select(col("bb.band").as("band"), col("bb.band_hash").as("band_hash"),
        struct(col("doc_id"), col("sig")).as("ds"))
    // sort_array orders by doc_id (unique), so j < i gives doc_a < doc_b
    val sizeOk =
      if (maxBucket > 0) size(col("ms")) > 1 && size(col("ms")) <= maxBucket
      else size(col("ms")) > 1
    val buckets = banded.groupBy(col("band"), col("band_hash"))
      .agg(sort_array(collect_list(col("ds"))).as("ms"))
      .filter(sizeOk)
    val pairStructs = flatten(transform(sequence(lit(1), size(col("ms")) - 1), i =>
      transform(sequence(lit(0), i - 1), j => {
        val a = element_at(col("ms"), j + 1)
        val b = element_at(col("ms"), i + 1)
        struct(
          a.getField("doc_id").as("doc_a"),
          b.getField("doc_id").as("doc_b"),
          (aggregate(
            zip_with(a.getField("sig"), b.getField("sig"),
              (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v
          ).cast("double") / lit(NumHashes.toDouble)).as("est_jaccard"))
      })))
    buckets.select(explode(pairStructs).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.est_jaccard"))
      .distinct()
  }

  /** The buckets a given `maxBucket` cap would discard, with their sizes
    * and the pair count each would have expanded to — the observability
    * half of the cap: run it next to [[candidatePairsFrom]] (same
    * signature frame, same single-shuffle shape) to log what was dropped
    * instead of dropping silently. Empty output ⇒ the cap was inert and
    * the capped result is exact. `maxBucket <= 0` means "cap disabled"
    * (matching [[candidatePairsFrom]]'s sentinel), so nothing is
    * discarded and the output is empty. `pairs_dropped` is each bucket's
    * own pair expansion — a per-bucket work measure, not a count of
    * distinct output pairs lost (the same doc pair can sit in oversized
    * buckets of several bands, or survive via another small bucket).
    */
  def oversizedBuckets(signatures: DataFrame, maxBucket: Int = DefaultMaxBucket): DataFrame =
    signatures
      .select(col("doc_id"), explode(bandStructs).as("bb"))
      .groupBy(col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
      .agg(count(lit(1)).as("bucket_size"))
      .filter(if (maxBucket > 0) col("bucket_size") > maxBucket else lit(false))
      .select(col("band"), col("band_hash"), col("bucket_size"),
        (col("bucket_size") * (col("bucket_size") - 1) / 2).cast("long").as("pairs_dropped"))

  /** Signature frame → one row per (band, band_hash) membership, sig
    * carried for the pair-level Jaccard estimate: the INDEX layout of
    * incremental dedup. At corpus scale this frame is what gets stored
    * — bucketed on `band_hash` (`Bucketing.writeBucketed` /
    * `Ingest.compactBucketed`) so every batch probe is a co-located
    * join with ZERO index-side shuffle (HashPartitioning(band_hash)
    * satisfies the probe's (band, band_hash) clustering;
    * IncrementalDedupSpec locks the plan shape).
    */
  def signatureBands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), sigArray.as("sig"), explode(bandStructs).as("bb"))
      .select(col("bb.band").as("band"), col("bb.band_hash").as("band_hash"),
        col("doc_id"), col("sig"))

  private def estJaccard(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / lit(NumHashes.toDouble)

  /** Incremental near-dup candidates: which docs of a NEW batch collide
    * with a standing corpus signature INDEX, and with each other. This
    * is the production shape of dedup at corpus scale — signatures for
    * the standing corpus are computed ONCE at ingest and kept as an
    * index table; arriving batches shingle/hash only themselves and
    * probe the index by band bucket. The corpus is never re-shingled,
    * so per-batch cost is O(batch), not O(corpus).
    *
    * Output: one row per candidate, `new_id` (the batch doc whose
    * survival is in question), `match_id`, `est_jaccard` (fraction of
    * equal signature components), `origin` ('corpus' = match_id is an
    * index doc; 'batch' = an in-batch rival with SMALLER id — the
    * orientation the keep-min-id rule consumes). Index and batch must
    * carry disjoint doc ids.
    *
    * Scale shape: batch band keys semi-join the index (AQE broadcasts
    * the key set when the batch is small; a bucketed index makes the
    * probe co-located), per-bucket INDEX size is capped at `maxBucket`
    * exactly like [[candidatePairsFrom]] caps in-batch buckets — a
    * boilerplate bucket with 100k index docs must not fan every batch
    * doc out 100k ways. In-batch pairs reuse [[candidatePairsFrom]].
    */
  def incrementalCandidates(indexSigs: DataFrame, batchSigs: DataFrame,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    incrementalCandidatesBanded(signatureBands(indexSigs), batchSigs, maxBucket)

  /** [[incrementalCandidates]] over a PRE-BANDED index — the frame
    * [[signatureBands]] produces, typically read back from the stored
    * (bucketed-on-band_hash) index table so the probe plans no
    * index-side exchange. This is the entry point a production ingest
    * loop calls per batch.
    */
  def incrementalCandidatesBanded(indexBands: DataFrame, batchSigs: DataFrame,
      maxBucket: Int = DefaultMaxBucket, excludeSelf: Boolean = false): DataFrame = {
    // excludeSelf (round-13, x125): under a VERSIONED index the same
    // doc_id legitimately exists on both sides — a doc UPDATE probes an
    // index that still serves its own previous version, and "you are a
    // near-duplicate of your own last crawl" is not a dedup signal. The
    // x51 contract (disjoint ids) keeps the default false, where the
    // filter is vacuous.
    val ib = indexBands
    val nb = signatureBands(batchSigs)
    val keys = nb.select(col("band"), col("band_hash")).distinct()
    // index rows in buckets the batch touches — the only index slice
    // this batch's dedup ever reads
    val touched = ib.join(keys, Seq("band", "band_hash"), "left_semi")
    val capped =
      if (maxBucket > 0) {
        val ok = touched.groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("n_idx"))
          .filter(col("n_idx") <= maxBucket)
          .select(col("band"), col("band_hash"))
        touched.join(ok, Seq("band", "band_hash"), "left_semi")
      } else touched
    val newOld = capped
      .join(nb.select(col("band"), col("band_hash"),
        col("doc_id").as("new_id"), col("sig").as("nsig")), Seq("band", "band_hash"))
      .filter(if (excludeSelf) col("doc_id") =!= col("new_id") else lit(true))
      .select(col("new_id"), col("doc_id").as("match_id"),
        estJaccard(col("nsig"), col("sig")).as("est_jaccard"),
        lit("corpus").as("origin"))
      .distinct()
    val newNew = candidatePairsFrom(batchSigs, maxBucket)
      .select(col("doc_b").as("new_id"), col("doc_a").as("match_id"),
        col("est_jaccard"), lit("batch").as("origin"))
    newOld.unionAll(newNew)
  }

  /** Incremental dedup verdicts: for every SIGNED batch doc (the
    * signature frame is the universe — docs too short to shingle have
    * no signature and no verdict), how many corpus docs and how many
    * smaller-id batch rivals it matches at `threshold`, and whether it
    * survives (`keep` = no hit of either kind — new-vs-corpus dedup
    * plus keep-min-id within the batch, in one pass over
    * [[incrementalCandidates]]).
    */
  def incrementalDedup(indexSigs: DataFrame, batchSigs: DataFrame,
      threshold: Double = 0.5, maxBucket: Int = DefaultMaxBucket): DataFrame =
    incrementalDedupBanded(signatureBands(indexSigs), batchSigs, threshold, maxBucket)

  /** [[incrementalDedup]] over a PRE-BANDED index (the
    * [[signatureBands]] layout, typically read back from the stored
    * index table) — the verdict entry point a production ingest loop
    * calls per batch; see [[incrementalCandidatesBanded]].
    */
  def incrementalDedupBanded(indexBands: DataFrame, batchSigs: DataFrame,
      threshold: Double = 0.5, maxBucket: Int = DefaultMaxBucket,
      excludeSelf: Boolean = false): DataFrame = {
    val hits = incrementalCandidatesBanded(indexBands, batchSigs, maxBucket, excludeSelf)
      .filter(col("est_jaccard") >= threshold)
      .groupBy(col("new_id").as("doc_id"))
      .agg(count_if(col("origin") === "corpus").as("n_corpus_hits"),
        count_if(col("origin") === "batch").as("n_batch_rivals"))
    batchSigs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_corpus_hits"), lit(0L)).as("n_corpus_hits"),
        coalesce(col("n_batch_rivals"), lit(0L)).as("n_batch_rivals"))
      .withColumn("keep",
        (col("n_corpus_hits") === 0 && col("n_batch_rivals") === 0).cast("int"))
  }

  /** Benchmark decontamination: per training document, how many of its
    * distinct word-`n`-gram shingles appear anywhere in the evaluation
    * set (`isEval` rows) — the standard leakage check a training-data
    * pipeline runs before a corpus ships. Scale shape: the eval side is
    * a fixed benchmark suite (small by construction), so its distinct
    * shingle set broadcasts; the training side is one map-side explode +
    * broadcast probe + re-aggregation — shuffled bytes O(train docs),
    * never O(train shingles). Docs too short to shingle survive with
    * zero counts (explode_outer).
    */
  def contamination(docs: DataFrame, isEval: Column, n: Int = 5): DataFrame = {
    val shingled = docs.select(col("doc_id"), isEval.as("is_eval"),
      graft.functions.word_shingles(col("text"), n).as("sh"))
    val evalGrams = shingled.filter(col("is_eval"))
      .select(explode(col("sh")).as("g")).distinct()
      .withColumn("hit", lit(1L))
    shingled.filter(!col("is_eval"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode_outer(col("sh")).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(coalesce(sum(col("hit")), lit(0L)).as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated") > 0).cast("int").as("contaminated"))
  }

  /** Engine-portable 60-bit hash: the first 15 hex chars of md5 parsed
    * as a long. Slower than xxhash64 (the production family) but
    * reproducible in any engine with md5 — which is what lets the
    * portable MinHash/SimHash variants carry a DuckDB oracle. Computed
    * by the codegen [[graft.functions.Md5Prefix60]] kernel (no hex
    * string round-trip); [[portableHashBuiltin]] is the composed-builtin
    * twin it is property-tested against.
    */
  def portableHash(c: Column, salt: String): Column = {
    val in = (if (salt.isEmpty) c else concat(c, lit(salt))).cast("binary")
    graft.functions.md5_prefix60(in)
  }

  /** Same value from Spark built-ins only (md5 hex + conv reparse). */
  def portableHashBuiltin(c: Column, salt: String): Column =
    conv(substring(md5(concat(c, lit(salt)).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  val PortableMask: Long = (1L << 60) - 1

  /** Per-permutation constants for the portable remix, precomputed in
    * Scala so neither engine multiplies (int64 overflow semantics differ:
    * DuckDB raises, the JVM wraps).
    */
  /** Corpus-pair overlap matrix: for every pair of sources, the shingle-
    * set Jaccard similarity BOTH as a per-source MinHash sketch estimate
    * (agreeing components / NumHashes) and exactly (hash-set
    * intersection over union) — the "which corpora duplicate each
    * other" signal that prioritizes cross-corpus dedup before mixing.
    *
    * Scale posture: the sketch is the 100 TB artifact — one distinct +
    * one min-aggregate collapse the corpus to NumHashes longs per
    * source, and the pair expansion runs on that source-count-sized
    * frame (never corpus rows). The exact companion costs one keyed
    * equi-join on the distinct shingle hashes (linear, one shuffle;
    * emitted here because pair count is bounded by source cardinality —
    * at petabyte scale run the sketch alone and reserve the exact join
    * for the pairs the sketch flags). Both ratios are single IEEE
    * divisions of exact integers: the estimate k/NumHashes is a dyadic
    * rational, bit-identical cross-engine.
    *
    * Contract: a source whose every doc has fewer than 3 words
    * contributes no shingles, has no shingle SET, and appears in no
    * output pair (absent row, not a 0.0 row) — callers iterating the
    * matrix should treat absence as "nothing to compare", and a corpus
    * where that matters should pre-filter such sources explicitly.
    */
  def sourceOverlap(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    // the distinct (source, hash) frame feeds the sketch aggregate, the
    // per-source sizes, and both sides of the exact-intersection join —
    // materialize the explode+distinct once (round-10 ScanAudit: 6
    // documents scans here before the pin)
    val sh = docs
      .select(col(sourceCol).as("source"),
        explode(graft.functions.word_shingles(col(textCol), 3)).as("shingle"))
      .select(col("source"), portableHash(col("shingle"), "").as("h0"))
      .distinct()
      .localCheckpoint(false)
    val aggs = (0 until NumHashes).map(i => min(portableRemix(col("h0"), i)).as(s"s$i"))
    // |sources| rows but a full corpus-pass aggregate to derive — its
    // self-join consumes it twice
    val sigs = sh.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.h0") === col("b.h0") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    val agree = (0 until NumHashes)
      .map(i => when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0))
      .reduce(_ + _)
    val est = sigs.as("x")
      .join(sigs.as("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        (agree.cast("double") / lit(NumHashes.toDouble)).as("est_jaccard"))
    est
      .join(inter, Seq("source_a", "source_b"), "left")
      .join(broadcast(sizes.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n", "n_a")), Seq("source_a"))
      .join(broadcast(sizes.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n", "n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("est_jaccard"),
        coalesce(col("n_inter"), lit(0L)).cast("long").as("n_inter"),
        (coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L))).cast("double"))
          .as("exact_jaccard"))
  }

  def portableRemixConsts(i: Int): (Long, Long) =
    (graft.functions.splitmix64(1000L + i) & PortableMask, graft.functions.splitmix64(2000L + i) & PortableMask)

  /** Permutation i of a 60-bit portable hash using only xor / right-shift
    * / add / mask — operations with identical non-negative int64
    * semantics in Spark and DuckDB (the one-hash MinHash trick, kept
    * oracle-expressible: md5 runs once per shingle, not NumHashes times).
    */
  def portableRemix(h0: Column, i: Int): Column = {
    val (d, c) = portableRemixConsts(i)
    val x = h0.bitwiseXOR(lit(d))
    val y = x.bitwiseXOR(shiftright(x, 29))
    val z = (y + lit(c)).bitwiseAND(lit(PortableMask))
    z.bitwiseXOR(shiftright(z, 13))
  }

  /** MinHash signatures under the portable md5 family (same dataflow as
    * [[minhashSignatures]], same one-hash-then-remix cost shape; oracled
    * as x16/x18).
    */
  def minhashSignaturesPortable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), explode(word_shingles(col(textCol), 3)).as("shingle"))
      .select(col("doc_id"), portableHash(col("shingle"), "").as("h0"))
    val aggs = (0 until NumHashes).map(i =>
      min(portableRemix(col("h0"), i)).as(s"s$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** SimHash over word unigrams: per word hash, each bit votes +1/-1;
    * sign of the vote sum sets the output bit. Implemented as `bits`
    * conditional-sum aggregates (partial map-side combine) + a bit-OR
    * recombination — distributed, no per-doc state. The default family
    * is xxhash64/64-bit; pass `portableHash(_, "")`/60 for the
    * oracle-reproducible variant.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      hashFn: Column => Column = xxhash64(_), bits: Int = 64): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("word"))
      .withColumn("h", hashFn(col("word")))
    val votes = (0 until bits).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$bit")
    }
    val agg = words.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sh = (0 until bits).map { bit =>
      when(col(s"b$bit") >= 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("doc_id"), sh.as("simhash"))
  }

  /** Near-dup edge generation: document pairs sharing at least
    * `minShared` distinct word-n-grams within a block. Built as an
    * inverted index — explode shingles, equi-join posting lists on
    * (block, shingle), count per pair — NOT a blocked all-pairs
    * comparison: candidate work is proportional to Σ df(shingle)²
    * over shingles, not to block-size². `maxDf` drops stop-shingles
    * whose posting lists exceed it (a shingle in k docs contributes
    * k·(k-1)/2 pairs — the standard df cap bounds the worst case;
    * 0 = off for oracle-exact output).
    *
    * Output: doc_a < doc_b, n_shared.
    */
  def sharedShingleEdges(docs: DataFrame, blockCol: String, n: Int,
      minShared: Long = 1, maxDf: Long = 0): DataFrame = {
    val posts0 = docs.select(col("doc_id"), col(blockCol).as("block"),
      explode(word_shingles(col("text"), n)).as("sh"))
    val posts =
      if (maxDf <= 0) posts0
      else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("block", "sh")
        posts0.withColumn("df", count(lit(1)).over(w))
          .filter(col("df") <= maxDf).drop("df")
      }
    val a = posts.select(col("block"), col("sh"), col("doc_id").as("doc_a"))
    val b = posts.select(col("block"), col("sh"), col("doc_id").as("doc_b"))
    a.join(b, Seq("block", "sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Exact-substring-dedup signal at word-n-gram granularity (the
    * deduplicate-training-data shape: find spans that repeat across
    * documents, not just near-identical whole documents): per document,
    * the fraction of token positions covered by at least one word-`n`-gram
    * that also occurs in ANOTHER document. High coverage = boilerplate /
    * mirrored content that whole-doc MinHash misses because the rest of
    * the page differs.
    *
    * Dataflow: posexplode all n-grams (position-preserving
    * [[graft.functions.word_ngrams]], not the distinct shingle set) →
    * cross-document grams by `min(doc) != max(doc)` per gram (one hash
    * aggregate — no count-distinct expand) → semi-join back the postings
    * → explode each surviving occurrence into its `n` covered positions →
    * distinct-count per doc. Work is linear in corpus tokens plus n× the
    * duplicated occurrences; nothing is ever pairwise.
    *
    * `hashGrams` (the 100 TB default) shuffles 8-byte xxhash64 keys
    * instead of the gram strings — identical output up to 2^-64 hash
    * collisions, 2.8× less shuffle (tools.DupSpanBench / SCALING.md).
    * The oracled query (x36) runs with raw strings so the hash check is
    * exact; ExtSpec asserts both variants agree.
    */
  def dupSpanCoverage(docs: DataFrame, n: Int = 8, hashGrams: Boolean = true): DataFrame = {
    val gramKey: Column => Column =
      if (hashGrams) g => xxhash64(g) else g => g
    val grams = docs
      .select(col("doc_id"), posexplode(graft.functions.word_ngrams(col("text"), n)))
      .select(col("doc_id"), col("pos"), gramKey(col("col")).as("gram"))
    // deliberately NOT pinned despite the dual consumer (cross-doc
    // aggregate + coverage semi-join, runtime ReusedExchange=0): this
    // frame is map-only to re-derive (posexplode + hash, no shuffle)
    // and ~8x corpus size to store, so re-running the explode is the
    // scale-safe side of the trade — pinning measured ~25% slower
    // locally. Pin only frames whose re-derivation crosses a shuffle
    // (splitOverlap/sourceOverlap's distincts) or that reduce to
    // broadcast size (signatures, centroids, codebooks).
    val crossDocGrams = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select(col("gram"))
    val covered = grams.join(crossDocGrams, Seq("gram"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("cp"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("cp")).as("n_covered"))
    docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        (coalesce(col("n_covered"), lit(0L)).cast("double") / col("n_tokens").cast("double"))
          .as("coverage"))
  }

  /** Split-contamination matrix: for every pair of corpus splits (train/
    * eval/test…), the number of distinct word-`n`-gram shingles the two
    * splits share, plus per-split totals and the shingle-set Jaccard —
    * the aggregate leakage dashboard a pipeline checks after splitting
    * (x30's `contamination` is the per-document drill-down; this is the
    * corpus-level view across ALL split pairs at once).
    *
    * Scale shape: distinct (split, gram) pairs — one explode + distinct
    * shuffle — then a self equi-join on the gram. Each gram appears in at
    * most |splits| rows, so the join fans out ≤ |splits|² per gram with
    * |splits| a small constant (2–5); output is |splits|² rows. Nothing
    * depends on corpus size beyond the linear shingle pass.
    */
  def splitOverlap(docs: DataFrame, splitCol: String, n: Int = 5): DataFrame = {
    // Shingles reduce to 64-bit xxhash64 keys BEFORE the distinct, so
    // the distinct, the per-split totals, and the self-join all move
    // longs instead of ~n-word strings (the dominant exchanges here —
    // same idiom as [[dupSpanCoverage]]/[[stripDupSpans]]). A collision
    // (~n_shingles^2 / 2^65) could merge two shingles across splits.
    // one explode+distinct pass, materialized: the gram frame feeds the
    // totals, BOTH sides of the self-join, and (via totals) the pair
    // scaffold — un-checkpointed, every consumer re-runs the explode +
    // distinct from the raw corpus (round-10 ScanAudit: 6 documents
    // scans in this one plan)
    val grams = docs
      .select(col(splitCol).as("split"), explode(word_shingles(col("text"), n)).as("gs"))
      .select(col("split"), xxhash64(col("gs")).as("g"))
      .distinct()
      .localCheckpoint(false)
    // |splits| rows, but each derivation is a full aggregate over grams —
    // three consumers, so pin it too
    val totals = grams.groupBy("split").agg(count(lit(1)).as("n_grams"))
      .localCheckpoint(false)
    val a = grams.select(col("split").as("split_a"), col("g"))
    val b = grams.select(col("split").as("split_b"), col("g"))
    val shared = a.join(b, Seq("g")).filter(col("split_a") < col("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_shared"))
    // every split pair appears even at zero overlap — a dashboard whose
    // healthy no-leak outcome is a MISSING row can't distinguish "clean"
    // from "never computed"; the pair frame is |splits|² rows, driven by
    // the broadcast-sized totals
    val splits = totals.select(col("split"))
    val pairs = splits.select(col("split").as("split_a"))
      .crossJoin(splits.select(col("split").as("split_b")))
      .filter(col("split_a") < col("split_b"))
    pairs.join(shared, Seq("split_a", "split_b"), "left")
      .join(broadcast(totals.select(col("split").as("split_a"), col("n_grams").as("n_a"))),
        Seq("split_a"))
      .join(broadcast(totals.select(col("split").as("split_b"), col("n_grams").as("n_b"))),
        Seq("split_b"))
      .select(col("split_a"), col("split_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"), col("n_a"), col("n_b"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_shared"), lit(0L))).cast("double"))
          .as("jaccard"))
  }

  /** Cross-document duplicated-span REMOVAL (the active sibling of
    * [[dupSpanCoverage]]'s metric): drop every token position covered by
    * a word-`n`-gram that also occurs in another document, and rebuild
    * the surviving text in original token order — the "remove duplicated
    * passages, keep the unique remainder" step (exact-substring dedup à
    * la deduplicating-training-data) rather than whole-document removal.
    *
    * Dataflow: the same linear posting shape as the coverage metric
    * (posexplode grams → cross-doc grams by min(doc)≠max(doc) → semi-join
    * → explode covered positions) plus one anti-join of the token stream
    * against covered positions and a per-doc ordered reassembly
    * (sort by position inside a bounded per-doc group — document length,
    * not corpus size). Docs shorter than `n` tokens have no grams and
    * survive verbatim; fully-covered docs come back with empty text.
    */
  def stripDupSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").as("tpos"), col("col").as("tok"))
    // Grams shuffle as 64-bit xxhash64 keys, never as n-word strings —
    // the [[dupSpanCoverage]] idiom: the cross-doc aggregate and the
    // semi-join below are the two big exchanges here, and hashing cuts
    // their shuffle bytes ~8x (an 8-gram averages ~50 chars). A hash
    // collision (~n_grams^2 / 2^65) could only over-remove one span.
    val grams = docs
      .select(col("doc_id"), posexplode(graft.functions.word_ngrams(col("text"), n)))
      .select(col("doc_id"), col("pos"), xxhash64(col("col")).as("gram"))
    // dual consumer, deliberately un-pinned: map-only to re-derive, 8x
    // corpus size to store — the [[dupSpanCoverage]] note
    val crossDocGrams = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select(col("gram"))
    val covered = grams.join(crossDocGrams, Seq("gram"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tpos"))
      .distinct()
    val rebuilt = toks.join(covered, Seq("doc_id", "tpos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("tpos"), col("tok")))),
            x => x.getField("tok")), " ").as("cleaned"))
    docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Quality-aware dedup representative selection: given a cluster
    * assignment (doc → component, e.g. [[ConnectedComponents.assign]]'s
    * output) and a per-doc score, keep the BEST document of each
    * cluster rather than the first — the keep-rule real dedup pipelines
    * want (the longest / highest-quality copy survives, boilerplate
    * truncations drop). Tie-break is deterministic: (score, id)
    * lexicographic max, so equal scores keep the larger id.
    *
    * One aggregate: the argmax rides a struct max (no window, no
    * per-cluster sort) — a single component-keyed shuffle with map-side
    * partial aggregation, the cheapest possible cost class for the job.
    *
    * `scored` may be partial: docs missing from it never win the argmax
    * (max ignores null structs) but still count toward `cluster_size`,
    * and a fully-unscored cluster falls back to keeping its max id
    * (keep_score null) rather than vanishing — a dropped keeper would
    * make a keep-only filter delete every copy of that cluster.
    * `keep_score` preserves the score column's own type (no long cast —
    * a double quality score must not silently truncate to 0).
    */
  def keepBestPerCluster(assigned: DataFrame, scored: DataFrame,
      idCol: String = "doc_id", scoreCol: String = "score"): DataFrame =
    assigned.select(col(idCol), col("component"))
      .join(scored.select(col(idCol), col(scoreCol)), Seq(idCol), "left")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"),
        max(when(col(scoreCol).isNotNull, struct(col(scoreCol), col(idCol))))
          .as("best"),
        max(col(idCol)).as("fallback_id"))
      .select(col("component").cast("long").as("component"),
        coalesce(col("best")(idCol), col("fallback_id")).cast("long").as("keep_id"),
        col("best")(scoreCol).as("keep_score"),
        col("cluster_size"))

  /** Content-defined chunking (the Rabin/FastCDC shape with a fixed-width
    * rolling window): a cut is declared after position `i` whenever the
    * portable hash of the `window` chars ending at `i` divides `divisor`,
    * so boundaries move WITH the content — an insertion early in a
    * document shifts every byte offset but leaves all downstream window
    * hashes (hence chunks) identical, which is why CDC chunk stores
    * deduplicate shifted content where fixed-size blocking cannot.
    * Expected chunk length ≈ `divisor` chars. The per-position hashing is
    * entirely map-side inside one `transform` over the scan (the heavy
    * per-row kernel class — pair with [[graft.sources.Tables.loadFanout]]
    * when row-group parallelism binds); nothing shuffles until the
    * chunk-hash aggregate. Cut positions range over [window, len-1]: a
    * divide at `len` would end the final chunk where it already ends.
    * Output: one row per chunk — `idCol`, `chunk_idx` (1-based), `start`,
    * `clen`, `h` (md5 of the chunk text).
    */
  def cdcChunks(docs: DataFrame, window: Int = 8, divisor: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hashAt =
      s"CAST(conv(substring(md5(CAST(substring($textCol, CAST(i - ${window - 1} AS INT), $window) AS BINARY)), 1, 15), 16, 10) AS BIGINT)"
    val cutsSql =
      s"""CASE WHEN length($textCol) >= ${window + 1}
         | THEN filter(transform(sequence(CAST($window AS BIGINT), CAST(length($textCol) - 1 AS BIGINT)),
         |   i -> CASE WHEN $hashAt % $divisor = 0 THEN i ELSE CAST(NULL AS BIGINT) END), x -> x IS NOT NULL)
         | ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin
    val base = docs.select(col(idCol), col(textCol),
      length(col(textCol)).cast("long").as("len"), expr(cutsSql).as("cuts"))
    explodeSegments(base, idCol, textCol,
      sub => md5(expr(s"CAST($sub AS BINARY)")))
  }

  /** The production fast path of the CDC pair: gear-hash boundaries via
    * the [[graft.functions.CdcCuts]] codegen expression — O(1) per
    * position (table load + shift + add) where [[cdcChunks]]'s
    * oracle-portable form pays a full md5 of the window at EVERY
    * position (measured ~5× on the chunking stage, `tools.CdcBench` /
    * SCALING.md) — and xxhash64 chunk ids instead of md5 strings (8-byte
    * longs, not 32-char hex, through every downstream shuffle). Same
    * dual-path pattern as MinHash portable/xxhash64. Boundaries differ
    * from the md5 twin (different hash family) but both are
    * content-defined; CdcSpec proves shift invariance for each.
    * Output: `idCol, chunk_idx, start, clen, h` (LONG).
    */
  def cdcChunksFast(docs: DataFrame, maskBits: Int = 6, minChunk: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), col(textCol),
      length(col(textCol)).cast("long").as("len"),
      graft.functions.cdc_cuts(col(textCol), maskBits, minChunk).as("cuts"))
    explodeSegments(base, idCol, textCol, sub => xxhash64(expr(sub)))
  }

  // Shared CDC tail: cuts array -> (start, end) segments -> one chunk row
  // per segment with the caller's hash of the chunk substring.
  private def explodeSegments(base: DataFrame, idCol: String, textCol: String,
      chunkHash: String => Column): DataFrame = {
    val segsSql =
      """transform(concat(array(CAST(1 AS BIGINT)), transform(cuts, c -> c + 1)),
        |  (s, idx) -> named_struct('s', s, 'e', element_at(concat(cuts, array(len)), idx + 1)))""".stripMargin
    val sub = s"substring($textCol, CAST(col.s AS INT), CAST(col.e - col.s + 1 AS INT))"
    base.select(col(idCol), col(textCol), posexplode(expr(segsSql)))
      .select(col(idCol), (col("pos") + 1).cast("int").as("chunk_idx"),
        col("col.s").as("start"), (col("col.e") - col("col.s") + lit(1L)).as("clen"),
        chunkHash(sub).as("h"))
  }

  /** Per-document CDC dedup accounting over [[cdcChunks]]: how many of a
    * doc's chunks (and chars) also occur — by chunk hash — in at least
    * one OTHER document. One hash-keyed aggregate for the per-chunk doc
    * frequency, one join back (same key: exchange reuse), one doc-keyed
    * aggregate; chunk payloads never shuffle twice. The storage-dedup /
    * shifted-near-dup signal summarized per doc:
    * `idCol, n_chunks, n_shared_chunks, shared_chars`.
    */
  def cdcDedupStats(docs: DataFrame, window: Int = 8, divisor: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ch = cdcChunks(docs, window, divisor, idCol, textCol)
    val freq = ch.groupBy(col("h"))
      .agg(count_distinct(col(idCol)).as("nd"))
    ch.join(freq, Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared_chunks"),
        sum(when(col("nd") > 1, col("clen")).otherwise(0L)).as("shared_chars"))
  }

  /** Incremental CDC dedup against a STANDING chunk-hash index — the
    * chunk-level rendering of [[incrementalDedup]]'s arrival pattern: the
    * corpus's distinct chunk hashes form the index (it grows with
    * DISTINCT content, not arrivals — the x51 property), and each new
    * batch is chunked and probed by one hash equi-join, so per-batch
    * cost is O(batch), never O(corpus). Because chunks are
    * content-defined, a new document that EMBEDS or SHIFTS corpus
    * content still hits the index on every preserved chunk (CdcSpec's
    * shift-invariance) — byte-offset-robust novelty accounting that
    * exact whole-doc hashing cannot see. Output per batch doc:
    * `idCol, n_chunks, n_corpus_hits, novel_chars`.
    */
  def cdcIncremental(corpus: DataFrame, batch: DataFrame, window: Int = 8,
      divisor: Int = 64, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    cdcIncrementalAgainstIndex(
      cdcChunks(corpus, window, divisor, idCol, textCol),
      cdcChunks(batch, window, divisor, idCol, textCol), idCol)

  /** The probe tail of [[cdcIncremental]] against a STORED chunk frame —
    * the standing-index production shape: the index is a table of
    * already-computed chunk rows (any `h` column frame qualifies; only
    * `h` is read), never re-chunked per arrival. Stored BUCKETED on `h`
    * (`Bucketing.writeBucketed(..., "h", n, sortCol = Some("h"))`), the
    * index-side distinct and the probe join are both satisfied by the
    * bucket layout's HashPartitioning — the probe plans NO index-side
    * shuffle (locked in CdcSpec, the x51 band-index property at chunk
    * granularity).
    */
  def cdcIncrementalAgainstIndex(indexChunks: DataFrame, batchChunks: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val index = indexChunks.select(col("h")).distinct()
    batchChunks
      .join(index.withColumn("__hit", lit(1)), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_corpus_hits"),
        sum(when(col("__hit").isNull, col("clen")).otherwise(0L)).as("novel_chars"))
  }

  /** Approximate-membership dedup against a reference corpus via a
    * distributed bloom filter (round-8) — the cheap first gate of
    * "drop anything we already trained on": corpus fingerprints build
    * bloom bits once (partial+final typed aggregate, only bits travel —
    * [[graft.operators.Prefilter.keyBloom]]), each batch fingerprint
    * probes them scan-local, and one exact key-only join verifies. At
    * 100 TB the bloom answers most membership questions without
    * shuffling anything; the exact join then touches only fingerprints.
    *
    * Output is the bloom's ERROR CONTRACT as one row (the x13/x40
    * oracle pattern — exact values plus in-bound flags for what is
    * engine-specific): `n_batch`, `n_true_dups` (exact), `n_missed`
    * (flagged-false true dups — a bloom has NO false negatives, so
    * exactly 0 always), `fp_in_bound` (false-positive count ≤
    * fpBoundBp of the novel mass + 2 absolute — generous against the
    * binomial tail, so the flag is deterministic-in-practice at any
    * corpus size).
    */
  def bloomMembershipStats(corpus: DataFrame, batch: DataFrame,
      fpCol: String = "fp", expectedKeys: Long = 10000, fpp: Double = 0.01,
      fpBoundBp: Long = 500): DataFrame = {
    val bits = graft.operators.Prefilter.keyBloom(corpus, fpCol, expectedKeys, fpp)
    val truth = corpus.select(col(fpCol)).distinct().withColumn("__seen", lit(1))
    batch
      .withColumn("__flag", graft.operators.Prefilter.mightContain(bits, col(fpCol)))
      .join(truth, Seq(fpCol), "left")
      .agg(count(lit(1)).as("n_batch"),
        sum(when(col("__seen").isNotNull, 1L).otherwise(0L)).as("n_true_dups"),
        sum(when(col("__seen").isNotNull && !col("__flag"), 1L).otherwise(0L))
          .as("n_missed"),
        sum(when(col("__seen").isNull && col("__flag"), 1L).otherwise(0L))
          .as("__n_fp"))
      .select(col("n_batch"), col("n_true_dups"), col("n_missed"),
        (col("__n_fp") * 10000 <=
          lit(fpBoundBp) * (col("n_batch") - col("n_true_dups")) + lit(20000))
          .cast("int").as("fp_in_bound"))
  }

  /** MinHash estimator-error calibration (round-8): for every LSH
    * candidate pair, the |signature-estimated − exact| Jaccard error,
    * binned into an exact-integer histogram — the dataset-card table
    * answering "how tight is the 16-hash estimate on THIS corpus?"
    * (x73 is the theory curve; this is the measured counterpart, and it
    * reuses the verification join x05 runs anyway). All arithmetic is
    * integer-exact: est = m/[[NumHashes]] recovers m exactly (m·2^-4
    * and back are exact IEEE), exact Jaccard stays the i/u rational,
    * and err_bp = |m·u − n·i| · 10000 DIV (n·u) never touches a float —
    * which is what lets the histogram hash-match cross-engine. Cost
    * shape: the candidate-pair frame is the LSH-bounded set; each pair
    * joins back to its two (distinct) shingle arrays — the same
    * per-pair verification class as [[ngramJaccardPairs]].
    * Output: `err_bucket` (err_bp DIV bucketBp), `n_pairs,
    * min_err_bp, max_err_bp`.
    */
  def minhashErrorCalibration(docs: DataFrame, bucketBp: Int = 500): DataFrame = {
    val pairs = candidatePairsFrom(minhashSignaturesPortable(docs))
    val sh = docs.select(col("doc_id"),
        graft.functions.word_shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
    val n = NumHashes
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select((col("est_jaccard") * n).cast("long").as("m"),
        inter.as("i"),
        (size(col("sh_a")).cast("long") + size(col("sh_b")).cast("long") - inter).as("u"))
      .select(expr(s"CAST(abs(m * u - $n * i) * 10000 DIV ($n * u) AS BIGINT)").as("err_bp"))
      .groupBy(expr(s"CAST(err_bp DIV $bucketBp AS BIGINT)").as("err_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("err_bp")).as("min_err_bp"), max(col("err_bp")).as("max_err_bp"))
  }

  /** Quality↔duplication calibration: score deciles × near-dup
    * incidence — the dataset-card table that answers "is quality
    * predictive of duplication?" (if low-quality deciles carry most of
    * the dup mass, dedup-then-filter and filter-then-dedup give very
    * different corpora, and the cheaper filter should run first).
    * `scored`: (idCol, score); `edges`: near-dup candidate pairs — a doc
    * is dup-incident iff it appears on ANY edge (cluster membership
    * needs no CC here: an edge endpoint is by definition in a ≥2
    * cluster). Deciles by ntile over the deterministic (score, id)
    * order; all outputs exact integers (dup rate in basis points). The
    * ntile window is global by construction — run on the bounded
    * profiling sample this is for, not the raw corpus.
    */
  def dupCalibration(scored: DataFrame, edges: DataFrame, buckets: Int = 10,
      idCol: String = "doc_id", srcCol: String = "doc_a",
      dstCol: String = "doc_b"): DataFrame = {
    val dup = edges.select(col(srcCol).as(idCol))
      .union(edges.select(col(dstCol).as(idCol))).distinct()
      .withColumn("__dup", lit(1))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score"), col(idCol))
    scored.join(dup, Seq(idCol), "left")
      .withColumn("decile", ntile(buckets).over(w))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__dup"), lit(0))).as("n_dup"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
      .select(col("decile"), col("n_docs"), col("n_dup"),
        expr("CAST(n_dup * 10000 DIV n_docs AS BIGINT)").as("dup_rate_bp"),
        col("min_score"), col("max_score"))
  }

  /** LSH S-curve planning table — the measurement that justifies a
    * bands×rows split before anyone runs it: for every factorization
    * b·r = `nHashes` and a grid of true Jaccard similarities s, the
    * candidate probability P = 1 − (1 − s^r)^b. More bands catch lower
    * similarities (higher recall, more junk pairs); more rows sharpen
    * the threshold. The engine's own 4×4 split puts the curve's steep
    * section around the 0.5 dedup threshold — this table is that
    * justification as data. Exactness: s^r and (1 − s^r)^b are INTEGER
    * exponents, computed as unrolled left-associated multiply chains
    * (no pow — libm-divergent cross-engine, the x41 boundary), each
    * frame constant-(b,r) so the chains unroll at plan time; the
    * parameter grid is config, not data (the literal-matrix class).
    * Output: `b, r, s_bp, p_candidate` (Decimal(38,6) string).
    */
  def lshSCurve(spark: org.apache.spark.sql.SparkSession, nHashes: Int = 16,
      sSteps: Int = 19): DataFrame = {
    import spark.implicits._
    val frames = (1 to nHashes).filter(nHashes % _ == 0).map { b =>
      val r = nHashes / b
      val grid = (1 to sSteps).map(k => (b, r, k.toLong * 10000L / (sSteps + 1)))
        .toDF("b", "r", "s_bp")
      val s = col("s_bp").cast("double") / lit(10000.0)
      val sr = (1 to r).map(_ => s).reduce(_ * _)
      val q = lit(1.0) - sr
      val qb = (1 to b).map(_ => q).reduce(_ * _)
      grid.select(col("b"), col("r"), col("s_bp"),
        (lit(1.0) - qb).cast(org.apache.spark.sql.types.DecimalType(38, 6))
          .cast("string").as("p_candidate"))
    }
    frames.reduce(_.unionByName(_))
  }

  /** Exact word-n-gram Jaccard similarity for pairs grouped by a blocking
    * column (here: same `lang`) — the verification stage downstream of
    * LSH candidate generation.
    */
  def ngramJaccardPairs(docs: DataFrame, blockCol: String, n: Int): DataFrame = {
    val s = docs
      .select(col("doc_id"), col(blockCol).as("block"), word_shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = s.select(col("block"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = s.select(col("block"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    a.join(b, Seq("block")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (inter / (size(col("sh_a")) + size(col("sh_b")) - inter)).as("jaccard"))
  }

  /** Cluster-safe train/val/test split: assign every near-dup CLUSTER —
    * not every document — to a split, so no two near-duplicates ever
    * land on opposite sides of a train/eval boundary. A per-document
    * hash split (the common shortcut) leaks: any cluster larger than one
    * straddles splits with probability 1 - Σ p_s^(k-1), which for an
    * 80/10/10 split and k=2 is already ~31% of clusters — eval scores
    * inflate because the model saw a near-copy in training. Splitting on
    * the component id makes leakage structurally zero while keeping the
    * assignment deterministic, engine-portable, and resharding-stable
    * (same [[portableHash]] family as the x34/x48 mixing operators).
    *
    * Output per doc: (doc_id, component, split_safe, split_naive, leaky)
    * where split_naive is the per-doc-hash counterfactual and leaky
    * marks docs whose cluster straddles naive splits — the audit column
    * that quantifies what the safe split prevented. Buckets: of
    * `nTrain + nVal + nTest` total, [0, nTrain) → train,
    * [nTrain, nTrain+nVal) → val, rest → test.
    *
    * Cost shape: the CC assignment dominates (see
    * [[graft.operators.ConnectedComponents]]); past that it is one
    * component-keyed aggregate for the straddle bit and map-side hashing
    * — at 100 TB the split itself is a single shuffle on component ids,
    * which are at most as numerous as the docs.
    */
  def clusterSafeSplit(docs: DataFrame, edges: DataFrame,
      nTrain: Int = 8, nVal: Int = 1, nTest: Int = 1): DataFrame = {
    require(nTrain > 0 && nVal > 0 && nTest > 0, "all three splits need buckets")
    val nB = (nTrain + nVal + nTest).toLong
    def splitName(bucket: Column): Column =
      when(bucket < nTrain, "train")
        .when(bucket < nTrain + nVal, "val")
        .otherwise("test")
    val assigned = graft.operators.ConnectedComponents
      .assign(docs.select(col("doc_id")), edges, "doc_id", "doc_a", "doc_b")
    val bucketed = assigned.select(
      col("doc_id"), col("component"),
      pmod(portableHash(col("component").cast("string"), "split"), lit(nB)).as("bs"),
      pmod(portableHash(col("doc_id").cast("string"), "split"), lit(nB)).as("bn"))
    // straddle bit per cluster: min != max over naive buckets — one
    // aggregate, no countDistinct expansion
    val leak = bucketed.groupBy(col("component"))
      .agg((min(col("bn")) =!= max(col("bn"))).cast("int").as("leaky"))
    bucketed.join(leak, Seq("component"))
      .select(col("doc_id"), col("component"),
        splitName(col("bs")).as("split_safe"),
        splitName(col("bn")).as("split_naive"),
        col("leaky"))
  }
}
