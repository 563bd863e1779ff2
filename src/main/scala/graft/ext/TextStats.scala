package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: quality scoring,
  * token counting, language ID (stopword-marker heuristic), and document
  * fingerprinting. All per-row expressions — embarrassingly parallel, no
  * shuffle, fully codegen'd.
  */
object TextStats {

  /** Quality metrics per document: char/token counts, average word
    * length, stopword ratio. Mirrors the length/punct/stopword signals
    * used by large-scale corpus filters.
    */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    val nChars = length(col(textCol)).cast("long")
    val nTokens = size(words).cast("long")
    val nSpaces = (length(col(textCol)) - length(regexp_replace(col(textCol), " ", ""))).cast("long")
    docs.select(col("doc_id"),
      nChars.as("n_chars_m"),
      nTokens.as("n_tokens"),
      nSpaces.as("n_spaces_x"),
      ((nChars - nSpaces) / nTokens).as("avg_word_len"),
      stopRatio(textCol).as("stop_ratio"))
  }

  /** Stopword-ratio score shared by [[quality]] and
    * [[qualityPercentileGate]] — one definition so the gate and the
    * quality report can never silently diverge on tokenization or the
    * stopword list.
    */
  private def stopRatio(textCol: String): Column = {
    val words = split(col(textCol), " ")
    size(filter(words, w => w.isin(Stopwords.en.toSeq: _*))).cast("long") /
      size(words).cast("long")
  }

  /** Token count under a BPE-ish lexer regex (letter runs / digit runs /
    * punctuation runs), the usual cheap proxy for LLM token budgeting.
    */
  def bpeTokenCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Content fingerprint: md5 of the whitespace-normalized lowercase
    * text — the key for fuzzy-exact dedup across formatting variants.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ").cast("binary"))
        .as("fingerprint"))

  /** C4/Gopher-style quality gate composed from the [[quality]] signals:
    * keep a document only if it clears every rule; emit the first failed
    * rule as the drop reason (null = kept). Rules are deterministic
    * column expressions, so the whole gate is oracle-expressible and
    * filter-pushdown-friendly.
    */
  def qualityFilter(docs: DataFrame, minTokens: Long, maxAvgWordLen: Double,
      minStopRatio: Double, textCol: String = "text"): DataFrame = {
    val q = quality(docs, textCol)
    val reason = when(col("n_tokens") < minTokens, "too_few_tokens")
      .when(col("avg_word_len") > maxAvgWordLen, "words_too_long")
      .when(col("stop_ratio") < minStopRatio, "too_few_stopwords")
      .otherwise(lit(null).cast("string"))
    q.withColumn("drop_reason", reason)
      .withColumn("keep", col("drop_reason").isNull.cast("int"))
  }

  /** Deterministic train/eval assignment by portable content-id hash:
    * stable across runs, engines and partitionings (the md5-prefix hash
    * from TextDedup.portableHash over the id), so re-running the
    * pipeline never migrates a document between splits.
    */
  def hashSplit(docs: DataFrame, idCol: String, trainPct: Int): DataFrame = {
    val h = graft.ext.TextDedup.portableHash(col(idCol).cast("string"), "")
    docs.withColumn("bucket_100", pmod(h, lit(100L)).cast("long"))
      .withColumn("split",
        when(col("bucket_100") < trainPct, "train").otherwise("eval"))
  }

  /** Deterministic training-shard assignment: shard = portable id-hash
    * mod `nShards`, position = rank of the hash within the shard — the
    * seed-stable global shuffle + sharding step that turns a curated
    * corpus into training shards. Unlike `df.repartition(n).sortWithin…`
    * (partitioner- and retry-dependent) or RNG shuffles (seed-per-
    * partition), the (shard, pos) of every document is a pure function
    * of its id: re-running the pipeline, changing parallelism, or
    * retrying a task reproduces byte-identical shards, and two engines
    * agree on the layout. Scale shape: one hash-shuffle on shard with a
    * within-shard sort — exactly the write path of a sharded training
    * corpus (shards ≫ cores at 100 TB, so per-shard sorts are small and
    * parallel); the salt gives independent epoch reshuffles.
    */
  def shardAssign(docs: DataFrame, idCol: String = "doc_id", nShards: Int = 16,
      salt: String = "shard"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = TextDedup.portableHash(col(idCol).cast("string"), salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    docs.select(col(idCol), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Fixed-size overlapping token-window chunking — the RAG/retrieval
    * ingest shape (and the context-window packing precursor): every
    * document becomes ceil-strided windows of `sizeTokens` words, each
    * window starting `sizeTokens - overlap` tokens after the previous,
    * so consecutive chunks share `overlap` tokens of context. Emits
    * (doc, chunk_idx, chunk_text, n_tokens); the tail chunk is short
    * but never empty and never fully contained in its predecessor — a
    * start position past 0 exists iff it contributes at least one token
    * beyond the shared overlap (start + overlap < word count), so no
    * chunk is a duplicate of earlier content (duplicate chunks would
    * become duplicate embeddings/retrieval hits downstream).
    *
    * Cost shape: scan → generate → project, zero shuffles; the chunk
    * index sequence is computed from the word count alone, and each
    * output row materializes only its own window (`slice`), so total
    * work is the expected sizeTokens/stride expansion of the corpus and
    * nothing more. Chunk rows inherit the scan's partitioning —
    * downstream embed/index stages start from an already-parallel frame.
    */
  def chunk(docs: DataFrame, sizeTokens: Int, overlap: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(sizeTokens > 0 && overlap >= 0 && overlap < sizeTokens,
      "need sizeTokens > overlap >= 0")
    val stride = sizeTokens - overlap
    val words = split(col(textCol), " ")
    docs.select(col(idCol), words.as("words"))
      .select(col(idCol), col("words"),
        explode(sequence(lit(0L),
          floor((greatest(size(col("words")) - overlap, lit(1)) - 1) / lit(stride))
            .cast("long")))
          .as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("words"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(sizeTokens)), " ").as("chunk_text"),
        least(lit(sizeTokens.toLong),
          size(col("words")) - col("chunk_idx") * stride).cast("long")
          .as("n_tokens"))
  }

  /** Deterministic global training order for one epoch WITHOUT a global
    * window: extends [[shardAssign]]'s (shard, pos) to an exact global
    * permutation 1..N by adding each shard's prefix count. The only
    * ordering windows are per-shard (bounded: corpus/nShards rows per
    * task) plus one nShards-row cumulative sum on the counts frame —
    * a kilobyte-scale artifact broadcast back onto the docs. This is the
    * block-shuffle every at-scale training loader uses (a single global
    * sort/row_number would serialize 100 TB through one task); the salt
    * varies the permutation per epoch while keeping it a pure function
    * of (doc id, salt) — retries and parallelism changes reproduce it.
    */
  def epochOrder(docs: DataFrame, idCol: String = "doc_id", nShards: Int = 16,
      salt: String = "epoch0"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = shardAssign(docs, idCol, nShards, salt)
    val offsets = assigned.groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(
        Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("off"))
    assigned.join(broadcast(offsets), Seq("shard"))
      .select(col(idCol), col("shard"),
        (col("off") + col("pos")).cast("long").as("epoch_pos"))
  }

  /** Vocabulary coverage / OOV rate (tokenizer-prep shape): build the
    * top-`vocabSize` corpus vocabulary (count desc, word asc — the
    * deterministic tie-break), then score every document's
    * out-of-vocabulary token fraction against it. The corpus-wide pass
    * and the per-doc pass share one exploded-words subtree; the vocab
    * side is LIMIT-bounded so it broadcasts at any corpus size (the
    * vocabulary is a model artifact, small by construction). oov_ratio
    * is a single IEEE double division — bit-portable cross-engine.
    */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 16): DataFrame = {
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val vocab = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(vocabSize)
      .select(col("word"), lit(1).as("in_vocab"))
    words.join(broadcast(vocab), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_ratio"))
  }

  /** Deterministic stratified Bernoulli sample — the data-mixing
    * primitive: keep a row iff its portable id-hash bucket (of 10000)
    * falls under its stratum's basis-point threshold. Pure map-side
    * filter: no shuffle, no RNG, stable across runs / engines /
    * partitionings / task retries — the reproducibility `df.sample()`
    * cannot give (its Bernoulli draw is seeded per-partition, so a
    * repartition or retry changes the sample). Rates are taken in basis
    * points (exact integers) so both engines compare the same literals.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
      ratesBp: Map[String, Int], defaultBp: Int,
      idCol: String = "doc_id"): DataFrame = {
    require((ratesBp.values.toSeq :+ defaultBp).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    val h = TextDedup.portableHash(col(idCol).cast("string"), "strat")
    val threshold = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (k, bp)) =>
      when(col(stratumCol) === k, lit(bp)).otherwise(acc)
    }
    docs.withColumn("bucket", pmod(h, lit(10000L)))
      .filter(col("bucket") < threshold)
  }

  /** Per-group quality-percentile gate: drop the bottom `dropBottomPct`
    * percent of each group (source/domain) by quality score instead of a
    * fixed global threshold — the curation recipe that survives
    * heterogeneous domains (a threshold tuned on web text would gut a
    * code or reference domain; a within-domain percentile adapts). Score
    * is the shared [[stopRatio]]; the drop quota is the INTEGER
    * `floor(n·pct/100)` lowest-ranked docs (row_number with doc_id
    * tie-break), not a percent_rank cutoff — percent_rank pins the
    * lowest row of EVERY group at 0.0, so a `pr >= t` filter deletes
    * 100% of single-doc groups and always at least one doc per group,
    * gutting exactly the small domains this operator exists to protect.
    * A 1-doc group drops floor(0.2) = 0. One window shuffle on the group
    * key; all-integer quota arithmetic is engine-exact.
    */
  def qualityPercentileGate(docs: DataFrame, groupCol: String,
      dropBottomPct: Int): DataFrame = {
    require(dropBottomPct >= 0 && dropBottomPct < 100, "dropBottomPct in [0, 100)")
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("score"), col("doc_id"))
    val grp = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    docs.select(col("doc_id"), col(groupCol), stopRatio("text").as("score"))
      .withColumn("rn", row_number().over(byScore).cast("long"))
      .withColumn("n_docs", count(lit(1)).over(grp))
      .filter(col("rn") > expr(s"(n_docs * $dropBottomPct) div 100"))
      .select(col("doc_id"), col(groupCol), col("score"))
  }

  /** Domain-mix rebalancing: subsample each source so the kept corpus
    * matches target proportions (`weightsBp`, basis points) — the "80%
    * web / 15% code / 5% books" recipe step. The binding source (largest
    * count/weight deficit) is kept whole and every other source is
    * hash-sampled DOWN to proportion, so the mix is achieved without
    * upsampling. Sources absent from `weightsBp` are dropped (weight 0).
    *
    * All thresholds are derived in INTEGER arithmetic (floor division on
    * counts and basis points) so two engines agree exactly. The binding
    * source b minimizes c_s·10⁴ div w_s (deterministic source-name
    * tie-break) and anchors the mix: its threshold is exactly 10⁴ (kept
    * whole BY CONSTRUCTION — an earlier total-then-quota formulation
    * double-floored and could thin the binding source itself), and every
    * other source keeps bucket < (w_s·c_b·10⁴) div (w_b·c_s), its
    * proportional rate against the anchor. Same determinism contract as
    * [[stratifiedSample]] (no RNG, stable across runs/engines/
    * partitionings); rates are data-dependent but exact, computed from a
    * per-source count aggregate that broadcasts (|sources| rows).
    */
  def domainMix(docs: DataFrame, weightsBp: Map[String, Int],
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(weightsBp.nonEmpty && weightsBp.values.forall(w => w > 0 && w <= 10000),
      "weights are positive basis points")
    val wExpr = weightsBp.foldLeft(lit(null).cast("long")) { case (acc, (k, bp)) =>
      when(col(sourceCol) === k, lit(bp.toLong)).otherwise(acc)
    }
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("c"))
      .withColumn("w", wExpr).filter(col("w").isNotNull)
    val binding = counts.orderBy(expr("c * 10000 div w"), col(sourceCol)).limit(1)
      .select(col("c").as("cb"), col("w").as("wb"))
    val thresholds = counts.crossJoin(broadcast(binding))
      .select(col(sourceCol),
        least(lit(10000L), expr("(w * cb * 10000) div (wb * c)")).as("bp"))
    val h = TextDedup.portableHash(col(idCol).cast("string"), "mix")
    docs.join(broadcast(thresholds), Seq(sourceCol))
      .withColumn("bucket", pmod(h, lit(10000L)))
      .filter(col("bucket") < col("bp"))
      .select(col(idCol), col(sourceCol), col("bucket"))
  }

  /** Temperature-scaled (α = 1/2) domain resampling — the multilingual-
    * training mixture rule (sample p_i^α / Σ p_j^α) specialized to the
    * one α where it is oracle-exact: p^0.5 is `sqrt`, which IEEE 754
    * requires correctly rounded (unlike `pow`/`exp`, which libm rounds
    * differently across engines — the same boundary that pins x41 to
    * rational arithmetic). Downsampling only (no doc is duplicated): the
    * binding source under α = 1/2 is simply the SMALLEST (c/√c = √c), it
    * keeps everything, and source i thins to √(c_i·c_b) docs — the
    * closed form of "final proportions ∝ √c_i". Thresholds are basis
    * points from one mirrored float expression (product of two exact
    * longs → one sqrt → one divide → floor); the keep-gate is the same
    * RNG-free portable-hash bucket as [[domainMix]]/x34, so re-runs and
    * parallelism changes reproduce the exact sample. Per-source counts
    * must stay below 2^53/c_b for the product to be float-exact — at
    * larger corpora scale the basis-point space, not the doc counts.
    */
  def temperatureMix(docs: DataFrame, sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("c"))
    val binding = counts.orderBy(col("c"), col(sourceCol)).limit(1)
      .select(col("c").as("cb"))
    val thresholds = counts.crossJoin(broadcast(binding))
      .select(col(sourceCol),
        least(lit(10000L),
          floor((lit(10000.0) * sqrt((col("c") * col("cb")).cast("double"))) /
            col("c").cast("double")).cast("long")).as("bp"))
    val h = TextDedup.portableHash(col(idCol).cast("string"), "mix")
    docs.join(broadcast(thresholds), Seq(sourceCol))
      .withColumn("bucket", pmod(h, lit(10000L)))
      .filter(col("bucket") < col("bp"))
      .select(col(idCol), col(sourceCol), col("bucket"))
  }

  /** DSIR-shaped data selection (Xie et al., NeurIPS 2023 — Data
    * Selection via Importance Resampling): score every raw-corpus doc by
    * how target-like its hashed-n-gram profile is, then keep the top-k.
    * Features are word unigrams + bigrams hashed into `buckets` buckets
    * (the paper's hashed bag-of-n-grams); the target model is the docs
    * of `targetSource`, the raw model is everything else, both
    * Laplace-smoothed (+1 per bucket, +`buckets` on the totals). The
    * paper's per-doc log-importance Σ c_g·log(p_g/q_g) is libm-bound
    * (`ln` rounds differently across engines), so — the same boundary
    * that moves x41 off log-perplexity and x54 off ln-idf — the score
    * ships as the RATIONAL likelihood-ratio sum Σ c_g·(p_g/q_g): each
    * bucket ratio is one IEEE division of exact-integer-derived doubles
    * (bit-identical cross-engine), each doc term one IEEE multiply
    * rounded once to Decimal(38,6), and the per-doc sum runs in decimal
    * (partition-order-independent). Same argsort character as the paper
    * on peaked profiles — a doc heavy in target-distinctive buckets
    * dominates both scores — and oracle-exact where log-space cannot be.
    * Selection is the deterministic top-k (the paper's top-k variant);
    * pair with [[hashSplit]]'s portable-hash gate for the sampled form.
    *
    * Cost shape: one explode→(doc,bucket) aggregate (the only
    * corpus-sized shuffle, pre-aggregated to ≤`buckets` rows per doc),
    * two `buckets`-row models from the SAME frame (exchange reuse), a
    * broadcast of the `buckets`-row ratio table, and a TakeOrdered
    * top-k — no all-pairs, nothing driver-side. Integer products
    * (cp+1)·(Tq+B) must stay below 2^53 for the double cast to be exact
    * (at larger corpora, downsample the models, not the corpus — the
    * estimator only needs bucket frequencies).
    */
  def dsirSelect(docs: DataFrame, targetSource: String, buckets: Int = 64,
      k: Int = 20, textCol: String = "text", sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0 && k > 0, "buckets and k are positive")
    import graft.functions.word_ngrams
    val grams = docs.select(col(idCol), col(sourceCol),
      explode(concat(split(col(textCol), " "), word_ngrams(col(textCol), 2)))
        .as("gram"))
    val perDocBucket = grams
      .select(col(idCol), col(sourceCol),
        pmod(TextDedup.portableHash(col("gram"), "dsir"), lit(buckets.toLong))
          .as("bucket"))
      .groupBy(col(idCol), col(sourceCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val models = perDocBucket.groupBy(col("bucket")).agg(
      sum(when(col(sourceCol) === targetSource, col("c")).otherwise(lit(0L)))
        .as("cp"),
      sum(when(col(sourceCol) =!= targetSource, col("c")).otherwise(lit(0L)))
        .as("cq"))
    val totals = models.agg(sum(col("cp")).as("tp"), sum(col("cq")).as("tq"))
    val ratios = models.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (((col("cp") + lit(1L)) * (col("tq") + lit(buckets.toLong)))
          .cast("double") /
         ((col("cq") + lit(1L)) * (col("tp") + lit(buckets.toLong)))
          .cast("double")).as("ratio"))
    val scored = perDocBucket.filter(col(sourceCol) =!= targetSource)
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol), col(sourceCol))
      .agg(sum((col("c") * col("ratio")).cast("decimal(38,6)")).as("score"))
    graft.operators.Ranks.topK(scored, k, Seq(col("score").desc, col(idCol)): _*)
      .select(col(idCol), col(sourceCol), col("score").cast("string").as("score"))
  }

  /** Regex redaction pass (PII-scrub shape): each rule is
    * (name, pattern, replacement); emits per-rule match counts
    * (`n_<name>`) and the text with every rule applied in order
    * (`redacted`). Per-row codegen'd regexp work, no shuffle. Patterns
    * should stay in the Java∩RE2-compatible subset when cross-engine
    * (oracle) parity matters.
    */
  def redact(docs: DataFrame, rules: Seq[(String, String, String)],
      textCol: String = "text"): DataFrame = {
    // Column API, not expr() splicing: a SQL string literal re-parses
    // backslash escapes (\d would become d) and a quote in the pattern
    // would be a ParseException — the count path must see the exact
    // pattern the replace path applies
    val withCounts = rules.foldLeft(docs) { case (df, (name, pat, _)) =>
      df.withColumn(s"n_$name",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    val redacted = rules.foldLeft(col(textCol)) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    withCounts.withColumn("redacted", redacted)
  }

  /** Gopher-style repetition signal: the fraction of a document's word
    * n-grams that are duplicates of an earlier one. Documents with fewer
    * than `n` words are dropped (no n-grams to measure).
    */
  def repeatedNgramRatio(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame = {
    val grams = graft.functions.word_ngrams(col(textCol), n)
    docs.filter(size(split(col(textCol), " ")) >= n)
      .select(col("doc_id"),
        size(grams).cast("long").as("n_grams"),
        (size(grams) - size(array_distinct(grams))).cast("long").as("n_repeated"))
      .withColumn("rep_ratio", col("n_repeated") / col("n_grams"))
  }

  /** Corpus-LM next-word-probability score (the CCNet/KenLM-shape LM
    * quality filter, with the corpus itself as the model): per document,
    * sum over its word bigrams of P(w_i | w_{i-1}) = C(w_{i-1} w_i) /
    * C(w_{i-1} ·) under the corpus bigram counts. Boilerplate and
    * natural text score high per gram; gibberish scores near zero —
    * rank/threshold on `score_sum / n_bigrams` downstream.
    *
    * Determinism (what lets x41 carry an oracle where true log-space
    * perplexity cannot): each probability is ONE IEEE division of exact
    * integers, and the per-doc aggregate sums those as Decimal(38,6) —
    * order-independent, unlike a double sum; `log()` would also hang
    * cross-engine parity on libm rounding. Scale shape: bigram counts
    * are one hash aggregate; scoring joins each positional bigram to its
    * count on the gram key (shuffle ∝ corpus tokens, map-side partials
    * on the re-aggregation; the count table broadcasts only if tiny, so
    * the plan stays a plain shuffled equi-join at 100 TB).
    */
  def lmScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.word_ngrams(col(textCol), 2)).as("gram"))
    val c2 = grams.groupBy(col("gram")).agg(count(lit(1)).as("c2"))
    val c1 = c2.select(substring_index(col("gram"), " ", 1).as("prefix"), col("c2"))
      .groupBy(col("prefix")).agg(sum(col("c2")).as("c1"))
    grams
      .join(c2, Seq("gram"))
      .withColumn("prefix", substring_index(col("gram"), " ", 1))
      .join(c1, Seq("prefix"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum((col("c2") / col("c1")).cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .as("p_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        col("p_sum").cast(org.apache.spark.sql.types.DecimalType(38, 6))
          .cast("string").as("score_sum"))
  }

  /** Corpus-level n-gram frequencies: explode → count. Map-side partial
    * aggregation shrinks the shuffle to distinct grams per mapper; the
    * top-k plans as TakeOrderedAndProject.
    */
  def ngramCounts(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame =
    docs.select(explode(graft.functions.word_ngrams(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))

  /** Pairwise distributional distance between sources: total variation
    * over `buckets` hashed unigram buckets — TV(a,b) = ½·Σ|p_i − q_i|,
    * the mixture-design signal (how DIFFERENT two domains' token
    * distributions are — DSIR/domain-weighting adjacent) complementary
    * to x62's near-dup overlap matrix (how much content they SHARE). TV
    * is chosen over KL exactly because it is libm-free: per-bucket terms
    * 0.5·|c_a/n_a − c_b/n_b| are IEEE ops on exact-integer-derived
    * doubles (×0.5 is exact), rounded once to Decimal(38,6) and summed
    * in decimal (the x41 idiom) — oracle-exact where log-based
    * divergences are not. Dataflow: one explode → (source, bucket)
    * count (map-side partials), totals re-aggregated FROM the counts,
    * the full source×bucket grid from a generate (missing buckets are
    * REAL zeros — dropping them understates the distance), then a
    * bucket-keyed self-join over a frame of |sources|·buckets rows —
    * corpus-size-independent past the first aggregate.
    */
  def sourceTvDistance(docs: DataFrame, buckets: Int = 64,
      textCol: String = "text"): DataFrame = {
    val words = docs.select(col("source"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val counts = words.groupBy(col("source"),
        pmod(graft.ext.TextDedup.portableHashBuiltin(col("word"), ""),
          lit(buckets.toLong)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("c"))
      // |sources|x64 rows from the ONE corpus pass here; the totals and
      // the profile join both consume it, and un-pinned each re-runs the
      // explode + shuffled count (no runtime exchange reuse) — pin the
      // reduced artifact, everything downstream is corpus-size-free
      .localCheckpoint(false)
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val grid = totals.select(col("source"), col("n"),
      explode(sequence(lit(0), lit(buckets - 1))).as("bucket"))
    val prof = grid.join(counts, Seq("source", "bucket"), "left")
      .select(col("source"), col("bucket"),
        (coalesce(col("c"), lit(0L)).cast("double") / col("n").cast("double")).as("p"))
    val a = prof.select(col("source").as("source_a"), col("bucket"), col("p").as("pa"))
    val b = prof.select(col("source").as("source_b"), col("bucket"), col("p").as("pb"))
    a.join(b, Seq("bucket")).filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        (lit(0.5) * abs(col("pa") - col("pb")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("t"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("t")).cast(org.apache.spark.sql.types.DecimalType(38, 6))
        .cast("string").as("tv_distance"))
  }

  /** Vocabulary-growth (Heaps'-law) curve: the corpus in `buckets`
    * doc-id ranges, per bucket the token count, the count of words FIRST
    * seen there, and the cumulative vocabulary/token totals — the
    * dataset-card curve that tells you whether more data is still buying
    * new vocabulary (sub-linear growth is Heaps' law; a flat tail means
    * the source is exhausted). Bucketing is pure map-side integer
    * arithmetic against a broadcast 1-row max (no global sort/ntile);
    * first-seen is one min-aggregate on the exploded words; everything
    * downstream is bucket-sized. The final cumulative window orders
    * `buckets` rows — constant, never corpus-scale.
    */
  def vocabGrowth(docs: DataFrame, buckets: Int = 10,
      textCol: String = "text"): DataFrame = {
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    val db = docs.crossJoin(broadcast(mx))
      .select(col("doc_id"), col(textCol),
        expr(s"CAST((doc_id * $buckets) DIV (mx + 1) AS BIGINT)").as("bucket"))
    val words = db.select(col("bucket"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
    // ONE corpus explode pass to (word, bucket) counts; both outputs
    // re-aggregate that vocab×buckets frame (previously first-seen and
    // token totals each exploded the corpus again under different
    // shuffle keys — two corpus passes, and the second shuffle moved
    // corpus-scale rows instead of vocab-scale counts). Pinned: the
    // frame is post-shuffle reduced with two consumers.
    val wc = words.groupBy(col("word"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val firstSeen = wc.groupBy(col("word")).agg(min(col("bucket")).as("bucket"))
    val newWords = firstSeen.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_new_words"))
    val tokens = wc.groupBy(col("bucket")).agg(sum(col("c")).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    tokens.join(newWords, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("n_new_words"), lit(0L)).as("n_new_words"))
      .select(col("bucket"), col("n_tokens"), col("n_new_words"),
        sum(col("n_new_words")).over(w).as("vocab_size"),
        sum(col("n_tokens")).over(w).as("tokens_cum"))
  }

  /** Add-one-smoothed bigram language-model FIT — the training-side
    * artifact that [[lmScore]]-style scorers consume: the conditional
    * probability table P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V) over
    * the corpus, top-`topK` bigrams by count as the model head. Three
    * aggregates, all shrinking: pair counts from one explode (map-side
    * partials), the w1 marginal RE-AGGREGATED from the pair counts
    * (vocab-sized input, never the corpus — and c(w1,·) summed over
    * continuations is the exact denominator the conditional needs), and
    * the continuation-vocabulary size V as a 1-row broadcast. The
    * probability is one IEEE division of exact-integer-derived doubles
    * rounded once to Decimal(38,6) — oracle-exact (x41 idiom). At 100 TB
    * the model table is vocab-bounded, not corpus-bounded.
    */
  def bigramLmFit(docs: DataFrame, topK: Int = 50,
      textCol: String = "text"): DataFrame = {
    val pairs = ngramCounts(docs, 2, textCol)
      .select(substring_index(col("gram"), " ", 1).as("w1"),
        substring_index(col("gram"), " ", -1).as("w2"),
        col("n").as("pair_n"))
    val marginal = pairs.groupBy(col("w1")).agg(sum(col("pair_n")).as("w1_n"))
    val vocab = pairs.agg(count_distinct(col("w2")).as("v"))
    val top = graft.operators.Ranks.topK(pairs, topK,
      col("pair_n").desc, col("w1"), col("w2"))
    top.join(marginal, Seq("w1")).crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), col("pair_n"),
        ((col("pair_n") + lit(1L)).cast("double") /
          (col("w1_n") + col("v")).cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 6))
          .cast("string").as("cond_p"))
  }

  /** Stopword-marker language ID: score = |words ∩ markers(lang)|,
    * argmax over languages (deterministic tie-break: higher score, then
    * lexicographically larger language code wins via struct max).
    */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    val scored = array(Stopwords.markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(size(filter(words, w => w.isin(ms.toSeq: _*))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    docs.select(col("doc_id"),
      best.getField("lang").as("pred_lang"),
      best.getField("score").cast("long").as("score"),
      col("lang").as("actual_lang"))
      .withColumn("correct", (col("pred_lang") === col("actual_lang")).cast("int"))
  }

  /** Sequence packing (pretraining batch assembly): assign each doc to
    * a token-budget bin, filling bins in deterministic (group, doc_id)
    * order — bin = floor((running_tokens - own_tokens) / budget), the
    * contiguous-fill scheme where a doc opens the bin its prefix sum
    * lands in (bins may overflow by one doc, never undercount). One
    * running-sum window per group; the token counts and prefix sums are
    * integers and the `/ budget` is IEEE-double division in BOTH engines
    * (Spark and DuckDB promote integer `/` to double), exact below 2^53
    * prefix tokens per group — so the assignment replays bit-identically
    * at any realistic group size. At scale this shuffles once on
    * the group key — the same cost class as any per-source pass — and
    * the alternative greedy first-fit is inherently sequential (each
    * placement depends on every bin's remaining room), which is why
    * production packers use exactly this prefix-sum relaxation.
    */
  /** GLOBAL concat-and-chunk packing (round-15): the dominant
    * pretraining batching strategy — concatenate the whole corpus into
    * ONE deterministic token stream (ordered by (source, doc_id)) and
    * split it at exact `budget`-token boundaries, documents spanning
    * chunk boundaries allowed. Per doc: the chunk containing its first
    * token, the chunk containing its last, and thereby whether it
    * spans a boundary — the accounting a packing pipeline needs to
    * size attention-mask segments and measure boundary fragmentation.
    * [[packBins]] is the per-GROUP variant (independent streams per
    * source); this is the single-stream global form.
    *
    * Scale shape: the naive formulation is one GLOBAL window cumsum —
    * a single-partition sort of the corpus, the exact anti-pattern at
    * 100 TB. This computes the same numbers with a TWO-LEVEL cumsum:
    * per-source token subtotals roll up map-side to a sources-sized
    * frame whose running offsets are a |sources|-row window (the x135
    * pattern), broadcast back; the per-doc cumsum then rides ONE
    * source-keyed shuffle (each source's docs sort within their own
    * partition). Bit-identical to the global window — integer token
    * counts, DIV arithmetic, unique (source, doc_id) order — which is
    * exactly what the DuckDB oracle computes with the naive global
    * form (x147). `baseOffset` shifts the whole stream by a token
    * count that precedes it — the streaming packer's watermark
    * ([[graft.streaming.StreamingIngest.packStream]]): chunk ids are a
    * pure function of (base, batch), so assignments are PREFIX-STABLE
    * under arrival (x149's hash proof).
    */
  def concatChunkPack(docs: DataFrame, budget: Int,
      sourceCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text", baseOffset: Long = 0L,
      bands: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // THIRD cumsum level (round-16, r15 verdict item 2): the two-level
    // form still ran each source's per-doc cumsum in ONE partition
    // (Window.partitionBy(source)) — and a real pretraining corpus is a
    // handful of sources with one giant one (CommonCrawl ≈ 80-90%), so
    // the dominant source's docs all sorted on one task. Each source is
    // therefore range-split into `bands` CONTIGUOUS doc_id intervals
    // (band = (doc_id - min_id) DIV ceil(span / bands) — value-banded,
    // monotone in doc_id, so band b's docs all precede band b+1's in
    // the stream order); band subtotals roll up to a |sources × bands|
    // frame whose running offsets ride a small window, exactly like the
    // source subtotals one level up. The per-doc cumsum then partitions
    // by (source, band): the 90%-one-source corpus sorts on `bands`
    // tasks instead of one, and the pass scales with cores, not with
    // the largest source (SCALING.md's skew row measures it). Integer
    // token counts and contiguous banding make the decomposition
    // bit-equal to the sequential global stream for ANY band count
    // (ExtSpec pins bands ∈ {1, 3, session} against the naive window).
    // `bands` <= 0 picks the session's default parallelism.
    val nBands = if (bands > 0) bands
      else math.max(1, docs.sparkSession.sparkContext.defaultParallelism)
    // Null text fails LOUDLY (round-16 ADVICE): `size(split(null,' '))`
    // is -1 (or null) depending on spark.sql.legacy.sizeOfNull, so a
    // null-text arrival — the RETRACTION marker in the sibling doc-store
    // streams — reaching this packer would silently shift cum_prev, the
    // chunk ids of every later doc, and the token watermark. The
    // docstring contract is "retractions belong upstream"; this enforces
    // it in the plan (codegen raise_error, no row-wise driver check).
    val toks = docs.select(col(idCol), col(sourceCol),
        when(col(textCol).isNotNull, size(split(col(textCol), " ")))
          .otherwise(raise_error(concat(
            lit("concatChunkPack: null text for doc "), col(idCol).cast("string"),
            lit(" — retractions belong upstream of the packer"))))
          .cast("long").as("n_tokens"))
      .localCheckpoint(false) // one tokenize pass feeds offsets AND the per-doc cumsum
    val wSrc = Window.orderBy(col(sourceCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-source stats: token subtotal (level-1 offsets) + id range
    // (level-3 banding) — one small aggregate feeds both
    val srcStats = toks.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).as("src_tokens"),
        min(col(idCol)).as("__min_id"), max(col(idCol)).as("__max_id"))
      .withColumn("src_offset", coalesce(sum(col("src_tokens")).over(wSrc), lit(0L)))
      .withColumn("__band_w", // ceil(span / nBands), >= 1 — integral DIV,
        // double division would lose exactness on wide id ranges
        expr(s"greatest(1L, (__max_id - __min_id + ${nBands}L) DIV ${nBands}L)"))
      .select(col(sourceCol), col("src_offset"), col("__min_id"), col("__band_w"))
    // banding is narrow arithmetic over the checkpointed toks — cheaper
    // to recompute for the subtotal pass and the final pass than to
    // materialize a second corpus copy
    def banded = toks.join(broadcast(srcStats), Seq(sourceCol))
      .withColumn("__band",
        expr(s"($idCol - __min_id) DIV __band_w"))
    // level 2: band subtotals → running offsets within each source
    // (|sources × bands| rows — the partial aggregation collapses the
    // corpus map-side before this tiny exchange)
    val wBand = Window.partitionBy(col(sourceCol)).orderBy(col("__band").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandOffsets = banded.groupBy(col(sourceCol), col("__band"))
      .agg(sum(col("n_tokens")).as("__band_tokens"))
      .withColumn("band_offset",
        coalesce(sum(col("__band_tokens")).over(wBand), lit(0L)))
      .select(col(sourceCol), col("__band"), col("band_offset"))
    // level 3: the per-doc cumsum rides (source, band) — the dominant
    // source's sort spreads over `bands` tasks
    val wDoc = Window.partitionBy(col(sourceCol), col("__band"))
      .orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    banded.join(broadcast(bandOffsets), Seq(sourceCol, "__band"))
      .withColumn("cum_prev",
        lit(baseOffset) + col("src_offset") + col("band_offset") +
          coalesce(sum(col("n_tokens")).over(wDoc), lit(0L)))
      .withColumn("first_chunk", expr(s"cum_prev DIV $budget"))
      .withColumn("last_chunk", expr(s"(cum_prev + n_tokens - 1) DIV $budget"))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        col("first_chunk"), col("last_chunk"))
  }

  def packBins(docs: DataFrame, groupCol: String, budget: Int,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col(groupCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col(groupCol), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).as("bin"))
  }

  /** Deterministic per-group cap (data-mixing primitive): keep at most
    * `cap` documents per `groupCol` value, chosen by a portable hash of
    * the document ID so the sample is stable across runs, engines, and
    * partitionings (id-keyed, not content-keyed: re-assigning ids picks
    * a different sample) — "cap every source at N docs" is how corpus
    * mixing recipes bound a dominant crawl. The rank is a per-group window; at
    * 100 TB the window shuffles once on the group key and each group
    * streams through one sorted pass — acceptable because group count
    * (sources) is small and the output is bounded at groups × cap. (A
    * bounded-heap aggregate would cut the sort, but [[graft.functions
    * .top_k_by]] scores doubles and a 2^60 hash does not fit one
    * exactly — the window keeps rank order bit-identical to the
    * md5-prefix oracle.)
    */
  def capPerGroup(docs: DataFrame, groupCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = TextDedup.portableHash(col("doc_id").cast("string"), "")
    docs.select(col("doc_id"), col(groupCol), h.as("__h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("__h").asc, col("doc_id").asc)))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col(groupCol), col("rk").cast("long").as("rk"))
  }

  /** Character-n-gram profile language ID (Cavnar–Trenkle shape):
    * train a per-language profile — the `topM` most frequent character
    * n-grams, rank-weighted `topM+1-rank` — from the labeled corpus
    * itself, then classify each document by the weighted sum of its
    * n-gram occurrences that hit each profile; argmax with the x08
    * tie-break (higher score, then lexicographically larger language
    * code).
    *
    * Scale shape: training is one groupBy(lang, gram) aggregation plus
    * a per-language top-M window (profile is `langs × topM` rows —
    * broadcast-sized no matter the corpus); scoring is a broadcast
    * join on gram + one aggregation. Both stages are linear in corpus
    * characters; nothing driver-side. Deterministic: integer counts and
    * weights, total-order tie-breaks (count desc, gram asc) in the
    * profile rank.
    */
  def languageIdNgram(docs: DataFrame, n: Int = 2, topM: Int = 40,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.broadcast
    // Both passes keep every shuffle tiny: the gram explode is map-side
    // work; partial aggregation collapses it to distinct (lang, gram)
    // pairs (training) or (doc, lang) pairs (scoring) BEFORE the
    // exchange, so shuffled bytes are O(alphabet²·langs) and
    // O(docs·langs) — never O(corpus characters). (A shared
    // (doc,lang,gram) pre-aggregation looks cheaper but isn't: column
    // pruning specializes each consumer's aggregate output, the
    // exchanges stop canonicalizing equal, and ReuseExchange computes
    // the heavy shuffle twice — measured 2× slower than this shape.)
    val grams = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.char_ngrams(col(textCol), n)).as("g"))
    val profile = grams.groupBy(col("lang").as("plang"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("plang").orderBy(col("cnt").desc, col("g").asc)))
      .filter(col("rn") <= topM)
      .select(col("plang"), col("g"), (lit(topM + 1) - col("rn")).cast("long").as("w"))
    val langs = profile.select(col("plang")).distinct()
    val hits = grams.join(broadcast(profile), Seq("g"))
      .groupBy(col("doc_id"), col("plang")).agg(sum(col("w")).as("score"))
    val scored = docs.select(col("doc_id"), col("lang").as("actual_lang"))
      .crossJoin(broadcast(langs))
      .join(hits, Seq("doc_id", "plang"), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("plang").desc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("plang").as("pred_lang"), col("score"),
        col("actual_lang"),
        (col("plang") === col("actual_lang")).cast("int").as("correct"))
  }

  /** [[languageIdNgram]] with the SCORING side rebuilt around the fact
    * that the trained profile is a bounded MODEL ARTIFACT (langs × topM
    * rows — 160 at the defaults, the Salt-hot-set broadcast-pin size
    * class): instead of re-joining every exploded gram against a
    * broadcast profile frame and window-argmaxing over a crossJoined
    * (doc × lang) grid, the profile is collected once and embedded as a
    * LITERAL map<gram, array<weight-per-lang>> — scoring becomes one
    * `element_at` per gram (codegen map lookup, no join), one
    * groupBy(doc) with a per-lang sum column each, and the argmax a
    * when-chain over those columns (no window, no crossJoin). Plan:
    * train-explode+agg as before, then ONE more explode + ONE hash
    * aggregate; the only remaining join is the shuffle attach of the
    * per-doc score rows onto the doc frame (corpus-sized on both
    * sides, so it must NOT broadcast — round-8 advisory). Training math, scores, and the (score desc, lang
    * desc) tie-break are bit-identical to [[languageIdNgram]]
    * (LangIdLiteralSpec proves row equality on the corpus).
    *
    * The eager profile collect is the documented exception class
    * (bounded model artifact, evaluated once — the Misra-Gries hot-set
    * rationale in `Salt.skewAwareJoin`); everything per-corpus-row
    * stays codegen and distributed.
    */
  def languageIdNgramLiteral(docs: DataFrame, n: Int = 2, topM: Int = 40,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // lazy-checkpoint the exploded gram frame: the profile collect below
    // materializes (caches) it, so the scoring pass reads cached blocks
    // instead of re-running the corpus explode — training and scoring
    // are separate JOBS here (the profile must be collected before the
    // scoring plan can embed it), and without the cache each would pay
    // the full explode
    val grams = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.char_ngrams(col(textCol), n)).as("g"))
      .localCheckpoint(false)
    val profile = grams.groupBy(col("lang").as("plang"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("plang").orderBy(col("cnt").desc, col("g").asc)))
      .filter(col("rn") <= topM)
      .select(col("plang"), col("g"), (lit(topM + 1) - col("rn")).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val langs = profile.map(_._1).distinct.sorted
    if (langs.isEmpty) {
      // degenerate corpus (no grams anywhere): mirror languageIdNgram's
      // empty result shape
      return docs.select(col("doc_id"), lit(null).cast("string").as("pred_lang"),
        lit(0L).as("score"), col("lang").as("actual_lang"),
        lit(0).cast("int").as("correct"))
        .limit(0)
    }
    val idx = langs.zipWithIndex.toMap
    val weights = profile.groupBy(_._2).map { case (g, rows) =>
      val arr = Array.fill(langs.size)(0L)
      rows.foreach { case (l, _, w) => arr(idx(l)) += w }
      g -> arr
    }
    // ONE map-typed Literal (typedlit), not a map() of 2·|grams| child
    // expressions: the expression-tree form costs seconds of analysis +
    // codegen on a cold first run; a single literal is O(1) to plan and
    // the generated code just references the map object
    val wmap = typedlit(weights.map { case (g, arr) => g -> arr.toSeq })
    val perGram = grams.select(col("doc_id"), element_at(wmap, col("g")).as("ws"))
    val sums = langs.indices.map(i =>
      sum(coalesce(col("ws")(i), lit(0L))).as(s"__s$i"))
    val scores = perGram.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    // plain shuffle join: `scores` is one row per document WITH grams —
    // corpus-sized, so broadcasting it would put the whole corpus on the
    // driver (round-8 advisory). The broadcast exception stays reserved
    // for bounded model artifacts like the profile literal above; this
    // attach shuffles O(docs) narrow rows on doc_id, which is the
    // correct 100 TB posture.
    val attached = docs.select(col("doc_id"), col("lang").as("actual_lang"))
      .join(scores, Seq("doc_id"), "left")
    // argmax with the x08 tie-break (higher score, then lexicographically
    // LARGER language code): walk langs in descending order, strict >
    // replaces — fold as a when-chain, no window
    val langsDesc = langs.reverse
    def s(l: String): Column = coalesce(col(s"__s${idx(l)}"), lit(0L))
    val (bestL, bestS) = langsDesc.tail.foldLeft((lit(langsDesc.head), s(langsDesc.head))) {
      case ((bl, bs), l) =>
        (when(s(l) > bs, lit(l)).otherwise(bl), when(s(l) > bs, s(l)).otherwise(bs))
    }
    attached.select(col("doc_id"), bestL.as("pred_lang"), bestS.as("score"),
      col("actual_lang"),
      (bestL === col("actual_lang")).cast("int").as("correct"))
  }

  /** Smallest power of two ≥ n, as a generated integer CASE chain
    * (round-8): `log2`/`power` would put a libm float between the
    * engines (the x41 boundary); a 21-arm when-chain over exact integer
    * thresholds is branch-per-row cheap and renders identically in
    * DuckDB via [[pow2BucketSqlCases]]. Inputs above 2^20 clamp to the
    * top bucket.
    */
  def pow2Bucket(n: Column): Column =
    (0 to 20).foldRight(lit(1L << 20): Column) { case (k, rest) =>
      when(n <= (1L << k), lit(1L << k)).otherwise(rest)
    }

  /** The DuckDB rendering of [[pow2Bucket]] over a column expression —
    * generated from the same loop so the two chains cannot drift.
    */
  def pow2BucketSqlCases(nExpr: String): String =
    (0 to 20).map(k => s"WHEN $nExpr <= ${1L << k} THEN ${1L << k}")
      .mkString("CASE ", " ", s" ELSE ${1L << 20} END")

  /** Padding-efficiency table for length-bucketed batching (round-8) —
    * the training-infra accounting behind "bucket by sequence length
    * before batching": pad-to-bucket wastes (bucket_max − n_tokens)
    * slots per doc, so per power-of-two bucket this emits the exact
    * integer waste share, plus one `global` row pricing the
    * no-bucketing alternative (everything padded to the longest doc's
    * bucket). waste_bp = (padded − real) · 10000 DIV padded — all
    * integer, hash-exact. One scan + one tiny aggregate; the global
    * row is a 1-row rollup of the per-bucket frame.
    * Output: `scope, bucket_max, n_docs, sum_tokens, waste_bp`.
    */
  def paddingEfficiency(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val nTok = size(split(col(textCol), " ")).cast("long")
    val per = docs.select(pow2Bucket(nTok).as("bucket_max"), nTok.as("n_tokens"))
      .groupBy(col("bucket_max"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
    val global = per.agg(max(col("bucket_max")).as("bucket_max"),
      sum(col("n_docs")).as("n_docs"), sum(col("sum_tokens")).as("sum_tokens"))
    per.withColumn("scope", lit("bucket"))
      .unionByName(global.withColumn("scope", lit("global")))
      .select(col("scope"), col("bucket_max"), col("n_docs"), col("sum_tokens"),
        expr("CAST((n_docs * bucket_max - sum_tokens) * 10000 " +
          "DIV (n_docs * bucket_max) AS BIGINT)").as("waste_bp"))
  }

  /** Exact-size weighted sample WITHOUT replacement — sequential Poisson
    * sampling (Ohlsson 1998, the πps design statistical agencies use):
    * every row gets priority = hash(id) DIV weight and the sample is the
    * global n smallest priorities. With hash uniform on [0, 2^60), the
    * priority is the integer form of u_i/w_i, so inclusion probability
    * is approximately proportional to weight without replacement — "keep
    * exactly n docs, proportional to token count × quality" is how a
    * corpus gets cut to a token budget in one pass. Distinct from the
    * rate-based mixers ([[stratifiedSample]]/[[temperatureMix]] keep a
    * FRACTION per stratum; [[capPerGroup]] is uniform-per-group): here
    * the weight is per-DOC and the output size is exact.
    *
    * All arithmetic is 64-bit integer (hash < 2^60, one BIGINT DIV), so
    * the sample is RNG-free, engine-portable, and stable across runs /
    * partitionings / task retries; ties (astronomically rare at 60-bit
    * resolution) break on id. Rows with weight <= 0 are excluded — a
    * zero weight means "never sample", and both engines would otherwise
    * diverge on division by zero.
    *
    * Scale shape: priorities are map-side; the n-smallest selection
    * plans as TakeOrderedAndProject (per-partition bounded heaps, then
    * one O(partitions × n) merge) — the corpus itself never shuffles.
    * That holds for n up to ~10^6; for larger samples run a cheap
    * priority-threshold estimate first (sample the priority
    * distribution, filter `priority < t̂`, exact-select within the
    * survivors) so the merge stays bounded.
    */
  def weightedSample(docs: DataFrame, weightCol: Column, n: Int,
      idCol: String = "doc_id", salt: String = "pps"): DataFrame = {
    require(n > 0, "sample size must be positive")
    graft.operators.Ranks.topK(prioritize(docs, weightCol, idCol, salt), n,
      col("priority").asc, col(idCol).asc)
  }

  /** The shared priority frame: weight <= 0 excluded, priority =
    * hash(id) DIV weight in pure 64-bit integers.
    */
  private[graft] def prioritize(docs: DataFrame, weightCol: Column,
      idCol: String, salt: String): DataFrame =
    docs
      .withColumn("w", weightCol.cast("long"))
      .filter(col("w") > 0)
      .withColumn("__h", TextDedup.portableHash(col(idCol).cast("string"), salt))
      .withColumn("priority", expr("__h div w"))
      .drop("__h")

  /** Grouped pps sample: exactly `n` docs PER GROUP (source/domain),
    * inclusion probability proportional to weight within each group —
    * the mixture-construction primitive when every source has its own
    * doc budget (the x48/x55 allocations made exact-size). Same
    * deterministic priority as [[weightedSample]] (hash(id) DIV weight,
    * pure 64-bit integers); the per-group selection is one row_number
    * window — a single shuffle on the group key, each group one sorted
    * streaming pass (the [[capPerGroup]] posture, and the same reason
    * it stays a window: a 2^60 hash does not fit a double, so the
    * bounded-heap aggregate would break bit-identity with the oracle).
    * Groups smaller than `n` keep everything.
    */
  def weightedSamplePerGroup(docs: DataFrame, groupCol: String,
      weightCol: Column, n: Int, idCol: String = "doc_id",
      salt: String = "pps"): DataFrame = {
    require(n > 0, "per-group sample size must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("priority").asc, col(idCol).asc)
    prioritize(docs, weightCol, idCol, salt)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .select(col(idCol), col(groupCol), col("w"), col("priority"),
        col("rk").cast("long").as("rk"))
  }

  /** [[weightedSample]]'s large-n path: estimate a priority threshold
    * from a deterministic hash-bucket pilot, keep only rows under it,
    * and run the exact n-smallest selection on the survivors — so the
    * per-partition heaps and the final merge are sized by the ~n·safety
    * survivor set, not by n × partitions. ROW-IDENTICAL to
    * [[weightedSample]] by construction: if at least n rows have
    * priority <= t̂, then the n smallest priorities overall are all
    * <= t̂ and therefore all survive the filter — so the top-n of the
    * survivors IS the global top-n. The function verifies exactly that
    * precondition with one count and falls back to the single-pass form
    * when the pilot undershot (tiny corpora, empty pilot), which keeps
    * the equality unconditional.
    *
    * The threshold is the max of the pilot's `max(16, n·rate·2)`
    * smallest priorities (safety 2×), attached as a 1-row broadcast —
    * no driver-side value ever leaves the plan except the survivor
    * count that decides the fallback. Everything is derived from the
    * same portable hashes as the sample itself, so the threshold path
    * is as deterministic and partitioning-invariant as the plain one.
    * Cost: two corpus scans (pilot + survivors) instead of one — the
    * trade only pays when n is large enough that the single-pass merge
    * (O(partitions × n)) is the bottleneck.
    */
  def weightedSampleThreshold(docs: DataFrame, weightCol: Column, n: Int,
      idCol: String = "doc_id", salt: String = "pps",
      pilotBp: Int = 100): DataFrame = {
    require(n > 0, "sample size must be positive")
    require(pilotBp > 0 && pilotBp <= 10000, "pilotBp in (0, 10000]")
    val prioritized = prioritize(docs, weightCol, idCol, salt)
    val pilotK = math.max(16, math.ceil(n * pilotBp / 10000.0 * 2).toInt)
    val pilot = prioritized.filter(
      pmod(TextDedup.portableHash(col(idCol).cast("string"), salt + "~pilot"),
        lit(10000L)) < pilotBp)
    val tHat = graft.operators.Ranks
      .topK(pilot.select(col("priority"), col(idCol)), pilotK,
        col("priority").asc, col(idCol).asc)
      .agg(max(col("priority")).as("t_hat"))
    // pinned (the dual-consumer rule): the fallback-deciding count and
    // the final selection must not each re-derive pilot + priorities —
    // the lazy checkpoint materializes the ~2n-row survivor set at the
    // count and the selection reads it back
    val survivors = prioritized.crossJoin(broadcast(tHat))
      .filter(col("priority") <= col("t_hat")).drop("t_hat")
      .localCheckpoint(false)
    if (survivors.count() >= n)
      graft.operators.Ranks.topK(survivors, n,
        col("priority").asc, col(idCol).asc)
    else // pilot undershot (or was empty): the single-pass form is exact
      graft.operators.Ranks.topK(prioritized, n,
        col("priority").asc, col(idCol).asc)
  }

  /** PII scrub: count and redact every match of each labelled pattern,
    * in pattern order — the pre-training privacy pass (emails, phone
    * numbers, ids) every corpus release runs before anything else sees
    * the text. Per pattern `(label, regex, replacement)` the output
    * gains `n_<label>` (match count BEFORE any replacement, so an
    * earlier pattern's replacement token can never change a later
    * pattern's count) plus one `scrubbed` column with all replacements
    * applied in order.
    *
    * Pure map-side row work — `regexp_extract_all` / `regexp_replace`
    * are codegen'd builtins, no UDF, no shuffle: the operator is
    * embarrassingly parallel at any corpus size. Patterns must stay in
    * the regex dialect intersection (character classes, quantifiers,
    * alternation — no lookaround, no backreferences) so the DuckDB
    * oracle replays them verbatim; counts are computed on the ORIGINAL
    * text for the same reason.
    */
  def piiScrub(docs: DataFrame, textCol: String,
      patterns: Seq[(String, String, String)]): DataFrame = {
    require(patterns.nonEmpty, "at least one pattern")
    val counts = patterns.map { case (label, re, _) =>
      size(regexp_extract_all(col(textCol), lit(re), lit(0)))
        .cast("long").as(s"n_$label")
    }
    val scrubbed = patterns.foldLeft(col(textCol)) { case (acc, (_, re, repl)) =>
      regexp_replace(acc, re, repl)
    }
    docs.select(col("*") +: counts :+ scrubbed.as("scrubbed"): _*)
  }
}

/** Marker word lists (tiny, code-embedded — public common stopwords). */
object Stopwords {
  val en: Set[String] = Set("the", "and", "of", "to", "in", "a", "is", "that")
  val markers: Map[String, Set[String]] = Map(
    "en" -> en,
    "de" -> Set("der", "und", "die", "das", "nicht", "ist"),
    "fr" -> Set("le", "la", "et", "les", "des", "est"),
    "es" -> Set("el", "los", "y", "las", "que", "es"),
    "zh" -> Set("的", "了", "是", "我", "不"))
}
