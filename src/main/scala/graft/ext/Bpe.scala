package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING at corpus scale — the
  * count-merge loop (Sennrich et al. 2016) that every BPE/WordPiece-ish
  * tokenizer pipeline runs before model training begins.
  *
  * Scale shape, in order of importance:
  *   1. Training runs on the WORD-COUNT VOCABULARY, not raw tokens: one
  *      corpus pass builds (word, n), and every merge iteration after
  *      that is |vocab|-sized with counts as weights — corpus-size
  *      INDEPENDENT, the classic formulation. At 100 TB the vocab is
  *      millions of rows while the corpus is trillions of tokens.
  *   2. Each iteration is one weighted pair aggregate (the symbol array
  *      zipped against its own tail, exploded, sum(n)) + a global top-1
  *      (TakeOrderedAndProject) + a map-side merge application — one
  *      shuffle per merge and no driver-side collect: the winning pair
  *      stays a 1-row frame crossJoin-broadcast onto the vocab (the x40
  *      de-driver pattern).
  *   3. The merge application is a BUILTIN string replace, not a UDF.
  *      The symbol sequence is one string with EVERY symbol wrapped in
  *      its own <D> delimiters (symbol "ab" is "<D>ab<D>", the
  *      sequence is their concatenation), so one BPE merge of (a, b) is
  *      replace("<D>a<D><D>b<D>" -> "<D>ab<D>"):
  *      `replace` scans leftmost, non-overlapping, resuming after each
  *      replacement — exactly BPE's greedy semantics ("a a a" merges the
  *      first pair and strands the third) — and per-symbol wrapping
  *      means adjacent matches never share a delimiter and a pattern
  *      can never bleed across a symbol boundary. Both engines implement
  *      `replace` identically, which together with integer-only counts
  *      makes the whole fit oracle-exact (no floats anywhere).
  *
  * The per-iteration vocab is lazily localCheckpoint'ed (the kmeans-fit
  * idiom) so the depth-N chain evaluates each stage once instead of
  * re-deriving the full prefix per reference.
  */
object Bpe {

  /** Symbol delimiter — a control char that never appears in text. */
  val D = "\u0001"

  /** End-of-word marker symbol (its own symbol from the start, so merges
    * can learn word-final units like "est&lt;/w&gt;").
    */
  val Eow = "</w>"

  /** (word, n, w): corpus word counts with the initial symbolization —
    * characters plus the end-of-word marker, each symbol
    * delimiter-wrapped.
    */
  def symbolizedVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("__chars", filter(split(col("word"), ""), x => x =!= ""))
      .withColumn("w", concat(lit(D),
        array_join(concat(col("__chars"), array(lit(Eow))), D + D), lit(D)))
      .select(col("word"), col("n"), col("w"))

  /** Unwrap the delimited symbol string back to the symbol array. */
  def symbols(w: Column): Column =
    transform(split(w, D + D), s => translate(s, D, ""))

  /** Weighted adjacent-pair counts over the current vocab: the symbol
    * array zipped against its own tail, exploded, counts summed by the
    * word frequency `n`. One hash aggregate with map-side combine.
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = symbols(col("w"))
    vocab
      .select(col("n"), explode(arrays_zip(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1))).as("__p"))
      .select(col("n"), col("__p.0").as("left_sym"), col("__p.1").as("right_sym"))
      .groupBy(col("left_sym"), col("right_sym"))
      .agg(sum(col("n")).as("pair_count"))
  }

  // one merge step: rewrite the wrapped pair into the wrapped merged
  // symbol; `top` is the 1-row winning-pair frame riding a broadcast
  private def applyMerge(vocab: DataFrame, top: DataFrame): DataFrame =
    vocab.crossJoin(broadcast(top))
      .select(col("word"), col("n"),
        replace(col("w"),
          concat(lit(D), col("left_sym"), lit(D + D), col("right_sym"), lit(D)),
          concat(lit(D), col("left_sym"), col("right_sym"), lit(D))).as("w"))

  private def topPair(vocab: DataFrame): DataFrame =
    graft.operators.Ranks.topK(pairCounts(vocab), 1,
      col("pair_count").desc, col("left_sym"), col("right_sym"))

  /** Learn `iters` merges; returns the merge table
    * (rank, left_sym, right_sym, merged, pair_count) — the model
    * artifact, `iters` rows. Deterministic tie-break:
    * (count DESC, left, right).
    */
  def fit(docs: DataFrame, iters: Int, textCol: String = "text"): DataFrame = {
    var vocab = symbolizedVocab(docs, textCol).localCheckpoint(false)
    var table: DataFrame = null
    var i = 1
    var exhausted = false
    while (i <= iters && !exhausted) {
      val top = topPair(vocab).localCheckpoint(false)
      // pair supply exhausts once every word is a single symbol (round-10,
      // found by the depth sweep): an empty winner must STOP the loop —
      // applyMerge's crossJoin against an empty 'top' would empty the
      // whole vocab, and every later iteration would burn a no-op job.
      // The merge table then carries fewer than `iters` rows, the
      // correct model for "the corpus had nothing more to merge".
      if (top.isEmpty) exhausted = true
      else {
        vocab = applyMerge(vocab, top).localCheckpoint(false)
        val row = top.select(lit(i).as("rank"), col("left_sym"), col("right_sym"),
          concat(col("left_sym"), col("right_sym")).as("merged"), col("pair_count"))
        table = if (table == null) row else table.unionAll(row)
      }
      i += 1
    }
    table
  }

  // ---------------------------------------------------------------------
  // Batched fit (round 10): close the serial-depth bound documented in
  // ROADMAP.md. Serial greedy runs 2 vocab-sized Spark jobs PER MERGE
  // (~110 ms of scheduler floor each at sf0.1/local[32]), so a 32k-merge
  // production fit is ~1 h of serial scheduling no matter the cluster
  // size. The batched form learns a PROVABLY-SAFE prefix of the ranked
  // pair list per pass — same jobs, k merges each — without changing a
  // single output row.
  //
  // Safety argument (why the batch equals serial greedy EXACTLY):
  // rank all pairs by (count DESC, left, right) — the serial tie-break.
  // Keep the longest prefix that is pairwise SYMBOL-DISJOINT, cutting at
  // the first pair that shares a symbol with an earlier kept one; then
  // drop trailing kept pairs whose count equals the boundary pair's
  // count (keep at least the #1 pair, which is the serial winner by
  // definition). Equivalence, by induction over kept pairs p_1..p_k:
  //   - merging p_j cannot create or destroy an occurrence of a later
  //     kept p_i: the merged symbol replaces its two constituents in
  //     place and shares no symbol with p_i, so every p_i adjacency is
  //     untouched — kept counts are EXACTLY preserved;
  //   - pairs that share a symbol with a merged pair only LOSE count;
  //     prefix-cut means every such pair ranks at-or-after the boundary,
  //     so its count stays strictly below every kept pair's;
  //   - a NEWLY-CREATED pair (x, ab) arises only from a triple x,a,b,
  //     so its count is bounded by the old count of (x,a) — a pair that
  //     shares symbol a with kept (a,b), hence conflicts, hence ranks
  //     at-or-after the boundary, hence sits STRICTLY below every kept
  //     pair after the equal-count truncation. New identities can win
  //     lexicographic ties, which is exactly why the truncation demands
  //     strict count separation across the boundary.
  // Therefore at greedy step i the true argmax over the post-p_1..p_{i-1}
  // counts is p_i itself — the batch replays serial greedy verbatim.
  // BpeBatchSpec pins this with a tiny-alphabet ScalaCheck property
  // (small alphabets maximize ties and conflicts) plus depth-64 frame
  // equality on the real documents table.
  //
  // The candidate window (≤ window+1 rows of (sym, sym, count)) is
  // collected driver-side to run the sequential prefix scan — the
  // bounded model-artifact exception (Salt's ≤16 heavy hitters, the
  // lang-id profile): the merge table IS the model being built. The
  // merge application compiles the kept batch into nested builtin
  // `replace` calls — literals, one codegen'd map-side pass, no join.

  private final case class Cand(left: String, right: String, n: Long)

  /** One batch-selection pass: the kept prefix (serial-greedy-identical,
    * see above), at most `limit` pairs. `cand` is ranked by
    * (count DESC, left, right) and holds ≤ window+1 rows, so a boundary
    * row exists whenever anything beyond the kept prefix exists.
    */
  private def keptPrefix(cand: Array[Cand], limit: Int): Array[Cand] = {
    val used = scala.collection.mutable.HashSet.empty[String]
    val kept = scala.collection.mutable.ArrayBuffer.empty[Cand]
    var boundary: Option[Long] = None
    var j = 0
    while (j < cand.length && boundary.isEmpty) {
      val c = cand(j)
      if (kept.size == limit || used(c.left) || used(c.right))
        boundary = Some(c.n)
      else {
        kept += c
        used += c.left; used += c.right
        // The merged symbol is also "used": a later candidate touching
        // the STRING c.left+c.right (a symbol that may already exist
        // from earlier batches) would gain occurrences from this merge,
        // so its candidate count is not an upper bound — treat it as
        // conflicting (merged-symbol aliasing, round-11 ADVICE).
        used += c.left + c.right
        // SELF-PAIR terminates the batch (round-11 ADVICE): merging
        // (a,a) creates (aa,a)/(aa,aa) whose occurrences aggregate
        // across many contexts — OR descend from the kept pair itself,
        // whose count sits ABOVE the boundary — so the "new pair is
        // bounded by a conflicting parent at-or-after the boundary"
        // step of the safety proof fails (counterexample: 20×"aaaX",
        // "uvuv"×15, "pqpq"×9 → (a,a)=40,(u,v)=30,(p,q)=18 all kept,
        // but merging (a,a) creates (aa,a)=20 > 18, and serial greedy
        // picks it at rank 3). Keeping the self-pair LAST is still
        // exact: the disjoint non-self prefix preserves its count, the
        // strict truncation keeps it above everything unkept, and its
        // unbounded creations land in the NEXT batch's recount.
        if (c.left == c.right && j + 1 < cand.length)
          boundary = Some(cand(j + 1).n)
      }
      j += 1
    }
    val strict = boundary match {
      case Some(b) => kept.takeWhile(_.n > b)
      case None    => kept // window covered the ENTIRE pair population,
      // all disjoint: then no pair anywhere shares a symbol with a kept
      // pair, so no merge can create a new pair (a creation needs a
      // conflicting parent) — the whole batch is safe, ties included.
    }
    (if (strict.isEmpty) kept.take(1) else strict).toArray
  }

  /** The kept batch applied as nested literal `replace`s — one
    * whole-stage-codegen map pass per batch, rank order preserved
    * (irrelevant to the result, since kept pairs are symbol-disjoint,
    * but it mirrors the serial application exactly).
    */
  private def applyBatch(vocab: DataFrame, kept: Array[Cand]): DataFrame = {
    val rewritten = kept.foldLeft(col("w")) { (acc, c) =>
      replace(acc, lit(D + c.left + D + D + c.right + D),
        lit(D + c.left + c.right + D))
    }
    vocab.select(col("word"), col("n"), rewritten.as("w"))
  }

  /** Batch sizes of the most recent [[batchLoop]] run — diagnostic only
    * (BpeDepthBench reports them; nothing semantic reads this).
    */
  @volatile private[graft] var lastBatchSizes: Seq[Int] = Nil

  // the shared batched count-merge loop: returns (final vocab, merges)
  private def batchLoop(docs: DataFrame, iters: Int, textCol: String,
      window: Int): (DataFrame, Seq[(Int, String, String, Long)]) = {
    require(window >= 1, "bpe batch window must be >= 1")
    var vocab = symbolizedVocab(docs, textCol).localCheckpoint(false)
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    var exhausted = false
    while (learned.size < iters && !exhausted) {
      val remaining = iters - learned.size
      val lim = math.min(window, remaining)
      val cand = graft.operators.Ranks.topK(pairCounts(vocab), lim + 1,
          col("pair_count").desc, col("left_sym"), col("right_sym"))
        .collect()
        .map(r => Cand(r.getString(0), r.getString(1), r.getLong(2)))
      if (cand.isEmpty) exhausted = true
      else {
        val kept = keptPrefix(cand, lim)
        sizes += kept.length
        kept.foreach { c =>
          learned += ((learned.size + 1, c.left, c.right, c.n))
        }
        vocab = applyBatch(vocab, kept).localCheckpoint(false)
      }
    }
    lastBatchSizes = sizes.toSeq
    (vocab, learned.toSeq)
  }

  /** [[fit]] with batched non-interfering merges: row-identical output
    * (BpeBatchSpec), ~`mean-batch-size`× fewer serial Spark jobs. The
    * returned merge table is built driver-side from the learned batch
    * rows — it is the model artifact, `iters` rows at most.
    */
  def fitBatched(docs: DataFrame, iters: Int, textCol: String = "text",
      window: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (_, learned) = batchLoop(docs, iters, textCol, window)
    learned.toDF("rank", "left_sym", "right_sym", "pair_count")
      .select(col("rank"), col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"),
        col("pair_count"))
  }

  /** [[fittedVocab]] with batched merges — same row-identical guarantee. */
  def fittedVocabBatched(docs: DataFrame, iters: Int,
      textCol: String = "text", window: Int = 64): DataFrame =
    batchLoop(docs, iters, textCol, window)._1

  /** The vocab after `iters` learned merges — (word, n, w) with `w`
    * holding the final symbolization.
    */
  def fittedVocab(docs: DataFrame, iters: Int,
      textCol: String = "text"): DataFrame = {
    var vocab = symbolizedVocab(docs, textCol).localCheckpoint(false)
    var i = 0
    var exhausted = false
    while (i < iters && !exhausted) {
      val top = topPair(vocab).localCheckpoint(false)
      // see fit: an empty winner would empty the vocab via the crossJoin
      if (top.isEmpty) exhausted = true
      else vocab = applyMerge(vocab, top).localCheckpoint(false)
      i += 1
    }
    vocab
  }

  /** Tokenize the corpus under the fitted merges: per document, the BPE
    * token count and the word count. The per-word token counts live on
    * the |vocab|-sized frame; docs join it by word — at production scale
    * that join broadcasts when the vocab is model-sized, or co-keys on
    * the exploded word otherwise.
    */
  def encode(docs: DataFrame, iters: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tok = fittedVocab(docs, iters, textCol)
      .select(col("word"), size(split(col("w"), D + D)).as("t"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(tok, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("t")).cast("long").as("n_tokens_bpe"),
        count(lit(1)).as("n_words"))
  }

  /** Tokenizer fertility per source (round-8): the dataset-card table
    * behind "how well does the tokenizer fit each slice of the mix" —
    * chars-per-token and tokens-per-word in exact integer basis points,
    * aggregated per source over the [[encode]] output (the same shared
    * lazy fit chain, so the merge loop still runs once). A source whose
    * chars_per_token collapses toward 10000 (1 char/token) is one the
    * vocabulary serves badly — its token budget inflates accordingly.
    * Output: `source, n_docs, sum_chars, sum_tokens, sum_words,
    * chars_per_token_bp, tokens_per_word_bp`.
    */
  def fertilityBySource(docs: DataFrame, iters: Int,
      textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), col("source"),
        length(col(textCol)).cast("long").as("__chars"))
      .join(encode(docs, iters, "doc_id", textCol), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__chars")).as("sum_chars"),
        sum(col("n_tokens_bpe")).as("sum_tokens"), sum(col("n_words")).as("sum_words"))
      .select(col("source"), col("n_docs"), col("sum_chars"), col("sum_tokens"),
        col("sum_words"),
        expr("CAST(sum_chars * 10000 DIV sum_tokens AS BIGINT)").as("chars_per_token_bp"),
        expr("CAST(sum_tokens * 10000 DIV sum_words AS BIGINT)").as("tokens_per_word_bp"))
}
