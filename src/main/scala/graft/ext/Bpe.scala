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
