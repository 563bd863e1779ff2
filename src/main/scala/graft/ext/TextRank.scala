package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Ranks

/** BM25 ranked retrieval over a distributed inverted index — the
  * retrieval primitive behind retrieval-based decontamination ("which
  * training docs does this eval question retrieve?"), targeted data
  * selection, and relevance-filtered corpus slices.
  *
  * Index layout is the classic posting-list factoring, computed as one
  * dataflow: `tf` (doc, term, tf, dl) from a single explode-aggregate
  * (the per-doc length rides along the explode, so no second join
  * against a doc-length table), `df` per term re-aggregated FROM `tf`
  * (identical subtree on both sides of the final join → Spark computes
  * it once via exchange reuse, the x26 shape), and the corpus totals
  * (N docs, total tokens) as a 1-row broadcast. Queries are a tiny
  * (query_id, term) frame: `df` is semi-joined down to the query
  * vocabulary and BROADCAST into the posting lists, so scoring touches
  * only postings of query terms — one shuffle for `tf`, one for the
  * per-(query, doc) sum, a bounded-heap top-k; nothing corpus-wide ever
  * sits on the driver.
  *
  * Two IDF modes:
  *   - `lnIdf = true`: the standard Robertson/Sparck-Jones BM25+
  *     `ln(1 + (N - df + 0.5)/(df + 0.5))` (the Lucene form — always
  *     positive, unlike the raw RSJ log which can go negative for
  *     df > N/2).
  *   - `lnIdf = false` (default): the RATIONAL idf
  *     `(N - df + 0.5)/(df + 0.5)` — the same quantity without the log.
  *     Per term it is a monotone transform of the ln form (so
  *     single-term rankings agree exactly); across a multi-term sum it
  *     weights rare terms more aggressively. The point of the rational
  *     form is cross-engine EXACTNESS: every operation is an IEEE
  *     multiply/divide of values derived from exact integers, and `ln`
  *     is the one piece of BM25 that libm does not round identically
  *     across engines (see `graft.Q`'s determinism contract — the x41
  *     idiom). The per-term score is rounded once to Decimal(38,6) and
  *     summed in decimal, so the per-doc total is partition-order
  *     independent and oracle-checkable bit-for-bit.
  *
  * Reference behavior anchor: the reference pipeline has no retrieval
  * operator; this extends the curation surface the way SURVEY §2's
  * LLM-pipeline extensions do (dedup/contamination live in
  * [[TextDedup]], ranking lives here).
  */
object TextRank {

  /** Score `queries` (columns `query_id`, `term`) against `docs` and
    * return the top `k` docs per query: `query_id, rank, doc_id, score`
    * (score as a canonical Decimal(38,6) string — exact in rational-idf
    * mode). Docs with no query term never enter the join.
    */
  def bm25(docs: DataFrame, queries: DataFrame, k: Int = 5,
      k1: Double = 1.2, b: Double = 0.75, lnIdf: Boolean = false,
      idCol: String = "doc_id", textCol: String = "text",
      postingsOpt: Option[DataFrame] = None,
      statsOpt: Option[DataFrame] = None): DataFrame = {
    val tf = postingsOpt.getOrElse(postings(docs, idCol, textCol))
    // df over QUERY-TERM postings only (round-11): the semi-join keeps
    // every posting row of the queried terms, so their df counts are
    // identical to a full-index aggregate — but the aggregate input
    // shrinks from the whole index to the query terms' posting lists,
    // which is the difference between an index-wide shuffle per query
    // batch and O(query-term postings) at production index sizes
    val qterms = queries.select(col("term")).distinct()
    val dfreq = tf.join(broadcast(qterms), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = statsOpt.getOrElse(docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col(textCol), " "))).as("n_tokens")))
    // df already query-restricted; attach query_id: |queries| rows, broadcast
    val qdf = dfreq.join(broadcast(queries), Seq("term"))
    val scored = tf.join(broadcast(qdf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__s", termScore(k1, b, lnIdf).cast(DecimalType(38, 6)))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__s")).as("__sum"))
      .select(col("query_id"), col(idCol),
        col("__sum").cast(DecimalType(38, 6)).as("__score"))
    Ranks.topKPerGroup(scored, Seq("query_id"), k,
        Seq(col("__score").desc, col(idCol)))
      .select(col("query_id"), col("rank"), col(idCol),
        col("__score").cast("string").as("score"))
  }

  /** TF-IDF ranked retrieval over the same inverted index — the classic
    * second ranker of a hybrid retrieval stack. Score per (query, doc) =
    * Σ_terms (tf/dl) · idf with the RATIONAL idf of [[bm25]] (exactness
    * rationale there): length-normalized term frequency times inverse
    * document frequency, no BM25 saturation — so its ranking genuinely
    * differs from BM25's on long documents and high-tf terms, which is
    * what makes fusing the two lists informative. Same cost shape as
    * [[bm25]]: the `tf`/`df` subtrees are IDENTICAL to bm25's, so when
    * both rankers run in one plan (see [[hybridRrf]]) Spark computes the
    * postings exchange once and reuses it.
    */
  def tfidf(docs: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "doc_id", textCol: String = "text",
      postingsOpt: Option[DataFrame] = None): DataFrame = {
    val tf = postingsOpt.getOrElse(postings(docs, idCol, textCol))
    // query-term-restricted df, same derivation as bm25's
    val qterms = queries.select(col("term")).distinct()
    val dfreq = tf.join(broadcast(qterms), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col(textCol), " "))).as("n_tokens"))
    val qdf = dfreq.join(broadcast(queries), Seq("term"))
    val scored = tf.join(broadcast(qdf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__s", tfidfTermScore().cast(DecimalType(38, 6)))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__s")).as("__sum"))
      .select(col("query_id"), col(idCol),
        col("__sum").cast(DecimalType(38, 6)).as("__score"))
    Ranks.topKPerGroup(scored, Seq("query_id"), k,
        Seq(col("__score").desc, col(idCol)))
      .select(col("query_id"), col("rank"), col(idCol),
        col("__score").cast("string").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of truncated
    * ranked lists: fused score per (query, doc) = Σ_lists 1/(c + rank),
    * summed over the lists the doc appears in. The standard c = 60
    * damps the head so a doc ranked well by EVERY ranker beats a doc
    * ranked first by one and absent from the rest — the property that
    * makes RRF the default fusion for hybrid (sparse + dense / second
    * ranker) retrieval, robust to incomparable score scales since only
    * RANKS enter. Arithmetic is oracle-exact: 1/(c + rank) is one IEEE
    * division of exact-integer-derived doubles, rounded once to
    * Decimal(38,6), summed in decimal (the x41 idiom). Each input is a
    * small top-k frame (O(queries × k)), so the fusion itself is a
    * cheap aggregate — the cost lives in the rankers.
    * Output: `query_id, rank, <idCol>, score, n_lists`.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 5, c: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val terms = rankings.map(_.select(col("query_id"), col(idCol),
      (lit(1.0) / (lit(c.toDouble) + col("rank").cast("double")))
        .cast(DecimalType(38, 6)).as("__t")))
    val fused = terms.reduce(_.unionByName(_))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__t")).as("__sum"), count(lit(1)).cast("int").as("n_lists"))
      .select(col("query_id"), col(idCol),
        col("__sum").cast(DecimalType(38, 6)).as("__score"), col("n_lists"))
    Ranks.topKPerGroup(fused, Seq("query_id"), k,
        Seq(col("__score").desc, col(idCol)))
      .select(col("query_id"), col("rank"), col(idCol),
        col("__score").cast("string").as("score"), col("n_lists"))
  }

  /** Hybrid retrieval: BM25 and TF-IDF top-`kPerList` lists fused by
    * RRF, top `k` kept. The two rankers' posting/df subtrees are
    * identical, and round 10 stopped trusting the optimizer to notice:
    * the static x64 plan carried 16 documents scans and 22 exchanges
    * with ZERO ReusedExchange nodes, so the corpus-wide
    * explode-aggregate is now computed once into a checkpointed frame
    * both rankers (and the caller's query derivation, via
    * `postingsOpt`) read. Only the scoring tails differ.
    */
  def hybridRrf(docs: DataFrame, queries: DataFrame, kPerList: Int = 20,
      k: Int = 5, postingsOpt: Option[DataFrame] = None): DataFrame = {
    val tf = postingsOpt.getOrElse(postings(docs).localCheckpoint(false))
    rrfFuse(Seq(
      bm25(docs, queries, kPerList, postingsOpt = Some(tf)),
      tfidf(docs, queries, kPerList, postingsOpt = Some(tf))), k)
  }

  /** Posting lists with the per-doc length riding along: one explode →
    * one (doc, term) aggregate; `dl` is constant within a doc so
    * `min(dl)` recovers it without a join.
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), size(split(col(textCol), " ")).as("__dl"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), min(col("__dl")).as("dl"))

  /** Corpus stats recovered FROM a postings frame — the read side of a
    * standing inverted index (`StreamingIngest.bm25IndexStream`), where
    * the raw docs are gone and the index is the only standing data.
    * Exact equalities with the docs-side aggregate, by construction of
    * [[postings]]: every NON-NULL-text doc lands ≥ 1 posting row
    * (Spark's `split("", " ")` and DuckDB's `string_split` both yield
    * one empty token for empty text — but `split(NULL)` explodes to
    * ZERO rows, which is why `bm25IndexStream` gates null text out with
    * a named filter instead of letting such docs silently vanish from
    * n_docs), so `count(DISTINCT id)` = indexed doc count; and
    * `dl = Σ tf` within a doc, so `Σ tf` over the index = total tokens.
    * The id-uniqueness half rides on the index's append-once contract
    * (a doc_id appended twice would double-count n_tokens and every tf
    * — that regime belongs upstream, in the keyed-dedup family).
    * One index-sized aggregate — never a corpus re-scan.
    */
  def statsFromPostings(tf: DataFrame, idCol: String = "doc_id"): DataFrame =
    tf.agg(countDistinct(col(idCol)).as("n_docs"),
      sum(col("tf")).as("n_tokens"))

  /** Mid-frequency probe queries derived from the corpus itself: terms
    * at df-rank `lo..hi` (df DESC, term ASC — a deterministic total
    * order), paired off into (hi-lo+1)/2 two-term queries. Rank 1 terms
    * are stopword-like (idf ~ 0) and tail terms retrieve nothing, so the
    * mid-band is where ranking is non-trivial. `limit(hi)` plans as
    * TakeOrderedAndProject (bounded heap), then the window runs on `hi`
    * rows — never a corpus-wide sort.
    */
  def midFrequencyQueries(docs: DataFrame, lo: Int = 11, hi: Int = 16,
      idCol: String = "doc_id", textCol: String = "text",
      postingsOpt: Option[DataFrame] = None): DataFrame = {
    val dfreq = postingsOpt.getOrElse(postings(docs, idCol, textCol))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val top = Ranks.topK(dfreq, hi, col("df").desc, col("term"))
    Ranks.topKPerGroup(top, Seq.empty, hi, Seq(col("df").desc, col("term")),
        rankCol = "__rnk")
      .filter(col("__rnk").between(lo, hi))
      .select(expr(s"CAST((__rnk - $lo) DIV 2 AS BIGINT)").as("query_id"),
        col("term"))
  }

  // The per-term BM25 score with every float step mirrored verbatim in
  // the oracle SQL (bm25TermScoreSql): exact-integer-derived doubles,
  // explicit association, literals round-tripped through Double.toString
  // so both engines parse the identical bit pattern.
  private def termScore(k1: Double, b: Double, lnIdf: Boolean): Column = {
    val idfRational =
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))
    val idf = if (lnIdf) log(lit(1.0) + idfRational) else idfRational
    val avgdl = col("n_tokens").cast("double") / col("n_docs").cast("double")
    val den = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl))
    (idf * (col("tf").cast("double") * lit(k1 + 1))) / den
  }

  // The per-term TF-IDF score, float-mirrored in tfidfTermScoreSql the
  // same way termScore is in bm25TermScoreSql.
  private def tfidfTermScore(): Column = {
    val idfRational =
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))
    (col("tf").cast("double") / col("dl").cast("double")) * idfRational
  }

  /** The TF-IDF per-term score as DuckDB SQL over columns
    * `n_docs, df, tf, dl` — expression-tree twin of `tfidfTermScore`.
    */
  def tfidfTermScoreSql: String = {
    val idf = "((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
    s"((CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)) * $idf)"
  }

  /** The rational-mode per-term score as DuckDB SQL over columns
    * `n_docs, df, tf, dl, n_tokens` — the exact expression-tree twin of
    * [[termScore]] for oracle generation.
    */
  def bm25TermScoreSql(k1: Double = 1.2, b: Double = 0.75): String = {
    val idf = "((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
    val avgdl = "(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val den = s"(CAST(tf AS DOUBLE) + $k1 * (1.0 - $b + $b * (CAST(dl AS DOUBLE) / $avgdl)))"
    s"(($idf * (CAST(tf AS DOUBLE) * ${k1 + 1})) / $den)"
  }
}
