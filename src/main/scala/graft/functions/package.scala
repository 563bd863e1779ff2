package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Internal
import org.apache.spark.sql.types._

/** Column-level function library: every scalar the reference computes
  * (SURVEY §2.3/§2.9), expressed as codegen-friendly Spark built-ins plus
  * the one custom Catalyst expression ([[graft.functions.HexToDecimal]]).
  */
package object functions {

  /** Hex string (optional 0x prefix) → Decimal(38,0); null on garbage.
    * Reference: `int(x, 16)` at generate_report_dag.py:88,102.
    */
  def hex_to_decimal(c: Column): Column =
    Internal.column(HexToDecimal(Internal.expression(c)))

  /** Register graft SQL functions on an existing session (idempotent), so
    * `spark.sql("SELECT hex_to_decimal(...)")` resolves.
    */
  def registerAll(spark: SparkSession): Unit = {
    Internal.register(
      spark,
      "hex_to_decimal",
      new ExpressionInfo(classOf[HexToDecimal].getName, "hex_to_decimal"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HexToDecimal(children.head))
    Internal.register(
      spark,
      "md5_prefix60",
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix60(children.head))
    Internal.register(
      spark,
      "cm_estimate",
      new ExpressionInfo(classOf[CmEstimate].getName, "cm_estimate"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CmEstimate(children(0), children(1)))
    Internal.register(
      spark,
      "u256_dec",
      new ExpressionInfo(classOf[U256DecString].getName, "u256_dec"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        U256DecString(children.head))
    Internal.register(
      spark,
      "u256_limbs",
      new ExpressionInfo(classOf[U256Limbs].getName, "u256_limbs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        U256Limbs(children.head))
    Internal.register(
      spark,
      "u256_render_limbs",
      new ExpressionInfo(classOf[U256RenderLimbs].getName, "u256_render_limbs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        U256RenderLimbs(children.head))
    Internal.register(
      spark,
      "nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(children.head))
    Internal.register(
      spark,
      "dedup_tokens",
      new ExpressionInfo(classOf[DedupTokens].getName, "dedup_tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DedupTokens(children.head))
    Internal.register(
      spark,
      "cosine_sim",
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityExpr(children(0), children(1)))
    // sessions built without spark.sql.extensions still get the
    // expensive-kernel CSE rule (post-main-optimizer batch, idempotent)
    graft.plans.ExtractExpensiveSubexpressions.install(spark)
  }

  /** Canonical order-insensitive pair key: `'/'.join(sorted([a, b]))`.
    * Reference: generate_report_dag.py:106.
    */
  def pair_key(a: Column, b: Column): Column =
    concat_ws("/", array_sort(array(a, b)))

  /** Zero-pad a hex address to the canonical 66-char `0x` + 64 digits form.
    * Reference: parse_data.py:9-18 (we canonicalize with lpad-to-64; the
    * reference's `66 - len` pad math is an acknowledged, tested divergence).
    * Inputs longer than 64 digits yield null (round-2, ADVICE.md): lpad
    * would silently TRUNCATE an oversized/malformed address to its first
    * 64 chars — corrupt-in-place is the one wrong answer; null routes it
    * to the caller's dirty-data handling.
    */
  def pad_address(c: Column): Column = {
    val stripped = regexp_replace(c, "^0[xX]", "")
    when(length(stripped) <= 64, concat(lit("0x"), lpad(stripped, 64, "0")))
      .otherwise(lit(null).cast(StringType))
  }

  /** Parse a JSON-encoded array-of-strings payload column.
    * Reference: `JSONExtract(data, 'Array(String)')`, generate_report_dag.py:46.
    */
  def json_string_array(c: Column): Column =
    from_json(c, ArrayType(StringType))

  /** Exact-sum projection of a double column: per-row cast to
    * Decimal(38,6) so downstream SUM is order-independent (needed for
    * bit-exact parity with any other engine; double sums are not
    * associative).
    */
  def dec6(c: Column): Column = c.cast(DecimalType(38, 6))

  /** The ONE splitmix64 behind every deterministic seed matrix (LSH
    * planes, JL signs, gear table, MinHash remix constants): seeds are
    * code, not data — every executor and every generated DuckDB oracle
    * must agree — so the mixer is shared, not copied per call site (a
    * constant tweak to one private copy would silently fork a hash
    * family).
    */
  private[graft] def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** uint256 hex → five base-10^18 limbs (array<long>, little-endian) —
    * the scale path past [[HexToDecimal]]'s Decimal(38,0) ceiling
    * (ROADMAP "uint256 ceiling"). Limbs sum as plain decimals across
    * ~10^20 rows; normalize + render with [[u256_render]].
    */
  def u256_limbs(c: Column): Column =
    Internal.column(U256Limbs(Internal.expression(c)))

  /** uint256 hex → exact decimal string (≤ 78 digits), one parse per
    * row — see [[U256DecString]].
    */
  def u256_dec(c: Column): Column =
    Internal.column(U256DecString(Internal.expression(c)))

  /** Render a [[u256_limbs]] array (five carry-normalized base-10^18
    * limbs) to the exact decimal string in one fused codegen pass — the
    * per-row fast path; see [[U256RenderLimbs]] for why the
    * `element_at` ×5 + [[u256_render]] composition is ~5× slower.
    */
  def u256_render_limbs(limbs: Column): Column =
    Internal.column(U256RenderLimbs(Internal.expression(limbs)))

  /** Carry-normalize five base-10^18 limb columns (any magnitudes up to
    * Decimal(38,0), e.g. per-limb SUMs over a group) and render the
    * exact decimal string. All arithmetic is built-in decimal ops —
    * whole-stage codegen'd, no per-row objects. The carry chain is
    * exact: limb sums stay ≤ N·10^18 (< 10^38 to N ~ 10^20 rows) and
    * each division is by the limb base of a nonnegative remainder-free
    * numerator, so the (38,6) division result is integral.
    */
  def u256_render(l0: Column, l1: Column, l2: Column, l3: Column, l4: Column): Column = {
    val B = lit(U256Conv.Base)
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    def step(t: Column): (Column, Column) = {
      val r = pmod(t, B)
      (dec(r), dec((t - r) / B))
    }
    val (c0, k0) = step(dec(l0))
    val (c1, k1) = step(dec(l1) + k0)
    val (c2, k2) = step(dec(l2) + k1)
    val (c3, k3) = step(dec(l3) + k2)
    val c4 = dec(dec(l4) + k3)
    val digits = concat(c4.cast(StringType),
      lpad(c3.cast(StringType), 18, "0"),
      lpad(c2.cast(StringType), 18, "0"),
      lpad(c1.cast(StringType), 18, "0"),
      lpad(c0.cast(StringType), 18, "0"))
    val trimmed = ltrim(digits, "0")
    when(trimmed === "", lit("0")).otherwise(trimmed)
  }

  /** Grouped 256-bit exact sum of a limb column (from [[u256_limbs]]),
    * rendered as the decimal string: five built-in decimal SUMs (map-side
    * partials, whole-stage codegen) + one [[u256_render]] projection.
    * Usage: `df.groupBy("g").agg(u256_sum_dec(col("limbs")).as("total"))`.
    */
  def u256_sum_dec(limbs: Column): Column = {
    def s(i: Int): Column =
      sum(element_at(limbs, i + 1).cast(DecimalType(38, 0)))
    u256_render(s(0), s(1), s(2), s(3), s(4))
  }

  /** Engine-portable 60-bit content hash (first 60 bits of md5) as a
    * codegen-native long — see [[Md5Prefix60]]. The hot-path kernel of
    * the portable MinHash/SimHash family and hash-based splits.
    */
  def md5_prefix60(c: Column): Column =
    Internal.column(Md5Prefix60(Internal.expression(c)))

  /** Unicode canonical composition (NFC) — see [[NfcNormalize]]. The
    * corpus text-cleaning first pass that makes canonically-equivalent
    * strings byte-identical before any hashing/fingerprinting.
    */
  def nfc_normalize(c: Column): Column =
    Internal.column(NfcNormalize(Internal.expression(c)))

  /** Within-string repeated-token removal, first-occurrence order — the
    * one-pass O(len) kernel behind x107's giant-document scale path;
    * see [[DedupTokens]].
    */
  def dedup_tokens(c: Column): Column =
    Internal.column(DedupTokens(Internal.expression(c)))

  /** Point-frequency probe of a serialized Count-Min sketch — keeps
    * sketch queries pure plans (broadcast the 1-row sketch aggregate,
    * probe per row); see [[CmEstimate]].
    */
  def cm_estimate(sketch: Column, term: Column): Column =
    Internal.column(CmEstimate(Internal.expression(sketch), Internal.expression(term)))

  /** Cosine similarity between two Array[Float]/Array[Double] columns —
    * the native fused-loop Catalyst expression ([[CosineSimilarityExpr]]).
    * Accumulates in Double in array order; bit-identical to the
    * composed-builtin form below but allocation-free.
    */
  def cosine_similarity(a: Column, b: Column): Column =
    Internal.column(CosineSimilarityExpr(Internal.expression(a), Internal.expression(b)))

  /** Same semantics composed from built-ins (`zip_with` + `aggregate`);
    * kept as the portable reference implementation the custom expression
    * is property-tested against.
    */
  def cosine_similarity_builtin(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0),
        (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Grouped top-K aggregate: top-k (score, id) pairs ranked
    * (score desc, id asc), O(k) state per group with map-side partials —
    * see [[TopKByScore]]. Usage:
    * `df.groupBy("g").agg(top_k_by(col("sim"), col("id"), 5).as("top"))`.
    */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    Internal.column(
      TopKByScore(Internal.expression(score), Internal.expression(id), k)
        .toAggregateExpression())

  /** Fused shortlist + greedy MMR selection per group; see [[MmrSelect]].
    * Usage: `scored.groupBy("qid").agg(mmr_select(col("id"), col("rel"),
    * col("vec"), 8, 4, 0.5).as("sel"))`.
    */
  def mmr_select(id: Column, rel: Column, vec: Column, shortlist: Int,
      k: Int, lambda: Double): Column =
    Internal.column(
      MmrSelect(Internal.expression(id), Internal.expression(rel),
        Internal.expression(vec), shortlist, k, lambda)
        .toAggregateExpression())

  /** Morton (Z-order) interleave of two int columns — the
    * multi-dimensional clustering key for data-skipping layouts. See
    * [[ZOrder2]].
    */
  /** All `m` PQ subspace codes of an embedding in one fused kernel pass,
    * with the (kilobyte) codebooks bound as a reference object — see
    * [[PqCodesExpr]]. `cws(j)(code)(d)` must be ordered by code.
    */
  def pq_codes(embedding: Column, cws: Array[Array[Array[Double]]], subDim: Int): Column =
    Internal.column(PqCodesExpr(Internal.expression(embedding),
      new PqCodebook(cws), subDim))

  def zorder_key(x: Column, y: Column): Column =
    Internal.column(ZOrder2(Internal.expression(x), Internal.expression(y)))

  /** Misra-Gries heavy-hitters sketch aggregate — O(capacity) state per
    * group at any input size; every item with frequency > n/(capacity+1)
    * is guaranteed in the output array<struct<item, min_count>> (counts
    * are lower bounds). See [[FrequentItemsAgg]].
    */
  def frequent_items(item: Column, capacity: Int): Column =
    Internal.column(
      FrequentItemsAgg(Internal.expression(item), capacity).toAggregateExpression())

  /** KLL quantile-sketch aggregate over a double column → serialized
    * BINARY partial (O(k·log n) state, map-side combine). The quantile
    * member of the re-aggregatable-partial family — see [[KllSketchAgg]]
    * for the error contract its consumers must use.
    */
  def kll_sketch_agg(value: Column, k: Int = 200): Column =
    Internal.column(
      KllSketchAgg(Internal.expression(value), k).toAggregateExpression())

  /** Second-level union of serialized KLL partials — the rollup-table
    * read path; see [[KllMergeAgg]].
    */
  def kll_merge_agg(sketch: Column, k: Int = 200): Column =
    Internal.column(
      KllMergeAgg(Internal.expression(sketch), k).toAggregateExpression())

  /** Quantile-value probe of a serialized KLL sketch; see [[KllQuantile]]. */
  def kll_quantile(sketch: Column, rank: Column): Column =
    Internal.column(KllQuantile(Internal.expression(sketch), Internal.expression(rank)))

  /** Word n-gram shingles of a text column (distinct, first occurrence
    * kept), for Jaccard / MinHash dedup. Empty array when the text has
    * fewer than `n` words. Native codegen kernel — see [[WordNgrams]].
    */
  def word_shingles(text: Column, n: Int): Column =
    Internal.column(WordNgrams(Internal.expression(text), n, distinct = true))

  /** All word n-grams in order, WITH duplicates — corpus frequency
    * statistics and repetition signals need the multiplicities that
    * [[word_shingles]] deliberately drops.
    */
  def word_ngrams(text: Column, n: Int): Column =
    Internal.column(WordNgrams(Internal.expression(text), n, distinct = false))

  /** All overlapping character n-grams (codepoint positions, with
    * duplicates) — the unit of the n-gram-profile language-ID family.
    * Native codegen kernel — see [[CharNgrams]].
    */
  def char_ngrams(text: Column, n: Int): Column =
    Internal.column(CharNgrams(Internal.expression(text), n))

  /** Gear-hash content-defined chunk boundaries — the production fast
    * path of the CDC pair (the portable windowed-md5 twin lives in
    * `TextDedup.cdcChunks`); expected chunk length 2^maskBits + minChunk.
    */
  def cdc_cuts(text: Column, maskBits: Int = 6, minChunk: Int = 16): Column =
    Internal.column(CdcCuts(Internal.expression(text), maskBits, minChunk))

  /** The composed-builtin shingle form [[WordNgrams]] is property-tested
    * against (interpreted higher-order chain — correct but ~10× slower;
    * see the expression's scaladoc).
    */
  def word_shingles_builtin(text: Column, n: Int): Column = {
    val words = split(text, " ")
    array_distinct(
      when(size(words) >= n,
        transform(
          sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))))
        .otherwise(array().cast(ArrayType(StringType))))
  }
}
