package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.ext.{Multimodal, Similarity, TextDedup, TextStats}
import graft.ext.Stopwords
import graft.operators.ConnectedComponents
import graft.sources.Tables

/** North-star LLM-data-pipeline operators (BASELINE.json): dedup,
  * similarity search, text analysis, multimodal plumbing — registered as
  * first-class queries over the `documents`/`embeddings` tables.
  *
  * Round-2 posture: EVERY declared query carries a DuckDB oracle. Two
  * mechanisms make the engine-specific ones expressible:
  *   - hash families are "portable" (md5-prefix + xor/shift/add remixes —
  *     identical int64 semantics in both engines); the xxhash64 fast
  *     paths remain as library API covered by ScalaTest.
  *   - float kernels (cosine, hyperplane dots) accumulate left-to-right
  *     in double on the Spark side, and the oracles are GENERATED here as
  *     explicit left-associated sums over the same literal constants —
  *     bit-identical IEEE arithmetic, so even top-k ORDER BY on similarity
  *     agrees exactly.
  */
object ExtensionQueries {

  /** Temp scratch dir for queries that must round-trip real files (x86
    * media, x91 gzip-JSONL), deleted recursively at JVM exit: the data
    * must outlive the returned lazy DataFrame (Bench evaluates each
    * query several passes later), so eager deletion is impossible — but
    * without the hook every Verify/Bench invocation leaked a dir in
    * /tmp forever (round-11 verdict item 6).
    */
  private def scratchTempDir(prefix: String): String =
    graft.util.Scratch.tempDir(prefix)

  /** One arrival wave under `root/src` for the streaming read-back
    * queries (x111/x113/x116) — delegates to [[graft.util.FileWaves]],
    * the ONE place the trigger-ordering contract lives.
    */
  private def writeStreamWave(root: String, b: Int,
      df: org.apache.spark.sql.DataFrame): Unit =
    graft.util.FileWaves.write(root + "/src", b, df)

  /** A script's CONTIGUOUS up-front waves in one Spark job
    * ([[graft.util.FileWaves.writeAll]] — round-16 optimization round):
    * the per-wave write paid one plan + job + commit per wave, pure
    * floor at micro-wave sizes, repeated by every lifecycle query.
    * Only for waves written back-to-back BEFORE the stream starts;
    * scripts that interleave waves with stream runs (x141/x145 shape)
    * keep per-wave writes for the interleaved part.
    */
  private def writeStreamWaves(root: String,
      waves: Seq[org.apache.spark.sql.DataFrame]): Unit =
    graft.util.FileWaves.writeAll(root + "/src", waves)

  /** The shared x117 doc-update wave script: the full corpus arrives in
    * wave 0; portable-md5 bucket h4==1 re-arrives DOUBLED in wave 1 and
    * h4==3 takes an intermediate '+alpha' update; h4==2 re-arrives
    * null-text (= deletion) and h4==3 reverts in wave 2. Writes the
    * three waves under `root/src` and returns the file-stream frame.
    * ONE definition (round-13 self-review): five queries share the
    * closed-form latest-version oracles this script implies, so the
    * script must not be able to drift per query.
    */
  private def docUpdateWaveFrames(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[org.apache.spark.sql.DataFrame] = {
    val docs = Tables.documents(s, d)
      .withColumn("h4", pmod(graft.ext.TextDedup.portableHashBuiltin(
        col("doc_id").cast("string"), ""), lit(4L)))
      .localCheckpoint(false) // one corpus pass feeds all three waves
    Seq(
      docs.drop("h4"),
      docs.filter(col("h4") === 1)
        .withColumn("text", concat(col("text"), lit(" "), col("text"))).drop("h4")
        .unionByName(docs.filter(col("h4") === 3)
          .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4")),
      docs.filter(col("h4") === 2)
        .withColumn("text", lit(null).cast("string")).drop("h4")
        .unionByName(docs.filter(col("h4") === 3).drop("h4")))
  }

  /** Bucket count for the bucketed-log queries: the session's shuffle
    * parallelism, NOT a constant (round-15). The bucketed layout's
    * whole point is trading exchanges for bucket-local work, but bucket
    * count also CAPS the parallelism of every bucket-preserving stage —
    * the ×100 ScaleSmoke sweep measured the migrated fused loops 2-3×
    * SLOWER with 8 buckets on 32 cores (resolve and append strangled to
    * 8 tasks) and the cap lifted exactly when buckets matched the
    * session's width. On a real cluster this is the standard posture:
    * buckets ≈ total cores (or a small multiple), a layout decision
    * made once per table for the cluster, not per corpus.
    */
  private def sessionBuckets(s: org.apache.spark.sql.SparkSession): Int =
    // the conf value is not guaranteed numeric ("auto" on platforms with
    // an adaptive-partitions shim, round-16 ADVICE); a bucket-count
    // lookup must degrade to the session's actual width, not throw
    // before the query runs
    s.conf.get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(s.sparkContext.defaultParallelism)

  private def docUpdateStreamFrame(s: org.apache.spark.sql.SparkSession,
      d: String, root: String): org.apache.spark.sql.DataFrame =
    s.readStream
      .schema(Tables.documents(s, d).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")

  private def docUpdateWaveStream(s: org.apache.spark.sql.SparkSession,
      d: String, root: String): org.apache.spark.sql.DataFrame = {
    writeStreamWaves(root, docUpdateWaveFrames(s, d))
    docUpdateStreamFrame(s, d, root)
  }

  // ---- portable minhash/simhash oracle fragments --------------------------

  // DuckDB renderings of the portable md5 hash family (TextDedup.portableHash
  // + portableRemix): md5 once per shingle, xor/shift/add remix per
  // permutation — arithmetic chosen for identical int64 semantics in both
  // engines (no multiplies: DuckDB raises on overflow, the JVM wraps).
  private def remixSql(i: Int): String = {
    val (d, c) = graft.ext.TextDedup.portableRemixConsts(i)
    val m = graft.ext.TextDedup.PortableMask
    val x = s"xor(h0, $d)"
    val y = s"xor($x, ($x >> 29))"
    val z = s"(($y + $c) & $m)"
    s"xor($z, ($z >> 13))"
  }

  private val shingleHashCte: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words)-1)])) AS shingle
      |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t
      |  WHERE len(words) >= 3),
      |h AS (SELECT doc_id, ('0x'||substr(md5(shingle),1,15))::BIGINT AS h0 FROM sh)""".stripMargin

  private def sigColsSql: String =
    (0 until graft.ext.TextDedup.NumHashes).map(i =>
      s"CAST(min(${remixSql(i)}) AS BIGINT) AS s$i").mkString(", ")

  private val minhashPortableOracle: String =
    s"""$shingleHashCte
       |SELECT doc_id, $sigColsSql
       |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val simhashPortableOracle: String = {
    val votes = (0 until 60).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b").mkString(", ")
    val bits = (0 until 60).map(b =>
      s"(CASE WHEN b$b >= 0 THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)").mkString(" + ")
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |h AS (SELECT doc_id, ('0x'||substr(md5(word),1,15))::BIGINT AS h FROM w),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM v ORDER BY doc_id""".stripMargin
  }

  private def bandKeyCases: String =
    (0 until graft.ext.TextDedup.Bands).map { b =>
      val comps = (0 until graft.ext.TextDedup.RowsPerBand)
        .map(r => s"s${b * graft.ext.TextDedup.RowsPerBand + r}").mkString("||'_'||")
      s"WHEN $b THEN $comps"
    }.mkString(" ")

  private def bandValues: String =
    (0 until graft.ext.TextDedup.Bands).map(b => s"($b)").mkString(",")

  private val bandsPortableOracle: String =
    s"""$shingleHashCte,
       |sig AS (SELECT doc_id, $sigColsSql FROM h GROUP BY doc_id)
       |SELECT doc_id, band, CASE band $bandKeyCases END AS band_key
       |FROM sig, (VALUES $bandValues) bs(band)
       |ORDER BY doc_id, band""".stripMargin

  // x79: the portable LSH pair CTEs (the x03 oracle's body, emitting the
  // raw match count m instead of m/16), joined to each side's distinct
  // word-3-gram set for exact Jaccard, then the all-integer error
  // histogram — DuckDB // and Spark DIV agree on non-negative integers.
  private val minhashCalibrationOracle: String = {
    val n = graft.ext.TextDedup.NumHashes
    val eqCount = (0 until n).map(i =>
      s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""$shingleHashCte,
       |sig AS (SELECT doc_id, $sigColsSql FROM h GROUP BY doc_id),
       |banded AS (
       |  SELECT sig.*, band, CASE band $bandKeyCases END AS bkey
       |  FROM sig, (VALUES $bandValues) bs(band)),
       |ok AS (SELECT band, bkey FROM banded GROUP BY band, bkey
       |       HAVING count(*) <= ${graft.ext.TextDedup.DefaultMaxBucket}),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST($eqCount AS BIGINT) AS m
       |FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |JOIN ok ON a.band = ok.band AND a.bkey = ok.bkey),
       |sets AS (SELECT doc_id,
       |  list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words)-1)]) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t
       |  WHERE len(words) >= 3),
       |e AS (SELECT
       |  abs(p.m * (len(sa.g) + len(sb.g) - len(list_intersect(sa.g, sb.g)))
       |      - $n * len(list_intersect(sa.g, sb.g))) * 10000
       |    // ($n * (len(sa.g) + len(sb.g) - len(list_intersect(sa.g, sb.g)))) AS err_bp
       |  FROM pairs p
       |  JOIN sets sa ON sa.doc_id = p.doc_a
       |  JOIN sets sb ON sb.doc_id = p.doc_b)
       |SELECT CAST(err_bp // 500 AS BIGINT) AS err_bucket,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(min(err_bp) AS BIGINT) AS min_err_bp,
       |  CAST(max(err_bp) AS BIGINT) AS max_err_bp
       |FROM e GROUP BY err_bucket ORDER BY err_bucket""".stripMargin
  }

  private val minhashPairsPortableOracle: String = {
    val n = graft.ext.TextDedup.NumHashes
    val eqCount = (0 until n).map(i =>
      s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END").mkString(" + ")
    // `ok` mirrors candidatePairsFrom's default bucket cap (DefaultMaxBucket):
    // the oracled path IS the capped production default, so the gate would
    // catch a cap regression. Inert at sf0.01 (no bucket near the cap).
    s"""$shingleHashCte,
       |sig AS (SELECT doc_id, $sigColsSql FROM h GROUP BY doc_id),
       |banded AS (
       |  SELECT sig.*, band, CASE band $bandKeyCases END AS bkey
       |  FROM sig, (VALUES $bandValues) bs(band)),
       |ok AS (SELECT band, bkey FROM banded GROUP BY band, bkey
       |       HAVING count(*) <= ${graft.ext.TextDedup.DefaultMaxBucket})
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST($eqCount AS BIGINT) / CAST($n.0 AS DOUBLE) AS est_jaccard
       |FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |JOIN ok ON a.band = ok.band AND a.bkey = ok.bkey
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // BPE fit — the per-iteration CTE chain (pair counts over the current
  // vocab -> deterministic top-1 -> replace-based merge application),
  // generated so the oracle is the verbatim twin of Bpe.fit's loop.
  // chr(1) is Bpe.D; replace() is leftmost-non-overlapping in both
  // engines, which IS the BPE greedy semantics; everything is strings +
  // integer counts, so the chain is exact with no float idioms needed.
  private def bpeCtes(iters: Int): String = {
    val d = "chr(1)"
    val dd = s"$d||$d"
    val v0 =
      s"""v0 AS MATERIALIZED (SELECT word, n,
         |  $d || array_to_string([word[j:j] for j in range(1, len(word)+1)] || ['</w>'], $dd) || $d AS w
         |  FROM (SELECT word, count(*) AS n
         |        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
         |        WHERE len(word) > 0 GROUP BY word))""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT s[j] AS left_sym, s[j+1] AS right_sym, CAST(SUM(n) AS BIGINT) AS pair_count
         |  FROM (SELECT n, [trim(x, $d) for x in string_split(w, $dd)] AS s FROM v${i - 1}) t,
         |       unnest(range(1, len(s))) u(j)
         |  GROUP BY left_sym, right_sym),
         |t$i AS MATERIALIZED (SELECT left_sym, right_sym, pair_count FROM p$i
         |  ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1),
         |v$i AS MATERIALIZED (SELECT word, n,
         |  replace(w, $d||left_sym||$dd||right_sym||$d, $d||left_sym||right_sym||$d) AS w
         |  FROM v${i - 1}, t$i)""".stripMargin
    }
    (v0 +: steps).mkString(",\n")
  }

  private val bpeFitOracle: String = {
    val iters = 4
    val rows = (1 to iters).map(i =>
      s"SELECT CAST($i AS INT) AS rank, left_sym, right_sym, left_sym||right_sym AS merged, pair_count FROM t$i")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeCtes(iters)}
       |  $rows
       |ORDER BY rank""".stripMargin
  }

  // x112: the SAME serial per-iteration chain, at production-ish depth 64
  // — the oracle is serial greedy verbatim, so it is blind to the batched
  // prefix selection the Spark side uses (the whole point: fitBatched's
  // claim is row-identity with serial greedy, and this oracle IS serial
  // greedy, independently re-derived by DuckDB).
  private val bpeFitBatchedOracle: String = {
    val iters = 64
    val rows = (1 to iters).map(i =>
      s"SELECT CAST($i AS INT) AS rank, left_sym, right_sym, left_sym||right_sym AS merged, pair_count FROM t$i")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeCtes(iters)}
       |  $rows
       |ORDER BY rank""".stripMargin
  }

  private val bpeEncodeOracle: String =
    s"""WITH ${bpeCtes(4)},
       |tok AS (SELECT word, CAST(len(string_split(w, chr(1)||chr(1))) AS BIGINT) AS t FROM v4),
       |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |SELECT dw.doc_id, CAST(SUM(tok.t) AS BIGINT) AS n_tokens_bpe,
       |       CAST(count(*) AS BIGINT) AS n_words
       |FROM dw JOIN tok USING (word)
       |WHERE len(word) > 0
       |GROUP BY dw.doc_id ORDER BY doc_id""".stripMargin

  // x83: the x58 encode chain re-aggregated per source with char totals
  // — the fertility table, all-integer basis points.
  private val bpeFertilityOracle: String =
    s"""WITH ${bpeCtes(4)},
       |tok AS (SELECT word, CAST(len(string_split(w, chr(1)||chr(1))) AS BIGINT) AS t FROM v4),
       |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |enc AS (SELECT dw.doc_id, CAST(SUM(tok.t) AS BIGINT) AS t,
       |          CAST(count(*) AS BIGINT) AS nw
       |        FROM dw JOIN tok USING (word) WHERE len(word) > 0 GROUP BY dw.doc_id)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(strlen(d.text)) AS BIGINT) AS sum_chars,
       |  CAST(SUM(enc.t) AS BIGINT) AS sum_tokens,
       |  CAST(SUM(enc.nw) AS BIGINT) AS sum_words,
       |  CAST(SUM(strlen(d.text)) * 10000 // SUM(enc.t) AS BIGINT) AS chars_per_token_bp,
       |  CAST(SUM(enc.t) * 10000 // SUM(enc.nw) AS BIGINT) AS tokens_per_word_bp
       |FROM documents d JOIN enc ON d.doc_id = enc.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  // BM25 (rational idf) — the per-term float expression is generated by
  // TextRank.bm25TermScoreSql so the oracle's expression tree is the
  // verbatim twin of TextRank.termScore; decimal rounding + decimal sum
  // make the per-doc totals order-independent (x41 idiom). Query terms
  // are the df-rank-11..16 band paired into 3 two-term queries, same
  // derivation as TextRank.midFrequencyQueries.
  // Parameterized over the corpus relation (round-12): x54/x116 read the
  // raw documents table; x117 reads the latest-version corpus in closed
  // form. `rel` must be a table name or a parenthesized subquery with
  // columns (doc_id, text).
  private def bm25OracleOver(rel: String): String =
    s"""WITH w AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |            unnest(string_split(text, ' ')) AS term FROM $rel),
       |tf AS (SELECT doc_id, term, count(*) AS tf, MIN(dl) AS dl FROM w GROUP BY doc_id, term),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens FROM $rel),
       |qt AS (SELECT CAST((rnk - 11) // 2 AS BIGINT) AS query_id, term, df FROM (
       |   SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rnk FROM dfq) t
       |   WHERE rnk BETWEEN 11 AND 16),
       |sc AS (SELECT qt.query_id, tf.doc_id,
       |   CAST(${graft.ext.TextRank.bm25TermScoreSql()} AS DECIMAL(38,6)) AS s
       |   FROM tf JOIN qt USING (term), st),
       |agg AS (SELECT query_id, doc_id, CAST(SUM(s) AS DECIMAL(38,6)) AS score FROM sc GROUP BY query_id, doc_id)
       |SELECT query_id, rank, doc_id, CAST(score AS VARCHAR) AS score FROM (
       |  SELECT query_id, doc_id, score,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
       |  FROM agg) t
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val bm25Oracle: String = bm25OracleOver("documents")

  // x117's latest-version corpus in closed form — the q08 last-write-wins
  // semantics composed into x54's oracle: the update script is a
  // deterministic function of the base corpus (portable md5 bucket h4:
  // h4==1 re-arrives doubled in wave 1; h4==3 takes an intermediate
  // update in wave 1 then reverts in wave 2; h4==2 re-arrives null-text
  // in wave 2 = deleted), so "latest version of everything that arrived"
  // is expressible without seeing the stream: doubled for h4==1,
  // excluded for h4==2, original otherwise. The oracle is blind to the
  // version log, the retraction machinery, and the arrival order.
  private val bm25UpsertOracle: String = bm25OracleOver(
    """(SELECT doc_id, CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text END AS text
      |   FROM (SELECT doc_id, text,
      |           ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
      |         FROM documents) t
      |   WHERE h4 <> 2)""".stripMargin)

  // Hybrid retrieval: BM25 and TF-IDF top-20 lists (shared posting/df
  // CTEs, per-term float expressions generated by the TextRank twins)
  // fused by reciprocal-rank fusion — 1/(60 + rank) is one IEEE division
  // of exact-integer-derived doubles, rounded to Decimal(38,6), summed
  // in decimal; only RANKS cross between the two score spaces.
  private val hybridRrfOracle: String =
    s"""WITH w AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |            unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf, MIN(dl) AS dl FROM w GROUP BY doc_id, term),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens FROM documents),
       |qt AS (SELECT CAST((rnk - 11) // 2 AS BIGINT) AS query_id, term, df FROM (
       |   SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rnk FROM dfq) t
       |   WHERE rnk BETWEEN 11 AND 16),
       |bsc AS (SELECT qt.query_id, tf.doc_id,
       |   CAST(${graft.ext.TextRank.bm25TermScoreSql()} AS DECIMAL(38,6)) AS s
       |   FROM tf JOIN qt USING (term), st),
       |bagg AS (SELECT query_id, doc_id, CAST(SUM(s) AS DECIMAL(38,6)) AS score FROM bsc GROUP BY query_id, doc_id),
       |b20 AS (SELECT query_id, doc_id, rank FROM (
       |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM bagg) t WHERE rank <= 20),
       |tsc AS (SELECT qt.query_id, tf.doc_id,
       |   CAST(${graft.ext.TextRank.tfidfTermScoreSql} AS DECIMAL(38,6)) AS s
       |   FROM tf JOIN qt USING (term), st),
       |tagg AS (SELECT query_id, doc_id, CAST(SUM(s) AS DECIMAL(38,6)) AS score FROM tsc GROUP BY query_id, doc_id),
       |t20 AS (SELECT query_id, doc_id, rank FROM (
       |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM tagg) t WHERE rank <= 20),
       |u AS (SELECT query_id, doc_id, CAST(1.0 / (60.0 + CAST(rank AS DOUBLE)) AS DECIMAL(38,6)) AS t FROM b20
       |      UNION ALL
       |      SELECT query_id, doc_id, CAST(1.0 / (60.0 + CAST(rank AS DOUBLE)) AS DECIMAL(38,6)) AS t FROM t20),
       |f AS (SELECT query_id, doc_id, CAST(SUM(t) AS DECIMAL(38,6)) AS score,
       |             CAST(count(*) AS INT) AS n_lists FROM u GROUP BY query_id, doc_id)
       |SELECT query_id, rank, doc_id, CAST(score AS VARCHAR) AS score, n_lists FROM (
       |  SELECT query_id, doc_id, score, n_lists,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
       |  FROM f) t
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // PageRank over the x63 shared-shingle near-dup graph, 3 iterations
  // unrolled as CTEs. Per-edge contributions pr/deg rounded to
  // Decimal(38,6) and summed in decimal (partition-order-independent);
  // damping constants injected via Double.toString round-trip — note
  // (1.0 - 0.85) is NOT the double nearest 0.15, so the literal must be
  // the round-tripped Scala value, not "0.15".
  private val pagerankOracle: String = {
    val iters = 3
    val (base, damp) = graft.operators.PageRank.baseSql()
    val steps = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.b AS id,
         |  CAST(SUM(CAST(CAST(p.pr AS DOUBLE) / CAST(d.deg AS DOUBLE) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS s
         |  FROM e JOIN p${i - 1} p ON e.a = p.id JOIN deg d ON e.a = d.id GROUP BY e.b),
         |p$i AS (SELECT p0.id,
         |  CAST(CAST($base AS DOUBLE) / CAST(nn.n AS DOUBLE) +
         |       CAST($damp AS DOUBLE) * COALESCE(CAST(c$i.s AS DOUBLE), CAST(0.0 AS DOUBLE)) AS DECIMAL(38,6)) AS pr
         |  FROM p0 LEFT JOIN c$i ON p0.id = c$i.id, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
       |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents WHERE doc_id < 300) t
       |  WHERE len(words) >= 4),
       |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
       |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |       WHERE len(list_intersect(a.sh, b.sh)) >= 1),
       |e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
       |deg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY a),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
       |p0 AS (SELECT doc_id AS id,
       |  CAST(CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS DECIMAL(38,6)) AS pr FROM s, nn),
       |$steps
       |SELECT p$iters.id AS doc_id, CAST(COALESCE(deg.deg, 0) AS BIGINT) AS degree,
       |       CAST(p$iters.pr AS VARCHAR) AS pagerank
       |FROM p$iters LEFT JOIN deg ON p$iters.id = deg.id
       |ORDER BY doc_id""".stripMargin
  }

  // LSH S-curve: per-(b,r) SELECTs with the exponent chains unrolled as
  // left-associated multiplications, verbatim twins of lshSCurve's
  // Column reduces.
  private val lshSCurveOracle: String = {
    val nHashes = 16
    val sSteps = 19
    val selects = (1 to nHashes).filter(nHashes % _ == 0).map { b =>
      val r = nHashes / b
      val sExpr = "(CAST(s_bp AS DOUBLE) / 10000.0)"
      val sr = Seq.fill(r)(sExpr).mkString("(", " * ", ")")
      val q = s"(1.0 - $sr)"
      val qb = Seq.fill(b)(q).mkString("(", " * ", ")")
      s"""SELECT CAST($b AS INT) AS b, CAST($r AS INT) AS r, s_bp,
         |  CAST(CAST(1.0 - $qb AS DECIMAL(38,6)) AS VARCHAR) AS p_candidate
         |FROM (SELECT CAST(u.k * 10000 // ${sSteps + 1} AS BIGINT) AS s_bp
         |      FROM unnest(range(1, ${sSteps + 1})) u(k))""".stripMargin
    }
    selects.mkString("\n  UNION ALL\n") + "\nORDER BY b, s_bp"
  }

  private def eqCountSql(a: String, b: String): String =
    (0 until graft.ext.TextDedup.NumHashes).map(i =>
      s"CASE WHEN $a.s$i = $b.s$i THEN 1 ELSE 0 END").mkString(" + ")

  // Parameterized over the split-corpus CTE (round-12): x51 reads the
  // raw documents table under the 80/20 hash split; x120 reads the
  // LATEST-VERSION train corpus (updates applied, retractions dropped).
  // `spCte` must produce (doc_id, text, split). Round-13 (x125):
  // `selfExclude` drops same-doc_id corpus matches (the versioned-index
  // regime where a doc's update probes an index still serving its own
  // previous version) and `waveCol` prefixes a literal wave column so
  // per-wave instantiations can UNION — both default to the byte-
  // identical x51/x120 form.
  private def incrementalDedupOracleOver(spCte: String,
      selfExclude: Boolean = false, waveCol: Option[Int] = None): String = {
    val cap = graft.ext.TextDedup.DefaultMaxBucket
    // est_jaccard >= 0.5 over 16 components == at least 8 equal
    val minEq = math.ceil(0.5 * graft.ext.TextDedup.NumHashes).toInt
    val selfSql = if (selfExclude) " AND n.doc_id <> c.doc_id" else ""
    val waveSql = waveCol.map(w => s"CAST($w AS BIGINT) AS wave,\n  ").getOrElse("")
    s"""WITH sp AS ($spCte),
       |sh AS (SELECT doc_id, split,
       |    unnest(list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words)-1)])) AS shingle
       |  FROM (SELECT doc_id, split, string_split(text, ' ') AS words FROM sp) t
       |  WHERE len(words) >= 3),
       |h AS (SELECT doc_id, split, ('0x'||substr(md5(shingle),1,15))::BIGINT AS h0 FROM sh),
       |sig AS (SELECT doc_id, split, $sigColsSql FROM h GROUP BY doc_id, split),
       |banded AS (SELECT sig.*, band, CASE band $bandKeyCases END AS bkey
       |           FROM sig, (VALUES $bandValues) bs(band)),
       |cb AS (SELECT * FROM banded WHERE split = 'train'),
       |nb AS (SELECT * FROM banded WHERE split = 'eval'),
       |cok AS (SELECT band, bkey FROM cb GROUP BY band, bkey HAVING count(*) <= $cap),
       |nok AS (SELECT band, bkey FROM nb GROUP BY band, bkey HAVING count(*) <= $cap),
       |co AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS match_id
       |       FROM nb n JOIN cb c ON n.band = c.band AND n.bkey = c.bkey
       |       JOIN cok k ON n.band = k.band AND n.bkey = k.bkey
       |       WHERE ${eqCountSql("n", "c")} >= $minEq$selfSql),
       |bp AS (SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS match_id
       |       FROM nb a JOIN nb b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |       JOIN nok k ON a.band = k.band AND a.bkey = k.bkey
       |       WHERE ${eqCountSql("a", "b")} >= $minEq)
       |SELECT ${waveSql}s.doc_id,
       |  CAST(COALESCE(ch.n, 0) AS BIGINT) AS n_corpus_hits,
       |  CAST(COALESCE(bh.n, 0) AS BIGINT) AS n_batch_rivals,
       |  CAST(CASE WHEN COALESCE(ch.n, 0) = 0 AND COALESCE(bh.n, 0) = 0
       |       THEN 1 ELSE 0 END AS INT) AS keep
       |FROM (SELECT DISTINCT doc_id FROM nb) s
       |LEFT JOIN (SELECT new_id, count(*) AS n FROM co GROUP BY new_id) ch ON s.doc_id = ch.new_id
       |LEFT JOIN (SELECT new_id, count(*) AS n FROM bp GROUP BY new_id) bh ON s.doc_id = bh.new_id
       |ORDER BY doc_id""".stripMargin
  }

  private val incrementalDedupOracle: String = incrementalDedupOracleOver(
    """SELECT doc_id, text,
      |    CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 100 < 80
      |         THEN 'train' ELSE 'eval' END AS split
      |  FROM documents""".stripMargin)

  // x120's corpus: the x51 split with the x117 update script applied to
  // the TRAIN (index) side — train h4==1 doubled, train h4==2 retracted,
  // train h4==3 updated-then-reverted (latest = original), eval
  // untouched. Same base md5 hash feeds both the split and the update
  // bucket, exactly as the Spark side derives them.
  private val dedupRetractOracle: String = incrementalDedupOracleOver(
    """SELECT doc_id,
      |    CASE WHEN split = 'train' AND h % 4 = 1 THEN text || ' ' || text ELSE text END AS text,
      |    split
      |  FROM (SELECT doc_id, text,
      |          CASE WHEN h % 100 < 80 THEN 'train' ELSE 'eval' END AS split, h
      |        FROM (SELECT doc_id, text,
      |                ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h
      |              FROM documents) t0) t
      |  WHERE NOT (split = 'train' AND h % 4 = 2)""".stripMargin)

  // Parameterized over the corpus relation (round-13): x71 reads the raw
  // documents table under the 80/20 hash split; x123 reads the
  // LATEST-VERSION corpus (updates applied, retractions dropped). `rel`
  // must be a parenthesized subquery with columns (doc_id, text,
  // is_corpus) — doc_id MAY repeat across the two sides (x127 probes a
  // live index that still holds the doc's own previous version). Body is
  // x71's original SQL verbatim below the d CTE. `waveCol` prefixes a
  // literal wave column so per-wave instantiations can UNION (the
  // incrementalDedupOracleOver move).
  private def cdcIncrementalOracleOver(rel: String,
      waveCol: Option[Int] = None): String = {
    val waveSql = waveCol.map(w => s"CAST($w AS BIGINT) AS wave,\n  ").getOrElse("")
    s"""WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len, is_corpus
       |           FROM $rel),
       |c AS (SELECT doc_id, is_corpus, text, len,
       |        CASE WHEN len >= 9
       |             THEN [i for i in range(8, len) if ('0x'||substr(md5(substr(text, CAST(i - 7 AS INT), 8)),1,15))::BIGINT % 64 = 0]
       |             ELSE CAST([] AS BIGINT[]) END AS cuts
       |      FROM d),
       |seg AS (SELECT doc_id, is_corpus, text, len,
       |        list_prepend(CAST(1 AS BIGINT), [x + 1 for x in cuts]) AS starts,
       |        list_append(cuts, len) AS ends FROM c),
       |ch AS (SELECT doc_id, is_corpus, ends[u.i] - starts[u.i] + 1 AS clen,
       |              md5(substr(text, CAST(starts[u.i] AS INT), CAST(ends[u.i] - starts[u.i] + 1 AS INT))) AS h
       |       FROM seg, unnest(range(1, len(starts) + 1)) u(i)),
       |idx AS (SELECT DISTINCT h FROM ch WHERE is_corpus),
       |nb AS (SELECT doc_id, clen, h FROM ch WHERE NOT is_corpus)
       |SELECT ${waveSql}nb.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(CASE WHEN idx.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus_hits,
       |  CAST(SUM(CASE WHEN idx.h IS NULL THEN nb.clen ELSE 0 END) AS BIGINT) AS novel_chars
       |FROM nb LEFT JOIN idx ON nb.h = idx.h
       |GROUP BY nb.doc_id ORDER BY doc_id""".stripMargin
  }

  private val cdcIncrementalOracle: String = cdcIncrementalOracleOver(
    """(SELECT doc_id, text,
      |    (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 100 < 80) AS is_corpus
      |  FROM documents)""".stripMargin)

  // x123's corpus: the x71 split with the update script applied to the
  // TRAIN (index) side — train h4==1 re-arrives with every 'e' replaced
  // (content changes THROUGHOUT, so the superseded version's chunks
  // mostly vanish — doubling or prefixing would leave CDC's
  // shift-invariant chunks intact and the retraction hash-invisible),
  // train h4==2 retracted (null-text re-arrival), train h4==3
  // updated-then-reverted (latest = original), eval untouched. Same
  // base md5 hash feeds the split and the update bucket, exactly as the
  // Spark side derives them.
  private val cdcRetractOracle: String = cdcIncrementalOracleOver(
    """(SELECT doc_id,
      |    CASE WHEN is_corpus AND hh % 4 = 1 THEN replace(text, 'e', '#') ELSE text END AS text,
      |    is_corpus
      |  FROM (SELECT doc_id, text, (hh % 100 < 80) AS is_corpus, hh
      |        FROM (SELECT doc_id, text,
      |                ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS hh
      |              FROM documents) t0) t
      |  WHERE NOT (is_corpus AND hh % 4 = 2))""".stripMargin)

  // x125's oracle: the per-wave dedup verdicts REPLAYED in closed form —
  // for each wave k, the live index is the latest version of everything
  // that arrived in waves < k (the x117 update script: wave 1 delivers
  // h4==1 doubled + h4==3 '+alpha', wave 2 delivers h4==2 null-text and
  // h4==3 reverted) as the 'train' side and wave k's arrivals as the
  // 'eval' side, with SELF-matches excluded (a doc's update probes an
  // index still serving its own previous version). Each wave is one
  // instantiation of the x51 verdict SQL; the union is blind to the
  // version log, the stamped appends, and compaction. Wave 2's h4==2
  // null-text arrivals shingle to nothing on both engines, so they have
  // no verdict row — their effect is pure retraction, visible in later
  // waves' n_corpus_hits.
  private def dedupStreamRetractOracleOver(rel: String): String = {
    val baseCte =
      s"""(SELECT doc_id, text,
        |   ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
        | FROM $rel __r)""".stripMargin
    val wave0 = incrementalDedupOracleOver(
      s"SELECT doc_id, text, 'eval' AS split FROM $rel __r0",
      selfExclude = true, waveCol = Some(0))
    val wave1 = incrementalDedupOracleOver(
      s"""SELECT doc_id, text, 'train' AS split FROM $rel __r1
         |  UNION ALL
         |  SELECT doc_id,
         |    CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text || ' alpha' END AS text,
         |    'eval' AS split
         |  FROM $baseCte t WHERE h4 IN (1, 3)""".stripMargin,
      selfExclude = true, waveCol = Some(1))
    val wave2 = incrementalDedupOracleOver(
      s"""SELECT doc_id,
         |    CASE WHEN h4 = 1 THEN text || ' ' || text
         |         WHEN h4 = 3 THEN text || ' alpha'
         |         ELSE text END AS text,
         |    'train' AS split
         |  FROM $baseCte t
         |  UNION ALL
         |  SELECT doc_id, text, 'eval' AS split FROM $baseCte t2 WHERE h4 = 3""".stripMargin,
      selfExclude = true, waveCol = Some(2))
    s"""SELECT * FROM (
       |SELECT * FROM (
       |$wave0
       |) w0
       |UNION ALL
       |SELECT * FROM (
       |$wave1
       |) w1
       |UNION ALL
       |SELECT * FROM (
       |$wave2
       |) w2
       |) u ORDER BY wave, doc_id""".stripMargin
  }

  private val dedupStreamRetractOracle: String =
    dedupStreamRetractOracleOver("documents")

  // Shared x121/x124 machinery (round-13 review): the two entries differ
  // ONLY in the per-group trim the fold keeps — 10 for the bounded fold
  // whose forgotten-version regression x121 pins, n+ledger = 13 for the
  // x124 ledger variant that zeroes it — so the ~40-line wave replay and
  // the ~45-line wave script live ONCE, parameterized, instead of as two
  // drift-prone copies (the cdcIncrementalOracleOver move). The publish
  // cut is rk <= 10 in both; for trim = 10 it is vacuous by construction.
  private def groupedSampleForgottenOracle(trim: Int): String =
    s"""WITH t AS (SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
       |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'pps'),1,15))::BIGINT AS h
       |  FROM documents),
       |v AS (SELECT doc_id, source, w, h, h // w AS priority FROM t WHERE w > 0),
       |r0 AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY priority ASC, doc_id ASC) AS rk
       |  FROM v),
       |s0 AS (SELECT doc_id, source, w, h, priority FROM r0 WHERE rk <= $trim),
       |w1 AS (SELECT doc_id, 'moved' AS source, w * 1000 AS w, h, h // (w * 1000) AS priority
       |       FROM r0 WHERE source = 'src1' AND rk <= 5),
       |w2 AS (SELECT doc_id, source, GREATEST(1, w // 2) AS w, h, h // GREATEST(1, w // 2) AS priority
       |       FROM r0 WHERE source = 'src1' AND rk BETWEEN 11 AND 13
       |       UNION ALL
       |       SELECT doc_id, source, GREATEST(1, w // 2) AS w, h, h // GREATEST(1, w // 2) AS priority
       |       FROM r0 WHERE source = 'src1' AND rk = 6),
       |u1 AS (SELECT doc_id, source, w, h, priority FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY priority ASC, w ASC) AS vn
       |  FROM (SELECT * FROM s0 UNION ALL SELECT * FROM w1) uu) z WHERE vn = 1),
       |s1 AS (SELECT doc_id, source, w, h, priority FROM (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY priority ASC, doc_id ASC) AS rk
       |  FROM u1) z WHERE rk <= $trim),
       |u2 AS (SELECT doc_id, source, w, h, priority FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY priority ASC, w ASC) AS vn
       |  FROM (SELECT * FROM s1 UNION ALL SELECT * FROM w2) uu) z WHERE vn = 1),
       |s2 AS (SELECT doc_id, source, w, priority, rk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY priority ASC, doc_id ASC) AS rk
       |  FROM u2) z WHERE rk <= $trim),
       |best AS (SELECT doc_id, MIN(priority) AS p FROM (
       |  SELECT doc_id, priority FROM v
       |  UNION ALL SELECT doc_id, priority FROM w1
       |  UNION ALL SELECT doc_id, priority FROM w2) dd GROUP BY doc_id)
       |SELECT s2.doc_id, s2.source AS source, s2.w, s2.priority,
       |       CAST(s2.rk AS BIGINT) AS rk,
       |       CAST(CASE WHEN s2.priority > best.p THEN 1 ELSE 0 END AS INT) AS regressed
       |FROM s2 JOIN best ON best.doc_id = s2.doc_id
       |WHERE s2.rk <= 10
       |ORDER BY s2.source, rk""".stripMargin

  private def groupedSampleForgottenQuery(ledger: Int): (
      org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => {
      import graft.ext.TextStats
      val feats = Tables.documents(s, d).select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .localCheckpoint(false)
      // full per-group ranking to depth 15 — the wave script needs the
      // boundary rk 11..13 band the n=10 fold (ledger 0) discards
      val r0 = TextStats.weightedSamplePerGroup(feats, "source", col("n_tokens"), 15)
        .localCheckpoint(false)
      val halved = greatest(lit(1L), expr("w div 2"))
      val root = scratchTempDir(s"graft-x12x-forgotten-l$ledger")
      writeStreamWaves(root, Seq(
        feats,
        r0.filter(col("source") === "src1" && col("rk") <= 5)
          .select(col("doc_id"), lit("moved").as("source"),
            (col("w") * 1000L).as("n_tokens")),
        r0.filter(col("source") === "src1" && col("rk").between(11, 13))
          .select(col("doc_id"), col("source"), halved.as("n_tokens"))
          .unionByName(
            r0.filter(col("source") === "src1" && col("rk") === 6)
              .select(col("doc_id"), col("source"), halved.as("n_tokens")))))
      val docs = s.readStream
        .schema("doc_id LONG, source STRING, n_tokens LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(root + "/src/*")
      graft.streaming.StreamingIngest.groupedWeightedSampleStream(docs,
        "source", "n_tokens", 10, root + "/sample", root + "/ckpt",
        ledger = ledger)
      // best priority ever DELIVERED per id (originals + both update
      // waves) — the full-history contrast the bounded fold cannot see
      val delivered = TextStats.prioritize(feats, col("n_tokens"), "doc_id", "pps")
        .select(col("doc_id"), col("priority"))
        .unionByName(TextStats.prioritize(
            r0.filter(col("source") === "src1" && col("rk") <= 5)
              .select(col("doc_id"), (col("w") * 1000L).as("n_tokens")),
            col("n_tokens"), "doc_id", "pps")
          .select(col("doc_id"), col("priority")))
        .unionByName(TextStats.prioritize(
            r0.filter(col("source") === "src1" &&
                (col("rk").between(11, 13) || col("rk") === 6))
              .select(col("doc_id"), halved.as("n_tokens")),
            col("n_tokens"), "doc_id", "pps")
          .select(col("doc_id"), col("priority")))
        .groupBy(col("doc_id")).agg(min(col("priority")).as("__best"))
      graft.pipeline.ManifestTable.read(s, root + "/sample")
        .filter(col("rk") <= 10) // the published prefix (vacuous at ledger 0)
        .join(delivered, Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("w"), col("priority"),
          col("rk"),
          (col("priority") > col("__best")).cast("int").as("regressed"))
    }

  // ---- vector-space oracle fragments --------------------------------------
  // Bit-exact SQL twins of the Spark double kernels: explicit
  // left-associated sums (the fold order of VectorKernels.cosineFloat and
  // of aggregate(zip_with(...)) in Similarity.lshBucket), literal ±1 sign
  // matrix from Similarity.planeSigns. DuckDB lists are 1-indexed.

  private val Dim = Similarity.Dim
  private val Planes = Similarity.Planes

  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString("(CAST(0.0 AS DOUBLE) + ", " + ", ")")

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  // x * (+1.0) == x and x * (-1.0) == -x bitwise, so the signed sum is
  // exactly the Spark-side zip_with product fold
  private def planeDotSql(e: String, p: Int): String = {
    val signs = Similarity.planeSigns(Dim)
    (0 until Dim).map { d =>
      (if (signs(p)(d) > 0) " + " else " - ") + s"CAST($e[${d + 1}] AS DOUBLE)"
    }.mkString("(CAST(0.0 AS DOUBLE)", "", ")")
  }

  private def bucketSql(e: String): String =
    (0 until Planes).map(p =>
      s"(CASE WHEN ${planeDotSql(e, p)} >= 0 THEN ${1 << p} ELSE 0 END)")
      .mkString("(", " + ", ")")

  // JL projection: the literal ±1 matrix from Similarity.jlSigns; each
  // projected component is the signed left-associated sum (± CAST(e[i])
  // mirrors the zip_with ±1-multiply fold exactly, the planeDotSql
  // argument); norms and the projected-space cosine are the same
  // explicit left-associated folds the Spark side runs.
  private def jlProjSql(e: String): String = {
    val signs = Similarity.jlSigns(Dim)
    (0 until Similarity.JlDim).map { p =>
      (0 until Dim).map { d =>
        (if (signs(p)(d) > 0) " + " else " - ") + s"CAST($e[${d + 1}] AS DOUBLE)"
      }.mkString("(CAST(0.0 AS DOUBLE)", "", ")")
    }.mkString("[", ", ", "]")
  }

  private def jlDotSql(a: String, b: String): String =
    (1 to Similarity.JlDim).map(i => s"$a[$i]*$b[$i]")
      .mkString("(CAST(0.0 AS DOUBLE) + ", " + ", ")")

  private val knnJlOracle: String =
    s"""WITH pr AS (SELECT vec_id, ${jlProjSql("embedding")} AS p FROM embeddings),
       |n AS (SELECT vec_id, p, sqrt(${jlDotSql("p", "p")}) AS nr FROM pr),
       |s AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
       |             (${jlDotSql("q.p", "c.p")} / (q.nr * c.nr)) AS sim
       |      FROM n q JOIN n c ON c.vec_id != q.vec_id
       |      WHERE q.vec_id < 10)
       |SELECT qid, rank, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // ---- x122 embedding-index retraction oracle ------------------------------
  // Closed-form live vector index (the q08 last-write-wins composition
  // applied to x15's vector machinery): the update script is a
  // deterministic function of the base corpus — portable md5 bucket h4:
  // h4==1 re-arrives NEGATED in wave 1 (negation is a float sign-bit
  // flip, exact in both engines, and lands the vector in the complement
  // LSH bucket — the stale original would keep matching its own probe
  // forever under append-only); h4==3 takes an intermediate negated
  // update then REVERTS; h4==2 re-arrives null-embedding (deleted). The
  // probe set is two derived frames over the SAME base corpus: every
  // original vector at vec_id+1000000 and every negated vector at
  // vec_id+2000000, so each probe has cos == 1.0 with exactly the live
  // version (if any) of its source doc — original probes read keep=0
  // only where the original is live (h4 0/3), negated probes only where
  // the negated version is live (h4==1), and every probe of an h4==2
  // doc reads keep=1. Verdict semantics are embeddingDedupVerdicts'
  // (corpus match at any id, in-batch rival at smaller id); cosine and
  // bucket are the shared left-associated fragments.
  private val embRetractOracle: String =
    s"""WITH base AS (SELECT vec_id, embedding,
       |    ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
       |  FROM embeddings),
       |live AS (SELECT vec_id,
       |    CASE WHEN h4 = 1 THEN list_transform(embedding, x -> -x) ELSE embedding END AS e
       |  FROM base WHERE h4 <> 2),
       |lb AS MATERIALIZED (SELECT vec_id, e, ${bucketSql("e")} AS bucket,
       |       sqrt(${dotSql("e", "e")}) AS nr FROM live),
       |p AS (SELECT vec_id + 1000000 AS vec_id, embedding AS e FROM base
       |      UNION ALL
       |      SELECT vec_id + 2000000 AS vec_id, list_transform(embedding, x -> -x) AS e FROM base),
       |pb AS MATERIALIZED (SELECT vec_id, e, ${bucketSql("e")} AS bucket,
       |       sqrt(${dotSql("e", "e")}) AS nr FROM p),
       |cd AS (SELECT DISTINCT pb.vec_id FROM pb JOIN lb ON pb.bucket = lb.bucket
       |       WHERE (${dotSql("pb.e", "lb.e")} / (pb.nr * lb.nr)) >= 0.9),
       |rd AS (SELECT DISTINCT b.vec_id FROM pb a JOIN pb b
       |         ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |       WHERE (${dotSql("b.e", "a.e")} / (b.nr * a.nr)) >= 0.9)
       |SELECT pb.vec_id, CAST(pb.bucket AS INT) AS bucket,
       |  CAST(CASE WHEN cd.vec_id IS NOT NULL OR rd.vec_id IS NOT NULL
       |       THEN 0 ELSE 1 END AS INT) AS keep
       |FROM pb LEFT JOIN cd ON pb.vec_id = cd.vec_id
       |LEFT JOIN rd ON pb.vec_id = rd.vec_id
       |ORDER BY pb.vec_id""".stripMargin

  // ---- x126 fused embedding-dedup-stream oracle ----------------------------
  // One wave of embeddingDedupVerdicts in closed form (the embRetractOracle
  // fragments parameterized the incrementalDedupOracleOver way): `liveSql`
  // is the latest-version index BEFORE the wave, `batchSql` the wave's
  // non-null arrivals; corpus matches exclude the batch row's own vec_id
  // (excludeSelf — a doc's update probes an index still serving its own
  // previous version), in-batch rivals keep the smaller-id rule.
  private def embDedupWaveSql(liveSql: String, batchSql: String, wave: Int): String =
    s"""WITH lv AS ($liveSql),
       |lb AS MATERIALIZED (SELECT vec_id, e, ${bucketSql("e")} AS bucket,
       |       sqrt(${dotSql("e", "e")}) AS nr FROM lv),
       |bt AS ($batchSql),
       |pb AS MATERIALIZED (SELECT vec_id, e, ${bucketSql("e")} AS bucket,
       |       sqrt(${dotSql("e", "e")}) AS nr FROM bt),
       |cd AS (SELECT DISTINCT pb.vec_id FROM pb JOIN lb ON pb.bucket = lb.bucket
       |       WHERE lb.vec_id <> pb.vec_id
       |         AND (${dotSql("pb.e", "lb.e")} / (pb.nr * lb.nr)) >= 0.9),
       |rd AS (SELECT DISTINCT b.vec_id FROM pb a JOIN pb b
       |         ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |       WHERE (${dotSql("b.e", "a.e")} / (b.nr * a.nr)) >= 0.9)
       |SELECT CAST($wave AS BIGINT) AS wave, pb.vec_id, CAST(pb.bucket AS INT) AS bucket,
       |  CAST(CASE WHEN cd.vec_id IS NOT NULL OR rd.vec_id IS NOT NULL
       |       THEN 0 ELSE 1 END AS INT) AS keep
       |FROM pb LEFT JOIN cd ON pb.vec_id = cd.vec_id
       |LEFT JOIN rd ON pb.vec_id = rd.vec_id""".stripMargin

  // x126's oracle: the per-wave verdict replay (the x125 idiom in vector
  // space). Wave 1's h4==0 IDENTICAL re-arrival pins self-exclusion as
  // data (cos == 1 with its own live version — keep stays 1 ONLY because
  // same-id matches are excluded); wave 3's paired original/negated
  // probes pin the full update/retraction truth table against the live
  // index AFTER wave 2 (+1e6 originals convict only where the original
  // is live — h4 0 and the reverted 3; +2e6 negations only where the
  // negated version is live — h4 1; every h4==2 probe keeps: retraction
  // exonerated). Blind to the version log, the stamped appends, and
  // compaction.
  private val embDedupStreamOracle: String = {
    val baseE =
      """(SELECT vec_id, embedding,
        |   ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
        | FROM embeddings)""".stripMargin
    val negE = "list_transform(embedding, x -> -x)"
    val w0 = embDedupWaveSql(
      "SELECT vec_id, embedding AS e FROM embeddings WHERE FALSE",
      "SELECT vec_id, embedding AS e FROM embeddings", 0)
    val w1 = embDedupWaveSql(
      "SELECT vec_id, embedding AS e FROM embeddings",
      s"""SELECT vec_id, CASE WHEN h4 = 0 THEN embedding ELSE $negE END AS e
         |  FROM $baseE t WHERE h4 IN (0, 1, 3)""".stripMargin, 1)
    val w2 = embDedupWaveSql(
      s"SELECT vec_id, CASE WHEN h4 IN (1, 3) THEN $negE ELSE embedding END AS e FROM $baseE t",
      s"SELECT vec_id, embedding AS e FROM $baseE t WHERE h4 = 3", 2)
    val w3 = embDedupWaveSql(
      s"SELECT vec_id, CASE WHEN h4 = 1 THEN $negE ELSE embedding END AS e FROM $baseE t WHERE h4 <> 2",
      s"""SELECT vec_id + 1000000 AS vec_id, embedding AS e FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 2000000 AS vec_id, $negE AS e FROM embeddings""".stripMargin, 3)
    s"""SELECT * FROM (
       |SELECT * FROM ($w0) w0
       |UNION ALL
       |SELECT * FROM ($w1) w1
       |UNION ALL
       |SELECT * FROM ($w2) w2
       |UNION ALL
       |SELECT * FROM ($w3) w3
       |) u ORDER BY wave, vec_id""".stripMargin
  }

  // x127's oracle: per-wave CDC novelty replay — each wave is one
  // cdcIncrementalOracleOver instantiation whose relation unions the
  // LIVE latest-version corpus (is_corpus = true) with the wave's
  // non-null arrivals (is_corpus = false; doc_id may repeat across the
  // sides — self is INCLUDED, the content-store semantic). The x127
  // split keeps a THIRD of the corpus on an independent salt (all four
  // h4 classes stay populated; the portable md5-per-position chunker is
  // the cost driver, so the split IS the knob — 1/2 read ~10 s in-bench,
  // 1/3 reads proportionally less with identical semantics).
  private val cdcNoveltyStreamOracle: String = {
    val baseD =
      """(SELECT doc_id, text,
        |   ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
        | FROM documents
        | WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'x127'),1,15))::BIGINT % 3 = 0)""".stripMargin
    val w0 = cdcIncrementalOracleOver(
      s"(SELECT doc_id, text, FALSE AS is_corpus FROM $baseD t)", Some(0))
    val w1 = cdcIncrementalOracleOver(
      s"""(SELECT doc_id, text, TRUE AS is_corpus FROM $baseD t
         |  UNION ALL
         |  SELECT doc_id,
         |    CASE WHEN h4 = 1 THEN replace(text, 'e', '#') ELSE text || ' alpha' END AS text,
         |    FALSE AS is_corpus
         |  FROM $baseD t2 WHERE h4 IN (1, 3))""".stripMargin, Some(1))
    val w2 = cdcIncrementalOracleOver(
      s"""(SELECT doc_id,
         |    CASE WHEN h4 = 1 THEN replace(text, 'e', '#')
         |         WHEN h4 = 3 THEN text || ' alpha'
         |         ELSE text END AS text,
         |    TRUE AS is_corpus
         |  FROM $baseD t
         |  UNION ALL
         |  SELECT doc_id, text, FALSE AS is_corpus FROM $baseD t2 WHERE h4 = 3)""".stripMargin,
      Some(2))
    val w3 = cdcIncrementalOracleOver(
      s"""(SELECT doc_id,
         |    CASE WHEN h4 = 1 THEN replace(text, 'e', '#') ELSE text END AS text,
         |    TRUE AS is_corpus
         |  FROM $baseD t WHERE h4 <> 2
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text, FALSE AS is_corpus FROM $baseD t2)""".stripMargin,
      Some(3))
    s"""SELECT * FROM (
       |SELECT * FROM ($w0) w0
       |UNION ALL
       |SELECT * FROM ($w1) w1
       |UNION ALL
       |SELECT * FROM ($w2) w2
       |UNION ALL
       |SELECT * FROM ($w3) w3
       |) u ORDER BY wave, doc_id""".stripMargin
  }

  // x128's oracle: the PROVEN x14 IVF chain (bn/cent/assign/probes/s)
  // with the corpus CTE swapped for the latest-version live index —
  // cell structure stays pinned to the ORIGINAL corpus stride sample
  // (the serving posture: structure refresh is a rare offline event,
  // membership churn is continuous), assignment re-derived in closed
  // form over live vectors (assignment is a pure function of
  // (vector, centroids), so per-arrival assignment in the stream and
  // whole-corpus assignment here agree exactly), queries stay the
  // original probe vectors.
  private val ivfUpsertOracle: String = {
    val baseE =
      """(SELECT vec_id, embedding,
        |   ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
        | FROM embeddings)""".stripMargin
    s"""WITH base AS (SELECT * FROM $baseE t0),
       |live AS (SELECT vec_id,
       |    CASE WHEN h4 = 1 THEN list_transform(embedding, x -> -x) ELSE embedding END AS embedding
       |  FROM base WHERE h4 <> 2),
       |bn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM live),
       |cent AS MATERIALIZED (SELECT vec_id AS cell_id, embedding AS cv,
       |  sqrt(${dotSql("embedding", "embedding")}) AS cnr
       |  FROM embeddings WHERE vec_id % 62 = 0 AND vec_id < 992),
       |assign AS MATERIALIZED (SELECT vec_id, embedding, nr, cell_id FROM (
       |  SELECT e.vec_id, e.embedding, e.nr, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c) t WHERE rn = 1),
       |qn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM embeddings WHERE vec_id < 10),
       |probes AS (SELECT qid, cell_id FROM (
       |  SELECT e.vec_id AS qid, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM qn e, cent c) t WHERE rn <= 4),
       |s AS (SELECT p.qid, a.vec_id AS neighbor_id,
       |             (${dotSql("q.embedding", "a.embedding")} / (q.nr * a.nr)) AS sim
       |      FROM probes p JOIN assign a ON a.cell_id = p.cell_id
       |      JOIN qn q ON q.vec_id = p.qid
       |      WHERE a.vec_id != p.qid)
       |SELECT qid, rank, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  // x129's oracle: brute truth + TWO IVF chains (pinned vs refit cell
  // structure) over the same live corpus, joined into per-query recall
  // counts (the x78 recall-join tail). The arm builder is the x14 chain
  // parameterized by centroid relation and CTE tag; every float is the
  // shared left-associated fragments, every tie-break (csim DESC,
  // cell_id) / (sim DESC, neighbor_id) the proven x14/x06 rules.
  private val ivfDriftRecallOracle: String = {
    val baseE =
      """(SELECT vec_id, embedding,
        |   ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
        | FROM embeddings)""".stripMargin
    def ivfArm(centSql: String, tag: String): String =
      s"""cent_$tag AS MATERIALIZED ($centSql),
         |assign_$tag AS MATERIALIZED (SELECT vec_id, embedding, nr, cell_id FROM (
         |  SELECT e.vec_id, e.embedding, e.nr, c.cell_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
         |  FROM bn e, cent_$tag c) t WHERE rn = 1),
         |probes_$tag AS (SELECT qid, cell_id FROM (
         |  SELECT e.vec_id AS qid, c.cell_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
         |  FROM qn e, cent_$tag c) t WHERE rn <= 4),
         |s_$tag AS (SELECT p.qid, a.vec_id AS neighbor_id,
         |             (${dotSql("q.embedding", "a.embedding")} / (q.nr * a.nr)) AS sim
         |      FROM probes_$tag p JOIN assign_$tag a ON a.cell_id = p.cell_id
         |      JOIN qn q ON q.vec_id = p.qid
         |      WHERE a.vec_id != p.qid),
         |top_$tag AS (SELECT qid, neighbor_id FROM (
         |  SELECT qid, neighbor_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM s_$tag) t WHERE rank <= 5)""".stripMargin
    s"""WITH base AS (SELECT * FROM $baseE t0),
       |live AS (SELECT vec_id,
       |    CASE WHEN h4 = 1 THEN list_transform(embedding, x -> -x) ELSE embedding END AS embedding
       |  FROM base WHERE h4 <> 2),
       |bn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM live),
       |qn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM embeddings WHERE vec_id < 10),
       |brute AS (SELECT qid, neighbor_id FROM (
       |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY (${dotSql("q.embedding", "e.embedding")} / (q.nr * e.nr)) DESC, e.vec_id) AS rank
       |  FROM qn q JOIN bn e ON e.vec_id != q.vec_id) t WHERE rank <= 5),
       |${ivfArm(s"SELECT vec_id AS cell_id, embedding AS cv, sqrt(${dotSql("embedding", "embedding")}) AS cnr FROM embeddings WHERE vec_id % 62 = 0 AND vec_id < 992", "p")},
       |${ivfArm(s"SELECT vec_id AS cell_id, embedding AS cv, sqrt(${dotSql("embedding", "embedding")}) AS cnr FROM live WHERE vec_id % 62 = 0 AND vec_id < 992", "r")}
       |SELECT brute.qid, CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(count(tp.neighbor_id) AS BIGINT) AS n_hits_pinned,
       |  CAST(count(tp.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_bp_pinned,
       |  CAST(count(tr.neighbor_id) AS BIGINT) AS n_hits_refit,
       |  CAST(count(tr.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_bp_refit
       |FROM brute
       |LEFT JOIN top_p tp ON brute.qid = tp.qid AND brute.neighbor_id = tp.neighbor_id
       |LEFT JOIN top_r tr ON brute.qid = tr.qid AND brute.neighbor_id = tr.neighbor_id
       |GROUP BY brute.qid ORDER BY brute.qid""".stripMargin
  }

  // x130's oracle: the x14 chain with BOTH the corpus and the centroid
  // relation swapped for the latest-version live index — exactly x129's
  // refit arm, standalone. The refit-and-swap OPERATION on the standing
  // log (re-assign live rows, drop superseded versions, shrink the
  // version log) must be hash-invisible next to this closed form.
  private val ivfRefitOracle: String = {
    val baseE =
      """(SELECT vec_id, embedding,
        |   ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
        | FROM embeddings)""".stripMargin
    s"""WITH base AS (SELECT * FROM $baseE t0),
       |live AS (SELECT vec_id,
       |    CASE WHEN h4 = 1 THEN list_transform(embedding, x -> -x) ELSE embedding END AS embedding
       |  FROM base WHERE h4 <> 2),
       |bn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM live),
       |cent AS MATERIALIZED (SELECT vec_id AS cell_id, embedding AS cv,
       |  sqrt(${dotSql("embedding", "embedding")}) AS cnr
       |  FROM live WHERE vec_id % 62 = 0 AND vec_id < 992),
       |assign AS MATERIALIZED (SELECT vec_id, embedding, nr, cell_id FROM (
       |  SELECT e.vec_id, e.embedding, e.nr, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c) t WHERE rn = 1),
       |qn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM embeddings WHERE vec_id < 10),
       |probes AS (SELECT qid, cell_id FROM (
       |  SELECT e.vec_id AS qid, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM qn e, cent c) t WHERE rn <= 4),
       |s AS (SELECT p.qid, a.vec_id AS neighbor_id,
       |             (${dotSql("q.embedding", "a.embedding")} / (q.nr * a.nr)) AS sim
       |      FROM probes p JOIN assign a ON a.cell_id = p.cell_id
       |      JOIN qn q ON q.vec_id = p.qid
       |      WHERE a.vec_id != p.qid)
       |SELECT qid, rank, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  // x131's oracle: three assignment chains (fit-time snapshot, pinned
  // structure now, refit structure now) with the assigned cosine KEPT,
  // folded to per-cell exact-integer mass (count + SUM(floor(cs*1e6)) —
  // the kmeansInertia fixed-point idiom, so no float leaves the plan).
  // Each arm parameterizes corpus AND centroid relation; one UNION.
  private val ivfDriftGaugeOracle: String = {
    val baseE =
      """(SELECT vec_id, embedding,
        |   ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
        | FROM embeddings)""".stripMargin
    def arm(corpusN: String, centSql: String, tag: String, label: String): String =
      s"""cent_$tag AS MATERIALIZED ($centSql),
         |a_$tag AS (SELECT vec_id, cell_id, cs FROM (
         |  SELECT e.vec_id, c.cell_id,
         |         (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) AS cs,
         |         row_number() OVER (PARTITION BY e.vec_id
         |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
         |  FROM $corpusN e, cent_$tag c) t WHERE rn = 1),
         |g_$tag AS (SELECT '$label' AS arm, cell_id,
         |  CAST(count(*) AS BIGINT) AS n_live,
         |  CAST(SUM(CAST(floor(cs * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_csim_micro
         |  FROM a_$tag GROUP BY cell_id)""".stripMargin
    val pinnedCent = s"SELECT vec_id AS cell_id, embedding AS cv, sqrt(${dotSql("embedding", "embedding")}) AS cnr FROM embeddings WHERE vec_id % 62 = 0 AND vec_id < 992"
    s"""WITH base AS (SELECT * FROM $baseE t0),
       |live AS (SELECT vec_id,
       |    CASE WHEN h4 = 1 THEN list_transform(embedding, x -> -x) ELSE embedding END AS embedding
       |  FROM base WHERE h4 <> 2),
       |bn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM live),
       |fn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM embeddings),
       |${arm("fn", pinnedCent, "f", "fit")},
       |${arm("bn", pinnedCent, "p", "pinned")},
       |${arm("bn", s"SELECT vec_id AS cell_id, embedding AS cv, sqrt(${dotSql("embedding", "embedding")}) AS cnr FROM live WHERE vec_id % 62 = 0 AND vec_id < 992", "r", "refit")}
       |SELECT * FROM g_f UNION ALL SELECT * FROM g_p UNION ALL SELECT * FROM g_r
       |ORDER BY arm, cell_id""".stripMargin
  }

  // x140's oracle: the gauge-triggered refit policy's whole history in
  // closed form. Corpus states l0..l3 are the wave script's live
  // corpora; occupancy arms are rn=1 assignment chains (the proven
  // x128/x131 argmax with the csim DESC, cell_id tie-break) GROUPed to
  // per-cell counts; the gauge is pure BIGINT total-variation
  // arithmetic (no float ever enters it); fired bits are computed
  // (tv > threshold), not baked in — if the engine fired on a
  // different wave its stored assignments, gauge rows, and serve
  // candidates all diverge and the hash catches it. The serve tail is
  // x129's recall join over the final corpus vs the refit structure.
  private val ivfPolicyOracle: String = {
    val baseE =
      """(SELECT vec_id, embedding,
        |   ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
        | FROM embeddings)""".stripMargin
    // indexed lambda, not list_resize: DuckDB 1.0.0's list_resize dies
    // with std::bad_array_new_length on table-sourced lists
    val ax = "list_transform(embedding, (x,i) -> CASE WHEN i = 1 THEN x ELSE CAST(0 AS FLOAT) END)"
    def bnCte(tag: String, corpus: String) =
      s"""bn_$tag AS MATERIALIZED (SELECT vec_id, embedding,
         |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM $corpus)""".stripMargin
    def centCte(tag: String, rel: String) =
      s"""cent_$tag AS MATERIALIZED (SELECT vec_id AS cell_id, embedding AS cv,
         |  sqrt(${dotSql("embedding", "embedding")}) AS cnr
         |  FROM $rel WHERE vec_id % 62 = 0 AND vec_id < 992)""".stripMargin
    // MATERIALIZED occupancy/total/gauge CTEs composed via single-row
    // CROSS JOINs — scalar subqueries inside the aggregates sent DuckDB
    // 1.0.0 into a bad-allocation death spiral once the full 10-view
    // catalog was registered (plan-shape dependent; the x129/x131
    // materialized-CTE idiom never hits it)
    def occCte(tag: String, corpusTag: String, centTag: String) =
      s"""o_$tag AS MATERIALIZED (SELECT cell_id, CAST(count(*) AS BIGINT) AS n FROM (
         |  SELECT e.vec_id, c.cell_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
         |  FROM bn_$corpusTag e, cent_$centTag c) t WHERE rn = 1 GROUP BY cell_id),
         |t_$tag AS MATERIALIZED (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM o_$tag)""".stripMargin
    def tvCte(tag: String, nowTag: String, fitTag: String) =
      s"""g_$tag AS MATERIALIZED (
         |  SELECT CAST(SUM(ABS(COALESCE(nw.n,0)*tf.tot - COALESCE(ft.n,0)*tn.tot)) * 10000
         |    // (2*tn.tot*tf.tot) AS BIGINT) AS tv
         |  FROM o_$nowTag nw FULL JOIN o_$fitTag ft USING (cell_id)
         |  CROSS JOIN t_$nowTag tn CROSS JOIN t_$fitTag tf
         |  GROUP BY tn.tot, tf.tot)""".stripMargin
    s"""WITH base AS (SELECT * FROM $baseE t0),
       |l1 AS (SELECT vec_id, CASE WHEN h4 = 3 THEN $ax ELSE embedding END AS embedding FROM base),
       |l2 AS (SELECT vec_id, CASE WHEN h4 IN (1,3) THEN $ax ELSE embedding END AS embedding
       |       FROM base WHERE h4 <> 2),
       |l3 AS (SELECT vec_id, CASE WHEN h4 IN (1,3) THEN $ax ELSE embedding END AS embedding FROM base),
       |${bnCte("0", "embeddings")},
       |${bnCte("1", "l1")},
       |${bnCte("2", "l2")},
       |${bnCte("3", "l3")},
       |${centCte("p", "embeddings")},
       |${centCte("r", "l2")},
       |${occCte("0", "0", "p")},
       |${occCte("1", "1", "p")},
       |${occCte("2", "2", "p")},
       |${occCte("2r", "2", "r")},
       |${occCte("3", "3", "r")},
       |${tvCte("1", "1", "0")},
       |${tvCte("2", "2", "0")},
       |${tvCte("3", "3", "2r")},
       |qn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM embeddings WHERE vec_id < 10),
       |brute AS (SELECT qid, neighbor_id FROM (
       |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY (${dotSql("q.embedding", "e.embedding")} / (q.nr * e.nr)) DESC, e.vec_id) AS rank
       |  FROM qn q JOIN bn_3 e ON e.vec_id != q.vec_id) t WHERE rank <= 5),
       |a_3 AS MATERIALIZED (SELECT vec_id, embedding, nr, cell_id FROM (
       |  SELECT e.vec_id, e.embedding, e.nr, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn_3 e, cent_r c) t WHERE rn = 1),
       |probes AS (SELECT qid, cell_id FROM (
       |  SELECT e.vec_id AS qid, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM qn e, cent_r c) t WHERE rn <= 4),
       |sct AS (SELECT p.qid, a.vec_id AS neighbor_id,
       |             (${dotSql("q.embedding", "a.embedding")} / (q.nr * a.nr)) AS sim
       |      FROM probes p JOIN a_3 a ON a.cell_id = p.cell_id
       |      JOIN qn q ON q.vec_id = p.qid
       |      WHERE a.vec_id != p.qid),
       |top_r AS (SELECT qid, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM sct) t WHERE rank <= 5),
       |serve AS (SELECT 'serve' AS section, brute.qid AS k,
       |  CAST(count(*) AS BIGINT) AS a,
       |  CAST(count(tp.neighbor_id) AS BIGINT) AS b,
       |  CAST(count(tp.neighbor_id) * 10000 // count(*) AS BIGINT) AS c
       |  FROM brute LEFT JOIN top_r tp
       |    ON brute.qid = tp.qid AND brute.neighbor_id = tp.neighbor_id
       |  GROUP BY brute.qid)
       |SELECT section, k, a, b, c FROM (
       |  SELECT 'gauge' AS section, CAST(0 AS BIGINT) AS k, tn.tot AS a,
       |         CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c FROM t_0 tn
       |  UNION ALL SELECT 'gauge', CAST(1 AS BIGINT), tn.tot, g.tv,
       |    CAST(CASE WHEN g.tv > 3000 THEN 1 ELSE 0 END AS BIGINT)
       |    FROM t_1 tn CROSS JOIN g_1 g
       |  UNION ALL SELECT 'gauge', CAST(2 AS BIGINT), tn.tot, g.tv,
       |    CAST(CASE WHEN g.tv > 3000 THEN 1 ELSE 0 END AS BIGINT)
       |    FROM t_2 tn CROSS JOIN g_2 g
       |  UNION ALL SELECT 'gauge', CAST(3 AS BIGINT), tn.tot, g.tv,
       |    CAST(CASE WHEN g.tv > 3000 THEN 1 ELSE 0 END AS BIGINT)
       |    FROM t_3 tn CROSS JOIN g_3 g
       |  UNION ALL SELECT * FROM serve) u
       |ORDER BY section, k""".stripMargin
  }

  // ---- MMR re-rank oracle (x103) ------------------------------------------
  // The greedy loop unrolled to k CTE steps over the same generated-SQL
  // cosines (norm precompute per row — the x88 bitwise-neutral trick), so
  // every score comparison is between bit-identical doubles.
  private def mmrOracle: String = {
    val (sl, k) = (8, 4)
    def cos(a: String, b: String) =
      s"(${dotSql(s"$a.embedding", s"$b.embedding")} / ($a.nr * $b.nr))"
    val steps = (2 to k).map { t =>
      s"""s$t AS (SELECT qid, neighbor_id, $t AS mmr_rank FROM (
         |  SELECT c.qid, c.neighbor_id,
         |    row_number() OVER (PARTITION BY c.qid
         |      ORDER BY 0.5*c.rel - 0.5*m.ms DESC, c.neighbor_id) AS rr
         |  FROM cand c
         |  JOIN (SELECT p.qid, p.a_id, max(p.s) AS ms FROM pr p
         |        JOIN acc${t - 1} x ON p.qid = x.qid AND p.b_id = x.neighbor_id
         |        GROUP BY p.qid, p.a_id) m
         |    ON m.qid = c.qid AND m.a_id = c.neighbor_id
         |  WHERE NOT EXISTS (SELECT 1 FROM acc${t - 1} z
         |                    WHERE z.qid = c.qid AND z.neighbor_id = c.neighbor_id)) t
         |  WHERE rr = 1),
         |acc$t AS (SELECT * FROM acc${t - 1} UNION ALL SELECT * FROM s$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH bn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM embeddings),
       |cand AS MATERIALIZED (
       |  SELECT qid, neighbor_id, rel FROM (
       |    SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
       |           ${cos("q", "e")} AS rel,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${cos("q", "e")} DESC, e.vec_id) AS rn
       |    FROM bn q JOIN bn e ON e.vec_id != q.vec_id
       |    WHERE q.vec_id < 10) t
       |  WHERE rn <= $sl),
       |pr AS MATERIALIZED (
       |  SELECT a.qid, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
       |         ${cos("ea", "eb")} AS s
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.neighbor_id != b.neighbor_id
       |  JOIN bn ea ON ea.vec_id = a.neighbor_id
       |  JOIN bn eb ON eb.vec_id = b.neighbor_id),
       |s1 AS (SELECT qid, neighbor_id, 1 AS mmr_rank FROM (
       |  SELECT qid, neighbor_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY rel DESC, neighbor_id) AS rr
       |  FROM cand) t WHERE rr = 1),
       |acc1 AS (SELECT * FROM s1),
       |$steps
       |SELECT qid, CAST(mmr_rank AS INT) AS mmr_rank, neighbor_id FROM acc$k""".stripMargin
  }

  // ---- weak-label classifier oracle (x102) --------------------------------
  // Leibniz expansion of the 4x4 Cramer determinants over the aggregated
  // HUGEINT normal-equation cells — the same integers LinearModel collects,
  // so driver-side BigInt Cramer and this SQL agree exactly.
  // the classifier family's shared design (x102/x104/x105/x134): integer
  // per-doc features + the even-source proxy label, mirrored cell for
  // cell in the f CTE of the generated oracle below. private[graft]:
  // ClassifierRetractStreamSpec asserts against the SAME definition the
  // oracle is generated from (round-13 self-review — a spec-local copy
  // could drift and stay green)
  private[graft] def classifierFeatures: Seq[org.apache.spark.sql.Column] = {
    val words = split(col("text"), " ")
    Seq(size(words).cast("long"),
      size(array_distinct(words)).cast("long"),
      size(filter(words, w => w.isin("the", "a", "data"))).cast("long"))
  }
  private[graft] def classifierWeakLabel: org.apache.spark.sql.Column =
    expr("cast(substring(source, 4) as int) % 2 = 0")

  // returns (per-doc decision SQL — x102/x104/x134, per-source audit SQL
  // — x105), generated over any corpus relation with (doc_id, source,
  // text) — x134 instantiates it over the latest-version corpus
  private def classifierOraclesOver(rel: String): (String, String) = {
    val d = 4
    def cell(i: Int, j: Int) = s"a${math.min(i, j)}_${math.max(i, j)}"
    def detSql(col: Int => (Int => String)): String =
      (0 until d).permutations.map { p =>
        val sign = {
          var inv = 0
          for (i <- 0 until d; j <- i + 1 until d if p(i) > p(j)) inv += 1
          if (inv % 2 == 0) "+" else "-"
        }
        sign + (0 until d).map(i => col(i)(p(i))).mkString("*")
      }.mkString("(", " ", ")")
    val dd = detSql(i => j => cell(i, j))
    val dk = (0 until d).map(k =>
      detSql(i => j => if (j == k) s"b$i" else cell(i, j)))
    val gramCells = (for (i <- 0 until d; j <- i until d)
      yield s"CAST(sum(x$i*x$j) AS HUGEINT) AS a${i}_$j").mkString(",\n  ")
    val bCells = (0 until d).map(i =>
      s"CAST(sum(x$i*y) AS HUGEINT) AS b$i").mkString(",\n  ")
    val margin = s"2*(${(0 until d).map(i => s"d.d$i*f.x$i").mkString(" + ")}) - d.dd"
    val ctes =
      s"""WITH f AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CAST(CASE WHEN CAST(substr(source,4) AS INT) % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS y,
         |    CAST(1 AS BIGINT) AS x0,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS x1,
         |    CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS x2,
         |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['the','a','data'], t))) AS BIGINT) AS x3
         |  FROM $rel),
         |g AS (SELECT
         |  $gramCells,
         |  $bCells
         |  FROM f),
         |d AS (SELECT $dd AS dd,
         |  ${dk.zipWithIndex.map { case (s, k) => s"$s AS d$k" }.mkString(",\n  ")}
         |  FROM g),
         |scored AS (SELECT f.doc_id, f.source, CAST(f.y AS INT) AS y,
         |  CAST(CASE WHEN $margin >= 0 THEN 1 ELSE 0 END AS INT) AS yhat,
         |  CAST(CASE WHEN $margin > 0 THEN 1 WHEN $margin < 0 THEN -1 ELSE 0 END AS INT) AS margin_sign
         |FROM f, d)""".stripMargin
    (s"""$ctes
        |SELECT doc_id, y, yhat, margin_sign FROM scored""".stripMargin,
     s"""$ctes
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(y) AS BIGINT) AS positives,
        |  CAST(sum(yhat) AS BIGINT) AS kept,
        |  CAST(sum(y*yhat) AS BIGINT) AS tp,
        |  CAST(sum((1-y)*yhat) AS BIGINT) AS fp,
        |  CAST(sum(y*(1-yhat)) AS BIGINT) AS fn
        |FROM scored GROUP BY source""".stripMargin)
  }

  private lazy val (x102Oracle: String, x105Oracle: String) =
    classifierOraclesOver("documents")

  // x134: the classifier fit over x117's latest-version corpus in closed
  // form (the bm25UpsertOracle relation, with `source` carried through
  // for the label)
  private lazy val x134Oracle: String = classifierOraclesOver(
    """(SELECT doc_id, source,
      |        CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text END AS text
      |   FROM (SELECT doc_id, source, text,
      |           ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
      |         FROM documents) t
      |   WHERE h4 <> 2)""".stripMargin)._1

  // x138: the same generated SQL over the WAVE-1 snapshot corpus in
  // closed form (h4==1 doubled, h4==3 '+alpha', h4==2 still original —
  // its deletion lands only in wave 2)
  private lazy val x138Oracle: String = classifierOraclesOver(
    """(SELECT doc_id, source,
      |        CASE WHEN h4 = 1 THEN text || ' ' || text
      |             WHEN h4 = 3 THEN text || ' alpha'
      |             ELSE text END AS text
      |   FROM (SELECT doc_id, source, text,
      |           ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
      |         FROM documents) t)""".stripMargin)._1

  private val knnLshOracle: String =
    s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
       |s AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor_id, q.bucket AS bucket,
       |             ${cosSql("q.embedding", "c.embedding")} AS sim
       |      FROM b q JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
       |      WHERE q.vec_id < 10)
       |SELECT qid, rank, neighbor_id, bucket FROM (
       |  SELECT qid, neighbor_id, bucket,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // bn-style norm precompute + MATERIALIZED shared frames (see the x88
  // resource note): sim values are bitwise-unchanged, DuckDB stops
  // re-deriving norms per candidate pair and re-inlining `b` per arm.
  private val knnLshMultiProbeOracle: String = {
    val probeArms = (s"SELECT qid, qv, qnr, bucket0 AS bucket FROM q0" +:
      (0 until Planes).map(p =>
        s"SELECT qid, qv, qnr, xor(bucket0, ${1 << p}) AS bucket FROM q0"))
      .mkString("\n  UNION ALL ")
    s"""WITH b AS MATERIALIZED (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket,
       |       sqrt(${dotSql("embedding", "embedding")}) AS nr FROM embeddings),
       |q0 AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qv, nr AS qnr, bucket AS bucket0
       |      FROM b WHERE vec_id < 10),
       |probes AS (
       |  $probeArms),
       |s AS (SELECT probes.qid, c.vec_id AS neighbor_id,
       |             (${dotSql("probes.qv", "c.embedding")} / (probes.qnr * c.nr)) AS sim
       |      FROM b c JOIN probes ON c.bucket = probes.bucket AND c.vec_id != probes.qid)
       |SELECT qid, rank, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }

  // x78: brute top-5 and multi-probe top-5 CTE-composed, then the
  // per-query overlap — recall@k as an exact-integer row set.
  // bn-style norm precompute + MATERIALIZED shared frames (see the x88
  // resource note); sims bitwise-unchanged.
  private val annRecallOracle: String = {
    val probeArms = (s"SELECT qid, qv, qnr, bucket0 AS bucket FROM q0" +:
      (0 until Planes).map(p =>
        s"SELECT qid, qv, qnr, xor(bucket0, ${1 << p}) AS bucket FROM q0"))
      .mkString("\n  UNION ALL ")
    s"""WITH b AS MATERIALIZED (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket,
       |       sqrt(${dotSql("embedding", "embedding")}) AS nr FROM embeddings),
       |brute AS (SELECT qid, neighbor_id FROM (
       |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY (${dotSql("q.embedding", "e.embedding")} / (q.nr * e.nr)) DESC, e.vec_id) AS rank
       |  FROM b q JOIN b e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id < 10) t WHERE rank <= 5),
       |q0 AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qv, nr AS qnr, bucket AS bucket0
       |      FROM b WHERE vec_id < 10),
       |probes AS (
       |  $probeArms),
       |s AS (SELECT probes.qid, c.vec_id AS neighbor_id,
       |             (${dotSql("probes.qv", "c.embedding")} / (probes.qnr * c.nr)) AS sim
       |      FROM b c JOIN probes ON c.bucket = probes.bucket AND c.vec_id != probes.qid),
       |lsh AS (SELECT qid, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t WHERE rank <= 5)
       |SELECT brute.qid, CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(count(lsh.neighbor_id) AS BIGINT) AS n_hits,
       |  CAST(count(lsh.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_bp
       |FROM brute LEFT JOIN lsh ON brute.qid = lsh.qid AND brute.neighbor_id = lsh.neighbor_id
       |GROUP BY brute.qid ORDER BY brute.qid""".stripMargin
  }


  // strideCentroids(emb, 16): stride = max(1, 1000/16) = 62 over vec_id,
  // capped to the first 16 stride hits by id (62*16 = 992) — the cap
  // matters once the corpus exceeds 992 ids (sf0.1 has 2000)
  /** x88: the x14 IVF CTEs and the x39 PQ-reconstruction CTEs composed
    * into one search — probe 4 cells, ADC-score candidates against the
    * reconstruction, shortlist 12 by (approx sim desc, id), exact
    * re-rank to top 5. Both halves replay the engine's exact arithmetic
    * (left-to-right double accumulation, min-distance ties to the
    * smallest code / smallest id), so every float comparison lands
    * identically cross-engine.
    */
  // lazy: declared above pqCtes/PqM in file order, so an eager val would
  // read their defaults (null/0) during object init
  private lazy val knnIvfPqOracle: String =
    s"""$knnIvfPqCtes
       |SELECT qid, rank, neighbor_id FROM ivfpq ORDER BY qid, rank""".stripMargin

  /** x89: x78's recall-as-data pattern applied to the IVF-PQ path,
    * upgraded to a LOSS DECOMPOSITION — per query, brute-force top-5
    * recovery by (a) IVF with EXACT in-cell scoring (only cell-pruning
    * loss) and (b) the full IVF-PQ ladder (pruning + quantization
    * displacement), so the two loss sources separate as data. The `ivf`
    * CTE reuses the composed assign/probes relations with exact cosine
    * — the x14 search inside the x88 CTE stack.
    */
  private lazy val ivfPqRecallOracle: String = ivfPqRecallSqlFor(knnIvfPqCtes)

  /** x92: the x89 loss decomposition over the DERIVED clustered corpus
    * ([[graft.ext.Similarity.clusteredCorpus]]) at IDENTICAL index
    * parameters — the evidence row the uniform-corpus x89 undersells:
    * when the data has the cluster structure real embedding corpora
    * have (and the cell anchors cover it), the cell-pruning loss
    * column collapses. The `cl` CTE replays the Spark derivation
    * exactly: centers are raw corpus rows joined by
    * `(vec_id % 13) * 62`, per-element
    * `CAST(center AS DOUBLE) + 0.3 * CAST(e AS DOUBLE)`.
    */
  private lazy val clusteredRecallOracle: String = {
    val arr = (1 to Dim).map(i =>
      s"CAST(c.embedding[$i] AS DOUBLE) + 0.3 * CAST(e.embedding[$i] AS DOUBLE)")
      .mkString("[", ", ", "]")
    ivfPqRecallSqlFor(
      s"""WITH cl AS MATERIALIZED (SELECT e.vec_id, $arr AS embedding
         |  FROM embeddings e JOIN embeddings c ON c.vec_id = (e.vec_id % 13) * 38),
         |${knnIvfPqCtesFor("cl")}""".stripMargin)
  }

  /** x114: init-vs-Lloyd-fitted residual codebooks on the ANISOTROPIC
    * structured corpus ([[graft.ext.Similarity.structuredCorpus]]) —
    * the oracle replays the ENTIRE fitted path bit-exactly: the corpus
    * derivation (two anchor joins, fused per-element expression), the
    * x88 IVF/residual stack, the init codebook, TWO Lloyd iterations
    * per subspace (argmin assignment with (d2 ASC, code ASC) ties,
    * `floor(x·10⁶)` integer dim-sums, one double division per mean,
    * empty-code retention via LEFT JOIN), then BOTH IVF-PQ ladders
    * (encode → reconstruct → shortlist 12 → exact re-rank) and the
    * per-query recall table against brute truth. Codebooks here are
    * per-subspace 8-dim `cw` arrays (the Lloyd state) instead of the
    * x88 stack's full-64-dim `r` rows — same values, indexable per
    * subspace as the fit evolves them independently.
    */
  // ---- shared builders for the structured-corpus fitted-codebook
  // oracle stack (x114 and x118 compose from these; defs, not vals, so
  // object-init order vs PqM/PqSubDim/Dim never bites) -----------------

  private def pqOff(j: Int) = j * PqSubDim

  // d2 of res row e's subspace-j slice against codebook row c (8-dim cw)
  private def pqD2ArmsCw(cb: String, out: String): String = {
    val arms = (0 until PqM).map { j =>
      val d2 = (1 to PqSubDim).map { i =>
        s"((e.r[${pqOff(j) + i}] - c.cw[$i]) * (e.r[${pqOff(j) + i}] - c.cw[$i]))"
      }.mkString("(CAST(0.0 AS DOUBLE) + ", " + ", ")")
      s"SELECT e.vec_id, $j AS subspace, c.code, $d2 AS d2 FROM res e, $cb c WHERE c.subspace = $j"
    }.mkString("\n  UNION ALL ")
    s"""$out AS (
       |  $arms)""".stripMargin
  }

  private def pqBestOf(in: String, out: String): String =
    s"""$out AS (SELECT vec_id, subspace, code FROM (
       |  SELECT vec_id, subspace, code,
       |         row_number() OVER (PARTITION BY vec_id, subspace ORDER BY d2 ASC, code ASC) AS rn
       |  FROM $in) t WHERE rn = 1)""".stripMargin

  // one Lloyd step: assignment from cbPrev, integer dim-sums, means
  // with empty-code retention
  private def pqLloydStep(t: Int): String = {
    val sums = (1 to PqSubDim).map(i => s"s$i")
    val mnArms = (0 until PqM).map { j =>
      val ss = (1 to PqSubDim).map(i =>
        s"SUM(CAST(floor(e.r[${pqOff(j) + i}] * 1000000) AS BIGINT)) AS s$i").mkString(", ")
      s"SELECT $j AS subspace, b.code, COUNT(*) AS n, $ss FROM bst$t b JOIN res e ON e.vec_id = b.vec_id WHERE b.subspace = $j GROUP BY b.code"
    }.mkString("\n  UNION ALL ")
    val meanArr = sums.map(sI =>
      s"CAST(m.$sI AS DOUBLE) / CAST(m.n * 1000000 AS DOUBLE)").mkString("[", ", ", "]")
    s"""${pqD2ArmsCw(s"cb${t - 1}", s"asg$t")},
       |${pqBestOf(s"asg$t", s"bst$t")},
       |mn$t AS (
       |  $mnArms),
       |cb$t AS MATERIALIZED (SELECT p.subspace, p.code,
       |  CASE WHEN m.n IS NULL THEN p.cw ELSE $meanArr END AS cw
       |  FROM cb${t - 1} p LEFT JOIN mn$t m ON m.subspace = p.subspace AND m.code = p.code)""".stripMargin
  }

  // one IVF-PQ ladder (encode with `cb` → reconstruct → shortlist
  // `bound` → exact top-5) under suffix `sfx`
  private def pqLadderCw(cb: String, sfx: String, bound: String = "12"): String = {
    val wideCols = (0 until PqM).map(j =>
      s"MAX(CASE WHEN subspace = $j THEN code END) AS c$j").mkString(",\n  ")
    val reconList = (1 to Dim).map { i =>
      val j = (i - 1) / PqSubDim
      s"CAST(ct.cv[$i] AS DOUBLE) + c$j.cw[${i - pqOff(j)}]"
    }.mkString("[", ", ", "]")
    val reconJoins = (0 until PqM).map(j =>
      s"JOIN $cb c$j ON c$j.subspace = $j AND c$j.code = w.c$j").mkString("\n  ")
    s"""${pqD2ArmsCw(cb, s"enc$sfx")},
       |${pqBestOf(s"enc$sfx", s"bste$sfx")},
       |wide$sfx AS MATERIALIZED (SELECT vec_id,
       |  $wideCols
       |  FROM bste$sfx GROUP BY vec_id),
       |recon$sfx AS MATERIALIZED (
       |  SELECT w.vec_id, $reconList AS emb
       |  FROM wide$sfx w
       |  JOIN assign a ON a.vec_id = w.vec_id
       |  JOIN cent ct ON ct.cell_id = a.cell_id
       |  $reconJoins),
       |reconn$sfx AS MATERIALIZED (SELECT vec_id, emb,
       |  sqrt(${dotSql("emb", "emb")}) AS nr FROM recon$sfx),
       |cand$sfx AS (SELECT p.qid, a.vec_id AS neighbor_id,
       |                (${dotSql("q.embedding", "r.emb")} / (q.nr * r.nr)) AS approx_sim
       |         FROM probes p
       |         JOIN assign a ON a.cell_id = p.cell_id
       |         JOIN reconn$sfx r ON r.vec_id = a.vec_id
       |         JOIN bn q ON q.vec_id = p.qid
       |         WHERE a.vec_id != p.qid),
       |short$sfx AS (SELECT qid, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY approx_sim DESC, neighbor_id) AS rn
       |  FROM cand$sfx) t WHERE rn <= $bound),
       |sx$sfx AS (SELECT sh.qid, sh.neighbor_id,
       |             (${dotSql("q.embedding", "n.embedding")} / (q.nr * n.nr)) AS sim
       |      FROM short$sfx sh
       |      JOIN bn q ON q.vec_id = sh.qid
       |      JOIN bn n ON n.vec_id = sh.neighbor_id),
       |ivfpq$sfx AS (SELECT qid, rank, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM sx$sfx) t
       |WHERE rank <= 5)""".stripMargin
  }

  /** The shared x114/x118 CTE prefix: structured-corpus derivation
    * (c + ((0.3 · s) ⊙ e) per element, left-associated exactly like the
    * nested zip_with), IVF stack, residuals, init codebook slicing, two
    * Lloyd steps (cb0 → cb2).
    */
  private def structuredFittedPrefix: String = {
    val clArr = (1 to Dim).map(i =>
      s"CAST(c.embedding[$i] AS DOUBLE) + (0.3 * CAST(s.embedding[$i] AS DOUBLE) * CAST(e.embedding[$i] AS DOUBLE))")
      .mkString("[", ", ", "]")
    val resList = (1 to Dim).map(i =>
      s"CAST(e.embedding[$i] AS DOUBLE) - CAST(ct.cv[$i] AS DOUBLE)")
      .mkString("[", ", ", "]")
    val cb0Arms = (0 until PqM).map { j =>
      val slice = (1 to PqSubDim).map(i => s"r[${pqOff(j) + i}]").mkString("[", ", ", "]")
      s"SELECT $j AS subspace, code, $slice AS cw FROM rcb"
    }.mkString("\n  UNION ALL ")
    s"""WITH cl AS MATERIALIZED (SELECT e.vec_id, $clArr AS embedding
       |  FROM embeddings e
       |  JOIN embeddings c ON c.vec_id = (e.vec_id % 13) * 38
       |  JOIN embeddings s ON s.vec_id = 7),
       |bn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM cl),
       |cent AS MATERIALIZED (SELECT vec_id AS cell_id, embedding AS cv, nr AS cnr
       |         FROM bn WHERE vec_id % 62 = 0 AND vec_id < 992),
       |assign AS MATERIALIZED (SELECT vec_id, cell_id FROM (
       |  SELECT e.vec_id, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c) t WHERE rn = 1),
       |probes AS MATERIALIZED (SELECT qid, cell_id FROM (
       |  SELECT e.vec_id AS qid, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c WHERE e.vec_id < 10) t WHERE rn <= 4),
       |res AS MATERIALIZED (SELECT e.vec_id, a.cell_id, $resList AS r
       |  FROM cl e
       |  JOIN assign a ON a.vec_id = e.vec_id
       |  JOIN cent ct ON ct.cell_id = a.cell_id),
       |rcb AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code, r
       |  FROM res WHERE vec_id % 62 = 31 AND vec_id < 1023),
       |cb0 AS MATERIALIZED (
       |  $cb0Arms),
       |${pqLloydStep(1)},
       |${pqLloydStep(2)}""".stripMargin
  }

  private def structuredBruteCte: String =
    s"""brute AS (SELECT qid, neighbor_id FROM (
       |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY (${dotSql("q.embedding", "e.embedding")} / (q.nr * e.nr)) DESC, e.vec_id) AS rank
       |  FROM bn q JOIN bn e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id < 10) t WHERE rank <= 5)""".stripMargin

  private lazy val fittedRecallOracle: String =
    s"""$structuredFittedPrefix,
       |${pqLadderCw("cb0", "i")},
       |${pqLadderCw("cb2", "f")},
       |$structuredBruteCte
       |SELECT brute.qid, CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(count(i.neighbor_id) AS BIGINT) AS hits_init,
       |  CAST(count(i.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_init_bp,
       |  CAST(count(f.neighbor_id) AS BIGINT) AS hits_fit,
       |  CAST(count(f.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_fit_bp
       |FROM brute
       |LEFT JOIN ivfpqi i ON brute.qid = i.qid AND brute.neighbor_id = i.neighbor_id
       |LEFT JOIN ivfpqf f ON brute.qid = f.qid AND brute.neighbor_id = f.neighbor_id
       |GROUP BY brute.qid ORDER BY brute.qid""".stripMargin

  /** x118: the composed PRODUCTION configuration — fitted codebooks
    * (the x114 winner on anisotropic structure) searched at the
    * occupancy-derived shortlist (the x115 auto sizing), one ladder,
    * recall vs brute truth, `sl_auto` riding along so both knobs are
    * hash-pinned in one row set.
    */
  private lazy val productionLadderOracle: String =
    s"""$structuredFittedPrefix,
       |autosl AS (SELECT GREATEST(10, CAST(ceil(0.25 * 4 * avg(n)) AS BIGINT)) AS sl
       |  FROM (SELECT count(*) AS n FROM assign GROUP BY cell_id) t),
       |${pqLadderCw("cb2", "f", "(SELECT sl FROM autosl)")},
       |$structuredBruteCte
       |SELECT brute.qid, CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(count(f.neighbor_id) AS BIGINT) AS n_hits,
       |  CAST(count(f.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_bp,
       |  (SELECT CAST(sl AS BIGINT) FROM autosl) AS sl_auto
       |FROM brute
       |LEFT JOIN ivfpqf f ON brute.qid = f.qid AND brute.neighbor_id = f.neighbor_id
       |GROUP BY brute.qid ORDER BY brute.qid""".stripMargin

  /** x115: the fixed-shortlist scale trap as data — ONE candidate
    * chain (the x92 clustered corpus + init residual codebooks), TWO
    * shortlist cuts: the registered fixed 12 and the occupancy-derived
    * `GREATEST(2k, ceil(frac·nprobe·mean cell occupancy))`, computed in
    * SQL from the same assignment the search probes (the twin of
    * [[graft.ext.Similarity.occupancyShortlist]]'s 1-row aggregate).
    * The derived size rides along as `sl_auto`, so the hash pins the
    * sizing formula itself, not just the recall it buys.
    */
  private lazy val shortlistTrapOracle: String = {
    val clArr = (1 to Dim).map(i =>
      s"CAST(c.embedding[$i] AS DOUBLE) + 0.3 * CAST(e.embedding[$i] AS DOUBLE)")
      .mkString("[", ", ", "]")
    val resList = (1 to Dim).map(i =>
      s"CAST(e.embedding[$i] AS DOUBLE) - CAST(ct.cv[$i] AS DOUBLE)")
      .mkString("[", ", ", "]")
    def d2Sql(j: Int): String =
      (1 to PqSubDim).map { i =>
        val idx = j * PqSubDim + i
        s"((e.r[$idx] - c.r[$idx]) * (e.r[$idx] - c.r[$idx]))"
      }.mkString("(CAST(0.0 AS DOUBLE) + ", " + ", ")")
    val arms = (0 until PqM).map(j =>
      s"SELECT e.vec_id, $j AS subspace, c.code, ${d2Sql(j)} AS d2 FROM res e, rcb c")
      .mkString("\n  UNION ALL ")
    val wideCols = (0 until PqM).map(j =>
      s"MAX(CASE WHEN subspace = $j THEN code END) AS c$j").mkString(",\n  ")
    val reconList = (1 to Dim).map { i =>
      val j = (i - 1) / PqSubDim
      s"CAST(ct.cv[$i] AS DOUBLE) + c$j.r[$i]"
    }.mkString("[", ", ", "]")
    val reconJoins = (0 until PqM).map(j =>
      s"JOIN rcb c$j ON c$j.code = w.c$j").mkString("\n  ")
    def cut(sfx: String, bound: String): String =
      s"""short$sfx AS (SELECT qid, neighbor_id FROM (
         |  SELECT qid, neighbor_id,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY approx_sim DESC, neighbor_id) AS rn
         |  FROM cand) t WHERE rn <= $bound),
         |sx$sfx AS (SELECT sh.qid, sh.neighbor_id,
         |             (${dotSql("q.embedding", "n.embedding")} / (q.nr * n.nr)) AS sim
         |      FROM short$sfx sh
         |      JOIN bn q ON q.vec_id = sh.qid
         |      JOIN bn n ON n.vec_id = sh.neighbor_id),
         |ivfpq$sfx AS (SELECT qid, rank, neighbor_id FROM (
         |  SELECT qid, neighbor_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM sx$sfx) t
         |WHERE rank <= 5)""".stripMargin
    s"""WITH cl AS MATERIALIZED (SELECT e.vec_id, $clArr AS embedding
       |  FROM embeddings e JOIN embeddings c ON c.vec_id = (e.vec_id % 13) * 38),
       |bn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM cl),
       |cent AS MATERIALIZED (SELECT vec_id AS cell_id, embedding AS cv, nr AS cnr
       |         FROM bn WHERE vec_id % 62 = 0 AND vec_id < 992),
       |assign AS MATERIALIZED (SELECT vec_id, cell_id FROM (
       |  SELECT e.vec_id, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c) t WHERE rn = 1),
       |autosl AS (SELECT GREATEST(10, CAST(ceil(0.25 * 4 * avg(n)) AS BIGINT)) AS sl
       |  FROM (SELECT count(*) AS n FROM assign GROUP BY cell_id) t),
       |probes AS MATERIALIZED (SELECT qid, cell_id FROM (
       |  SELECT e.vec_id AS qid, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c WHERE e.vec_id < 10) t WHERE rn <= 4),
       |res AS MATERIALIZED (SELECT e.vec_id, a.cell_id, $resList AS r
       |  FROM cl e
       |  JOIN assign a ON a.vec_id = e.vec_id
       |  JOIN cent ct ON ct.cell_id = a.cell_id),
       |rcb AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code, r
       |  FROM res WHERE vec_id % 62 = 31 AND vec_id < 1023),
       |sub AS (
       |  $arms),
       |best AS (SELECT vec_id, subspace, code FROM (
       |  SELECT vec_id, subspace, code,
       |         row_number() OVER (PARTITION BY vec_id, subspace ORDER BY d2 ASC, code ASC) AS rn
       |  FROM sub) t WHERE rn = 1),
       |wide AS MATERIALIZED (SELECT vec_id,
       |  $wideCols
       |  FROM best GROUP BY vec_id),
       |recon AS MATERIALIZED (
       |  SELECT w.vec_id, $reconList AS emb
       |  FROM wide w
       |  JOIN assign a ON a.vec_id = w.vec_id
       |  JOIN cent ct ON ct.cell_id = a.cell_id
       |  $reconJoins),
       |reconn AS MATERIALIZED (SELECT vec_id, emb,
       |  sqrt(${dotSql("emb", "emb")}) AS nr FROM recon),
       |cand AS MATERIALIZED (SELECT p.qid, a.vec_id AS neighbor_id,
       |                (${dotSql("q.embedding", "r.emb")} / (q.nr * r.nr)) AS approx_sim
       |         FROM probes p
       |         JOIN assign a ON a.cell_id = p.cell_id
       |         JOIN reconn r ON r.vec_id = a.vec_id
       |         JOIN bn q ON q.vec_id = p.qid
       |         WHERE a.vec_id != p.qid),
       |${cut("fx", "12")},
       |${cut("au", "(SELECT sl FROM autosl)")},
       |brute AS (SELECT qid, neighbor_id FROM (
       |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY (${dotSql("q.embedding", "e.embedding")} / (q.nr * e.nr)) DESC, e.vec_id) AS rank
       |  FROM bn q JOIN bn e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id < 10) t WHERE rank <= 5)
       |SELECT brute.qid, CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(count(fx.neighbor_id) AS BIGINT) AS hits_fixed,
       |  CAST(count(fx.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_fixed_bp,
       |  CAST(count(au.neighbor_id) AS BIGINT) AS hits_auto,
       |  CAST(count(au.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_auto_bp,
       |  (SELECT CAST(sl AS BIGINT) FROM autosl) AS sl_auto
       |FROM brute
       |LEFT JOIN ivfpqfx fx ON brute.qid = fx.qid AND brute.neighbor_id = fx.neighbor_id
       |LEFT JOIN ivfpqau au ON brute.qid = au.qid AND brute.neighbor_id = au.neighbor_id
       |GROUP BY brute.qid ORDER BY brute.qid""".stripMargin
  }

  private def ivfPqRecallSqlFor(stack: String): String =
    s"""$stack,
       |sx AS (SELECT p.qid, a.vec_id AS neighbor_id,
       |              (${dotSql("q.embedding", "n.embedding")} / (q.nr * n.nr)) AS sim
       |       FROM probes p
       |       JOIN assign a ON a.cell_id = p.cell_id
       |       JOIN bn q ON q.vec_id = p.qid
       |       JOIN bn n ON n.vec_id = a.vec_id
       |       WHERE a.vec_id != p.qid),
       |ivf AS (SELECT qid, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM sx) t WHERE rank <= 5),
       |brute AS (SELECT qid, neighbor_id FROM (
       |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY (${dotSql("q.embedding", "e.embedding")} / (q.nr * e.nr)) DESC, e.vec_id) AS rank
       |  FROM bn q JOIN bn e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id < 10) t WHERE rank <= 5)
       |SELECT brute.qid, CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(count(ivf.neighbor_id) AS BIGINT) AS hits_ivf,
       |  CAST(count(ivf.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_ivf_bp,
       |  CAST(count(ivfpq.neighbor_id) AS BIGINT) AS hits_ivfpq,
       |  CAST(count(ivfpq.neighbor_id) * 10000 // count(*) AS BIGINT) AS recall_ivfpq_bp
       |FROM brute
       |LEFT JOIN ivf ON brute.qid = ivf.qid AND brute.neighbor_id = ivf.neighbor_id
       |LEFT JOIN ivfpq ON brute.qid = ivfpq.qid AND brute.neighbor_id = ivfpq.neighbor_id
       |GROUP BY brute.qid ORDER BY brute.qid""".stripMargin

  // Oracle-resource note (round 10): the x88/x89 stacks are the two
  // heaviest oracles the driver runs, and at DuckDB's default thread
  // count the fully-inlined form (every cosine re-deriving both norms,
  // every CTE re-inlined per reference) tripped DuckDB's memory limit
  // even at sf0.01 — which is what zeroed CORRECTNESS_r09. Two changes,
  // both bitwise-neutral: (a) `bn` precomputes sqrt(dot(e,e)) once per
  // row — the engine's cosine is dot/(sqrt(aa)*sqrt(bb)) with
  // left-associated double accumulation, and sqrt of the same sum is the
  // same double whether taken per-pair or per-row, so every sim value is
  // unchanged; (b) shared CTEs are MATERIALIZED so DuckDB evaluates them
  // once instead of duplicating the subtree at each reference. Text size
  // drops 60/86 KB → ~25/30 KB and the standalone default-thread run
  // drops under a second.
  // Round-10 residual upgrade (the documented FAISS-parity gap):
  // candidates are PQ-encoded as residuals against their cell centroid
  // (`res`), with codebooks drawn from an OFFSET-stride sample's
  // residuals (`rcb`, offset 31 — the stride-62 cell anchors' own
  // residuals are zero and would collapse the codebook), and the
  // reconstruction adds the centroid back. Subspace j of a residual is
  // just full-vector indices j·8+1 .. (j+1)·8, so the per-subspace d2
  // arms index the SAME materialized `res` arrays — no slicing CTEs.
  private def knnIvfPqCtesFor(src: String): String = {
    val resList = (1 to Dim).map(i =>
      s"CAST(e.embedding[$i] AS DOUBLE) - CAST(ct.cv[$i] AS DOUBLE)")
      .mkString("[", ", ", "]")
    def d2Sql(j: Int): String =
      (1 to PqSubDim).map { i =>
        val idx = j * PqSubDim + i
        s"((e.r[$idx] - c.r[$idx]) * (e.r[$idx] - c.r[$idx]))"
      }.mkString("(CAST(0.0 AS DOUBLE) + ", " + ", ")")
    val arms = (0 until PqM).map(j =>
      s"SELECT e.vec_id, $j AS subspace, c.code, ${d2Sql(j)} AS d2 FROM res e, rcb c")
      .mkString("\n  UNION ALL ")
    val wideCols = (0 until PqM).map(j =>
      s"MAX(CASE WHEN subspace = $j THEN code END) AS c$j").mkString(",\n  ")
    val reconList = (1 to Dim).map { i =>
      val j = (i - 1) / PqSubDim
      s"CAST(ct.cv[$i] AS DOUBLE) + c$j.r[$i]"
    }.mkString("[", ", ", "]")
    val reconJoins = (0 until PqM).map(j =>
      s"JOIN rcb c$j ON c$j.code = w.c$j").mkString("\n  ")
    s"""bn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM $src),
       |cent AS MATERIALIZED (SELECT vec_id AS cell_id, embedding AS cv, nr AS cnr
       |         FROM bn WHERE vec_id % 62 = 0 AND vec_id < 992),
       |assign AS MATERIALIZED (SELECT vec_id, cell_id FROM (
       |  SELECT e.vec_id, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c) t WHERE rn = 1),
       |probes AS MATERIALIZED (SELECT qid, cell_id FROM (
       |  SELECT e.vec_id AS qid, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c WHERE e.vec_id < 10) t WHERE rn <= 4),
       |res AS MATERIALIZED (SELECT e.vec_id, a.cell_id, $resList AS r
       |  FROM $src e
       |  JOIN assign a ON a.vec_id = e.vec_id
       |  JOIN cent ct ON ct.cell_id = a.cell_id),
       |rcb AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code, r
       |  FROM res WHERE vec_id % 62 = 31 AND vec_id < 1023),
       |sub AS (
       |  $arms),
       |best AS (SELECT vec_id, subspace, code FROM (
       |  SELECT vec_id, subspace, code,
       |         row_number() OVER (PARTITION BY vec_id, subspace ORDER BY d2 ASC, code ASC) AS rn
       |  FROM sub) t WHERE rn = 1),
       |wide AS MATERIALIZED (SELECT vec_id,
       |  $wideCols
       |  FROM best GROUP BY vec_id),
       |recon AS MATERIALIZED (
       |  SELECT w.vec_id, $reconList AS emb
       |  FROM wide w
       |  JOIN assign a ON a.vec_id = w.vec_id
       |  JOIN cent ct ON ct.cell_id = a.cell_id
       |  $reconJoins),
       |reconn AS MATERIALIZED (SELECT vec_id, emb,
       |  sqrt(${dotSql("emb", "emb")}) AS nr FROM recon),
       |cand AS (SELECT p.qid, a.vec_id AS neighbor_id,
       |                (${dotSql("q.embedding", "r.emb")} / (q.nr * r.nr)) AS approx_sim
       |         FROM probes p
       |         JOIN assign a ON a.cell_id = p.cell_id
       |         JOIN reconn r ON r.vec_id = a.vec_id
       |         JOIN bn q ON q.vec_id = p.qid
       |         WHERE a.vec_id != p.qid),
       |short AS (SELECT qid, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY approx_sim DESC, neighbor_id) AS rn
       |  FROM cand) t WHERE rn <= 12),
       |s AS (SELECT sh.qid, sh.neighbor_id,
       |             (${dotSql("q.embedding", "n.embedding")} / (q.nr * n.nr)) AS sim
       |      FROM short sh
       |      JOIN bn q ON q.vec_id = sh.qid
       |      JOIN bn n ON n.vec_id = sh.neighbor_id),
       |ivfpq AS (SELECT qid, rank, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t
       |WHERE rank <= 5)""".stripMargin
  }

  private lazy val knnIvfPqCtes: String = "WITH " + knnIvfPqCtesFor("embeddings")

  // bn-style norm precompute + MATERIALIZED shared frames (see the x88
  // resource note); sims bitwise-unchanged.
  private val knnIvfCteChain: String =
    s"""bn AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nr FROM embeddings),
       |cent AS MATERIALIZED (SELECT vec_id AS cell_id, embedding AS cv, nr AS cnr
       |              FROM bn WHERE vec_id % 62 = 0 AND vec_id < 992),
       |assign AS MATERIALIZED (SELECT vec_id, embedding, nr, cell_id FROM (
       |  SELECT e.vec_id, e.embedding, e.nr, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c) t WHERE rn = 1),
       |probes AS (SELECT qid, cell_id FROM (
       |  SELECT e.vec_id AS qid, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY (${dotSql("e.embedding", "c.cv")} / (e.nr * c.cnr)) DESC, c.cell_id) AS rn
       |  FROM bn e, cent c WHERE e.vec_id < 10) t WHERE rn <= 4),
       |s AS (SELECT p.qid, a.vec_id AS neighbor_id,
       |             (${dotSql("q.embedding", "a.embedding")} / (q.nr * a.nr)) AS sim
       |      FROM probes p JOIN assign a ON a.cell_id = p.cell_id
       |      JOIN bn q ON q.vec_id = p.qid
       |      WHERE a.vec_id != p.qid)""".stripMargin

  private val knnIvfOracle: String =
    s"""WITH $knnIvfCteChain
       |SELECT qid, rank, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // x106: brute top-1 truth against the IVF top-5 ranks; reciprocal rank
  // in exact fixed point (10^6 DIV rank) so no float enters the output
  private val mrrOracle: String =
    s"""WITH $knnIvfCteChain,
       |ivf AS (SELECT qid, neighbor_id, CAST(rank AS BIGINT) AS rank_in_sys FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t WHERE rank <= 5),
       |brute AS (SELECT qid, neighbor_id FROM (
       |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |           ORDER BY (${dotSql("q.embedding", "e.embedding")} / (q.nr * e.nr)) DESC, e.vec_id) AS rn
       |  FROM bn q JOIN bn e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id < 10) t WHERE rn = 1)
       |SELECT b.qid, b.neighbor_id AS true_top1,
       |  CAST(COALESCE(i.rank_in_sys, 0) AS BIGINT) AS rank_in_sys,
       |  CAST(COALESCE(1000000 // i.rank_in_sys, 0) AS BIGINT) AS rr_fp
       |FROM brute b LEFT JOIN ivf i ON i.qid = b.qid AND i.neighbor_id = b.neighbor_id""".stripMargin

  // kmeansFitExact(emb, 8, 2): stride init (125 over vec_id, first 8
  // hits), two Lloyd iterations with fixed-point centroid means (the x50
  // division shape), final assignment + cell sizes. Every arithmetic step
  // is the bit-exact twin of the Spark side: CAST AS DOUBLE widening,
  // left-associated cosine sums, floor(v*1e6) long sums, one double
  // division, (sim DESC, cell_id) tie-breaks.
  /** The k-means CTE chain (e widen → stride init c0 → assign/means/step
    * ×2 → final assignment `af`) — shared by the x52 fit oracle and the
    * x53 SemDeDup composition.
    */
  /** x93: the kmeansCtes fit chain at caller-chosen depth with the
    * objective emitted per iteration — bn-idiom norm precompute (one
    * dotSql per assign instead of three per PAIR), fixed-point integer
    * inertia so the table hash-matches, and the non-increasing flag
    * computed identically in both engines via one bounded lag window.
    */
  private def kmeansInertiaOracle(iters: Int): String = {
    val (c, scale) = (8, 1000000L)
    val stride = math.max(1L, 1000L / c)
    val evList = (1 to Dim).map(i => s"CAST(embedding[$i] AS DOUBLE)").mkString("[", ", ", "]")
    def centNormSql(cents: String, out: String): String =
      s"""$out AS MATERIALIZED (SELECT cell_id, cv,
         |  sqrt(${dotSql("cv", "cv")}) AS nr FROM $cents)""".stripMargin
    def assignSql(centsN: String, out: String): String =
      s"""$out AS MATERIALIZED (SELECT vec_id, cell_id, cs FROM (
         |  SELECT vec_id, cell_id, cs,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell_id) AS rn
         |  FROM (SELECT e.vec_id, c.cell_id,
         |          (${dotSql("e.ev", "c.cv")} / (e.nr * c.nr)) AS cs
         |        FROM en e, $centsN c) s0) t WHERE rn = 1)""".stripMargin
    def inertiaSql(assign: String, t: Int): String =
      s"""r$t AS (SELECT $t AS iter, CAST(count(*) AS BIGINT) AS n_vectors,
         |  CAST(SUM(CAST(floor((1.0 - cs) * 1000000.0) AS BIGINT)) AS BIGINT) AS inertia_micro
         |  FROM $assign)""".stripMargin
    def meansSql(assign: String, out: String): String = {
      val dims = (1 to Dim).map(i =>
        s"CAST(SUM(CAST(floor(ev[$i] * $scale.0) AS BIGINT)) AS DOUBLE) / CAST(count(*) * $scale AS BIGINT)")
        .mkString("[", ", ", "]")
      s"$out AS MATERIALIZED (SELECT cell_id, $dims AS cv FROM $assign JOIN e USING (vec_id) GROUP BY cell_id)"
    }
    def stepSql(prev: String, means: String, out: String): String =
      s"$out AS MATERIALIZED (SELECT p.cell_id, COALESCE(m.cv, p.cv) AS cv FROM $prev p LEFT JOIN $means m USING (cell_id))"
    val chain = (0 to iters).map { t =>
      val step =
        if (t < iters)
          s""",
             |${meansSql(s"a$t", s"m${t + 1}")},
             |${stepSql(s"c$t", s"m${t + 1}", s"c${t + 1}")}""".stripMargin
        else ""
      s"""${centNormSql(s"c$t", s"c${t}n")},
         |${assignSql(s"c${t}n", s"a$t")},
         |${inertiaSql(s"a$t", t)}$step""".stripMargin
    }.mkString(",\n")
    val unions = (0 to iters).map(t => s"SELECT * FROM r$t").mkString(" UNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, $evList AS ev FROM embeddings),
       |en AS MATERIALIZED (SELECT vec_id, ev, sqrt(${dotSql("ev", "ev")}) AS nr FROM e),
       |c0 AS MATERIALIZED (SELECT vec_id AS cell_id, ev AS cv FROM e
       |       WHERE vec_id % $stride = 0 AND vec_id < ${stride * c}),
       |$chain,
       |rows AS ($unions)
       |SELECT iter, n_vectors, inertia_micro,
       |  CAST(CASE WHEN iter = 0 OR inertia_micro <= lag(inertia_micro) OVER (ORDER BY iter)
       |       THEN 1 ELSE 0 END AS INT) AS non_increasing
       |FROM rows ORDER BY iter""".stripMargin
  }

  private def kmeansCtes: String = {
    val (c, scale) = (8, 1000000L)
    val stride = math.max(1L, 1000L / c)
    val evList = (1 to Dim).map(i => s"CAST(embedding[$i] AS DOUBLE)").mkString("[", ", ", "]")
    def assignSql(cents: String, out: String): String =
      s"""$out AS MATERIALIZED (SELECT vec_id, cell_id FROM (
         |  SELECT e.vec_id, c.cell_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |                            ORDER BY ${cosSql("e.ev", "c.cv")} DESC, c.cell_id) AS rn
         |  FROM e, $cents c) t WHERE rn = 1)""".stripMargin
    def meansSql(assign: String, out: String): String = {
      val dims = (1 to Dim).map(i =>
        s"CAST(SUM(CAST(floor(ev[$i] * $scale.0) AS BIGINT)) AS DOUBLE) / CAST(count(*) * $scale AS BIGINT)")
        .mkString("[", ", ", "]")
      s"$out AS MATERIALIZED (SELECT cell_id, $dims AS cv FROM $assign JOIN e USING (vec_id) GROUP BY cell_id)"
    }
    def stepSql(prev: String, means: String, out: String): String =
      s"$out AS MATERIALIZED (SELECT p.cell_id, COALESCE(m.cv, p.cv) AS cv FROM $prev p LEFT JOIN $means m USING (cell_id))"
    s"""e AS MATERIALIZED (SELECT vec_id, $evList AS ev FROM embeddings),
       |c0 AS MATERIALIZED (SELECT vec_id AS cell_id, ev AS cv FROM e
       |       WHERE vec_id % $stride = 0 AND vec_id < ${stride * c}),
       |${assignSql("c0", "a1")},
       |${meansSql("a1", "m1")},
       |${stepSql("c0", "m1", "c1")},
       |${assignSql("c1", "a2")},
       |${meansSql("a2", "m2")},
       |${stepSql("c1", "m2", "c2")},
       |${assignSql("c2", "af")}""".stripMargin
  }

  private val kmeansOracle: String =
    s"""WITH $kmeansCtes
       |SELECT a.vec_id, a.cell_id, s.cell_size
       |FROM af a JOIN (SELECT cell_id, count(*) AS cell_size FROM af GROUP BY cell_id) s
       |USING (cell_id) ORDER BY vec_id""".stripMargin

  private val semDedupKmeansOracle: String =
    s"""WITH RECURSIVE $kmeansCtes,
       |wv AS MATERIALIZED (SELECT a.vec_id, a.cell_id, v.embedding FROM af a JOIN embeddings v USING (vec_id)),
       |p AS MATERIALIZED (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |      FROM wv a JOIN wv b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
       |      WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35),
       |eg AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
       |walk(node, lab) AS (
       |  SELECT DISTINCT src, src FROM eg
       |  UNION
       |  SELECT eg.src, w.lab FROM eg JOIN walk w ON eg.dst = w.node),
       |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node)
       |SELECT v.vec_id, CAST(COALESCE(c.component, v.vec_id) AS BIGINT) AS component,
       |       CAST(count(*) OVER (PARTITION BY COALESCE(c.component, v.vec_id)) AS BIGINT) AS cluster_size
       |FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.node""".stripMargin

  private val embeddingNearDupOracle: String =
    s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       |             ${cosSql("a.embedding", "c.embedding")} AS cos_sim
       |      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
       |SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.35 ORDER BY id_a, id_b""".stripMargin

  // ---- language-ID oracle -------------------------------------------------

  private val langIdOracle: String = {
    val arms = Stopwords.markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val inList = ms.toSeq.sorted.map(m => s"'$m'").mkString(", ")
      s"""SELECT doc_id, actual_lang, '$lang' AS pred_lang,
         |       CAST(len(list_filter(words, x -> x IN ($inList))) AS BIGINT) AS score FROM w""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH w AS (SELECT doc_id, lang AS actual_lang, string_split(text, ' ') AS words FROM documents),
       |sc AS (
       |  $arms),
       |best AS (SELECT doc_id, actual_lang, pred_lang, score,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pred_lang DESC) AS rn
       |         FROM sc)
       |SELECT doc_id, pred_lang, score, actual_lang,
       |       CAST(CASE WHEN pred_lang = actual_lang THEN 1 ELSE 0 END AS INT) AS correct
       |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** Replays [[TextStats.languageIdNgram]] stage by stage: bigram
    * generation via substr over a position range (codepoint semantics
    * match [[graft.functions.CharNgrams]]), profile training with the
    * same (count DESC, gram ASC) total-order rank, weighted-hit
    * scoring, zero-fill over the lang × doc grid, and the x08 argmax
    * tie-break. All-integer arithmetic — no float drift.
    */
  private val langIdNgramOracle: String =
    """WITH grams AS (
      |  SELECT doc_id, lang, substr(text, CAST(i AS INT), 2) AS g
      |  FROM documents, unnest(range(1, CAST(length(text) AS BIGINT))) AS t(i)
      |),
      |prof AS (
      |  SELECT lang AS plang, g, count(*) AS cnt,
      |         row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, g ASC) AS rn
      |  FROM grams GROUP BY lang, g
      |),
      |profile AS (SELECT plang, g, CAST(41 - rn AS BIGINT) AS w FROM prof WHERE rn <= 40),
      |hits AS (
      |  SELECT gr.doc_id, p.plang, SUM(p.w) AS score
      |  FROM grams gr JOIN profile p ON gr.g = p.g
      |  GROUP BY gr.doc_id, p.plang
      |),
      |langs AS (SELECT DISTINCT plang FROM profile),
      |full_sc AS (
      |  SELECT d.doc_id, d.lang AS actual_lang, l.plang, COALESCE(h.score, 0) AS score
      |  FROM documents d CROSS JOIN langs l
      |  LEFT JOIN hits h ON h.doc_id = d.doc_id AND h.plang = l.plang
      |),
      |best AS (
      |  SELECT doc_id, actual_lang, plang, score,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang DESC) AS rn
      |  FROM full_sc
      |)
      |SELECT doc_id, plang AS pred_lang, CAST(score AS BIGINT) AS score, actual_lang,
      |       CAST(CASE WHEN plang = actual_lang THEN 1 ELSE 0 END AS INT) AS correct
      |FROM best WHERE rn = 1""".stripMargin

  // zorder_key as pure integer bit math, reproduced term-by-term in SQL
  private val zorderOracle: String = {
    val terms = (0 until 32).flatMap(b => Seq(
      s"(((x >> $b) & 1) << ${2 * b})",
      s"(((y >> $b) & 1) << ${2 * b + 1})")).mkString(" + ")
    s"""WITH t AS (SELECT l_orderkey, l_linenumber,
       |  CAST(l_partkey % 100000 AS BIGINT) AS x,
       |  CAST(l_suppkey % 100000 AS BIGINT) AS y FROM lineitem)
       |SELECT l_orderkey, l_linenumber, CAST($terms AS BIGINT) AS zkey
       |FROM t""".stripMargin
  }

  // x37: the 64 per-component floor terms, generated like dotSql —
  // single IEEE double ops (one cast, one multiply, one floor each), so
  // the integer codes are bit-identical cross-engine
  private val quantizeCodeTerms: Seq[String] =
    (1 to Dim).map(i => s"floor(CAST(embedding[$i] AS DOUBLE) * scale)")

  // x137: dot over int8 code arrays (DOUBLE-typed integral values ≤127,
  // so every product and partial sum is exact — association-free)
  private def codeDotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"$a[$i]*$b[$i]")
      .mkString("(CAST(0.0 AS DOUBLE) + ", " + ", ")")

  private val quantizeInt8Oracle: String =
    s"""WITH m AS (SELECT vec_id, embedding,
       |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS max_abs
       |  FROM embeddings),
       |s AS (SELECT vec_id, embedding, max_abs,
       |    CASE WHEN max_abs = 0 THEN CAST(0.0 AS DOUBLE) ELSE 127.0 / max_abs END AS scale
       |  FROM m)
       |SELECT vec_id, max_abs, scale,
       |  CAST(${quantizeCodeTerms.mkString(" + ")} AS BIGINT) AS code_sum,
       |  ${(0 until 4).map(i => s"CAST(${quantizeCodeTerms(i)} AS BIGINT) AS q$i").mkString(",\n  ")}
       |FROM s ORDER BY vec_id""".stripMargin

  // x38: PQ encode replayed in SQL. Codebooks re-derive from the same
  // stride sample as the Spark side (strideCentroids semantics: stride
  // 62, first 16 hits by id); per-subspace squared L2 distances are
  // left-associated double sums over full-vector positions (slicing and
  // comparing subvectors is positionally identical), argmin ties to the
  // smallest code — the exact (score desc, id asc) contract of top_k_by.
  private val PqM = Similarity.PqM
  private val PqSubDim = Dim / PqM

  /** Shared x38/x39 CTE chain ending in `wide(vec_id, c0..c7)`;
    * source-parameterized (round 10) so the same stack runs over a
    * derived corpus CTE (x92's clustered corpus) as well as the raw
    * `embeddings` table. Returns the CTE list WITHOUT the leading
    * `WITH` so callers can prepend their own CTEs.
    */
  private def pqCtesFor(src: String): String = {
    def d2Sql(j: Int): String =
      (1 to PqSubDim).map { i =>
        val idx = j * PqSubDim + i
        val diff = s"(CAST(e.embedding[$idx] AS DOUBLE) - CAST(c.embedding[$idx] AS DOUBLE))"
        s"($diff * $diff)"
      }.mkString("(CAST(0.0 AS DOUBLE) + ", " + ", ")")
    val arms = (0 until PqM).map(j =>
      s"SELECT e.vec_id, $j AS subspace, c.code, ${d2Sql(j)} AS d2 FROM $src e, cb c")
      .mkString("\n  UNION ALL ")
    val wideCols = (0 until PqM).map(j =>
      s"MAX(CASE WHEN subspace = $j THEN code END) AS c$j").mkString(",\n  ")
    s"""sample AS MATERIALIZED (SELECT vec_id, embedding FROM $src
       |               WHERE vec_id % 62 = 0 AND vec_id < 992),
       |cb AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code, embedding
       |       FROM sample),
       |sub AS (
       |  $arms),
       |best AS (SELECT vec_id, subspace, code FROM (
       |  SELECT vec_id, subspace, code,
       |         row_number() OVER (PARTITION BY vec_id, subspace ORDER BY d2 ASC, code ASC) AS rn
       |  FROM sub) t WHERE rn = 1),
       |wide AS MATERIALIZED (SELECT vec_id,
       |  $wideCols
       |  FROM best GROUP BY vec_id)""".stripMargin
  }

  private lazy val pqCtes: String = "WITH " + pqCtesFor("embeddings")

  private val pqCodesOracle: String =
    s"""$pqCtes
       |SELECT vec_id, ${(0 until PqM).map(j => s"c$j").mkString(", ")}
       |FROM wide ORDER BY vec_id""".stripMargin

  private val pqReconKnnOracle: String = {
    val reconList = (0 until PqM).map { j =>
      s"c$j.embedding[${j * PqSubDim + 1}:${(j + 1) * PqSubDim}]"
    }.mkString(" || ")
    val joins = (0 until PqM).map(j =>
      s"JOIN cb c$j ON c$j.code = w.c$j").mkString("\n  ")
    s"""$pqCtes,
       |recon AS (
       |  SELECT w.vec_id, $reconList AS emb
       |  FROM wide w
       |  $joins),
       |s AS (SELECT q.vec_id AS qid, r.vec_id AS neighbor_id,
       |             ${cosSql("q.embedding", "r.emb")} AS sim
       |      FROM embeddings q, recon r
       |      WHERE q.vec_id < 10 AND r.vec_id != q.vec_id)
       |SELECT qid, rank, neighbor_id FROM (
       |  SELECT qid, neighbor_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM s) t
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  private val dupSpanOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |             array_to_string(words[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
      |      FROM w, unnest(range(1, len(words) - 6)) t(i)),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
      |cov AS (SELECT DISTINCT g.doc_id, cp
      |        FROM g JOIN dup USING (gram), unnest(range(g.pos, g.pos + 8)) u(cp)),
      |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_covered FROM cov GROUP BY doc_id)
      |SELECT w.doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
      |  COALESCE(c.n_covered, 0) AS n_covered,
      |  CAST(COALESCE(c.n_covered, 0) AS DOUBLE) / CAST(len(words) AS DOUBLE) AS coverage
      |FROM w LEFT JOIN c USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---- multimodal-stub oracle ---------------------------------------------
  // The stub features are md5-derived (Multimodal.fakeDecode): f_i = hex
  // chars [8i, 8i+8) / 2^32 (exact in double), head_hash = first 60 bits.
  // DuckDB's md5(VARCHAR) hashes the UTF-8 bytes — exactly the payload
  // bytes asMediaTable wraps.
  private val multimodalOracle: String = {
    val fs = (0 until 4).map(i =>
      s"('0x'||substr(md5(text),${8 * i + 1},8))::BIGINT / 4294967296.0 AS f$i").mkString(",\n  ")
    s"""SELECT doc_id, 'text/plain' AS media_type,
       |  CAST(strlen(text) AS BIGINT) AS n_bytes,
       |  ('0x'||substr(md5(text),1,15))::BIGINT AS head_hash,
       |  $fs
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[Q] = Seq(

    Q("x01_dedup_exact",
      "Exact dedup groups by content hash (hash-groupBy; one shuffle).",
      Some("""SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin),
      (s, d) => TextDedup.exactGroups(Tables.documents(s, d))),

    Q("x16_minhash_portable",
      "MinHash signature stage under the engine-portable md5 family (the xxhash64 fast path stays library-side, ScalaTest-covered).",
      Some(minhashPortableOracle),
      (s, d) => TextDedup.minhashSignaturesPortable(Tables.documents(s, d))),

    Q("x02_minhash_bands",
      "MinHash signatures → LSH band buckets (shingle→minhash→band), portable family with collision-free string band keys.",
      Some(bandsPortableOracle),
      (s, d) => TextDedup.lshBandsPortable(Tables.documents(s, d))),

    Q("x03_minhash_pairs",
      "Near-dup candidate pairs via the LSH bucket equi-join + signature-estimated Jaccard (portable family).",
      Some(minhashPairsPortableOracle),
      (s, d) => TextDedup.candidatePairsFrom(
          TextDedup.minhashSignaturesPortable(Tables.documents(s, d)))),

    Q("x04_simhash",
      "60-bit SimHash per document (distributed bit votes), portable family.",
      Some(simhashPortableOracle),
      (s, d) => TextDedup.simhash(Tables.documents(s, d),
          hashFn = TextDedup.portableHash(_, ""), bits = 60)),

    Q("x05_ngram_jaccard",
      "Exact word-3-gram Jaccard over blocked pairs (verification stage of near-dedup).",
      Some("""WITH s AS (
             |  SELECT doc_id, lang, list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words)-1)]) AS sh
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents WHERE doc_id < 200) t
             |  WHERE len(words) >= 3)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT)
             |         / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS jaccard
             |FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 100""".stripMargin),
      (s, d) => TextDedup.ngramJaccardPairs(
          Tables.documents(s, d).filter(col("doc_id") < 200), "lang", 3)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(100)),

    Q("x06_knn_brute",
      "Brute-force cosine top-5 neighbors for query vectors (rank-only output: fp-eval independent).",
      Some("""SELECT qid, rank, neighbor_id FROM (
             |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
             |         row_number() OVER (PARTITION BY q.vec_id
             |                            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rank
             |  FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
             |  WHERE q.vec_id < 10) t
             |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.knnBrute(emb.filter(col("vec_id") < 10), emb, 5)
      }),

    Q("x07_knn_lsh",
      "ANN via random-hyperplane LSH buckets: equi-join candidate generation, exact rank in-bucket. " +
        "Oracle embeds the literal ±1 hyperplane matrix; cosine/bucket arithmetic is bit-identical.",
      Some(knnLshOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.knnLsh(emb.filter(col("vec_id") < 10), emb, 3)
      }),

    Q("x19_knn_lsh_multiprobe",
      "Multi-probe LSH ANN (Hamming-1 buckets probed too; measured recall@5 3x the single-probe x07).",
      Some(knnLshMultiProbeOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.knnLshMultiProbe(emb.filter(col("vec_id") < 10), emb, 3)
      }),

    Q("x08_lang_id",
      "Stopword-marker language ID heuristic (argmax over language scores; deterministic tie-break).",
      Some(langIdOracle),
      (s, d) => TextStats.languageId(Tables.documents(s, d))),

    Q("x29_lang_id_ngram",
      "Char-bigram profile language ID (Cavnar–Trenkle shape): corpus-trained top-40 rank-weighted " +
        "profiles embedded as a literal gram->weights map (the profile is a bounded model " +
        "artifact), scoring = one codegen map lookup per gram + per-lang sum columns + a " +
        "when-chain argmax - no scoring join, no doc-grid crossJoin, no window (round-8; " +
        "row-identical to the broadcast-join reference form, LangIdLiteralSpec + measured " +
        "~30% faster). x08 argmax tie-break.",
      Some(langIdNgramOracle),
      // fanned-out scan: the bigram explode is a heavy per-row kernel
      // ahead of the first shuffle (see Tables.loadFanout scaladoc)
      (s, d) => TextStats.languageIdNgramLiteral(Tables.loadFanout(s, d, "documents"))),

    Q("x09_text_quality",
      "Quality scoring: char/token counts, avg word length, stopword ratio.",
      Some("""SELECT doc_id,
             |  CAST(length(text) AS BIGINT) AS n_chars_m,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces_x,
             |  CAST(length(replace(text, ' ', '')) AS BIGINT)
             |    / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_word_len,
             |  CAST(len(list_filter(string_split(text, ' '),
             |        w -> w IN ('the','and','of','to','in','a','is','that'))) AS BIGINT)
             |    / CAST(len(string_split(text, ' ')) AS BIGINT) AS stop_ratio
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.quality(Tables.documents(s, d))),

    Q("x10_fingerprint",
      "Document fingerprint: md5 of whitespace-normalized lowercase text.",
      Some("""SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.fingerprint(Tables.documents(s, d))),

    Q("x11_token_count",
      "BPE-ish lexer token count (letter/digit/punct runs).",
      Some("""SELECT doc_id, CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS BIGINT) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.bpeTokenCount(Tables.documents(s, d))),

    Q("x14_knn_ivf",
      "IVF-style ANN: centroid cells (broadcast) + nprobe probing + bounded-heap rank; oracle replays cell assignment bit-exactly.",
      Some(knnIvfOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        // the centroid sample feeds assignment AND probing — pin the
        // 16-row artifact so each consumer stops re-scanning the corpus
        val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        Similarity.knnIvf(emb.filter(col("vec_id") < 10), emb, centroids, 5, 4)
      }),

    Q("x15_embedding_neardup",
      "Embedding-cosine near-dup pairs from shared LSH buckets. Threshold 0.35 is demonstrative: the synthetic corpus has no true near-dups (max pairwise cos ≈ 0.48); production dedup uses ~0.9.",
      Some(embeddingNearDupOracle),
      (s, d) => Similarity.embeddingNearDupPairs(Tables.embeddings(s, d), 0.35)),

    Q("x35_semantic_dedup",
      "SemDeDup-shape semantic dedup: embedding near-dup pairs (x15) collapsed to whole clusters by connected components (x33's operator) — canonical vector = component min; keep one per cluster.",
      Some(s"""WITH RECURSIVE
              |b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
              |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b
              |      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
              |      WHERE ${cosSql("a.embedding", "c.embedding")} >= 0.35),
              |e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
              |walk(node, lab) AS (
              |  SELECT DISTINCT src, src FROM e
              |  UNION
              |  SELECT e.src, w.lab FROM e JOIN walk w ON e.dst = w.node),
              |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node)
              |SELECT v.vec_id, CAST(COALESCE(c.component, v.vec_id) AS BIGINT) AS component,
              |       CAST(count(*) OVER (PARTITION BY COALESCE(c.component, v.vec_id)) AS BIGINT) AS cluster_size
              |FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.node""".stripMargin),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        ConnectedComponents.assign(emb.select(col("vec_id")),
          Similarity.embeddingNearDupPairs(emb, 0.35), "vec_id", "id_a", "id_b")
      }),

    Q("x20_quality_filter",
      "Composable quality gate (C4/Gopher shape): every rule a deterministic column expr, first failure is the drop reason.",
      Some("""WITH q AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    CAST(length(replace(text, ' ', '')) AS BIGINT)
             |      / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_word_len,
             |    CAST(len(list_filter(string_split(text, ' '),
             |          w -> w IN ('the','and','of','to','in','a','is','that'))) AS BIGINT)
             |      / CAST(len(string_split(text, ' ')) AS BIGINT) AS stop_ratio
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN n_tokens < 10 THEN 'too_few_tokens'
             |       WHEN avg_word_len > 9.0 THEN 'words_too_long'
             |       WHEN stop_ratio < 0.01 THEN 'too_few_stopwords' END AS drop_reason,
             |  CAST(CASE WHEN n_tokens >= 10 AND avg_word_len <= 9.0 AND stop_ratio >= 0.01
             |       THEN 1 ELSE 0 END AS INT) AS keep
             |FROM q ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.qualityFilter(Tables.documents(s, d),
          minTokens = 10, maxAvgWordLen = 9.0, minStopRatio = 0.01)
        .select(col("doc_id"), col("drop_reason"), col("keep"))),

    Q("x21_hash_split",
      "Deterministic train/eval split by portable content-id hash (stable across runs/engines/partitionings).",
      Some("""SELECT doc_id,
             |  ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 100 AS bucket_100,
             |  CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 100 < 80
             |       THEN 'train' ELSE 'eval' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.hashSplit(Tables.documents(s, d), "doc_id", trainPct = 80)
        .select(col("doc_id"), col("bucket_100"), col("split"))),

    Q("x34_stratified_sample",
      "Deterministic stratified sample (data-mixing): keep iff portable id-hash bucket < the stratum's basis-point rate — map-side, RNG-free, stable across runs/engines/partitionings (en 50%, zh 20%, rest 5%).",
      Some("""SELECT doc_id, lang,
             |  ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'strat'),1,15))::BIGINT % 10000 AS bucket
             |FROM documents
             |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'strat'),1,15))::BIGINT % 10000
             |  < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2000 ELSE 500 END""".stripMargin),
      (s, d) => TextStats.stratifiedSample(Tables.documents(s, d), "lang",
          Map("en" -> 5000, "zh" -> 2000), defaultBp = 500)
        .select(col("doc_id"), col("lang"), col("bucket"))),

    Q("x30_decontaminate",
      "Benchmark decontamination: per training doc, distinct word-5-gram overlap with the (broadcast-sized) eval set's shingles.",
      Some("""WITH s AS (
             |  SELECT doc_id,
             |    list_distinct([array_to_string(words[i:i+4], ' ')
             |                   for i in range(1, len(words)-3)]) AS sh
             |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t),
             |ev AS (SELECT list(DISTINCT g) AS gs
             |       FROM (SELECT unnest(sh) AS g FROM s WHERE doc_id % 97 = 0))
             |SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
             |  CAST(len(list_intersect(sh, gs)) AS BIGINT) AS n_contaminated,
             |  CAST(CASE WHEN len(list_intersect(sh, gs)) > 0
             |       THEN 1 ELSE 0 END AS INT) AS contaminated
             |FROM s CROSS JOIN ev WHERE doc_id % 97 <> 0""".stripMargin),
      (s, d) => TextDedup.contamination(
        Tables.loadFanout(s, d, "documents"), col("doc_id") % 97 === 0)),

    Q("x31_source_cap",
      "Data-mixing cap: at most 10 docs per source, picked by portable doc-id hash (stable across runs/engines/partitionings).",
      Some("""SELECT doc_id, source, rk FROM (
             |  SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source
             |    ORDER BY ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT ASC,
             |             doc_id ASC) AS BIGINT) AS rk
             |  FROM documents) t
             |WHERE rk <= 10""".stripMargin),
      (s, d) => TextStats.capPerGroup(Tables.documents(s, d), "source", cap = 10)),

    Q("x32_pack_bins",
      "Sequence packing: per-source token-budget bin assignment via prefix-sum (budget 512) - the pretraining batch-assembly primitive.",
      Some("""SELECT doc_id, source,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(floor((SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
             |      OVER (PARTITION BY source ORDER BY doc_id ASC
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    - len(string_split(text, ' '))) / 512) AS BIGINT) AS bin
             |FROM documents""".stripMargin),
      (s, d) => TextStats.packBins(Tables.documents(s, d), "source", budget = 512)),

    Q("x33_dup_clusters",
      "Near-dup cluster collapse: connected components (adaptive min-label-then-star strategy) over shared word-4-gram edges; component id = canonical doc (min id), plus cluster size.",
      Some("""WITH RECURSIVE
             |s AS (
             |  SELECT doc_id, lang, list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents WHERE doc_id < 300) t
             |  WHERE len(words) >= 4),
             |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
             |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |       WHERE len(list_intersect(a.sh, b.sh)) >= 1),
             |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
             |walk(node, lab) AS (
             |  SELECT DISTINCT a, a FROM e
             |  UNION
             |  SELECT e.a, w.lab FROM e JOIN walk w ON e.b = w.node),
             |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node)
             |SELECT s.doc_id, CAST(COALESCE(c.component, s.doc_id) AS BIGINT) AS component,
             |       CAST(count(*) OVER (PARTITION BY COALESCE(c.component, s.doc_id)) AS BIGINT) AS cluster_size
             |FROM s LEFT JOIN comp c ON s.doc_id = c.node""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val edges = TextDedup.sharedShingleEdges(docs, "lang", 4)
        ConnectedComponents.assign(
          docs.filter(size(graft.functions.word_shingles(col("text"), 4)) > 0),
          edges, "doc_id", "doc_a", "doc_b")
      }),

    Q("x36_dup_span_coverage",
      "Exact-substring-dedup signal (deduplicate-training-data shape): fraction of each doc's token " +
        "positions covered by a word-8-gram that also occurs in another document — catches repeated " +
        "boilerplate spans whole-doc MinHash misses. Linear dataflow: posexplode grams, cross-doc test " +
        "by min(doc)!=max(doc), semi-join postings, explode covered positions, distinct-count per doc.",
      Some(dupSpanOracle),
      // raw gram strings so the oracle is exact; hashGrams=true is the
      // production path (8-byte keys through the shuffle), ExtSpec-checked
      (s, d) => TextDedup.dupSpanCoverage(
        Tables.loadFanout(s, d, "documents"), n = 8, hashGrams = false)),

    Q("x37_quantize_int8",
      "Scalar int8 embedding quantization (symmetric max-abs, faiss-SQ8 shape): scale = 127/max|v|, " +
        "code = floor(v*scale) — the 4x memory cut and int8-SIMD prerequisite ahead of IVF at 1B-vector " +
        "scale. Map-side only. floor (not round) keeps the codes bit-identical cross-engine.",
      Some(quantizeInt8Oracle),
      (s, d) => Similarity.quantizeInt8(Tables.embeddings(s, d))
        .select(col("vec_id"), col("max_abs"), col("scale"), col("code_sum"),
          element_at(col("codes"), 1).as("q0"), element_at(col("codes"), 2).as("q1"),
          element_at(col("codes"), 3).as("q2"), element_at(col("codes"), 4).as("q3"))),

    Q("x38_pq_codes",
      "Product-quantization encode (faiss-PQ shape): 8 subspaces x 16 codewords from a deterministic " +
        "corpus stride sample; each subvector takes its L2-argmin code — m*log2(k) bits per vector, the " +
        "memory layout ANN runs at 1B vectors. Broadcast codebooks + bounded-heap argmin; no wide shuffle.",
      Some(pqCodesOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.pqEncode(emb, Similarity.pqCodebooks(emb))
      }),

    Q("x39_pq_recon_knn",
      "PQ ANN search path: rank the PQ-RECONSTRUCTED corpus by cosine against the original query " +
        "vectors — mathematically what an ADC scan computes (distance decomposes over subspaces), " +
        "demonstrated end-to-end: encode (x38) -> decode (m broadcast joins) -> brute rank. Memory side " +
        "of the ANN trade: 8 bytes/vector instead of 256.",
      Some(pqReconKnnOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val cb = Similarity.pqCodebooks(emb)
        val recon = Similarity.pqDecode(Similarity.pqEncode(emb, cb), cb)
        Similarity.knnBrute(emb.filter(col("vec_id") < 10), recon, 5)
      }),

    Q("x42_edit_distance_verify",
      "Edit-distance verification of near-dup candidates — the last rung of the dedup ladder " +
        "(LSH candidates -> estimated Jaccard -> exact Jaccard -> levenshtein): candidates from the " +
        "shared-4-gram inverted index (never all-pairs), then exact + relative edit distance per pair. " +
        "Scoped to the ASCII 'en' slice because DuckDB's levenshtein is byte-based while Spark's is " +
        "codepoint-based — they agree exactly on ASCII (the library operator has no such restriction).",
      Some("""WITH s AS (
             |  SELECT doc_id, text,
             |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
             |        WHERE doc_id < 300 AND lang = 'en') t
             |  WHERE len(words) >= 4),
             |e AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |             CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_shared,
             |             CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
             |             CAST(greatest(length(a.text), length(b.text)) AS BIGINT) AS max_len
             |      FROM s a JOIN s b ON a.doc_id < b.doc_id
             |      WHERE len(list_intersect(a.sh, b.sh)) >= 1)
             |SELECT doc_a, doc_b, n_shared, edit_dist,
             |  CAST(edit_dist AS DOUBLE) / CAST(max_len AS DOUBLE) AS rel_dist
             |FROM e ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("doc_id") < 300 && col("lang") === "en")
        val edges = TextDedup.sharedShingleEdges(docs, "lang", 4)
        val a = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
        val b = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
        edges.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
          .withColumn("edit_dist", levenshtein(col("text_a"), col("text_b")).cast("long"))
          .select(col("doc_a"), col("doc_b"), col("n_shared"), col("edit_dist"),
            (col("edit_dist").cast("double") /
              greatest(length(col("text_a")), length(col("text_b"))).cast("double"))
              .as("rel_dist"))
      }),

    Q("x43_curation_pipeline",
      "The full corpus-curation flow as ONE oracled dataflow — exact dedup (keep min id per content " +
        "hash) -> quality gate (x20 rules) -> near-dup cluster collapse to canonical docs (x33's " +
        "connected components over shared-4-gram edges) -> deterministic stratified sample (x34 rates). " +
        "Every stage is the already-oracled operator; this query proves they compose end-to-end " +
        "(doc_id < 300 bounds the recursive-CTE oracle, like x33).",
      Some("""WITH RECURSIVE
             |d0 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id < 300),
             |k1 AS (SELECT min(doc_id) AS doc_id FROM d0 GROUP BY md5(text)),
             |d1 AS (SELECT d0.* FROM d0 JOIN k1 USING (doc_id)),
             |q AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    CAST(length(replace(text, ' ', '')) AS BIGINT)
             |      / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_word_len,
             |    CAST(len(list_filter(string_split(text, ' '),
             |          w -> w IN ('the','and','of','to','in','a','is','that'))) AS BIGINT)
             |      / CAST(len(string_split(text, ' ')) AS BIGINT) AS stop_ratio
             |  FROM d1),
             |d2 AS (SELECT d1.* FROM d1 JOIN q USING (doc_id)
             |       WHERE q.n_tokens >= 10 AND q.avg_word_len <= 9.0 AND q.stop_ratio >= 0.01),
             |s AS (
             |  SELECT doc_id, lang,
             |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM d2) t
             |  WHERE len(words) >= 4),
             |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
             |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |       WHERE len(list_intersect(a.sh, b.sh)) >= 1),
             |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
             |walk(node, lab) AS (
             |  SELECT DISTINCT a, a FROM e
             |  UNION
             |  SELECT e.a, w.lab FROM e JOIN walk w ON e.b = w.node),
             |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node),
             |d3 AS (SELECT d2.* FROM d2 LEFT JOIN comp ON d2.doc_id = comp.node
             |       WHERE COALESCE(comp.component, d2.doc_id) = d2.doc_id)
             |SELECT doc_id, lang,
             |  ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'strat'),1,15))::BIGINT % 10000 AS bucket
             |FROM d3
             |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'strat'),1,15))::BIGINT % 10000
             |  < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2000 ELSE 500 END""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val keep1 = TextDedup.exactGroups(docs).select(col("keep_id").as("doc_id"))
        val d1 = docs.join(keep1, Seq("doc_id"), "left_semi")
        val passed = TextStats.qualityFilter(d1, minTokens = 10, maxAvgWordLen = 9.0,
            minStopRatio = 0.01).filter(col("keep") === 1).select(col("doc_id"))
        val d2 = d1.join(passed, Seq("doc_id"), "left_semi")
        // labels (not assign): the pipeline only drops non-canonical
        // cluster members, so the cluster-size aggregate is dead weight —
        // docs outside the edge graph are their own canonical by default
        val labs = ConnectedComponents.labels(
          TextDedup.sharedShingleEdges(d2, "lang", 4), "doc_a", "doc_b")
        val dropIds = labs.filter(col("node") =!= col("component"))
          .select(col("node").as("doc_id"))
        val d3 = d2.join(dropIds, Seq("doc_id"), "left_anti")
        TextStats.stratifiedSample(d3, "lang", Map("en" -> 5000, "zh" -> 2000), defaultBp = 500)
          .select(col("doc_id"), col("lang"), col("bucket"))
      }),

    Q("x22_ngram_counts",
      "Corpus-level word-bigram frequencies, top-50 (explode → partial-agg count; top-k as TakeOrderedAndProject).",
      Some("""SELECT gram, count(*) AS n FROM (
             |  SELECT unnest([array_to_string(words[i:i+1], ' ') for i in range(1, len(words))]) AS gram
             |  FROM (SELECT string_split(text, ' ') AS words FROM documents) t
             |  WHERE len(words) >= 2)
             |GROUP BY gram ORDER BY n DESC, gram LIMIT 50""".stripMargin),
      (s, d) => TextStats.ngramCounts(Tables.documents(s, d), 2)
        .orderBy(col("n").desc, col("gram")).limit(50)),

    Q("x23_repeated_ngram_ratio",
      "Gopher-style repetition signal: fraction of duplicate word bigrams per document.",
      Some("""SELECT doc_id,
             |  CAST(len(grams) AS BIGINT) AS n_grams,
             |  CAST(len(grams) - len(list_distinct(grams)) AS BIGINT) AS n_repeated,
             |  CAST(len(grams) - len(list_distinct(grams)) AS BIGINT) / CAST(len(grams) AS BIGINT) AS rep_ratio
             |FROM (
             |  SELECT doc_id, [array_to_string(words[i:i+1], ' ') for i in range(1, len(words))] AS grams
             |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t
             |  WHERE len(words) >= 2)
             |ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.repeatedNgramRatio(Tables.documents(s, d), 2)),

    Q("x24_redact",
      "PII-scrub pass: regex redaction of emails and long digit runs; per-rule counts + fingerprint of the redacted text.",
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+')) AS BIGINT) AS n_email,
             |  CAST(len(regexp_extract_all(text, '[0-9]{3,}')) AS BIGINT) AS n_digits,
             |  md5(regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'), '[0-9]{3,}', '<NUM>', 'g')) AS redacted_hash
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.redact(Tables.documents(s, d), Seq(
          ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+", "<EMAIL>"),
          ("digits", "[0-9]{3,}", "<NUM>")))
        .select(col("doc_id"), col("n_email"), col("n_digits"),
          md5(col("redacted").cast("binary")).as("redacted_hash"))),

    Q("x25_approx_quantile",
      "Quantile sketch (Greenwald-Khanna percentile_approx, accuracy 10000) oracled via its rank-error " +
        "contract derived from the group size: the approx p50 is an actual sample, so its rank interval " +
        "[count(<v)+1, count(<=v)] must intersect [(0.5-eps)n, (0.5+eps)n] with eps = 1/accuracy + 1/n " +
        "(the +1/n absorbs rank-rounding conventions) — implied by the sketch's epsilon guarantee at ANY " +
        "group size or data distribution, unlike a fixed interpolated percentile band.",
      Some("""SELECT event_type, count(*) AS n, min(value) AS vmin, max(value) AS vmax, CAST(1 AS INT) AS q_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val sketch = ev.groupBy(col("event_type"))
          .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"))
        val eps = lit(1.0 / 10000) + lit(1.0) / col("n")
        ev.join(broadcast(sketch), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), min(col("value")).as("vmin"), max(col("value")).as("vmax"),
            sum((col("value") <= col("p50a")).cast("long")).as("c_le"),
            sum((col("value") < col("p50a")).cast("long")).as("c_lt"))
          .select(col("event_type"), col("n"), col("vmin"), col("vmax"),
            (col("c_le") >= floor((lit(0.5) - eps) * col("n")) &&
             col("c_lt") < ceil((lit(0.5) + eps) * col("n"))).cast("int").as("q_ok"))
      }),

    Q("x26_tfidf_top_terms",
      "TF-IDF-shaped ranking: per-doc top-3 terms by tf/df (document-frequency-normalized; the single " +
        "IEEE division of exact integers is bit-identical cross-engine, so the ranking itself is oracled).",
      Some("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
             |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM w GROUP BY 1),
             |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |             CAST(tf.tf AS DOUBLE) / df.df AS score
             |      FROM tf JOIN df USING (term))
             |SELECT doc_id, rank, term, tf, df, score FROM (
             |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
             |  FROM s) t
             |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin),
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val tf = words.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        // df from tf's keys (identical aggregate subtree on both join
        // sides → one compute via exchange reuse), not a second pass
        // over the exploded words
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val scored = tf.join(dfreq, Seq("term"))
          .withColumn("score", col("tf") / col("df"))
        graft.operators.Ranks.topKPerGroup(scored, Seq("doc_id"), 3,
            Seq(col("score").desc, col("term")))
          .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
      }),

    Q("x27_heavy_hitters",
      "Misra-Gries heavy hitters (custom TypedImperativeAggregate, O(capacity) state at any corpus size) " +
        "oracled via its containment contract: every exact top-10 term — all far above the n/(capacity+1) " +
        "guarantee threshold — must appear in the sketch's candidate set.",
      Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
             |t AS (SELECT term, count(*) AS cnt FROM w GROUP BY term ORDER BY cnt DESC, term LIMIT 10)
             |SELECT term, cnt, CAST(1 AS INT) AS in_sketch FROM t""".stripMargin),
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("term"))
        val exactTop = words.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term")).limit(10)
        val sketch = words.agg(graft.functions.frequent_items(col("term"), 256).as("mg"))
          .select(explode(col("mg")).as("e"))
          .select(col("e.item").as("term"), lit(1).as("hit"))
        exactTop.join(broadcast(sketch), Seq("term"), "left")
          .select(col("term"), col("cnt"),
            coalesce(col("hit"), lit(0)).cast("int").as("in_sketch"))
      }),

    Q("x41_lm_score",
      "Corpus-LM next-word-probability score (CCNet/KenLM-shape quality filter): per doc, sum of " +
        "P(w_i|w_{i-1}) under corpus bigram counts. Each probability is one IEEE division of exact " +
        "integers and the per-doc sum runs in Decimal(38,6) — order-independent, so the whole score is " +
        "oracle-exact where log-space perplexity could never be.",
      Some("""WITH g AS (
             |  SELECT doc_id, array_to_string(words[CAST(i AS INT):CAST(i + 1 AS INT)], ' ') AS gram
             |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t,
             |       unnest(range(1, len(words))) u(i)),
             |c2 AS (SELECT gram, count(*) AS c2 FROM g GROUP BY gram),
             |c1 AS (SELECT split_part(gram, ' ', 1) AS prefix, SUM(c2) AS c1 FROM c2 GROUP BY 1)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  CAST(CAST(SUM(CAST(c2.c2 / c1.c1 AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS score_sum
             |FROM g JOIN c2 USING (gram)
             |JOIN c1 ON split_part(g.gram, ' ', 1) = c1.prefix
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.lmScore(Tables.loadFanout(s, d, "documents"))),

    Q("x40_count_min",
      "Count-Min sketch point-frequency estimates (built-in count_min_sketch aggregate, eps 1e-4, fixed " +
        "seed) oracled via the CM contract on the exact top-10 terms: est >= true and est <= true + " +
        "eps*N. O(1/eps) state at any corpus size — the mergeable frequency-table companion to x27's " +
        "Misra-Gries candidate set. Pure plan (round-5): the 1-row sketch aggregate is broadcast onto " +
        "the top-10 frame and probed by the cm_estimate codegen expression — no driver-side collect. " +
        "NOTE the upper bound holds with confidence 0.99 PER QUERY; with the fixed seed it is " +
        "deterministic for this corpus, but regenerated test data could legitimately show in_bound=0 " +
        "without an engine bug (round-4 ADVICE) — that reads as a sketch-contract miss, not a hash bug.",
      Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
             |t AS (SELECT term, count(*) AS cnt FROM w GROUP BY term ORDER BY cnt DESC, term LIMIT 10)
             |SELECT term, cnt, CAST(1 AS INT) AS in_bound FROM t""".stripMargin),
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("term"))
        val eps = 1e-4
        val sketch = words.agg(
          count_min_sketch(col("term"), lit(eps), lit(0.99), lit(42)).as("sk"),
          count(lit(1)).as("total"))
        val top = words.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term")).limit(10)
        val est = graft.functions.cm_estimate(col("sk"), col("term"))
        top.crossJoin(broadcast(sketch))
          .select(col("term"), col("cnt"),
            (est >= col("cnt") &&
              est <= col("cnt") + ceil(lit(eps) * col("total")).cast("long"))
              .cast("int").as("in_bound"))
      }),

    Q("x28_zorder_key",
      "Morton (Z-order) clustering key over two join-key dimensions — sort by this before write " +
        "(Ingest.appendSorted) and min/max footer stats prune files for range predicates on EITHER column; " +
        "oracled bit-for-bit as a generated integer expression.",
      Some(zorderOracle),
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.functions.zorder_key(
            pmod(col("l_partkey"), lit(100000)).cast("int"),
            pmod(col("l_suppkey"), lit(100000)).cast("int")).as("zkey"))),

    Q("x12_multimodal_stub",
      "Binary media column plumbing + partition-local (stubbed) decode/feature-extract; md5-derived stub features make the whole stage oracle-checkable.",
      Some(multimodalOracle),
      (s, d) => Multimodal.extractFeatures(s, Multimodal.asMediaTable(Tables.documents(s, d)))
        .select(col("doc_id"), col("media_type"), col("n_bytes"), col("head_hash"),
          col("features")(0).as("f0"), col("features")(1).as("f1"),
          col("features")(2).as("f2"), col("features")(3).as("f3"))),

    Q("x44_shard_assign",
      "Deterministic training-shard assignment (seed-stable global shuffle): shard = portable " +
        "id-hash mod 16, position = hash rank within the shard — (shard, pos) is a pure function " +
        "of the document id, so re-runs, retries, and parallelism changes reproduce byte-identical " +
        "training shards. One hash-shuffle + within-shard sort (the shard-write path; at 100 TB " +
        "shards outnumber cores so per-shard sorts stay small and parallel).",
      Some("""SELECT doc_id, shard,
             |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
             |FROM (SELECT doc_id,
             |        ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'shard'),1,15))::BIGINT AS h,
             |        ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'shard'),1,15))::BIGINT % 16 AS shard
             |      FROM documents) t
             |ORDER BY shard, pos""".stripMargin),
      (s, d) => TextStats.shardAssign(Tables.documents(s, d), "doc_id", nShards = 16)),

    Q("x45_vocab_oov",
      "Vocabulary coverage / OOV rate (tokenizer-prep): top-16 corpus vocabulary (count desc, " +
        "word asc tie-break) broadcast back over the same exploded-words subtree; per-doc " +
        "out-of-vocabulary token fraction as one bit-portable double division. The vocab side is " +
        "LIMIT-bounded — a model artifact, broadcast-sized at any corpus scale.",
      Some("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
             |v AS (SELECT word FROM (
             |  SELECT word, count(*) AS cnt FROM w GROUP BY word
             |  ORDER BY cnt DESC, word LIMIT 16) t)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(count(*) FILTER (WHERE word NOT IN (SELECT word FROM v)) AS BIGINT) AS n_oov,
             |  CAST(count(*) FILTER (WHERE word NOT IN (SELECT word FROM v)) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) AS oov_ratio
             |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.vocabCoverage(Tables.documents(s, d), vocabSize = 16)),

    Q("x46_split_overlap",
      "Split-contamination matrix: distinct word-5-gram shingles shared between every pair of " +
        "hash splits (train/eval), with per-split totals and shingle-set Jaccard — the corpus-level " +
        "leakage dashboard (x30 is the per-doc drill-down). One explode+distinct pass then a self " +
        "equi-join on the gram; each gram fans out at most |splits| ways, output |splits|^2 rows.",
      Some("""WITH s AS (SELECT
             |    CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 100 < 80
             |         THEN 'train' ELSE 'eval' END AS split,
             |    string_split(text, ' ') AS words FROM documents),
             |g AS (SELECT DISTINCT split, g FROM (
             |  SELECT split, unnest([array_to_string(words[i:i+4], ' ')
             |                        for i in range(1, len(words)-3)]) AS g
             |  FROM s) t),
             |t AS (SELECT split, count(*) AS n FROM g GROUP BY split),
             |pr AS (SELECT a.split AS split_a, b.split AS split_b
             |       FROM (SELECT DISTINCT split FROM g) a
             |       JOIN (SELECT DISTINCT split FROM g) b ON a.split < b.split),
             |p AS (SELECT a.split AS split_a, b.split AS split_b, count(*) AS n_shared
             |      FROM g a JOIN g b USING (g) WHERE a.split < b.split GROUP BY 1, 2)
             |SELECT pr.split_a, pr.split_b, CAST(COALESCE(p.n_shared, 0) AS BIGINT) AS n_shared,
             |  CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
             |  CAST(COALESCE(p.n_shared, 0) AS DOUBLE)
             |    / CAST(ta.n + tb.n - COALESCE(p.n_shared, 0) AS DOUBLE) AS jaccard
             |FROM pr LEFT JOIN p ON pr.split_a = p.split_a AND pr.split_b = p.split_b
             |JOIN t ta ON pr.split_a = ta.split JOIN t tb ON pr.split_b = tb.split""".stripMargin),
      (s, d) => TextDedup.splitOverlap(
        TextStats.hashSplit(Tables.loadFanout(s, d, "documents"), "doc_id", trainPct = 80),
        "split", n = 5)),

    Q("x47_strip_dup_spans",
      "Cross-document duplicated-span REMOVAL (x36's active sibling): drop every token position " +
        "covered by a word-8-gram occurring in another document and rebuild the surviving text in " +
        "order — remove-duplicated-passages, keep the unique remainder. Linear posting dataflow + " +
        "one anti-join + per-doc bounded reassembly; docs under 8 tokens survive verbatim, " +
        "fully-covered docs come back empty.",
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             |toks AS (SELECT doc_id, i AS tpos, words[i] AS tok
             |         FROM w, unnest(range(1, len(words)+1)) AS r(i)),
             |g AS (SELECT doc_id, i AS pos, array_to_string(words[i:i+7], ' ') AS gram
             |      FROM w, unnest(range(1, len(words)-6)) AS r(i)),
             |cd AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
             |cov AS (SELECT DISTINCT g.doc_id, g.pos + k AS tpos
             |        FROM g JOIN cd USING (gram), unnest(range(0, 8)) AS r(k)),
             |kept AS (SELECT t.doc_id, count(*) AS n_kept,
             |           string_agg(t.tok, ' ' ORDER BY t.tpos) AS cleaned
             |         FROM toks t ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
             |         GROUP BY t.doc_id)
             |SELECT w.doc_id, CAST(len(w.words) AS BIGINT) AS n_tokens,
             |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
             |  COALESCE(k.cleaned, '') AS cleaned
             |FROM w LEFT JOIN kept k USING (doc_id) ORDER BY doc_id""".stripMargin),
      (s, d) => TextDedup.stripDupSpans(Tables.loadFanout(s, d, "documents"), n = 8)),

    Q("x48_domain_mix",
      "Domain-mix rebalancing: hash-subsample each source down to target proportions " +
        "(src0:src1:src2 = 5:3:2, unlisted sources dropped) without upsampling — the binding " +
        "source keeps everything, the rest thin to match. Thresholds derived in pure integer " +
        "arithmetic from per-source counts so both engines agree exactly; same RNG-free " +
        "portable-hash determinism as x34.",
      Some("""WITH c AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
             |w AS (SELECT * FROM (VALUES ('src0', 5000), ('src1', 3000), ('src2', 2000))
             |      AS t(source, wbp)),
             |j AS (SELECT c.source, c.c, w.wbp FROM c JOIN w USING (source)),
             |b AS (SELECT c AS cb, wbp AS wb FROM j ORDER BY c * 10000 // wbp, source LIMIT 1),
             |th AS (SELECT j.source, least(10000, (j.wbp * b.cb * 10000) // (b.wb * j.c)) AS bp
             |       FROM j CROSS JOIN b)
             |SELECT d.doc_id, d.source,
             |  ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)||'mix'),1,15))::BIGINT % 10000 AS bucket
             |FROM documents d JOIN th USING (source)
             |WHERE ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)||'mix'),1,15))::BIGINT % 10000 < th.bp
             |ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.domainMix(Tables.documents(s, d),
        Map("src0" -> 5000, "src1" -> 3000, "src2" -> 2000))),

    Q("x49_quality_pctl_gate",
      "Per-domain quality-percentile gate: drop the floor(n*20/100) lowest-scored docs of each " +
        "source by stopword ratio (row_number, doc_id tie-break; integer quota so a 1-doc group " +
        "drops zero — a percent_rank cutoff would gut it) — the threshold-free curation rule that " +
        "adapts to heterogeneous domains where one global cutoff guts whole sources. One window " +
        "shuffle on the group key.",
      Some("""WITH s AS (SELECT doc_id, source,
             |    CAST(len(list_filter(string_split(text, ' '),
             |          w -> w IN ('the','and','of','to','in','a','is','that'))) AS BIGINT)
             |      / CAST(len(string_split(text, ' ')) AS BIGINT) AS score
             |  FROM documents),
             |r AS (SELECT doc_id, source, score,
             |    CAST(row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS BIGINT) AS rn,
             |    count(*) OVER (PARTITION BY source) AS n_docs
             |  FROM s)
             |SELECT doc_id, source, score FROM r
             |WHERE rn > (n_docs * 20) // 100 ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.qualityPercentileGate(Tables.documents(s, d),
        "source", dropBottomPct = 20)),

    Q("x50_group_centroids",
      "Per-label embedding centroids (SemDeDup cluster centers / classifier prototypes) over the " +
        "first 4 dims: sums on fixed-point integers (floor(v*1e6), the x37 idiom) so the aggregate " +
        "is partition-order-independent and engine-exact — a naive float sum is neither; mean is " +
        "one double division of exact longs. Single hash aggregate with map-side combine.",
      Some("""SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
             |    / CAST(count(*) * 1000000 AS BIGINT) AS c0,
             |  CAST(SUM(CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
             |    / CAST(count(*) * 1000000 AS BIGINT) AS c1,
             |  CAST(SUM(CAST(floor(CAST(embedding[3] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
             |    / CAST(count(*) * 1000000 AS BIGINT) AS c2,
             |  CAST(SUM(CAST(floor(CAST(embedding[4] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
             |    / CAST(count(*) * 1000000 AS BIGINT) AS c3
             |FROM embeddings GROUP BY label ORDER BY label""".stripMargin),
      (s, d) => Similarity.groupCentroids(Tables.embeddings(s, d), "label", dims = 4)),

    Q("x51_incremental_dedup",
      "Incremental near-dup dedup of a NEW batch against a standing corpus signature index — the " +
        "production shape at corpus scale: the corpus (hash-split 'train' side) is signed ONCE and " +
        "kept as an index; the arriving batch ('eval' side) signs only itself and probes the index " +
        "by LSH band bucket, so per-batch cost is O(batch), never O(corpus). Per batch doc: corpus " +
        "hits and smaller-id in-batch rivals at est_jaccard >= 0.5, and the keep verdict " +
        "(new-vs-corpus drop + keep-min-id within the batch). Index-side buckets capped at 256 " +
        "like candidatePairsFrom's in-batch cap, so a boilerplate bucket can't fan every batch " +
        "doc out by its full index population.",
      Some(incrementalDedupOracle),
      (s, d) => {
        val split = TextStats.hashSplit(Tables.documents(s, d), "doc_id", trainPct = 80)
        // sign the batch ONCE (the streaming ingest caller's idiom): the
        // verdict path consumes the batch signatures four times (band
        // keys, bucket probe, in-batch rivals, verdict universe), and
        // un-checkpointed each consumer re-runs the shingle/minhash
        // aggregation (ScanAudit: 7 documents scans in this plan)
        val batchSigs = TextDedup.minhashSignaturesPortable(
          split.filter(col("split") === "eval")).localCheckpoint(false)
        TextDedup.incrementalDedup(
          TextDedup.minhashSignaturesPortable(split.filter(col("split") === "train")),
          batchSigs)
      }),

    Q("x52_kmeans_fit",
      "Exact-arithmetic k-means fit (the published SemDeDup clustering shape): 8 cells from the " +
        "deterministic stride init, two Lloyd iterations, then each vector's cell under the final " +
        "centroids plus the cell population. Centroid means sum fixed-point longs (floor(v*1e6), " +
        "the x50 idiom) so the fit is partition-order-independent and engine-exact — a float-mean " +
        "fit is neither; assignment is cosine over doubles with (sim desc, cell_id) tie-breaks. " +
        "Per iteration: one broadcast join (centroids are always broadcast-sized) + one " +
        "(cell, dim) hash aggregate with map-side combine — linear in the corpus, no all-pairs " +
        "work, the coarse-quantizer training loop an IVF index needs at 10^9 vectors.",
      Some(kmeansOracle),
      (s, d) => Similarity.kmeansFitExact(Tables.embeddings(s, d), c = 8, iters = 2)),

    Q("x53_semdedup_kmeans",
      "SemDeDup as published (Abbas et al. 2023): k-means cells from the exact-arithmetic fit " +
        "(x52), cosine near-dup pairs generated only WITHIN each cell, pair chains collapsed to " +
        "whole components (keep min vec_id per cluster) — same output contract as x35, which " +
        "buckets by random hyperplanes instead of trained cells. Within-cell pairing is an " +
        "equi-join on cell_id, never corpus-wide all-pairs; per-cell work is bounded by scaling " +
        "c with the corpus (SemDeDup's own k ~ n recipe, the same population argument as the " +
        "LSH bucket cap).",
      Some(semDedupKmeansOracle),
      (s, d) => Similarity.semDedupKmeans(Tables.embeddings(s, d))),

    Q("x54_bm25_retrieval",
      "BM25 ranked retrieval over a distributed inverted index — the primitive behind " +
        "retrieval-based decontamination and targeted data selection. Posting lists from one " +
        "explode-aggregate (per-doc length rides along, no doc-length join), df re-aggregated " +
        "from the postings (exchange reuse, the x26 shape), corpus totals a 1-row broadcast; " +
        "query terms (self-derived mid-df band: ranks 11-16 paired into 3 two-term queries) " +
        "broadcast into the postings so scoring touches only query-term postings. RATIONAL idf " +
        "(N - df + 0.5)/(df + 0.5) — every step an IEEE op on exact-integer-derived doubles " +
        "(ln is the one BM25 piece libm rounds differently across engines; the standard ln form " +
        "ships as TextRank.bm25(lnIdf = true), spec-tested); per-term scores rounded once to " +
        "Decimal(38,6) and summed in decimal (the x41 idiom) keep the doc totals " +
        "partition-order-independent and oracle-exact. Top-5 per query by bounded-heap window.",
      Some(bm25Oracle),
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tf = graft.ext.TextRank.postings(docs).localCheckpoint(false)
        graft.ext.TextRank.bm25(docs,
          graft.ext.TextRank.midFrequencyQueries(docs, postingsOpt = Some(tf)),
          postingsOpt = Some(tf))
      }),

    Q("x55_temperature_mix",
      "Temperature-scaled (alpha = 1/2) domain resampling — the multilingual-training mixture " +
        "rule at the one alpha where it is oracle-exact: p^0.5 is sqrt, which IEEE 754 requires " +
        "correctly rounded, where pow/exp are libm-divergent cross-engine (the x41 boundary). " +
        "Downsample-only closed form: the binding source is the smallest (c/sqrt(c) = sqrt(c)), " +
        "and source i thins to sqrt(c_i * c_b) docs via one mirrored float expression (exact " +
        "long product, one sqrt, one divide, floor to basis points) gated by the x48 " +
        "portable-hash bucket — RNG-free, so re-runs reproduce the exact sample.",
      Some("""WITH c AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
             |b AS (SELECT c AS cb FROM c ORDER BY c, source LIMIT 1),
             |th AS (SELECT c.source,
             |       least(10000, CAST(floor((10000.0 * sqrt(CAST(c.c * b.cb AS DOUBLE))) / CAST(c.c AS DOUBLE)) AS BIGINT)) AS bp
             |       FROM c CROSS JOIN b)
             |SELECT d.doc_id, d.source,
             |  ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)||'mix'),1,15))::BIGINT % 10000 AS bucket
             |FROM documents d JOIN th USING (source)
             |WHERE ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)||'mix'),1,15))::BIGINT % 10000 < th.bp
             |ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.temperatureMix(Tables.documents(s, d))),

    Q("x56_hard_negatives",
      "Hard-negative mining for contrastive/embedding training: per anchor vector, the top-5 " +
        "most-similar corpus vectors with a DIFFERENT label — the maximally-confusable " +
        "non-matches that actually move a contrastive loss. x06's cost shape (broadcast anchors, " +
        "bounded-heap top-k, rank-only fp-independence) with the label inequality riding the " +
        "join condition; labels rejoin the O(anchors x k) result map-side.",
      Some("""SELECT qid, rank, neighbor_id, neg_label FROM (
             |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id, e.label AS neg_label,
             |         row_number() OVER (PARTITION BY q.vec_id
             |                            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rank
             |  FROM embeddings q JOIN embeddings e
             |    ON e.vec_id != q.vec_id AND e.label != q.label
             |  WHERE q.vec_id < 10) t
             |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.hardNegatives(emb.filter(col("vec_id") < 10), emb, 5)
      }),

    Q("x57_bpe_fit",
      "BPE tokenizer training (Sennrich et al. 2016) — the corpus-scale count-merge loop: 4 " +
        "learned merges as the model artifact (rank, pair, merged symbol, weighted count). " +
        "Trains on the word-count VOCABULARY (one corpus pass, then corpus-size-independent " +
        "iterations); each iteration is one weighted pair aggregate + a TakeOrdered top-1 kept " +
        "as a 1-row broadcast (no driver collect) + a merge application that is a BUILTIN " +
        "string replace: symbols ride delimiter-wrapped in one string, so replacing the wrapped " +
        "pair IS the leftmost-greedy BPE merge step, identically in both engines — strings and " +
        "integer counts only, oracle-exact with no float idioms. Ties break (count desc, left, " +
        "right).",
      Some(bpeFitOracle),
      (s, d) => graft.ext.Bpe.fit(Tables.documents(s, d), 4)),

    Q("x58_bpe_encode",
      "BPE tokenization under the x57 fit: per-document token count after 4 merges plus the " +
        "word count — the corpus re-tokenization that follows tokenizer training (token budgets, " +
        "packing inputs, compression-ratio quality signals). Per-word token counts live on the " +
        "vocab-sized frame and docs join it by word; the fit chain is shared lazily, so the " +
        "merge loop runs once.",
      Some(bpeEncodeOracle),
      (s, d) => graft.ext.Bpe.encode(Tables.documents(s, d), 4)),

    Q("x59_dsir_select",
      "DSIR-shaped data selection (Xie et al. 2023): raw-corpus docs scored by target-likeness " +
        "under hashed unigram+bigram models (64 buckets, Laplace-smoothed; target = src0, raw = " +
        "rest), top-20 kept. The paper's log-ratio sum is libm-bound, so the score is the " +
        "RATIONAL likelihood-ratio sum (the x41/x54 boundary): per-bucket ratio one IEEE " +
        "division of exact-integer-derived doubles, per-doc terms rounded once to Decimal(38,6) " +
        "and summed in decimal. One corpus-sized explode->aggregate, 64-row broadcast models, " +
        "TakeOrdered top-k.",
      Some("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
             |g AS (
             |  SELECT doc_id, source, unnest(words) AS gram FROM w
             |  UNION ALL
             |  SELECT doc_id, source, array_to_string(words[CAST(i AS INT):CAST(i + 1 AS INT)], ' ') AS gram
             |  FROM w, unnest(range(1, len(words))) u(i)),
             |db AS (SELECT doc_id, source,
             |         ('0x'||substr(md5(gram||'dsir'),1,15))::BIGINT % 64 AS bucket,
             |         count(*) AS c
             |       FROM g GROUP BY 1, 2, 3),
             |m AS (SELECT bucket,
             |        SUM(CASE WHEN source = 'src0' THEN c ELSE 0 END) AS cp,
             |        SUM(CASE WHEN source <> 'src0' THEN c ELSE 0 END) AS cq
             |      FROM db GROUP BY 1),
             |t AS (SELECT SUM(cp) AS tp, SUM(cq) AS tq FROM m),
             |r AS (SELECT bucket,
             |        CAST((cp + 1) * (tq + 64) AS DOUBLE) / CAST((cq + 1) * (tp + 64) AS DOUBLE) AS ratio
             |      FROM m CROSS JOIN t),
             |s AS (SELECT db.doc_id, db.source,
             |        CAST(SUM(CAST(db.c * r.ratio AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS sc
             |      FROM db JOIN r USING (bucket) WHERE db.source <> 'src0' GROUP BY 1, 2)
             |SELECT doc_id, source, CAST(sc AS VARCHAR) AS score
             |FROM s ORDER BY sc DESC, doc_id LIMIT 20""".stripMargin),
      (s, d) => TextStats.dsirSelect(Tables.documents(s, d), "src0")),

    Q("x60_chunk_overlap",
      "Fixed-size overlapping token-window chunking (RAG/retrieval ingest): 32-token windows " +
        "every 24 tokens, so consecutive chunks share 8 tokens of context; tail chunks run short " +
        "but are never empty and never fully contained in their predecessor (a start past 0 must " +
        "contribute tokens beyond the overlap — duplicate chunks would be duplicate embeddings " +
        "downstream). Scan->generate->project with ZERO shuffles — each output row materializes " +
        "only its own window slice, so total work is the expected size/stride corpus expansion, " +
        "and chunk rows inherit the scan's partitioning for downstream embed/index stages.",
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             |c AS (SELECT doc_id, words, CAST(i AS BIGINT) AS chunk_idx
             |      FROM w, unnest(range(0, ((greatest(len(words) - 8, 1) - 1) // 24) + 1)) u(i))
             |SELECT doc_id, chunk_idx,
             |  array_to_string(words[CAST(chunk_idx*24 + 1 AS INT):CAST(chunk_idx*24 + 32 AS INT)], ' ')
             |    AS chunk_text,
             |  CAST(least(32, len(words) - chunk_idx*24) AS BIGINT) AS n_tokens
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, d) => TextStats.chunk(Tables.documents(s, d), 32, 8)),

    Q("x61_epoch_order",
      "Deterministic global training order for one epoch WITHOUT a global sort: x44's (shard, " +
        "within-shard hash rank) plus the shard's prefix count gives an exact permutation 1..N. " +
        "Ordering windows are per-shard (bounded tasks) plus one 16-row cumulative sum broadcast " +
        "back — the block-shuffle every at-scale training loader uses; a global row_number would " +
        "serialize 100 TB through one task. Salt-keyed, so re-runs and retries reproduce the epoch " +
        "byte-identically and the next epoch is just a new salt.",
      Some("""WITH h AS (SELECT doc_id,
             |        ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'epoch0'),1,15))::BIGINT AS h
             |      FROM documents),
             |s AS (SELECT doc_id, h, h % 16 AS shard FROM h),
             |r AS (SELECT doc_id, shard,
             |        CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
             |      FROM s),
             |c AS (SELECT shard, count(*) AS n FROM s GROUP BY 1),
             |o AS (SELECT shard, COALESCE(SUM(n) OVER (ORDER BY shard
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM c)
             |SELECT r.doc_id, r.shard, CAST(o.off + r.pos AS BIGINT) AS epoch_pos
             |FROM r JOIN o USING (shard) ORDER BY epoch_pos""".stripMargin),
      (s, d) => TextStats.epochOrder(Tables.documents(s, d))),

    Q("x62_source_overlap",
      "Corpus-pair overlap matrix: shingle-set Jaccard for every source pair, BOTH as the " +
        "per-source MinHash sketch estimate (agreeing components / 16 — a dyadic rational, " +
        "bit-identical cross-engine) and exactly (hash-set intersection / union, one IEEE " +
        "division of exact integers). The sketch collapses the corpus to 16 longs per source " +
        "before any pairing — the 100 TB artifact; the exact companion is one keyed equi-join " +
        "on distinct shingle hashes, emitted because pair count is source-bounded. The " +
        "cross-corpus-dedup prioritization signal before mixing.",
      Some {
        val agree = (0 until graft.ext.TextDedup.NumHashes)
          .map(i => s"(CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH sh AS (
           |  SELECT DISTINCT source, ('0x'||substr(md5(shingle),1,15))::BIGINT AS h0
           |  FROM (SELECT source, unnest([array_to_string(words[i:i+2], ' ') for i in range(1, len(words)-1)]) AS shingle
           |        FROM (SELECT source, string_split(text, ' ') AS words FROM documents) t
           |        WHERE len(words) >= 3) u),
           |sig AS (SELECT source, $sigColsSql FROM sh GROUP BY source),
           |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
           |iv AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS ni
           |       FROM sh a JOIN sh b ON a.h0 = b.h0 AND a.source < b.source GROUP BY 1, 2),
           |p AS (SELECT x.source AS source_a, y.source AS source_b,
           |        CAST($agree AS DOUBLE) / ${graft.ext.TextDedup.NumHashes}.0 AS est_jaccard
           |      FROM sig x JOIN sig y ON x.source < y.source)
           |SELECT p.source_a, p.source_b, p.est_jaccard,
           |  CAST(COALESCE(iv.ni, 0) AS BIGINT) AS n_inter,
           |  CAST(COALESCE(iv.ni, 0) AS DOUBLE)
           |    / CAST(za.n + zb.n - COALESCE(iv.ni, 0) AS DOUBLE) AS exact_jaccard
           |FROM p LEFT JOIN iv ON p.source_a = iv.source_a AND p.source_b = iv.source_b
           |JOIN sz za ON za.source = p.source_a
           |JOIN sz zb ON zb.source = p.source_b
           |ORDER BY p.source_a, p.source_b""".stripMargin
      },
      (s, d) => graft.ext.TextDedup.sourceOverlap(Tables.documents(s, d))),

    Q("x63_dedup_keep_best",
      "Quality-aware dedup keep-rule: x33's near-dup clusters, but the surviving representative " +
        "is the BEST copy (longest, ties to the larger id), not the first — the keep-rule real " +
        "pipelines want. The argmax is a struct max inside ONE component-keyed aggregate (no " +
        "window, no per-cluster sort, map-side partials) — the cheapest cost class for the job.",
      Some("""WITH RECURSIVE
             |s AS (
             |  SELECT doc_id, lang, len(words) AS n_tokens,
             |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents WHERE doc_id < 300) t
             |  WHERE len(words) >= 4),
             |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
             |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |       WHERE len(list_intersect(a.sh, b.sh)) >= 1),
             |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
             |walk(node, lab) AS (
             |  SELECT DISTINCT a, a FROM e
             |  UNION
             |  SELECT e.a, w.lab FROM e JOIN walk w ON e.b = w.node),
             |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node),
             |r AS (SELECT s.doc_id, COALESCE(c.component, s.doc_id) AS component, s.n_tokens
             |      FROM s LEFT JOIN comp c ON s.doc_id = c.node),
             |sel AS (SELECT component, doc_id, n_tokens,
             |          count(*) OVER (PARTITION BY component) AS cluster_size,
             |          row_number() OVER (PARTITION BY component
             |            ORDER BY n_tokens DESC, doc_id DESC) AS rn
             |        FROM r)
             |SELECT CAST(component AS BIGINT) AS component, doc_id AS keep_id,
             |       CAST(n_tokens AS BIGINT) AS keep_score,
             |       CAST(cluster_size AS BIGINT) AS cluster_size
             |FROM sel WHERE rn = 1 ORDER BY component""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val edges = TextDedup.sharedShingleEdges(docs, "lang", 4)
        val assigned = graft.operators.ConnectedComponents.assign(
          docs.filter(size(graft.functions.word_shingles(col("text"), 4)) > 0),
          edges, "doc_id", "doc_a", "doc_b")
        TextDedup.keepBestPerCluster(assigned,
          docs.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("score")))
      }),

    Q("x64_hybrid_rrf",
      "Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009): BM25 and TF-IDF top-20 " +
        "lists per query fused by score = sum of 1/(60 + rank), top-5 kept — the standard " +
        "robust fusion for multi-ranker retrieval stacks (only RANKS cross between score " +
        "spaces, so incomparable scales can't dominate). The two rankers share their " +
        "posting-list and df subtrees verbatim, so the corpus-wide explode-aggregate is " +
        "computed ONCE per plan (exchange reuse, the x26/x54 shape); the fusion itself " +
        "aggregates O(queries x 40) rows. 1/(60 + rank) is one IEEE division of " +
        "exact-integer-derived doubles rounded once to Decimal(38,6) and summed in decimal " +
        "(the x41 idiom) — oracle-exact.",
      Some(hybridRrfOracle),
      (s, d) => {
        val docs = Tables.documents(s, d)
        // one checkpointed postings frame feeds the query derivation and
        // BOTH rankers (the optimizer never reused the identical subtrees)
        val tf = graft.ext.TextRank.postings(docs).localCheckpoint(false)
        graft.ext.TextRank.hybridRrf(docs,
          graft.ext.TextRank.midFrequencyQueries(docs, postingsOpt = Some(tf)),
          postingsOpt = Some(tf))
      }),

    Q("x65_bigram_lm_fit",
      "Add-one-smoothed bigram LM training — the model artifact x41-style scorers consume: " +
        "P(w2|w1) = (c(w1,w2)+1)/(c(w1,.)+V) over the corpus, top-50 bigrams by count as the " +
        "model head. Three shrinking aggregates: pair counts from one explode (map-side " +
        "partials), the w1 marginal re-aggregated from the PAIR COUNTS (vocab-sized input, " +
        "never the corpus), V as a 1-row broadcast; top-50 plans as TakeOrderedAndProject. " +
        "The probability is one IEEE division of exact-integer-derived doubles rounded once " +
        "to Decimal(38,6) — oracle-exact. Model size is vocab-bounded, not corpus-bounded.",
      Some("""WITH g AS (SELECT words[i] AS w1, words[i+1] AS w2
             |           FROM (SELECT string_split(text, ' ') AS words FROM documents) t,
             |                unnest(range(1, len(words))) u(i)
             |           WHERE len(words) >= 2),
             |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n FROM g GROUP BY w1, w2),
             |m AS (SELECT w1, CAST(SUM(pair_n) AS BIGINT) AS w1_n FROM pc GROUP BY w1),
             |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM pc),
             |top AS (SELECT * FROM pc ORDER BY pair_n DESC, w1, w2 LIMIT 50)
             |SELECT top.w1, top.w2, top.pair_n,
             |  CAST(CAST(CAST(top.pair_n + 1 AS DOUBLE) / CAST(m.w1_n + v.v AS DOUBLE)
             |       AS DECIMAL(38,6)) AS VARCHAR) AS cond_p
             |FROM top JOIN m USING (w1), v
             |ORDER BY pair_n DESC, w1, w2""".stripMargin),
      (s, d) => TextStats.bigramLmFit(Tables.documents(s, d))),

    Q("x66_knn_jl_project",
      "KNN under Johnson-Lindenstrauss ±1 projection (Achlioptas 2003): embeddings projected " +
        "64-d float -> 16-d double by a literal sign matrix, cosine top-5 in the projected " +
        "space — the dimensionality-reduction scale path for ANN: 4x fewer bytes per vector, " +
        "4x fewer multiplies per distance, JL's distance-preservation bound keeping recall " +
        "(measured vs exact x06 in SimilaritySpec). Projection and per-vector norms are " +
        "map-side, computed once; scoring is the x06 broadcast + bounded-heap shape " +
        "(shuffle carries O(queries x k)). Rank-only output; the oracle replays projection, " +
        "norm, and cosine as the same left-associated IEEE folds bit-for-bit.",
      Some(knnJlOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.knnJl(emb.filter(col("vec_id") < 10), emb, 5)
      }),

    Q("x67_pagerank_dup",
      "PageRank (3 iterations, damping 0.85) over the x63 shared-shingle near-dup graph — " +
        "the iterative-graph family beyond CC's reachability: within a near-dup cluster the " +
        "highest-PR doc is the most-CENTRAL copy (shares content with the most copies, " +
        "weighted by their promiscuity), a keep-rule signal complementary to x63's quality " +
        "argmax. Each iteration is one edge-list join on the source endpoint + one " +
        "contribution aggregate on the destination (the canonical distributed formulation; " +
        "state is only the O(nodes) rank vector). Naive double PR is partition-order-" +
        "DEPENDENT; per-edge contributions pr/deg are rounded once to Decimal(38,6) and " +
        "summed in decimal, damping constants Double.toString round-tripped — oracle-exact " +
        "((1.0 - 0.85) is not the double nearest 0.15).",
      Some(pagerankOracle),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val nodes = docs
          .filter(size(graft.functions.word_shingles(col("text"), 4)) > 0)
          .select(col("doc_id"))
        val edges = TextDedup.sharedShingleEdges(docs, "lang", 4)
        graft.operators.PageRank.run(nodes, edges, "doc_id", "doc_a", "doc_b")
      }),

    Q("x68_cdc_chunks",
      "Content-defined chunking (the Rabin/FastCDC shape, window 8 / divisor 64) + per-doc " +
        "chunk-dedup accounting: a cut lands wherever the windowed portable hash divides, so " +
        "boundaries move WITH the content — shifted/edited copies still share every downstream " +
        "chunk, which fixed-size blocking can never see. Per-position hashing is map-side " +
        "inside one transform over the scan; the chunk-hash doc-frequency aggregate and the " +
        "join back share their exchange; one doc-keyed aggregate summarizes. Output per doc: " +
        "chunk count, chunks also present in ANOTHER doc, and the dedupable chars they cover.",
      Some("""WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM documents),
             |c AS (SELECT doc_id, text, len,
             |        CASE WHEN len >= 9
             |             THEN [i for i in range(8, len) if ('0x'||substr(md5(substr(text, CAST(i - 7 AS INT), 8)),1,15))::BIGINT % 64 = 0]
             |             ELSE CAST([] AS BIGINT[]) END AS cuts
             |      FROM d),
             |seg AS (SELECT doc_id, text, len,
             |        list_prepend(CAST(1 AS BIGINT), [x + 1 for x in cuts]) AS starts,
             |        list_append(cuts, len) AS ends FROM c),
             |ch AS (SELECT doc_id, ends[u.i] - starts[u.i] + 1 AS clen,
             |              md5(substr(text, CAST(starts[u.i] AS INT), CAST(ends[u.i] - starts[u.i] + 1 AS INT))) AS h
             |       FROM seg, unnest(range(1, len(starts) + 1)) u(i)),
             |hc AS (SELECT h, count(DISTINCT doc_id) AS nd FROM ch GROUP BY h)
             |SELECT ch.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(SUM(CASE WHEN hc.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
             |  CAST(SUM(CASE WHEN hc.nd > 1 THEN ch.clen ELSE 0 END) AS BIGINT) AS shared_chars
             |FROM ch JOIN hc USING (h)
             |GROUP BY ch.doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => TextDedup.cdcDedupStats(Tables.loadFanout(s, d, "documents"))),

    Q("x69_vocab_growth",
      "Vocabulary-growth (Heaps'-law) curve over 10 doc-id buckets: per-bucket tokens, words " +
        "FIRST seen there, cumulative vocabulary and token totals — the dataset-card curve " +
        "that says whether more data still buys new vocabulary. Bucketing is map-side integer " +
        "arithmetic against a broadcast 1-row max (no global sort); first-seen is one " +
        "min-aggregate on the exploded words; the cumulative window orders 10 rows, never the " +
        "corpus.",
      Some("""WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
             |db AS (SELECT doc_id, text, CAST((doc_id * 10) // (mx + 1) AS BIGINT) AS bucket FROM documents, mx),
             |w AS (SELECT bucket, unnest(string_split(text, ' ')) AS word FROM db),
             |wf AS (SELECT word, MIN(bucket) AS bucket FROM w WHERE len(word) > 0 GROUP BY word),
             |nw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new_words FROM wf GROUP BY bucket),
             |tk AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens FROM w WHERE len(word) > 0 GROUP BY bucket)
             |SELECT tk.bucket, tk.n_tokens,
             |  CAST(COALESCE(nw.n_new_words, 0) AS BIGINT) AS n_new_words,
             |  CAST(SUM(COALESCE(nw.n_new_words, 0)) OVER (ORDER BY tk.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size,
             |  CAST(SUM(tk.n_tokens) OVER (ORDER BY tk.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tokens_cum
             |FROM tk LEFT JOIN nw ON tk.bucket = nw.bucket
             |ORDER BY tk.bucket""".stripMargin),
      (s, d) => TextStats.vocabGrowth(Tables.documents(s, d))),

    Q("x70_skew_diagnostics",
      "Key-skew diagnostics over the events fact's type key — the measurement that decides " +
        "between the plain join, AQE skew splitting, and Salt.saltedJoin, and sizes the salt " +
        "count when salting wins: per-key share in basis points and suggested_salts = " +
        "ceil(max/mean) in exact integer arithmetic ((max*n_keys + n_rows - 1) DIV n_rows). " +
        "One key-count aggregate with map-side partials, a 1-row global rollup broadcast " +
        "back, a bounded-heap top-10 — nothing beyond key cardinality shuffles.",
      Some("""WITH c AS (SELECT event_type AS key, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY event_type),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
             |             CAST(MAX(cnt) AS BIGINT) AS max_cnt FROM c),
             |t AS (SELECT key, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, key) AS INT) AS rank FROM c)
             |SELECT rank, key, cnt,
             |  CAST(cnt * 10000 // n_rows AS BIGINT) AS share_bp,
             |  CAST((max_cnt * n_keys + n_rows - 1) // n_rows AS BIGINT) AS suggested_salts,
             |  n_keys, n_rows
             |FROM t, g WHERE rank <= 10 ORDER BY rank""".stripMargin),
      (s, d) => graft.operators.Salt.skewDiagnostics(
        Tables.events(s, d), "event_type")),

    Q("x71_cdc_incremental",
      "Incremental CDC dedup against a STANDING chunk-hash index — x51's arrival pattern at " +
        "chunk granularity: the corpus split (portable-hash 80%) contributes its distinct " +
        "chunk hashes as the index (grows with DISTINCT content, not arrivals), each new-batch " +
        "doc is chunked and probed by ONE hash equi-join — per-batch cost O(batch), never " +
        "O(corpus). Content-defined boundaries make the probe byte-offset-robust: a new doc " +
        "embedding shifted corpus content still hits on every preserved chunk (CdcSpec), " +
        "which whole-doc hashing cannot see. Per new doc: chunks, corpus hits, novel chars.",
      Some(cdcIncrementalOracle),
      (s, d) => {
        val docs = Tables.loadFanout(s, d, "documents")
        val isCorpus = pmod(TextDedup.portableHashBuiltin(
          col("doc_id").cast("string"), ""), lit(100)) < 80
        TextDedup.cdcIncremental(docs.filter(isCorpus), docs.filter(!isCorpus))
      }),

    Q("x72_source_tv_distance",
      "Pairwise source distributional distance: total variation over 64 hashed unigram " +
        "buckets — the mixture-design signal (how DIFFERENT two domains' token distributions " +
        "are, DSIR/domain-weighting adjacent), complementary to x62's overlap matrix (how much " +
        "content they SHARE). TV over KL precisely because it is libm-free: per-bucket " +
        "0.5*|p-q| terms are IEEE ops on exact-integer-derived doubles rounded once to " +
        "Decimal(38,6) and summed in decimal. One explode -> (source,bucket) count, totals " +
        "re-aggregated from the counts, the full grid from a generate (missing buckets are " +
        "REAL zeros), then a bucket-keyed self-join over |sources|x64 rows — " +
        "corpus-size-independent past the first aggregate.",
      Some("""WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
             |c AS (SELECT source, CAST(('0x'||substr(md5(word),1,15))::BIGINT % 64 AS INT) AS bucket,
             |             CAST(count(*) AS BIGINT) AS c
             |      FROM w WHERE len(word) > 0 GROUP BY source, bucket),
             |n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY source),
             |g AS (SELECT n.source, n.n, CAST(u.b AS INT) AS bucket FROM n, unnest(range(0, 64)) u(b)),
             |p AS (SELECT g.source, g.bucket, CAST(COALESCE(c.c, 0) AS DOUBLE) / CAST(g.n AS DOUBLE) AS p
             |      FROM g LEFT JOIN c ON g.source = c.source AND g.bucket = c.bucket)
             |SELECT a.source AS source_a, b.source AS source_b,
             |  CAST(CAST(SUM(CAST(0.5 * abs(a.p - b.p) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS tv_distance
             |FROM p a JOIN p b ON a.bucket = b.bucket AND a.source < b.source
             |GROUP BY a.source, b.source ORDER BY source_a, source_b""".stripMargin),
      (s, d) => TextStats.sourceTvDistance(Tables.documents(s, d))),

    Q("x73_lsh_s_curve",
      "LSH S-curve planning table: for every bands x rows factorization of the 16-hash MinHash " +
        "signature and a 19-point similarity grid, the candidate probability 1 - (1 - s^r)^b — " +
        "the justification-as-data for the engine's own 4x4 split (steep section at the 0.5 " +
        "dedup threshold). Integer exponents as unrolled left-associated multiply chains (no " +
        "pow — libm-divergent cross-engine); each unioned frame is constant-(b,r) so the " +
        "chains unroll at plan time; the grid is config, not data (the literal-matrix class).",
      Some(lshSCurveOracle),
      (s, d) => TextDedup.lshSCurve(s)),

    Q("x74_media_dedup",
      "Exact media dedup by payload content hash over the binary media table — the storage " +
        "accounting every large media corpus runs first: one md5(payload) hash aggregate with " +
        "map-side partials; payloads never shuffle (only the 16-byte hash and byte count do). " +
        "Per distinct payload: copy count, min-id keeper, and the bytes dedup reclaims. " +
        "Perceptual near-dup swaps the hash for decoded features through the same dataflow — " +
        "x77 runs that path with a REAL javax.imageio codec.",
      Some("""SELECT md5(text) AS payload_hash,
             |  CAST(strlen(text) AS BIGINT) AS n_bytes,
             |  CAST(count(*) AS BIGINT) AS n_copies,
             |  MIN(doc_id) AS keep_id,
             |  CAST((count(*) - 1) * strlen(text) AS BIGINT) AS bytes_saved
             |FROM documents
             |GROUP BY md5(text), strlen(text)
             |ORDER BY payload_hash""".stripMargin),
      (s, d) => Multimodal.dedupExact(Multimodal.asMediaTable(Tables.documents(s, d)))),

    Q("x75_quality_dup_calibration",
      "Quality-vs-duplication calibration over the x63 near-dup graph: token-count deciles x " +
        "dup incidence — the dataset-card table answering 'is quality predictive of " +
        "duplication?' (if low-quality deciles carry the dup mass, filter-first beats " +
        "dedup-first). Dup incidence needs no CC: an edge ENDPOINT is by definition in a >=2 " +
        "cluster, so one distinct over edge endpoints suffices. Deciles by ntile over the " +
        "deterministic (score, id) order on the bounded profiling sample; dup rate in exact " +
        "basis points.",
      Some("""WITH s AS (
             |  SELECT doc_id, lang, CAST(len(words) AS BIGINT) AS score,
             |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents WHERE doc_id < 300) t
             |  WHERE len(words) >= 4),
             |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
             |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |       WHERE len(list_intersect(a.sh, b.sh)) >= 1),
             |dup AS (SELECT a AS doc_id FROM e0 UNION SELECT b FROM e0),
             |d AS (SELECT s.doc_id, s.score,
             |        CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
             |        ntile(10) OVER (ORDER BY s.score, s.doc_id) AS decile
             |      FROM s LEFT JOIN dup ON s.doc_id = dup.doc_id)
             |SELECT CAST(decile AS INT) AS decile, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(is_dup) AS BIGINT) AS n_dup,
             |  CAST(SUM(is_dup) * 10000 // count(*) AS BIGINT) AS dup_rate_bp,
             |  CAST(MIN(score) AS BIGINT) AS min_score, CAST(MAX(score) AS BIGINT) AS max_score
             |FROM d GROUP BY decile ORDER BY decile""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val withShingles = docs
          .filter(size(graft.functions.word_shingles(col("text"), 4)) > 0)
        val scored = withShingles.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("score"))
        val edges = TextDedup.sharedShingleEdges(docs, "lang", 4)
        TextDedup.dupCalibration(scored, edges)
      }),

    Q("x76_effective_tokens",
      "Effective token budget after dedup, per source — the planning table that turns a raw " +
        "corpus inventory into what training actually sees: per source, raw docs/tokens vs the " +
        "docs/tokens SURVIVING the x63 quality-aware keep-rule (best copy per near-dup " +
        "cluster), with the survival share in exact basis points. A source whose token count " +
        "collapses here is duplicate-heavy inventory, not data. Composes the proven x63 chain " +
        "(shared-shingle graph -> CC -> struct-max keep) with one source-keyed aggregate; the " +
        "survivors semi-join is on the component-count-sized keep set.",
      Some("""WITH RECURSIVE
             |s AS (
             |  SELECT doc_id, lang, source, CAST(len(words) AS BIGINT) AS n_tokens,
             |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS words FROM documents WHERE doc_id < 300) t
             |  WHERE len(words) >= 4),
             |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
             |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |       WHERE len(list_intersect(a.sh, b.sh)) >= 1),
             |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
             |walk(node, lab) AS (
             |  SELECT DISTINCT a, a FROM e
             |  UNION
             |  SELECT e.a, w.lab FROM e JOIN walk w ON e.b = w.node),
             |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node),
             |r AS (SELECT s.doc_id, s.source, s.n_tokens,
             |             COALESCE(c.component, s.doc_id) AS component
             |      FROM s LEFT JOIN comp c ON s.doc_id = c.node),
             |sel AS (SELECT doc_id, source, n_tokens,
             |          row_number() OVER (PARTITION BY component
             |            ORDER BY n_tokens DESC, doc_id DESC) AS rn
             |        FROM r)
             |SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
             |  CAST(SUM(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
             |  CAST(SUM(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) * 10000 // SUM(n_tokens) AS BIGINT) AS kept_share_bp
             |FROM sel GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val universe = docs
          .filter(size(graft.functions.word_shingles(col("text"), 4)) > 0)
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        val edges = TextDedup.sharedShingleEdges(docs, "lang", 4)
        val assigned = graft.operators.ConnectedComponents.assign(
          universe.select(col("doc_id")), edges, "doc_id", "doc_a", "doc_b")
        val keepIds = TextDedup.keepBestPerCluster(assigned,
            universe.select(col("doc_id"), col("n_tokens").as("score")))
          .select(col("keep_id").as("doc_id")).withColumn("__keep", lit(1))
        universe.join(keepIds, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(when(col("__keep").isNotNull, 1L).otherwise(0L)).as("n_docs_kept"),
            sum(when(col("__keep").isNotNull, col("n_tokens")).otherwise(0L))
              .as("n_tokens_kept"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("n_docs_kept"), col("n_tokens_kept"),
            expr("CAST(n_tokens_kept * 10000 DIV n_tokens AS BIGINT)")
              .as("kept_share_bp"))
      }),

    Q("x77_image_phash_dedup",
      "Perceptual media dedup through a REAL codec (round-8: the fakeDecode seam made real): " +
        "each doc renders to a real PNG (javax.imageio encode) plus a +4-brightened twin — " +
        "different bytes, so x74's exact byte-hash dedup sees 2N distinct payloads — then both " +
        "decode back through the media seam (ImageIO read) into 8x8 average-hash perceptual " +
        "signatures, which pair every twin with its original: clusters of exactly 2, decoded " +
        "mean-luminance gap of exactly 4. Both exactness claims are algebraic, not empirical " +
        "(integer cross-multiplied hash bits cancel a uniform shift; integer luminance sums " +
        "over a power-of-two pixel count divide exactly in IEEE — Multimodal.aHashOf), which " +
        "is what lets the oracle predict the clusters from content identity alone, no codec " +
        "in DuckDB. Render/encode/decode all partition-local; payloads never shuffle.",
      // The oracle derives clusters from TEXT IDENTITY rather than
      // hardcoding clusters-of-2 (round-8 advisory): identical text →
      // identical md5 seed → identical rendered image → the originals
      // AND twins of both docs merge into one aHash cluster of 2·k.
      // The corpus generator deliberately plants exact duplicates for
      // the dedup queries, so a testdata regeneration that duplicated
      // a text under id 200 would have broken the hardcoded form in a
      // confusing way; grouping by text makes the oracle invariant to
      // that. (Residual assumption: no accidental 64-bit aHash
      // collision between DIFFERENT texts — astronomically unlikely
      // and not plantable by the generator.) lum_gap stays exactly 4.0
      // regardless of k: every member pairs a base-luminance original
      // with a +4-shifted twin, and both shifts are exact integers.
      Some("""WITH g AS (SELECT min(doc_id) AS keep_id,
             |    CAST(2 * count(*) AS BIGINT) AS n_copies
             |  FROM documents WHERE doc_id < 200 GROUP BY text)
             |SELECT keep_id, n_copies,
             |  CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
             |  CAST(4.0 AS DOUBLE) AS lum_gap
             |FROM g ORDER BY keep_id""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
        val media = Multimodal.pngPairsFromDocs(s, docs)
        Multimodal.perceptualClusters(Multimodal.decodeImages(s, media))
          .select(col("keep_id"), col("n_copies"), col("width"), col("height"),
            col("lum_gap"))
      }),

    Q("x78_ann_recall",
      "ANN recall@5 as DATA (round-8): per query vector, how many of the exact brute-force " +
        "top-5 the multi-probe LSH recovered — the x73/x75 'justify the approximation with a " +
        "measured table' pattern applied to the knn family (tools.RecallSweep productionized). " +
        "Composes the two proven paths (x06 brute, x19 multi-probe) through one " +
        "O(queries x k) equi-join + agg; recall_bp is exact-integer basis points.",
      Some(annRecallOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 10)
        Similarity.annRecall(
          Similarity.knnBrute(q, emb, 5),
          Similarity.knnLshMultiProbe(q, emb, 5))
      }),

    Q("x79_minhash_calibration",
      "MinHash estimator-error calibration (round-8): |signature-estimated - exact| Jaccard " +
        "per LSH candidate pair, binned into an exact-integer basis-point histogram — the " +
        "measured counterpart to x73's theoretical S-curve, on THIS corpus, reusing the x05 " +
        "verification join. err_bp = |m*u - 16*i| * 10000 DIV (16*u): no float ever enters, " +
        "so the histogram hash-matches cross-engine; est = m/16 recovers m exactly (powers " +
        "of two are exact IEEE).",
      Some(minhashCalibrationOracle),
      (s, d) => TextDedup.minhashErrorCalibration(Tables.documents(s, d))),

    Q("x80_bloom_dedup",
      "Approximate-membership dedup against a reference corpus (round-8): corpus prefix " +
        "fingerprints build distributed bloom bits (only bits travel), batch fingerprints " +
        "probe scan-local, one exact key-only join verifies — the cheap first gate of " +
        "'drop anything we already trained on', with the bloom's error contract as the " +
        "oracled row (x13/x40 pattern): n_missed is exactly 0 (blooms have no false " +
        "negatives), the FP rate carries a generous deterministic bound flag, and the " +
        "exact dup counts hash-match.",
      Some("""WITH d AS (SELECT doc_id,
             |    md5(array_to_string((string_split(text, ' '))[1:3], ' ')) AS fp
             |  FROM documents),
             |c AS (SELECT DISTINCT fp FROM d WHERE doc_id % 5 != 0),
             |b AS (SELECT doc_id, fp FROM d WHERE doc_id % 5 = 0)
             |SELECT CAST((SELECT count(*) FROM b) AS BIGINT) AS n_batch,
             |  CAST((SELECT count(*) FROM b WHERE fp IN (SELECT fp FROM c)) AS BIGINT) AS n_true_dups,
             |  CAST(0 AS BIGINT) AS n_missed,
             |  CAST(1 AS INT) AS fp_in_bound""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          md5(concat_ws(" ", slice(split(col("text"), " "), 1, 3))).as("fp"))
        TextDedup.bloomMembershipStats(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(5)) === 0))
      }),

    Q("x81_audio_features",
      "REAL audio through the media seam (round-8, the x77 pattern for sound): per doc a " +
        "square-wave tone with id-derived half-period and amplitude, encoded as honest " +
        "RIFF/WAVE PCM16 bytes, decoded back through the JDK codec (javax.sound.sampled " +
        "parses the container), integer-exact features extracted from the PCM frames " +
        "(zero-crossing count, peak, absolute sum - the energy/ZCR descriptor class). " +
        "Every feature of a square wave is closed-form, so the oracle predicts the DECODED " +
        "values from ids alone - no audio stack in DuckDB. Synth/encode/decode all " +
        "partition-local; payloads never shuffle.",
      Some("""SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
             |  CAST(2000 AS BIGINT) AS n_samples,
             |  CAST(1999 // (4 + doc_id % 13) AS BIGINT) AS zero_crossings,
             |  CAST(1000 + 10 * doc_id AS BIGINT) AS peak_abs,
             |  CAST(2000 * (1000 + 10 * doc_id) AS BIGINT) AS sum_abs
             |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val ids = Tables.documents(s, d).filter(col("doc_id") < 100).select(col("doc_id"))
        Multimodal.decodeAudioTable(s, Multimodal.wavTableFromIds(s, ids))
          .select(col("doc_id"), col("sample_rate"), col("n_samples"),
            col("zero_crossings"), col("peak_abs"), col("sum_abs"))
      }),

    Q("x82_padding_efficiency",
      "Padding-efficiency table for length-bucketed batching (round-8): per power-of-two " +
        "token-length bucket, the exact integer share of batch slots padding would waste, " +
        "plus one global row pricing the no-bucketing alternative (pad everything to the " +
        "longest doc's bucket) - the training-infra accounting that justifies length " +
        "bucketing as data. The pow2 bucket is a generated integer CASE chain on BOTH " +
        "engines (no log2/power libm float - the x41 boundary); waste_bp is integer " +
        "basis points.",
      Some {
        val cases = TextStats.pow2BucketSqlCases("len(string_split(text, ' '))")
        s"""WITH t AS (SELECT CAST($cases AS BIGINT) AS bucket_max,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
           |per AS (SELECT bucket_max, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
           |  FROM t GROUP BY bucket_max),
           |g AS (SELECT CAST(max(bucket_max) AS BIGINT) AS bucket_max,
           |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
           |    CAST(sum(sum_tokens) AS BIGINT) AS sum_tokens FROM per)
           |SELECT 'bucket' AS scope, bucket_max, n_docs, sum_tokens,
           |  CAST((n_docs * bucket_max - sum_tokens) * 10000 // (n_docs * bucket_max) AS BIGINT) AS waste_bp
           |FROM per
           |UNION ALL
           |SELECT 'global' AS scope, bucket_max, n_docs, sum_tokens,
           |  CAST((n_docs * bucket_max - sum_tokens) * 10000 // (n_docs * bucket_max) AS BIGINT) AS waste_bp
           |FROM g
           |ORDER BY scope, bucket_max""".stripMargin
      },
      (s, d) => TextStats.paddingEfficiency(Tables.documents(s, d))),

    Q("x83_tokenizer_fertility",
      "Tokenizer fertility per source (round-8): chars-per-token and tokens-per-word in exact " +
        "integer basis points under the x57-trained BPE merges - the dataset-card table behind " +
        "'how well does the tokenizer fit each slice of the mix'; a source whose chars/token " +
        "collapses toward 1 is one the vocabulary serves badly and its token budget inflates. " +
        "Composes the proven x58 encode chain (merge loop runs once, per-word counts on the " +
        "vocab-sized frame) with one source-keyed aggregate.",
      Some(bpeFertilityOracle),
      (s, d) => graft.ext.Bpe.fertilityBySource(Tables.documents(s, d), 4)),

    Q("x84_semantic_decontamination",
      "Semantic decontamination (round-8): per EVAL-split vector (vec_id % 5 = 0), the count " +
        "of train-split vectors above cosine threshold in its LSH bucket, the exact max " +
        "cosine, and a contaminated flag - the embedding-space analogue of gram-overlap " +
        "decontamination (x30/x46): paraphrased benchmark content shares no 5-gram but still " +
        "lands next to its source in embedding space. Candidates from the shared-bucket " +
        "equi-join, never a cross product; max is single IEEE comparisons (no accumulation), " +
        "so even the float column hash-matches. Threshold 0.35 is demonstrative, the x15 note.",
      Some(s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
             |e AS (SELECT vec_id AS eval_id, embedding AS ev, bucket FROM b WHERE vec_id % 5 = 0),
             |t AS (SELECT vec_id AS train_id, embedding AS tv, bucket FROM b WHERE vec_id % 5 != 0),
             |h AS (SELECT e.eval_id, CAST(count(*) AS BIGINT) AS n,
             |        max(${cosSql("e.ev", "t.tv")}) AS mc
             |      FROM e JOIN t ON e.bucket = t.bucket
             |      WHERE ${cosSql("e.ev", "t.tv")} >= 0.35
             |      GROUP BY e.eval_id)
             |SELECT e.eval_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_train_hits,
             |  h.mc AS max_cos,
             |  CAST(CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END AS INT) AS contaminated
             |FROM e LEFT JOIN h USING (eval_id) ORDER BY e.eval_id""".stripMargin),
      (s, d) => Similarity.semanticDecontamination(
        Tables.embeddings(s, d), pmod(col("vec_id"), lit(5)) === 0, 0.35)),

    Q("x85_gif_frame_sample",
      "REAL frame sampling from a moving-picture container (round-8: the frame-sample stub " +
        "made real): per doc an id-derived number of growing-bar frames encoded as an honest " +
        "multi-frame animated GIF (JDK writer sequence API), frames extracted back through " +
        "the JDK GIF reader, every 2nd kept, decoded mean luminance per kept frame. Binary " +
        "frames round-trip the palette codec pixel-exact, and the bar geometry makes every " +
        "sampled frame's luminance closed-form in (id, frame) - the oracle predicts REAL " +
        "frame-extraction output from ids alone (the x81 pattern for animation). " +
        "Synth/encode/decode partition-local; payloads never shuffle.",
      Some("""WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS n FROM documents WHERE doc_id < 50),
             |f AS (SELECT doc_id, n, CAST(u.f AS INT) AS frame_idx
             |      FROM d, unnest(range(0, n, 2)) u(f))
             |SELECT doc_id, frame_idx, CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
             |  CAST(255 * (((frame_idx + 1) * 32) // (n + 1)) * 32 AS DOUBLE) / 1024 AS mean_lum
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin),
      (s, d) => {
        val ids = Tables.documents(s, d).filter(col("doc_id") < 50).select(col("doc_id"))
        Multimodal.sampleGifFrames(s, Multimodal.gifTableFromIds(s, ids), stride = 2)
      }),

    Q("x86_file_ingest_phash",
      "Object-store ingest shape under the oracle gate (round-9, r8-verdict item 5): the " +
        "x77 PNG-pair corpus written as REAL FILES (<id>.png, the curated-dump layout), " +
        "ingested back through Spark's binaryFile source (mediaTableFromFiles with " +
        "filename-derived ids), decoded with the real ImageIO codec, perceptually " +
        "clustered. Same algebraic oracle as x77 (clusters from text identity alone, no " +
        "codec in DuckDB) — what is new under the gate is the FILES path: binaryFile " +
        "splits per file, decode parallelizes partition-local, payloads never shuffle. " +
        "Was test-only (ExtSpec); now every round re-proves it against the hash gate.",
      Some("""WITH g AS (SELECT min(doc_id) AS keep_id,
             |    CAST(2 * count(*) AS BIGINT) AS n_copies
             |  FROM documents WHERE doc_id < 100 GROUP BY text)
             |SELECT keep_id, n_copies,
             |  CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
             |  CAST(4.0 AS DOUBLE) AS lum_gap
             |FROM g ORDER BY keep_id""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val dir = scratchTempDir("graft-x86-media")
        Multimodal.writePngPairsDir(s, docs, dir)
        val media = Multimodal.mediaTableFromFiles(s, dir, glob = "*.png",
          idPattern = "/(\\d+)\\.png$")
        Multimodal.perceptualClusters(Multimodal.decodeImages(s, media))
          .select(col("keep_id"), col("n_copies"), col("width"), col("height"),
            col("lum_gap"))
      }),

    Q("x87_video_phash_dedup",
      "Video-style perceptual dedup (round-9, r8-verdict item 6 — x85 ∘ x77): per id a " +
        "REAL multi-frame animated GIF of seed-random two-gray frames plus a " +
        "palette-brightened twin (same patterns, +4 on both gray levels — different " +
        "bytes, identical per-frame aHash by the shift-invariance algebra), frames " +
        "extracted through the JDK GIF reader, every 2nd sampled, ordered per-frame " +
        "aHashes folded into one 64-bit animation signature, clusters grouped on it. " +
        "Frame extraction FEEDS dedup rather than ending at luminance: the cluster " +
        "count, sampled-frame count, and exact integer luminance gap " +
        "(4 × 1024 × sampled frames) are all closed-form in the id — no codec in the " +
        "oracle. Codec + hash work partition-local; only (doc_id, sig, counters) rows " +
        "shuffle, frame pixels never do.",
      Some("""SELECT doc_id AS keep_id, CAST(2 AS BIGINT) AS n_copies,
             |  CAST((3 + doc_id % 3 + 1) // 2 AS INT) AS n_frames_sampled,
             |  CAST(4096 * ((3 + doc_id % 3 + 1) // 2) AS BIGINT) AS lum_gap_units
             |FROM documents WHERE doc_id < 60 ORDER BY keep_id""".stripMargin),
      (s, d) => {
        val ids = Tables.documents(s, d).filter(col("doc_id") < 60).select(col("doc_id"))
        Multimodal.videoPerceptualClusters(s, Multimodal.gifPairsFromIds(s, ids), stride = 2)
          .select(col("keep_id"), col("n_copies"), col("n_frames_sampled"),
            col("lum_gap_units"))
      }),

    Q("x88_knn_ivfpq",
      "IVF-PQ composite ANN (round-9; round-10 RESIDUAL encoding, FAISS parity) — the " +
        "production vector-store layout: inverted-file cells prune candidates to nprobe " +
        "probes (x14), in-cell scoring runs against PQ reconstructions of each vector's " +
        "RESIDUAL vs its cell centroid (codebooks from an offset-stride sample's " +
        "residuals; centroid added back at decode) so the codeword budget spends itself " +
        "on within-cell differences, a bounded-heap shortlist of 12 per query survives, " +
        "and ONLY the shortlist touches raw embeddings for the exact re-rank. Full " +
        "vectors are read O(queries x shortlist) times — the compressed-first/exact-last " +
        "ladder that makes 10^9-vector ANN affordable. The oracle replays cells, " +
        "residualization, codebooks, encode, reconstruction, probe, shortlist, and " +
        "re-rank bit-exactly.",
      Some(knnIvfPqOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        // centroids (C rows) and codebooks (m·k rows) are kilobyte model
        // artifacts each consumed by several downstream branches; without
        // the checkpoint every reference re-derives them with a FULL
        // corpus scan (the round-10 ScanAudit finding: 21 embeddings
        // scans in this one plan). Same values, lineage cut once.
        val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        val cb = Similarity.pqResidualCodebooks(emb, centroids).localCheckpoint(false)
        Similarity.knnIvfPq(emb.filter(col("vec_id") < 10), emb, centroids, cb,
          k = 5, nprobe = 4, shortlist = 12)
      }),

    Q("x89_ivfpq_recall",
      "Recall@5 LOSS DECOMPOSITION for the IVF-PQ path (round-9) — x78's 'justify the " +
        "approximation with a measured table' pattern, upgraded to attribute each loss " +
        "source: per query, brute-force top-5 recovery by IVF with EXACT in-cell scoring " +
        "(recall_ivf_bp — cell-pruning loss only, the nprobe/C ceiling) and by the full " +
        "compressed-first/exact-last ladder (recall_ivfpq_bp — pruning PLUS true neighbors " +
        "displaced from the shortlist by PQ quantization error); the gap between the two " +
        "columns IS the quantization cost, as exact-integer basis points. Absolute recall " +
        "sits in the documented ladder for this deliberately worst-case uniform-cosine " +
        "corpus (LSH 0.03 / multi-probe 0.14 / JL 0.14, the x66 note) — real embedding " +
        "corpora cluster, which is what every one of these structures exploits.",
      Some(ivfPqRecallOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 10)
        // kilobyte model artifacts, checkpointed so each of their many
        // consumers reads memory instead of re-scanning the corpus
        // (ScanAudit: 20 embeddings scans here before the cut)
        val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        val cb = Similarity.pqResidualCodebooks(emb, centroids).localCheckpoint(false)
        // both ladders probe the same index: assign once, checkpoint,
        // share (the round-10 assignedOpt seam)
        val assigned = Similarity.ivfAssign(emb, centroids).localCheckpoint(false)
        // truth table feeds BOTH recall arms: checkpoint it so the
        // brute-force corpus scan runs once (round-16 optimization round)
        val brute = Similarity.knnBrute(q, emb, 5).localCheckpoint(false)
        val rIvf = Similarity.annRecall(brute,
            Similarity.knnIvf(q, emb, centroids, k = 5, nprobe = 4,
              assignedOpt = Some(assigned)))
          .select(col("qid"), col("n_true"), col("n_hits").as("hits_ivf"),
            col("recall_bp").as("recall_ivf_bp"))
        val rPq = Similarity.annRecall(brute,
            Similarity.knnIvfPq(q, emb, centroids, cb, k = 5, nprobe = 4, shortlist = 12,
              assignedOpt = Some(assigned)))
          .select(col("qid"), col("n_hits").as("hits_ivfpq"),
            col("recall_bp").as("recall_ivfpq_bp"))
        rIvf.join(rPq, Seq("qid"))
      }),

    Q("x90_sketch_rollup",
      "RE-AGGREGATABLE sketch rollup (round-9) — the warehouse pattern x13 stops short of: " +
        "per-(event_type, day) DataSketches-HLL partials (hll_sketch_agg, binary column — " +
        "what a daily rollup TABLE stores), then a second-level merge across days per type " +
        "(hll_union_agg) answers the global distinct question WITHOUT re-scanning raw " +
        "events — the two-level shape that makes distinct-counting O(days x types x " +
        "sketch_bytes) instead of O(raw) at query time. Oracled by the x13 error " +
        "contract: exact distinct rides along, merged_ok asserts the merged estimate " +
        "landed within 5% (lgConfigK=12 => ~1.6% rsd), and n_days pins the partial count " +
        "so a silently-collapsed first level can't pass.",
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
             |  CAST(1 AS INT) AS merged_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        val partials = ev.groupBy(col("event_type"), col("day"))
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        val merged = partials.groupBy(col("event_type").as("et"))
          .agg(count(lit(1)).as("n_days"),
            hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx"))
        val exact = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users_exact"))
        exact.join(merged, col("event_type") <=> col("et"))
          .select(col("event_type"), col("n_days"), col("n_users_exact"),
            (abs(col("approx") - col("n_users_exact")) <= col("n_users_exact") * 0.05)
              .cast("int").as("merged_ok"))
      }),

    Q("x91_jsonl_ingest",
      "Gzipped-JSONL corpus interchange under the hash gate (round-9) — the de-facto LLM " +
        "corpus wire format (one JSON doc per line, .jsonl.gz shards) had no ingest path " +
        "under the gate: documents export to REAL gzip JSONL (Spark json writer, one shard " +
        "per partition), re-ingest through spark.read.schema(...).json (explicit schema — " +
        "inference is a second corpus scan and a 100 TB anti-pattern), and the round-trip " +
        "proves itself content-exact via an ORDER-INSENSITIVE per-source checksum — the " +
        "exact decimal SUM of per-doc md5-prefix60 hashes over (doc_id ':' text), which the " +
        "oracle computes from the parquet ORIGINALS — any dropped doc, swapped id, mangled " +
        "unicode escape, or re-split line breaks the sum. Order-insensitivity is the scale " +
        "property: a hash-SUM is one map-side-combined aggregate (no per-group collect, no " +
        "sort), so the same integrity check runs unchanged over 100 TB of shards. The " +
        "oracle never touches the JSONL files, so the temp-dir path stays out of the " +
        "static SQL (the x86 idiom). Gzip decompression is splittable per-FILE: one shard " +
        "per input partition keeps the read parallel at corpus scale.",
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |  CAST(CAST(SUM(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':'||text),1,15))::BIGINT)
             |       AS DECIMAL(38,0)) AS VARCHAR) AS content_sum
             |FROM documents WHERE doc_id < 500 GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
          .select(col("doc_id"), col("source"), col("text"), col("lang"))
        val dir = scratchTempDir("graft-x91-jsonl") + "/docs"
        docs.write.option("compression", "gzip").json(dir)
        val back = s.read
          .schema("doc_id LONG, source STRING, text STRING, lang STRING")
          .json(dir)
        val h = graft.functions.md5_prefix60(
          concat(col("doc_id").cast("string"), lit(":"), col("text")).cast("binary"))
        back.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("n_chars"),
            sum(h.cast("decimal(38,0)")).cast("decimal(38,0)").cast("string")
              .as("content_sum"))
      }),

    Q("x93_kmeans_inertia",
      "K-means convergence as DATA (round-10): the x52 fit loop run to caller-chosen depth " +
        "(4 Lloyd iterations here vs x52's fixed 2) with the objective emitted per " +
        "iteration - inertia = sum of floor((1 - best_cos) * 1e6) under the centroids " +
        "entering each iteration, an order-insensitive integer SUM (x41 idiom). The " +
        "non_increasing flag is honest: this fit assigns by cosine but updates by " +
        "arithmetic mean (unnormalized spherical k-means), so monotonicity is an " +
        "OBSERVATION the table reports, not a theorem it assumes - the x78/x89 " +
        "'justify the approximation with a measured table' pattern applied to the fit " +
        "itself. Each iteration stays one broadcast assign + one fixed-point mean " +
        "aggregate; depth adds serial iterations, never corpus passes.",
      Some(kmeansInertiaOracle(4)),
      (s, d) => Similarity.kmeansInertia(Tables.embeddings(s, d), c = 8, iters = 4)),

    Q("x92_clustered_recall",
      "Clustered-corpus ANN recall (round-10) — the x89 loss decomposition re-run at " +
        "IDENTICAL index parameters (stride-62 cells, nprobe 4, 16 PQ codewords, shortlist " +
        "12) over a corpus DERIVED to have the cluster structure real embedding corpora " +
        "have: v_i = center(vec_id % 13) + 0.3 * e_i with centers drawn from the corpus " +
        "itself, rows (vec_id % 13) * 38 (Similarity.clusteredCorpus; 13 clusters because the " +
        "stride-62 cell sampling walks cluster ids 10m mod 13, coprime, so cell anchors " +
        "cover every cluster as the corpus grows). On x89's " +
        "deliberately worst-case uniform corpus the same index reads recall_ivf ~0.58; " +
        "here the cell-pruning loss column collapses toward zero because same-cluster " +
        "neighbors co-locate in probed cells — the evidence that IVF exploits exactly the " +
        "structure the uniform benchmark denies it. The remaining recall_ivfpq gap is pure " +
        "quantization displacement — measurably narrowed by the round-10 residual encoding " +
        "(sf0.1 shortlist-12: raw-PQ 0.02 vs residual 0.32; SCALING.md round-10 A/B).",
      Some(clusteredRecallOracle),
      (s, d) => {
        // the derived corpus feeds eight downstream branches (queries,
        // centroids, codebooks, brute, both ladders); checkpoint it so
        // the derivation join runs once, not per branch
        val emb = Similarity.clusteredCorpus(Tables.embeddings(s, d))
          .localCheckpoint(false)
        val q = emb.filter(col("vec_id") < 10)
        // tiny model artifacts: materialize once for their many consumers
        val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        val cb = Similarity.pqResidualCodebooks(emb, centroids).localCheckpoint(false)
        // both ladders probe the same index: assign once, checkpoint,
        // share (the round-10 assignedOpt seam)
        val assigned = Similarity.ivfAssign(emb, centroids).localCheckpoint(false)
        // truth table feeds BOTH recall arms: checkpoint it so the
        // brute-force corpus scan runs once (round-16 optimization round)
        val brute = Similarity.knnBrute(q, emb, 5).localCheckpoint(false)
        val rIvf = Similarity.annRecall(brute,
            Similarity.knnIvf(q, emb, centroids, k = 5, nprobe = 4,
              assignedOpt = Some(assigned)))
          .select(col("qid"), col("n_true"), col("n_hits").as("hits_ivf"),
            col("recall_bp").as("recall_ivf_bp"))
        val rPq = Similarity.annRecall(brute,
            Similarity.knnIvfPq(q, emb, centroids, cb, k = 5, nprobe = 4, shortlist = 12,
              assignedOpt = Some(assigned)))
          .select(col("qid"), col("n_hits").as("hits_ivfpq"),
            col("recall_bp").as("recall_ivfpq_bp"))
        rIvf.join(rPq, Seq("qid"))
      }),

    Q("x94_cluster_safe_split",
      "Cluster-safe train/val/test split (round-10): every near-dup CLUSTER — not every " +
        "document — hashes to a split, so no two near-duplicates ever straddle a train/eval " +
        "boundary. The per-doc-hash counterfactual ships alongside as split_naive with a " +
        "per-cluster leaky bit, quantifying exactly the eval contamination the safe split " +
        "prevents (any >=2 cluster straddles naive 80/10/10 splits ~31% of the time for " +
        "k=2). Composes the proven x63 chain (shared-shingle graph -> CC) with the x34/x48 " +
        "portable-hash mixing idiom on the component id; past the CC assignment the split " +
        "is one component-keyed aggregate plus map-side hashing at any corpus size.",
      Some("""WITH RECURSIVE
             |s AS (
             |  SELECT doc_id, lang,
             |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents WHERE doc_id < 300) t
             |  WHERE len(words) >= 4),
             |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
             |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |       WHERE len(list_intersect(a.sh, b.sh)) >= 1),
             |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
             |walk(node, lab) AS (
             |  SELECT DISTINCT a, a FROM e
             |  UNION
             |  SELECT e.a, w.lab FROM e JOIN walk w ON e.b = w.node),
             |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node),
             |d AS (SELECT doc_id FROM documents WHERE doc_id < 300),
             |r AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
             |      FROM d LEFT JOIN comp c ON d.doc_id = c.node),
             |sp AS (SELECT doc_id, component,
             |         ('0x'||substr(md5(CAST(component AS VARCHAR)||'split'),1,15))::BIGINT % 10 AS bs,
             |         ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'split'),1,15))::BIGINT % 10 AS bn
             |       FROM r),
             |lk AS (SELECT component, CASE WHEN min(bn) <> max(bn) THEN 1 ELSE 0 END AS leaky
             |       FROM sp GROUP BY component)
             |SELECT sp.doc_id, CAST(sp.component AS BIGINT) AS component,
             |  CASE WHEN bs < 8 THEN 'train' WHEN bs < 9 THEN 'val' ELSE 'test' END AS split_safe,
             |  CASE WHEN bn < 8 THEN 'train' WHEN bn < 9 THEN 'val' ELSE 'test' END AS split_naive,
             |  CAST(lk.leaky AS INT) AS leaky
             |FROM sp JOIN lk USING (component)""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        TextDedup.clusterSafeSplit(docs,
          TextDedup.sharedShingleEdges(docs, "lang", 4))
      }),

    Q("x95_pii_scrub",
      "PII scrub (round-10): count and redact emails and phone numbers per document — the " +
        "pre-training privacy pass every corpus release runs first. Deterministic PII is " +
        "INJECTED in-query from doc_id (the x40/x77 generation idiom: doc_id%3 plants an " +
        "email, doc_id%4 a 555-line, some docs get both, most neither) so the scrub is " +
        "exercised against known ground truth; match counts are taken on the original text " +
        "so replacement order can't shift them. Pure map-side codegen'd regex — no UDF, no " +
        "shuffle, embarrassingly parallel at any corpus size; patterns stay in the " +
        "Java/RE2 dialect intersection so the oracle replays them verbatim.",
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    text || CASE WHEN doc_id % 3 = 0
             |                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
             |                 ELSE '' END
             |         || CASE WHEN doc_id % 4 = 0
             |                 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
             |                 ELSE '' END AS txt
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(txt, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS BIGINT) AS n_email,
             |  CAST(len(regexp_extract_all(txt, '555-[0-9]{4}')) AS BIGINT) AS n_phone,
             |  regexp_replace(regexp_replace(txt, '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
             |                 '555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
             |FROM t""".stripMargin),
      (s, d) => {
        val injected = Tables.loadFanout(s, d, "documents").select(
          col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                lit("@example.com now"))).otherwise(""),
            when(col("doc_id") % 4 === 0,
              concat(lit(" call 555-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
                lit(" today"))).otherwise("")).as("txt"))
        TextStats.piiScrub(injected, "txt",
            Seq(("email", "[a-z0-9]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>"),
                ("phone", "555-[0-9]{4}", "<PHONE>")))
          .select(col("doc_id"), col("n_email"), col("n_phone"), col("scrubbed"))
      }),

    Q("x96_weighted_sample",
      "Exact-size weighted sample without replacement (round-10): sequential Poisson " +
        "sampling (Ohlsson 1998, the pps design statistical agencies use) — priority = " +
        "hash(id) DIV weight, sample = global 100 smallest — cutting a corpus to an exact " +
        "doc budget with inclusion probability ~ proportional to token count, in ONE pass. " +
        "Distinct from the rate-based mixers (x34/x55 keep a FRACTION per stratum, x31 is " +
        "uniform-per-source): per-DOC weights, exact output size. All arithmetic is 64-bit " +
        "integer (60-bit portable hash, one BIGINT DIV) so the sample is RNG-free and " +
        "engine-portable; the n-smallest selection plans as TakeOrderedAndProject " +
        "(per-partition bounded heaps) — the corpus never shuffles.",
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'pps'),1,15))::BIGINT AS h
             |  FROM documents)
             |SELECT doc_id, source, n_tokens, h // n_tokens AS priority
             |FROM t WHERE n_tokens > 0
             |ORDER BY priority, doc_id LIMIT 100""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        TextStats.weightedSample(docs, col("n_tokens"), 100)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("priority"))
      }),

    Q("x97_sample_allocation",
      "Weighted-sample allocation calibration (round-10): per source, the x96 sample's " +
        "actual share vs the weight-proportional expectation, in exact integer basis " +
        "points — the x75/x79 'justify the approximation with a measured table' pattern " +
        "applied to sequential Poisson sampling (its pps inclusion probabilities are " +
        "approximate at finite n; this table shows how close, as data). One corpus " +
        "aggregate + one sample-sized aggregate + a 1-row broadcast total attach; all " +
        "integer DIV arithmetic, so the table hash-matches cross-engine.",
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'pps'),1,15))::BIGINT AS h
             |  FROM documents),
             |smp AS (SELECT source FROM (
             |  SELECT source, h // n_tokens AS priority, doc_id
             |  FROM t WHERE n_tokens > 0
             |  ORDER BY priority, doc_id LIMIT 100)),
             |ps AS (SELECT source, COUNT(*) AS n_docs,
             |         CAST(SUM(n_tokens) AS BIGINT) AS sum_w
             |       FROM t GROUP BY source),
             |tot AS (SELECT CAST(SUM(sum_w) AS BIGINT) AS total_w FROM ps),
             |sc AS (SELECT source, COUNT(*) AS n_sampled FROM smp GROUP BY source)
             |SELECT ps.source, ps.n_docs, ps.sum_w,
             |  COALESCE(sc.n_sampled, 0) AS n_sampled,
             |  sum_w * 10000 // total_w AS expected_bp,
             |  COALESCE(sc.n_sampled, 0) * 100 AS actual_bp
             |FROM ps LEFT JOIN sc USING (source) CROSS JOIN tot""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        val sample = TextStats.weightedSample(docs, col("n_tokens"), 100)
        val perSource = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_w"))
        val total = perSource.agg(sum(col("sum_w")).cast("long").as("total_w"))
        val sampled = sample.groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"))
        perSource.join(sampled, Seq("source"), "left")
          .crossJoin(broadcast(total))
          .select(col("source"), col("n_docs"), col("sum_w"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
            expr("sum_w * 10000 div total_w").as("expected_bp"),
            (coalesce(col("n_sampled"), lit(0L)) * lit(100L)).as("actual_bp"))
      }),

    Q("x98_weighted_sample_threshold",
      "The x96 sample through its large-n scale path (round-10): a deterministic " +
        "hash-bucket pilot estimates a priority threshold, only rows under it reach the " +
        "exact n-smallest selection, so per-partition heaps and the final merge scale with " +
        "the ~n*safety survivor set instead of n x partitions — with a provable " +
        "row-identity guarantee (>= n survivors means the global top-n all survive the " +
        "filter) verified by one count, falling back to the single-pass form otherwise. " +
        "Row-identical to x96 by construction, so the oracle IS x96's SQL — the q43/q44 " +
        "'the safe rewrite must not change a single row' pattern.",
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'pps'),1,15))::BIGINT AS h
             |  FROM documents)
             |SELECT doc_id, source, n_tokens, h // n_tokens AS priority
             |FROM t WHERE n_tokens > 0
             |ORDER BY priority, doc_id LIMIT 100""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        TextStats.weightedSampleThreshold(docs, col("n_tokens"), 100)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("priority"))
      }),

    Q("x99_quantile_rollup",
      "RE-AGGREGATABLE quantile rollup (round-10) — x90's warehouse pattern for " +
        "percentiles: per-(event_type, day) KLL sketch partials (custom " +
        "TypedImperativeAggregate over DataSketches KLL, binary column — what a daily " +
        "rollup TABLE stores), then a second-level merge across days per type answers " +
        "p50/p90 WITHOUT re-scanning raw events — O(days x types x sketch_bytes) at query " +
        "time. KLL's compaction draws real randomness, so (like x90's HLL estimate) the " +
        "sketch values are consumed through an error contract: the EXACT discrete " +
        "quantiles ride along (rank-window arithmetic in pure integers, the value at rank " +
        "ceil(q*n) of the per-type value sort — an actual data point, so it hash-matches " +
        "cross-engine), ok50/ok90 assert the merged estimate landed inside a +-10-rank-" +
        "point window (k=200 => ~1.65% rank error at 99% confidence; the window is ~6 of " +
        "those), and n_days pins the partial count so a collapsed first level can't pass. " +
        "The exact side's per-type sort exists to FEED the contract; the production path " +
        "is the sketch rollup.",
      Some("""WITH e AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, value
             |  FROM events WHERE value IS NOT NULL),
             |r AS (SELECT event_type, value,
             |        row_number() OVER (PARTITION BY event_type ORDER BY value) AS r,
             |        count(*) OVER (PARTITION BY event_type) AS n
             |      FROM e),
             |d AS (SELECT event_type, CAST(count(DISTINCT day) AS BIGINT) AS n_days
             |      FROM e GROUP BY event_type),
             |x AS (SELECT event_type,
             |        MAX(CASE WHEN r = (n+1)//2 THEN value END) AS exact_p50,
             |        MAX(CASE WHEN r = (9*n+9)//10 THEN value END) AS exact_p90
             |      FROM r GROUP BY event_type)
             |SELECT x.event_type, d.n_days, x.exact_p50, x.exact_p90,
             |  CAST(1 AS INT) AS ok50, CAST(1 AS INT) AS ok90
             |FROM x JOIN d USING (event_type) ORDER BY event_type""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
        val partials = ev.groupBy(col("event_type"), col("day"))
          .agg(graft.functions.kll_sketch_agg(col("value")).as("sk"))
        val merged = partials.groupBy(col("event_type").as("et"))
          .agg(count(lit(1)).as("n_days"),
            graft.functions.kll_merge_agg(col("sk")).as("mrg"))
          .select(col("et"), col("n_days"),
            graft.functions.kll_quantile(col("mrg"), lit(0.5)).as("est50"),
            graft.functions.kll_quantile(col("mrg"), lit(0.9)).as("est90"))
        val ranked = ev.select(col("event_type"), col("value"))
          .withColumn("r", row_number().over(
            Window.partitionBy("event_type").orderBy(col("value"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        def at(rank: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          max(when(col("r") === rank, col("value")))
        val exact = ranked.groupBy(col("event_type")).agg(
          at(expr("(n+1) div 2")).as("exact_p50"),
          at(expr("(9*n+9) div 10")).as("exact_p90"),
          at(expr("(4*n+9) div 10")).as("lo50"),
          at(expr("(6*n+9) div 10")).as("hi50"),
          at(expr("(8*n+9) div 10")).as("lo90"),
          max(col("value")).as("hi90"))
        exact.join(merged, col("event_type") <=> col("et"))
          .select(col("event_type"), col("n_days"),
            col("exact_p50"), col("exact_p90"),
            (col("est50") >= col("lo50") && col("est50") <= col("hi50"))
              .cast("int").as("ok50"),
            (col("est90") >= col("lo90") && col("est90") <= col("hi90"))
              .cast("int").as("ok90"))
      }),

    Q("x100_incremental_cc",
      "Incremental connected components (round-10): the near-dup graph folded in TWO " +
        "arrival batches (edges split by portable pair-hash) through " +
        "ConnectedComponents.incrementalAssign — each batch contracts standing components " +
        "to their min-id representatives, runs mini-CC over O(batch) contracted edges, and " +
        "relabels the standing table through a BROADCAST remap (never a shuffle of " +
        "history), so growing a 100 TB dedup graph costs O(batch) per arrival instead of " +
        "re-labeling every edge ever seen. Contraction preserves connectivity and each " +
        "representative is already its cluster's minimum, so the fold is provably " +
        "batch-split-invariant — which is why the oracle can be the from-scratch recursive " +
        "CC over ALL edges (the x33 walk), blind to the batching entirely.",
      Some("""WITH RECURSIVE
             |s AS (
             |  SELECT doc_id, lang,
             |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents WHERE doc_id < 300) t
             |  WHERE len(words) >= 4),
             |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
             |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |       WHERE len(list_intersect(a.sh, b.sh)) >= 1),
             |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
             |walk(node, lab) AS (
             |  SELECT DISTINCT a, a FROM e
             |  UNION
             |  SELECT e.a, w.lab FROM e JOIN walk w ON e.b = w.node),
             |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node),
             |d AS (SELECT doc_id FROM documents WHERE doc_id < 300)
             |SELECT d.doc_id, CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component
             |FROM d LEFT JOIN comp c ON d.doc_id = c.node""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val edges = TextDedup.sharedShingleEdges(docs, "lang", 4)
          .withColumn("h", pmod(TextDedup.portableHash(
            concat_ws(":", col("doc_a"), col("doc_b")), "ccinc"), lit(2L)))
          .localCheckpoint(false) // one edge build feeds both arrival batches
        val emptyStanding = edges
          .select(col("doc_a").cast("long").as("node"),
            col("doc_a").cast("long").as("component")).limit(0)
        val folded = Seq(0L, 1L).foldLeft(emptyStanding) { (st, b) =>
          graft.operators.ConnectedComponents.incrementalAssign(
            st, edges.filter(col("h") === b), "doc_a", "doc_b")
            .localCheckpoint(false) // each fold's output is the next fold's input
        }
        docs.select(col("doc_id"))
          .join(folded.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"))
      }),

    Q("x101_grouped_weighted_sample",
      "Grouped pps sample (round-10): exactly 10 docs PER SOURCE, inclusion probability " +
        "proportional to token count within each source — the mixture-construction " +
        "primitive when every source carries its own doc budget (the x48/x55 allocations " +
        "made exact-size; x96's global-budget sibling). Same deterministic hash-DIV-weight " +
        "priority, selected by one row_number window — a single shuffle on the source key, " +
        "each group one sorted streaming pass (the x31 posture, and the same reason it " +
        "stays a window: a 2^60 hash does not fit a double, so the bounded-heap aggregate " +
        "would break bit-identity with the oracle). Groups smaller than the budget keep " +
        "everything.",
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'pps'),1,15))::BIGINT AS h
             |  FROM documents)
             |SELECT doc_id, source, n_tokens AS w, priority, rk FROM (
             |  SELECT doc_id, source, n_tokens, h // n_tokens AS priority,
             |         CAST(row_number() OVER (PARTITION BY source
             |           ORDER BY h // n_tokens ASC, doc_id ASC) AS BIGINT) AS rk
             |  FROM t WHERE n_tokens > 0) s
             |WHERE rk <= 10""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        TextStats.weightedSamplePerGroup(docs, "source", col("n_tokens"), 10)
      }),

    Q("x102_quality_classifier",
      "Weak-label quality classifier (round-10): linear probe trained ON THE CORPUS against " +
        "proxy labels (even-numbered sources = trusted) over integer per-doc features " +
        "(token count, distinct tokens, marker-word count) — the 'fit a filter on a few " +
        "labelled sources, score everything' curation stage. Normal equations are EXACT " +
        "64-bit integer sums (one map-side aggregate, the only corpus pass), the 4x4 solve " +
        "is driver-side BigInt Cramer (Gram matrix, det>0), and the per-doc decision " +
        "w.x >= 1/2 is cross-multiplied into the integer comparison 2*sum(det_i*x_i) >= det " +
        "evaluated distributed in Decimal(38,0) — no floating point anywhere, so the oracle " +
        "(same Leibniz expansion in HUGEINT) hash-matches exactly. Overflow guard fails " +
        "named at ~1e37; the production-scale note (demean + double solve, same " +
        "aggregation shape) lives in the Scaladoc.",
      Some(x102Oracle),
      (s, d) => graft.ext.LinearModel.weakLabelClassifier(
        Tables.documents(s, d), classifierFeatures, classifierWeakLabel)),

    Q("x105_classifier_audit",
      "Per-source filter bias audit (round-10): before a trained quality filter is applied " +
        "at corpus scale, audit WHO it keeps — per source: doc count, weak positives, kept " +
        "(predicted positive), and the TP/FP/FN confusion cells, all exact integer counts " +
        "from ONE hash aggregate over the x102 decision (quality filters silently skewing " +
        "against particular domains is a known curation failure; this is the table that " +
        "catches it before the filter ships). Composes the classifier's passthrough " +
        "column support — the decision projection carries source along, so no second join " +
        "against the corpus.",
      Some(x105Oracle),
      (s, d) => {
        graft.ext.LinearModel.weakLabelClassifier(Tables.documents(s, d),
          classifierFeatures, classifierWeakLabel,
          passthrough = Seq("source"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("y")).cast("long").as("positives"),
            sum(col("yhat")).cast("long").as("kept"),
            sum(col("y") * col("yhat")).cast("long").as("tp"),
            sum((lit(1) - col("y")) * col("yhat")).cast("long").as("fp"),
            sum(col("y") * (lit(1) - col("yhat"))).cast("long").as("fn"))
      }),

    Q("x104_incremental_classifier",
      "Incremental classifier refit (round-10): the re-aggregatable-partial pattern " +
        "(x90 HLL / x99 KLL rollups) applied to MODEL FITTING. The corpus arrives in TWO " +
        "batches (split by portable doc_id hash); each contributes one normal-equation " +
        "sufficient-statistics row (XtX/Xty long sums + guard maxes), the standing stats " +
        "fold cell-wise — O(1) state, O(batch) per arrival, raw history never re-scanned — " +
        "and the refit solves from the folded row. Integer sums are exactly " +
        "batch-split-invariant, so the model after B arrivals IS the all-at-once x102 fit " +
        "and the oracle is the batch SQL, blind to the batching entirely (the x100 device).",
      Some(x102Oracle),
      (s, d) => {
        val docs = Tables.documents(s, d)
        val h = TextDedup.portableHash(col("doc_id").cast("string"), "icls")
        graft.ext.LinearModel.incrementalClassifier(
          Seq(docs.filter(h % 2 === 0), docs.filter(h % 2 =!= 0)),
          classifierFeatures, classifierWeakLabel)
      }),

    Q("x106_retrieval_mrr",
      "Rank-sensitive retrieval eval (round-10): MRR's per-query row — where does the true " +
        "best neighbor (exact brute rank-1) land in the IVF top-5? rank_in_sys 0 = missed; " +
        "rr_fp is the reciprocal rank in exact fixed point (10^6 DIV rank, no float ever " +
        "enters, mean/10^6 = MRR@5). Complements the recall family (x78/x89/x92): recall " +
        "says WHETHER the truth was retrieved, MRR says how HIGHLY it ranked — the metric " +
        "pair every retrieval-backed data pipeline reports. One O(queries) join of two " +
        "already-bounded rank frames, composed from the proven x06/x14 paths.",
      Some(mrrOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 10)
        val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        Similarity.retrievalMrr(
          Similarity.knnBrute(q, emb, 1),
          Similarity.knnIvf(q, emb, centroids, 5, 4))
      }),

    Q("x103_mmr_rerank",
      "MMR diversified re-rank (round-10): from each query's exact top-8, greedily select 4 " +
        "maximizing 0.5*rel - 0.5*max(sim to already-selected) — the RAG retrieval stage " +
        "that trades relevance against redundancy. Candidate generation is the bounded-heap " +
        "brute top-k (any knn* variant slots in at scale). Registered on the ONE-STAGE " +
        "fused form (mmrRerankAgg): shortlisting AND the greedy run inside the mmr_select " +
        "TypedImperativeAggregate — each mapper keeps its local top-shortlist, the shuffle " +
        "carries O(queries x shortlist) rows, and stage count is k-independent, where the " +
        "unrolled window twin (mmrRerank) pays k-1 serial bounded jobs; MmrSpec pins the " +
        "two row-identical (the q43/x98 safe-rewrite pattern). Rank-only output, but the " +
        "determinism is exact, not assumed: rel and pair sims are the left-associated " +
        "double cosine kernel and the oracle unrolls the same greedy over generated-SQL " +
        "cosines (norm precompute per row, the x88 bitwise-neutral trick), so every score " +
        "comparison is between bit-identical doubles.",
      Some(mmrOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.mmrRerankAgg(emb.filter(col("vec_id") < 10), emb, 8, 4)
      }),

    Q("x107_intradoc_dedup",
      "Within-document repeated-token removal (round-10 late): drop every repeat of a " +
        "token already seen earlier in the SAME document, preserving first-occurrence " +
        "order — the intra-doc cousin of the C4 'dedup repeated lines' cleaning pass " +
        "(x23 only MEASURES intra-doc repetition; x47 removes spans ACROSS docs). The " +
        "scale story is the shape: pure per-row work, ZERO shuffle, embarrassingly " +
        "parallel over 100 TB — where the naive formulation (explode + min(pos) groupBy + " +
        "re-collect) shuffles the entire tokenized corpus twice. Registered on the " +
        "dedup_tokens codegen kernel: byte-level split + one hash-set probe per token, " +
        "O(len) per row — the composed array form (split -> indexed filter on " +
        "array_position, the oracle's formulation, property-pinned string-identical) is " +
        "O(tokens^2) per row and loses 581x at 20k-token documents " +
        "(SCALING.md, tools.DedupTokensBench).",
      Some("""WITH w AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS words
             |  FROM documents),
             |k AS (
             |  SELECT doc_id, words,
             |         list_filter(words, (x, i) -> list_position(words, x) = i) AS kept
             |  FROM w)
             |SELECT doc_id,
             |  CAST(len(words) AS BIGINT) AS n_words,
             |  CAST(len(kept) AS BIGINT) AS n_kept,
             |  array_to_string(kept, ' ') AS text_dedup
             |FROM k""".stripMargin),
      (s, d) => {
        // registered on the one-pass dedup_tokens codegen kernel (O(len)
        // hash-set probe per token — the giant-doc scale path); the
        // composed array form (split -> indexed filter on array_position,
        // duckdb-mirrorable 1-based vs 0-based lambda index) is the
        // oracle's formulation, and FunctionsSpec property-pins the two
        // string-identical, so the oracle stands unchanged
        val ded = graft.functions.dedup_tokens(col("text"))
        Tables.loadFanout(s, d, "documents")
          .withColumn("text_dedup", ded)
          .select(col("doc_id"),
            size(filter(split(col("text"), " "), w => length(w) > 0))
              .cast("long").as("n_words"),
            when(col("text_dedup") === "", 0L)
              .otherwise(size(split(col("text_dedup"), " ")).cast("long"))
              .as("n_kept"),
            col("text_dedup"))
      }),

    Q("x108_nfc_normalize",
      "Unicode NFC normalization (round-10 late): canonically-equivalent text arrives " +
        "byte-DIFFERENT (e + U+0301 combining acute vs precomposed é), silently defeating " +
        "every exact-hash dedup and inflating token counts — NFC composition is the " +
        "cleaning pass that runs before any fingerprinting. Spark has no builtin, so this " +
        "registers the nfc_normalize codegen Expression (java.text.Normalizer under " +
        "whole-stage codegen, isNormalized fast path keeps the dominant all-ASCII case " +
        "allocation-free); DuckDB's nfc_normalize implements the identical Unicode " +
        "composition, making the operator oracle-comparable byte-for-byte. Deterministic " +
        "non-ASCII is INJECTED from doc_id (the x40/x77/x95 idiom): a combining acute " +
        "lands on letter (doc_id % 26), which COMPOSES for a,c,e,g,... but has no " +
        "precomposed form for b,d,f,h,... — so both the rewrite and the fast path are " +
        "exercised against known ground truth. Map-side, zero shuffle.",
      Some(("""WITH t AS (
             |  SELECT doc_id,
             |    substr(text, 1, 40) || ' ' ||
             |      substr('abcdefghijklmnopqrstuvwxyz', CAST(doc_id % 26 AS INT) + 1, 1) ||
             |      chr(769) AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(length(raw) AS BIGINT) AS n_raw,
             |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
             |  CAST(CASE WHEN length(nfc_normalize(raw)) < length(raw) THEN 1 ELSE 0 END AS INT)
             |    AS composed,
             |  nfc_normalize(raw) AS norm_text
             |FROM t""").stripMargin),
      (s, d) => {
        // spark's chr() wraps at 256, so the combining acute is a source
        // literal on both sides (the oracle SQL carries chr(769))
        val raw = concat(substring(col("text"), 1, 40), lit(" "),
          lit("abcdefghijklmnopqrstuvwxyz")
            .substr((col("doc_id") % 26).cast("int") + 1, lit(1)),
          lit("\u0301"))
        val norm = graft.functions.nfc_normalize(col("raw"))
        Tables.loadFanout(s, d, "documents")
          .withColumn("raw", raw)
          .select(col("doc_id"),
            length(col("raw")).cast("long").as("n_raw"),
            length(norm).cast("long").as("n_nfc"),
            when(length(norm) < length(col("raw")), 1).otherwise(0)
              .cast("int").as("composed"),
            norm.as("norm_text"))
      }),

    Q("x109_cc_forget",
      "Deletion from a standing dedup graph (round-10 late): forget every doc_id % 37 == 0 " +
        "from the near-dup component assignment — the right-to-be-forgotten pass a corpus " +
        "under deletion requests runs, and x100's subtractive partner. Removal is harder " +
        "than growth: a deleted doc can be the BRIDGE holding a component together, so " +
        "its loss may SPLIT one component into many — no local patch detects that. " +
        "ConnectedComponents.removeAssign bounds the rework to the AFFECTED components " +
        "only: deletion set and affected component ids broadcast, unaffected standing rows " +
        "pass through one map-side filter (never shuffled), the edge history is scanned " +
        "once filtered to surviving affected nodes (partition-prunable when the edge store " +
        "is component-partitioned), and mini-CC re-labels the O(affected) surviving " +
        "subgraph. The oracle is from-scratch recursive CC over the surviving edge set — " +
        "blind to the standing/incremental machinery entirely (the x100 idiom).",
      Some("""WITH RECURSIVE
             |s AS (
             |  SELECT doc_id, lang,
             |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents WHERE doc_id < 300) t
             |  WHERE len(words) >= 4),
             |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
             |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |       WHERE len(list_intersect(a.sh, b.sh)) >= 1
             |         AND a.doc_id % 37 <> 0 AND b.doc_id % 37 <> 0),
             |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
             |walk(node, lab) AS (
             |  SELECT DISTINCT a, a FROM e
             |  UNION
             |  SELECT e.a, w.lab FROM e JOIN walk w ON e.b = w.node),
             |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node),
             |d AS (SELECT doc_id FROM documents WHERE doc_id < 300 AND doc_id % 37 <> 0)
             |SELECT d.doc_id, CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component
             |FROM d LEFT JOIN comp c ON d.doc_id = c.node""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val edges = TextDedup.sharedShingleEdges(docs, "lang", 4)
          .localCheckpoint(false) // one edge build feeds standing AND removal
        val standing = docs.select(col("doc_id").cast("long").as("node"))
          .join(graft.operators.ConnectedComponents.labels(
            edges.select(col("doc_a").as("a"), col("doc_b").as("b"))),
            Seq("node"), "left")
          .select(col("node"),
            coalesce(col("component"), col("node")).as("component"))
          .localCheckpoint(false)
        val deleted = docs.filter(col("doc_id") % 37 === 0)
          .select(col("doc_id").as("node"))
        graft.operators.ConnectedComponents
          .removeAssign(standing, edges, deleted, "doc_a", "doc_b")
          .select(col("node").as("doc_id"), col("component"))
      }),

    Q("x110_corpus_diff",
      "Dataset-release diff (round-10 late): classify every doc across two corpus " +
        "snapshots as added / removed / changed / unchanged by content hash — the " +
        "versioning audit run before any retrain on a new release ('what actually moved " +
        "between v1 and v2?'). The two snapshots are deterministic derivations of the " +
        "documents table (v2 drops doc_id % 11, mutates doc_id % 7, v1 lacks doc_id % 5 — " +
        "all four statuses materialize). Scale shape: map-side md5 per side, ONE full-outer " +
        "equi-join on doc_id (co-partitioned single shuffle; zero shuffle when both " +
        "releases are bucketed by doc_id, the pipeline/Bucketing posture) — content " +
        "never travels, only 32-byte hashes; both engines' md5-hex agree byte-for-byte " +
        "(the portable-hash family contract).",
      Some("""WITH v1 AS (
             |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
             |v2 AS (
             |  SELECT doc_id,
             |    md5(text || CASE WHEN doc_id % 7 = 0 THEN ' v2' ELSE '' END) AS h
             |  FROM documents WHERE doc_id % 11 <> 0)
             |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
             |  CASE WHEN v1.doc_id IS NULL THEN 'added'
             |       WHEN v2.doc_id IS NULL THEN 'removed'
             |       WHEN v1.h <> v2.h THEN 'changed'
             |       ELSE 'unchanged' END AS status
             |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin),
      (s, d) => {
        val docs = Tables.loadFanout(s, d, "documents")
        val v1 = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id").as("id1"),
            md5(col("text").cast("binary")).as("h1"))
        val v2 = docs.filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id").as("id2"),
            md5(concat(col("text"),
              when(col("doc_id") % 7 === 0, " v2").otherwise(""))
              .cast("binary")).as("h2"))
        v1.join(v2, col("id1") === col("id2"), "full_outer")
          .select(coalesce(col("id1"), col("id2")).as("doc_id"),
            when(col("id1").isNull, "added")
              .when(col("id2").isNull, "removed")
              .when(col("h1") =!= col("h2"), "changed")
              .otherwise("unchanged").as("status"))
      }),

    Q("x111_component_stream",
      "END-TO-END grow+forget component stream (round-11 verdict item 2): the near-dup " +
        "edge set split into THREE arrival waves (portable pair-hash), with deletion " +
        "requests RIDING IN the second and third waves as mixed-kind micro-batches " +
        "(doc_id % 74 == 0 alongside edge wave 2, the remaining % 37 == 0 alongside wave " +
        "3) — the hardest arrival shape: a batch whose edges touch nodes the SAME batch " +
        "forgets must add-then-remove and still converge. Folded through " +
        "streaming.componentStreamWithForgets — real files, real micro-batches " +
        "(maxFilesPerTrigger=1), the standing components manifest + stamped edge log + " +
        "permanent tombstone log, WITH the edge-log compaction policy forced mid-stream " +
        "(maxEdgeFiles=1, so the log is rewritten while batches still arrive). " +
        "The read-back standing table must equal from-scratch recursive CC over (all " +
        "edges - forgotten nodes) — the x109 oracle VERBATIM, blind to the streaming " +
        "machinery, the batching, the interleaving, and the compaction: x100 proves grow " +
        "is batch-split-invariant, x109 proves forget is bounded-rework exact, and this " +
        "query proves their streamed COMPOSITION converges to the same fixpoint (edges " +
        "incident to forgotten nodes are rejected or dropped — either way they cannot " +
        "connect survivors, so arrival order is immaterial).",
      Some("""WITH RECURSIVE
             |s AS (
             |  SELECT doc_id, lang,
             |         list_distinct([array_to_string(words[i:i+3], ' ') for i in range(1, len(words)-2)]) AS sh
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents WHERE doc_id < 300) t
             |  WHERE len(words) >= 4),
             |e0 AS (SELECT a.doc_id AS a, b.doc_id AS b
             |       FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |       WHERE len(list_intersect(a.sh, b.sh)) >= 1
             |         AND a.doc_id % 37 <> 0 AND b.doc_id % 37 <> 0),
             |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
             |walk(node, lab) AS (
             |  SELECT DISTINCT a, a FROM e
             |  UNION
             |  SELECT e.a, w.lab FROM e JOIN walk w ON e.b = w.node),
             |comp AS (SELECT node, MIN(lab) AS component FROM walk GROUP BY node),
             |d AS (SELECT doc_id FROM documents WHERE doc_id < 300 AND doc_id % 37 <> 0)
             |SELECT d.doc_id, CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component
             |FROM d LEFT JOIN comp c ON d.doc_id = c.node""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
          .localCheckpoint(false) // feeds edges, forget waves, and read-back
        val edges = TextDedup.sharedShingleEdges(docs, "lang", 4)
          .withColumn("h", pmod(TextDedup.portableHash(
            concat_ws(":", col("doc_a"), col("doc_b")), "ccstream"), lit(3L)))
          .localCheckpoint(false) // one edge build feeds all three waves
        val root = scratchTempDir("graft-x111-ccstream")
        def edgeWave(h: Long) = edges.filter(col("h") === h)
          .select(lit("edge").as("kind"), col("doc_a").cast("long"),
            col("doc_b").cast("long"))
        def forgetWave(c: org.apache.spark.sql.Column) =
          docs.filter(col("doc_id") % 37 === 0).filter(c)
            .select(lit("forget").as("kind"), col("doc_id").cast("long").as("doc_a"),
              lit(null).cast("long").as("doc_b"))
        writeStreamWaves(root, Seq(
          edgeWave(0L),
          forgetWave(col("doc_id") % 74 === 0).unionByName(edgeWave(1L)),
          forgetWave(col("doc_id") % 74 =!= 0).unionByName(edgeWave(2L))))
        val events = s.readStream
          .schema("kind STRING, doc_a LONG, doc_b LONG")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        graft.streaming.StreamingIngest.componentStreamWithForgets(events,
          root + "/comps", root + "/edges", root + "/tombs", root + "/ckpt",
          maxEdgeFiles = 1) // force compaction while batches still arrive
        val standing = graft.pipeline.ManifestTable.read(s, root + "/comps")
          .withColumnRenamed("node", "doc_id")
        docs.filter(col("doc_id") % 37 =!= 0).select(col("doc_id"))
          .join(standing, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"))
      }),

    Q("x112_bpe_fit_batched",
      "BPE training at PRODUCTION depth via the batched fit (round-11 verdict item 3): 64 " +
        "merges learned by Bpe.fitBatched, which per pass ranks the candidate window by the " +
        "serial tie-break and keeps the provably-safe prefix — pairwise symbol-disjoint, " +
        "merged-symbol-alias-free, self-pair-terminated, strict-count-truncated at the " +
        "boundary — so ONE vocab-sized count job learns a whole batch of merges instead of " +
        "one (~batch-size x fewer serial Spark jobs; at 32k production merges the serial " +
        "form is ~1h of pure scheduler floor regardless of cluster size — the batch is what " +
        "makes deep fits feasible, not a constant-factor nicety). The oracle is the serial " +
        "greedy chain VERBATIM (the x57 per-iteration CTE at depth 64) — independently " +
        "re-derived by DuckDB one merge at a time, blind to the batching — so a hash match " +
        "here IS the row-identity proof of the batch-safety argument on the real corpus, at " +
        "a depth where batches actually form (BpeBatchSpec pins the same equality in-engine " +
        "plus tiny-alphabet adversarial ScalaCheck).",
      Some(bpeFitBatchedOracle),
      (s, d) => graft.ext.Bpe.fitBatched(Tables.documents(s, d), 64)),

    Q("x113_grouped_sample_stream",
      "The x101 grouped pps sample as a CONTINUOUS fold (round-11 verdict item 7): the " +
        "corpus arrives in three hash-split micro-batches, each folds its own per-group " +
        "top-10 into the standing exactly-10-per-source manifest " +
        "(streaming.groupedWeightedSampleStream), and the read-back standing table must " +
        "equal the batch x101 sample over the whole corpus — the oracle IS x101's SQL " +
        "VERBATIM, blind to the batching: per-group top-n under deterministic " +
        "hash-DIV-weight priorities is an associative idempotent fold (a row outside a " +
        "batch's per-group top-n is dominated by n union rows of its own group, so " +
        "dropping it at the batch boundary is lossless). Standing state is O(groups x n) " +
        "rows forever, per batch one group-keyed shuffle of O(batch), corpus never " +
        "re-scanned; re-arrivals that change a doc's weight or group resolve " +
        "deterministically per id (GroupedWeightedSampleStreamSpec pins both orders).",
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'pps'),1,15))::BIGINT AS h
             |  FROM documents)
             |SELECT doc_id, source, n_tokens AS w, priority, rk FROM (
             |  SELECT doc_id, source, n_tokens, h // n_tokens AS priority,
             |         CAST(row_number() OVER (PARTITION BY source
             |           ORDER BY h // n_tokens ASC, doc_id ASC) AS BIGINT) AS rk
             |  FROM t WHERE n_tokens > 0) s
             |WHERE rk <= 10""".stripMargin),
      (s, d) => {
        val feats = Tables.documents(s, d).select(
            col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .withColumn("h", pmod(xxhash64(col("doc_id")), lit(3L)))
          .localCheckpoint(false) // one corpus pass feeds all three waves
        val root = scratchTempDir("graft-x113-gwsample")
        writeStreamWaves(root,
          (0 until 3).map(b => feats.filter(col("h") === b).drop("h")))
        val docs = s.readStream
          .schema("doc_id LONG, source STRING, n_tokens LONG")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        graft.streaming.StreamingIngest.groupedWeightedSampleStream(docs,
          "source", "n_tokens", 10, root + "/sample", root + "/ckpt")
        graft.pipeline.ManifestTable.read(s, root + "/sample")
          .select(col("doc_id"), col("source"), col("w"), col("priority"),
            col("rk"))
      }),

    Q("x114_fitted_codebook_recall",
      "Lloyd-fitted vs init residual codebooks where fitting EARNS its corpus passes " +
        "(round-11 verdict item 4): the x92 recall table re-run on the ANISOTROPIC " +
        "structured corpus (Similarity.structuredCorpus — within-cluster spread stretched " +
        "elementwise by a fixed anchor row, so residual variance is direction-dependent " +
        "like real embedding corpora, NOT the isotropic cloud where fitting measurably " +
        "LOST recall, 0.32->0.26; SCALING.md round-10/11). Both ladders share one cell " +
        "assignment; the fitted side runs pqResidualCodebooksFitted's two Lloyd " +
        "iterations (argmin with (d2, code) ties, floor(x*10^6) integer dim-sums, one " +
        "double division per mean, empty-code retention). The oracle replays EVERYTHING " +
        "- corpus derivation, init sample, both Lloyd iterations, both encode ladders - " +
        "bit-exactly in SQL, so the recall win is hash-pinned, not narrated: fitted beats " +
        "init at every shortlist on this corpus (0.52->0.60 at the registered shortlist " +
        "12; 0.92->0.98 at 48, sf0.1), the exact reversal of the isotropic table, " +
        "measured by the same sweep (tools.PqResidualSweep).",
      Some(fittedRecallOracle),
      (s, d) => {
        // the derived corpus feeds many branches (queries, centroids,
        // codebooks, the Lloyd fit's corpus passes, brute, two ladders):
        // checkpoint the derivation once (the x92 posture)
        val emb = Similarity.structuredCorpus(Tables.embeddings(s, d))
          .localCheckpoint(false)
        val q = emb.filter(col("vec_id") < 10)
        val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        val cbInit = Similarity.pqResidualCodebooks(emb, centroids).localCheckpoint(false)
        val cbFit = Similarity.pqResidualCodebooksFitted(emb, centroids, iters = 2)
          .localCheckpoint(false) // model artifact: k*m rows
        val assigned = Similarity.ivfAssign(emb, centroids).localCheckpoint(false)
        // truth table feeds BOTH recall arms: checkpoint it so the
        // brute-force corpus scan runs once (round-16 optimization round)
        val brute = Similarity.knnBrute(q, emb, 5).localCheckpoint(false)
        val rInit = Similarity.annRecall(brute,
            Similarity.knnIvfPq(q, emb, centroids, cbInit, k = 5, nprobe = 4,
              shortlist = 12, assignedOpt = Some(assigned)))
          .select(col("qid"), col("n_true"), col("n_hits").as("hits_init"),
            col("recall_bp").as("recall_init_bp"))
        val rFit = Similarity.annRecall(brute,
            Similarity.knnIvfPq(q, emb, centroids, cbFit, k = 5, nprobe = 4,
              shortlist = 12, assignedOpt = Some(assigned)))
          .select(col("qid"), col("n_hits").as("hits_fit"),
            col("recall_bp").as("recall_fit_bp"))
        rInit.join(rFit, Seq("qid"))
      }),

    Q("x115_shortlist_scale_trap",
      "The fixed-IVF-PQ-shortlist scale trap as DATA (round-11 verdict item 5): one " +
        "candidate chain (the x92 clustered corpus, init residual codebooks, x88 index " +
        "parameters), two shortlist cuts — the registered fixed 12 and the " +
        "occupancy-derived max(2k, ceil(frac*nprobe*meanCellOccupancy)) " +
        "(Similarity.occupancyShortlist; frac 0.25, one 1-row aggregate over the SAME " +
        "assignment the search probes). The derived size rides along as sl_auto, so the " +
        "hash pins the sizing FORMULA, not just the recall it buys: at sf0.1 fixed-12 " +
        "reads ~0.32 while auto (125 = nprobe x one mean cell) reads ~0.94, and the auto " +
        "setting holds across sf0.01 -> sf0.1 where fixed-12 is already degenerate at " +
        "both (SCALING.md round-11, tools.AutoShortlistSweep). Cost honesty: the auto " +
        "shortlist is O(N/C) — the exact re-rank stays proportional to ONE probed cell, " +
        "the same asymptotic a larger nprobe pays, spent on rank depth instead of cell " +
        "count.",
      Some(shortlistTrapOracle),
      (s, d) => {
        val emb = Similarity.clusteredCorpus(Tables.embeddings(s, d))
          .localCheckpoint(false)
        val q = emb.filter(col("vec_id") < 10)
        val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        val cb = Similarity.pqResidualCodebooks(emb, centroids).localCheckpoint(false)
        val assigned = Similarity.ivfAssign(emb, centroids).localCheckpoint(false)
        val slAuto = Similarity.occupancyShortlist(assigned, nprobe = 4, k = 5)
        // truth table feeds BOTH recall arms: checkpoint it so the
        // brute-force corpus scan runs once (round-16 optimization round)
        val brute = Similarity.knnBrute(q, emb, 5).localCheckpoint(false)
        val rFix = Similarity.annRecall(brute,
            Similarity.knnIvfPq(q, emb, centroids, cb, k = 5, nprobe = 4,
              shortlist = 12, assignedOpt = Some(assigned)))
          .select(col("qid"), col("n_true"), col("n_hits").as("hits_fixed"),
            col("recall_bp").as("recall_fixed_bp"))
        val rAuto = Similarity.annRecall(brute,
            Similarity.knnIvfPq(q, emb, centroids, cb, k = 5, nprobe = 4,
              shortlist = slAuto, assignedOpt = Some(assigned)))
          .select(col("qid"), col("n_hits").as("hits_auto"),
            col("recall_bp").as("recall_auto_bp"))
        rFix.join(rAuto, Seq("qid"))
          .withColumn("sl_auto", lit(slAuto.toLong))
      }),

    Q("x116_bm25_index_stream",
      "INCREMENTAL inverted-index maintenance (round-11): the corpus arrives in three " +
        "hash-split micro-batches, each tokenized ONCE into posting rows (doc_id, term, " +
        "tf, dl) and appended to a standing index (streaming.bm25IndexStream — stamped " +
        "appends, exactly-once under replay; raw docs never kept, never re-tokenized); " +
        "retrieval then runs ENTIRELY off the index — df and corpus stats re-aggregate " +
        "from the postings (statsFromPostings: every NON-NULL-text doc lands >=1 posting " +
        "row and dl = sum(tf) within a doc, so n_docs/n_tokens are EXACT equalities with " +
        "the docs-side aggregates on this corpus — null-text docs are excluded by a " +
        "named gate and the index's stats describe indexed docs by contract), query " +
        "terms self-derive from the " +
        "index's df ranks, and scores join only the query-term postings. The oracle is " +
        "x54's SQL VERBATIM over the raw corpus — blind to the index, the batching, and " +
        "the arrival order: tf/df/dl/N are set-functions of arrived docs, so the standing " +
        "index after any arrival prefix retrieves exactly what batch BM25 retrieves over " +
        "the docs seen so far. This is the retrieval-system posture at 100 TB: ingest " +
        "pays O(batch tokens) once, queries pay O(query-term postings) via the term " +
        "equi-join — the corpus is never re-scanned.",
      Some(bm25Oracle),
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("h", pmod(xxhash64(col("doc_id")), lit(3L)))
          .localCheckpoint(false) // one corpus pass feeds all three waves
        val root = scratchTempDir("graft-x116-bm25idx")
        writeStreamWaves(root,
          (0 until 3).map(b => docs.filter(col("h") === b).drop("h")))
        val stream = s.readStream
          .schema(Tables.documents(s, d).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        graft.streaming.StreamingIngest.bm25IndexStream(stream,
          root + "/postings", root + "/ckpt")
        val tf = s.read.parquet(root + "/postings")
          .select(col("doc_id"), col("term"), col("tf"), col("dl"))
          .localCheckpoint(false) // the index feeds df, stats, queries, scoring
        graft.ext.TextRank.bm25(tf /* docs unused: stats from the index */,
          graft.ext.TextRank.midFrequencyQueries(tf, postingsOpt = Some(tf)),
          postingsOpt = Some(tf),
          statsOpt = Some(graft.ext.TextRank.statsFromPostings(tf)))
      }),

    Q("x117_bm25_retract_stream",
      "DOC UPDATE/RETRACTION for the standing BM25 index (round-12) — the regime x116's " +
        "append-only contract names as out of scope: a re-crawled doc re-arrives under its " +
        "doc_id with new text and retrieval must see ONLY the latest version, or df/tf " +
        "double-count forever. Three waves: the full corpus, then portable-md5 bucket " +
        "h4==1 re-arrives DOUBLED and h4==3 takes an intermediate update, then h4==2 " +
        "re-arrives null-text (= deletion) and h4==3 REVERTS to its original — so the " +
        "final index must have fully retracted one superseded version per h4∈{1,3} doc " +
        "and every posting of each h4==2 doc. Machinery " +
        "(streaming.bm25IndexUpsertStream): per-doc VERSIONED postings + a (doc_id, seq) " +
        "version log, resolved at read to each doc's max-seq rows — a null-text arrival " +
        "advances the version log without postings, which IS deletion; stamped appends on " +
        "both logs give exactly-once under replay; compaction rewrites both logs keeping " +
        "live versions (Bm25UpsertStreamSpec). The oracle is x54's SQL over the " +
        "latest-version corpus in CLOSED FORM (the q08 last-write-wins composition) — " +
        "blind to the version log, the batching, and the arrival order. Read adds ONE " +
        "doc-keyed join of postings against the version log's max-seq aggregate " +
        "(O(log), amortized to O(live postings) by compaction); retrieval stays " +
        "O(query-term postings).",
      Some(bm25UpsertOracle),
      (s, d) => {
        val root = scratchTempDir("graft-x117-bm25ups")
        val stream = docUpdateWaveStream(s, d, root)
        graft.streaming.StreamingIngest.bm25IndexUpsertStream(stream,
          root + "/postings", root + "/versions", root + "/ckpt")
        val tf = graft.streaming.StreamingIngest.resolvedPostings(
            s, root + "/postings", root + "/versions")
          .localCheckpoint(false) // the resolved index feeds df, stats, queries, scoring
        graft.ext.TextRank.bm25(tf /* docs unused: stats from the index */,
          graft.ext.TextRank.midFrequencyQueries(tf, postingsOpt = Some(tf)),
          postingsOpt = Some(tf),
          statsOpt = Some(graft.ext.TextRank.statsFromPostings(tf)))
      }),

    Q("x152_bm25_bucketed",
      "x117's BM25 update/retraction lifecycle on the BUCKETED log layout " +
        "(round-16, completing the family list the r15 migration started): the " +
        "same three update waves through bm25IndexUpsertStreamBucketed — per-doc " +
        "versioned postings + version log as doc_id-bucketed catalog tables, the " +
        "round-16 direct-commit append path with landed markers — resolved " +
        "shuffle-free (Bucketing.resolvedBucketed: the max-seq aggregate and the " +
        "doc-keyed join both ride the buckets' HashPartitioning; the flat x117 " +
        "read pays two exchanges per resolve forever). Retrieval and the oracle " +
        "are x117's VERBATIM — x54's SQL over the latest-version corpus in closed " +
        "form, blind to the layout — so the hash proves the bucketed store serves " +
        "the identical index.",
      Some(bm25UpsertOracle),
      (s, d) => {
        val root = scratchTempDir("graft-x152-bm25bkt")
        val stream = docUpdateWaveStream(s, d, root)
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.bm25IndexUpsertStreamBucketed(stream,
          s"x152_post_$tag", s"x152_vers_$tag", root + "/ckpt",
          buckets = sessionBuckets(s))
        val tf = graft.pipeline.Bucketing.resolvedBucketed(
            s, s"x152_post_$tag", s"x152_vers_$tag", "doc_id")
          .select(col("doc_id"), col("term"), col("tf"), col("dl"))
          .localCheckpoint(false) // the resolved index feeds df, stats, queries, scoring
        graft.ext.TextRank.bm25(tf,
          graft.ext.TextRank.midFrequencyQueries(tf, postingsOpt = Some(tf)),
          postingsOpt = Some(tf),
          statsOpt = Some(graft.ext.TextRank.statsFromPostings(tf)))
      }),

    Q("x118_ann_production_ladder",
      "The COMPOSED production ANN configuration, oracle-covered end-to-end (round-12, " +
        "the r11 verdict item 3): x114 proved fitted codebooks win on anisotropic " +
        "structure and x115 proved the occupancy-derived shortlist — each against a " +
        "baseline holding the OTHER knob at its naive setting. This registers what a " +
        "100 TB user should actually run: knnIvfPqAuto (shortlist = max(2k, " +
        "ceil(0.25*nprobe*meanCellOccupancy)) from the SAME assignment the search " +
        "probes) over pqResidualCodebooksFitted's two-Lloyd-iteration codebooks on the " +
        "structured corpus, recall vs brute truth, with sl_auto riding along — both " +
        "knobs hash-pinned in one row set. The oracle replays the whole path (corpus " +
        "derivation, init sample, both Lloyd steps, occupancy sizing, the single " +
        "fitted ladder at the derived bound, brute truth) from the shared x114 CTE " +
        "stack. Cost: the one-ladder subset of x114's plan plus a 1-row occupancy " +
        "aggregate on the shared assignment — candidate generation stays an equi-join " +
        "on cell_id, the exact re-rank O(shortlist) per query.",
      Some(productionLadderOracle),
      (s, d) => {
        val emb = Similarity.structuredCorpus(Tables.embeddings(s, d))
          .localCheckpoint(false)
        val q = emb.filter(col("vec_id") < 10)
        val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        val cbFit = Similarity.pqResidualCodebooksFitted(emb, centroids, iters = 2)
          .localCheckpoint(false) // model artifact: k*m rows
        val assigned = Similarity.ivfAssign(emb, centroids).localCheckpoint(false)
        // the sl_auto column pins the sizing formula; knnIvfPqAuto
        // re-derives the identical value from the SAME assigned frame
        // (deterministic 1-row aggregate), so the search runs the
        // production entry point, not a hand-fed shortlist
        val slAuto = Similarity.occupancyShortlist(assigned, nprobe = 4, k = 5)
        val brute = Similarity.knnBrute(q, emb, 5)
        Similarity.annRecall(brute,
            Similarity.knnIvfPqAuto(q, emb, centroids, cbFit, k = 5, nprobe = 4,
              assignedOpt = Some(assigned)))
          .withColumn("sl_auto", lit(slAuto.toLong))
      }),

    Q("x119_grouped_sample_rekey",
      "The grouped-sample GROUP-MOVE caveats as DATA (round-12, the r11 verdict item 5): " +
        "groupedWeightedSampleStream's bounded O(groups x n) state makes two documented " +
        "concessions under re-keying — (1) a vacated slot cannot backfill from rows " +
        "dropped at earlier batch boundaries (the old group stands UNDERFILLED until " +
        "they re-arrive, and on re-arrival they DO backfill), and (2) re-arrival of a " +
        "moved doc's old version does not undo the move (per-id min-priority resolution " +
        "is monotone on retained ids). Three waves make both visible: the full corpus, " +
        "then src1's standing top-5 re-keyed to group 'moved' at weight x1000 (their new " +
        "priorities strictly improve, so the moved versions win resolution), then every " +
        "original src1 row re-arrives. Output = the final standing table joined with " +
        "each group's row count AFTER THE MOVE WAVE (n_mid): src1 reads n_mid = 5 — the " +
        "underfill the bounded state cannot avoid — and 10 final rows (the backfill), " +
        "'moved' keeps its 5 docs despite wave 3 re-delivering their originals. The " +
        "stream runs as two sessions over one checkpoint (underfill is read from the " +
        "mid-stream manifest — a real restart, not a peek). The oracle replays the fold " +
        "wave by wave in SQL (top-n per group, per-id (priority, w) resolution — ties " +
        "never reach the engine-side hash tie-break because a x1000 weight change " +
        "always separates (priority, w)), blind to the streaming machinery.",
      Some("""WITH t AS (SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'pps'),1,15))::BIGINT AS h
             |  FROM documents),
             |v AS (SELECT doc_id, source, w, h, h // w AS priority FROM t WHERE w > 0),
             |s0 AS (SELECT doc_id, source, w, h, priority FROM (
             |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY priority ASC, doc_id ASC) AS rk
             |  FROM v) z WHERE rk <= 10),
             |mv AS (SELECT doc_id FROM (
             |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY priority ASC, doc_id ASC) AS rk
             |  FROM v) z WHERE source = 'src1' AND rk <= 5),
             |w1 AS (SELECT v.doc_id, 'moved' AS source, v.w * 1000 AS w, v.h,
             |         v.h // (v.w * 1000) AS priority
             |       FROM v JOIN mv ON v.doc_id = mv.doc_id),
             |u1 AS (SELECT doc_id, source, w, h, priority FROM (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY priority ASC, w ASC) AS vn
             |  FROM (SELECT * FROM s0 UNION ALL SELECT * FROM w1) uu) z WHERE vn = 1),
             |s1 AS (SELECT doc_id, source, w, h, priority FROM (
             |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY priority ASC, doc_id ASC) AS rk
             |  FROM u1) z WHERE rk <= 10),
             |midn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_mid FROM s1 GROUP BY source),
             |u2 AS (SELECT doc_id, source, w, h, priority FROM (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY priority ASC, w ASC) AS vn
             |  FROM (SELECT * FROM s1
             |        UNION ALL SELECT doc_id, source, w, h, priority FROM v WHERE source = 'src1') uu) z
             |  WHERE vn = 1),
             |s2 AS (SELECT doc_id, source, w, priority, rk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY priority ASC, doc_id ASC) AS rk
             |  FROM u2) z WHERE rk <= 10)
             |SELECT s2.doc_id, s2.source AS source, s2.w, s2.priority,
             |       CAST(s2.rk AS BIGINT) AS rk, midn.n_mid
             |FROM s2 JOIN midn ON midn.source = s2.source
             |ORDER BY s2.source, rk""".stripMargin),
      (s, d) => {
        val feats = Tables.documents(s, d).select(
            col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .localCheckpoint(false) // feeds waves 0/2 and the move derivation
        val root = scratchTempDir("graft-x119-rekey")
        // the move wave derives from the SAME deterministic ranking the
        // fold computes, so the oracle can reproduce it corpus-side
        writeStreamWaves(root, Seq(
          feats,
          graft.ext.TextStats.weightedSamplePerGroup(feats, "source", col("n_tokens"), 10)
            .filter(col("source") === "src1" && col("rk") <= 5)
            .select(col("doc_id"), lit("moved").as("source"),
              (col("w") * 1000L).as("n_tokens"))))
        def run(): Unit = {
          val docs = s.readStream
            .schema("doc_id LONG, source STRING, n_tokens LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(root + "/src/*")
          graft.streaming.StreamingIngest.groupedWeightedSampleStream(docs,
            "source", "n_tokens", 10, root + "/sample", root + "/ckpt")
          ()
        }
        run() // waves 0-1: src1 stands underfilled
        val mid = graft.pipeline.ManifestTable.read(s, root + "/sample")
          .groupBy(col("source")).agg(count(lit(1)).as("n_mid"))
          .localCheckpoint() // EAGER: pinned before the manifest version advances
        writeStreamWave(root, 2, feats.filter(col("source") === "src1"))
        run() // same checkpoint: only wave 2 triggers — the backfill
        graft.pipeline.ManifestTable.read(s, root + "/sample")
          .join(mid, Seq("source"))
          .select(col("doc_id"), col("source"), col("w"), col("priority"),
            col("rk"), col("n_mid"))
      }),

    Q("x120_dedup_index_retract",
      "DOC UPDATE/RETRACTION for the standing MinHash BAND index (round-12) — the x117 " +
        "regime applied to the dedup family: x51's standing signature index is " +
        "append-only, so a re-crawled doc's STALE bands keep matching future arrivals " +
        "forever (the old version's signature sits in the buckets), and there is no way " +
        "to remove a doc from the index at all. Machinery " +
        "(streaming.bandIndexUpsertStream — the shared versioned-index loop): per-doc " +
        "versioned band rows + a (doc_id, seq) version log resolved at read to each " +
        "doc's max-seq bands; an unshingleable/null-text re-arrival advances the version " +
        "log with zero band rows, which IS retraction. The train (index) side streams in " +
        "three waves with the x117 update script (h4==1 re-arrives DOUBLED — its " +
        "signature changes, the stale bands must stop matching; h4==3 takes an " +
        "intermediate update then REVERTS; h4==2 re-arrives null-text — retracted), " +
        "then the untouched eval side probes the LIVE index through x51's verdict path " +
        "(incrementalDedupBanded over the resolved bands, portable md5 signatures). The " +
        "oracle is x51's SQL over the latest-version train corpus in CLOSED FORM — " +
        "blind to the version log, the batching, and the arrival order; any stale or " +
        "missing band row changes n_corpus_hits/keep and the hash. Costs are x51's plus " +
        "one doc-keyed resolve join; the probe stays O(batch x touched buckets). " +
        "Round-15 (r14 verdict item 1): the index rides the BUCKETED log layout x143 " +
        "proved (bandIndexUpsertStreamBucketed / resolvedBandsBucketed) — the serving " +
        "resolve plans ZERO shuffle exchanges instead of re-shuffling the band log " +
        "every read; rows and hashes unchanged.",
      Some(dedupRetractOracle),
      (s, d) => {
        val h = graft.ext.TextDedup.portableHashBuiltin(col("doc_id").cast("string"), "")
        val base = Tables.documents(s, d)
          .withColumn("h4", pmod(h, lit(4L)))
          .withColumn("split",
            when(pmod(h, lit(100L)) < 80, "train").otherwise("eval"))
          .localCheckpoint(false) // feeds all three waves + the eval probe
        val train = base.filter(col("split") === "train")
        def wave(df: org.apache.spark.sql.DataFrame) = df.drop("h4", "split")
        val root = scratchTempDir("graft-x120-dedupidx")
        writeStreamWaves(root, Seq(
          wave(train),
          wave(train.filter(col("h4") === 1)
            .withColumn("text", concat(col("text"), lit(" "), col("text"))))
            .unionByName(wave(train.filter(col("h4") === 3)
              .withColumn("text", concat(col("text"), lit(" alpha"))))),
          wave(train.filter(col("h4") === 2)
            .withColumn("text", lit(null).cast("string")))
            .unionByName(wave(train.filter(col("h4") === 3)))))
        val stream = s.readStream
          .schema(Tables.documents(s, d).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        // catalog table names unique per build (the x143 convention)
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.bandIndexUpsertStreamBucketed(stream,
          s"x120_bands_$tag", s"x120_vers_$tag", root + "/ckpt", buckets = sessionBuckets(s),
          signer = df => TextDedup.minhashSignaturesPortable(df))
        val live = graft.streaming.StreamingIngest.resolvedBandsBucketed(
          s, s"x120_bands_$tag", s"x120_vers_$tag")
        TextDedup.incrementalDedupBanded(live,
          TextDedup.minhashSignaturesPortable(
            base.filter(col("split") === "eval").drop("h4", "split"))
            .localCheckpoint(false))
      }),

    Q("x121_grouped_sample_forgotten",
      "The grouped-sample FORGOTTEN-VERSION caveat as DATA (round-12) — x119 pinned " +
        "underfill and backfill; this pins the second documented concession: a version " +
        "dropped at a batch boundary cannot oppose a later WORSE re-arrival of the same " +
        "id, while retained ids never regress (min-priority resolution is monotone only " +
        "on state it kept). Script: the corpus arrives, src1's top-5 re-key away " +
        "(vacating slots), then the boundary-dropped rk-11..13 docs re-arrive at HALF " +
        "weight (worse priority) alongside the RETAINED rk-6 doc also at half weight — " +
        "the contrast pair. The halved versions of rk 11-13 backfill the vacated slots " +
        "(their originals are gone from state, so the worse version stands), while rk 6 " +
        "keeps its original (retained, min wins). Output = the final standing table " +
        "with `regressed` = standing priority STRICTLY worse than the best priority " +
        "ever delivered for that id: exactly the three boundary-dropped re-arrivals " +
        "read 1, the retained contrast and everything else read 0 — the bounded-state " +
        "trade is a hash-pinned column, not prose. Oracle replays the fold wave by " +
        "wave (the x119 idiom) plus one min-over-delivered-versions frame; weight " +
        "changes keep (priority, w) distinct so resolution never reaches the " +
        "engine-side hash tie-break.",
      Some(groupedSampleForgottenOracle(trim = 10)),
      groupedSampleForgottenQuery(ledger = 0)),

    Q("x122_emb_index_retract",
      "DOC UPDATE/RETRACTION for the standing embedding-LSH vector index (round-13, the " +
        "r12 verdict item 1) — the LAST similarity-family standing index that was " +
        "append-only: a re-embedded doc's STALE vector keeps winning dedup verdicts " +
        "against future arrivals forever, and a deleted doc cannot leave the index at " +
        "all. Machinery (streaming.embIndexUpsertStream — the shared versioned-index " +
        "loop with x117's postings and x120's bands): per-doc versioned (vec_id, bucket, " +
        "embedding) rows + a (vec_id, seq) version log resolved at read to each doc's " +
        "max-seq vector; a null-embedding re-arrival advances the version log with zero " +
        "vector rows, which IS retraction. Script: the corpus arrives, then portable-md5 " +
        "bucket h4==1 re-arrives NEGATED (sign-bit flip — exact in both engines, lands " +
        "in the complement LSH bucket) and h4==3 takes an intermediate negated update, " +
        "then h4==2 re-arrives null-embedding (= deletion) and h4==3 REVERTS. The probe " +
        "batch pairs every ORIGINAL vector (vec_id+1e6) with every NEGATED vector " +
        "(vec_id+2e6), so each probe matches exactly the live version of its source doc: " +
        "original probes keep=0 only where the original is live (h4 0/3), negated probes " +
        "keep=0 only where the negated version is live (h4==1), every h4==2 probe " +
        "keep=1 — any stale or missing vector row flips a keep bit and the hash. Oracle " +
        "is the latest-version index in CLOSED FORM (the q08 composition over x15's " +
        "vector fragments), blind to the version log, the batching, and the arrival " +
        "order. Read adds ONE doc-keyed resolve join; the probe stays one bucket " +
        "equi-join. Round-15 (r14 verdict item 1): the index rides the BUCKETED log " +
        "layout (embIndexUpsertStreamBucketed / resolvedVectorsBucketed) — the serving " +
        "resolve plans ZERO shuffle exchanges; rows and hashes unchanged.",
      Some(embRetractOracle),
      (s, d) => {
        val base = Tables.embeddings(s, d)
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("vec_id").cast("string"), ""), lit(4L)))
          .select(col("vec_id"), col("embedding"), col("h4"))
          .localCheckpoint(false) // one corpus pass feeds all three waves + probes
        val neg = transform(col("embedding"), x => -x)
        def w(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"), col("embedding"))
        val root = scratchTempDir("graft-x122-embidx")
        writeStreamWaves(root, Seq(
          w(base),
          w(base.filter(col("h4") === 1).withColumn("embedding", neg))
            .unionByName(w(base.filter(col("h4") === 3).withColumn("embedding", neg))),
          w(base.filter(col("h4") === 2)
              .withColumn("embedding", lit(null).cast("array<float>")))
            .unionByName(w(base.filter(col("h4") === 3)))))
        val stream = s.readStream
          .schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        // catalog table names unique per build (the x143 convention)
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.embIndexUpsertStreamBucketed(stream,
          s"x122_vecs_$tag", s"x122_vers_$tag", root + "/ckpt", buckets = sessionBuckets(s))
        val live = graft.streaming.StreamingIngest.resolvedVectorsBucketed(
          s, s"x122_vecs_$tag", s"x122_vers_$tag")
        val probes = base.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
          .unionByName(base.select((col("vec_id") + 2000000L).as("vec_id"),
            neg.as("embedding")))
        Similarity.embeddingDedupVerdicts(live, probes, 0.9)
          .select(col("vec_id"), col("bucket"), col("keep"))
      }),

    Q("x123_cdc_index_retract",
      "DOC RETRACTION for the standing CDC chunk-hash index (round-13, the r12 verdict " +
        "item 2) — the one standing-index family the versioned loop had not reached, and " +
        "the one where the x117 idiom does NOT apply verbatim: chunk hashes are SHARED " +
        "across docs (cdcNoveltyStream keys its index by h alone), so doc update/deletion " +
        "needs DOC ATTRIBUTION — streaming.cdcIndexUpsertStream stores per-doc versioned " +
        "(doc_id, h) rows; the live hash set is the union over live doc versions, so an " +
        "updated doc's EXCLUSIVE chunks leave the index while chunks shared with any live " +
        "doc survive through that doc's rows (the trade: O(live (doc,chunk)) index rows " +
        "vs O(distinct content) — the probe collapses to distinct h before its equi-join, " +
        "so probe cost is unchanged). Script: the 80% train split arrives, then train " +
        "h4==1 re-arrives with every 'e' replaced (content changes THROUGHOUT — CDC's " +
        "shift-invariance makes doubling/prefixing leave old chunks intact and the " +
        "retraction hash-invisible) and h4==3 takes an intermediate update, then h4==2 " +
        "re-arrives null-text (= total retraction) and h4==3 reverts. The untouched eval " +
        "side then probes the LIVE index through x71's path (cdcIncrementalAgainstIndex " +
        "over the resolved chunks, portable md5 chunking): per eval doc, chunks / corpus " +
        "hits / novel chars. Oracle is x71's SQL over the latest-version train corpus in " +
        "CLOSED FORM — any stale or missing chunk row changes n_corpus_hits/novel_chars " +
        "and the hash. Round-15 (r14 verdict item 1): the index rides the BUCKETED log " +
        "layout (cdcIndexUpsertStreamBucketed / resolvedChunksBucketed) — the serving " +
        "resolve plans ZERO shuffle exchanges; rows and hashes unchanged.",
      Some(cdcRetractOracle),
      (s, d) => {
        val h = TextDedup.portableHashBuiltin(col("doc_id").cast("string"), "")
        val base = Tables.documents(s, d)
          .withColumn("h4", pmod(h, lit(4L)))
          .withColumn("split",
            when(pmod(h, lit(100L)) < 80, "train").otherwise("eval"))
          .localCheckpoint(false) // feeds all three waves + the eval probe
        val train = base.filter(col("split") === "train")
        def wave(df: org.apache.spark.sql.DataFrame) = df.drop("h4", "split")
        val root = scratchTempDir("graft-x123-cdcidx")
        writeStreamWaves(root, Seq(
          wave(train),
          wave(train.filter(col("h4") === 1)
            .withColumn("text", translate(col("text"), "e", "#")))
            .unionByName(wave(train.filter(col("h4") === 3)
              .withColumn("text", concat(col("text"), lit(" alpha"))))),
          wave(train.filter(col("h4") === 2)
            .withColumn("text", lit(null).cast("string")))
            .unionByName(wave(train.filter(col("h4") === 3)))))
        val stream = s.readStream
          .schema(Tables.documents(s, d).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        // catalog table names unique per build (the x143 convention)
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.cdcIndexUpsertStreamBucketed(stream,
          s"x123_chunks_$tag", s"x123_vers_$tag", root + "/ckpt", buckets = sessionBuckets(s),
          chunker = df => TextDedup.cdcChunks(df))
        val live = graft.streaming.StreamingIngest.resolvedChunksBucketed(
          s, s"x123_chunks_$tag", s"x123_vers_$tag")
        TextDedup.cdcIncrementalAgainstIndex(live,
          TextDedup.cdcChunks(base.filter(col("split") === "eval").drop("h4", "split")))
      }),

    Q("x124_grouped_sample_ledger",
      "The BOUNDED DROPPED-LEDGER closing x121's regression window (round-13, the r12 " +
        "verdict item 3): groupedWeightedSampleStream(ledger = 3) keeps the top n+3 rows " +
        "per group — the 3 past the published budget are exactly the last-3-dropped " +
        "versions, so a boundary-dropped version within that horizon backfills a vacated " +
        "slot immediately AND still opposes a later worse re-arrival of its id. Script is " +
        "x121's VERBATIM (corpus arrives; src1's top-5 re-key away at weight x1000; the " +
        "boundary rk-11..13 docs re-arrive at HALF weight alongside the retained rk-6 " +
        "contrast), output is the published rk<=10 sample with the same `regressed` " +
        "column — and it reads ALL-ZERO: the ledger retained rk 11..13 through the move " +
        "wave, so min-priority resolution rejects their halved re-arrivals where x121's " +
        "bounded state had forgotten them (x121 pins the three 1s; this pins the option " +
        "that removes them). State bound O(groups x (n+ledger)); versions dropped beyond " +
        "the ledger horizon keep x121's caveat — the overflow case is spec-pinned in " +
        "GroupedWeightedSampleStreamSpec. Oracle replays the fold wave by wave with " +
        "trims at n+ledger and publishes the rk<=10 prefix, plus x121's " +
        "min-over-delivered-versions frame.",
      Some(groupedSampleForgottenOracle(trim = 13)),
      groupedSampleForgottenQuery(ledger = 3)),

    Q("x125_dedup_stream_retract",
      "The PRODUCTION continuous-dedup loop over a RETRACTABLE index (round-13) — the " +
        "composition x51/x120 prove piecewise, fused and run as one stream " +
        "(streaming.bandIndexUpsertDedupStream): every arriving doc VERSION gets a dedup " +
        "verdict against the LIVE index of strictly-prior waves (updates applied, " +
        "retractions invisible — a stale band can neither convict nor exonerate), with " +
        "SELF-matches excluded (a doc's update probes an index still serving its own " +
        "previous version; 'near-dup of your own last crawl' is not a dedup signal), " +
        "then enters the versioned index as its doc's newest version. Script: the x117 " +
        "waves (full corpus; h4==1 doubled + h4==3 '+alpha' in wave 1; h4==2 null-text " +
        "= retraction + h4==3 reverted in wave 2). Output = the verdict LOG, one row " +
        "per signed arrival per wave. The oracle replays each wave's verdicts in closed " +
        "form — x51's SQL instantiated per wave with (live-corpus-at-k, wave-k batch) " +
        "and self-exclusion, unioned — blind to the version log, the stamped appends, " +
        "and compaction. One signature pass per batch feeds both the probe and the " +
        "band append; the probe stays O(batch x touched buckets) after the doc-keyed " +
        "resolve join. Round-15 (r14 verdict item 1): the fused loop rides the " +
        "BUCKETED log layout (bandIndexUpsertDedupStreamBucketed) — the PER-BATCH " +
        "probe resolve, the fusion's recurring cost, plans ZERO shuffle exchanges " +
        "instead of re-shuffling the band log every wave; verdicts and hashes " +
        "unchanged.",
      Some(dedupStreamRetractOracle),
      (s, d) => {
        val root = scratchTempDir("graft-x125-dedupstream")
        val stream = docUpdateWaveStream(s, d, root)
        // catalog table names unique per build (the x143 convention)
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.bandIndexUpsertDedupStreamBucketed(stream,
          s"x125_bands_$tag", s"x125_vers_$tag", root + "/verdicts", root + "/ckpt",
          buckets = sessionBuckets(s), signer = df => TextDedup.minhashSignaturesPortable(df))
        s.read.parquet(root + "/verdicts")
          .select(col("ingest_seq").as("wave"), col("doc_id"),
            col("n_corpus_hits"), col("n_batch_rivals"), col("keep"))
      }),

    Q("x126_emb_dedup_stream_retract",
      "The x125 fusion applied to the VECTOR index (round-13) — the production " +
        "continuous embedding-dedup loop over a RETRACTABLE index " +
        "(streaming.embIndexUpsertDedupStream): every arriving embedding VERSION gets a " +
        "dedup verdict against the LIVE vector index of strictly-prior waves (updates " +
        "applied, retractions invisible — a stale vector can neither convict nor " +
        "exonerate), with SELF-matches excluded, then enters the versioned index as its " +
        "doc's newest version; null-embedding arrival = retraction (advances the version " +
        "log, no vector row, no verdict row). Script: corpus arrives; wave 1 re-delivers " +
        "h4==0 IDENTICAL (cos==1 with its own live version — keep stays 1 ONLY via " +
        "self-exclusion, the flag pinned as data) and h4==1/h4==3 NEGATED; wave 2 " +
        "retracts h4==2 (null) and REVERTS h4==3; wave 3 probes the post-retraction " +
        "index with every original at vec_id+1e6 and every negation at vec_id+2e6 — the " +
        "full 8-cell update/retraction truth table as keep bits through the FUSED loop " +
        "(originals convict only h4 0/3, negations only h4 1, every h4==2 probe keeps). " +
        "Output = the verdict LOG, one row per signed non-null arrival per wave. Oracle " +
        "replays each wave's verdicts in closed form (the x122 SQL fragments " +
        "instantiated per wave with live-at-k and wave-k arrivals, self-excluded, " +
        "unioned) — blind to the version log, the stamped appends, and compaction. One " +
        "bucketing pass per batch feeds both probe and append; the probe stays one " +
        "bucket equi-join after the doc-keyed resolve. Round-15: the fused loop rides " +
        "the BUCKETED log layout (embIndexUpsertDedupStreamBucketed) — the per-batch " +
        "probe resolve plans zero exchanges; verdicts and hashes unchanged.",
      Some(embDedupStreamOracle),
      (s, d) => {
        val base = Tables.embeddings(s, d)
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("vec_id").cast("string"), ""), lit(4L)))
          .select(col("vec_id"), col("embedding"), col("h4"))
          .localCheckpoint(false) // one corpus pass feeds all four waves
        val neg = transform(col("embedding"), x => -x)
        def w(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"), col("embedding"))
        val root = scratchTempDir("graft-x126-embdedupstream")
        writeStreamWaves(root, Seq(
          w(base),
          w(base.filter(col("h4") === 0))
            .unionByName(w(base.filter(col("h4") === 1).withColumn("embedding", neg)))
            .unionByName(w(base.filter(col("h4") === 3).withColumn("embedding", neg))),
          w(base.filter(col("h4") === 2)
              .withColumn("embedding", lit(null).cast("array<float>")))
            .unionByName(w(base.filter(col("h4") === 3))),
          base.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
            .unionByName(base.select((col("vec_id") + 2000000L).as("vec_id"),
              neg.as("embedding")))))
        val stream = s.readStream
          .schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.embIndexUpsertDedupStreamBucketed(stream,
          s"x126_vecs_$tag", s"x126_vers_$tag", root + "/verdicts", root + "/ckpt",
          buckets = sessionBuckets(s))
        s.read.parquet(root + "/verdicts")
          .select(col("ingest_seq").as("wave"), col("vec_id"), col("bucket"),
            col("keep"))
      }),

    Q("x127_cdc_novelty_stream_retract",
      "The production fusion for the CHUNK index (round-13) — per-arrival CDC novelty " +
        "accounting over the doc-attributed retractable index " +
        "(streaming.cdcIndexUpsertNoveltyStream): every arriving doc version gets " +
        "chunks/corpus-hits/novel-chars against the LIVE chunk set of strictly-prior " +
        "waves, then its chunks enter the index as the doc's newest version. Unlike the " +
        "dedup fusions, SELF is INCLUDED — the index is the content store and the doc's " +
        "own previous version is still stored at probe time, so an update's re-used " +
        "chunks are exactly the bytes a content-addressable store would not write " +
        "again; the retraction win is about OTHERS' stale chunks no longer suppressing " +
        "novelty. Script (on an independent-salt third of the corpus so every h4 class " +
        "stays populated — the portable chunker is the cost driver and the split is the " +
        "knob): corpus arrives (wave 0 = everything novel against an empty " +
        "store); wave 1 re-delivers h4==1 with every 'e' replaced (high novelty vs its " +
        "own stored version) and h4==3 '+alpha' (low novelty — CDC shift-invariance); " +
        "wave 2 retracts h4==2 (null) and reverts h4==3 (~zero novelty vs its own " +
        "'+alpha' version); wave 3 probes with every ORIGINAL text at doc_id+1e6 — " +
        "h4==0/3 copies read ~0 novel (original live), h4==1 copies read HIGH novel " +
        "(only the translated version is stored — under the append-only index the stale " +
        "original would zero this), h4==2 copies read fully novel (retracted). Output = " +
        "the stats LOG. Oracle: per-wave cdcIncrementalOracleOver instantiations " +
        "(live-at-k union wave-k arrivals), unioned — blind to all machinery. " +
        "Round-15: the fused loop rides the BUCKETED log layout " +
        "(cdcIndexUpsertNoveltyStreamBucketed) — the per-batch probe resolve plans " +
        "zero exchanges; stats and hashes unchanged.",
      Some(cdcNoveltyStreamOracle),
      (s, d) => {
        val base = Tables.documents(s, d)
          .filter(pmod(TextDedup.portableHashBuiltin(
            col("doc_id").cast("string"), "x127"), lit(3L)) === 0)
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("doc_id").cast("string"), ""), lit(4L)))
          .select(col("doc_id"), col("text"), col("h4"))
          .localCheckpoint(false) // one corpus pass feeds all four waves
        def w(df: org.apache.spark.sql.DataFrame) =
          df.select(col("doc_id"), col("text"))
        val root = scratchTempDir("graft-x127-cdcnovelty")
        writeStreamWaves(root, Seq(
          w(base),
          w(base.filter(col("h4") === 1)
              .withColumn("text", translate(col("text"), "e", "#")))
            .unionByName(w(base.filter(col("h4") === 3)
              .withColumn("text", concat(col("text"), lit(" alpha"))))),
          w(base.filter(col("h4") === 2).withColumn("text", lit(null).cast("string")))
            .unionByName(w(base.filter(col("h4") === 3))),
          base.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))))
        val stream = s.readStream
          .schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.cdcIndexUpsertNoveltyStreamBucketed(stream,
          s"x127_chunks_$tag", s"x127_vers_$tag", root + "/stats", root + "/ckpt",
          buckets = sessionBuckets(s), chunker = df => TextDedup.cdcChunks(df))
        s.read.parquet(root + "/stats")
          .select(col("ingest_seq").as("wave"), col("doc_id"),
            col("n_chunks"), col("n_corpus_hits"), col("novel_chars"))
      }),

    Q("x128_ivf_index_upsert",
      "The versioned-index idiom applied to the ANN SERVING structure (round-13) — an " +
        "incrementally-maintained IVF index (streaming.ivfIndexUpsertStream + " +
        "resolvedIvfVectors): the cell structure is PINNED (the x14 stride-sample " +
        "centroids — fit once, broadcast-sized; the standard production posture where " +
        "structure refresh is a rare offline event and membership churn is continuous) " +
        "and each arriving vector version is assigned to its nearest pinned cell at " +
        "arrival time, O(batch x C), never O(corpus). Updates MOVE a doc's live row to " +
        "the new vector's cell; a null-embedding re-arrival advances the version log " +
        "with zero rows — the doc leaves the served index (batch IVF re-assigns the " +
        "world per run and can do neither without a full rebuild). Script: the x122 " +
        "waves (corpus; h4==1/3 negated; h4==2 deleted + h4==3 reverted); then the " +
        "query side serves knnIvf DIRECTLY off the resolved live rows (assignedOpt — " +
        "the stored assignment IS the inverted file) with the original ten probe " +
        "vectors. Oracle = the proven x14 IVF chain with its corpus CTE swapped for " +
        "the latest-version live index in closed form (assignment is a pure function " +
        "of (vector, centroids), so per-arrival and whole-corpus assignment agree " +
        "exactly) — any stale, missing, or mis-celled vector changes a candidate set " +
        "and the hash. Round-15: the inverted file rides the BUCKETED log layout " +
        "(ivfIndexUpsertStreamBucketed / resolvedIvfVectorsBucketed) — the serving " +
        "resolve plans zero exchanges; candidates and hashes unchanged.",
      Some(ivfUpsertOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val base = emb
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("vec_id").cast("string"), ""), lit(4L)))
          .select(col("vec_id"), col("embedding"), col("h4"))
          .localCheckpoint(false) // one corpus pass feeds all three waves + queries
        val neg = transform(col("embedding"), x => -x)
        def w(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"), col("embedding"))
        val root = scratchTempDir("graft-x128-ivfidx")
        writeStreamWaves(root, Seq(
          w(base),
          w(base.filter(col("h4") === 1).withColumn("embedding", neg))
            .unionByName(w(base.filter(col("h4") === 3).withColumn("embedding", neg))),
          w(base.filter(col("h4") === 2)
              .withColumn("embedding", lit(null).cast("array<float>")))
            .unionByName(w(base.filter(col("h4") === 3)))))
        // the pinned cell structure: the x14 stride sample, materialized
        // once — it is re-read every micro-batch of the maintenance loop
        val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        val stream = s.readStream
          .schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.ivfIndexUpsertStreamBucketed(stream,
          s"x128_vecs_$tag", s"x128_vers_$tag", root + "/ckpt", centroids,
          buckets = sessionBuckets(s))
        val live = graft.streaming.StreamingIngest.resolvedIvfVectorsBucketed(
          s, s"x128_vecs_$tag", s"x128_vers_$tag").localCheckpoint(false)
        Similarity.knnIvf(
          base.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding")),
          live, centroids, 5, 4, assignedOpt = Some(live))
      }),

    Q("x129_ivf_drift_recall",
      "The 'when must I refit?' question for the incrementally-maintained IVF index " +
        "(round-13, annotating x128) as recall DATA: after x128's churn script (h4==1 " +
        "re-embedded to the complement direction, h4==2 deleted), how much recall@5 does " +
        "the PINNED cell structure still serve vs the same stride policy REFIT on the " +
        "live corpus, both measured against brute truth over the latest versions? One " +
        "row per query: n_hits/recall_bp for the pinned arm (the x128 serving posture — " +
        "structure fit once, membership churned per arrival) and the refit arm (the rare " +
        "offline event). All three rankings are closed-form over the live corpus (x06's " +
        "brute, two x14 chains differing only in the centroid relation), the recall join " +
        "is x78's exact-integer tail — no float leaves the plan. The churned corpus is " +
        "the adversarial case for a pinned structure: a quarter of the live vectors " +
        "moved to directions the original centroid sample never saw.",
      Some(ivfDriftRecallOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val base = emb
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("vec_id").cast("string"), ""), lit(4L)))
          .select(col("vec_id"), col("embedding"), col("h4"))
          .localCheckpoint(false)
        val neg = transform(col("embedding"), x => -x)
        // the latest-version corpus in closed form (x128's post-churn state)
        val live = base.filter(col("h4") === 1).withColumn("embedding", neg)
          .unionByName(base.filter(col("h4") === 0 || col("h4") === 3))
          .drop("h4").localCheckpoint(false)
        val queries = base.filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding"))
        val pinned = Similarity.strideCentroids(base.drop("h4"), 16).localCheckpoint(false)
        val refit = Similarity.strideCentroids(live, 16).localCheckpoint(false)
        val truth = Similarity.knnBrute(queries, live, 5).localCheckpoint(false)
        def arm(cents: org.apache.spark.sql.DataFrame) =
          Similarity.knnIvf(queries, live, cents, 5, 4)
        Similarity.annRecall(truth, arm(pinned))
          .select(col("qid"), col("n_true"),
            col("n_hits").as("n_hits_pinned"),
            col("recall_bp").as("recall_bp_pinned"))
          .join(Similarity.annRecall(truth, arm(refit))
            .select(col("qid"),
              col("n_hits").as("n_hits_refit"),
              col("recall_bp").as("recall_bp_refit")), Seq("qid"))
      }),

    Q("x130_ivf_refit_swap",
      "The refit-and-swap OPERATION closing the IVF serving lifecycle (round-13: x128 " +
        "maintains membership per arrival against pinned cells, x129 measures what the " +
        "pin costs in recall as the corpus churns, x130 refits when that cost is no " +
        "longer acceptable): streaming.ivfRefitSwap derives a fresh centroid set from " +
        "the LIVE corpus with the caller's policy, re-assigns every live vector once — " +
        "the only whole-corpus pass anywhere in the lifecycle — and swaps the standing " +
        "data log in place (crash-safe in either swap order; every surviving row keeps " +
        "its ingest_seq stamp so resolution, replay guards, and later stream batches " +
        "are oblivious). The refit IS a compaction: superseded versions drop in the " +
        "same rewrite and the version log shrinks to one max-seq row per id. Script: " +
        "x128's churn waves build the index, then refit-and-swap, then serve knnIvf " +
        "off the swapped log with the returned centroids. Oracle = the x14 chain with " +
        "BOTH corpus and centroid relations swapped for the latest-version live corpus " +
        "(exactly x129's refit arm) — any row the swap dropped, mis-celled, or " +
        "re-stamped changes a candidate set and the hash.",
      Some(ivfRefitOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val base = emb
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("vec_id").cast("string"), ""), lit(4L)))
          .select(col("vec_id"), col("embedding"), col("h4"))
          .localCheckpoint(false)
        val neg = transform(col("embedding"), x => -x)
        def w(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"), col("embedding"))
        val root = scratchTempDir("graft-x130-ivfrefit")
        writeStreamWaves(root, Seq(
          w(base),
          w(base.filter(col("h4") === 1).withColumn("embedding", neg))
            .unionByName(w(base.filter(col("h4") === 3).withColumn("embedding", neg))),
          w(base.filter(col("h4") === 2)
              .withColumn("embedding", lit(null).cast("array<float>")))
            .unionByName(w(base.filter(col("h4") === 3)))))
        val pinned = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        val stream = s.readStream
          .schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        graft.streaming.StreamingIngest.ivfIndexUpsertStream(stream,
          root + "/vecs", root + "/versions", root + "/ckpt", pinned)
        val refitCents = graft.streaming.StreamingIngest.ivfRefitSwap(
          s, root + "/vecs", root + "/versions")
        val live = graft.streaming.StreamingIngest.resolvedIvfVectors(
          s, root + "/vecs", root + "/versions").localCheckpoint(false)
        Similarity.knnIvf(
          base.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding")),
          live, refitCents, 5, 4, assignedOpt = Some(live))
      }),

    Q("x131_ivf_drift_gauge",
      "The AFFORDABLE drift gauge completing the IVF lifecycle's control loop " +
        "(round-13): x129's recall truth needs a brute pass no production system can " +
        "run per epoch; this is the O(live x C) statistic it calibrates — per cell, " +
        "live occupancy and the exact-integer mass of assigned cosines " +
        "(SUM(floor(cs*1e6)), the kmeansInertia fixed-point idiom), in THREE arms over " +
        "one row shape: the FIT-time snapshot (pinned cells, original corpus), the " +
        "pinned structure NOW (post-churn live corpus), and the refit structure NOW. " +
        "The drift signal is fit-vs-pinned-now PER STRUCTURE: the corpus shrinks " +
        "500 to 362 live, occupancy re-skews, and a churn-loaded cell's mean csim falls " +
        "~20% from its fit-time value — watched without ever computing a true " +
        "neighbor, cheap enough to fold into every x128 maintenance cycle. The data " +
        "also pins the TRAP (the x115 idiom): the naive cross-structure reading is " +
        "backwards — the refit arm shows LOWER mean csim over FEWER cells (two stride " +
        "centroids were deleted/negated by the churn, coarsening the partition) while " +
        "serving HIGHER recall in x129, so csim mass compares a structure against its " +
        "own fit-time self, never one structure against another. Oracle = three " +
        "assignment chains with the assigned cosine kept, folded per cell.",
      Some(ivfDriftGaugeOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val base = emb
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("vec_id").cast("string"), ""), lit(4L)))
          .select(col("vec_id"), col("embedding"), col("h4"))
          .localCheckpoint(false)
        val neg = transform(col("embedding"), x => -x)
        val live = base.filter(col("h4") === 1).withColumn("embedding", neg)
          .unionByName(base.filter(col("h4") === 0 || col("h4") === 3))
          .drop("h4").localCheckpoint(false)
        def gauge(corpus: org.apache.spark.sql.DataFrame,
            cents: org.apache.spark.sql.DataFrame, label: String) = {
          val cells = cents.select(col("vec_id").as("cell_id"), col("embedding").as("cv"))
          corpus.join(broadcast(cells))
            .withColumn("csim", graft.functions.cosine_similarity(col("embedding"), col("cv")))
            .groupBy(col("vec_id"))
            .agg(graft.functions.top_k_by(col("csim"), col("cell_id"), 1).as("top"))
            .select(col("top").getItem(0).getField("id").as("cell_id"),
              col("top").getItem(0).getField("score").as("cs"))
            .groupBy(col("cell_id"))
            .agg(count(lit(1)).as("n_live"),
              sum(floor(col("cs") * lit(1000000.0)).cast("long")).as("sum_csim_micro"))
            .select(lit(label).as("arm"), col("cell_id"), col("n_live"),
              col("sum_csim_micro"))
        }
        val original = base.drop("h4")
        val pinned = Similarity.strideCentroids(original, 16).localCheckpoint(false)
        gauge(original, pinned, "fit")
          .unionByName(gauge(live, pinned, "pinned"))
          .unionByName(gauge(live,
            Similarity.strideCentroids(live, 16).localCheckpoint(false), "refit"))
      }),

    Q("x132_asof_snapshot",
      "AS-OF (time-travel) resolution over the versioned logs — the training-run " +
        "REPRODUCIBILITY read the whole retraction regime earns (round-13): 'rebuild the " +
        "exact corpus snapshot batch S saw' is one generic read " +
        "(streaming.resolvedRowsAsOf — each id's data rows stamped with its max " +
        "version-log seq AMONG seqs <= S), serving every versioned family because the " +
        "logs share one layout (DocStoreAsOfSpec pins it on the postings log too). Script: " +
        "the x117 update waves over the versioned DOC STORE (docStoreStream — the corpus " +
        "itself as a retractable standing table): wave 0 the full corpus, wave 1 h4==1 " +
        "doubled + h4==3 '+alpha', wave 2 h4==2 deleted + h4==3 reverted. Output: " +
        "per-(arm, h4) doc counts and char sums for as-of snapshots s0/s1/s2 — each " +
        "arm hash-matching the closed-form wave-k corpus, blind to the log machinery — " +
        "PLUS the fidelity bound pinned as data: the s0_compacted arm re-reads as-of(0) " +
        "AFTER maybeCompactVersioned destroyed superseded versions, and only the " +
        "never-touched h4==0 bucket survives into the reconstruction (updated and " +
        "deleted ids silently vanish from history — the LSM trade: history retention " +
        "and read amplification are the same maxFiles knob). The stream runs with " +
        "retention pinned (maxFiles=MaxValue): the x100 sweep caught the default-64 " +
        "cadence compacting MID-STREAM once per-append file counts grow past what AQE " +
        "coalesces at small scale — an as-of consumer must own the knob, which is the " +
        "hazard this query's caveat arm exists to demonstrate. Cost: each arm is the " +
        "live-read shape — one id-keyed equi-join against the capped max-seq aggregate, " +
        "never a corpus re-scan.",
      Some("""WITH t AS (SELECT doc_id, text,
             |       ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
             |     FROM documents),
             |u AS (
             |  SELECT 's0' AS arm, h4, text FROM t
             |  UNION ALL
             |  SELECT 's1', h4, CASE WHEN h4 = 1 THEN text || ' ' || text
             |                        WHEN h4 = 3 THEN text || ' alpha'
             |                        ELSE text END FROM t
             |  UNION ALL
             |  SELECT 's2', h4, CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text END
             |  FROM t WHERE h4 <> 2
             |  UNION ALL
             |  SELECT 's0_compacted', h4, text FROM t WHERE h4 = 0)
             |SELECT arm, h4, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(len(text)) AS BIGINT) AS chars
             |FROM u GROUP BY arm, h4 ORDER BY arm, h4""".stripMargin),
      (s, d) => {
        val root = scratchTempDir("graft-x132-asof")
        val stream = docUpdateWaveStream(s, d, root)
        // retention pinned OFF the automatic cadence: an as-of consumer
        // must own the compaction knob — the x100 sweep caught the
        // default-64 gate firing MID-STREAM there (32 shuffle-partition
        // files per append once AQE stops coalescing) and compacting
        // away the very history the arms read; at sf0.01/0.1 AQE's 1-2
        // files per append never trip it, which is exactly the silent
        // scale hazard the explicit knob removes
        graft.streaming.StreamingIngest.docStoreStream(stream,
          root + "/docs", root + "/versions", root + "/ckpt",
          maxFiles = Int.MaxValue)
        def arm(name: String, seq: Long) =
          graft.streaming.StreamingIngest.resolvedRowsAsOf(
              s, root + "/docs", root + "/versions", "doc_id", seq)
            .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
              col("doc_id").cast("string"), ""), lit(4L)))
            .groupBy(col("h4"))
            .agg(count(lit(1)).as("n_docs"),
              sum(length(col("text"))).cast("long").as("chars"))
            .withColumn("arm", lit(name))
        // EAGER checkpoint: the pre-compaction arms must be pinned
        // before compaction destroys the superseded versions they read
        val pre = arm("s0", 0).unionByName(arm("s1", 1)).unionByName(arm("s2", 2))
          .localCheckpoint()
        graft.streaming.StreamingIngest.maybeCompactVersioned(
          s, root + "/docs", root + "/versions", 0, "doc_id")
        pre.unionByName(arm("s0_compacted", 0))
          .select(col("arm"), col("h4"), col("n_docs"), col("chars"))
      }),

    Q("x133_sketch_rebuild",
      "Sketches CANNOT forget — the retraction regime's boundary, pinned as data, with " +
        "the rebuild-from-versioned-log remedy (round-13). HLL registers are MONOTONE " +
        "(merge = per-register max: associative, commutative, idempotent), so a standing " +
        "streamed sketch equals the one-shot sketch over everything it ever absorbed — " +
        "deletions and updates included forever; no tombstone idiom applies, unlike the " +
        "four versioned index families. Script: the x117 waves through docStoreStream, " +
        "then per-source distinct-text accounting in three arms: the standing sketch's " +
        "absorbed multiset (every version in the data log), the live corpus, and a " +
        "sketch REBUILT from the resolved live corpus — the remedy the versioned store " +
        "makes possible (O(live), paid only at rebuild; the same move as ivfRefitSwap). " +
        "Output pins n_seen vs n_live exactly (churn drives them ~2x apart) and three " +
        "x13-style contract bits: standing_ok=1 (the sketch tracks what it absorbed, " +
        "within its 5% bound), rebuilt_ok=1 (the rebuilt sketch tracks the live " +
        "corpus), standing_tracks_live=0 (the standing sketch provably does NOT track " +
        "the live corpus after churn — the bit the monotonicity makes certain). " +
        "Retention is pinned (maxFiles=MaxValue, the x132 note): the absorbed-multiset " +
        "read needs every retained version. Aggregates follow x13's split (exact and " +
        "sketch in separate aggregates joined on the tiny group key — one Expand " +
        "otherwise).",
      Some("""WITH t AS (SELECT doc_id, source, text,
             |       ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
             |     FROM documents),
             |seen AS (SELECT source, text FROM t
             |  UNION ALL SELECT source, text || ' ' || text FROM t WHERE h4 = 1
             |  UNION ALL SELECT source, text || ' alpha' FROM t WHERE h4 = 3),
             |live AS (SELECT source,
             |    CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text END AS text
             |  FROM t WHERE h4 <> 2),
             |a AS (SELECT source, CAST(count(DISTINCT text) AS BIGINT) AS n_seen
             |      FROM seen GROUP BY source),
             |b AS (SELECT source, CAST(count(DISTINCT text) AS BIGINT) AS n_live
             |      FROM live GROUP BY source)
             |SELECT a.source AS source, n_seen, n_live,
             |       CAST(1 AS INT) AS standing_ok, CAST(1 AS INT) AS rebuilt_ok,
             |       CAST(0 AS INT) AS standing_tracks_live
             |FROM a JOIN b ON a.source = b.source ORDER BY source""".stripMargin),
      (s, d) => {
        val root = scratchTempDir("graft-x133-sketch")
        val stream = docUpdateWaveStream(s, d, root)
        // retention pinned off the automatic cadence (the x132 note):
        // the absorbed-multiset read below NEEDS every retained version
        graft.streaming.StreamingIngest.docStoreStream(stream,
          root + "/docs", root + "/versions", root + "/ckpt",
          maxFiles = Int.MaxValue)
        // the absorbed multiset: every version the data log retained —
        // by register-monotonicity, exactly what a standing merged
        // sketch has converged to
        val seen = s.read.parquet(root + "/docs")
        val live = graft.streaming.StreamingIngest.resolvedDocs(
          s, root + "/docs", root + "/versions")
        val seenExact = seen.groupBy(col("source"))
          .agg(countDistinct(col("text")).as("n_seen"))
        val seenEst = seen.groupBy(col("source").as("src_a"))
          .agg(approx_count_distinct(col("text"), 0.01).as("est_standing"))
        val liveExact = live.groupBy(col("source").as("src_b"))
          .agg(countDistinct(col("text")).as("n_live"))
        val liveEst = live.groupBy(col("source").as("src_c"))
          .agg(approx_count_distinct(col("text"), 0.01).as("est_rebuilt"))
        seenExact
          .join(seenEst, col("source") <=> col("src_a"))
          .join(liveExact, col("source") <=> col("src_b"))
          .join(liveEst, col("source") <=> col("src_c"))
          .select(col("source"), col("n_seen"), col("n_live"),
            (abs(col("est_standing") - col("n_seen")) <= col("n_seen") * 0.05)
              .cast("int").as("standing_ok"),
            (abs(col("est_rebuilt") - col("n_live")) <= col("n_live") * 0.05)
              .cast("int").as("rebuilt_ok"),
            (abs(col("est_standing") - col("n_live")) <= col("n_live") * 0.05)
              .cast("int").as("standing_tracks_live"))
      }),

    Q("x134_classifier_retract",
      "The quality classifier maintained EXACTLY under doc update/retraction (round-13) " +
        "— x133's counterpart on the other side of the forgettability line: HLL " +
        "registers are monotone and need the rebuild remedy, but normal-equation " +
        "sufficient statistics are SUBTRACTABLE, so the model can stay bit-consistent " +
        "with the live corpus at O(batch) per arrival, never re-aggregating history. " +
        "Machinery (streaming.classifierRetractStream, the x125 fusion posture over " +
        "docStoreStream): per batch, each arriving id's previous live version is read " +
        "from the versioned store (capped at ingest_seq < batchId), its stats " +
        "contribution leaves as negated rows while the new version's enters as added " +
        "rows (null-text arrival adds nothing = deletion), and the arrivals enter the " +
        "doc store; the refit folds the stats log and scores the resolved live corpus. " +
        "Script: the x117 waves (doubled/intermediate-update/delete/revert). The " +
        "oracle is x102's generated Leibniz-expansion SQL instantiated over the " +
        "latest-version corpus in closed form — blind to the streaming, the " +
        "subtraction, and the arrival order; any stats drift that moves a decision " +
        "moves the hash. Guard maxes are the one monotone part (max has no inverse): " +
        "the fold keeps the historical max — a conservative overflow guard, " +
        "spec-pinned (ClassifierRetractStreamSpec) along with exact a/b-cell equality " +
        "and the stats-log compaction/replay boundary.",
      Some(x134Oracle),
      (s, d) => {
        val root = scratchTempDir("graft-x134-clfret")
        val stream = docUpdateWaveStream(s, d, root)
        graft.streaming.StreamingIngest.classifierRetractStream(stream,
          root + "/docs", root + "/versions", root + "/stats", root + "/ckpt",
          classifierFeatures, classifierWeakLabel)
        // production cadence: the logs are fold/resolve-sized either way;
        // compacting here exercises the max-seq stamp on the read path
        graft.streaming.StreamingIngest.maybeCompactStats(s, root + "/stats", 0)
        graft.streaming.StreamingIngest.classifierFromStatsLog(s, root + "/stats",
          graft.streaming.StreamingIngest.resolvedDocs(s, root + "/docs", root + "/versions"),
          classifierFeatures, classifierWeakLabel)
          .select(col("doc_id"), col("y"), col("yhat"), col("margin_sign"))
      }),

    Q("x135_epoch_allocation",
      "Token-budget EPOCH planning with a max-epoch cap — the UPSAMPLING mix the " +
        "downsample-only pair x48/x55 cannot express (round-13): given a training " +
        "budget (2x the corpus' tokens), per-source mixture weights (graded 1..20 by " +
        "source suffix), and an epoch cap (3 — no source repeats more than thrice), " +
        "allocate tokens proportionally to weight EXCEPT where that exceeds the cap, " +
        "redistributing capped sources' unused share among the rest — the recipe step " +
        "that decides how many epochs of each source a run actually sees. The " +
        "cap-redistribute fixpoint is computed in its WATER-FILLING closed form, not a " +
        "loop: sort sources by headroom ratio cap*avail/w (one IEEE division, " +
        "bit-portable), and the binding set is the prefix where the cross-multiplied " +
        "integer test (budget - cap*A_prev)*w >= cap*avail*(W - w_prev) holds under a " +
        "running min (ratios ascend, so once the test fails it fails forever) — every " +
        "comparison and allocation in exact BIGINT products/DIV, epochs as exact basis " +
        "points (capped rows pin to 30000). Scale shape: ONE corpus pass (the " +
        "per-source token aggregate); everything downstream — sort, prefix sums, " +
        "cutoff, redistribution — is |sources|-sized, with the two 1-row totals " +
        "attached as broadcast scalars.",
      Some(s"""$epochAllocCtes
             |SELECT k.source, k.avail, k.w, CAST(k.capped AS INT) AS capped,
             |  CAST(CASE WHEN k.capped=1 THEN 3*k.avail
             |            ELSE (k.budget - 3*g.a_cap)*k.w // g.w_unc END AS BIGINT) AS alloc,
             |  CAST(CASE WHEN k.capped=1 THEN 30000
             |            ELSE ((k.budget - 3*g.a_cap)*k.w // g.w_unc)*10000 // k.avail
             |       END AS BIGINT) AS epochs_bp
             |FROM k, g ORDER BY k.source""".stripMargin),
      (s, d) => epochAllocation(s, d)),

    Q("x136_epoch_realize",
      "How a LOADER deterministically realizes x135's fractional epochs (round-13) — " +
        "the plan-to-data bridge that closes the mixing story: a source allocated " +
        "2.37 epochs repeats every doc twice and gives an extra pass to a " +
        "hash-selected 37% of docs — integer full epochs from epochs_bp DIV 10000 " +
        "plus a portable-hash Bernoulli (salt 'epoch', threshold epochs_bp mod 10000 " +
        "basis points) for the fraction, so re-runs, retries, and both engines pick " +
        "the SAME extra-pass docs (the x48/x34 RNG-free determinism applied to " +
        "upsampling). Output per source: the planned allocation, realized " +
        "tokens/docs, and the realization drift |realized - alloc| in basis points " +
        "(the hash-thinning quantization error — small but nonzero, pinned exactly). " +
        "Cost: the x135 plan (one corpus aggregate + a 20-row scan) plus ONE " +
        "corpus pass under a broadcast 20-row plan join — copies are counted " +
        "arithmetically, never materialized.",
      Some(s"""$epochAllocCtes,
             |plan AS (SELECT k.source,
             |  CAST(CASE WHEN k.capped=1 THEN 3*k.avail
             |            ELSE (k.budget - 3*g.a_cap)*k.w // g.w_unc END AS BIGINT) AS alloc,
             |  CAST(CASE WHEN k.capped=1 THEN 30000
             |            ELSE ((k.budget - 3*g.a_cap)*k.w // g.w_unc)*10000 // k.avail
             |       END AS BIGINT) AS epochs_bp
             |  FROM k, g),
             |r AS (SELECT dd.source,
             |  CAST(sum(CAST(len(string_split(dd.text,' ')) AS BIGINT) *
             |    (p.epochs_bp // 10000 + CASE WHEN
             |       ('0x'||substr(md5(CAST(dd.doc_id AS VARCHAR)||'epoch'),1,15))::BIGINT % 10000
             |         < p.epochs_bp % 10000 THEN 1 ELSE 0 END)) AS BIGINT) AS realized_tokens,
             |  CAST(sum(p.epochs_bp // 10000 + CASE WHEN
             |       ('0x'||substr(md5(CAST(dd.doc_id AS VARCHAR)||'epoch'),1,15))::BIGINT % 10000
             |         < p.epochs_bp % 10000 THEN 1 ELSE 0 END) AS BIGINT) AS realized_docs
             |  FROM documents dd JOIN plan p ON dd.source = p.source GROUP BY dd.source)
             |SELECT r.source, p.alloc, r.realized_tokens, r.realized_docs,
             |  CAST(abs(r.realized_tokens - p.alloc)*10000 // p.alloc AS BIGINT) AS adrift_bp
             |FROM r JOIN plan p ON r.source = p.source ORDER BY r.source""".stripMargin),
      (s, d) => {
        val plan = epochAllocation(s, d).select(
          col("source"), col("alloc"), col("epochs_bp"))
        val extra = (pmod(TextDedup.portableHashBuiltin(
            col("doc_id").cast("string"), "epoch"), lit(10000L)) <
          col("epochs_bp") % 10000L).cast("long")
        // DIV, not `/`: long`/`long is DOUBLE division in Spark
        val copies = expr("epochs_bp DIV 10000") + extra
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .join(broadcast(plan), Seq("source"))
          .groupBy(col("source"))
          .agg(sum(col("toks") * copies).as("realized_tokens"),
            sum(copies).as("realized_docs"),
            first(col("alloc")).as("alloc"))
          .select(col("source"), col("alloc"), col("realized_tokens"),
            col("realized_docs"),
            expr("(abs(realized_tokens - alloc) * 10000) DIV alloc")
              .as("adrift_bp"))
      }),

    Q("x138_model_asof",
      "TRAINING-RUN reproducibility end to end (round-13): the classifier EXACTLY as " +
        "it stood when batch S committed, scored over the corpus exactly as batch S " +
        "saw it — model time travel (classifierStatsAsOf: the stats log's deltas are " +
        "stamped once per batch, so the historical sufficient statistics are the fold " +
        "over stamps <= S) aligned with corpus time travel (resolvedRowsAsOf, x132), " +
        "both off the logs ONE stream already maintains (classifierRetractStream). " +
        "Script: the shared x117 waves; S = 1 (after the update wave, before the " +
        "deletion wave). The oracle is the x102 generated SQL over the wave-1 corpus " +
        "in closed form — a model whose fold missed wave 1's subtractions, or a " +
        "corpus arm off by one version, moves decisions and the hash. Same fidelity " +
        "bound as every as-of read: compaction folds history away, so model time " +
        "travel reaches back only to the last rewrite (the x132 retention-knob note " +
        "applies to the stats log verbatim).",
      Some(x138Oracle),
      (s, d) => {
        val root = scratchTempDir("graft-x138-modelasof")
        val stream = docUpdateWaveStream(s, d, root)
        graft.streaming.StreamingIngest.classifierRetractStream(stream,
          root + "/docs", root + "/versions", root + "/stats", root + "/ckpt",
          classifierFeatures, classifierWeakLabel, maxFiles = Int.MaxValue)
        val statsAt1 = graft.streaming.StreamingIngest.classifierStatsAsOf(
          s, root + "/stats", classifierFeatures.size + 1, 1L)
        val corpusAt1 = graft.streaming.StreamingIngest.resolvedRowsAsOf(
          s, root + "/docs", root + "/versions", "doc_id", 1L)
        graft.ext.LinearModel.scoreWithStats(statsAt1, corpusAt1,
            classifierFeatures, classifierWeakLabel)
          .select(col("doc_id"), col("y"), col("yhat"), col("margin_sign"))
      }),

    Q("x144_training_cut",
      "The TRAINING CUT manifest (round-14) — reproducibility lifted from one log to " +
        "the published recipe over all of them: a training run needs the corpus as-of " +
        "S_c AND the model stats as-of S_m as one CONSISTENT, atomically-published " +
        "cut (streaming.publishTrainingCut — a (log_name, as_of_seq) table committed " +
        "through the ManifestTable replace-flip, so a consumer sees the whole cut or " +
        "the previous one, never half, and historical cuts stay readable by manifest " +
        "version). Script: the shared x117 waves through classifierRetractStream " +
        "(one stream maintains corpus + version + stats logs); the cut (corpus 1, " +
        "stats 1) is published, then read BACK from the artifact and every as-of " +
        "resolves through the recorded seqs (the corpus arm through the x141 checked " +
        "read). Output = x138's historical scoring frame reproduced through the " +
        "manifest indirection, plus the cut itself as columns (manifest_v, " +
        "corpus_seq, stats_seq) — a wrong recorded seq, a half-published cut, or a " +
        "manifest read that failed over to defaults moves both the constants and " +
        "the scores, and the hash catches it. Oracle = x138's closed-form wave-1 " +
        "classifier SQL with the cut constants appended.",
      Some(s"""SELECT doc_id, y, yhat, margin_sign,
             |  CAST(0 AS BIGINT) AS manifest_v,
             |  CAST(1 AS BIGINT) AS corpus_seq,
             |  CAST(1 AS BIGINT) AS stats_seq
             |FROM ($x138Oracle) t""".stripMargin),
      (s, d) => {
        val SI = graft.streaming.StreamingIngest
        val root = scratchTempDir("graft-x144-cut")
        SI.classifierRetractStream(docUpdateWaveStream(s, d, root),
          root + "/docs", root + "/versions", root + "/stats", root + "/ckpt",
          classifierFeatures, classifierWeakLabel, maxFiles = Int.MaxValue)
        val mroot = root + "/cut"
        val v = SI.publishTrainingCut(s, mroot,
          Seq("corpus" -> 1L, "stats" -> 1L))
        val cut = SI.readTrainingCut(s, mroot)
        val statsAt = SI.classifierStatsAsOf(
          s, root + "/stats", classifierFeatures.size + 1, cut("stats"))
        val corpusAt = SI.resolvedRowsAsOfChecked(
          s, root + "/docs", root + "/versions", "doc_id", cut("corpus"))
        graft.ext.LinearModel.scoreWithStats(statsAt, corpusAt,
            classifierFeatures, classifierWeakLabel)
          .select(col("doc_id"), col("y"), col("yhat"), col("margin_sign"),
            lit(v).as("manifest_v"),
            lit(cut("corpus")).as("corpus_seq"),
            lit(cut("stats")).as("stats_seq"))
      }),

    Q("x139_rollup_ivm",
      "INCREMENTAL VIEW MAINTENANCE for additive rollups (round-13) — the capability " +
        "Spark itself lacks, realized by the subtraction idiom: maintain an exact " +
        "GROUP BY view (per (source, lang): row count, token sum, char sum) over a " +
        "churning corpus at O(batch) per arrival — arriving versions add, each " +
        "arriving id's previous live version subtracts (read back from the fused doc " +
        "store), the standing view is ONE group-keyed sum over the delta log. " +
        "Bit-equal to the batch rollup over the live corpus because integer addition " +
        "has an inverse — the forgettability taxonomy's subtractable class at " +
        "WAREHOUSE granularity (x134 was model granularity); measures must be " +
        "additive, min/max/distinct are the monotone class and need the " +
        "versioned-log rebuild instead. Script: the shared x117 waves; a group whose " +
        "docs all leave disappears (row count 0). Oracle = the closed-form " +
        "latest-version corpus rolled up in SQL, blind to deltas, streaming, and " +
        "arrival order. IvmRollupSpec pins batch equality, group disappearance, " +
        "replay no-op, and compaction invariance.",
      Some("""WITH live AS (
             |  SELECT doc_id, source, lang,
             |         CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text END AS text
             |    FROM (SELECT doc_id, source, lang, text,
             |            ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
             |          FROM documents) t
             |    WHERE h4 <> 2)
             |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens,
             |       CAST(SUM(len(text)) AS BIGINT) AS n_chars
             |FROM live GROUP BY source, lang ORDER BY source, lang""".stripMargin),
      (s, d) => {
        val root = scratchTempDir("graft-x139-ivm")
        val stream = docUpdateWaveStream(s, d, root)
        graft.streaming.StreamingIngest.ivmRollupStream(stream,
          root + "/docs", root + "/versions", root + "/rollup", root + "/ckpt",
          Seq("source", "lang"),
          Seq("n_tokens" -> size(split(col("text"), " ")).cast("long"),
            "n_chars" -> length(col("text")).cast("long")))
        graft.streaming.StreamingIngest.resolvedRollup(
            s, root + "/rollup", Seq("source", "lang"))
          .select(col("source"), col("lang"), col("n_rows"),
            col("n_tokens"), col("n_chars"))
      }),

    Q("x140_ivf_policy_loop",
      "The GAUGE-TRIGGERED REFIT POLICY composing the IVF serving lifecycle into one " +
        "closed control loop (round-14; x128 maintains membership, x131 showed drift " +
        "is affordably gaugeable, x130 refits — this decides WHEN): " +
        "streaming.ivfPolicyStream maintains the index per wave, reads the " +
        "occupancy-drift gauge (occupancyDriftBp — total-variation distance in basis " +
        "points between the structure's fit-time cell-occupancy distribution and the " +
        "current one; pure BIGINT arithmetic off the STORED assignments, O(live) with " +
        "zero float work, strictly cheaper than x131's O(live x C) csim arms), " +
        "appends the reading to a standing policy log, and fires ivfRefitSwap exactly " +
        "when the reading crosses the threshold (3000 bp here; strict >, the " +
        "IvfUpsertStreamSpec boundary). Script: wave 0 the corpus (install — tv 0 by " +
        "definition); wave 1 re-embeds h4==3 onto its first axis (~2000 bp, holds); " +
        "wave 2 re-embeds h4==1 likewise and deletes h4==2 (~5100-5600 bp, FIRES — " +
        "the refit re-derives cells from the live corpus and re-stamps the inverted " +
        "file); wave 3 re-adds h4==2 (~700-1200 bp against the NEW structure's fit, " +
        "holds). Output pins the whole policy history as data — (wave, n_live, tv_bp, " +
        "fired) per cycle — plus the x129 recall join of post-policy serving (knnIvf " +
        "off the swapped log + current structure) against brute truth over the final " +
        "corpus. Oracle = closed-form occupancy chains + BIGINT TV arithmetic with " +
        "COMPUTED fired bits (tv > threshold, never baked in) + x129's recall SQL: if " +
        "the engine fired on any other wave, its assignments, gauge rows, and serve " +
        "candidates all diverge from the closed form and the hash catches it. " +
        "Round-15: the loop rides the BUCKETED log layout (ivfPolicyStreamBucketed — " +
        "serving resolve, view subtraction probe, and refit reads all bucket-local) " +
        "and the gauge reads a standing O(batch)-maintained additive occupancy view " +
        "instead of an O(live) group-by per wave (r14 verdict item 5) — history and " +
        "hashes unchanged.",
      Some(ivfPolicyOracle),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val base = emb
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("vec_id").cast("string"), ""), lit(4L)))
          .select(col("vec_id"), col("embedding"), col("h4"))
          .localCheckpoint(false) // one corpus pass feeds all four waves + queries
        // axis-collapse re-embedding: [v0, 0, ..., 0] — float-exact on
        // both engines (63 exact-zero product terms; norm = |v0|)
        val axis = concat(slice(col("embedding"), 1, 1),
          array_repeat(lit(0.0f), Dim - 1))
        def w(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"), col("embedding"))
        val root = scratchTempDir("graft-x140-ivfpolicy")
        writeStreamWaves(root, Seq(
          w(base),
          w(base.filter(col("h4") === 3).withColumn("embedding", axis)),
          w(base.filter(col("h4") === 1).withColumn("embedding", axis))
            .unionByName(w(base.filter(col("h4") === 2)
              .withColumn("embedding", lit(null).cast("array<float>")))),
          w(base.filter(col("h4") === 2))))
        val pinned = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
        val stream = s.readStream
          .schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.ivfPolicyStreamBucketed(stream,
          s"x140_vecs_$tag", s"x140_vers_$tag", root + "/ckpt", pinned,
          root + "/cents", root + "/fit", root + "/gauge", 3000L,
          buckets = sessionBuckets(s))
        val gauge = graft.streaming.StreamingIngest.ivfPolicyLog(s, root + "/gauge")
          .select(lit("gauge").as("section"), col("wave").as("k"),
            col("n_live").as("a"), col("tv_bp").as("b"),
            col("fired").cast("long").as("c"))
        // serving continues off whichever structure is current: centsDir
        // holds it (the refit swapped it at wave 2), the stored
        // assignment IS the inverted file
        val cents = s.read.parquet(root + "/cents").localCheckpoint(false)
        val live = graft.streaming.StreamingIngest.resolvedIvfVectorsBucketed(
          s, s"x140_vecs_$tag", s"x140_vers_$tag").localCheckpoint(false)
        val queries = base.filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding"))
        val approx = Similarity.knnIvf(queries, live, cents, 5, 4,
          assignedOpt = Some(live))
        val truth = Similarity.knnBrute(queries,
          live.select(col("vec_id"), col("embedding")), 5)
        val serve = Similarity.annRecall(truth, approx)
          .select(lit("serve").as("section"), col("qid").as("k"),
            col("n_true").as("a"), col("n_hits").as("b"),
            col("recall_bp").as("c"))
        gauge.unionByName(serve)
      }),

    Q("x141_floor_compaction",
      "HISTORY-PRESERVING compaction for the as-of logs (round-14; closing x132's " +
        "fidelity caveat): streaming.compactVersionedKeepAfter folds only versions " +
        "stamped <= a caller-supplied floor to each id's at-or-below-floor survivor " +
        "and retains everything above the floor VERBATIM, so the log stays compact " +
        "AND as-of-capable at any seq >= floor — reproducibility and read " +
        "amplification stop being the same knob (the x132 consumer had to pin " +
        "maxFiles=MaxValue and fragment forever). The floor is RECORDED next to the " +
        "version log and resolvedRowsAsOfChecked fails BY NAME below it instead of " +
        "answering wrong (x132's s0_compacted arm showed what 'wrong' looks like: " +
        "updated ids silently vanish from history). Script: the shared x117 waves " +
        "split across two stream runs — waves 0-1 land, the floor-1 compaction fires " +
        "MID-SCRIPT (destroying wave-0 versions of the h4 1/3 ids it folds), wave 2 " +
        "lands on the compacted log through the same checkpoint. Output: the s1/s2 " +
        "as-of snapshots read through the CHECKED api off the floor-compacted log — " +
        "hash-equal to the closed-form wave corpora, proving the fold lost nothing " +
        "at or above the floor — plus the floor contract as data (recorded floor, " +
        "as-of-0-allowed bit = 0). Crash-safety of the partial rewrite (either swap " +
        "order) and the exact floor boundary are DocStoreAsOfSpec's pins.",
      Some("""WITH t AS (SELECT doc_id, text,
             |       ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
             |     FROM documents),
             |u AS (
             |  SELECT 's1' AS arm, h4, CASE WHEN h4 = 1 THEN text || ' ' || text
             |                        WHEN h4 = 3 THEN text || ' alpha'
             |                        ELSE text END AS text FROM t
             |  UNION ALL
             |  SELECT 's2', h4, CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text END
             |  FROM t WHERE h4 <> 2)
             |SELECT arm, h4, n_docs, chars FROM (
             |  SELECT arm, h4, CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(SUM(len(text)) AS BIGINT) AS chars
             |  FROM u GROUP BY arm, h4
             |  UNION ALL
             |  SELECT 'floor', CAST(-1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)
             |) v ORDER BY arm, h4""".stripMargin),
      (s, d) => {
        val SI = graft.streaming.StreamingIngest
        val root = scratchTempDir("graft-x141-floor")
        val waves = docUpdateWaveFrames(s, d)
        writeStreamWaves(root, waves.take(2))
        // retention pinned off the automatic cadence (the x132 posture):
        // the FLOOR compaction is the retention policy here
        SI.docStoreStream(docUpdateStreamFrame(s, d, root),
          root + "/docs", root + "/versions", root + "/ckpt",
          maxFiles = Int.MaxValue)
        SI.compactVersionedKeepAfter(s, root + "/docs", root + "/versions", 1L)
        writeStreamWave(root, 2, waves(2))
        SI.docStoreStream(docUpdateStreamFrame(s, d, root),
          root + "/docs", root + "/versions", root + "/ckpt",
          maxFiles = Int.MaxValue)
        def arm(name: String, asOf: Long) =
          SI.resolvedRowsAsOfChecked(s, root + "/docs", root + "/versions",
              "doc_id", asOf)
            .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
              col("doc_id").cast("string"), ""), lit(4L)))
            .groupBy(col("h4"))
            .agg(count(lit(1)).as("n_docs"),
              sum(length(col("text")).cast("long")).as("chars"))
            .select(lit(name).as("arm"), col("h4"), col("n_docs"), col("chars"))
        val floor = SI.asOfFloorSeq(s, root + "/versions")
        val floorRow = s.range(1).select(lit("floor").as("arm"),
          lit(-1L).as("h4"), lit(floor).as("n_docs"),
          lit(if (0L >= floor) 1L else 0L).as("chars"))
        arm("s1", 1L).unionByName(arm("s2", 2L)).unionByName(floorRow)
      }),

    Q("x142_ivm_contrast",
      "The forgettability taxonomy's COST CONTRAST as oracle data (round-14; x139 " +
        "proved the subtractable class, x133 the rebuild remedy — the contrast " +
        "between them lived only in README prose): over the SAME wave script, an " +
        "ADDITIVE view (per (source, lang) count/token-sum/char-sum) is maintained " +
        "by x139's subtraction idiom at O(batch) per arrival with ZERO rebuilds, " +
        "while a MONOTONE view (per-group count/min-chars/max-chars — min/max have " +
        "no inverse) runs streaming.monotoneRollupStream's two-tier policy: " +
        "insert-only batches fold monotonically (O(batch) merged into the " +
        "group-sized view), any batch carrying an update or deletion pays the " +
        "corpus-linear REBUILD off the fused doc store. Output: both views' rows " +
        "over the live corpus plus each policy's rebuild count as a pinned column — " +
        "wave 0 folds, waves 1 and 2 both retract, so the monotone ledger reads " +
        "exactly 2 (engine-counted off the stamped rebuild log, hash-checked; the " +
        "additive ledger is structurally 0). Oracle = the closed-form latest corpus " +
        "rolled up both ways, blind to deltas, folds, and rebuilds. The SCALING.md " +
        "row shows the rebuild term is the corpus-linear one.",
      Some("""WITH live AS (
             |  SELECT doc_id, source, lang,
             |         CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text END AS text
             |    FROM (SELECT doc_id, source, lang, text,
             |            ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
             |          FROM documents) t
             |    WHERE h4 <> 2)
             |SELECT 'additive' AS view, source, lang,
             |       CAST(count(*) AS BIGINT) AS v1,
             |       CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS v2,
             |       CAST(SUM(len(text)) AS BIGINT) AS v3,
             |       CAST(0 AS BIGINT) AS rebuilds
             |FROM live GROUP BY source, lang
             |UNION ALL
             |SELECT 'monotone', source, lang,
             |       CAST(count(*) AS BIGINT),
             |       CAST(MIN(len(text)) AS BIGINT),
             |       CAST(MAX(len(text)) AS BIGINT),
             |       CAST(2 AS BIGINT)
             |FROM live GROUP BY source, lang
             |ORDER BY view, source, lang""".stripMargin),
      (s, d) => {
        val SI = graft.streaming.StreamingIngest
        val root = scratchTempDir("graft-x142-contrast")
        SI.ivmRollupStream(docUpdateWaveStream(s, d, root),
          root + "/a/docs", root + "/a/versions", root + "/a/rollup",
          root + "/a/ckpt", Seq("source", "lang"),
          Seq("n_tokens" -> size(split(col("text"), " ")).cast("long"),
            "n_chars" -> length(col("text")).cast("long")))
        // the monotone twin consumes the SAME wave files through its own
        // checkpoint and logs — one script, two maintenance regimes
        SI.monotoneRollupStream(docUpdateStreamFrame(s, d, root),
          root + "/m/docs", root + "/m/versions", root + "/m/view",
          root + "/m/rebuilds", root + "/m/ckpt", Seq("source", "lang"))
        val additive = SI.resolvedRollup(s, root + "/a/rollup", Seq("source", "lang"))
          .select(lit("additive").as("view"), col("source"), col("lang"),
            col("n_rows").as("v1"), col("n_tokens").as("v2"),
            col("n_chars").as("v3"), lit(0L).as("rebuilds"))
        val monotone = SI.resolvedMonotoneRollup(s, root + "/m/view")
          .select(lit("monotone").as("view"), col("source"), col("lang"),
            col("n_rows").as("v1"), col("min_chars").as("v2"),
            col("max_chars").as("v3"),
            lit(SI.monotoneRebuildCount(s, root + "/m/rebuilds")).as("rebuilds"))
        additive.unionByName(monotone)
      }),

    Q("x143_bucketed_resolve",
      "The BUCKETED standing-log layout under the correctness gate (round-14; r13 " +
        "verdict item 5): the shared x117 update waves run through " +
        "streaming.docStoreStreamBucketed — both logs land as id-bucketed catalog " +
        "tables (each append capped at `buckets` files by the pre-write " +
        "repartition) — and the serving read is Bucketing.resolvedBucketed, whose " +
        "plan carries ZERO shuffle exchanges: the version log's per-id max-seq " +
        "aggregate and the doc-keyed join both ride the bucket partitioning (the " +
        "seq-match is a post-join condition by construction — a bare equality would " +
        "be extracted into the join keys and force a re-shuffle). The exchange count " +
        "of the resolve plan is emitted AS A COLUMN and hash-checked against the " +
        "oracle's literal 0, putting the no-shuffle property itself under the " +
        "correctness gate rather than only under PlanSpec; the rollup rows pin that " +
        "the bucketed stream + resolve serve exactly the closed-form latest corpus. " +
        "At 100 TB this is the difference between a standing-index read that " +
        "re-shuffles the data log every query and one that is bucket-local " +
        "(SCALING.md's bucketed-vs-flat table: 2-3.4x at x100 and widening).",
      Some("""WITH live AS (
             |  SELECT doc_id, h4,
             |         CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text END AS text
             |    FROM (SELECT doc_id, text,
             |            ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
             |          FROM documents) t
             |    WHERE h4 <> 2)
             |SELECT h4, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(len(text)) AS BIGINT) AS chars,
             |       CAST(0 AS BIGINT) AS exchanges
             |FROM live GROUP BY h4 ORDER BY h4""".stripMargin),
      (s, d) => {
        val root = scratchTempDir("graft-x143-bucketed")
        // catalog table names must be unique per build (Bench evaluates
        // each query in several passes within one session)
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        writeStreamWaves(root, docUpdateWaveFrames(s, d))
        graft.streaming.StreamingIngest.docStoreStreamBucketed(
          docUpdateStreamFrame(s, d, root),
          s"x143_docs_$tag", s"x143_vers_$tag", root + "/ckpt", buckets = sessionBuckets(s))
        val resolved = graft.pipeline.Bucketing.resolvedBucketed(
          s, s"x143_docs_$tag", s"x143_vers_$tag", "doc_id")
        val exchanges = graft.pipeline.Bucketing.countExchanges(resolved)
        resolved
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("doc_id").cast("string"), ""), lit(4L)))
          .groupBy(col("h4"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text")).cast("long")).as("chars"))
          .select(col("h4"), col("n_docs"), col("chars"),
            lit(exchanges.toLong).as("exchanges"))
      }),

    Q("x145_bucketed_asof_floor",
      "FLOOR compaction COMPOSED with the bucketed log layout (round-15; r14 verdict " +
        "item 4): x141 proved history-preserving retention on flat logs and x143 the " +
        "shuffle-free bucketed resolve — this closes the composition, so one layout " +
        "holds both properties a 100 TB doc store needs: a serving/as-of read with " +
        "ZERO shuffle exchanges AND reproducible snapshots at any seq >= the recorded " +
        "floor. Machinery: Bucketing.compactVersionedBucketedKeepAfter (marker-first " +
        "— the floor lands as a 1-row bucketed table swapped through the same " +
        "crash-safe tmp/rename dance as the logs; floors only rise) + " +
        "resolvedBucketedAsOfChecked (refuses below-floor BY NAME; the seq caps are " +
        "non-key predicates, so the capped max-seq aggregate and the id-join both " +
        "ride the buckets). Script is x141's VERBATIM on the bucketed store: waves " +
        "0-1 land, the floor-1 fold fires MID-SCRIPT (destroying wave-0 versions of " +
        "the folded h4 1/3 ids), wave 2 lands through the same checkpoint. Output: " +
        "the s1/s2 as-of snapshots read through the checked api — hash-equal to the " +
        "closed-form wave corpora, proving the fold lost nothing at or above the " +
        "floor — plus the floor contract as data (recorded floor, as-of-0-allowed " +
        "bit = 0) and the as-of resolve's EXCHANGE COUNT as a column hash-pinned to " +
        "the oracle's literal 0 (the x143 idiom: the no-shuffle property itself " +
        "under the correctness gate). DocStoreAsOfSpec pins the below-floor refusal " +
        "and the spec-level zero-exchange plan with broadcast disabled.",
      Some("""WITH t AS (SELECT doc_id, text,
             |       ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4 AS h4
             |     FROM documents),
             |u AS (
             |  SELECT 's1' AS arm, h4, CASE WHEN h4 = 1 THEN text || ' ' || text
             |                        WHEN h4 = 3 THEN text || ' alpha'
             |                        ELSE text END AS text FROM t
             |  UNION ALL
             |  SELECT 's2', h4, CASE WHEN h4 = 1 THEN text || ' ' || text ELSE text END
             |  FROM t WHERE h4 <> 2)
             |SELECT arm, h4, n_docs, chars, exchanges FROM (
             |  SELECT arm, h4, CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(SUM(len(text)) AS BIGINT) AS chars,
             |         CAST(0 AS BIGINT) AS exchanges
             |  FROM u GROUP BY arm, h4
             |  UNION ALL
             |  SELECT 'floor', CAST(-1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT),
             |         CAST(0 AS BIGINT)
             |) v ORDER BY arm, h4""".stripMargin),
      (s, d) => {
        val SI = graft.streaming.StreamingIngest
        val B = graft.pipeline.Bucketing
        val root = scratchTempDir("graft-x145-floorbucketed")
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        val (dt, vt) = (s"x145_docs_$tag", s"x145_vers_$tag")
        val waves = docUpdateWaveFrames(s, d)
        writeStreamWaves(root, waves.take(2))
        // retention pinned off the automatic cadence — the FLOOR is the
        // retention policy here (the x141 posture on the table layout)
        SI.docStoreStreamBucketed(docUpdateStreamFrame(s, d, root),
          dt, vt, root + "/ckpt", buckets = sessionBuckets(s), maxFiles = Int.MaxValue)
        B.compactVersionedBucketedKeepAfter(s, dt, vt, "doc_id", sessionBuckets(s), 1L)
        writeStreamWave(root, 2, waves(2))
        SI.docStoreStreamBucketed(docUpdateStreamFrame(s, d, root),
          dt, vt, root + "/ckpt", buckets = sessionBuckets(s), maxFiles = Int.MaxValue)
        // the exchange count is measured on the as-of RESOLVE plans (the
        // serving shape the layout exists for), worst case of both arms
        val exchanges = math.max(
          B.countExchanges(B.resolvedBucketedAsOfChecked(s, dt, vt, "doc_id", 1L)),
          B.countExchanges(B.resolvedBucketedAsOfChecked(s, dt, vt, "doc_id", 2L))).toLong
        def arm(name: String, asOf: Long) =
          B.resolvedBucketedAsOfChecked(s, dt, vt, "doc_id", asOf)
            .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
              col("doc_id").cast("string"), ""), lit(4L)))
            .groupBy(col("h4"))
            .agg(count(lit(1)).as("n_docs"),
              sum(length(col("text")).cast("long")).as("chars"))
            .select(lit(name).as("arm"), col("h4"), col("n_docs"),
              col("chars"), lit(exchanges).as("exchanges"))
        val floor = B.asOfFloorSeqBucketed(s, vt)
        val floorRow = s.range(1).select(lit("floor").as("arm"),
          lit(-1L).as("h4"), lit(floor).as("n_docs"),
          lit(if (0L >= floor) 1L else 0L).as("chars"),
          lit(exchanges).as("exchanges"))
        arm("s1", 1L).unionByName(arm("s2", 2L)).unionByName(floorRow)
      }),

    Q("x146_fused_probe_exchanges",
      "The fused production loop's PER-BATCH probe-resolve plan under the hash gate " +
        "(round-15): x143/x145 pin the one-shot serving and as-of resolves at zero " +
        "exchanges, but the cost the bucketed layout removes from a CONTINUOUS " +
        "ingest is the resolve every micro-batch pays to probe the live index — " +
        "bandIndexUpsertDedupStreamBucketed now records that plan's " +
        "shuffle-exchange count per batch into a stamped side log " +
        "(fusedUpsertStreamBucketed's probePlanDir; the x143 idiom applied to the " +
        "recurring plan), and this query hash-checks the whole per-wave series " +
        "against the oracle's literal 0 alongside the wave's verdict rollup. " +
        "Script: the shared x117 update waves on an independent-salt 1/8 corpus " +
        "slice (the x127 knob — the portable-md5 signer is the cost driver) through " +
        "the fused bucketed loop; output per wave = (n_verdicts, n_keep, " +
        "probe_exchanges). Oracle = the x125 closed-form per-wave verdict replay " +
        "instantiated over the slice and aggregated, with probe_exchanges a " +
        "literal 0 — a plan regression that re-introduces a shuffle into the " +
        "recurring probe read now moves a hashed column, not just a spec.",
      Some("""SELECT wave, CAST(count(*) AS BIGINT) AS n_verdicts,
             |       CAST(sum(keep) AS BIGINT) AS n_keep,
             |       CAST(0 AS BIGINT) AS probe_exchanges
             |FROM (""".stripMargin +
        dedupStreamRetractOracleOver(
          """(SELECT doc_id, text FROM documents
            |   WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'x146'),1,15))::BIGINT % 8 = 0)""".stripMargin) +
        "\n) v GROUP BY wave ORDER BY wave"),
      (s, d) => {
        val slice = Tables.documents(s, d)
          .filter(pmod(TextDedup.portableHashBuiltin(
            col("doc_id").cast("string"), "x146"), lit(8L)) === 0)
          .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
            col("doc_id").cast("string"), ""), lit(4L)))
          .select(col("doc_id"), col("text"), col("h4"))
          .localCheckpoint(false) // one corpus pass feeds all three waves
        def w(df: org.apache.spark.sql.DataFrame) =
          df.select(col("doc_id"), col("text"))
        val root = scratchTempDir("graft-x146-fusedprobe")
        writeStreamWaves(root, Seq(
          w(slice),
          w(slice.filter(col("h4") === 1)
              .withColumn("text", concat(col("text"), lit(" "), col("text"))))
            .unionByName(w(slice.filter(col("h4") === 3)
              .withColumn("text", concat(col("text"), lit(" alpha"))))),
          w(slice.filter(col("h4") === 2)
              .withColumn("text", lit(null).cast("string")))
            .unionByName(w(slice.filter(col("h4") === 3)))))
        val stream = s.readStream
          .schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.bandIndexUpsertDedupStreamBucketed(stream,
          s"x146_bands_$tag", s"x146_vers_$tag", root + "/verdicts", root + "/ckpt",
          buckets = sessionBuckets(s),
          signer = df => TextDedup.minhashSignaturesPortable(df),
          probePlanDir = Some(root + "/probeplan"))
        val verd = s.read.parquet(root + "/verdicts")
          .select(col("ingest_seq").as("wave"), col("keep"))
          .groupBy(col("wave"))
          .agg(count(lit(1)).as("n_verdicts"),
            sum(col("keep").cast("long")).as("n_keep"))
        val probes = s.read.parquet(root + "/probeplan")
          .select(col("ingest_seq").as("wave"), col("probe_exchanges"))
        verd.join(probes, Seq("wave"))
          .select(col("wave"), col("n_verdicts"), col("n_keep"),
            col("probe_exchanges"))
      }),

    Q("x147_concat_chunk_pack",
      "GLOBAL concat-and-chunk sequence packing (round-15) — the dominant " +
        "pretraining batching strategy: the whole corpus concatenated into ONE " +
        "deterministic token stream (ordered by (source, doc_id)) and split at " +
        "exact 512-token boundaries, docs spanning boundaries allowed " +
        "(TextStats.concatChunkPack; x82/packBins cover the per-group and " +
        "padded-bucket variants — this is the single-stream form with the " +
        "boundary-spanning accounting an attention-mask/segmenting pipeline " +
        "needs). THE SCALE POINT: the naive form is one GLOBAL window cumsum — a " +
        "single-partition sort of the corpus, the canonical 100 TB anti-pattern — " +
        "while the engine computes the same numbers with a TWO-LEVEL cumsum " +
        "(per-source subtotals -> |sources|-row running offsets, broadcast back; " +
        "per-doc cumsum rides ONE source-keyed shuffle). The ORACLE runs the naive " +
        "global window, so the hash check IS the proof that the decomposed " +
        "dataflow equals the sequential semantics bit-for-bit (integer tokens, DIV " +
        "chunk ids, unique order — no float anywhere). Output: per-source packing " +
        "rollup — docs, tokens, first/last chunk touched, and the count of " +
        "boundary-spanning docs (the fragmentation metric).",
      Some("""WITH t AS (SELECT doc_id, source,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |     FROM documents),
             |c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (ORDER BY source, doc_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
             |      FROM t)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |       CAST(MIN(cum_prev // 512) AS BIGINT) AS first_chunk,
             |       CAST(MAX((cum_prev + n_tokens - 1) // 512) AS BIGINT) AS last_chunk,
             |       CAST(SUM(CASE WHEN (cum_prev + n_tokens - 1) // 512 > cum_prev // 512
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
             |FROM c GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => TextStats.concatChunkPack(Tables.documents(s, d), 512)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          min(col("first_chunk")).as("first_chunk"),
          max(col("last_chunk")).as("last_chunk"),
          sum((col("last_chunk") > col("first_chunk")).cast("long")).as("n_spanning"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("first_chunk"), col("last_chunk"), col("n_spanning"))),

    Q("x148_chunk_segment_histogram",
      "The packed stream's PER-CHUNK view (round-15, x147's inverse): each " +
        "512-token chunk of the concatenated corpus holds 1..k document SEGMENTS " +
        "(docs are contiguous in the stream, so segments-in-chunk = docs " +
        "overlapping it), and the distribution of k is the attention-mask " +
        "fragmentation a packed-pretraining run actually trains under — chunks " +
        "with many tiny segments waste attention span, chunks with one segment " +
        "are the ideal. Engine: concatChunkPack's per-doc (first_chunk, " +
        "last_chunk) exploded via sequence() into (chunk, doc) incidences (most " +
        "docs span 1-2 chunks, so the explode is ~corpus-sized), per-chunk " +
        "segment counts, then the histogram over k with the started-doc tally " +
        "riding along. All integer arithmetic over the same two-level cumsum " +
        "x147 proved against the sequential oracle. Output: (n_segments, " +
        "n_chunks, n_docs_started) — model-sized. Oracle: the naive global-window " +
        "cumsum with generate-series unnesting, aggregated identically.",
      Some("""WITH t AS (SELECT doc_id, source,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |     FROM documents),
             |c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (ORDER BY source, doc_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
             |      FROM t),
             |seg AS (SELECT doc_id, CAST(cum_prev // 512 AS BIGINT) AS fc,
             |               CAST((cum_prev + n_tokens - 1) // 512 AS BIGINT) AS lc FROM c),
             |e AS (SELECT doc_id, fc, r.chunk_id
             |      FROM seg, unnest(generate_series(seg.fc, seg.lc)) AS r(chunk_id)),
             |p AS (SELECT chunk_id, count(*) AS n_segments,
             |             SUM(CASE WHEN fc = chunk_id THEN 1 ELSE 0 END) AS n_started
             |      FROM e GROUP BY chunk_id)
             |SELECT CAST(n_segments AS BIGINT) AS n_segments,
             |       CAST(count(*) AS BIGINT) AS n_chunks,
             |       CAST(sum(n_started) AS BIGINT) AS n_docs_started
             |FROM p GROUP BY n_segments ORDER BY n_segments""".stripMargin),
      (s, d) => TextStats.concatChunkPack(Tables.documents(s, d), 512)
        .select(col("first_chunk"),
          explode(sequence(col("first_chunk"), col("last_chunk"))).as("chunk_id"))
        .groupBy(col("chunk_id"))
        .agg(count(lit(1)).as("n_segments"),
          sum((col("first_chunk") === col("chunk_id")).cast("long")).as("n_started"))
        .groupBy(col("n_segments"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_started")).as("n_docs_started"))
        .select(col("n_segments"), col("n_chunks"), col("n_docs_started"))),

    Q("x149_pack_stream",
      "Packing as a CONTINUOUS ingest op (round-15, x147's streaming twin): " +
        "streaming.packStream keeps one TOKEN-OFFSET WATERMARK (total tokens packed " +
        "so far, derived replay-exactly from the landed rows stamped < batchId) and " +
        "assigns each arriving batch chunk ids via the batch-local two-level cumsum " +
        "shifted by that base. Concat-chunk assignment is a pure function of (tokens " +
        "before me, my tokens), so it is PREFIX-STABLE: a doc's chunk ids never " +
        "change once written, whatever arrives later — the packed log is write-once " +
        "training data (updates/retractions belong upstream, in the versioned doc " +
        "store). Script: the corpus arrives in three waves by an independent salt " +
        "(md5%3); the oracle is the CLOSED-FORM x147 cumsum over the single " +
        "concatenated ordering (wave, source, doc_id) — blind to batching, the " +
        "watermark, and the stamped appends — so the hash proves stream-batch " +
        "EQUIVALENCE: packing the corpus incrementally lands every doc in exactly " +
        "the chunks one global batch pack would have chosen. Output: per-(wave, " +
        "source) rollup with first/last chunk and the boundary-spanning count.",
      Some("""WITH t AS (SELECT doc_id, source,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |       ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'x149'),1,15))::BIGINT % 3 AS wave
             |     FROM documents),
             |c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (ORDER BY wave, source, doc_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
             |      FROM t)
             |SELECT wave, source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |       CAST(MIN(cum_prev // 512) AS BIGINT) AS first_chunk,
             |       CAST(MAX((cum_prev + n_tokens - 1) // 512) AS BIGINT) AS last_chunk,
             |       CAST(SUM(CASE WHEN (cum_prev + n_tokens - 1) // 512 > cum_prev // 512
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
             |FROM c GROUP BY wave, source ORDER BY wave, source""".stripMargin),
      (s, d) => {
        val base = Tables.documents(s, d)
          .withColumn("wave", pmod(TextDedup.portableHashBuiltin(
            col("doc_id").cast("string"), "x149"), lit(3L)))
          .select(col("doc_id"), col("source"), col("text"), col("wave"))
          .localCheckpoint(false) // one corpus pass feeds all three waves
        val root = scratchTempDir("graft-x149-packstream")
        writeStreamWaves(root,
          (0 until 3).map(k => base.filter(col("wave") === k.toLong).drop("wave")))
        val stream = s.readStream
          .schema("doc_id LONG, source STRING, text STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        graft.streaming.StreamingIngest.packStream(stream,
          root + "/pack", root + "/ckpt", 512)
        s.read.parquet(root + "/pack")
          .groupBy(col("ingest_seq").as("wave"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            min(col("first_chunk")).as("first_chunk"),
            max(col("last_chunk")).as("last_chunk"),
            sum((col("last_chunk") > col("first_chunk")).cast("long")).as("n_spanning"))
          .select(col("wave"), col("source"), col("n_docs"), col("n_tokens"),
            col("first_chunk"), col("last_chunk"), col("n_spanning"))
      }),

    Q("x150_cdc_gear_stream",
      "The PRODUCTION CDC chunker priced under the gate (round-16, r15 verdict " +
        "item 5): x123/x127 deliberately run the portable md5 oracle-chunker — " +
        "cross-engine hashable, but ~5x the gear-hash cdc_cuts path on the " +
        "chunking stage (tools.CdcBench) — so the bench never priced the path " +
        "production runs and the x123-class SCALING rows were omitted. This is " +
        "x123's wave script (train arrives; h4==1 re-arrives with every 'e' " +
        "replaced; h4==3 updates then reverts; h4==2 re-arrives null-text = total " +
        "retraction) through cdcIndexUpsertStreamBucketed's DEFAULT chunker: the " +
        "CdcCuts codegen expression (gear table + shift + add per position) with " +
        "xxhash64 chunk ids. Gear hashes are engine-only, so the check is the " +
        "x143/x146 idiom split two ways: the ENGINE proves stream-equals-batch — " +
        "the streamed index's per-doc (count, bit_xor) chunk fingerprint must " +
        "equal a one-shot batch chunking of the final live corpus, the agreement " +
        "landing as a hash-checked literal 1 — while the ORACLE contributes the " +
        "LIVE DOC LIST in closed form (split membership + the h4==2 retraction), " +
        "so a doc wrongly retracted, resurrected, or stale changes the row set " +
        "even though DuckDB never computes a gear hash. Output: (doc_id, " +
        "stream_equals_batch) over the live train docs.",
      Some("""SELECT doc_id, CAST(1 AS BIGINT) AS stream_equals_batch
             |FROM (SELECT doc_id,
             |        ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS hh
             |      FROM documents) t
             |WHERE hh % 100 < 80 AND hh % 4 != 2
             |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val h = TextDedup.portableHashBuiltin(col("doc_id").cast("string"), "")
        val base = Tables.documents(s, d)
          .withColumn("h4", pmod(h, lit(4L)))
          .withColumn("split",
            when(pmod(h, lit(100L)) < 80, "train").otherwise("eval"))
          .localCheckpoint(false) // feeds all three waves + the batch recompute
        val train = base.filter(col("split") === "train")
        def wave(df: org.apache.spark.sql.DataFrame) = df.drop("h4", "split")
        val root = scratchTempDir("graft-x150-cdcgear")
        writeStreamWaves(root, Seq(
          wave(train),
          wave(train.filter(col("h4") === 1)
            .withColumn("text", translate(col("text"), "e", "#")))
            .unionByName(wave(train.filter(col("h4") === 3)
              .withColumn("text", concat(col("text"), lit(" alpha"))))),
          wave(train.filter(col("h4") === 2)
            .withColumn("text", lit(null).cast("string")))
            .unionByName(wave(train.filter(col("h4") === 3)))))
        val stream = s.readStream
          .schema(Tables.documents(s, d).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        val tag = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingIngest.cdcIndexUpsertStreamBucketed(stream,
          s"x150_chunks_$tag", s"x150_vers_$tag", root + "/ckpt",
          buckets = sessionBuckets(s)) // default chunker = the gear fast path
        val live = graft.streaming.StreamingIngest.resolvedChunksBucketed(
          s, s"x150_chunks_$tag", s"x150_vers_$tag")
        // the final live corpus in closed form (h4==3's latest version is
        // the wave-2 revert = the original text)
        val finalCorpus = train.filter(col("h4") =!= 2)
          .withColumn("text", when(col("h4") === 1,
            translate(col("text"), "e", "#")).otherwise(col("text")))
          .drop("h4", "split")
        val batch = TextDedup.cdcChunksFast(finalCorpus)
          .select(col("doc_id"), col("h")).distinct()
        def fprint(df: org.apache.spark.sql.DataFrame, n: String, f: String) =
          df.groupBy(col("doc_id"))
            .agg(count(lit(1)).as(n), expr("bit_xor(h)").as(f))
        fprint(live, "sn", "sf")
          .join(fprint(batch, "bn", "bf"), Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            (col("sn").isNotNull && col("bn").isNotNull &&
              col("sn") === col("bn") && col("sf") === col("bf") &&
              col("sn") > 0).cast("long").as("stream_equals_batch"))
      }),

    Q("x151_pack_chunk_view",
      "The packed stream's PER-CHUNK state as a STANDING VIEW (round-16, r15 " +
        "verdict item 7 — ROADMAP's own candidate): x148 computes " +
        "segments-per-chunk by re-packing the whole corpus; a serving read over a " +
        "CONTINUOUS pack (x149) should not re-pack anything. packStream now " +
        "maintains the per-chunk rollup incrementally (the x139 delta-log idiom, " +
        "insert-only: each batch's packed rows explode into (chunk, segment) " +
        "incidences and partially aggregate to an O(batch) delta; prefix-stable " +
        "assignment means arrivals only ever ADD segments and only the frontier " +
        "chunk spans batches), folded by the rollup compaction cadence and served " +
        "as one group-keyed sum (packChunkView). Script: x149's three-wave " +
        "arrival (independent md5%3 salt); the ORACLE is the x148 per-chunk SQL " +
        "over the naive GLOBAL cumsum of the single concatenated (wave, source, " +
        "doc_id) ordering — blind to waves, the watermark, the delta log, and " +
        "compaction — so the hash proves the incrementally-maintained view equals " +
        "the batch recompute chunk by chunk. Output: (chunk_id, n_segments, " +
        "n_docs_started) for every chunk of the packed stream.",
      Some("""WITH t AS (SELECT doc_id, source,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |       ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'x151'),1,15))::BIGINT % 3 AS wave
             |     FROM documents),
             |c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (ORDER BY wave, source, doc_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
             |      FROM t),
             |seg AS (SELECT CAST(cum_prev // 512 AS BIGINT) AS fc,
             |               CAST((cum_prev + n_tokens - 1) // 512 AS BIGINT) AS lc FROM c),
             |e AS (SELECT fc, r.chunk_id
             |      FROM seg, unnest(generate_series(seg.fc, seg.lc)) AS r(chunk_id))
             |SELECT chunk_id, CAST(count(*) AS BIGINT) AS n_segments,
             |       CAST(SUM(CASE WHEN fc = chunk_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_started
             |FROM e GROUP BY chunk_id ORDER BY chunk_id""".stripMargin),
      (s, d) => {
        val base = Tables.documents(s, d)
          .withColumn("wave", pmod(TextDedup.portableHashBuiltin(
            col("doc_id").cast("string"), "x151"), lit(3L)))
          .select(col("doc_id"), col("source"), col("text"), col("wave"))
          .localCheckpoint(false) // one corpus pass feeds all three waves
        val root = scratchTempDir("graft-x151-packchunkview")
        writeStreamWaves(root,
          (0 until 3).map(k => base.filter(col("wave") === k.toLong).drop("wave")))
        val stream = s.readStream
          .schema("doc_id LONG, source STRING, text STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(root + "/src/*")
        graft.streaming.StreamingIngest.packStream(stream,
          root + "/pack", root + "/ckpt", 512,
          chunkViewDir = Some(root + "/chunkview"))
        graft.streaming.StreamingIngest.packChunkView(s, root + "/chunkview")
      }),

    Q("x137_int8_knn",
      "KNN served off INT8-QUANTIZED vectors with the retrieval quality pinned against " +
        "fp truth (round-13) — the production serving format (x37 quantizes, this " +
        "SEARCHES it): per-vector max-abs scales CANCEL in cosine, so the quantized " +
        "ranking needs only dot(q,c)/sqrt(dot(c,c)) over the integer codes — every " +
        "product and partial sum is an exact integral double (|code| <= 127, " +
        "association-free), and the sort key is one correctly-rounded sqrt plus one " +
        "division, bit-portable cross-engine (the x06 boundary handled by " +
        "construction, not by rank-only output). Output: the int8 top-5 per query " +
        "with a hit bit against the fp brute truth (x06's chain verbatim) — the " +
        "measured answer to 'what does 4x memory compression cost in retrieval " +
        "quality', per query, as data. Cost shape: the x06 brute class (10-row query " +
        "side broadcast; at corpus scale the candidate side swaps for any indexed " +
        "generator — the ranking arithmetic is what this query pins).",
      Some(s"""WITH m AS (SELECT vec_id, embedding,
             |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS max_abs
             |  FROM embeddings),
             |sc AS (SELECT vec_id, embedding,
             |    CASE WHEN max_abs = 0 THEN CAST(0.0 AS DOUBLE) ELSE 127.0 / max_abs END AS scale
             |  FROM m),
             |codes AS (SELECT vec_id,
             |    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * scale)) AS c
             |  FROM sc),
             |qr AS (SELECT qid, neighbor_id, rank FROM (
             |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
             |         row_number() OVER (PARTITION BY q.vec_id
             |           ORDER BY ${codeDotSql("q.c", "e.c")} / sqrt(${codeDotSql("e.c", "e.c")}) DESC,
             |                    e.vec_id) AS rank
             |  FROM codes q JOIN codes e ON e.vec_id != q.vec_id
             |  WHERE q.vec_id < 10) t WHERE rank <= 5),
             |tr AS (SELECT qid, neighbor_id FROM (
             |  SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
             |         row_number() OVER (PARTITION BY q.vec_id
             |           ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rank
             |  FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
             |  WHERE q.vec_id < 10) t WHERE rank <= 5)
             |SELECT qr.qid, CAST(qr.rank AS INT) AS rank, qr.neighbor_id,
             |  CAST(CASE WHEN tr.neighbor_id IS NULL THEN 0 ELSE 1 END AS INT) AS hit
             |FROM qr LEFT JOIN tr ON qr.qid = tr.qid AND qr.neighbor_id = tr.neighbor_id
             |ORDER BY qr.qid, qr.rank""".stripMargin),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val codes = Similarity.quantizeInt8(emb)
          .select(col("vec_id"), col("codes"))
          .localCheckpoint(false) // one quantize pass feeds queries and candidates
        val q = codes.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("codes").as("qc"))
        val c = codes.select(col("vec_id").as("cid"), col("codes").as("cc"))
        val dot = aggregate(zip_with(col("qc"), col("cc"), (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v)
        val norm = aggregate(transform(col("cc"), x => x * x),
          lit(0.0), (acc, v) => acc + v)
        // candidate side LEFT, 10-row query side explicitly broadcast —
        // the Similarity.scoredCandidates convention; without the hint a
        // stats tie between two projections of the same checkpointed
        // frame lets Spark build-broadcast the CORPUS side (round-13
        // self-review)
        val top = c.join(broadcast(q), col("qid") =!= col("cid"))
          .withColumn("sim", dot / sqrt(norm))
          .groupBy(col("qid"))
          .agg(graft.functions.top_k_by(col("sim"), col("cid"), 5).as("top"))
          .select(col("qid"), posexplode(col("top")))
          .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
            col("col.id").as("neighbor_id"))
        val truth = Similarity.knnBrute(emb.filter(col("vec_id") < 10), emb, 5)
          .select(col("qid").as("tq"), col("neighbor_id").as("tn"))
        top.join(truth,
            col("qid") === col("tq") && col("neighbor_id") === col("tn"), "left")
          .select(col("qid"), col("rank"), col("neighbor_id"),
            col("tn").isNotNull.cast("int").as("hit"))
      }))

  // the x135 water-filling CTE stack (through `k` = cutoff-flagged rows
  // and `g` = capped-set sums), shared by the x135 and x136 oracles.
  // LAZY: declared below `defs`, which interpolates it at its own
  // (lazy) evaluation — a strict val here would read null
  private lazy val epochAllocCtes: String =
    """WITH s AS (SELECT source,
      |       CAST(sum(len(string_split(text,' '))) AS BIGINT) AS avail,
      |       CAST(CAST(substr(source,4) AS INT) + 1 AS BIGINT) AS w
      |     FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(avail) AS BIGINT) AS tot,
      |             CAST(sum(w) AS BIGINT) AS wtot FROM s),
      |o AS (SELECT s.*, t.wtot, 2*t.tot AS budget,
      |        CAST(3*avail AS DOUBLE)/CAST(w AS DOUBLE) AS ratio
      |      FROM s, t),
      |p AS (SELECT *,
      |        COALESCE(SUM(avail) OVER (ORDER BY ratio, source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS a_prev,
      |        COALESCE(SUM(w) OVER (ORDER BY ratio, source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS w_prev
      |      FROM o),
      |c AS (SELECT *, CASE WHEN (budget - 3*a_prev)*w >= 3*avail*(wtot - w_prev)
      |                     THEN 1 ELSE 0 END AS cond FROM p),
      |k AS (SELECT *, MIN(cond) OVER (ORDER BY ratio, source
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capped FROM c),
      |g AS (SELECT CAST(COALESCE(SUM(CASE WHEN capped=1 THEN avail END),0) AS BIGINT) AS a_cap,
      |             CAST(COALESCE(SUM(CASE WHEN capped=0 THEN w END),0) AS BIGINT) AS w_unc FROM k)""".stripMargin

  /** The x135 water-filling allocation chain, shared with x136's
    * realization: (source, avail, w, capped, alloc, epochs_bp).
    */
  private def epochAllocation(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byRatio = Window.orderBy(col("ratio").asc, col("source").asc)
    val perSrc = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("avail"))
      .withColumn("w", expr("cast(substring(source, 4) as bigint) + 1"))
    val tot = perSrc.agg(sum(col("avail")).as("tot"), sum(col("w")).as("wtot"))
    // 1-row scalar attach (the established broadcast pattern); the
    // sort/window below run on |sources| rows, never the corpus
    val o = perSrc.crossJoin(broadcast(tot))
      .withColumn("budget", col("tot") * 2L)
      .withColumn("ratio",
        (col("avail") * 3L).cast("double") / col("w").cast("double"))
    val prev = byRatio.rowsBetween(Window.unboundedPreceding, -1)
    val run = byRatio.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = o
      .withColumn("a_prev", coalesce(sum(col("avail")).over(prev), lit(0L)))
      .withColumn("w_prev", coalesce(sum(col("w")).over(prev), lit(0L)))
      .withColumn("cond",
        ((col("budget") - col("a_prev") * 3L) * col("w") >=
          (col("avail") * 3L) * (col("wtot") - col("w_prev"))).cast("int"))
      .withColumn("capped", min(col("cond")).over(run))
    val g = k.agg(
      coalesce(sum(when(col("capped") === 1, col("avail"))), lit(0L)).as("a_cap"),
      coalesce(sum(when(col("capped") === 0, col("w"))), lit(0L)).as("w_unc"))
    k.crossJoin(broadcast(g))
      .withColumn("alloc", when(col("capped") === 1, col("avail") * 3L)
        .otherwise(expr("((budget - 3*a_cap) * w) DIV w_unc")))
      .withColumn("epochs_bp", when(col("capped") === 1, lit(30000L))
        .otherwise(expr("(((budget - 3*a_cap) * w) DIV w_unc) * 10000 DIV avail")))
      .select(col("source"), col("avail"), col("w"), col("capped"),
        col("alloc"), col("epochs_bp"))
  }
}
