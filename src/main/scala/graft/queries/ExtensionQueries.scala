package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.ext.{Multimodal, Similarity, TextDedup, TextStats}
import graft.sources.Tables

/** North-star LLM-data-pipeline operators (BASELINE.json): dedup,
  * similarity search, text analysis, multimodal plumbing — registered as
  * first-class queries over the `documents`/`embeddings` tables.
  */
object ExtensionQueries {

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

  private val minhashPortableOracle: String = {
    val sigs = (0 until graft.ext.TextDedup.NumHashes).map(i =>
      s"  CAST(min(${remixSql(i)}) AS BIGINT) AS s$i").mkString(",\n")
    s"""$shingleHashCte
       |SELECT doc_id,
       |$sigs
       |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

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

  private val minhashPairsPortableOracle: String = {
    val n = graft.ext.TextDedup.NumHashes
    val rows = graft.ext.TextDedup.RowsPerBand
    val sigCols = (0 until n).map(i =>
      s"CAST(min(${remixSql(i)}) AS BIGINT) AS s$i").mkString(", ")
    val bandKey = (0 until graft.ext.TextDedup.Bands).map { b =>
      val comps = (0 until rows).map(r => s"s${b * rows + r}").mkString("||'_'||")
      s"WHEN $b THEN $comps"
    }.mkString(" ")
    val bandValues = (0 until graft.ext.TextDedup.Bands).map(b => s"($b)").mkString(",")
    val eqCount = (0 until n).map(i =>
      s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""$shingleHashCte,
       |sig AS (SELECT doc_id, $sigCols FROM h GROUP BY doc_id),
       |banded AS (
       |  SELECT sig.*, band, CASE band $bandKey END AS bkey
       |  FROM sig, (VALUES $bandValues) bs(band))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST($eqCount AS BIGINT) / CAST($n.0 AS DOUBLE) AS est_jaccard
       |FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val defs: Seq[Q] = Seq(

    Q("x18_minhash_pairs_portable",
      "Full MinHash+LSH candidate pipeline under the portable family — the oracled twin of x03.",
      Some(minhashPairsPortableOracle),
      (s, d) => TextDedup.candidatePairsFrom(
          TextDedup.minhashSignaturesPortable(Tables.documents(s, d)))
        .orderBy(col("doc_a"), col("doc_b"))),

    Q("x16_minhash_portable",
      "MinHash signatures under the engine-portable md5 family — the oracled twin of x02's xxhash64 fast path.",
      Some(minhashPortableOracle),
      (s, d) => TextDedup.minhashSignaturesPortable(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    Q("x17_simhash_portable",
      "60-bit SimHash under the portable md5 family — the oracled twin of x04.",
      Some(simhashPortableOracle),
      (s, d) => TextDedup.simhash(Tables.documents(s, d),
          hashFn = TextDedup.portableHash(_, ""), bits = 60)
        .orderBy(col("doc_id"))),

    Q("x01_dedup_exact",
      "Exact dedup groups by content hash (hash-groupBy; one shuffle).",
      Some("""SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin),
      (s, d) => TextDedup.exactGroups(Tables.documents(s, d))
        .orderBy(col("text_hash"))),

    Q("x02_minhash_bands",
      "MinHash signatures → LSH band buckets (shingle→minhash→band). Engine-specific hashes: rows-only check.",
      None,
      (s, d) => TextDedup.lshBands(Tables.documents(s, d))
        .orderBy(col("doc_id"), col("band"))),

    Q("x03_minhash_pairs",
      "Near-dup candidate pairs via LSH bucket equi-join + signature-estimated Jaccard. Rows-only check.",
      None,
      (s, d) => TextDedup.candidatePairs(Tables.documents(s, d))
        .orderBy(col("doc_a"), col("doc_b"))),

    Q("x04_simhash",
      "64-bit SimHash per document (distributed bit votes). Engine-specific hash: rows-only check.",
      None,
      (s, d) => TextDedup.simhash(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

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
          .orderBy(col("qid"), col("rank"))
      }),

    Q("x07_knn_lsh",
      "ANN via random-hyperplane LSH buckets: equi-join candidate generation, exact rank in-bucket. Rows-only.",
      None,
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.knnLsh(emb.filter(col("vec_id") < 10), emb, 3)
          .orderBy(col("qid"), col("rank"))
      }),

    Q("x19_knn_lsh_multiprobe",
      "Multi-probe LSH ANN (Hamming-1 buckets probed too; measured recall@5 3x the single-probe x07). Rows-only.",
      None,
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.knnLshMultiProbe(emb.filter(col("vec_id") < 10), emb, 3)
          .orderBy(col("qid"), col("rank"))
      }),

    Q("x08_lang_id",
      "Stopword-marker language ID heuristic (argmax over language scores). Heuristic: rows-only.",
      None,
      (s, d) => TextStats.languageId(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

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
      (s, d) => TextStats.quality(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    Q("x10_fingerprint",
      "Document fingerprint: md5 of whitespace-normalized lowercase text.",
      Some("""SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.fingerprint(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    Q("x11_token_count",
      "BPE-ish lexer token count (letter/digit/punct runs).",
      Some("""SELECT doc_id, CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS BIGINT) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.bpeTokenCount(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    Q("x14_knn_ivf",
      "IVF-style ANN: centroid cells (broadcast) + nprobe probing + bounded-heap rank. Rows-only.",
      None,
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val centroids = Similarity.strideCentroids(emb, 16)
        Similarity.knnIvf(emb.filter(col("vec_id") < 10), emb, centroids, 5, 4)
          .orderBy(col("qid"), col("rank"))
      }),

    Q("x15_embedding_neardup",
      "Embedding-cosine near-dup pairs from shared LSH buckets. Threshold 0.35 is demonstrative: the synthetic corpus has no true near-dups (max pairwise cos ≈ 0.48); production dedup uses ~0.9. Rows-only.",
      None,
      (s, d) => Similarity.embeddingNearDupPairs(Tables.embeddings(s, d), 0.35)
        .orderBy(col("id_a"), col("id_b"))),

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
        .select(col("doc_id"), col("drop_reason"), col("keep"))
        .orderBy(col("doc_id"))),

    Q("x21_hash_split",
      "Deterministic train/eval split by portable content-id hash (stable across runs/engines/partitionings).",
      Some("""SELECT doc_id,
             |  ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 100 AS bucket_100,
             |  CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 100 < 80
             |       THEN 'train' ELSE 'eval' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextStats.hashSplit(Tables.documents(s, d), "doc_id", trainPct = 80)
        .select(col("doc_id"), col("bucket_100"), col("split"))
        .orderBy(col("doc_id"))),

    Q("x12_multimodal_stub",
      "Binary media column plumbing + partition-local (stubbed) decode/feature-extract. Rows-only.",
      None,
      (s, d) => Multimodal.extractFeatures(s, Multimodal.asMediaTable(Tables.documents(s, d)))
        .orderBy(col("doc_id"))))
}
