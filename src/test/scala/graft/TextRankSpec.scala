package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** BM25 retrieval ([[graft.ext.TextRank]]): hand-computed scores for the
  * rational-idf mode, ln-mode ranking agreement on single-term queries,
  * top-k/tie-break behavior, and the self-derived query band.
  */
class TextRankSpec extends SparkSuite {
  import spark.implicits._
  import graft.ext.TextRank

  // 4 docs, lengths 4/4/2/6; term "cat" in docs 0,1,2; "dog" only in 3;
  // "fish" in 0 (tf 2) and 3 (tf 1)
  private def corpus = Seq(
    (0L, "cat fish fish mouse"),
    (1L, "cat bird mouse wolf"),
    (2L, "cat bird"),
    (3L, "dog fish dog wolf dog hen")
  ).toDF("doc_id", "text")

  private def q(terms: (Long, String)*) = terms.toDF("query_id", "term")

  test("rational-idf scores match the hand computation") {
    // N=4, total tokens=16, avgdl=4.0; k1=1.2, b=0.75
    // "fish": df=2 -> idf=(4-2+0.5)/(2+0.5)=1.0
    //   doc0: tf=2, dl=4 -> norm = 2 + 1.2*(0.25+0.75*(4/4)) = 3.2
    //     score = 1.0 * (2*2.2) / 3.2 = 1.375
    //   doc3: tf=1, dl=6 -> norm = 1 + 1.2*(0.25+0.75*1.5) = 2.65
    //     score = 1.0 * 2.2 / 2.65 = 0.830188...
    val out = TextRank.bm25(corpus, q((0L, "fish")), k = 5)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 3L))
    assert(out(0).getString(3) == "1.375000")
    assert(out(1).getString(3) == "0.830189") // 2.2/2.65 rounded half-up at 6dp
  }

  test("multi-term query sums per-term decimals; docs missing all terms never appear") {
    // query {cat, dog}: doc3 scores only via dog (df=1, idf=(4-1+.5)/1.5=7/3),
    // docs 0..2 only via cat (df=3, idf=(4-3+.5)/3.5=3/7); doc2 (dl=2)
    // has the best length norm for cat
    val out = TextRank.bm25(corpus, q((0L, "cat"), (0L, "dog")), k = 5)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getLong(2)).head == 3L) // dog's rare-term idf dominates
    assert(out.map(_.getLong(2)).toSet == Set(0L, 1L, 2L, 3L))
    // doc2 beats docs 0/1 on cat: same tf=1, shorter dl
    val byDoc = out.map(r => r.getLong(2) -> BigDecimal(r.getString(3))).toMap
    assert(byDoc(2L) > byDoc(0L) && byDoc(2L) > byDoc(1L))
  }

  test("ln-idf mode ranks single-term queries identically to rational mode") {
    for (term <- Seq("cat", "fish", "wolf")) {
      val rat = TextRank.bm25(corpus, q((0L, term)), k = 5)
        .orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
      val ln = TextRank.bm25(corpus, q((0L, term)), k = 5, lnIdf = true)
        .orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
      assert(rat == ln, s"term $term: rational $rat vs ln $ln")
    }
  }

  test("k bounds the result and equal scores tie-break by doc_id") {
    // "bird" hits docs 1 and 2 only; k=1 keeps the better-normalized doc2
    val out = TextRank.bm25(corpus, q((0L, "bird")), k = 1).collect()
    assert(out.length == 1 && out(0).getLong(2) == 2L)
    // exact-duplicate docs score identically -> doc_id ascending order
    val dup = Seq((7L, "zebra yak"), (5L, "zebra yak"), (9L, "other words"))
      .toDF("doc_id", "text")
    val tied = TextRank.bm25(dup, q((0L, "zebra")), k = 5)
      .orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
    assert(tied == Seq(5L, 7L))
  }

  test("tfidf scores match the hand computation and differ from BM25's saturation") {
    // "fish": df=2 -> idf=(4-2+0.5)/(2+0.5)=1.0
    //   doc0: tf=2, dl=4 -> (2/4)*1.0 = 0.5
    //   doc3: tf=1, dl=6 -> (1/6)*1.0 = 0.166667
    val out = TextRank.tfidf(corpus, q((0L, "fish")), k = 5)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 3L))
    assert(out(0).getString(3) == "0.500000")
    assert(out(1).getString(3) == "0.166667")
  }

  test("rrfFuse sums 1/(c+rank) over the lists a doc appears in; tie-break by doc_id") {
    val listA = Seq((0L, 1, 10L), (0L, 2, 20L), (0L, 3, 30L))
      .toDF("query_id", "rank", "doc_id")
    val listB = Seq((0L, 1, 20L), (0L, 2, 30L)) // doc 10 absent
      .toDF("query_id", "rank", "doc_id")
    val out = TextRank.rrfFuse(Seq(listA, listB), k = 5)
      .orderBy(col("rank")).collect()
    // 1/61=0.016393  1/62=0.016129  1/63=0.015873 (rounded at 6dp)
    // doc20 = 0.016129+0.016393 = 0.032522 (2 lists)
    // doc30 = 0.015873+0.016129 = 0.032002 (2 lists)
    // doc10 = 0.016393 (1 list)
    assert(out.map(_.getLong(2)).toSeq == Seq(20L, 30L, 10L))
    assert(out.map(_.getString(3)).toSeq ==
      Seq("0.032522", "0.032002", "0.016393"))
    assert(out.map(_.getInt(4)).toSeq == Seq(2, 2, 1))
  }

  test("hybridRrf fuses BM25 and TF-IDF heads over the corpus queries") {
    val docs = Tables.documents(spark, sf)
    val qs = TextRank.midFrequencyQueries(docs)
    val fused = TextRank.hybridRrf(docs, qs, kPerList = 20, k = 5)
      .orderBy("query_id", "rank").collect()
    assert(fused.length == 15) // 3 queries x top-5
    // a doc both rankers like carries n_lists = 2 at the head
    assert(fused.filter(_.getInt(1) == 1).forall(_.getInt(4) == 2))
    // deterministic re-derivation
    val again = TextRank.hybridRrf(docs, qs, kPerList = 20, k = 5)
      .orderBy("query_id", "rank").collect()
    assert(fused.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSeq ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSeq)
  }

  test("midFrequencyQueries pairs the df-rank band deterministically") {
    val docs = Tables.documents(spark, sf)
    val qs = TextRank.midFrequencyQueries(docs).orderBy("query_id", "term").collect()
    assert(qs.length == 6)
    assert(qs.map(_.getLong(0)).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 2L))
    // re-derivation is stable (pure function of the corpus)
    val again = TextRank.midFrequencyQueries(docs).orderBy("query_id", "term").collect()
    assert(qs.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }
}
