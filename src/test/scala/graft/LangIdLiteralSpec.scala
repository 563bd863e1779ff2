package graft

import graft.ext.TextStats
import graft.sources.Tables

/** Round-8: the literal-map scoring variant of the char-n-gram language
  * ID must be ROW-IDENTICAL to the declarative broadcast-join form on
  * real corpus data — same profiles, same integer scores, same
  * (score desc, lang desc) argmax tie-break, zero-gram docs included.
  */
class LangIdLiteralSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "pred_lang", "score", "actual_lang", "correct")
      .as[(Long, String, Long, String, Int)].collect().toSet

  test("literal-map scoring equals the broadcast-join form on the corpus") {
    val docs = Tables.documents(spark, sf)
    assert(rows(TextStats.languageIdNgramLiteral(docs)) ==
      rows(TextStats.languageIdNgram(docs)))
  }

  test("equality holds with ties, single-lang corpora, and zero-gram docs") {
    // "zz" doc is too short for a bigram at n=3... use n=2 with a
    // 1-char doc: no grams → scores all zero → tie across every lang →
    // the tie-break must pick the lexicographically largest code in
    // both forms
    val docs = Seq(
      (1L, "aaaa", "aa"), (2L, "aaab", "aa"),
      (3L, "bbbb", "bb"), (4L, "x", "bb")
    ).toDF("doc_id", "text", "lang")
    val lit = rows(TextStats.languageIdNgramLiteral(docs))
    val ref = rows(TextStats.languageIdNgram(docs))
    assert(lit == ref, s"literal $lit != reference $ref")
    // the zero-gram doc resolves to the largest lang code with score 0
    assert(lit.exists { case (id, pred, s, _, _) => id == 4L && pred == "bb" && s == 0L })
  }
}
