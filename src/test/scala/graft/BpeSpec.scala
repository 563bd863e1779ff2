package graft

import org.apache.spark.sql.functions._

/** BPE tokenizer training ([[graft.ext.Bpe]]) on the canonical Sennrich
  * et al. corpus (low:5, lower:2, newest:6, widest:3), whose first four
  * merges are the published example: es, est, est&lt;/w&gt;, lo.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._
  import graft.ext.Bpe

  // one doc per word occurrence — counts 5/2/6/3
  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("fit learns the canonical merge sequence with deterministic tie-breaks") {
    val got = Bpe.fit(corpus, 4).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // rank-1 tie at count 9 among (e,s),(s,t),(t,</w>) -> left asc picks (e,s);
    // rank-4 tie at 7 between (l,o),(o,w) -> (l,o)
    assert(got.toSeq == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L)))
  }

  test("fitted vocab symbolizations match the published example") {
    val v = Bpe.fittedVocab(corpus, 4)
      .select(col("word"), Bpe.symbols(col("w")).as("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(v("low") == List("lo", "w", "</w>"))
    assert(v("lower") == List("lo", "w", "e", "r", "</w>"))
    assert(v("newest") == List("n", "e", "w", "est</w>"))
    assert(v("widest") == List("w", "i", "d", "est</w>"))
  }

  test("greedy semantics: repeated pairs merge leftmost, stranding the odd one") {
    val aaa = Seq((0L, "aaa aaaa")).toDF("doc_id", "text")
    // merge 1: (a,a) count 2+3=5 -> "aaa" = [aa, a, </w>], "aaaa" = [aa, aa, </w>]
    val v = Bpe.fittedVocab(aaa, 1)
      .select(col("word"), Bpe.symbols(col("w")).as("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(v("aaa") == List("aa", "a", "</w>"))
    assert(v("aaaa") == List("aa", "aa", "</w>"))
  }

  test("encode counts tokens under the fitted merges; stable under repartitioning") {
    val doc = Seq((0L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))).toDF("doc_id", "text")
    val got = Bpe.encode(doc, 4).collect()
    // low=3 tokens x5, lower=5 x2, newest=4 x6, widest=4 x3
    assert(got.length == 1)
    assert(got(0).getLong(1) == 5 * 3 + 2 * 5 + 6 * 4 + 3 * 4)
    assert(got(0).getLong(2) == 16)
    val again = Bpe.encode(doc.repartition(3), 4).collect()
    assert(again(0).getLong(1) == got(0).getLong(1))
  }

  test("pair exhaustion stops the fit instead of emptying the vocab (round-10 depth sweep)") {
    // a corpus this small runs out of mergeable pairs long before 50
    // iterations; pre-fix, the first empty winner crossJoined the vocab
    // to empty and encode returned ZERO rows for every doc
    val table = Bpe.fit(corpus, 50)
    val learned = table.count()
    assert(learned > 4 && learned < 50, s"fit should self-terminate, learned $learned")
    val vocab = Bpe.fittedVocab(corpus, 50)
    assert(vocab.count() == 4, "vocab survives exhaustion (4 distinct words)")
    // every word fully merged: one symbol left per word
    assert(vocab.select(size(Bpe.symbols(col("w"))).as("n"))
      .filter(col("n") =!= 1).count() == 0, "exhaustion = every word is one symbol")
    val enc = Bpe.encode(corpus, 50)
    assert(enc.count() == 16, "encode keeps every doc after an over-deep fit")
    assert(enc.filter(col("n_tokens_bpe") === 1).count() == 16,
      "fully-merged words encode to exactly one token")
  }
}
