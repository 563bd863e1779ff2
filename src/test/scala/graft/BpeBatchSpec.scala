package graft

import org.apache.spark.sql.functions._

/** Batched BPE fit ([[graft.ext.Bpe.fitBatched]]) must replay serial
  * greedy VERBATIM — same merge table, same fitted vocab — at every
  * window size. Tiny alphabets are the adversarial case: they maximize
  * count ties and symbol conflicts, the two places the batch-safety
  * argument (prefix cut at first conflict + strict-count truncation at
  * the boundary) has to be exactly right.
  */
class BpeBatchSpec extends SparkSuite {
  import spark.implicits._
  import graft.ext.Bpe

  private def canonical = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  private def mergeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq

  private def vocabMap(df: org.apache.spark.sql.DataFrame) =
    df.select(col("word"), col("n"), col("w")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap

  test("canonical corpus: the rank-1 count-9 tie chain forces 1-pair batches, output identical") {
    // serial merges (e,s),(es,t),(est,</w>) each share a symbol with the
    // NEXT winner and tie at count 9 — the strict-count truncation must
    // collapse every batch to exactly the serial winner here
    val serial = mergeRows(Bpe.fit(canonical, 4))
    for (w <- Seq(1, 2, 8, 64))
      assert(mergeRows(Bpe.fitBatched(canonical, 4, window = w)) == serial,
        s"window $w diverged from serial greedy")
    assert(vocabMap(Bpe.fittedVocabBatched(canonical, 4)) ==
      vocabMap(Bpe.fittedVocab(canonical, 4)))
  }

  test("tiny-alphabet random corpora: batched == serial across windows (5 seeds, depth 12)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(6))("abc" (rnd.nextInt(3))).mkString)
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val serial = mergeRows(Bpe.fit(docs, 12))
      for (w <- Seq(1, 2, 8)) {
        val got = mergeRows(Bpe.fitBatched(docs, 12, window = w))
        assert(got == serial, s"seed $seed window $w:\n  got    $got\n  serial $serial")
      }
      assert(vocabMap(Bpe.fittedVocabBatched(docs, 12, window = 8)) ==
        vocabMap(Bpe.fittedVocab(docs, 12)), s"seed $seed fitted vocab diverged")
    }
  }

  test("disjoint-pair corpus, depth 512: full-width batches, merge table matches the analytic truth") {
    // the wide-vocabulary regime (round-12, r11 verdict item 4): 600
    // XYXY words over pairwise-disjoint alphabets, main pairs at 2c
    // strictly above every secondary pair at c — every candidate window
    // keeps its full width, and the first 600 merge ranks are known
    // analytically: rank i+1 merges (X_i, Y_i) at count 2*(2*600-i)
    val wide = graft.tools.BpeDepthBench.disjointPairCorpus(spark, 600)
      .localCheckpoint(false)
    val got = mergeRows(Bpe.fitBatched(wide, 512, window = 64))
    val passes = Bpe.lastBatchSizes
    assert(passes.size == 8 && passes.forall(_ == 64),
      s"expected 8 full-width batches, got $passes")
    val want = (1 to 512).map { rank =>
      val i = rank - 1
      val (l, r) = ("" + (0x4E00 + 2 * i).toChar, "" + (0x4E00 + 2 * i + 1).toChar)
      (rank, l, r, l + r, 2L * (2 * 600 - i))
    }
    assert(got == want, s"depth-512 merge table diverged (first diff: ${
      got.zip(want).indexWhere { case (a, b) => a != b }})")
  }

  test("disjoint-pair corpus, depth 128: batched == serial (the deep-setting equality, measured corpus)") {
    val wide = graft.tools.BpeDepthBench.disjointPairCorpus(spark, 600)
      .localCheckpoint(false)
    val serial = mergeRows(Bpe.fit(wide, 128))
    assert(mergeRows(Bpe.fitBatched(wide, 128, window = 64)) == serial,
      "batched diverged from serial greedy at depth 128 on the wide corpus")
  }

  test("self-pair counterexample (round-11 ADVICE): (a,a) must terminate its batch") {
    // {"aaaX" x1 for 20 distinct X, "uvuv" x15, "pqpq" x9} gives ranked
    // candidates (a,a)=40, (u,v)=30, (p,q)=18 over boundary (v,u)=15 —
    // symbol-disjoint, so the pre-fix prefix scan kept all three. But
    // merging the SELF-pair (a,a) creates (aa,a)=20 > 18, which serial
    // greedy picks at rank 3 where the batch had recorded (p,q). The
    // fix keeps a self-pair only as the last element of its batch.
    val xs = "bcdefghijklmnostwxyz" // 20 letters disjoint from a,u,v,p,q
    val words = xs.map(x => s"aaa$x") ++ Seq.fill(15)("uvuv") ++ Seq.fill(9)("pqpq")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val serial = mergeRows(Bpe.fit(docs, 6))
    assert(serial.map(r => (r._2, r._3)).take(3) ==
      Seq(("a", "a"), ("u", "v"), ("aa", "a")),
      s"fixture lost its shape: $serial")
    for (w <- Seq(2, 4, 8, 64))
      assert(mergeRows(Bpe.fitBatched(docs, 6, window = w)) == serial,
        s"window $w diverged from serial greedy on the self-pair fixture")
  }

  test("run-heavy random corpora (self-pair rich): batched == serial (5 seeds, depth 10)") {
    // words dominated by single-char runs make self-pairs frequent AND
    // competitive — the regime the 3-letter uniform corpora above almost
    // never reach (their batches rarely keep >1 pair)
    for (seed <- 11 to 15) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(40) {
        if (rnd.nextInt(3) == 0) "a" * (2 + rnd.nextInt(5)) + "bc"(rnd.nextInt(2))
        else Seq.fill(2 + rnd.nextInt(4))("abcd"(rnd.nextInt(4))).mkString
      }
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val serial = mergeRows(Bpe.fit(docs, 10))
      for (w <- Seq(2, 8))
        assert(mergeRows(Bpe.fitBatched(docs, 10, window = w)) == serial,
          s"seed $seed window $w diverged on run-heavy corpus")
    }
  }

  test("pair exhaustion stops the batched loop exactly where serial stops") {
    // 2-char words exhaust fast; ask for far more merges than exist
    val docs = Seq((1L, "ab ab ba"), (2L, "ab ba ba"))
      .toDF("doc_id", "text")
    val serial = mergeRows(Bpe.fit(docs, 50))
    val batched = mergeRows(Bpe.fitBatched(docs, 50, window = 8))
    assert(batched == serial)
    assert(serial.size < 50, "fixture was meant to exhaust before 50 merges")
  }

  test("real documents table, depth 48: batched == serial, and batches actually form") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val serial = mergeRows(Bpe.fit(docs, 48))
    val batched = mergeRows(Bpe.fitBatched(docs, 48, window = 16))
    assert(batched == serial)
    assert(serial.size == 48)
  }
}
