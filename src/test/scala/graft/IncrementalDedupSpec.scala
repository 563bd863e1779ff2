package graft

import org.apache.spark.sql.functions._

import graft.ext.TextDedup

/** Incremental dedup (x51): a new batch probes a standing corpus
  * signature index; verdicts are new-vs-corpus drop plus keep-min-id
  * within the batch.
  */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  private val long = "the quick brown fox jumps over the lazy dog again and again and again"
  private val other = "completely different words forming an entirely unrelated document body here"

  private def sigs(rows: (Long, String)*) =
    TextDedup.minhashSignatures(rows.toDF("doc_id", "text"))

  test("batch doc identical to a corpus doc is dropped; unique batch doc survives") {
    val index = sigs(1L -> long, 2L -> other)
    val batch = sigs(10L -> long,
      11L -> "nothing like either corpus text lives in this sentence at all truly")
    val got = TextDedup.incrementalDedup(index, batch)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(got(10L)._1 >= 1L, "identical batch doc must hit the corpus")
    assert(got(10L)._3 == 0, "corpus hit must drop the batch doc")
    assert(got(11L) == ((0L, 0L, 1)), "unique batch doc must survive")
  }

  test("in-batch near-dups keep the min id; the larger id records the rival") {
    val index = sigs(1L -> other)
    val batch = sigs(20L -> long, 21L -> long)
    val got = TextDedup.incrementalDedup(index, batch)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(got(20L) == ((0L, 0L, 1)), "min-id batch doc survives")
    assert(got(21L)._2 >= 1L && got(21L)._3 == 0, "larger id sees the rival and drops")
  }

  test("candidates carry origin and orientation; corpus matches never point batch-to-batch") {
    val index = sigs(1L -> long)
    val batch = sigs(10L -> long, 11L -> long)
    val cands = TextDedup.incrementalCandidates(index, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // both batch docs hit corpus doc 1
    assert(cands.filter(_._3 == "corpus").map(c => (c._1, c._2)).toSet ==
      Set((10L, 1L), (11L, 1L)))
    // one in-batch pair, oriented larger -> smaller
    assert(cands.filter(_._3 == "batch").map(c => (c._1, c._2)).toSet == Set((11L, 10L)))
  }

  test("bucketed signature index: the probe plans fewer exchanges than an unbucketed one") {
    import graft.pipeline.Bucketing
    val index = sigs((1L to 50L).map(i => i -> s"$other unique tail $i words"): _*)
    val batch = sigs(100L -> long, 101L -> long)
    Bucketing.writeBucketed(TextDedup.signatureBands(index),
      "sig_index", "band_hash", 4, Some("band_hash"))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = TextDedup.incrementalCandidatesBanded(
        spark.table("sig_index"), batch)
      val plain = TextDedup.incrementalCandidates(index, batch)
      val (nBucketed, nPlain) =
        (Bucketing.countExchanges(bucketed), Bucketing.countExchanges(plain))
      // HashPartitioning(band_hash) from the bucketed layout satisfies
      // every (band, band_hash) clustering the probe needs on the index
      // side — only batch-side exchanges remain
      assert(nBucketed < nPlain,
        s"bucketed index should drop index-side exchanges ($nBucketed vs $nPlain):\n" +
          bucketed.queryExecution.executedPlan)
      // same verdicts either way
      assert(bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.sameElements(
        plain.collect().map(r => (r.getLong(0), r.getLong(1))).sorted))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS sig_index")
    }
  }

  test("seeded random corpora: verdicts equal an independent sequential greedy reference") {
    // reference semantics, computed driver-side from collected
    // signatures with no operator code: a batch doc survives iff NO
    // index doc and NO smaller-id batch doc shares an LSH band with it
    // AND agrees on >= half its signature components (the drop counts
    // any smaller-id rival, surviving or not — x51's declared rule)
    def bandKeys(sig: Seq[Long]): Seq[Seq[Long]] =
      (0 until TextDedup.Bands).map(b =>
        sig.slice(b * TextDedup.RowsPerBand, (b + 1) * TextDedup.RowsPerBand))
    def matches(a: Seq[Long], b: Seq[Long]): Boolean = {
      val shareBand = bandKeys(a).zip(bandKeys(b)).exists { case (x, y) => x == y }
      shareBand && a.zip(b).count { case (x, y) => x == y } * 2 >= TextDedup.NumHashes
    }
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      // ~40 docs of 6-10 words over a tiny vocabulary → plenty of near-dups
      val docs = (0L until 40L).map { id =>
        id -> Seq.fill(6 + rnd.nextInt(5))(words(rnd.nextInt(words.size))).mkString(" ")
      }
      val (corpus, batch) = docs.splitAt(25)
      val indexSigs = sigs(corpus: _*)
      val batchSigs = sigs(batch: _*)
      def collectSigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
        TextDedup.signatureBands(df).select(col("doc_id"), col("sig")).distinct()
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      val si = collectSigs(indexSigs)
      val sb = collectSigs(batchSigs).toSeq.sortBy(_._1)
      val expect = sb.map { case (id, s) =>
        val corpusHit = si.values.exists(ks => matches(s, ks))
        val rival = sb.exists { case (rid, rs) => rid < id && matches(s, rs) }
        id -> (if (corpusHit || rival) 0 else 1)
      }.toMap
      val got = TextDedup.incrementalDedup(indexSigs, batchSigs, maxBucket = 0)
        .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
      assert(got == expect, s"seed $seed: greedy reference disagrees")
    }
  }

  test("index bucket cap suppresses corpus matches but leaves in-batch pairs") {
    // 5 identical corpus docs overflow a cap of 4 in every band bucket
    val index = sigs((1L to 5L).map(_ -> long): _*)
    val batch = sigs(10L -> long, 11L -> long)
    val capped = TextDedup.incrementalDedup(index, batch, maxBucket = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(capped(10L)._1 == 0L, "capped bucket must emit no corpus hits")
    assert(capped(11L)._2 >= 1L, "in-batch rival unaffected by the index cap")
    val uncapped = TextDedup.incrementalDedup(index, batch, maxBucket = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uncapped(10L) == 5L, "cap disabled: all five corpus copies match")
  }
}
