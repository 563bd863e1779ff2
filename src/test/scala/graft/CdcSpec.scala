package graft

import org.apache.spark.sql.functions._

/** [[graft.ext.TextDedup.cdcChunks]]: chunks tile the document exactly,
  * and — the property that defines content-defined chunking — a prefix
  * insertion shifts every byte offset yet preserves all downstream
  * chunks, so shifted copies still deduplicate where fixed-size blocking
  * would share nothing.
  */
class CdcSpec extends SparkSuite {
  import spark.implicits._
  import graft.ext.TextDedup

  // deterministic "random" text: long enough for several divisor-64 cuts
  private def synth(seed: Int, n: Int): String = {
    val sb = new StringBuilder
    var z = seed
    for (_ <- 0 until n) {
      z = z * 1103515245 + 12345
      sb += ('a' + math.floorMod(z >> 16, 26)).toChar
    }
    sb.toString
  }

  test("chunks tile the document: contiguous 1-based segments covering every char") {
    val text = synth(7, 400)
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val ch = TextDedup.cdcChunks(docs).orderBy("chunk_idx").collect()
    assert(ch.length >= 3, s"expected several cuts in 400 chars, got ${ch.length} chunk(s)")
    // starts/lengths tile [1, len]
    var expectStart = 1L
    ch.foreach { r =>
      assert(r.getLong(2) == expectStart)
      expectStart += r.getLong(3)
    }
    assert(expectStart == text.length + 1)
    // chunk hashes are the md5 of the tiled substrings
    val h0 = java.security.MessageDigest.getInstance("MD5")
      .digest(text.substring(0, ch(0).getLong(3).toInt).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(ch(0).getString(4) == h0)
  }

  test("shift invariance: a prefix insertion preserves every chunk after the first cut") {
    val base = synth(11, 500)
    val docs = Seq((1L, base), (2L, "INSERTED-PREFIX " + base))
      .toDF("doc_id", "text")
    val ch = TextDedup.cdcChunks(docs).collect()
    val a = ch.filter(_.getLong(0) == 1L).sortBy(_.getInt(1)).map(_.getString(4))
    val b = ch.filter(_.getLong(0) == 2L).map(_.getString(4)).toSet
    assert(a.length >= 3)
    // every chunk of the original except the first (whose start the
    // prefix shifts into a different window stream) survives verbatim
    a.drop(1).foreach(h => assert(b.contains(h), "downstream chunk lost after shift"))
    // and the shared-chunk accounting sees exactly that overlap
    val stats = TextDedup.cdcDedupStats(docs).orderBy("doc_id").collect()
    assert(stats(0).getLong(2) >= a.length - 1) // n_shared_chunks for doc 1
  }

  test("cdcIncremental: embedded/shifted corpus content hits the index; novel content doesn't") {
    val a = synth(19, 600)
    val corpus = Seq((1L, a)).toDF("doc_id", "text")
    // batch: doc 10 embeds a shifted slice of corpus content behind a
    // novel prefix; doc 11 is entirely novel
    val batch = Seq(
      (10L, "ENTIRELY NOVEL PREFIX " + a.substring(100, 550)),
      (11L, synth(23, 300))
    ).toDF("doc_id", "text")
    val out = TextDedup.cdcIncremental(corpus, batch).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n10, hits10, novel10) = out(10L)
    val (n11, hits11, novel11) = out(11L)
    assert(hits10 >= 2, s"shifted embedded content must hit the chunk index, got $hits10/$n10")
    assert(novel10 < 22 + 450, "hit chunks must not count as novel chars")
    assert(hits11 == 0 && novel11 == 300, s"novel doc must miss entirely: $hits11 hits")
  }

  test("fast path (gear codegen): tiles the document and preserves shifted chunks") {
    val base = synth(29, 900)
    val docs = Seq((1L, base), (2L, "SHIFTING-PREFIX-123 " + base))
      .toDF("doc_id", "text")
    val ch = TextDedup.cdcChunksFast(docs).collect()
    // tiling per doc
    for (id <- Seq(1L, 2L)) {
      val rows = ch.filter(_.getLong(0) == id).sortBy(_.getInt(1))
      var expectStart = 1L
      rows.foreach { r =>
        assert(r.getLong(2) == expectStart); expectStart += r.getLong(3)
      }
    }
    val a = ch.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    val b = ch.filter(_.getLong(0) == 2L).map(_.getLong(4)).toSet
    assert(a.length >= 4, s"expected several gear cuts in 900 chars, got ${a.length}")
    // gear hash horizon is ~64 codepoints + one shared cut to re-sync:
    // every chunk of the original starting beyond that must survive the
    // prefix shift verbatim
    val resync = a.filter(_.getLong(2) > 64 + 20)
    assert(resync.length >= 2, "need chunks beyond the re-sync horizon to assert on")
    resync.dropRight(0).drop(1).foreach(r =>
      assert(b.contains(r.getLong(4)), s"chunk at ${r.getLong(2)} lost after shift"))
    // deterministic
    val again = TextDedup.cdcChunksFast(docs).collect()
    assert(ch.map(r => (r.getLong(0), r.getInt(1), r.getLong(4))).toSet ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getLong(4))).toSet)
  }

  test("bucketed chunk index: the probe plans fewer exchanges than an unbucketed one") {
    import graft.pipeline.Bucketing
    val corpus = (1L to 40L).map(i => (i, synth(100 + i.toInt, 300)))
      .toDF("doc_id", "text")
    val batch = Seq((500L, synth(101, 300)), (501L, synth(999, 250)))
      .toDF("doc_id", "text")
    Bucketing.writeBucketed(TextDedup.cdcChunksFast(corpus),
      "chunk_index", "h", 4, Some("h"))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batchChunks = TextDedup.cdcChunksFast(batch)
      val bucketed = TextDedup.cdcIncrementalAgainstIndex(
        spark.table("chunk_index"), batchChunks)
      val plain = TextDedup.cdcIncrementalAgainstIndex(
        TextDedup.cdcChunksFast(corpus), batchChunks)
      val (nBucketed, nPlain) =
        (Bucketing.countExchanges(bucketed), Bucketing.countExchanges(plain))
      // HashPartitioning(h) from the bucket layout satisfies both the
      // index-side distinct and the probe join — only batch-side
      // exchanges remain
      assert(nBucketed < nPlain,
        s"bucketed chunk index should drop index-side exchanges ($nBucketed vs $nPlain)")
      // identical novelty stats either way; doc 500 re-arrives corpus
      // content and must be fully known
      val b = bucketed.orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(b == plain.orderBy("doc_id").collect().map(_.toSeq).toSeq)
      val d500 = b.head
      assert(d500(1) == d500(2), s"exact re-arrival must fully hit: $d500")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS chunk_index")
    }
  }

  test("fixed-size blocking shares nothing under the same shift (the contrast)") {
    val base = synth(13, 512)
    val shifted = "x" + base // 1-char insertion: every 64-byte block differs
    val blocks = (s: String) => s.grouped(64).toSeq
    assert(blocks(base).toSet.intersect(blocks(shifted).toSet).isEmpty)
  }
}
