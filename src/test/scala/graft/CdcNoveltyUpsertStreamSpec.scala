package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextDedup
import graft.streaming.StreamingIngest

/** The fused per-arrival CDC novelty loop over the doc-attributed
  * retractable chunk index (round-13, x127): novelty is judged against
  * the live content store (SELF INCLUDED — re-delivering a stored doc
  * is zero novel bytes), a retracted/updated doc's stale chunks stop
  * suppressing later arrivals, per-wave stats equal the batch kernel
  * over the closed-form live corpus, and replay/compaction are
  * invisible to the stats log.
  */
class CdcNoveltyUpsertStreamSpec extends SparkSuite {
  import spark.implicits._

  private val tA = "the quick brown fox jumps over the lazy dog today and every day after"
  private val tB = "completely different content about spark streaming and standing indexes"
  private val tC = "unrelated third text regarding versioned retraction of chunk ownership"

  private def run(root: String, ckpt: String, maxChunkFiles: Int = 64): Unit = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.cdcIndexUpsertNoveltyStream(stream, root + "/chunks",
      root + "/versions", root + "/stats", root + s"/$ckpt",
      maxChunkFiles = maxChunkFiles)
  }

  private def stats(root: String): Set[(Long, Long, Long, Long, Long)] =
    spark.read.parquet(root + "/stats")
      .select(col("ingest_seq"), col("doc_id"), col("n_chunks"),
        col("n_corpus_hits"), col("novel_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("self included, stale chunks stop suppressing, retraction restores novelty") {
    val root = tempDir("graft-cnus1")
    // wave 0: two docs, everything novel against the empty store
    writeWaveTo(root + "/src", 0,
      Seq((1L, tA), (2L, tB)).toDF("doc_id", "text"))
    // wave 1: doc 1 re-arrives IDENTICAL — zero novel bytes (its own
    // previous version is stored: the content-store semantic, opposite
    // of the dedup fusions' self-exclusion)
    writeWaveTo(root + "/src", 1, Seq((1L, tA)).toDF("doc_id", "text"))
    // wave 2: doc 1 replaced by tC — tA's chunks become stale
    writeWaveTo(root + "/src", 2, Seq((1L, tC)).toDF("doc_id", "text"))
    // wave 3: a NEW doc with tA — under an append-only index doc 1's
    // stale tA chunks would zero this; the retractable index reports it
    // fully novel
    writeWaveTo(root + "/src", 3, Seq((3L, tA)).toDF("doc_id", "text"))
    run(root, "ckpt")
    val st = stats(root)
    val w0 = st.filter(_._1 == 0L)
    assert(w0.forall(t => t._4 == 0L), s"wave 0 must have no corpus hits: $st")
    assert(w0.forall(t => t._5 > 0L), s"wave 0 must be fully novel: $st")
    val w1 = st.find(t => t._1 == 1L && t._2 == 1L).get
    assert(w1._5 == 0L && w1._4 == w1._3,
      s"an identical re-delivery must be zero novel bytes: $st")
    val w3 = st.find(t => t._1 == 3L && t._2 == 3L).get
    assert(w3._4 == 0L && w3._5 == tA.length.toLong,
      s"retracted stale chunks must not suppress a later arrival's novelty: $st")
  }

  test("per-wave stats equal batch cdcIncrementalAgainstIndex over the closed-form live corpus") {
    val root = tempDir("graft-cnus2")
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 150).select(col("doc_id"), col("text"))
      .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
        col("doc_id").cast("string"), ""), lit(4L)))
      .localCheckpoint(false)
    val w0 = docs.drop("h4")
    val w1 = docs.filter(col("h4") === 1)
      .withColumn("text", translate(col("text"), "e", "#")).drop("h4")
      .unionByName(docs.filter(col("h4") === 3)
        .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4"))
    val w2 = docs.filter(col("h4") === 2)
      .withColumn("text", lit(null).cast("string")).drop("h4")
      .unionByName(docs.filter(col("h4") === 3).drop("h4"))
    writeWaveTo(root + "/src", 0, w0)
    writeWaveTo(root + "/src", 1, w1)
    writeWaveTo(root + "/src", 2, w2)
    run(root, "ckpt")
    val live1 = w0
    val live2 = docs.filter(col("h4") === 1)
      .withColumn("text", translate(col("text"), "e", "#")).drop("h4")
      .unionByName(docs.filter(col("h4") === 3)
        .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4"))
      .unionByName(docs.filter(col("h4") === 0 || col("h4") === 2).drop("h4"))
    def batchStats(live: Option[DataFrame], batch: DataFrame): Set[(Long, Long, Long, Long)] = {
      val chunks = TextDedup.cdcChunksFast(batch.filter(col("text").isNotNull))
      val idx = live.map(l => TextDedup.cdcChunksFast(l).select(col("h")))
        .getOrElse(chunks.select(col("h")).limit(0))
      TextDedup.cdcIncrementalAgainstIndex(idx, chunks)
        .select(col("doc_id"), col("n_chunks"), col("n_corpus_hits"), col("novel_chars"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    val st = stats(root)
    def wave(k: Long) = st.filter(_._1 == k).map(t => (t._2, t._3, t._4, t._5))
    assert(wave(0) == batchStats(None, w0), "wave 0 != batch over empty store")
    assert(wave(1) == batchStats(Some(live1), w1), "wave 1 != batch over live-at-1")
    assert(wave(2) == batchStats(Some(live2), w2), "wave 2 != batch over live-at-2")
  }

  test("replay is a no-op on the stats log; per-batch compaction is invisible") {
    val root = tempDir("graft-cnus3")
    writeWaveTo(root + "/src", 0,
      Seq((1L, tA), (2L, tB)).toDF("doc_id", "text"))
    writeWaveTo(root + "/src", 1, Seq((1L, tC), (3L, tA)).toDF("doc_id", "text"))
    writeWaveTo(root + "/src", 2,
      Seq((2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    run(root, "ckpt", maxChunkFiles = 1) // compaction fires every batch
    val before = stats(root)
    val rawStats = spark.read.parquet(root + "/stats").count()
    def resolved(): Set[(Long, Long)] =
      StreamingIngest.resolvedChunks(spark, root + "/chunks", root + "/versions")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val liveBefore = resolved()
    // NOTE this scenario leaves NO live wave-0 rows (doc 1 updated, doc 2
    // deleted). Pre-round-16 the row-probe guard re-appended wave 0's
    // rows on replay (harmless: superseded, compacted away again); the
    // landed MARKER now survives compaction, so the replay skips the
    // re-append outright — either way the assertions below hold.
    run(root, "ckpt2", maxChunkFiles = 1) // full replay with original batchIds
    assert(spark.read.parquet(root + "/stats").count() == rawStats,
      "replay re-appended stats rows")
    assert(stats(root) == before)
    assert(resolved() == liveBefore, "replay changed the resolved chunk set")
    val stale = spark.read.parquet(root + "/chunks")
      .groupBy(col("doc_id")).agg(countDistinct(col("ingest_seq")).as("nv"))
      .filter(col("nv") > 1)
    assert(stale.count() == 0, "superseded chunk versions survived compaction")
  }
}
