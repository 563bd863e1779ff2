package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextRank
import graft.streaming.StreamingIngest

/** Streaming BM25 inverted-index maintenance (round-11): retrieval off
  * the standing postings index equals batch x54 over everything that
  * has arrived — tf/df/dl/N are set-functions of the arrived docs,
  * blind to batching, arrival order, and replay.
  */
class Bm25IndexStreamSpec extends SparkSuite {

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .localCheckpoint(false)

  private def run(root: String, ckpt: String): Unit = {
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.bm25IndexStream(stream, root + "/postings", ckpt)
  }

  private def retrieveFromIndex(root: String): Set[(Long, Int, Long, String)] = {
    val tf = spark.read.parquet(root + "/postings")
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
      .localCheckpoint(false)
    TextRank.bm25(tf, TextRank.midFrequencyQueries(tf, postingsOpt = Some(tf)),
        postingsOpt = Some(tf),
        statsOpt = Some(TextRank.statsFromPostings(tf)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSet
  }

  private def batchRetrieve(d: DataFrame): Set[(Long, Int, Long, String)] = {
    val tf = TextRank.postings(d).localCheckpoint(false)
    TextRank.bm25(d, TextRank.midFrequencyQueries(d, postingsOpt = Some(tf)),
        postingsOpt = Some(tf))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSet
  }

  test("retrieval off the streamed index equals batch x54, including stats recovered from postings") {
    val root = tempDir("graft-bm25idx")
    val split = docs.withColumn("h", pmod(xxhash64(col("doc_id")), lit(3L)))
      .localCheckpoint(false)
    (0 until 3).foreach(b =>
      writeWaveTo(root + "/src", b, split.filter(col("h") === b).drop("h")))
    run(root, root + "/ckpt")
    assert(retrieveFromIndex(root) == batchRetrieve(docs),
      "index retrieval != batch BM25 after 3 waves")

    // continuation with a 4th wave of NEW docs (shifted ids, same text
    // distribution): the standing index absorbs it and still equals the
    // batch form over the union
    val extra = docs.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .localCheckpoint(false)
    writeWaveTo(root + "/src", 3, extra)
    run(root, root + "/ckpt")
    assert(retrieveFromIndex(root) == batchRetrieve(docs.unionByName(extra)),
      "index retrieval != batch BM25 after the continuation wave")
  }

  test("null-text docs are gated out of the index by name: stats describe indexed docs, retrieval still equals batch over the non-null corpus") {
    import spark.implicits._
    val root = tempDir("graft-bm25idx3")
    val withNull = docs.unionByName(
      Seq((9999999L, null.asInstanceOf[String], "en", "srcX", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    writeWaveTo(root + "/src", 0, withNull)
    run(root, root + "/ckpt")
    val tf = spark.read.parquet(root + "/postings")
    assert(tf.filter(col("doc_id") === 9999999L).count() == 0,
      "null-text doc must leave no posting trace")
    // index stats count INDEXED docs (the documented contract): equal to
    // the non-null corpus, one less than the raw arrival stream
    val nDocs = graft.ext.TextRank.statsFromPostings(
      tf.select(col("doc_id"), col("term"), col("tf"), col("dl")))
      .head().getLong(0)
    assert(nDocs == docs.count(), s"n_docs $nDocs != non-null corpus ${docs.count()}")
    assert(retrieveFromIndex(root) == batchRetrieve(docs),
      "retrieval off the gated index != batch BM25 over the non-null corpus")
  }

  test("replaying landed batches leaves the index byte-equivalent (stamped-append exactly-once)") {
    val root = tempDir("graft-bm25idx2")
    val split = docs.withColumn("h", pmod(xxhash64(col("doc_id")), lit(2L)))
      .localCheckpoint(false)
    (0 until 2).foreach(b =>
      writeWaveTo(root + "/src", b, split.filter(col("h") === b).drop("h")))
    run(root, root + "/ckpt")
    val before = retrieveFromIndex(root)
    val nBefore = spark.read.parquet(root + "/postings").count()
    // fresh checkpoint over the SAME files: every batch replays with its
    // original batchId against an index that already holds it
    run(root, root + "/ckpt2")
    assert(spark.read.parquet(root + "/postings").count() == nBefore,
      "a replayed batch re-appended postings (double-counted df/tf)")
    assert(retrieveFromIndex(root) == before)
  }
}
