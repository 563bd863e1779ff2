package graft

import org.apache.spark.sql.functions._

import graft.ext.TextDedup
import graft.streaming.StreamingIngest

/** Streaming incremental corpus dedup (`dedupedCorpusStream`): the
  * continuous-ingest rendering of batch x51. Batches arrive as one file
  * per micro-batch (maxFilesPerTrigger=1, mtimes pinned so file order IS
  * batch order); survivors and the signature index must evolve with
  * greedy arrival-order semantics and heal idempotently under replay.
  */
class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  private val long = "the quick brown fox jumps over the lazy dog again and again and again"
  private val other = "completely different words forming an entirely unrelated document body here"
  private val third = "yet another body of text with its own private vocabulary and shape entirely"

  // one file per batch, mtime-ordered so FileStreamSource batches them in order
  private def writeBatches(dir: String, batches: Seq[Seq[(Long, String)]]): Unit = {
    batches.zipWithIndex.foreach { case (rows, i) =>
      val f = new java.io.File(dir, f"batch$i%03d.parquet")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      val ts = 1700000000000L + i * 60000L
      f.listFiles().foreach(_.setLastModified(ts))
      f.setLastModified(ts)
    }
  }

  private def run(src: String, indexDir: String, survDir: String, ckpt: String): Unit = {
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.dedupedCorpusStream(docs, indexDir, survDir, ckpt)
  }

  private val batches = Seq(
    Seq(1L -> long, 2L -> other),
    // 10 dups batch-0's doc 1 (dropped vs index), 11 is new (kept),
    // 12 is too short to shingle (passes through unjudged)
    Seq(10L -> long, 11L -> third, 12L -> "hi"),
    // 20 dups batch-1's survivor 11 (dropped), 21/22 are identical
    // in-batch rivals (21 keeps by min-id, 22 drops)
    Seq(20L -> third,
      21L -> "fresh sentence sharing no vocabulary with prior batches whatsoever in any form",
      22L -> "fresh sentence sharing no vocabulary with prior batches whatsoever in any form"))

  test("survivors across micro-batches follow greedy arrival-order dedup; index holds signed survivors only") {
    val root = tempDir("graft-sdedup")
    writeBatches(root + "/src", batches)
    run(root + "/src", root + "/index", root + "/surv", root + "/ckpt")

    val surv = spark.read.parquet(root + "/surv")
    assert(surv.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 11L, 12L, 21L))
    // batch provenance survives via the ingest_seq stamp
    assert(surv.filter(col("doc_id") === 21L).select("ingest_seq").as[Long].head() == 2L)

    // the index carries bands only for SIGNED survivors (12 is unsigned)
    val idxDocs = spark.read.parquet(root + "/index")
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(idxDocs == Seq(1L, 2L, 11L, 21L))

    // streaming result == sequential batch application of incrementalDedup
    var indexSigs = TextDedup.minhashSignatures(batches.head.toDF("doc_id", "text"))
    var expect = batches.head.map(_._1).toSet // batch 0: nothing to collide with
    batches.tail.foreach { rows =>
      val b = rows.toDF("doc_id", "text")
      val sigs = TextDedup.minhashSignatures(b)
      val kept = TextDedup.incrementalDedupBanded(TextDedup.signatureBands(indexSigs), sigs)
        .filter(col("keep") === 1).select("doc_id").as[Long].collect().toSet
      val signed = sigs.select("doc_id").as[Long].collect().toSet
      expect ++= kept ++ rows.map(_._1).filterNot(signed)
      indexSigs = indexSigs.unionAll(sigs.join(kept.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi"))
    }
    assert(surv.select("doc_id").as[Long].collect().toSet == expect)
  }

  test("replay with a fresh checkpoint heals idempotently — no duplicate appends, same survivors") {
    val root = tempDir("graft-sdedup2")
    writeBatches(root + "/src", batches)
    run(root + "/src", root + "/index", root + "/surv", root + "/ckpt1")
    val before = spark.read.parquet(root + "/surv")
      .select("doc_id", "ingest_seq").as[(Long, Long)].collect().sorted.toSeq
    val idxBefore = spark.read.parquet(root + "/index").count()

    // a fresh checkpoint replays every batch from scratch: the per-dir
    // ingest_seq guards must skip all appends, and the < batchId index
    // restriction keeps the replayed verdicts identical
    run(root + "/src", root + "/index", root + "/surv", root + "/ckpt2")
    val after = spark.read.parquet(root + "/surv")
      .select("doc_id", "ingest_seq").as[(Long, Long)].collect().sorted.toSeq
    assert(after == before)
    assert(spark.read.parquet(root + "/index").count() == idxBefore)
  }

  test("half-committed batch heals: index landed but survivors missing") {
    val root = tempDir("graft-sdedup3")
    writeBatches(root + "/src", batches.take(2))
    run(root + "/src", root + "/index", root + "/surv", root + "/ckpt1")

    // simulate a crash between the two appends of batch 1: survivors of
    // batch 1 vanish, its index rows remain
    val surv1 = spark.read.parquet(root + "/surv").filter(col("ingest_seq") < 1)
      .localCheckpoint(true)
    surv1.write.mode("overwrite").parquet(root + "/surv")

    run(root + "/src", root + "/index", root + "/surv", root + "/ckpt2")
    val healed = spark.read.parquet(root + "/surv")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(healed == Seq(1L, 2L, 11L, 12L))
    // index not double-appended for batch 1
    val idx = spark.read.parquet(root + "/index")
    assert(idx.groupBy("doc_id", "band").count().agg(max("count")).as[Long].head() == 1L)
  }
}
