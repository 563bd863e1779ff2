package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Streaming CDC novelty (`cdcNoveltyStream`): the continuous-ingest
  * rendering of batch x71. Batches arrive one file per micro-batch
  * (mtime-pinned order); the chunk index must grow with distinct
  * content only, exact re-arrivals must account as fully known, shifted
  * embeddings must hit on preserved chunks, and a re-run with a fresh
  * checkpoint must heal idempotently (no double appends).
  */
class CdcStreamSpec extends SparkSuite {
  import spark.implicits._

  private def synth(seed: Int, n: Int): String = {
    val sb = new StringBuilder
    var z = seed
    for (_ <- 0 until n) {
      z = z * 1103515245 + 12345
      sb += ('a' + math.floorMod(z >> 16, 26)).toChar
    }
    sb.toString
  }

  private val a = synth(31, 700)
  private val c = synth(37, 500)

  private val batches = Seq(
    Seq(1L -> a, 2L -> synth(33, 400)),
    // 10 embeds a shifted slice of batch-0 content; 11 is novel
    Seq(10L -> ("STREAMED-NOVEL-PREFIX " + a.substring(120, 650)), 11L -> c),
    // 20 re-arrives batch-1's novel doc verbatim
    Seq(20L -> c))

  private def writeBatches(dir: String): Unit = {
    batches.zipWithIndex.foreach { case (rows, i) =>
      val f = new java.io.File(dir, f"batch$i%03d.parquet")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      val ts = 1700000000000L + i * 60000L
      f.listFiles().foreach(_.setLastModified(ts))
      f.setLastModified(ts)
    }
  }

  private def run(src: String, indexDir: String, statsDir: String, ckpt: String): Unit = {
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.cdcNoveltyStream(docs, indexDir, statsDir, ckpt)
  }

  test("index grows with distinct content; re-arrivals fully known; shifts hit; replay heals") {
    val root = tempDir("graft-cdcstream")
    writeBatches(root + "/src")
    run(root + "/src", root + "/index", root + "/stats", root + "/ckpt")

    val stats = spark.read.parquet(root + "/stats")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_corpus_hits"),
          r.getAs[Long]("novel_chars"))).toMap
    // exact re-arrival: every chunk already indexed, zero novel chars
    val (n20, hits20, novel20) = stats(20L)
    assert(hits20 == n20 && novel20 == 0L, s"re-arrival not fully known: $hits20/$n20, $novel20")
    // shifted embedding: preserved chunks hit the prior index
    val (n10, hits10, _) = stats(10L)
    assert(hits10 >= 1 && hits10 < n10, s"shifted embedding should partially hit: $hits10/$n10")
    // batch 0 probes an empty index
    assert(stats(1L)._2 == 0 && stats(2L)._2 == 0)

    // index h-set == distinct chunk hashes over every arrived doc
    val allDocs = batches.flatten.toDF("doc_id", "text")
    val expected = graft.ext.TextDedup.cdcChunksFast(allDocs)
      .select("h").distinct().as[Long].collect().toSet
    val got = spark.read.parquet(root + "/index").select("h").as[Long].collect()
    assert(got.toSet == expected, "index must hold exactly the distinct content's chunks")
    assert(got.length == got.toSet.size, "index must not hold duplicate hashes")

    // replay with a fresh checkpoint: landed() guards must skip every
    // append, leaving both directories byte-stable
    val before = (spark.read.parquet(root + "/index").count(),
      spark.read.parquet(root + "/stats").count())
    run(root + "/src", root + "/index", root + "/stats", root + "/ckpt2")
    val after = (spark.read.parquet(root + "/index").count(),
      spark.read.parquet(root + "/stats").count())
    assert(before == after, s"replay must not double-append: $before -> $after")

    // ---- round-8: index compaction policy (verdict item 6) ----
    // per-batch appends fragment the index into one file group per
    // micro-batch; compaction must collapse the LAYOUT while keeping
    // every (h, ingest_seq) row bit-identical (h is unique by
    // construction, so keyed last-write-wins is the identity) — and the
    // stream must keep running correctly against the compacted index.
    val rowsBefore = spark.read.parquet(root + "/index")
      .select("h", "ingest_seq").as[(Long, Long)].collect().toSet
    val filesBefore = StreamingIngest.cdcIndexFileCount(spark, root + "/index")
    assert(filesBefore >= batches.size,
      s"expected ≥${batches.size} file groups pre-compaction, saw $filesBefore")
    assert(!StreamingIngest.maybeCompactCdcIndex(spark, root + "/index",
      maxFiles = 1000), "policy must not fire under the threshold")
    assert(StreamingIngest.maybeCompactCdcIndex(spark, root + "/index",
      maxFiles = 1), "policy must fire over the threshold")
    val rowsAfter = spark.read.parquet(root + "/index")
      .select("h", "ingest_seq").as[(Long, Long)].collect().toSet
    assert(rowsAfter == rowsBefore, "compaction must preserve every (h, seq) row")
    val filesAfter = StreamingIngest.cdcIndexFileCount(spark, root + "/index")
    assert(filesAfter < filesBefore,
      s"compaction must shrink the layout: $filesBefore -> $filesAfter")

    // a NEW batch arriving after compaction: doc 30 re-delivers batch-0
    // content verbatim — the compacted index must account it fully known
    // (the seq-stamped exactly-once probes survive the rewrite)
    val f3 = new java.io.File(root + "/src", "batch003.parquet")
    Seq(30L -> a).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(f3.toString)
    val ts3 = 1700000000000L + 3 * 60000L
    f3.listFiles().foreach(_.setLastModified(ts3))
    f3.setLastModified(ts3)
    run(root + "/src", root + "/index", root + "/stats", root + "/ckpt")
    val st = spark.read.parquet(root + "/stats")
      .filter($"doc_id" === 30L)
      .select($"n_chunks", $"n_corpus_hits", $"novel_chars")
      .as[(Long, Long, Long)].collect()
    assert(st.length == 1)
    val (n30, hits30, novel30) = st.head
    assert(hits30 == n30 && novel30 == 0L,
      s"post-compaction re-arrival not fully known: $hits30/$n30, $novel30")
  }
}
