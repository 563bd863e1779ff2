package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents
import graft.pipeline.ManifestTable
import graft.streaming.StreamingIngest

/** Streaming component maintenance (round-10, the x100 twin): the
  * standing component table folded per edge micro-batch equals
  * from-scratch CC over every edge ever streamed.
  */
class ComponentStreamSpec extends SparkSuite {
  import spark.implicits._

  // three batches whose edges braid across batches: {1,2} + {3,4} land
  // first, the MERGING edge (2,3) arrives last; a second community
  // grows one node per batch
  private val batches: Seq[Seq[(Long, Long)]] = Seq(
    Seq((1L, 2L), (3L, 4L)),
    Seq((100L, 101L)),
    Seq((2L, 3L), (101L, 102L)))

  private def writeBatch(dir: String, b: Int): Unit = {
    val f = new java.io.File(dir, f"batch$b%03d.parquet")
    batches(b).toDF("doc_a", "doc_b").coalesce(1)
      .write.mode("overwrite").parquet(f.toString)
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }

  private def run(src: String, comps: String, ckpt: String): Unit = {
    val edges = spark.readStream
      .schema("doc_a LONG, doc_b LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.componentStream(edges, comps, ckpt)
  }

  private def standing(comps: String): Map[Long, Long] =
    ManifestTable.read(spark, comps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed fold equals from-scratch CC over all streamed edges") {
    val root = tempDir("graft-ccstream")
    batches.indices.foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/comps", root + "/ckpt")

    val expect = ConnectedComponents.labels(
      batches.flatten.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(standing(root + "/comps") == expect)
    // and the braid really merged: node 4 (untouched by batch 2) reads 1
    assert(standing(root + "/comps")(4L) == 1L)
  }

  test("replaying all batches against the folded table is a no-op") {
    val root = tempDir("graft-ccstream2")
    batches.indices.foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/comps", root + "/ckpt")
    val before = standing(root + "/comps")
    run(root + "/src", root + "/comps", root + "/ckpt2") // fresh checkpoint = full replay
    assert(standing(root + "/comps") == before)
  }

  // ---- componentStreamWithForgets (grow + forget in one stream) ----

  // mixed event batches: kind 'edge' carries (a,b), 'forget' carries the
  // node in a. Batch 1 grows a chain 1-2-3-4-5 and a pair {10,11};
  // batch 2 forgets bridge 3 (splits the chain) and adds (20,21);
  // batch 3 adds an edge touching forgotten 3 (must be REJECTED) and
  // forgets 10; batch 4 forgets an unknown node (harmless) and re-links
  // 5 to 20.
  private val mixed: Seq[Seq[(String, Long, java.lang.Long)]] = Seq(
    Seq(("edge", 1L, 2L), ("edge", 2L, 3L), ("edge", 3L, 4L),
      ("edge", 4L, 5L), ("edge", 10L, 11L)),
    Seq(("forget", 3L, null), ("edge", 20L, 21L)),
    Seq(("edge", 3L, 5L), ("forget", 10L, null)),
    Seq(("forget", 999L, null), ("edge", 5L, 20L)))

  private def writeMixed(dir: String, b: Int): Unit = {
    val f = new java.io.File(dir, f"batch$b%03d.parquet")
    mixed(b).toDF("kind", "doc_a", "doc_b").coalesce(1)
      .write.mode("overwrite").parquet(f.toString)
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }

  private def runForgets(root: String, ckpt: String, maxFiles: Int = 64,
      maxTombBytes: Long = 8L << 20): Unit = {
    val events = spark.readStream
      .schema("kind STRING, doc_a LONG, doc_b LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.componentStreamWithForgets(events, root + "/comps",
      root + "/edges", root + "/tombs", root + s"/$ckpt",
      maxEdgeFiles = maxFiles, maxTombBroadcastBytes = maxTombBytes)
  }

  // survivors-only truth: 3, 10 forgotten; (3,5) rejected at arrival
  private val forgetTruth = Map(
    1L -> 1L, 2L -> 1L,           // cut off by the bridge deletion
    4L -> 4L, 5L -> 4L,           // reconnected to 20-21 by batch 4...
    11L -> 11L,                   // partner forgotten -> singleton
    20L -> 4L, 21L -> 4L)         // ...so {4,5,20,21} share min-id 4

  test("grow+forget stream: bridge split, rejected resurrection, singleton leftover") {
    val root = tempDir("graft-ccforget")
    mixed.indices.foreach(b => writeMixed(root + "/src", b))
    runForgets(root, "ckpt")
    assert(standing(root + "/comps") == forgetTruth)
    // the rejected edge never entered the log
    val log = spark.read.parquet(root + "/edges")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!log.contains((3L, 5L)) && !log.contains((5L, 3L)))
  }

  test("full replay of the mixed stream is a no-op") {
    val root = tempDir("graft-ccforget2")
    mixed.indices.foreach(b => writeMixed(root + "/src", b))
    runForgets(root, "ckpt")
    val before = standing(root + "/comps")
    runForgets(root, "ckpt2") // fresh checkpoint = full replay
    assert(standing(root + "/comps") == before)
  }

  test("tombstone gate degraded to the shuffle path gives identical verdicts") {
    // maxTombBroadcastBytes = 0 forces the size gate PAST the broadcast
    // bound from the first tombstone on (the r11 verdict item 8 path:
    // cumulative forgets outgrown broadcast size, joins degrade to
    // shuffles of the batch) — every verdict, including the rejected
    // resurrection that only the gate enforces, must be unchanged
    val root = tempDir("graft-ccforget-shuf")
    mixed.indices.foreach(b => writeMixed(root + "/src", b))
    runForgets(root, "ckpt", maxTombBytes = 0L)
    assert(standing(root + "/comps") == forgetTruth)
    val log = spark.read.parquet(root + "/edges")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!log.contains((3L, 5L)) && !log.contains((5L, 3L)))
  }

  test("mid-stream edge-log compaction is invisible to the verdicts") {
    val root = tempDir("graft-ccforget3")
    mixed.indices.foreach(b => writeMixed(root + "/src", b))
    runForgets(root, "ckpt", maxFiles = 1) // compaction fires every batch
    assert(standing(root + "/comps") == forgetTruth)
    // compaction physically dropped every tombstone-adjacent edge
    val log = spark.read.parquet(root + "/edges")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(log.forall { case (a, b) => !Set(3L, 10L)(a) && !Set(3L, 10L)(b) },
      s"stale edges survived compaction: $log")
  }
}
