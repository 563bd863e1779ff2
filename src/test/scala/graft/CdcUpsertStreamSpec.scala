package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextDedup
import graft.streaming.StreamingIngest

/** Doc retraction for the standing CDC chunk-hash index (round-13, the
  * r12 verdict item 2) — the family where the version-log idiom needs
  * DOC ATTRIBUTION because chunk hashes are SHARED across docs: probing
  * the resolved index equals batch `cdcIncrementalAgainstIndex` over the
  * latest-version corpus, an updated doc's exclusive chunks leave the
  * index while shared chunks survive through their other owner, and
  * compaction/replay are invisible.
  */
class CdcUpsertStreamSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))
    .localCheckpoint(false)

  // the x123 update script over the real corpus: h4==1 re-arrives with
  // every 'e' replaced (content changes throughout — CDC's
  // shift-invariance makes doubling/prefixing hash-invisible here);
  // h4==3 updates then reverts; h4==2 re-arrives null-text (deletion)
  private lazy val h4docs = docs.withColumn("h4",
      pmod(graft.ext.TextDedup.portableHashBuiltin(col("doc_id").cast("string"), ""), lit(4L)))
    .localCheckpoint(false)

  private def waves(root: String): Unit = {
    writeWaveTo(root + "/src", 0, h4docs.drop("h4"))
    writeWaveTo(root + "/src", 1,
      h4docs.filter(col("h4") === 1)
        .withColumn("text", translate(col("text"), "e", "#")).drop("h4")
        .unionByName(h4docs.filter(col("h4") === 3)
          .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4")))
    writeWaveTo(root + "/src", 2,
      h4docs.filter(col("h4") === 2)
        .withColumn("text", lit(null).cast("string")).drop("h4")
        .unionByName(h4docs.filter(col("h4") === 3).drop("h4")))
  }

  // latest-version corpus in closed form
  private lazy val latestCorpus =
    h4docs.filter(col("h4") === 1)
      .withColumn("text", translate(col("text"), "e", "#"))
      .unionByName(h4docs.filter(col("h4") === 0 || col("h4") === 3))
      .drop("h4").localCheckpoint(false)

  // a small probe batch: shifted copies of corpus content (the CDC
  // shape) — content-defined chunks of the embedded text still hit
  private lazy val probe = docs.filter(col("doc_id") < 40)
    .select((col("doc_id") + 100000L).as("doc_id"),
      concat(lit("prefix shift "), col("text")).as("text"))
    .localCheckpoint(false)

  private def run(root: String, ckpt: String, maxChunkFiles: Int = 64): Unit = {
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.cdcIndexUpsertStream(stream, root + "/chunks",
      root + "/versions", root + s"/$ckpt", maxChunkFiles = maxChunkFiles)
  }

  private def probeStats(index: DataFrame): Set[(Long, Long, Long, Long)] =
    TextDedup.cdcIncrementalAgainstIndex(index,
        TextDedup.cdcChunksFast(probe))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def resolved(root: String): DataFrame =
    StreamingIngest.resolvedChunks(spark, root + "/chunks", root + "/versions")

  test("probing the resolved index equals batch cdcIncremental over the latest-version corpus (update, double-update, delete)") {
    val root = tempDir("graft-cdcups")
    waves(root)
    run(root, "ckpt")
    assert(probeStats(resolved(root)) ==
      probeStats(TextDedup.cdcChunksFast(latestCorpus)),
      "resolved-index probe != batch CDC probe over the latest-version corpus")
    // the deletion is total: h4==2 docs leave no LIVE chunk row
    val live = resolved(root).join(
      h4docs.filter(col("h4") === 2).select(col("doc_id")), Seq("doc_id"), "left_semi")
    assert(live.count() == 0, "null-text re-arrival left live chunk rows")
  }

  test("doc attribution: an updated doc's EXCLUSIVE chunks leave the index, chunks SHARED with a live doc survive, and retracting the LAST owner removes them") {
    // exact-identity texts throughout — chunk boundaries are
    // content-defined, so only identical documents are guaranteed to
    // share their full chunk sets (a substring's tail chunk can merge
    // differently inside a longer host doc)
    val s1 = "shared content block that chunks identically in both owners"
    val y1 = "yellow unique content that only the retracted doc carries!"
    val z1 = "zebra replacement body with entirely different characters."
    val root = tempDir("graft-cdcups2")
    // docs 1 and 2 are identical (shared chunks, two owners); doc 3 owns
    // y1 exclusively
    writeWaveTo(root + "/src", 0,
      Seq((1L, s1), (2L, s1), (3L, y1)).toDF("doc_id", "text"))
    // doc 1 and doc 3 re-arrive replaced: doc 3's exclusive chunks must
    // leave; s1's chunks survive through doc 2's live rows
    writeWaveTo(root + "/src", 1,
      Seq((1L, z1), (3L, z1)).toDF("doc_id", "text"))
    run(root, "ckpt")
    val probes = Seq((10L, s1), (11L, y1), (12L, z1)).toDF("doc_id", "text")
    def hitsOf(): Map[Long, (Long, Long)] =
      TextDedup.cdcIncrementalAgainstIndex(resolved(root),
          TextDedup.cdcChunksFast(probes))
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
    val hits = hitsOf()
    assert(hits(10L)._1 == hits(10L)._2,
      s"shared chunks must survive a co-owner's update: $hits")
    assert(hits(11L)._1 == 0L,
      s"the updated doc's exclusive chunks must leave the index: $hits")
    assert(hits(12L)._1 == hits(12L)._2,
      s"the replacement content must be fully indexed: $hits")
    // deleting doc 2 removes s1's LAST live owner: its chunks must leave
    writeWaveTo(root + "/src", 2,
      Seq((2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    run(root, "ckpt")
    val hits2 = hitsOf()
    assert(hits2(10L)._1 == 0L,
      s"retracting the last owner must remove the shared chunks: $hits2")
    assert(hits2(12L)._1 == hits2(12L)._2,
      s"doc 1/3's live content must be unaffected by doc 2's deletion: $hits2")
  }

  test("replaying landed batches is a no-op; per-batch compaction drops superseded rows and is invisible to probes") {
    val root = tempDir("graft-cdcups4")
    waves(root)
    run(root, "ckpt", maxChunkFiles = 1) // fires compaction every batch
    val before = probeStats(resolved(root))
    assert(before == probeStats(TextDedup.cdcChunksFast(latestCorpus)),
      "per-batch compaction changed probe stats")
    val rawBefore = spark.read.parquet(root + "/chunks").count()
    run(root, "ckpt2") // fresh checkpoint = full replay with original batchIds
    assert(spark.read.parquet(root + "/chunks").count() == rawBefore,
      "replay re-appended chunk rows")
    assert(probeStats(resolved(root)) == before)
    val stale = spark.read.parquet(root + "/chunks")
      .groupBy(col("doc_id")).agg(countDistinct(col("ingest_seq")).as("nv"))
      .filter(col("nv") > 1)
    assert(stale.count() == 0, "superseded versions survived compaction")
  }
}
