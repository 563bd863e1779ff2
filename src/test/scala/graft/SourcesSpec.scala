package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ingest, TokenBackfill}
import graft.pipeline.Ingest.BlockRange
import graft.sources.SlicedSource

/** Sliced distributed fetch (S-2/S-3 shape) and the entry-point-D token
  * backfill pipeline end-to-end on temp tables.
  */
class SourcesSpec extends SparkSuite {
  import spark.implicits._

  test("blockNumbers: one partition per slice, full coverage, no overlap") {
    val ds = SlicedSource.blockNumbers(spark, BlockRange(100, 125), 10)
    assert(ds.rdd.getNumPartitions == 3)
    val nums = ds.collect().map(_.longValue()).sorted
    assert(nums.toSeq == (100L to 125L))
    // partition i carries exactly slice i (10, 10, 6) — a fetcher must
    // never see more than sliceSize blocks in one call
    val sizes = ds.mapPartitions(it => Iterator(it.size))(
      org.apache.spark.sql.Encoders.scalaInt).collect().toSeq
    assert(sizes == Seq(10, 10, 6))
  }

  test("fetchBlocks runs the fetcher partition-locally and lands a full table") {
    val dir = tempDir("graft-src") + "/blocks"
    SlicedSource.ingestBlocks(spark, BlockRange(1000000, 1000099), 25, dir, seq = 1)
    val got = spark.read.parquet(dir)
    assert(got.count() == 100)
    assert(got.columns.toSet ==
      Set("block_number", "block_hash", "block_timestamp", "ingest_seq"))
    // deterministic fake: same block → same hash on re-ingest
    SlicedSource.ingestBlocks(spark, BlockRange(1000000, 1000099), 25, dir, seq = 2)
    val dedup = Ingest.latestView(spark.read.parquet(dir), Seq("block_number"))
    assert(dedup.count() == 100)
    assert(dedup.select("block_hash").distinct().count() == 100)
  }

  test("token backfill: discover missing keys, enrich with fallback, upsert") {
    val dimPath = tempDir("graft-dim") + "/token"
    // seed dim knows tokens 1,2
    Ingest.appendWithSeq(
      Seq((1L, "One", "ONE", 18), (2L, "Two", "TWO", 6))
        .toDF("token", "name", "symbol", "decimals"), dimPath, seq = 1)
    val facts = Seq((1L, 3L), (2L, 4L), (3L, 1L))
      .toDF("token_0", "token_1")
    // "scrape" details know 3 but not 4
    val details = Seq((3L, "Three", "THREE", 8)).toDF("token", "name", "symbol", "decimals")

    TokenBackfill.run(spark, facts, Seq("token_0", "token_1"), dimPath, details, seq = 2)

    val dim = spark.read.parquet(dimPath).orderBy("token")
      .select("token", "name", "symbol", "decimals")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(dim.toSeq == Seq(
      (1L, "One", "ONE", 18),
      (2L, "Two", "TWO", 6),
      (3L, "Three", "THREE", 8),
      (4L, "No Name", "No Symbol", 0)))

    // idempotent: nothing missing on the second run
    TokenBackfill.run(spark, facts, Seq("token_0", "token_1"), dimPath, details, seq = 3)
    assert(spark.read.parquet(dimPath).count() == 4)
  }
}
