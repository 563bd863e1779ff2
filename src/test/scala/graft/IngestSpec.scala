package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Ingest

/** FIXTURES.md §B.8 watermark defaulting + the append/compact
  * (ReplacingMergeTree) write path end-to-end on a temp table.
  */
class IngestSpec extends SparkSuite {
  import spark.implicits._

  test("nextRange: empty sink → origin; caught-up → None; else max+1..head-1") {
    assert(Ingest.nextRange(None, 1000500) ==
      Some(Ingest.BlockRange(1000000, 1000499)))
    assert(Ingest.nextRange(Some(1000100L), 1000500) ==
      Some(Ingest.BlockRange(1000101, 1000499)))
    assert(Ingest.nextRange(Some(1000499L), 1000500).isEmpty)
  }

  test("slices: fixed-size batching covers the range exactly") {
    val s = Ingest.slices(Ingest.BlockRange(0, 25), 10)
    assert(s == Seq(Ingest.BlockRange(0, 9), Ingest.BlockRange(10, 19),
      Ingest.BlockRange(20, 25)))
  }

  test("sinkMax reads the watermark scalar") {
    assert(Ingest.sinkMax(Seq(1L, 5L, 3L).toDF("block_number"), "block_number")
      .contains(5L))
    assert(Ingest.sinkMax(Seq.empty[Long].toDF("block_number"), "block_number")
      .isEmpty)
  }

  test("append twice + compact = last write wins on disk") {
    val dir = tempDir("graft-ingest") + "/blocks"
    val batch1 = Seq((1L, "h1-old"), (2L, "h2")).toDF("block_number", "block_hash")
    val batch2 = Seq((1L, "h1-new"), (3L, "h3")).toDF("block_number", "block_hash")
    Ingest.appendWithSeq(batch1, dir, seq = 1)
    Ingest.appendWithSeq(batch2, dir, seq = 2)
    assert(spark.read.parquet(dir).count() == 4)

    // dedup-on-read view before compaction
    val view = Ingest.latestView(spark.read.parquet(dir), Seq("block_number"))
    assert(view.count() == 3)

    Ingest.compact(spark, dir, Seq("block_number"))
    val got = spark.read.parquet(dir).orderBy("block_number")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "h1-new"), (2L, "h2"), (3L, "h3")))

    // idempotent: compacting again changes nothing
    Ingest.compact(spark, dir, Seq("block_number"))
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("compactPartition rewrites one hive partition, leaves the rest untouched") {
    val dir = tempDir("graft-part") + "/events"
    val day1 = Seq((1L, "a-old", "2024-01-01"), (2L, "b", "2024-01-01"))
      .toDF("event_id", "payload", "day")
    val day1b = Seq((1L, "a-new", "2024-01-01")).toDF("event_id", "payload", "day")
    val day2 = Seq((3L, "c", "2024-01-02"), (3L, "c-dup", "2024-01-02"))
      .toDF("event_id", "payload", "day")
    Ingest.appendPartitioned(day1, dir, 1, Seq("day"))
    Ingest.appendPartitioned(day1b, dir, 2, Seq("day"))
    Ingest.appendPartitioned(day2, dir, 3, Seq("day"))

    Ingest.compactPartition(spark, dir, Seq("event_id"), "day", "2024-01-01")

    val d1 = spark.read.parquet(dir).filter(col("day") === "2024-01-01")
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(d1.toSeq == Seq((1L, "a-new"), (2L, "b")))
    // day2 still has its duplicate — untouched by the scoped compaction
    assert(spark.read.parquet(dir).filter(col("day") === "2024-01-02").count() == 2)
  }

  test("hive-partitioned appends partition-prune time-range reads") {
    val dir = tempDir("graft-prune") + "/events"
    val rows = (1 to 100).map(i => (i.toLong, s"p$i", f"2024-01-${i % 4 + 1}%02d"))
      .toDF("event_id", "payload", "day")
    Ingest.appendPartitioned(rows, dir, 1, Seq("day"))

    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // the partition predicate must reach the file index, not a post-scan filter
    assert(scan.partitionFilters.nonEmpty, "no partition filters on the scan")
    // one of the four day= partition directories survives pruning
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size == 1,
      "scan did not prune to a single partition")
    assert(q.count() == 25)
  }

  test("appendSorted clusters rows within each output file (row-group skipping layout)") {
    val dir = tempDir("graft-sorted") + "/blocks"
    val scrambled = new scala.util.Random(3).shuffle((1L to 2000L).toList)
      .map(i => (i, s"h$i")).toDF("block_number", "block_hash").repartition(2)
    Ingest.appendSorted(scrambled, dir, 1, Seq("block_number"))
    val byFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("block_number"))
      .collect().groupBy(_.getString(0))
    assert(byFile.size >= 2)
    byFile.values.foreach { rows =>
      val v = rows.map(_.getLong(1))
      assert(v.sameElements(v.sorted), "rows not clustered within file")
    }
    assert(spark.read.parquet(dir).count() == 2000)
  }

  test("schema evolution: later batches may add columns; mergeSchema surfaces them") {
    val dir = tempDir("graft-evolve") + "/blocks"
    Ingest.appendWithSeq(Seq((1L, "h1")).toDF("block_number", "block_hash"), dir, 1)
    // the auto-DDL reference derives schema from whatever arrives
    // (clickhouse.py:13-48); parquet-side, new columns appear via mergeSchema
    Ingest.appendWithSeq(
      Seq((2L, "h2", 99L)).toDF("block_number", "block_hash", "gas_used"), dir, 2)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("gas_used"))
    val byBlock = merged.orderBy("block_number").collect()
    assert(byBlock(0).isNullAt(byBlock(0).fieldIndex("gas_used"))) // old rows null-fill
    assert(byBlock(1).getLong(byBlock(1).fieldIndex("gas_used")) == 99L)
  }

  test("publishReport overwrites (truncate-and-replace K-3)") {
    val dir = tempDir("graft-report") + "/report"
    Ingest.publishReport(Seq(("A/B", 10.0)).toDF("pair", "vol"), dir)
    Ingest.publishReport(Seq(("C/D", 20.0), ("E/F", 30.0)).toDF("pair", "vol"), dir)
    assert(spark.read.parquet(dir).count() == 2)
  }
}
