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

  test("flat landed marker: appendWithSeq tags files, advances the marker, and a replay scrubs a crashed partial publish (round-16 optimization round)") {
    import org.apache.hadoop.fs.Path
    val dir = tempDir("graft-flatmarker") + "/log"
    val loc = new Path(dir)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Ingest.appendWithSeq(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, seq = 0)
    Ingest.appendWithSeq(Seq((3L, "c")).toDF("k", "v"), dir, seq = 1)
    // marker carries the MAX landed seq; every published file is seq-tagged
    assert(graft.pipeline.Bucketing.landedMarkerSeqAt(fs, loc).contains(1L))
    val files = fs.listStatus(loc).map(_.getPath.getName).filter(_.startsWith("part-"))
    assert(files.nonEmpty && files.forall(n => n.contains("-s0-") || n.contains("-s1-")),
      s"published files must carry their seq tag: ${files.mkString(",")}")
    // markers and staging are invisible to readers
    assert(spark.read.parquet(dir).count() == 3)
    // crashed partial publish of seq 2: a tagged file lands, marker does not
    val donor = fs.listStatus(loc).map(_.getPath)
      .filter(_.getName.contains("-s1-")).head
    val planted = new Path(loc, donor.getName.replace("-s1-", "-s2-"))
    org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs, planted, false,
      spark.sparkContext.hadoopConfiguration)
    assert(spark.read.parquet(dir).count() == 4) // partial rows ARE visible...
    assert(graft.pipeline.Bucketing.landedMarkerSeqAt(fs, loc).contains(1L))
    // ...and the replay scrubs them before re-publishing: exact, not additive
    Ingest.appendWithSeq(Seq((4L, "d"), (5L, "e")).toDF("k", "v"), dir, seq = 2)
    val got = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")),
      s"replay after a partial publish duplicated or lost rows: $got")
    assert(graft.pipeline.Bucketing.landedMarkerSeqAt(fs, loc).contains(2L))
  }

  test("flat landed marker survives lww compaction (round-16 optimization round)") {
    import org.apache.hadoop.fs.Path
    val dir = tempDir("graft-flatmarker2") + "/log"
    val loc = new Path(dir)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Ingest.appendWithSeq(Seq((1L, "old")).toDF("k", "v"), dir, seq = 0)
    Ingest.appendWithSeq(Seq((1L, "new")).toDF("k", "v"), dir, seq = 1)
    Ingest.compact(spark, dir, Seq("k"))
    assert(spark.read.parquet(dir).count() == 1)
    // the compaction folded seq 0's row away entirely; only the preserved
    // marker keeps the guard glob-cheap (and keeps seq 0 reading as landed)
    assert(graft.pipeline.Bucketing.landedMarkerSeqAt(fs, loc).contains(1L),
      "lww compaction dropped the landed marker")
  }

  test("flat landed marker survives the versioned-log swapRewrite compaction (round-16 optimization round)") {
    import org.apache.hadoop.fs.Path
    val root = tempDir("graft-flatmarker3")
    val (data, vers) = (root + "/data", root + "/versions")
    Ingest.appendWithSeq(Seq((1L, "a0")).toDF("doc_id", "payload"), data, seq = 0)
    Ingest.appendWithSeq(Seq(1L).toDF("doc_id"), vers, seq = 0)
    Ingest.appendWithSeq(Seq((1L, "a1")).toDF("doc_id", "payload"), data, seq = 1)
    Ingest.appendWithSeq(Seq(1L).toDF("doc_id"), vers, seq = 1)
    assert(graft.streaming.StreamingIngest.maybeCompactVersioned(
      spark, data, vers, maxFiles = 1))
    val fs = new Path(data).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.pipeline.Bucketing.landedMarkerSeqAt(fs, new Path(data)).contains(1L),
      "versioned compaction dropped the data log's landed marker")
    assert(graft.pipeline.Bucketing.landedMarkerSeqAt(fs, new Path(vers)).contains(1L),
      "versioned compaction dropped the version log's landed marker")
    // and the compacted pair still resolves to the live row
    val live = graft.streaming.StreamingIngest.resolvedDocs(spark, data, vers, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(live == Seq((1L, "a1")))
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
