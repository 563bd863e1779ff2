package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Incremental view maintenance for additive rollups (round-13, x139):
  * the maintained GROUP BY view stays bit-equal to the batch rollup
  * over the live corpus under update/deletion, fully-retracted groups
  * disappear, replay is a no-op, and compaction preserves the fold.
  */
class IvmRollupSpec extends SparkSuite {

  private val groups = Seq("source", "lang")
  private def measures = Seq(
    "n_tokens" -> size(split(col("text"), " ")).cast("long"),
    "n_chars" -> length(col("text")).cast("long"))

  private def mk(rows: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "lang", "text")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  private def run(root: String, ckpt: String = "ckpt"): Unit = {
    val stream = spark.readStream
      .schema(mk(Seq((0L, "s", "l", "t"))).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.ivmRollupStream(stream, root + "/docs",
      root + "/versions", root + "/rollup", root + s"/$ckpt",
      groups, measures)
    ()
  }

  private def view(root: String): Set[(String, String, Long, Long, Long)] =
    StreamingIngest.resolvedRollup(spark, root + "/rollup", groups)
      .select(col("source"), col("lang"), col("n_rows"),
        col("n_tokens"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  private def batchView(live: DataFrame): Set[(String, String, Long, Long, Long)] =
    live.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  // wave 0: two groups; wave 1: doc 1 updated (longer text), doc 3
  // moves content; wave 2: group g2 FULLY deleted + doc 1 deleted
  private def waves(root: String): Unit = {
    writeWaveTo(root + "/src", 0, mk(Seq(
      (1L, "g1", "en", "one one"), (2L, "g1", "en", "two"),
      (3L, "g2", "de", "drei drei drei"))))
    writeWaveTo(root + "/src", 1, mk(Seq(
      (1L, "g1", "en", "one one longer now"),
      (3L, "g2", "de", "vier"))))
    writeWaveTo(root + "/src", 2,
      mk(Seq((3L, "g2", "de", "x"), (1L, "g1", "en", "x")))
        .withColumn("text", lit(null).cast("string")))
  }

  private def liveCorpus: DataFrame =
    mk(Seq((2L, "g1", "en", "two")))

  test("the maintained view equals the batch rollup over the live corpus; a fully-retracted group disappears") {
    val root = tempDir("graft-ivm")
    waves(root)
    run(root)
    assert(view(root) == batchView(liveCorpus),
      "maintained rollup != batch rollup over the live corpus")
    assert(!view(root).exists(_._1 == "g2"),
      "the fully-deleted group must disappear from the view")
  }

  test("full-log replay before compaction is a no-op; compaction preserves the view and drops retracted groups") {
    val root = tempDir("graft-ivm2")
    waves(root)
    run(root)
    val before = view(root)
    run(root, "ckpt2") // fresh checkpoint: all batches replay against landed logs
    assert(view(root) == before, "replay changed the maintained view")
    assert(StreamingIngest.maybeCompactRollup(spark, root + "/rollup", groups, 0),
      "forced rollup compaction did not run")
    assert(view(root) == before, "compaction changed the maintained view")
    val raw = spark.read.parquet(root + "/rollup")
    assert(raw.count() == before.size,
      s"compaction must keep one row per live group, got ${raw.count()}")
  }

  test("compaction with every group fully retracted keeps a max-seq sentinel row; a later re-add lands once and reads back correctly") {
    val root = tempDir("graft-ivm3")
    // wave 0 adds two docs in one group; wave 1 deletes both -> every
    // group nets to n_rows 0.
    writeWaveTo(root + "/src", 0, mk(Seq(
      (1L, "g1", "en", "one one"), (2L, "g1", "en", "two"))))
    writeWaveTo(root + "/src", 1,
      mk(Seq((1L, "g1", "en", "x"), (2L, "g1", "en", "x")))
        .withColumn("text", lit(null).cast("string")))
    run(root)
    val preMaxSeq = spark.read.parquet(root + "/rollup")
      .agg(max(col("ingest_seq"))).head().getLong(0)
    assert(StreamingIngest.maybeCompactRollup(spark, root + "/rollup", groups, 0),
      "forced rollup compaction did not run")
    val raw = spark.read.parquet(root + "/rollup")
    // The ADVICE boundary: the rewrite must NOT leave an empty log —
    // the landed-seq replay guard reads the max stamp from it.
    assert(raw.count() == 1L,
      s"all-retracted compaction must keep exactly one sentinel row, got ${raw.count()}")
    assert(raw.agg(max(col("ingest_seq"))).head().getLong(0) == preMaxSeq,
      "the sentinel must carry the pre-compaction max seq")
    assert(view(root).isEmpty, "the sentinel must be invisible to reads")
    // Continue the SAME checkpoint: the re-add is batch 2, appends once,
    // and the view equals the batch rollup over the one live doc.
    writeWaveTo(root + "/src", 2, mk(Seq((1L, "g1", "en", "one again"))))
    run(root)
    assert(view(root) == batchView(mk(Seq((1L, "g1", "en", "one again")))),
      "re-added doc after all-retracted compaction must surface correctly")
  }

  // ---- the monotone twin (round-14, x142) --------------------------------

  private def runMono(root: String, ckpt: String = "mckpt"): Unit = {
    val stream = spark.readStream
      .schema(mk(Seq((0L, "s", "l", "t"))).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.monotoneRollupStream(stream, root + "/mdocs",
      root + "/mversions", root + "/mview", root + "/mrebuilds",
      root + s"/$ckpt", groups)
    ()
  }

  private def monoView(root: String): Set[(String, String, Long, Long, Long)] =
    StreamingIngest.resolvedMonotoneRollup(spark, root + "/mview")
      .select(col("source"), col("lang"), col("n_rows"),
        col("min_chars"), col("max_chars"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  private def monoBatch(live: DataFrame): Set[(String, String, Long, Long, Long)] =
    live.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        min(length(col("text")).cast("long")).as("min_chars"),
        max(length(col("text")).cast("long")).as("max_chars"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  test("monotone view: insert-only waves fold with zero rebuilds; update and delete waves each pay one rebuild; view equals batch rollup") {
    val root = tempDir("graft-ivm-mono")
    writeWaveTo(root + "/src", 0, mk(Seq(
      (1L, "g1", "en", "aaaa"), (2L, "g1", "en", "bb"), (3L, "g2", "de", "cccccc"))))
    writeWaveTo(root + "/src", 1, mk(Seq((4L, "g1", "en", "dddddddd")))) // insert-only
    writeWaveTo(root + "/src", 2, mk(Seq((2L, "g1", "en", "b"))))        // update (new min)
    writeWaveTo(root + "/src", 3,                                        // delete the g2 doc
      mk(Seq((3L, "g2", "de", "x"))).withColumn("text", lit(null).cast("string")))
    runMono(root)
    assert(StreamingIngest.monotoneRebuildCount(spark, root + "/mrebuilds") == 2L,
      "exactly the update and delete waves must pay the rebuild")
    val live = mk(Seq((1L, "g1", "en", "aaaa"), (2L, "g1", "en", "b"),
      (4L, "g1", "en", "dddddddd")))
    assert(monoView(root) == monoBatch(live),
      "monotone view != batch rollup over the live corpus")
    assert(!monoView(root).exists(_._1 == "g2"),
      "the fully-deleted group must disappear via the rebuild")
  }

  test("monotone view: full-log replay is a no-op (the max-stamp guard) and the rebuild ledger does not grow") {
    val root = tempDir("graft-ivm-mono2")
    writeWaveTo(root + "/src", 0, mk(Seq(
      (1L, "g1", "en", "aaaa"), (2L, "g1", "en", "bb"))))
    writeWaveTo(root + "/src", 1, mk(Seq((1L, "g1", "en", "a")))) // update
    runMono(root)
    val before = monoView(root)
    val rebuildsBefore = StreamingIngest.monotoneRebuildCount(spark, root + "/mrebuilds")
    runMono(root, "mckpt2") // fresh checkpoint: all batches replay
    assert(monoView(root) == before,
      "a replayed fold double-counted into the standing view")
    assert(StreamingIngest.monotoneRebuildCount(spark, root + "/mrebuilds") == rebuildsBefore,
      "replay must not re-append rebuild markers")
  }

  test("monotone view: a rebuild that empties the view keeps a stamp sentinel invisible to reads, and a later re-add lands once") {
    val root = tempDir("graft-ivm-mono3")
    writeWaveTo(root + "/src", 0, mk(Seq((1L, "g1", "en", "aaaa"))))
    writeWaveTo(root + "/src", 1,
      mk(Seq((1L, "g1", "en", "x"))).withColumn("text", lit(null).cast("string")))
    runMono(root)
    assert(monoView(root).isEmpty, "the emptied view must read as empty")
    val raw = spark.read.parquet(root + "/mview")
    assert(raw.count() == 1L && raw.agg(max(col("ingest_seq"))).head().getLong(0) == 1L,
      "the empty view must keep exactly one max-stamp sentinel row")
    writeWaveTo(root + "/src", 2, mk(Seq((1L, "g1", "en", "back"))))
    runMono(root)
    assert(monoView(root) == monoBatch(mk(Seq((1L, "g1", "en", "back")))),
      "a re-added doc after the view emptied must surface exactly once")
  }
}
