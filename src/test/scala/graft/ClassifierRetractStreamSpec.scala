package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.LinearModel
import graft.streaming.StreamingIngest

/** The retractable classifier fold (round-13, x134): sufficient
  * statistics SUBTRACT exactly under doc update/deletion — the standing
  * fold stays bit-equal to the batch fit over the latest-version corpus
  * (a/b cells), the guard maxes are conservative (monotone — the x133
  * boundary costing only guard slack here), and the stats log's
  * exactly-once boundary holds through the streaming replay window —
  * and, since round 16's marker-carrying compaction swap, through a
  * full-log replay after compaction too. The old double-count boundary
  * survives only on marker-less logs (pre-round-16 layouts, or a
  * foreign rewrite that dropped the markers), pinned below.
  */
class ClassifierRetractStreamSpec extends SparkSuite {

  private val d = 4

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .localCheckpoint(false)

  private lazy val h4docs = docs.withColumn("h4",
      pmod(graft.ext.TextDedup.portableHashBuiltin(col("doc_id").cast("string"), ""), lit(4L)))
    .localCheckpoint(false)

  // the x102 classifier design — the SAME definition the x134 oracle is
  // generated from, not a spec-local copy (round-13 self-review)
  private def features = graft.queries.ExtensionQueries.classifierFeatures
  private def label = graft.queries.ExtensionQueries.classifierWeakLabel

  private def doubled(f: DataFrame): DataFrame =
    f.withColumn("text", concat(col("text"), lit(" "), col("text")))

  // the x117 update script
  private def waves(root: String): Unit = {
    writeWaveTo(root + "/src", 0, h4docs.drop("h4"))
    writeWaveTo(root + "/src", 1,
      doubled(h4docs.filter(col("h4") === 1)).drop("h4")
        .unionByName(h4docs.filter(col("h4") === 3)
          .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4")))
    writeWaveTo(root + "/src", 2,
      h4docs.filter(col("h4") === 2)
        .withColumn("text", lit(null).cast("string")).drop("h4")
        .unionByName(h4docs.filter(col("h4") === 3).drop("h4")))
  }

  private lazy val latestCorpus =
    doubled(h4docs.filter(col("h4") === 1))
      .unionByName(h4docs.filter(col("h4") === 0 || col("h4") === 3))
      .drop("h4").localCheckpoint(false)

  private def run(root: String, ckpt: String = "ckpt"): Unit = {
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.classifierRetractStream(stream, root + "/docs",
      root + "/versions", root + "/stats", root + s"/$ckpt",
      features, label)
    ()
  }

  private def folded(root: String): org.apache.spark.sql.Row =
    StreamingIngest.classifierStatsFromPartials(spark, root + "/stats", d)
      .na.fill(0L).head()

  private def decisions(root: String): Set[(Long, Int, Int, Int)] =
    StreamingIngest.classifierFromStatsLog(spark, root + "/stats",
        StreamingIngest.resolvedDocs(spark, root + "/docs", root + "/versions"),
        features, label)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet

  private def batchDecisions: Set[(Long, Int, Int, Int)] =
    LinearModel.weakLabelClassifier(latestCorpus, features, label)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet

  private def cells(r: org.apache.spark.sql.Row, prefix: String): Map[String, Long] =
    r.schema.fieldNames.filter(_.startsWith(prefix))
      .map(n => n -> r.getAs[Long](n)).toMap

  test("standing stats equal the batch fit over the latest corpus exactly; guard maxes are conservative") {
    val root = tempDir("graft-clfret")
    waves(root)
    run(root)
    val got = folded(root)
    val want = LinearModel.fitStats(
      LinearModel.featFrame(latestCorpus, features, label, "doc_id"), d).head()
    assert(cells(got, "a") == cells(want, "a"), "Gram cells drifted from the latest-corpus fit")
    assert(cells(got, "b") == cells(want, "b"), "moment cells drifted from the latest-corpus fit")
    // maxes are monotone: historical >= live (strictly greater is possible
    // — h4==3's superseded '+alpha' version had one more token)
    (0 until d).foreach { i =>
      assert(got.getAs[Long](s"m$i") >= want.getAs[Long](s"m$i"),
        s"guard max m$i below the live corpus max — the guard would under-protect")
    }
    assert(decisions(root) == batchDecisions,
      "streamed-fold decisions != batch classifier over the latest corpus")
    // the as-of fold at the max seq IS the full fold (x138's read)
    assert(StreamingIngest.classifierStatsAsOf(spark, root + "/stats", d, 2L)
        .na.fill(0L).head() == got,
      "classifierStatsAsOf at the max seq != the full fold")
  }

  test("full-log replay before compaction is a no-op (landed-seq guards on all three logs)") {
    val root = tempDir("graft-clfret2")
    waves(root)
    run(root)
    val before = folded(root)
    val rowsBefore = spark.read.parquet(root + "/stats").count()
    run(root, "ckpt2") // fresh checkpoint: every batch replays against landed logs
    assert(spark.read.parquet(root + "/stats").count() == rowsBefore,
      "replay re-appended stats deltas")
    assert(folded(root) == before, "replay changed the folded statistics")
  }

  test("stats compaction preserves the fold; markers keep a full-log replay a no-op; marker loss re-opens the old boundary") {
    val root = tempDir("graft-clfret3")
    waves(root)
    run(root)
    val before = folded(root)
    assert(StreamingIngest.maybeCompactStats(spark, root + "/stats", 0),
      "forced stats compaction did not run")
    assert(spark.read.parquet(root + "/stats").count() == 1,
      "compaction left more than the folded row")
    assert(folded(root) == before, "compaction changed the folded statistics")
    assert(decisions(root) == batchDecisions,
      "post-compaction decisions != batch classifier")
    // round-16: landed markers ride the compaction swap, so folded-away
    // seqs still answer "landed" and a fresh-checkpoint full replay
    // skips every append — the pre-marker double-count boundary is
    // CLOSED on marker-carrying logs
    run(root, "ckpt2")
    assert(folded(root) == before,
      "post-compaction replay re-appended despite surviving landed markers")
    // the old boundary lives exactly where the fallback row probe runs:
    // strip the markers (a pre-round-16 layout, or a foreign rewrite
    // that dropped them) and the folded row carries only the MAX seq,
    // so earlier seqs answer "not landed" and their deltas re-append
    // (a0_0 = live row count strictly grows; sums have no read-side
    // resolution to ignore the duplicates)
    val statsPath = new org.apache.hadoop.fs.Path(root + "/stats")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(statsPath, "_graft_landed_*")))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .foreach(s => fs.delete(s.getPath, false))
    run(root, "ckpt3")
    assert(folded(root).getAs[Long]("a0_0") > before.getAs[Long]("a0_0"),
      "expected the marker-less post-compaction replay to double-count (the documented fallback boundary)")
  }
}
