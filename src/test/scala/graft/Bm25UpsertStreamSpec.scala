package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextRank
import graft.streaming.StreamingIngest

/** Doc-update/retraction regime for the standing BM25 index (round-12,
  * the r11 verdict item 2): retrieval off the resolved index equals
  * batch x54 over the LATEST VERSION of every doc — updated docs do not
  * double-count df/tf, a null-text re-arrival deletes the doc, and
  * compaction/replay are invisible.
  */
class Bm25UpsertStreamSpec extends SparkSuite {

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .localCheckpoint(false)

  // the x117 update script: h4==1 re-arrives DOUBLED in wave 1;
  // h4==3 gets an intermediate update in wave 1 then REVERTS to the
  // original in wave 2 (two updates — the intermediate version must be
  // fully retracted); h4==2 re-arrives null-text in wave 2 (deletion)
  private lazy val h4docs = docs.withColumn("h4",
      pmod(graft.ext.TextDedup.portableHashBuiltin(col("doc_id").cast("string"), ""), lit(4L)))
    .localCheckpoint(false)

  private def doubled(d: DataFrame): DataFrame =
    d.withColumn("text", concat(col("text"), lit(" "), col("text")))

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

  // latest-version corpus in closed form: h4==1 doubled, h4==2 deleted,
  // h4==0/3 original
  private lazy val latestCorpus =
    doubled(h4docs.filter(col("h4") === 1))
      .unionByName(h4docs.filter(col("h4") === 0 || col("h4") === 3))
      .drop("h4").localCheckpoint(false)

  private def run(root: String, ckpt: String): Unit = {
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.bm25IndexUpsertStream(stream, root + "/postings",
      root + "/versions", root + s"/$ckpt")
  }

  private def retrieve(tf0: DataFrame): Set[(Long, Int, Long, String)] = {
    val tf = tf0.localCheckpoint(false)
    TextRank.bm25(tf, TextRank.midFrequencyQueries(tf, postingsOpt = Some(tf)),
        postingsOpt = Some(tf),
        statsOpt = Some(TextRank.statsFromPostings(tf)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSet
  }

  private def resolved(root: String): DataFrame =
    StreamingIngest.resolvedPostings(spark, root + "/postings", root + "/versions")

  test("retrieval off the resolved index equals batch BM25 over latest versions (update, double-update, delete)") {
    val root = tempDir("graft-bm25ups")
    waves(root)
    run(root, "ckpt")
    assert(retrieve(resolved(root)) == retrieve(TextRank.postings(latestCorpus)),
      "resolved-index retrieval != batch BM25 over the latest-version corpus")
    // the deletion really is total: h4==2 docs leave no LIVE posting row
    val live = resolved(root).join(
      h4docs.filter(col("h4") === 2).select(col("doc_id")), Seq("doc_id"), "left_semi")
    assert(live.count() == 0, "null-text re-arrival left live postings")
    // stats describe the live corpus: n_docs drops by the deleted count
    val nDocs = TextRank.statsFromPostings(resolved(root)).head().getLong(0)
    assert(nDocs == latestCorpus.count(), s"n_docs $nDocs != latest corpus ${latestCorpus.count()}")
  }

  test("replaying landed batches is a no-op on the resolved index") {
    val root = tempDir("graft-bm25ups2")
    waves(root)
    run(root, "ckpt")
    val before = retrieve(resolved(root))
    val rawBefore = spark.read.parquet(root + "/postings").count()
    run(root, "ckpt2") // fresh checkpoint = full replay with original batchIds
    assert(spark.read.parquet(root + "/postings").count() == rawBefore,
      "replay re-appended postings")
    assert(retrieve(resolved(root)) == before)
  }

  test("compaction physically drops superseded postings and is invisible to retrieval") {
    val root = tempDir("graft-bm25ups3")
    waves(root)
    // maxPostingFiles = 1 fires compaction every batch
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.bm25IndexUpsertStream(stream, root + "/postings",
      root + "/versions", root + "/ckpt", maxPostingFiles = 1)
    assert(retrieve(resolved(root)) == retrieve(TextRank.postings(latestCorpus)),
      "per-batch compaction changed retrieval")
    // after the final compaction the RAW postings log holds only live
    // rows: the wave-1 intermediate version of every h4==3 doc is gone
    val raw = spark.read.parquet(root + "/postings")
    val stale = raw.groupBy(col("doc_id")).agg(countDistinct(col("ingest_seq")).as("nv"))
      .filter(col("nv") > 1)
    assert(stale.count() == 0, "superseded versions survived compaction")
  }

  test("a batch violating the one-version-per-id contract resolves deterministically") {
    import spark.implicits._
    val root = tempDir("graft-bm25ups4")
    val dup = Seq(
      (1L, "alpha beta", "en", "s", 0L),
      (1L, "gamma delta", "en", "s", 0L),
      (2L, "alpha alpha", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeWaveTo(root + "/src", 0, dup)
    run(root, "ckpt")
    val a = resolved(root).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // doc 1 kept exactly one version
    assert(a.count(_._1 == 1L) > 0 &&
      !(a.exists(t => t._1 == 1L && t._2 == "alpha") && a.exists(t => t._1 == 1L && t._2 == "gamma")),
      s"both intra-batch versions survived: $a")
    // and a full re-run over the same files picks the SAME version
    val root2 = tempDir("graft-bm25ups5")
    writeWaveTo(root2 + "/src", 0, dup)
    run(root2, "ckpt")
    val b = resolved(root2).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b, "intra-batch duplicate resolution is not deterministic")
  }
}
