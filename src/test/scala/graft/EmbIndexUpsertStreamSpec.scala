package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.streaming.StreamingIngest

/** Doc-update/retraction regime for the standing embedding-LSH vector
  * index (round-13, the r12 verdict item 1): dedup verdicts probed off
  * the resolved index equal batch verdicts over the LATEST VERSION of
  * every vector — a re-embedded doc's stale vector stops matching, a
  * null-embedding re-arrival deletes the doc from the index, and
  * compaction/replay are invisible. Completes the versioned-index
  * coverage: postings (Bm25UpsertStreamSpec), bands
  * (BandIndexUpsertStreamSpec), vectors (here), chunks
  * (CdcUpsertStreamSpec).
  */
class EmbIndexUpsertStreamSpec extends SparkSuite {

  private lazy val base = graft.sources.Tables.embeddings(spark, sf)
    .withColumn("h4", pmod(graft.ext.TextDedup.portableHashBuiltin(
      col("vec_id").cast("string"), ""), lit(4L)))
    .select(col("vec_id"), col("embedding"), col("h4"))
    .localCheckpoint(false)

  private def neg = transform(col("embedding"), x => -x)

  private def w(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"))

  // the x122 update script: h4==1 re-arrives NEGATED in wave 1 (its
  // bucket flips to the complement — the stale original must stop
  // matching); h4==3 takes an intermediate negated update then REVERTS
  // in wave 2; h4==2 re-arrives null-embedding in wave 2 (deletion)
  private def waves(root: String): Unit = {
    writeWaveTo(root + "/src", 0, w(base))
    writeWaveTo(root + "/src", 1,
      w(base.filter(col("h4") === 1).withColumn("embedding", neg))
        .unionByName(w(base.filter(col("h4") === 3).withColumn("embedding", neg))))
    writeWaveTo(root + "/src", 2,
      w(base.filter(col("h4") === 2)
          .withColumn("embedding", lit(null).cast("array<float>")))
        .unionByName(w(base.filter(col("h4") === 3))))
  }

  // latest-version index in closed form: h4==1 negated, h4==2 deleted,
  // h4==0/3 original
  private lazy val latestIndex = w(base.filter(col("h4") === 1)
      .withColumn("embedding", neg))
    .unionByName(w(base.filter(col("h4") === 0 || col("h4") === 3)))
    .select(col("vec_id"), Similarity.lshBucket(col("embedding")).as("bucket"),
      col("embedding"))
    .localCheckpoint(false)

  // probes: every original vector at +1e6 and every negated vector at
  // +2e6 — each matches (cos 1.0) exactly the live version of its doc
  private lazy val probes = base
    .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    .unionByName(base.select((col("vec_id") + 2000000L).as("vec_id"),
      neg.as("embedding")))
    .localCheckpoint(false)

  private def run(root: String, ckpt: String, maxVecFiles: Int = 64): Unit = {
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.embIndexUpsertStream(stream, root + "/vecs",
      root + "/versions", root + s"/$ckpt", maxVecFiles = maxVecFiles)
  }

  private def resolved(root: String): DataFrame =
    StreamingIngest.resolvedVectors(spark, root + "/vecs", root + "/versions")

  private def verdicts(index: DataFrame): Set[(Long, Int)] =
    Similarity.embeddingDedupVerdicts(index, probes, 0.9)
      .select(col("vec_id"), col("keep"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("verdicts off the resolved index equal batch verdicts over latest versions (update, double-update, delete)") {
    val root = tempDir("graft-embups")
    waves(root)
    run(root, "ckpt")
    val got = verdicts(resolved(root))
    assert(got == verdicts(latestIndex),
      "resolved-index verdicts != batch verdicts over the latest-version index")
    // the deletion really is total: h4==2 docs leave no LIVE vector row
    val live = resolved(root).join(
      base.filter(col("h4") === 2).select(col("vec_id")), Seq("vec_id"), "left_semi")
    assert(live.count() == 0, "null-embedding re-arrival left live vectors")
    assert(resolved(root).count() == latestIndex.count())
    // and the update is VISIBLE: an original probe of an h4==1 doc keeps
    // (its stale vector is retracted), its negated probe does not
    val h1 = base.filter(col("h4") === 1).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(h1.nonEmpty)
    val keepOf = got.toMap
    assert(h1.forall(id => keepOf(id + 1000000L) == 1),
      "a stale pre-update vector still matched its own original probe")
    assert(h1.forall(id => keepOf(id + 2000000L) == 0),
      "the live updated vector failed to match its own probe")
  }

  test("replaying landed batches is a no-op on the resolved index") {
    val root = tempDir("graft-embups2")
    waves(root)
    run(root, "ckpt")
    val before = verdicts(resolved(root))
    val rawBefore = spark.read.parquet(root + "/vecs").count()
    run(root, "ckpt2") // fresh checkpoint = full replay with original batchIds
    assert(spark.read.parquet(root + "/vecs").count() == rawBefore,
      "replay re-appended vectors")
    assert(verdicts(resolved(root)) == before)
  }

  test("compaction physically drops superseded vectors and is invisible to verdicts") {
    val root = tempDir("graft-embups3")
    waves(root)
    run(root, "ckpt", maxVecFiles = 1) // fires compaction every batch
    assert(verdicts(resolved(root)) == verdicts(latestIndex),
      "per-batch compaction changed verdicts")
    val raw = spark.read.parquet(root + "/vecs")
    val stale = raw.groupBy(col("vec_id")).agg(countDistinct(col("ingest_seq")).as("nv"))
      .filter(col("nv") > 1)
    assert(stale.count() == 0, "superseded versions survived compaction")
  }

  test("a fragmented VERSION log alone triggers the joint compaction (round-12 ADVICE: deletion-heavy workloads fragment only the version log)") {
    import spark.implicits._
    val root = tempDir("graft-embups4")
    // hand-fragment: one data file, many version-log files (the
    // deletion-heavy shape — every batch advances versions, derives ~0 rows)
    val d0 = Seq((1L, 7, Seq(1.0f)), (2L, 9, Seq(1.0f)))
      .toDF("vec_id", "bucket", "embedding")
    graft.pipeline.Ingest.appendWithSeq(d0, root + "/vecs", 0L)
    graft.pipeline.Ingest.appendWithSeq(
      Seq((1L, 7, Seq(2.0f))).toDF("vec_id", "bucket", "embedding"),
      root + "/vecs", 5L)
    (0L until 6L).foreach(b => graft.pipeline.Ingest.appendWithSeq(
      Seq(1L, 2L).toDF("vec_id"), root + "/versions", b))
    assert(StreamingIngest.cdcIndexFileCount(spark, root + "/versions") > 4)
    val did = StreamingIngest.maybeCompactVersioned(
      spark, root + "/vecs", root + "/versions", maxFiles = 4, idCol = "vec_id")
    assert(did, "version-log fragmentation must trigger compaction")
    val vc = spark.read.parquet(root + "/versions")
    assert(vc.count() == 2, "version log must shrink to one max-seq row per id")
    assert(vc.agg(min(col("ingest_seq"))).head().getLong(0) == 5L)
    // resolution unchanged by the rewrite: id 1's seq-5 row is the only
    // live version (id 2's seq-0 row is superseded by version seq 5 and
    // physically dropped)
    val live = StreamingIngest.resolvedVectors(spark, root + "/vecs",
      root + "/versions").collect()
    assert(live.map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.read.parquet(root + "/vecs").count() == 1,
      "the joint rewrite must drop superseded data rows")
  }
}
