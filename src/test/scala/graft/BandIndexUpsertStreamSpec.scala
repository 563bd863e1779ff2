package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextDedup
import graft.streaming.StreamingIngest

/** Doc update/retraction for the standing MinHash band index (round-12,
  * the x117 regime applied to the dedup family): the resolved index
  * equals signatureBands over the LATEST VERSION of every doc — stale
  * versions' bands stop matching, an unshingleable re-arrival retracts
  * the doc, and compaction/replay are invisible.
  */
class BandIndexUpsertStreamSpec extends SparkSuite {

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .localCheckpoint(false)

  private lazy val h4docs = docs.withColumn("h4",
      pmod(TextDedup.portableHashBuiltin(col("doc_id").cast("string"), ""), lit(4L)))
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

  // latest-version corpus: h4==1 doubled, h4==2 deleted, h4==0/3 original
  private lazy val latestCorpus =
    doubled(h4docs.filter(col("h4") === 1))
      .unionByName(h4docs.filter(col("h4") === 0 || col("h4") === 3))
      .drop("h4").localCheckpoint(false)

  private def run(root: String, ckpt: String, maxFiles: Int = 64): Unit = {
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.bandIndexUpsertStream(stream, root + "/bands",
      root + "/versions", root + s"/$ckpt", maxBandFiles = maxFiles)
  }

  private def bandSet(df: DataFrame): Set[(Int, Long, Long, Seq[Long])] =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getSeq[Long](3))).toSet

  private def resolved(root: String): DataFrame =
    StreamingIngest.resolvedBands(spark, root + "/bands", root + "/versions")

  test("resolved bands equal signatureBands over latest versions (update, double-update, retract)") {
    val root = tempDir("graft-bandups")
    waves(root)
    run(root, "ckpt")
    assert(bandSet(resolved(root)) ==
      bandSet(TextDedup.signatureBands(TextDedup.minhashSignatures(latestCorpus))),
      "resolved band index != bands of the latest-version corpus")
    // retraction is total: h4==2 docs leave no LIVE band row
    val live2 = resolved(root).join(
      h4docs.filter(col("h4") === 2).select(col("doc_id")), Seq("doc_id"), "left_semi")
    assert(live2.count() == 0, "null-text re-arrival left live bands")
  }

  test("replay is a no-op and per-batch compaction drops superseded bands without changing the live set") {
    val root = tempDir("graft-bandups2")
    waves(root)
    run(root, "ckpt", maxFiles = 1) // compaction fires every batch
    val live = bandSet(resolved(root))
    assert(live == bandSet(TextDedup.signatureBands(TextDedup.minhashSignatures(latestCorpus))))
    // superseded versions physically gone after the final compaction
    val stale = spark.read.parquet(root + "/bands")
      .groupBy(col("doc_id")).agg(countDistinct(col("ingest_seq")).as("nv"))
      .filter(col("nv") > 1)
    assert(stale.count() == 0, "superseded versions survived compaction")
    val rawBefore = spark.read.parquet(root + "/bands").count()
    run(root, "ckpt2", maxFiles = 1) // fresh checkpoint = full replay
    assert(bandSet(resolved(root)) == live, "replay changed the live band set")
    assert(spark.read.parquet(root + "/bands").count() == rawBefore ||
      bandSet(resolved(root)) == live) // raw log may re-absorb then re-compact; live set is the contract
  }
}
