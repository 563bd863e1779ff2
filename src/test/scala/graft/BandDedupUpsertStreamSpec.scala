package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextDedup
import graft.streaming.StreamingIngest

/** The fused continuous-dedup loop over the retractable band index
  * (round-13, x125): per-wave verdicts equal batch verdicts against the
  * closed-form live index of prior waves, a doc's own previous version
  * never convicts it, retraction exonerates future arrivals, and
  * replay/compaction are invisible to the verdict log.
  */
class BandDedupUpsertStreamSpec extends SparkSuite {
  import spark.implicits._

  private val tA = "the quick brown fox jumps over the lazy dog today"
  private val tB = "completely different content about spark streaming and standing indexes"

  private def run(root: String, ckpt: String, maxBandFiles: Int = 64): Unit = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.bandIndexUpsertDedupStream(stream, root + "/bands",
      root + "/versions", root + "/verdicts", root + s"/$ckpt",
      maxBandFiles = maxBandFiles)
  }

  private def verdicts(root: String): Set[(Long, Long, Long, Long, Int)] =
    spark.read.parquet(root + "/verdicts")
      .select(col("ingest_seq"), col("doc_id"), col("n_corpus_hits"),
        col("n_batch_rivals"), col("keep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet

  test("self excluded, rivals counted, stale versions cannot convict, retraction exonerates") {
    val root = tempDir("graft-bdus1")
    // wave 0: docs 1,2 share tA (dup pair), doc 3 unique tB
    writeWaveTo(root + "/src", 0,
      Seq((1L, tA), (2L, tA), (3L, tB)).toDF("doc_id", "text"))
    // wave 1: doc 3 re-arrives IDENTICAL — only its own previous version
    // matches, which self-exclusion must ignore
    writeWaveTo(root + "/src", 1, Seq((3L, tB)).toDF("doc_id", "text"))
    // wave 2: both tA owners retracted
    writeWaveTo(root + "/src", 2,
      Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    // wave 3: a NEW doc with tA — the only bands that could convict it
    // are the retracted docs' stale versions
    writeWaveTo(root + "/src", 3, Seq((4L, tA)).toDF("doc_id", "text"))
    run(root, "ckpt")
    val v = verdicts(root)
    // wave 0: 1 keeps, 2 loses to in-batch rival 1, 3 keeps
    assert(v.contains((0L, 1L, 0L, 0L, 1)))
    assert(v.contains((0L, 2L, 0L, 1L, 0)), s"doc 2 must lose to its in-batch rival: $v")
    assert(v.contains((0L, 3L, 0L, 0L, 1)))
    assert(v.contains((1L, 3L, 0L, 0L, 1)),
      s"a doc's own previous version must not convict its update: $v")
    // wave 2 (deletions): no verdict rows at all
    assert(!v.exists(_._1 == 2L), s"null-text arrivals must have no verdict row: $v")
    assert(v.contains((3L, 4L, 0L, 0L, 1)),
      s"retracted docs' stale bands must not convict a later arrival: $v")
  }

  test("per-wave verdicts equal batch incrementalDedupBanded over the closed-form live corpus") {
    val root = tempDir("graft-bdus2")
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 150).select(col("doc_id"), col("text"))
      .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
        col("doc_id").cast("string"), ""), lit(4L)))
      .localCheckpoint(false)
    def doubled(d: DataFrame) =
      d.withColumn("text", concat(col("text"), lit(" "), col("text")))
    val w0 = docs.drop("h4")
    val w1 = doubled(docs.filter(col("h4") === 1)).drop("h4")
      .unionByName(docs.filter(col("h4") === 3)
        .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4"))
    val w2 = docs.filter(col("h4") === 2)
      .withColumn("text", lit(null).cast("string")).drop("h4")
      .unionByName(docs.filter(col("h4") === 3).drop("h4"))
    writeWaveTo(root + "/src", 0, w0)
    writeWaveTo(root + "/src", 1, w1)
    writeWaveTo(root + "/src", 2, w2)
    run(root, "ckpt")
    // closed-form live corpora before each wave
    val live1 = w0
    val live2 = doubled(docs.filter(col("h4") === 1)).drop("h4")
      .unionByName(docs.filter(col("h4") === 3)
        .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4"))
      .unionByName(docs.filter(col("h4") === 0 || col("h4") === 2).drop("h4"))
    def batchVerdicts(live: Option[DataFrame], batch: DataFrame): Set[(Long, Long, Long, Int)] = {
      val sigs = TextDedup.minhashSignatures(batch.filter(col("text").isNotNull))
      val index = live.map(l => TextDedup.signatureBands(TextDedup.minhashSignatures(l)))
        .getOrElse(TextDedup.signatureBands(sigs).limit(0))
      TextDedup.incrementalDedupBanded(index, sigs, excludeSelf = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    }
    val v = verdicts(root)
    def wave(k: Long) = v.filter(_._1 == k).map(t => (t._2, t._3, t._4, t._5))
    assert(wave(0) == batchVerdicts(None, w0), "wave 0 != batch over empty index")
    assert(wave(1) == batchVerdicts(Some(live1), w1), "wave 1 != batch over live-at-1")
    assert(wave(2) == batchVerdicts(Some(live2), w2), "wave 2 != batch over live-at-2")
  }

  test("replay is a no-op on the verdict log; per-batch compaction is invisible") {
    val root = tempDir("graft-bdus3")
    writeWaveTo(root + "/src", 0,
      Seq((1L, tA), (2L, tA), (3L, tB)).toDF("doc_id", "text"))
    writeWaveTo(root + "/src", 1, Seq((3L, tB), (4L, tA)).toDF("doc_id", "text"))
    writeWaveTo(root + "/src", 2,
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    run(root, "ckpt", maxBandFiles = 1) // compaction fires every batch
    val before = verdicts(root)
    val rawVerdicts = spark.read.parquet(root + "/verdicts").count()
    run(root, "ckpt2") // full replay with original batchIds
    assert(spark.read.parquet(root + "/verdicts").count() == rawVerdicts,
      "replay re-appended verdict rows")
    assert(verdicts(root) == before)
    // the index itself stayed live-only under per-batch compaction
    val stale = spark.read.parquet(root + "/bands")
      .groupBy(col("doc_id")).agg(countDistinct(col("ingest_seq")).as("nv"))
      .filter(col("nv") > 1)
    assert(stale.count() == 0, "superseded band versions survived compaction")
  }
}
