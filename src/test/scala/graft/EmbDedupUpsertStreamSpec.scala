package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.streaming.StreamingIngest

/** The fused continuous embedding-dedup loop over the retractable
  * vector index (round-13, x126): per-wave verdicts equal batch
  * embeddingDedupVerdicts against the closed-form live index of prior
  * waves, a doc's own previous vector never convicts its update,
  * retraction exonerates future arrivals, and replay/compaction are
  * invisible to the verdict log.
  */
class EmbDedupUpsertStreamSpec extends SparkSuite {
  import spark.implicits._

  // 64-dim (Similarity.Dim) unit-ish vectors: identical copies are
  // cos==1 near-dups, vA vs vB are orthogonal (cos 0)
  private val vA: Array[Float] = Array.tabulate(Similarity.Dim)(i => if (i == 0) 1f else 0f)
  private val vB: Array[Float] = Array.tabulate(Similarity.Dim)(i => if (i == 1) 1f else 0f)

  private def run(root: String, ckpt: String, maxVecFiles: Int = 64): Unit = {
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.embIndexUpsertDedupStream(stream, root + "/vecs",
      root + "/versions", root + "/verdicts", root + s"/$ckpt",
      maxVecFiles = maxVecFiles)
  }

  private def verdicts(root: String): Set[(Long, Long, Int)] =
    spark.read.parquet(root + "/verdicts")
      .select(col("ingest_seq"), col("vec_id"), col("keep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("self excluded, rivals counted, stale vectors cannot convict, retraction exonerates") {
    val root = tempDir("graft-edus1")
    // wave 0: vecs 1,2 share vA (dup pair), vec 3 unique vB
    writeWaveTo(root + "/src", 0,
      Seq((1L, vA), (2L, vA), (3L, vB)).toDF("vec_id", "embedding"))
    // wave 1: vec 3 re-arrives IDENTICAL — only its own previous version
    // matches (cos == 1), which self-exclusion must ignore
    writeWaveTo(root + "/src", 1, Seq((3L, vB)).toDF("vec_id", "embedding"))
    // wave 2: both vA owners retracted
    writeWaveTo(root + "/src", 2,
      Seq((1L, null.asInstanceOf[Array[Float]]),
        (2L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    // wave 3: a NEW vec with vA — only the retracted docs' stale
    // vectors could convict it
    writeWaveTo(root + "/src", 3, Seq((4L, vA)).toDF("vec_id", "embedding"))
    run(root, "ckpt")
    val v = verdicts(root)
    assert(v.contains((0L, 1L, 1)))
    assert(v.contains((0L, 2L, 0)), s"vec 2 must lose to its in-batch rival: $v")
    assert(v.contains((0L, 3L, 1)))
    assert(v.contains((1L, 3L, 1)),
      s"a doc's own previous vector must not convict its update: $v")
    assert(!v.exists(_._1 == 2L), s"null-embedding arrivals must have no verdict row: $v")
    assert(v.contains((3L, 4L, 1)),
      s"retracted docs' stale vectors must not convict a later arrival: $v")
  }

  test("per-wave verdicts equal batch embeddingDedupVerdicts over the closed-form live corpus") {
    val root = tempDir("graft-edus2")
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 150).select(col("vec_id"), col("embedding"))
      .withColumn("h4", pmod(graft.ext.TextDedup.portableHashBuiltin(
        col("vec_id").cast("string"), ""), lit(4L)))
      .localCheckpoint(false)
    val neg = transform(col("embedding"), x => -x)
    val w0 = vecs.drop("h4")
    // identical re-delivery (self-exclusion pin) + negated updates
    val w1 = vecs.filter(col("h4") === 0).drop("h4")
      .unionByName(vecs.filter(col("h4") === 1).withColumn("embedding", neg).drop("h4"))
    val w2 = vecs.filter(col("h4") === 2)
      .withColumn("embedding", lit(null).cast("array<float>")).drop("h4")
      .unionByName(vecs.filter(col("h4") === 1).drop("h4")) // revert
    writeWaveTo(root + "/src", 0, w0)
    writeWaveTo(root + "/src", 1, w1)
    writeWaveTo(root + "/src", 2, w2)
    run(root, "ckpt")
    // closed-form live corpora before each wave
    val live1 = w0
    val live2 = vecs.filter(col("h4") === 1).withColumn("embedding", neg).drop("h4")
      .unionByName(vecs.filter(col("h4") =!= 1).drop("h4"))
    def indexed(df: DataFrame): DataFrame =
      df.select(col("vec_id"), Similarity.lshBucket(col("embedding")).as("bucket"),
        col("embedding"))
    def batchVerdicts(live: Option[DataFrame], batch: DataFrame): Set[(Long, Int)] = {
      val b = batch.filter(col("embedding").isNotNull)
      val idx = live.map(indexed).getOrElse(indexed(b).limit(0))
      Similarity.embeddingDedupVerdicts(idx, b, 0.9, excludeSelf = true)
        .select(col("vec_id"), col("keep"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    }
    val v = verdicts(root)
    def wave(k: Long) = v.filter(_._1 == k).map(t => (t._2, t._3))
    assert(wave(0) == batchVerdicts(None, w0), "wave 0 != batch over empty index")
    assert(wave(1) == batchVerdicts(Some(live1), w1), "wave 1 != batch over live-at-1")
    assert(wave(2) == batchVerdicts(Some(live2), w2), "wave 2 != batch over live-at-2")
  }

  test("replay is a no-op on the verdict log; per-batch compaction is invisible") {
    val root = tempDir("graft-edus3")
    writeWaveTo(root + "/src", 0,
      Seq((1L, vA), (2L, vA), (3L, vB)).toDF("vec_id", "embedding"))
    writeWaveTo(root + "/src", 1, Seq((3L, vB), (4L, vA)).toDF("vec_id", "embedding"))
    writeWaveTo(root + "/src", 2,
      Seq((1L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    run(root, "ckpt", maxVecFiles = 1) // compaction fires every batch
    val before = verdicts(root)
    val rawVerdicts = spark.read.parquet(root + "/verdicts").count()
    run(root, "ckpt2") // full replay with original batchIds
    assert(spark.read.parquet(root + "/verdicts").count() == rawVerdicts,
      "replay re-appended verdict rows")
    assert(verdicts(root) == before)
    val stale = spark.read.parquet(root + "/vecs")
      .groupBy(col("vec_id")).agg(countDistinct(col("ingest_seq")).as("nv"))
      .filter(col("nv") > 1)
    assert(stale.count() == 0, "superseded vector versions survived compaction")
  }
}
