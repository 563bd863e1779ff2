package graft

import org.apache.spark.sql.functions._

import graft.ext.TextStats
import graft.pipeline.ManifestTable
import graft.streaming.StreamingIngest

/** Streaming pps weighted sample (round-10): the standing n-row sample
  * folds each micro-batch in and stays exactly equal to the batch x96
  * sample over everything that has arrived — top-n under deterministic
  * priorities is an associative, idempotent fold.
  */
class WeightedSampleStreamSpec extends SparkSuite {
  import spark.implicits._

  private val N = 25

  // weights cycle 1..7 so the sample is genuinely weight-driven
  private def batchRows(b: Int): Seq[(Long, Long)] =
    (0L until 200L).map(u => (b * 1000L + u, u % 7 + 1))

  private def writeBatch(dir: String, b: Int): Unit = {
    val f = new java.io.File(dir, f"batch$b%03d.parquet")
    batchRows(b).toDF("doc_id", "w").coalesce(1)
      .write.mode("overwrite").parquet(f.toString)
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }

  private def run(src: String, sample: String, ckpt: String): Unit = {
    val docs = spark.readStream
      .schema("doc_id LONG, w LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.weightedSampleStream(docs, "w", N, sample, ckpt)
  }

  private def batchSample(bs: Seq[Int]): Set[(Long, Long)] =
    TextStats.weightedSample(
      bs.flatMap(batchRows).toDF("doc_id", "w"), col("w"), N)
      .collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("priority"))).toSet

  private def standing(sample: String): Set[(Long, Long)] =
    ManifestTable.read(spark, sample)
      .collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("priority"))).toSet

  test("streamed fold equals the batch sample, batch by batch and under continuation") {
    val root = tempDir("graft-wsample")
    (0 until 3).foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/sample", root + "/ckpt")
    assert(standing(root + "/sample") == batchSample(0 until 3))

    // continuation: a 4th batch arrives, the same checkpoint resumes
    writeBatch(root + "/src", 3)
    run(root + "/src", root + "/sample", root + "/ckpt")
    assert(standing(root + "/sample") == batchSample(0 until 4))
  }

  test("re-running with no new data leaves the sample byte-identical (idempotent fold)") {
    val root = tempDir("graft-wsample2")
    (0 until 2).foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/sample", root + "/ckpt")
    val v1 = ManifestTable.currentVersion(spark, root + "/sample")
    val before = standing(root + "/sample")
    run(root + "/src", root + "/sample", root + "/ckpt")
    assert(ManifestTable.currentVersion(spark, root + "/sample") == v1,
      "an empty trigger must not publish a new version")
    assert(standing(root + "/sample") == before)
  }

  test("a replayed batch folds to the identical sample (idempotence vs the standing set)") {
    val root = tempDir("graft-wsample3")
    (0 until 2).foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/sample", root + "/ckpt")
    val before = standing(root + "/sample")
    // fresh checkpoint over the SAME files = every batch replays against
    // the already-folded standing sample
    run(root + "/src", root + "/sample", root + "/ckpt2")
    assert(standing(root + "/sample") == before)
  }

  test("weight update resolves deterministically: both arrival orders give the same sample (round-11 ADVICE)") {
    // every doc re-arrives with a DIFFERENT weight — pre-fix, the kept
    // row per id after dropDuplicates was arbitrary, so the standing
    // sample depended on union internals; now the min-priority version
    // wins regardless of which weight arrived first
    def writeCustom(dir: String, b: Int, rows: Seq[(Long, Long)]): Unit = {
      val f = new java.io.File(dir, f"batch$b%03d.parquet")
      rows.toDF("doc_id", "w").coalesce(1).write.mode("overwrite").parquet(f.toString)
      val t = 1700000000000L + b * 60000L
      f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
    }
    val low = (0L until 120L).map(u => (u, u % 7 + 1))        // weights 1..7
    val high = (0L until 120L).map(u => (u, (u % 7 + 1) * 10)) // same docs, x10 weight
    def runOrder(first: Seq[(Long, Long)], second: Seq[(Long, Long)]): Set[(Long, Long)] = {
      val root = tempDir("graft-wsample4")
      writeCustom(root + "/src", 0, first)
      writeCustom(root + "/src", 1, second)
      run(root + "/src", root + "/sample", root + "/ckpt")
      standing(root + "/sample")
    }
    val a = runOrder(low, high)
    val b = runOrder(high, low)
    assert(a == b, s"arrival order changed the sample:\n  low-first  $a\n  high-first $b")
    // and the resolved sample is the batch sample over the min-priority
    // version of each doc (higher weight => smaller hash-div-weight
    // priority, so the x10 rows win every resolution here)
    assert(a == batchSampleOf(high))
  }

  private def batchSampleOf(rows: Seq[(Long, Long)]): Set[(Long, Long)] =
    TextStats.weightedSample(rows.toDF("doc_id", "w"), col("w"), N)
      .collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("priority"))).toSet
}
