package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextStats
import graft.pipeline.ManifestTable
import graft.streaming.StreamingIngest

/** Streaming grouped pps sample (round-11 verdict item 7): the standing
  * exactly-n-per-group sample folds each micro-batch in and stays equal
  * to the batch x101 form (`weightedSamplePerGroup`) over everything
  * that has arrived — per-group top-n under deterministic priorities is
  * an associative, idempotent fold, groupwise.
  */
class GroupedWeightedSampleStreamSpec extends SparkSuite {
  import spark.implicits._

  private val N = 10

  // the x101 feature frame over the real corpus: (doc_id, source, n_tokens)
  private def corpus: DataFrame =
    graft.sources.Tables.documents(spark, sf).select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))

  private def writeWave(dir: String, b: Int, df: DataFrame): Unit = {
    val f = new java.io.File(dir, f"batch$b%03d.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(f.toString)
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }

  private def run(src: String, sample: String, ckpt: String): Unit = {
    val docs = spark.readStream
      .schema("doc_id LONG, source STRING, n_tokens LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.groupedWeightedSampleStream(docs, "source", "n_tokens",
      N, sample, ckpt)
  }

  private def asSet(df: DataFrame): Set[(Long, String, Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
      r.getAs[Long]("w"), r.getAs[Long]("priority"), r.getAs[Long]("rk"))).toSet

  test("streamed per-group fold equals batch x101 over all arrivals, batch by batch and under continuation") {
    val root = Files.createTempDirectory("graft-gwsample").toString
    val c = corpus.withColumn("h", pmod(xxhash64(col("doc_id")), lit(3L)))
      .localCheckpoint(false)
    (0 until 3).foreach(b =>
      writeWave(root + "/src", b, c.filter(col("h") === b).drop("h")))
    run(root + "/src", root + "/sample", root + "/ckpt")
    val expect = asSet(TextStats.weightedSamplePerGroup(
      corpus, "source", col("n_tokens"), N))
    assert(asSet(ManifestTable.read(spark, root + "/sample")) == expect,
      "streamed grouped sample != batch x101 after 3 waves")

    // continuation: re-arrival wave (same docs, same weights) resumes the
    // same checkpoint — the fold is idempotent, the sample must not move
    writeWave(root + "/src", 3, c.filter(col("h") === 0).drop("h"))
    run(root + "/src", root + "/sample", root + "/ckpt")
    assert(asSet(ManifestTable.read(spark, root + "/sample")) == expect,
      "re-arrived docs moved the standing grouped sample")
  }

  test("group move resolves deterministically: both arrival orders land the doc in one group") {
    // docs re-arrive in a DIFFERENT group with x10 weight: the min-priority
    // version must win regardless of arrival order, and the doc must
    // appear in exactly one group
    val before = (0L until 120L).map(u => (u, "srcA", u % 7 + 1))
    val after = (0L until 120L).map(u => (u, "srcB", (u % 7 + 1) * 10))
    def runOrder(first: Seq[(Long, String, Long)],
        second: Seq[(Long, String, Long)]): Set[(Long, String, Long, Long, Long)] = {
      val root = Files.createTempDirectory("graft-gwsample2").toString
      writeWave(root + "/src", 0, first.toDF("doc_id", "source", "n_tokens"))
      writeWave(root + "/src", 1, second.toDF("doc_id", "source", "n_tokens"))
      run(root + "/src", root + "/sample", root + "/ckpt")
      asSet(ManifestTable.read(spark, root + "/sample"))
    }
    val a = runOrder(before, after)
    val b = runOrder(after, before)
    assert(a == b, s"arrival order changed the grouped sample")
    // the x10 rows have strictly smaller hash-div-weight priorities, so
    // every resolution keeps the srcB version: the batch form over the
    // updated rows is the fixpoint
    assert(a == asSet(TextStats.weightedSamplePerGroup(
      after.toDF("doc_id", "source", "n_tokens"), "source",
      col("n_tokens"), N)))
    assert(a.groupBy(_._1).forall(_._2.size == 1), "a doc appears in two groups")
  }
}
