package graft

import org.apache.spark.sql.functions._

import graft.ext.LinearModel
import graft.streaming.StreamingIngest

/** Streaming incremental classifier fit (round-10, the x104 twin):
  * micro-batches append normal-equation sufficient-statistics partials
  * (blind stamped appends — sums are not idempotent, so the landed-seq
  * guard is the exactly-once boundary) and the read-side fold equals the
  * all-at-once fit statistics over every doc ever streamed.
  */
class ClassifierStreamSpec extends SparkSuite {
  import spark.implicits._

  private val feats = Seq(col("a"), col("b"))
  private val label = col("doc_id") % 3 === 0

  private def batchRows(b: Int): Seq[(Long, Long, Long)] =
    (0L until 150L).map { i =>
      val id = b * 1000L + i
      (id, id % 11, id % 6)
    }

  private def writeBatch(dir: String, b: Int): Unit = {
    val f = new java.io.File(dir, f"batch$b%03d.parquet")
    batchRows(b).toDF("doc_id", "a", "b").coalesce(1)
      .write.mode("overwrite").parquet(f.toString)
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }

  private def run(src: String, stats: String, ckpt: String): Unit = {
    val docs = spark.readStream
      .schema("doc_id LONG, a LONG, b LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.classifierStatsStream(docs, stats, ckpt, feats, label)
  }

  private def statsRow(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    val r = df.collect()(0)
    r.schema.fieldNames.map(n => n -> r.getAs[Long](n)).toMap
  }

  test("streamed fold equals the all-at-once fit statistics") {
    val root = tempDir("graft-clsstream")
    (0 until 3).foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/stats", root + "/ckpt")

    val partials = spark.read.parquet(root + "/stats")
    assert(partials.count() == 3) // one stats row per arrival batch
    val folded = statsRow(
      StreamingIngest.classifierStatsFromPartials(spark, root + "/stats", 3))
    val whole = statsRow(LinearModel.fitStats(
      LinearModel.featFrame(
        (0 until 3).flatMap(batchRows).toDF("doc_id", "a", "b"),
        feats, label, "doc_id"), 3))
    assert(folded == whole)
  }

  test("re-delivered batches do not double-count: the landed-seq guard holds") {
    val root = tempDir("graft-clsstream2")
    (0 until 3).foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/stats", root + "/ckpt")
    val before = statsRow(
      StreamingIngest.classifierStatsFromPartials(spark, root + "/stats", 3))
    // fresh checkpoint replays every file as batches 0..2 again; the
    // statsDir's landed seqs must swallow the re-delivery
    run(root + "/src", root + "/stats", root + "/ckpt2")
    val after = statsRow(
      StreamingIngest.classifierStatsFromPartials(spark, root + "/stats", 3))
    assert(after == before)
  }
}
