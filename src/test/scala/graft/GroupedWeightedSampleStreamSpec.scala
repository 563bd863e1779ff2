package graft

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

  private def run(src: String, sample: String, ckpt: String,
      ledger: Int = 0): Unit = {
    val docs = spark.readStream
      .schema("doc_id LONG, source STRING, n_tokens LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.groupedWeightedSampleStream(docs, "source", "n_tokens",
      N, sample, ckpt, ledger = ledger)
  }

  private def asSet(df: DataFrame): Set[(Long, String, Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
      r.getAs[Long]("w"), r.getAs[Long]("priority"), r.getAs[Long]("rk"))).toSet

  test("streamed per-group fold equals batch x101 over all arrivals, batch by batch and under continuation") {
    val root = tempDir("graft-gwsample")
    val c = corpus.withColumn("h", pmod(xxhash64(col("doc_id")), lit(3L)))
      .localCheckpoint(false)
    (0 until 3).foreach(b =>
      writeWaveTo(root + "/src", b, c.filter(col("h") === b).drop("h")))
    run(root + "/src", root + "/sample", root + "/ckpt")
    val expect = asSet(TextStats.weightedSamplePerGroup(
      corpus, "source", col("n_tokens"), N))
    assert(asSet(ManifestTable.read(spark, root + "/sample")) == expect,
      "streamed grouped sample != batch x101 after 3 waves")

    // continuation: re-arrival wave (same docs, same weights) resumes the
    // same checkpoint — the fold is idempotent, the sample must not move
    writeWaveTo(root + "/src", 3, c.filter(col("h") === 0).drop("h"))
    run(root + "/src", root + "/sample", root + "/ckpt")
    assert(asSet(ManifestTable.read(spark, root + "/sample")) == expect,
      "re-arrived docs moved the standing grouped sample")
  }

  test("group move guarantees: retained min-priority versions never regress, single membership, replay-determinism — NOT order-independence (bounded state forgets dropped versions)") {
    val before = (0L until 120L).map(u => (u, "srcA", u % 7 + 1))
    val after = (0L until 120L).map(u => (u, "srcB", (u % 7 + 1) * 10))
    def runOrder(first: Seq[(Long, String, Long)],
        second: Seq[(Long, String, Long)]): Set[(Long, String, Long, Long, Long)] = {
      val root = tempDir("graft-gwsample2")
      writeWaveTo(root + "/src", 0, first.toDF("doc_id", "source", "n_tokens"))
      writeWaveTo(root + "/src", 1, second.toDF("doc_id", "source", "n_tokens"))
      run(root + "/src", root + "/sample", root + "/ckpt")
      asSet(ManifestTable.read(spark, root + "/sample"))
    }
    // low-weight versions first, x10 movers second: every arriving srcB
    // version beats whatever stands, so the fixpoint is the batch sample
    // over the updated rows
    val a = runOrder(before, after)
    assert(a == asSet(TextStats.weightedSamplePerGroup(
      after.toDF("doc_id", "source", "n_tokens"), "source",
      col("n_tokens"), N)))
    // x10 versions first, low-weight re-arrivals second: the RETAINED
    // srcB rows must never regress to their worse srcA versions (min
    // priority is monotone on retained ids) — but ids whose srcB
    // versions were dropped from the bounded standing state resolve
    // unopposed as srcA: arrival ORDER legitimately changes which
    // version of a FORGOTTEN id survives. That asymmetry is the
    // documented price of O(groups x n) state; what must hold is
    // single membership and per-order determinism.
    val b = runOrder(after, before)
    val bSrcB = b.filter(_._2 == "srcB")
    assert(bSrcB == asSet(TextStats.weightedSamplePerGroup(
      after.toDF("doc_id", "source", "n_tokens"), "source",
      col("n_tokens"), N)), "retained srcB versions regressed")
    assert(b.groupBy(_._1).forall(_._2.size == 1), "a doc appears in two groups")
    assert(a.groupBy(_._1).forall(_._2.size == 1), "a doc appears in two groups")
    assert(runOrder(after, before) == b, "same arrival order must replay identically")
  }

  test("PARTIAL group move: deterministic single membership, the vacated group may underfill (the documented O(groups x n) price), and re-delivery backfills") {
    // 30 srcA docs; the standing sample keeps its top-10 and drops 20 at
    // the batch boundary. Then 3 of the STANDING docs move to srcB with
    // x100 weight (they win per-id resolution). The scaladoc's weaker
    // group-move contract says: srcA stands at 7 (dropped rows cannot
    // backfill), the movers live in srcB only — and a later wave
    // re-delivering the dropped docs restores srcA to 10.
    val root = tempDir("graft-gwsample3")
    val wave1 = (0L until 30L).map(u => (u, "srcA", u % 7 + 1))
    writeWaveTo(root + "/src", 0, wave1.toDF("doc_id", "source", "n_tokens"))
    run(root + "/src", root + "/sample", root + "/ckpt")
    val standing1 = asSet(ManifestTable.read(spark, root + "/sample"))
    assert(standing1.size == N && standing1.forall(_._2 == "srcA"))
    val movers = standing1.toSeq.sortBy(_._1).take(3).map(_._1).toSet
    writeWaveTo(root + "/src", 1,
      movers.toSeq.sorted.map(u => (u, "srcB", (u % 7 + 1) * 100))
        .toDF("doc_id", "source", "n_tokens"))
    run(root + "/src", root + "/sample", root + "/ckpt")
    val standing2 = asSet(ManifestTable.read(spark, root + "/sample"))
    assert(standing2.count(_._2 == "srcB") == 3, "movers must land in srcB")
    assert(standing2.filter(r => movers(r._1)).forall(_._2 == "srcB"),
      "a moved doc appeared in its old group")
    assert(standing2.count(_._2 == "srcA") == N - 3,
      "vacated slots must NOT backfill from boundary-dropped rows (the documented underfill)")
    // recovery: re-deliver the full original wave — dropped docs return,
    // movers stay resolved to srcB, srcA refills to its budget
    writeWaveTo(root + "/src", 2, wave1.toDF("doc_id", "source", "n_tokens"))
    run(root + "/src", root + "/sample", root + "/ckpt")
    val standing3 = asSet(ManifestTable.read(spark, root + "/sample"))
    assert(standing3.count(_._2 == "srcA") == N, "re-delivery must backfill srcA")
    assert(standing3.filter(r => movers(r._1)).forall(_._2 == "srcB"),
      "re-delivered old-group rows must lose per-id resolution to the x100-weight movers")
  }

  test("dropped-version LEDGER (round-13, r12 verdict item 3): within the horizon, vacated slots backfill immediately from ledger rows") {
    // 30 srcA docs, ledger 3: the standing state keeps rk 1..13. Moving
    // the top-3 away must NOT underfill — the 3 ledger rows promote into
    // the published budget in the same batch (contrast: the no-ledger
    // test above pins srcA == N-3 on the same script).
    val root = tempDir("graft-gwledger1")
    val wave1 = (0L until 30L).map(u => (u, "srcA", u % 7 + 1))
    writeWaveTo(root + "/src", 0, wave1.toDF("doc_id", "source", "n_tokens"))
    run(root + "/src", root + "/sample", root + "/ckpt", ledger = 3)
    val m1 = ManifestTable.read(spark, root + "/sample")
    assert(m1.count() == N + 3, "standing state must hold n+ledger rows")
    val pub1 = asSet(m1.filter(col("rk") <= N))
    assert(pub1.size == N && pub1.forall(_._2 == "srcA"))
    val movers = pub1.toSeq.sortBy(_._5).take(3).map(_._1).toSet
    writeWaveTo(root + "/src", 1,
      movers.toSeq.sorted.map(u => (u, "srcB", (u % 7 + 1) * 100))
        .toDF("doc_id", "source", "n_tokens"))
    run(root + "/src", root + "/sample", root + "/ckpt", ledger = 3)
    val pub2 = asSet(ManifestTable.read(spark, root + "/sample")
      .filter(col("rk") <= N))
    assert(pub2.count(_._2 == "srcB") == 3, "movers must land in srcB")
    assert(pub2.count(_._2 == "srcA") == N,
      "the ledger must backfill vacated slots in the same batch — no underfill window")
  }

  test("ledger OVERFLOW caveat (spec-pinned, x124's scaladoc): a version dropped BEYOND the ledger horizon still cannot oppose a worse re-arrival; within the horizon it does") {
    // 14 docs at weight 5, n=10, ledger=1: standing = rk 1..11 (the rk-11
    // row is the ONE ledger slot); ranks 12..14 are dropped beyond the
    // horizon. Move the top-3 away, then re-deliver the rk-11 id and one
    // dropped id, both at weight 1 (strictly worse priority).
    val root = tempDir("graft-gwledger2")
    val ids = (0L until 14L)
    writeWaveTo(root + "/src", 0,
      ids.map(u => (u, "srcA", 5L)).toDF("doc_id", "source", "n_tokens"))
    run(root + "/src", root + "/sample", root + "/ckpt", ledger = 1)
    val m1 = ManifestTable.read(spark, root + "/sample")
    assert(m1.count() == N + 1)
    val byRk = m1.collect().map(r =>
      r.getAs[Long]("rk") -> r.getAs[Long]("doc_id")).toMap
    val ledgered = byRk(11L)
    val forgotten = (ids.toSet -- byRk.values).head
    writeWaveTo(root + "/src", 1,
      Seq(byRk(1L), byRk(2L), byRk(3L)).map(u => (u, "srcB", 500L))
        .toDF("doc_id", "source", "n_tokens"))
    writeWaveTo(root + "/src", 2,
      Seq((ledgered, "srcA", 1L), (forgotten, "srcA", 1L))
        .toDF("doc_id", "source", "n_tokens"))
    run(root + "/src", root + "/sample", root + "/ckpt", ledger = 1)
    val rows = ManifestTable.read(spark, root + "/sample").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("w")).toMap
    assert(rows(ledgered) == 5L,
      "a ledger-retained version must oppose its worse re-arrival (kept weight 5)")
    assert(rows(forgotten) == 1L,
      "beyond the ledger horizon the x121 caveat stands: the worse re-arrival wins unopposed")
  }
}
