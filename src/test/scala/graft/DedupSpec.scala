package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** FIXTURES.md §B.5: ReplacingMergeTree last-write-wins semantics. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private def table = Seq(
    (1L, "old", 1L), (1L, "new", 2L),
    (2L, "only", 1L),
    (3L, "a", 5L), (3L, "b", 4L), (3L, "c", 3L)
  ).toDF("key", "payload", "ingest_seq")

  test("later ingest_seq wins per key") {
    val got = Dedup.lastWriteWins(table, Seq("key"), Seq(col("ingest_seq").desc))
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "new"), (2L, "only"), (3L, "a")))
  }

  test("idempotence: dedup(dedup(x)) == dedup(x)") {
    val once = Dedup.lastWriteWins(table, Seq("key"), Seq(col("ingest_seq").desc))
    val twice = Dedup.lastWriteWins(once, Seq("key"), Seq(col("ingest_seq").desc))
    assert(once.orderBy("key").collect().sameElements(twice.orderBy("key").collect()))
  }

  test("anyWinner keeps exactly one row per key") {
    assert(Dedup.anyWinner(table, Seq("key")).count() == 3)
  }

  test("lastWriteWinsAgg (max_by plan) agrees with the window plan") {
    val w = Dedup.lastWriteWins(table, Seq("key"), Seq(col("ingest_seq").desc))
      .select("key", "payload", "ingest_seq").orderBy("key").collect()
    val a = Dedup.lastWriteWinsAgg(table, Seq("key"), Seq(col("ingest_seq")))
      .select("key", "payload", "ingest_seq").orderBy("key").collect()
    assert(w.sameElements(a))
  }
}
