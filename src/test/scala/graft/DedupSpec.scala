package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** FIXTURES.md §B.5: ReplacingMergeTree last-write-wins semantics. */
class DedupSpec extends SparkSuite {

  test("lshSCurve: hand values at s=0.5, monotone in s, bands trade recall for junk") {
    val rows = graft.ext.TextDedup.lshSCurve(spark).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getLong(2)), BigDecimal(r.getString(3)))).toMap
    // s = 0.5 exactly (5000 bp): 16 bands of 1 row -> 1 - 0.5^16;
    // 1 band of 16 rows -> 0.5^16
    assert(rows((16, 1, 5000L)) == BigDecimal("0.999985"))
    assert(rows((1, 16, 5000L)) == BigDecimal("0.000015"))
    // P is monotone in s for every factorization
    for (b <- Seq(1, 2, 4, 8, 16)) {
      val curve = rows.toSeq.collect { case ((`b`, _, s), p) => (s, p) }.sortBy(_._1)
      assert(curve.sliding(2).forall { case Seq((_, p1), (_, p2)) => p2 >= p1 })
    }
    // at low similarity, more bands catch more (the recall/junk trade)
    assert(rows((16, 1, 1500L)) > rows((4, 4, 1500L)))
    assert(rows((4, 4, 1500L)) > rows((1, 16, 1500L)))
  }
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

  test("multi-column keys: dedup treats the key tuple jointly") {
    val t = Seq(
      ("a", 1L, "v1", 1L), ("a", 1L, "v2", 2L), // same (k1,k2) → collapse
      ("a", 2L, "x", 1L), ("b", 1L, "y", 1L)    // distinct tuples survive
    ).toDF("k1", "k2", "payload", "ingest_seq")
    val w = Dedup.lastWriteWins(t, Seq("k1", "k2"), Seq(col("ingest_seq").desc))
    val a = Dedup.lastWriteWinsAgg(t, Seq("k1", "k2"), Seq(col("ingest_seq")))
    assert(w.count() == 3 && a.count() == 3)
    val winner = a.filter(col("k1") === "a" && col("k2") === 1).first().getString(2)
    assert(winner == "v2")
  }

  test("lastWriteWinsAgg (max_by plan) agrees with the window plan") {
    val w = Dedup.lastWriteWins(table, Seq("key"), Seq(col("ingest_seq").desc))
      .select("key", "payload", "ingest_seq").orderBy("key").collect()
    val a = Dedup.lastWriteWinsAgg(table, Seq("key"), Seq(col("ingest_seq")))
      .select("key", "payload", "ingest_seq").orderBy("key").collect()
    assert(w.sameElements(a))
  }
}
