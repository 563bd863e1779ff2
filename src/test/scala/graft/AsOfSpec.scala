package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join semantics on a hand-built case: >= boundary, latest-wins,
  * no-match behavior, tie-break determinism.
  */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 12:00:00")),
    (3L, 20L, ts("2024-01-01 09:00:00")),
    (4L, 30L, ts("2024-01-01 09:00:00"))
  ).toDF("id", "k", "t")

  private def right = Seq(
    (100L, 10L, ts("2024-01-01 09:30:00"), "a"),
    (101L, 10L, ts("2024-01-01 11:00:00"), "b"),
    (102L, 20L, ts("2024-01-01 09:00:00"), "c"), // exactly at left ts → matches
    (103L, 20L, ts("2024-01-01 09:00:00"), "d")  // same ts: tie-break by rid → d
  ).toDF("rid", "k", "rt", "payload")

  test("backward match picks the latest right row <= left ts") {
    val got = AsOf.join(left, right, "k", "k", "t", "rt", tieBreak = Seq("rid"))
      .select("id", "right_payload").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("a"))  // 10:00 → 09:30 row
    assert(got(2L).contains("b"))  // 12:00 → 11:00 row
    assert(got(3L).contains("d"))  // equal-ts match allowed; tie → max rid
    assert(got(4L).isEmpty)        // key 30 has no right rows
  }

  test("joinInner drops unmatched left rows") {
    assert(AsOf.joinInner(left, right, "k", "k", "t", "rt").count() == 3)
  }

  test("string keys work (no numeric-key assumption)") {
    val l = Seq((1L, "alice", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val r = Seq((9L, "alice", ts("2024-01-01 09:00:00"), "hit"),
      (10L, "bob", ts("2024-01-01 09:00:00"), "miss")).toDF("rid", "k", "rt", "payload")
    val got = AsOf.join(l, r, "k", "k", "t", "rt").select("right_payload").first()
    assert(got.getString(0) == "hit")
  }

  test("left rows earlier than every right row get no match") {
    val earlyLeft = Seq((9L, 10L, ts("2024-01-01 00:00:00"))).toDF("id", "k", "t")
    val got = AsOf.join(earlyLeft, right, "k", "k", "t", "rt")
      .select("right_payload").first()
    assert(got.isNullAt(0))
  }
}
