package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Streaming re-aggregatable sketch rollup (round 9, the x90 twin):
  * micro-batches append per-(event_type, day) HLL partials — blind
  * stamped appends, no standing-index probe, because mergeable state
  * needs no reconciliation — and the read-side union answers the
  * global distinct question from sketch bytes alone.
  */
class SketchRollupStreamSpec extends SparkSuite {
  import spark.implicits._

  // 3 arrival batches; user populations overlap across batches and
  // days, so per-batch exact counts do NOT sum to the global distinct —
  // the case where naive partial counts are wrong and sketches are not
  private def batchRows(b: Int): Seq[(String, java.sql.Timestamp, Long)] =
    for {
      u <- 0L until 400L
      if (u + b) % 3 != 0 // each batch sees a different overlapping 2/3
      ty <- Seq("view", "cart")
    } yield (ty,
      java.sql.Timestamp.valueOf(s"2024-01-0${1 + (u % 3)} 0$b:00:00"),
      u)

  private def writeBatch(dir: String, b: Int): Unit = {
    val f = new java.io.File(dir, f"batch$b%03d.parquet")
    batchRows(b).toDF("event_type", "ts", "user_id").coalesce(1)
      .write.mode("overwrite").parquet(f.toString)
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }

  private def run(src: String, partials: String, ckpt: String): Unit = {
    val ev = spark.readStream
      .schema("event_type STRING, ts TIMESTAMP, user_id LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.sketchRollupStream(ev, partials, ckpt)
  }

  test("partials append per batch; read-side union estimates the overlapping global distinct") {
    val root = tempDir("graft-sketchstream")
    (0 until 3).foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/partials", root + "/ckpt")

    val partials = spark.read.parquet(root + "/partials")
    // day = 1 + u%3 and batch b drops the u ≡ -b (mod 3) class, so each
    // batch covers exactly 2 of the 3 days: 2 types x 2 days x 3 batches
    assert(partials.count() == 12)
    assert(partials.select("ingest_seq").distinct().count() == 3)

    val merged = StreamingIngest.distinctUsersFromPartials(spark, root + "/partials")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val all = (0 until 3).flatMap(batchRows)
    val exactUsers = all.filter(_._1 == "view").map(_._3).distinct.size // 400: union of the three 2/3 slices
    assert(exactUsers == 400)
    for (ty <- Seq("view", "cart")) {
      val (nPartials, approx, nRows) = merged(ty)
      assert(nPartials == 6, "2 covered days x 3 batches")
      assert(nRows == all.count(_._1 == ty), "exact row accounting rides along")
      assert(math.abs(approx - exactUsers).toDouble <= exactUsers * 0.05,
        s"$ty merged estimate $approx vs exact $exactUsers outside 5%")
      // the estimate must see THROUGH the overlap: well above any single
      // batch's population (267) — naive sum-of-partials would say 800+
      assert(approx > 300 && approx < 500)
    }

    // replay with a fresh checkpoint: landedSeq guards every append
    val before = spark.read.parquet(root + "/partials").count()
    run(root + "/src", root + "/partials", root + "/ckpt2")
    assert(spark.read.parquet(root + "/partials").count() == before,
      "replay must not double-append partials")
  }
}
