package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Streaming↔batch equivalence for the stream-stream interval joins
  * (round-4 item 5): a deterministic corpus is replayed file-by-file
  * (maxFilesPerTrigger=1, so join state genuinely crosses micro-batch
  * boundaries and survives in the state store), and the emitted rows must
  * equal an INDEPENDENTLY formulated batch interval join — written here
  * as a plain DataFrame join, not by re-running the streaming operator on
  * batch frames (which would compare the code with itself).
  */
class StreamBatchEquivalenceSpec extends SparkSuite {

  private val Horizon = "30 minutes"

  /** Deterministic corpus. Per user 0..9: clicks at 10:00/11:00/12:00
    * (+user minutes). Purchases exercise every attribution shape:
    * in-horizon match (users 0-4), out-of-horizon gap (5-7, 45 min —
    * misses its click), exact horizon boundary (8, +30:00 inclusive),
    * purchase with no click user (42), and users 9's clicks with no
    * purchase at all (pure outer-null rows).
    */
  private def corpus: (Seq[(Long, Long, String, Double)], Seq[(Long, Long, String, Double)]) = {
    def ts(h: Int, m: Int, s: Int = 0) = f"2026-01-01 $h%02d:$m%02d:$s%02d"
    val clicks = for {
      u <- 0L until 10L
      (h, i) <- Seq(10, 11, 12).zipWithIndex
    } yield (1000L + u * 10 + i, u, ts(h, u.toInt), 0.0)
    val purchases =
      (for (u <- 0L until 5L) yield (2000L + u, u, ts(10, u.toInt + 10), 5.0 + u)) ++
      (for (u <- 5L until 8L) yield (2100L + u, u, ts(10, u.toInt + 45), 7.0)) ++
      Seq((2200L, 8L, ts(10, 38), 9.0), // click at 10:08, +30:00 exactly
          (2300L, 42L, ts(10, 0), 1.0))
    (clicks, purchases)
  }

  private def writeFiles(dir: String, rows: Seq[(Long, Long, String, Double)], files: Int): Unit = {
    import spark.implicits._
    // time-ordered file chunks: within a source no event regresses past
    // the watermark horizon, so replay drops nothing and equivalence is exact
    val sorted = rows.sortBy(_._3)
    val per = math.max(1, (sorted.size + files - 1) / files)
    sorted.grouped(per).foreach { chunk =>
      chunk.toDF("event_id", "user_id", "s", "value")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("s")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
  }

  private def src(dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  private def batchFrames(base: String): (DataFrame, DataFrame) = {
    val c = spark.read.parquet(s"$base/clicks")
      .select(col("user_id").as("bc_user"), col("ts").as("bc_ts"), col("event_id").as("bc_id"))
    val p = spark.read.parquet(s"$base/purchases")
      .select(col("user_id").as("bp_user"), col("ts").as("bp_ts"),
        col("event_id").as("bp_id"), col("value").as("bp_value"))
    (c, p)
  }

  private val joinCond =
    expr(s"bc_user = bp_user AND bp_ts >= bc_ts AND bp_ts <= bc_ts + interval $Horizon")

  test("attributedPurchases replayed file-by-file equals an independent batch interval join") {
    val base = tempDir("graft-equiv-inner")
    val (clicks, purchases) = corpus
    writeFiles(s"$base/clicks", clicks, files = 3)
    writeFiles(s"$base/purchases", purchases, files = 3)

    StreamingIngest.runToParquet(
      StreamingIngest.attributedPurchases(src(s"$base/clicks"), src(s"$base/purchases"), Horizon),
      s"$base/sink", s"$base/ckpt")

    val got = spark.read.parquet(s"$base/sink")
      .select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "value")
      .collect().map(_.toSeq).toSet

    val (c, p) = batchFrames(base)
    val expected = p.join(c, joinCond)
      .select(col("bp_user"), col("bc_id"), col("bp_id"),
        col("bc_ts"), col("bp_ts"), col("bp_value"))
      .collect().map(_.toSeq).toSet

    assert(expected.nonEmpty, "corpus produced no attributed purchases — test is vacuous")
    assert(got == expected,
      s"stream != batch: only-stream=${(got -- expected).take(3)} only-batch=${(expected -- got).take(3)}")
  }

  test("clickConversions replayed + watermark flush equals an independent batch left-outer join") {
    val base = tempDir("graft-equiv-outer")
    val (clicks, purchases) = corpus
    writeFiles(s"$base/clicks", clicks, files = 3)
    writeFiles(s"$base/purchases", purchases, files = 3)

    def run(): Unit = StreamingIngest.runToParquet(
      StreamingIngest.clickConversions(src(s"$base/clicks"), src(s"$base/purchases"), Horizon),
      s"$base/sink", s"$base/ckpt")

    run()
    // flush: far-future traffic on BOTH sides pushes the global watermark
    // past every real click's seal point, forcing the outer nulls out; a
    // second run from the same checkpoint picks it up (outer-null emission
    // is inherently one-trigger delayed)
    writeFiles(s"$base/clicks", Seq((9000L, 999L, "2026-01-02 10:00:00", 0.0)), 1)
    writeFiles(s"$base/purchases", Seq((9001L, 999L, "2026-01-02 10:00:01", 0.0)), 1)
    run()

    val got = spark.read.parquet(s"$base/sink")
      .filter(col("user_id") =!= 999L)
      .select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "value", "converted")
      .collect().map(_.toSeq).toSet

    val (c, p) = batchFrames(base)
    val expected = c.filter(col("bc_user") =!= 999L).join(p, joinCond, "left_outer")
      .select(col("bc_user"), col("bc_id"), col("bc_ts"),
        col("bp_id"), col("bp_ts"), col("bp_value"),
        col("bp_id").isNotNull)
      .collect().map(_.toSeq).toSet

    assert(expected.exists(r => r.last == false), "corpus has no unconverted clicks — vacuous")
    assert(got == expected,
      s"stream != batch: only-stream=${(got -- expected).take(3)} only-batch=${(expected -- got).take(3)}")
  }

  test("streamingFunnel replayed over the real events corpus equals batch q52") {
    import spark.implicits._
    val base = tempDir("graft-equiv-funnel")
    // the REAL events table, time-ordered into 3 file chunks so funnel
    // state genuinely crosses micro-batch boundaries
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .orderBy("ts").collect()
    val per = math.max(1, (rows.length + 2) / 3)
    rows.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      val f = new java.io.File(s"$base/src", f"chunk$i%03d.parquet")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq, 1),
          rows.head.schema)
        .coalesce(1).write.mode("overwrite").parquet(f.toString)
      val ts = 1700000000000L + i * 60000L
      f.listFiles().foreach(_.setLastModified(ts)); f.setLastModified(ts)
    }
    def sentinel(name: String, s: String, mtime: Long): Unit = {
      val f = new java.io.File(s"$base/src", name)
      Seq((999999L, 999999L, s, "noop"))
        .toDF("event_id", "user_id", "s", "event_type")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("s")).as("ts"), col("event_type"))
        .coalesce(1).write.mode("overwrite").parquet(f.toString)
      f.listFiles().foreach(_.setLastModified(mtime)); f.setLastModified(mtime)
    }
    def src() = spark.readStream
      .schema("event_id LONG, user_id LONG, ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/src/*")
    // gap wider than the corpus span -> one activity window per user,
    // which is exactly q52's whole-history semantics
    def run(): Unit = StreamingIngest.runToParquet(
      StreamingIngest.streamingFunnel(spark, src(), gapMinutes = 90 * 24 * 60),
      s"$base/sink", s"$base/ckpt")
    run()
    // flush: far-future traffic pushes the watermark past every real
    // user's last_event + gap; timeout emission is one-trigger delayed,
    // so two sentinel batches across two runs
    sentinel("z1.parquet", "2024-12-31 00:00:00", 1700009000000L)
    run()
    sentinel("z2.parquet", "2025-06-01 00:00:00", 1700010000000L)
    run()

    val got = spark.read.parquet(s"$base/sink")
      .filter(col("user_id") =!= 999999L)
      .select(col("user_id"), col("stage_reached"),
        col("t_view").cast("timestamp_ntz"), col("t_click").cast("timestamp_ntz"),
        col("t_purchase").cast("timestamp_ntz"))
      .collect().map(_.toSeq).toSet
    val expected = graft.SparkEntry.queries("q52_funnel")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(expected.exists(_(1).asInstanceOf[Int] == 3), "no stage-3 users — vacuous")
    assert(got == expected,
      s"funnel stream != batch: only-stream=${(got -- expected).take(3)} only-batch=${(expected -- got).take(3)}")
  }

  test("componentStreamWithForgets over the real corpus + MID-STREAM edge-log compaction equals from-scratch CC over surviving edges (round-11 verdict item 2)") {
    import spark.implicits._
    val base = tempDir("graft-equiv-ccforget")
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 300).localCheckpoint(false)
    val edges = graft.ext.TextDedup.sharedShingleEdges(docs, "lang", 4)
      .withColumn("h", pmod(graft.ext.TextDedup.portableHash(
        concat_ws(":", col("doc_a"), col("doc_b")), "ccequiv"), lit(3L)))
      .localCheckpoint(false)
    def writeWave(b: Int, df: DataFrame): Unit =
      writeWaveTo(s"$base/src", b, df)
    def edgeWave(h: Long) = edges.filter(col("h") === h)
      .select(lit("edge").as("kind"), col("doc_a").cast("long"),
        col("doc_b").cast("long"))
    def forgetWave(c: org.apache.spark.sql.Column) =
      docs.filter(col("doc_id") % 7 === 0).filter(c)
        .select(lit("forget").as("kind"),
          col("doc_id").cast("long").as("doc_a"),
          lit(null).cast("long").as("doc_b"))
    // edge waves interleaved with two forget waves (% 14 first, the
    // rest of % 7 after the second edge wave)
    writeWave(0, edgeWave(0L))
    writeWave(1, forgetWave(col("doc_id") % 14 === 0))
    writeWave(2, edgeWave(1L))
    writeWave(3, forgetWave(col("doc_id") % 14 =!= 0))
    writeWave(4, edgeWave(2L))
    val events = spark.readStream
      .schema("kind STRING, doc_a LONG, doc_b LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/src/*")
    // maxEdgeFiles=1: the log compacts while batches are still arriving
    StreamingIngest.componentStreamWithForgets(events, s"$base/comps",
      s"$base/edges", s"$base/tombs", s"$base/ckpt", maxEdgeFiles = 1)
    val standing = graft.pipeline.ManifestTable.read(spark, s"$base/comps")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent batch formulation: blind from-scratch CC over
    // (all edges - forgotten nodes), nothing incremental
    val surviving = edges
      .filter(col("doc_a") % 7 =!= 0 && col("doc_b") % 7 =!= 0)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val expect = graft.operators.ConnectedComponents.labels(surviving)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // read convention: absent nodes are singletons — compare over the
    // union of keys with the coalesce contract applied to both sides
    val keys = standing.keySet ++ expect.keySet
    def norm(m: Map[Long, Long]) =
      keys.map(k => k -> m.getOrElse(k, k)).toMap
    assert(keys.nonEmpty, "no components formed — vacuous")
    assert(norm(standing) == norm(expect),
      s"stream != batch CC: ${norm(standing).toSet -- norm(expect).toSet}")
    // forgotten nodes must not appear in the standing table at all
    assert(standing.keySet.forall(_ % 7 != 0), "forgotten node survived")
    // the compaction really ran: log holds no tombstone-adjacent edge
    val log = spark.read.parquet(s"$base/edges")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(log.forall { case (a, b) => a % 7 != 0 && b % 7 != 0 },
      "stale tombstone-adjacent edges survived the per-batch compaction")
  }

  test("packStream: prefix-stable chunk ids (late arrivals never move packed docs), stream equals global batch pack, replay is a no-op") {
    import spark.implicits._
    import graft.ext.TextStats
    import graft.streaming.StreamingIngest
    val root = tempDir("graft-packstream")
    val mk = (rows: Seq[(Long, String, String)]) =>
      rows.toDF("doc_id", "source", "text")
    val w0 = mk(Seq((1L, "a", "x y z"), (2L, "a", "p q r s t"), (10L, "b", "u v")))
    val w1 = mk(Seq((3L, "a", "h i j k"), (11L, "b", "m n o")))
    val w2 = mk(Seq((4L, "a", "d e"), (12L, "b", "f g h i j k l")))
    def stream() = spark.readStream
      .schema("doc_id LONG, source STRING, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
    def packed(): Map[Long, (Long, Long)] =
      spark.read.parquet(root + "/pack").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("first_chunk"), r.getAs[Long]("last_chunk"))).toMap
    writeWaveTo(root + "/src", 0, w0)
    writeWaveTo(root + "/src", 1, w1)
    StreamingIngest.packStream(stream(), root + "/pack", root + "/ckpt", 4)
    val before = packed()
    // a LATE wave through the SAME checkpoint: everything already packed
    // must keep its chunk ids bit-for-bit (prefix stability)
    writeWaveTo(root + "/src", 2, w2)
    StreamingIngest.packStream(stream(), root + "/pack", root + "/ckpt", 4)
    val after = packed()
    assert(before.forall { case (id, span) => after(id) == span },
      "a late arrival moved an already-packed doc's chunks")
    // the streamed assignment equals ONE global batch pack over the
    // concatenated arrival order (waves are disjoint by construction;
    // within a wave the packer orders by (source, doc_id), so the
    // global order is wave-major — reproduce it with a synthetic
    // wave-major source key)
    val allWaves = Seq(w0, w1, w2).zipWithIndex
      .map { case (w, i) => w.withColumn("source",
        concat(lit(s"$i/"), col("source"))) }
      .reduce(_ unionByName _)
    val batch = TextStats.concatChunkPack(allWaves, 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("first_chunk"), r.getAs[Long]("last_chunk"))).toMap
    assert(after == batch,
      s"streamed pack diverged from the global batch pack\n stream: $after\n batch: $batch")
    // replay through a fresh checkpoint is a no-op (landed-seq guards)
    StreamingIngest.packStream(stream(), root + "/pack", root + "/ckpt2", 4)
    assert(packed() == after, "replay changed the packed log")
    assert(spark.read.parquet(root + "/pack").count() == after.size,
      "replay duplicated packed rows")
    // the scalar watermark view: reads the full-log token total, and a
    // DELETED view (the worst staleness) heals — the watermark and a
    // continued stream stay exact through the log-derived slow path
    val logTotal = spark.read.parquet(root + "/pack")
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(StreamingIngest.packWatermark(spark, root + "/pack") == logTotal,
      "view-backed watermark diverged from the log total")
    val fs = new org.apache.hadoop.fs.Path(root + "/pack_offset_view")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root + "/pack_offset_view"), true)
    assert(StreamingIngest.packWatermark(spark, root + "/pack") == logTotal,
      "watermark must heal from the log when the view is gone")
    writeWaveTo(root + "/src", 3, mk(Seq((5L, "a", "z z z z z"))))
    StreamingIngest.packStream(stream(), root + "/pack", root + "/ckpt", 4)
    val cont = packed()
    assert(after.forall { case (id, span) => cont(id) == span },
      "the post-heal continuation moved an already-packed doc")
    assert(cont(5L) == (logTotal / 4, (logTotal + 5 - 1) / 4),
      s"the post-heal arrival must pack at the healed watermark: ${cont(5L)}")
    assert(StreamingIngest.packWatermark(spark, root + "/pack") == logTotal + 5,
      "the view must be rebuilt by the continuation")
  }

  test("packStream chunk view: the standing per-chunk rollup equals the batch recompute through waves, replay, and per-batch compaction (round-16, r15 verdict item 7)") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val root = tempDir("graft-packchunkview")
    val mk = (rows: Seq[(Long, String, String)]) =>
      rows.toDF("doc_id", "source", "text")
    val w0 = mk(Seq((1L, "a", "x y z"), (2L, "a", "p q r s t"), (10L, "b", "u v")))
    val w1 = mk(Seq((3L, "a", "h i j k"), (11L, "b", "m n o")))
    val w2 = mk(Seq((4L, "a", "d e"), (12L, "b", "f g h i j k l")))
    def stream() = spark.readStream
      .schema("doc_id LONG, source STRING, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
    def run(ckpt: String, maxViewFiles: Int = 64) =
      StreamingIngest.packStream(stream(), root + "/pack",
        root + ckpt, 4, chunkViewDir = Some(root + "/cview"),
        maxViewFiles = maxViewFiles)
    def view(): Map[Long, (Long, Long)] =
      StreamingIngest.packChunkView(spark, root + "/cview").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // batch recompute (x148's dataflow) over the packed log itself
    def truth(): Map[Long, (Long, Long)] =
      spark.read.parquet(root + "/pack")
        .select(col("first_chunk"),
          explode(sequence(col("first_chunk"), col("last_chunk"))).as("chunk_id"))
        .groupBy(col("chunk_id"))
        .agg(count(lit(1)).as("n_segments"),
          sum((col("first_chunk") === col("chunk_id")).cast("long")).as("n_started"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    writeWaveTo(root + "/src", 0, w0)
    writeWaveTo(root + "/src", 1, w1)
    run("/ckpt")
    assert(view() == truth(), "chunk view diverged after waves 0-1")
    // replay through a fresh checkpoint while the delta log is
    // UNCOMPACTED: landed-seq guards make every delta append a no-op
    run("/ckpt2")
    assert(view() == truth(), "replay double-counted the chunk view")
    // late wave under the AGGRESSIVE cadence (fold every batch): the
    // view must survive its own compaction
    writeWaveTo(root + "/src", 2, w2)
    run("/ckpt", maxViewFiles = 0)
    assert(view() == truth(), "chunk view diverged after the late wave + fold")
    // fresh-checkpoint FULL replay after the fold re-stamped every row
    // with the max seq: the view's max-seq replay guard (insert-only
    // deltas land in batch order) must still read every batch as landed
    run("/ckpt3")
    assert(view() == truth(), "post-fold full replay double-counted the view")
    // sanity on the content itself: every segment accounted once
    assert(view().values.map(_._1).sum ==
      spark.read.parquet(root + "/pack")
        .select(col("last_chunk") - col("first_chunk") + lit(1L))
        .collect().map(_.getLong(0)).sum,
      "total segments != sum of per-doc chunk spans")
  }
}
