package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables
import graft.streaming.StreamingIngest

/** Structured Streaming rollup over a file stream must agree with the
  * batch q22 rollup on the same data (stream/batch unification check).
  */
class StreamingSpec extends SparkSuite {

  test("streaming hourly rollup matches batch rollup") {
    // stage the (ns→µs normalized) events as a stream source dir
    val dir = tempDir("graft-stream") + "/events"
    val events = Tables.events(spark, sf)
    events.write.parquet(dir)

    val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
    StreamingIngest.runToMemory(
      StreamingIngest.hourlyRollup(stream), "rollup", mode = "complete")

    val streamed = spark.table("rollup")
      .select(col("hour_start").cast("long"), col("event_type"), col("n"))
      .orderBy("hour_start", "event_type")
      .collect()

    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("hour_start"),
        col("event_type"), col("n"))
      .orderBy("hour_start", "event_type")
      .collect()

    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }

  test("streaming sessionization emits finalized sessions that match batch session_window") {
    val dir = tempDir("graft-stream3") + "/events"
    val events = Tables.events(spark, sf)
    events.write.parquet(dir)

    val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
    StreamingIngest.runToMemory(
      StreamingIngest.sessionized(stream), "sessions", mode = "append")

    val streamed = spark.table("sessions")
      .select(col("user_id"), col("session_start").cast("long"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)

    val batch = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").cast("long"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // append mode withholds sessions still inside the watermark; everything
    // emitted must agree with the batch computation
    assert(streamed.subsetOf(batch), "streamed session not present in batch result")
  }

  test("EventTimeTimeout custom sessions match batch session_window sessions") {
    val dir = tempDir("graft-stream7") + "/events"
    val events = Tables.events(spark, sf)
    events.write.parquet(dir)

    val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
    StreamingIngest.runToMemory(
      StreamingIngest.customSessions(spark, stream), "custom_sessions", mode = "append")

    val streamed = spark.table("custom_sessions")
      .select(col("user_id"), col("session_start").cast("long"),
        col("session_end").cast("long"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "watermark must finalize at least the closed sessions")

    // batch ground truth: session_window with identical gap/end semantics
    // (end = last event + gap)
    val batch = Tables.events(spark, sf).na.drop(Seq("user_id", "ts", "value"))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").cast("long"),
        col("session_window.end").cast("long"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.subsetOf(batch),
      s"custom session not in batch session_window result: ${streamed.diff(batch).take(3)}")
  }

  test("customSessions: a within-watermark late event extends an open session backward across micro-batches") {
    import spark.implicits._
    val base = tempDir("graft-stream8")
    val src = s"$base/src"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    def write(rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("user_id", "s", "value")
        .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE").parquet(src)
      StreamingIngest.runToParquet(
        StreamingIngest.customSessions(spark, stream), sink, ckpt)
    }
    // batch 1: one sealed-by-watermark session (10:00-10:10) and an open
    // one at 13:00 (13:00 also drives the watermark to 12:00)
    write(Seq((1L, "2026-01-01 10:00:00", 1.0), (1L, "2026-01-01 10:10:00", 1.0),
      (1L, "2026-01-01 13:00:00", 1.0)))
    run()
    // batch 2 (restart from checkpoint): 12:30 is LATE but above the
    // 12:00 watermark - it must extend the open 13:00 session BACKWARD
    // (the pre-fix code kept start=13:00); 15:00 pushes the watermark to
    // 14:00, sealing that session
    write(Seq((1L, "2026-01-01 12:30:00", 1.0), (1L, "2026-01-01 15:00:00", 1.0)))
    run()
    val got = spark.read.parquet(sink)
      .select(col("session_start").cast("string"), col("session_end").cast("string"),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2026-01-01 10:00:00", "2026-01-01 10:40:00", 2L),
      ("2026-01-01 12:30:00", "2026-01-01 13:30:00", 2L)), got.toString)
  }

  test("mergeEvent: order-independent, extends start backward, bridges open sessions") {
    import StreamingIngest.{mergeEvent, OpenSession}
    val gap = 30 * 60 * 1000L
    def min(x: Long) = x * 60 * 1000L
    def run(ts: Seq[Long]) = ts.foldLeft(List.empty[OpenSession])(
      (ss, t) => mergeEvent(ss, t, 1.0, gap)).sortBy(_.start)

    // 0min and 50min are separate sessions (gap 30); 25min bridges both
    val separate = run(Seq(min(0), min(50)))
    assert(separate.map(s => (s.start, s.lastTs, s.n)) ==
      List((min(0), min(0), 1L), (min(50), min(50), 1L)))
    val bridged = run(Seq(min(0), min(50), min(25)))
    assert(bridged.map(s => (s.start, s.lastTs, s.n)) ==
      List((min(0), min(50), 3L)))
    // arrival order must not matter (the round-3 single-session state
    // merged any out-of-order event and never extended start)
    assert(run(Seq(min(25), min(50), min(0))) == bridged)
    // a late event within gap BEFORE the open session extends its start
    val backward = run(Seq(min(60), min(40)))
    assert(backward.map(s => (s.start, s.lastTs, s.n)) ==
      List((min(40), min(60), 2L)))
    // a late event more than gap before the session opens its own
    val distinct = run(Seq(min(60), min(10)))
    assert(distinct.map(s => (s.start, s.n)) == List((min(10), 1L), (min(60), 1L)))
  }

  test("mapGroupsWithState running totals converge to the batch aggregate") {
    val dir = tempDir("graft-stream5") + "/events"
    val events = Tables.events(spark, sf)
    events.write.parquet(dir)

    val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
    StreamingIngest.runToMemoryUpdate(
      StreamingIngest.runningUserTotals(spark, stream), "running")

    // update mode emits one row per user per batch; the LAST row per user
    // is the converged state
    val finalRows = spark.table("running")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val batch = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalRows == batch)
  }

  test("runToParquet: checkpointed sink is exactly-once across restarts") {
    val base = tempDir("graft-stream4")
    val src = s"$base/src"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    val events = Tables.events(spark, sf).limit(200)
    events.write.parquet(src)

    val run1 = StreamingIngest.eventsStream(spark, src, events.schema)
    StreamingIngest.runToParquet(run1.select(col("event_id"), col("event_type")), sink, ckpt)
    assert(spark.read.parquet(sink).count() == 200)

    // restart with the same checkpoint and no new input: no duplicates
    val run2 = StreamingIngest.eventsStream(spark, src, events.schema)
    StreamingIngest.runToParquet(run2.select(col("event_id"), col("event_type")), sink, ckpt)
    assert(spark.read.parquet(sink).count() == 200)
  }

  test("foreachBatch chains ingest -> report recompute (downstream-trigger shape)") {
    val base = tempDir("graft-stream6")
    val src = s"$base/src"; val landing = s"$base/landing"
    val report = s"$base/report"; val ckpt = s"$base/ckpt"
    val events = Tables.events(spark, sf).limit(300)
    events.write.parquet(src)

    StreamingIngest.ingestThenReport(
      StreamingIngest.eventsStream(spark, src, events.schema),
      landing, report, ckpt) { landed =>
      landed.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }

    assert(spark.read.parquet(landing).count() == 300)
    val reported = spark.read.parquet(report)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected from the MATERIALIZED source (limit() without ordering is
    // not deterministic across re-evaluations)
    val expected = spark.read.parquet(src)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reported == expected)
  }

  test("dedupedStream drops redelivered event_ids within the watermark") {
    val dir = tempDir("graft-stream2") + "/events"
    val events = Tables.events(spark, sf).limit(100)
    // redeliver everything twice
    events.unionAll(events).write.parquet(dir)

    val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
    StreamingIngest.runToMemory(
      StreamingIngest.dedupedStream(stream)
        .groupBy().agg(count(lit(1)).as("n")),
      "deduped", mode = "complete")

    assert(spark.table("deduped").first().getLong(0) == 100L)
  }

  test("dedupedDocs keeps one row per distinct fingerprint (streaming doc dedup)") {
    val dir = tempDir("graft-stream3") + "/docs"
    val docs = Tables.documents(spark, sf).limit(50)
      .withColumn("ingest_ts", lit("2026-01-01 00:00:00").cast("timestamp"))
    // formatting variants of the same content must collapse too
    val variants = docs
      .withColumn("text", upper(col("text")))  // different fingerprint
      .withColumn("doc_id", col("doc_id") + 100000)
    val dups = docs.unionAll(docs).unionAll(variants)
    dups.write.parquet(dir)

    val stream = StreamingIngest.eventsStream(spark, dir, dups.schema)
    StreamingIngest.runToMemory(
      StreamingIngest.dedupedDocs(stream).groupBy().agg(count(lit(1)).as("n")),
      "doc_dedup", mode = "complete")

    val expected = graft.ext.TextStats.fingerprint(spark.read.parquet(dir))
      .select("fingerprint").distinct().count()
    assert(spark.table("doc_dedup").first().getLong(0) == expected)
  }

  test("stream-stream interval join matches the batch interval join") {
    val base = tempDir("graft-stream-ss")
    val events = Tables.events(spark, sf).limit(2000)
    events.filter(col("event_type") === "click").write.parquet(s"$base/clicks")
    events.filter(col("event_type") === "purchase").write.parquet(s"$base/purchases")

    val clicks = StreamingIngest.eventsStream(spark, s"$base/clicks", events.schema)
    val purchases = StreamingIngest.eventsStream(spark, s"$base/purchases", events.schema)
    StreamingIngest.runToMemory(
      StreamingIngest.attributedPurchases(clicks, purchases), "attributed",
      mode = "append")

    val got = spark.table("attributed")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = StreamingIngest.attributedPurchases(
        spark.read.parquet(s"$base/clicks"), spark.read.parquet(s"$base/purchases"))
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && expected.nonEmpty,
      s"stream ${got.size} pairs vs batch ${expected.size}")
  }

  test("left-outer stream-stream join: unconverted clicks emit only after the watermark seals them") {
    import spark.implicits._
    val base = tempDir("graft-stream-sso")
    val clicksDir = s"$base/clicks"; val purchDir = s"$base/purchases"
    val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    def write(dir: String, rows: Seq[(Long, Long, String, Double)]): Unit =
      rows.toDF("event_id", "user_id", "s", "value")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("s")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(dir)
    def run(): Unit = {
      def src(dir: String) = spark.readStream
        .schema("event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE")
        .parquet(dir)
      StreamingIngest.runToParquet(
        StreamingIngest.clickConversions(src(clicksDir), src(purchDir)), sink, ckpt)
    }
    // batch 1: user 1 converts within the horizon; user 2's click has no
    // purchase — its outer null may NOT emit yet (watermark still behind)
    write(clicksDir, Seq((100L, 1L, "2026-01-01 10:00:00", 0.0),
      (101L, 2L, "2026-01-01 10:05:00", 0.0)))
    write(purchDir, Seq((200L, 1L, "2026-01-01 10:10:00", 9.99)))
    run()
    val afterB1 = spark.read.parquet(sink)
      .filter(!col("converted")).count()
    assert(afterB1 == 0, s"outer null emitted before watermark sealed it")
    // batch 2: late traffic on BOTH sides pushes the global watermark past
    // 10:05 + 30min, sealing user 2's click as unconverted
    write(clicksDir, Seq((102L, 9L, "2026-01-01 15:00:00", 0.0)))
    write(purchDir, Seq((201L, 9L, "2026-01-01 15:00:01", 1.0)))
    run()
    val rows = spark.read.parquet(sink)
      .select(col("click_id"), col("purchase_id"), col("converted"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getBoolean(2))).toSet
    assert(rows.contains((100L, 200L, true)), s"converted click missing: $rows")
    assert(rows.contains((101L, -1L, false)), s"sealed unconverted click missing: $rows")
  }

  test("stream-static enrichment matches the batch broadcast join") {
    val dir = tempDir("graft-stream4") + "/events"
    val events = Tables.events(spark, sf).limit(500)
    events.write.parquet(dir)
    val dim = Tables.customer(spark, sf)

    val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
    StreamingIngest.runToMemory(
      StreamingIngest.enriched(stream, dim)
        .groupBy(col("segment")).agg(count(lit(1)).as("n")),
      "enriched_counts", mode = "complete")

    val expected = StreamingIngest.enriched(spark.read.parquet(dir), dim)
      .groupBy(col("segment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = spark.table("enriched_counts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("TTL'd running totals agree with the untimed variant within the TTL window") {
    val dir = tempDir("graft-stream6") + "/events"
    val events = Tables.events(spark, sf).limit(500)
    events.write.parquet(dir)
    val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
    // a query with registered ProcessingTimeTimeouts never self-reports
    // "all available processed" (both awaitTermination under AvailableNow
    // and processAllAvailable block until the TTL fires) — bound the wait
    // and stop explicitly; the 500-row batch completes in seconds
    val q = StreamingIngest.runningUserTotalsWithTtl(spark, stream, ttl = "1 hour")
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .format("memory").queryName("ttl_totals")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    q.stop()
    // nothing times out inside one AvailableNow run, so the final row per
    // user must equal the batch aggregate (same check as the untimed op)
    val got = spark.table("ttl_totals")
      .groupBy(col("user_id")).agg(max(col("n_events")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = spark.read.parquet(dir).na.drop(Seq("user_id", "value"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("transformWithState (v2 state API) totals equal the mapGroupsWithState rendering") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // transformWithState requires the RocksDB provider (the only backend
    // implementing the v2 state schema)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = tempDir("graft-tws") + "/events"
      val events = Tables.events(spark, sf).limit(1000)
      events.write.parquet(dir)
      def converged(table: String): Map[Long, (Long, Double)] =
        spark.table(table).groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n"), max(col("total_value")).as("t"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      StreamingIngest.runToMemoryUpdate(
        StreamingIngest.runningUserTotalsTws(spark,
          StreamingIngest.eventsStream(spark, dir, events.schema)), "tws_totals")
      StreamingIngest.runToMemoryUpdate(
        StreamingIngest.runningUserTotals(spark,
          StreamingIngest.eventsStream(spark, dir, events.schema)), "v1_totals")
      val tws = converged("tws_totals")
      assert(tws == converged("v1_totals"))
      val batchN = events.na.drop(Seq("user_id", "value"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(tws.view.mapValues(_._1).toMap == batchN)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stateful streams run on the RocksDB state store (production backend)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = tempDir("graft-stream5") + "/events"
      val events = Tables.events(spark, sf).limit(1000)
      events.write.parquet(dir)
      val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
      StreamingIngest.runToMemory(
        StreamingIngest.hourlyRollup(stream), "rocksdb_rollup", mode = "complete")
      val n = spark.table("rocksdb_rollup").agg(sum(col("n"))).first().getLong(0)
      assert(n == 1000L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
