package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming rendering of the reference's micro-batch ingest
  * loop (SURVEY §2.10): the hourly cron + watermark + bounded slice
  * pattern becomes `readStream` → event-time watermark → windowed agg →
  * `writeStream`, with `Trigger.AvailableNow` standing in for the
  * cron-with-catchup-off behavior.
  */
object StreamingIngest {

  /** File-source stream over a parquet directory (schema required by
    * Structured Streaming; see graft.sources.Tables.eventsSchema).
    */
  def eventsStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling 1h rollup per event_type with a 1h late-data watermark —
    * the streaming twin of batch query q22_hourly_rollup.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("val"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("val"))

  /** Run a streaming DataFrame to a named in-memory sink until all
    * currently-available input is processed (local smoke path; a real
    * deployment writes parquet with checkpointing).
    */
  def runToMemory(df: DataFrame, name: String, mode: String = "complete"): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Production sink: checkpointed parquet append. The checkpoint dir
    * carries the source offsets (the streaming rendering of the
    * reference's max-block-number watermark) so a restarted query
    * resumes exactly-once into the sink.
    */
  def runToParquet(df: DataFrame, sinkDir: String, checkpointDir: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** "Table not created yet" is the ONLY condition the foreachBatch
    * loops may read as empty/not-landed: a blanket Try(...).getOrElse
    * would also swallow transient FS errors and corrupt footers,
    * silently probing an empty index / re-appending an already-landed
    * batch — exactly the invariant breakages the seq-stamp machinery
    * exists to prevent (round-7 advisory). Existence is checked
    * explicitly; every OTHER exception propagates and fails the batch
    * so Structured Streaming retries it.
    */
  private def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Replay guard for seq-stamped appends: has `dir`'s append for this
    * `ingest_seq` completed? (See [[pathExists]] for the failure
    * posture.) Marker-first (round-16 optimization round, mirroring
    * [[graft.pipeline.Bucketing.landedSeqBucketed]]): when the dir
    * carries a `_graft_landed_*` marker the answer is one filesystem
    * glob — strictly STRONGER than the row probe (a crashed partial
    * publish has rows with this stamp but no marker) and, on the happy
    * path, removes the one full Spark job + schema inference every
    * batch paid per log just to re-learn that nothing crashed. The row
    * probe remains as the fallback for marker-less dirs (pre-round-16
    * layouts, or dirs whose marker a foreign rewrite dropped — the
    * degradation is back to exactly the old behavior).
    */
  private def landedSeq(spark: SparkSession, dir: String, batchId: Long): Boolean =
    pathExists(spark, dir) && {
      val loc = new org.apache.hadoop.fs.Path(dir)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.pipeline.Bucketing.landedMarkerSeqAt(fs, loc) match {
        case Some(m) => m >= batchId
        case None =>
          graft.pipeline.Ingest.withJobDesc(spark, s"graft:landed-probe s$batchId") {
            spark.read.parquet(dir)
              .filter(col("ingest_seq") === batchId).limit(1).count() > 0
          }
      }
    }

  /** Incremental append with dedup-within-watermark — the streaming
    * answer to the reference's at-least-once redelivery (ReplacingMergeTree
    * shape): duplicate event_ids arriving within the watermark collapse.
    */
  def dedupedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** §2.10 "downstream trigger": the reference's ingest DAG fires the
    * report DAG on completion (export_blocks_and_events_dag.py:111-117).
    * Streaming rendering: `foreachBatch` appends the micro-batch to the
    * landing table and recomputes the downstream report in the same
    * transaction scope — ingest and derived table stay in lockstep
    * without an external scheduler.
    */
  def ingestThenReport(
      events: DataFrame, landingDir: String, reportDir: String, checkpointDir: String)(
      report: DataFrame => DataFrame): StreamingQuery = {
    val q = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // foreachBatch is at-least-once: a crash after the append but
        // before the epoch commit replays this batchId. The ingest_seq
        // stamp doubles as the replay guard — if the sink already holds
        // this batch, skip the append and only refresh the report.
        if (!landedSeq(spark, landingDir, batchId)) {
          graft.pipeline.Ingest.appendWithSeq(batch.toDF(), landingDir, batchId)
        }
        val landed = spark.read.parquet(landingDir)
        graft.pipeline.Ingest.publishReport(report(landed), reportDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Accumulated per-user state carried across micro-batches. */
  case class UserState(n_events: Long, total_value: Double)

  /** Custom arbitrary state via `mapGroupsWithState`: a running per-user
    * (event count, value total) that survives across micro-batches — the
    * KeyValueGroupedDataset state API for logic windowed aggregates can't
    * express. Update-mode output: one refreshed row per user per batch.
    * State lives in the state store (checkpointed, partitioned by key),
    * so memory per executor is O(active users / partitions).
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    // drop nulls before the primitive-tuple encoder (a null user_id/value
    // would fail the stream where the batch twin's sum would skip it)
    events.select(col("user_id"), col("value")).na.drop().as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, (Long, Long, Double)](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n_events
          var t = prev.total_value
          rows.foreach { case (_, v) => n += 1; t += v }
          state.update(UserState(n, t))
          (uid, n, t)
      }
      .toDF("user_id", "n_events", "total_value")
  }

  /** [[runningUserTotals]] on Spark 4's `transformWithState` — the
    * successor state API (SPARK-46815, "arbitrary stateful processing
    * v2") the engine should be ready for as `mapGroupsWithState`
    * freezes: typed named state handles (`ValueState` here; List/Map
    * state and per-key timers are the new capabilities), lifecycle
    * `init`/`close`, and first-class TTL via `TTLConfig` instead of a
    * timeout channel multiplexed through the row path. Semantics are
    * identical to [[runningUserTotals]] — StreamingSpec asserts the two
    * renderings emit the same totals on the same replay. Requires the
    * RocksDB state store provider (the only backend implementing the
    * v2 state schema), which the engine already exercises.
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), (Long, Long, Double)] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[UserState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserState]("totals",
        org.apache.spark.sql.Encoders.product[UserState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, Double)],
        timerValues: org.apache.spark.sql.streaming.TimerValues):
        Iterator[(Long, Long, Double)] = {
      val prev = Option(totals.get()).getOrElse(UserState(0L, 0.0))
      var n = prev.n_events
      var t = prev.total_value
      rows.foreach { case (_, v) => n += 1; t += v }
      totals.update(UserState(n, t))
      Iterator.single((uid, n, t))
    }
  }

  /** [[runningUserTotals]] rendered on the v2 state API — see
    * [[RunningTotalsProcessor]].
    */
  def runningUserTotalsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).na.drop().as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
      .toDF("user_id", "n_events", "total_value")
  }

  /** [[runningUserTotals]] with a state TTL — the unbounded-key-space
    * knob (ROADMAP): `GroupStateTimeout.ProcessingTimeTimeout` expires
    * state for keys idle longer than `ttl`, so abandoned users stop
    * occupying the state store forever. A timed-out key re-starts its
    * totals from zero on next arrival (emit-and-forget; an exact
    * continuation would persist the evicted total to a sink first).
    */
  def runningUserTotalsWithTtl(spark: SparkSession, events: DataFrame,
      ttl: String = "1 hour"): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).na.drop().as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, Option[(Long, Long, Double)]](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            state.remove()
            None
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0))
            var n = prev.n_events
            var t = prev.total_value
            rows.foreach { case (_, v) => n += 1; t += v }
            state.update(UserState(n, t))
            state.setTimeoutDuration(ttl)
            Some((uid, n, t))
          }
      }
      .flatMap(_.toSeq)
      .toDF("user_id", "n_events", "total_value")
  }

  /** Run an update-mode stateful stream to a named memory sink. */
  def runToMemoryUpdate(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Gap-based sessionization per user (30-min inactivity closes the
    * session) — `session_window` keeps per-key state across micro-batches;
    * the watermark bounds that state. Batch twin: q25_sessionize.
    */
  def sessionized(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("val"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("val"))

  /** One user's open session under [[customSessions]]: timestamps in
    * epoch millis, value total running. One open session per user is the
    * whole state — bounded by the watermark horizon.
    */
  case class OpenSession(start: Long, lastTs: Long, n: Long, total: Double)

  /** All concurrently-open sessions of one key, unordered. */
  case class OpenSessionSet(sessions: List[OpenSession])

  /** Merge one event into a session set: every session whose gap
    * interval `[start - gap, lastTs + gap]` covers `t` fuses with the
    * event (and, transitively, with each other — a late event can
    * BRIDGE two previously-separate sessions into one, exactly as
    * batch `session_window` would). Events that overlap nothing open a
    * new session. Interval union is commutative, so the result is
    * independent of arrival order — the property that makes the
    * streaming operator match its batch twin on out-of-order input.
    */
  private[graft] def mergeEvent(sessions: List[OpenSession], t: Long,
      v: Double, gapMs: Long): List[OpenSession] = {
    val (overlap, rest) = sessions.partition(s =>
      t >= s.start - gapMs && t <= s.lastTs + gapMs)
    overlap.foldLeft(OpenSession(t, t, 1, v)) { (a, s) =>
      OpenSession(math.min(a.start, s.start), math.max(a.lastTs, s.lastTs),
        a.n + s.n, a.total + s.total)
    } :: rest
  }

  /** Custom-state sessionization via `flatMapGroupsWithState` +
    * `EventTimeTimeout` — the state-API rendering of [[sessionized]],
    * for session logic `session_window` cannot express (custom
    * per-session payloads, cross-session carry-over). Completes the
    * timeout-family inventory (ROADMAP): NoTimeout
    * ([[runningUserTotals]]), ProcessingTimeTimeout
    * ([[runningUserTotalsWithTtl]]), EventTimeTimeout (here).
    *
    * Sessions are sealed and emitted only when the WATERMARK passes
    * `last_event + gap` — the same finalization rule as the built-in
    * streaming `session_window`, and the only sound one: any
    * within-watermark late event may still extend a session backward
    * (`start = min`), start an earlier separate session, or bridge two
    * open sessions ([[mergeEvent]]). The round-3 version merged every
    * out-of-order event into the single open session (a negative delta
    * is always < gap) and never extended `start` — diverging from the
    * batch semantics it claimed (round-4 review finding); state is now
    * the SET of open sessions, bounded by the watermark horizon. The
    * event-time timeout makes replay deterministic — the guarantee
    * ProcessingTimeTimeout cannot offer. Rows beyond the watermark are
    * dropped by the operator before the function runs, which is what
    * keeps the timeout timestamp always ≥ watermark.
    */
  def customSessions(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), col("value")).na.drop()
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSessionSet,
        (Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
            state: GroupState[OpenSessionSet]) =>
          def emit(s: OpenSession) = (uid, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.lastTs + gapMs), s.n, s.total)
          val wm = state.getCurrentWatermarkMs()
          var sessions = state.getOption.map(_.sessions).getOrElse(Nil)
          rows.foreach { case (_, ts, v) =>
            sessions = mergeEvent(sessions, ts.getTime, v, gapMs)
          }
          // a session the watermark has passed can never change again
          val (finalized, open) = sessions.partition(_.lastTs + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessionSet(open))
            state.setTimeoutTimestamp(
              math.max(open.map(_.lastTs).min + gapMs, wm + 1))
          }
          finalized.sortBy(_.start).iterator.map(emit)
      }
      .toDF("user_id", "session_start", "session_end", "n_events", "val")
  }

  /** Per-user ordered-funnel window state ([[streamingFunnel]]):
    * view/click/purchase timestamps in MICROS (millis would erase the
    * sub-millisecond ordering the batch twin resolves ties with) seen
    * inside the current activity window, resolution deferred to seal
    * time — a late-but-within-watermark view can lower the first-view
    * time and retroactively qualify earlier clicks, so eager resolution
    * would diverge from the batch semantics on out-of-order input.
    *
    * State is NOT bounded by the watermark (the watermark only drops
    * late INPUT rows; a continuously-active user keeps one activity
    * window open indefinitely — round-7 advisory); it is bounded by
    * [[pruneFunnel]]: only timestamps that can still affect seal-time
    * resolution are retained (min view; clicks/purchases not dominated
    * by a smaller same-type timestamp already above the resolution
    * bound), plus a hard per-list cap for the adversarial tail.
    */
  case class FunnelWindow(views: List[Long], clicks: List[Long],
      purchases: List[Long], lastTs: Long)

  /** Hard per-list cap on retained funnel timestamps. Dominance pruning
    * is exact; the cap only bites on the adversarial shape it cannot
    * bound (an ever-decreasing view stream interleaved with clicks just
    * below the running min view — every such click remains a potential
    * answer). Overflow policy: keep the `cap` SMALLEST retained
    * timestamps — a dropped (larger) one can only have been the answer
    * if the final min view lands between the largest kept and the
    * dropped one, in which case resolution falls to the above-bound
    * candidate instead: stage counts never over-report, and first-times
    * err late only past 4096 live candidates per list.
    */
  val MaxFunnelTimestamps: Int = 4096

  /** Prune [[FunnelWindow]] state to the timestamps that can still
    * change seal-time resolution (tv = min view; tc = min click > tv;
    * tp = min purchase > tc), exploiting that tv only DECREASES as
    * events merge:
    *  - views: only the min can ever matter — keep one.
    *  - clicks: any click above the CURRENT min view qualifies for
    *    every possible final tv (tv only moves down), so the smallest
    *    such click dominates all larger ones — keep it, plus every
    *    click ≤ min view (each is the answer for some final tv).
    *  - purchases: same dominance against the current tc upper bound
    *    (the smallest click above min view); with no such bound yet,
    *    every purchase is a potential answer — dedup + cap only.
    * Exact duplicates never change min-based resolution and are always
    * dropped. Resolution on pruned state is identical to resolution on
    * the full history (FunnelPruneSpec property-tests this).
    */
  def pruneFunnel(s: FunnelWindow): FunnelWindow = {
    def keep(all: List[Long], bound: Option[Long]): List[Long] = {
      val distinct = all.distinct
      val retained = bound match {
        case Some(b) =>
          val (below, above) = distinct.partition(_ <= b)
          below ++ above.minOption.toList
        case None => distinct
      }
      retained.sorted.take(MaxFunnelTimestamps)
    }
    val mv = s.views.minOption
    val clicks = keep(s.clicks, mv)
    val tcHi = mv.flatMap(v => clicks.filter(_ > v).minOption)
    FunnelWindow(mv.toList, clicks, keep(s.purchases, tcHi), s.lastTs)
  }

  /** Streaming ordered-funnel analysis via `flatMapGroupsWithState` +
    * `EventTimeTimeout` — the continuous rendering of batch q52
    * (view → click-after-it → purchase-after-that): per user, one
    * funnel row per ACTIVITY WINDOW (sealed when the watermark passes
    * `last_event + gap`, the session-sealing rule), carrying the stage
    * reached and the three resolved first-times. With `gap` wider than
    * the corpus span this is exactly q52 — the equivalence
    * StreamBatchEquivalenceSpec replays. Completes the custom-state
    * family with an ordered-PATTERN state machine next to
    * [[customSessions]]' interval-union state.
    */
  def streamingFunnel(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 60): DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000000L * 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    events.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), col("event_type"))
      .na.drop(Seq("user_id", "ts"))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelWindow,
        (Long, Int, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
          Option[java.sql.Timestamp])](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
            state: GroupState[FunnelWindow]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            // the q52 resolution, run once on sealed state
            val tv = s.views.minOption
            val tc = tv.flatMap(v => s.clicks.filter(_ > v).minOption)
            val tp = tc.flatMap(c => s.purchases.filter(_ > c).minOption)
            val stage =
              if (tp.isDefined) 3 else if (tc.isDefined) 2
              else if (tv.isDefined) 1 else 0
            Iterator.single((uid, stage, tv.map(fromMicros),
              tc.map(fromMicros), tp.map(fromMicros)))
          } else {
            var s = state.getOption.getOrElse(
              FunnelWindow(Nil, Nil, Nil, Long.MinValue))
            rows.foreach { case (_, t, et) =>
              val us = micros(t)
              val bumped = math.max(s.lastTs, us)
              s = et match {
                case "view" => s.copy(views = us :: s.views, lastTs = bumped)
                case "click" => s.copy(clicks = us :: s.clicks, lastTs = bumped)
                case "purchase" =>
                  s.copy(purchases = us :: s.purchases, lastTs = bumped)
                case _ => s.copy(lastTs = bumped)
              }
            }
            state.update(pruneFunnel(s))
            state.setTimeoutTimestamp(math.max(s.lastTs / 1000L + gapMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
      .toDF("user_id", "stage_reached", "t_view", "t_click", "t_purchase")
  }

  /** Streaming content dedup for a document ingest stream — the
    * streaming member of the dedup family: fingerprint each arriving doc
    * (md5 of whitespace-normalized lowercase text, the same key as batch
    * x10) and keep only first-seen fingerprints within the watermark.
    * State is one fingerprint per distinct doc, bounded by the watermark
    * horizon — at ingest scale that horizon (not the corpus size) sizes
    * the state store.
    */
  def dedupedDocs(docs: DataFrame, tsCol: String = "ingest_ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Stream-stream interval join (conversion attribution shape): each
    * purchase joins the same user's clicks from the preceding `horizon`.
    * BOTH sides are event-time watermarked and the join predicate bounds
    * purchase_ts to [click_ts, click_ts + horizon] — together these let
    * the engine drop buffered rows once the watermark passes the
    * interval, so join state is sized by rate × horizon, never by
    * stream length (the unbounded-state trap of an unconstrained
    * stream-stream join). Inner matches emit immediately; only state
    * RETENTION waits for the watermark.
    */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
        col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", horizon)
    val p = purchases.select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", horizon)
    p.join(c, expr(
      s"""c_user = user_id AND
         |purchase_ts >= click_ts AND
         |purchase_ts <= click_ts + interval $horizon""".stripMargin))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Left-outer variant of [[attributedPurchases]] (funnel drop-off as
    * a stream): every click emits exactly once — converted clicks as
    * soon as the purchase arrives, unconverted ones with null purchase
    * columns only after the watermark passes click_ts + horizon (the
    * earliest moment the engine can PROVE no match can still arrive;
    * outer-null emission is inherently watermark-delayed). Same bounded
    * state as the inner form.
    */
  def clickConversions(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
        col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", horizon)
    val p = purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("event_id").as("purchase_id"),
        col("value"))
      .withWatermark("purchase_ts", horizon)
    c.join(p, expr(
        s"""c_user = p_user AND
           |purchase_ts >= click_ts AND
           |purchase_ts <= click_ts + interval $horizon""".stripMargin),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("value"),
        col("purchase_id").isNotNull.as("converted"))
  }

  /** Streaming corpus dedup with a self-maintaining LSH signature index —
    * the continuous-ingest rendering of batch x51
    * (`TextDedup.incrementalDedup`). Each micro-batch of documents is
    * MinHash-signed (only the batch — the standing corpus is never
    * re-shingled), deduped against the index built by all PRIOR batches
    * plus itself (keep-min-id within the batch), and the survivors'
    * signature bands are appended back to the index, so per-batch cost
    * stays O(batch · touched index buckets) forever. Docs too short to
    * shingle carry no signature and pass through unjudged (nothing to
    * near-dup-match). Greedy arrival-order semantics: a document
    * survives iff nothing in any earlier batch (nor a smaller-id rival
    * in its own batch) matched it at `threshold`.
    *
    * Exactly-once under foreachBatch's at-least-once replay: both sinks
    * are stamped via `Ingest.appendWithSeq`, verdicts are computed
    * against the index restricted to `ingest_seq < batchId` (a replay
    * must not probe rows the crashed attempt already appended — every
    * batch doc would match itself and the replay would emit zero
    * survivors), and each append is skipped independently when its
    * directory already holds this batchId. The recomputation is
    * deterministic, so a half-committed batch heals to identical bytes.
    *
    * At 100 TB the index table is the bucketed-on-`band_hash` layout
    * (`Bucketing.writeBucketed` / `Ingest.compactBucketed`) so the
    * per-batch probe plans no index-side shuffle — IncrementalDedupSpec
    * locks that plan shape; this loop writes plain stamped appends and
    * leaves compaction cadence to the table owner.
    */
  def dedupedCorpusStream(docs: DataFrame, indexDir: String, survivorsDir: String,
      checkpointDir: String, threshold: Double = 0.5,
      maxBucket: Int = graft.ext.TextDedup.DefaultMaxBucket): StreamingQuery = {
    import graft.ext.TextDedup
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        def landed(dir: String): Boolean = landedSeq(spark, dir, batchId)
        val b = batch.toDF().localCheckpoint(false)
        // sign ONLY the batch; lazy-checkpoint so verdicts + index append
        // share one shingle/minhash computation
        val sigs = TextDedup.minhashSignatures(b).localCheckpoint(false)
        val index =
          if (pathExists(spark, indexDir))
            spark.read.parquet(indexDir).filter(col("ingest_seq") < batchId)
          else TextDedup.signatureBands(sigs).limit(0)
        val verdicts = TextDedup.incrementalDedupBanded(index, sigs, threshold, maxBucket)
        // unsigned docs have no verdict row (keep is null after the left
        // join) and pass through
        val survivors = b
          .join(verdicts.select(col("doc_id"), col("keep")), Seq("doc_id"), "left")
          .filter(col("keep").isNull || col("keep") === 1)
          .drop("keep")
          .localCheckpoint(false)
        if (!landed(indexDir)) {
          graft.pipeline.Ingest.appendWithSeq(
            TextDedup.signatureBands(
              sigs.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi")),
            indexDir, batchId)
        }
        if (!landed(survivorsDir)) {
          graft.pipeline.Ingest.appendWithSeq(survivors, survivorsDir, batchId)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming EMBEDDING near-dup ingest with a self-maintaining LSH
    * bucket index — the vector member of the streaming dedup family,
    * completing the matrix (exact [[dedupedDocs]], MinHash
    * [[dedupedCorpusStream]], CDC [[cdcNoveltyStream]], embedding —
    * here; batch twin: x15 `Similarity.embeddingNearDupPairs`). Each
    * micro-batch of (vec_id, embedding) rows is bucketed once
    * (`Similarity.lshBucket` — single-probe, one bucket per vector),
    * candidates come from one bucket equi-join against the standing
    * index plus the batch's own smaller-id rivals, and exact cosine ≥
    * `threshold` verifies. Greedy arrival-order semantics, exactly the
    * [[dedupedCorpusStream]] contract: a vector survives iff nothing in
    * any earlier batch (nor a smaller-id rival in its own batch, dup or
    * not) matched it. Survivors' (vec_id, bucket, embedding) rows
    * append to the index — it grows with distinct content, and
    * per-batch cost is O(batch · touched buckets), never O(corpus).
    *
    * Exactly-once under foreachBatch replay by the same seq-stamp
    * machinery: probes restricted to `ingest_seq < batchId`, both
    * appends stamped and independently skipped once landed, and the
    * recomputation deterministic (cosine is the fused kernel's fixed
    * left-to-right accumulation), so a half-committed batch heals to
    * identical bytes.
    */
  def embeddingDedupStream(vectors: DataFrame, indexDir: String,
      survivorsDir: String, checkpointDir: String,
      threshold: Double = 0.9): StreamingQuery = {
    import graft.ext.Similarity
    val q = vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF().localCheckpoint(false)
        val index =
          if (pathExists(spark, indexDir))
            spark.read.parquet(indexDir).filter(col("ingest_seq") < batchId)
              .select(col("bucket"), col("embedding"))
          else b.select(Similarity.lshBucket(col("embedding")).as("bucket"),
            col("embedding")).limit(0)
        // shared verdict kernel (the batch API): index rivals any id,
        // batch rivals smaller id only — greedy arrival-order semantics
        val survivors = Similarity.embeddingDedupVerdicts(index, b, threshold)
          .filter(col("keep") === 1).drop("keep")
          .localCheckpoint(false)
        if (!landedSeq(spark, indexDir, batchId)) {
          graft.pipeline.Ingest.appendWithSeq(survivors, indexDir, batchId)
        }
        if (!landedSeq(spark, survivorsDir, batchId)) {
          graft.pipeline.Ingest.appendWithSeq(
            survivors.select(col("vec_id"), col("bucket")), survivorsDir, batchId)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming pps weighted sample: maintain the EXACT n-smallest-
    * priority sequential-Poisson sample (batch twin: x96
    * `TextStats.weightedSample`) of everything that has ever arrived,
    * as a [[graft.pipeline.ManifestTable]] the next batch folds into.
    * Priorities are deterministic (hash(id) DIV weight — no RNG), so
    * top-n selection under the (priority, id) total order is an
    * associative, commutative, IDEMPOTENT fold over arrival multisets:
    * fold(standing ∪ batch-top-n) after any batch equals the batch
    * sample over the union of all batches so far
    * (WeightedSampleStreamSpec proves the equivalence), and replaying a
    * batch whose commit already landed recomputes the identical sample
    * — rows re-offered to a standing set that already rejected them
    * lose again. That idempotence is the whole exactly-once story: no
    * seq-stamp machinery needed, unlike the dedup streams whose
    * verdicts depend on what the index had NOT yet seen.
    *
    * A doc RE-ARRIVING WITH A CHANGED WEIGHT (doc update) resolves
    * deterministically to its min-priority version (ties by weight,
    * then a full-row hash) — the version top-n selection favors —
    * so the standing sample never depends on arrival order or replay
    * timing (round-11 ADVICE; the weight-update case in
    * WeightedSampleStreamSpec pins both orders to the same sample).
    *
    * Per-batch cost: one batch-sized priority scan + top-n, one union
    * with the n-row standing sample, one n-row manifest replace-commit
    * (crash mid-publish leaves the previous version current — readers
    * never see a torn sample). The standing state is n rows forever;
    * the corpus is never re-scanned.
    */
  /** Deterministic per-id duplicate resolution shared by the sample
    * folds (round-11 ADVICE, extracted round-11 review): keep the
    * min-(priority, w, full-row-hash) row per id. Min-priority is the
    * version top-n selection favors anyway, so the fold stays
    * arrival-order independent; the trailing xxhash64 over ALL columns
    * pins the degenerate same-id-same-priority-different-payload case.
    * Both sample streams MUST share this rule — diverging copies would
    * silently split their replay semantics.
    */
  private def resolvePerId(unioned: DataFrame, idCol: String): DataFrame = {
    val perId = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("priority").asc, col("w").asc,
        xxhash64(unioned.columns.map(col).toIndexedSeq: _*).asc)
    unioned.withColumn("__v", row_number().over(perId))
      .filter(col("__v") === 1).drop("__v")
  }

  def weightedSampleStream(docs: DataFrame, weightColName: String, n: Int,
      sampleDir: String, checkpointDir: String,
      idCol: String = "doc_id", salt: String = "pps"): StreamingQuery = {
    import graft.ext.TextStats
    import graft.pipeline.ManifestTable
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val batchTop = TextStats.weightedSample(
          batch.toDF(), col(weightColName), n, idCol, salt)
        val standing = ManifestTable.currentVersion(spark, sampleDir) match {
          case Some(_) => ManifestTable.read(spark, sampleDir)
          case None => batchTop.limit(0)
        }
        // per-id duplicate resolution: the shared deterministic rule
        // (resolvePerId — min (priority, w, full-row hash); rationale
        // there, round-11 ADVICE)
        val next = graft.operators.Ranks.topK(
          resolvePerId(standing.unionByName(batchTop), idCol),
          n, col("priority").asc, col(idCol).asc)
          .localCheckpoint(false) // pin: commit must not re-read the table it replaces
        ManifestTable.commit(spark, sampleDir, next, replace = true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming BM25 inverted-index maintenance (round 11): each arriving
    * doc micro-batch is tokenized ONCE into posting rows
    * (`doc_id, term, tf, dl` — [[graft.ext.TextRank.postings]]) and
    * appended to the standing index; the raw docs are never kept and
    * never re-tokenized. Retrieval then runs entirely off the index:
    * df/doc-stats re-aggregate from the postings
    * ([[graft.ext.TextRank.statsFromPostings]] — exact equalities with
    * the docs-side aggregates, derivation there), so BM25 over the
    * standing index after any prefix of arrivals equals batch x54 over
    * the NON-NULL-TEXT docs seen so far — tf/df/dl/N are set-functions
    * of arrived docs, blind to batching (Bm25IndexStreamSpec pins the
    * equality and the null gate; x116 oracles the read-back with x54's
    * SQL verbatim). Null-text docs are EXCLUDED from the index and its
    * stats by the named gate below — they can match no query term, but
    * a docs-side aggregate would still count them in n_docs/avgdl, so
    * on a corpus WITH null texts the index-side constants deliberately
    * describe the indexed corpus, not the raw arrival stream (the batch
    * caller that wants raw-stream constants passes its own statsOpt).
    *
    * Exactly-once under foreachBatch's at-least-once replay by the
    * stamped-append idiom: postings are NOT idempotent under
    * re-delivery (a double append doubles tf's weight in df), so the
    * landed-seq guard is the boundary, like every mergeable-partial
    * sink here. Contract: an append-only corpus — each `idCol` arrives
    * once (replays are the same batchId and skip). A doc UPDATE would
    * need its old postings retracted first; that regime belongs to the
    * upsert/dedup family (route updates through a keyed dedup upstream,
    * or rebuild the affected doc's rows the componentStreamWithForgets
    * way).
    *
    * Per-batch cost: O(batch tokens) tokenize + one stamped append —
    * the index grows with corpus content, queries pay O(postings of the
    * query terms) via the term equi-join, never a corpus re-scan.
    */
  def bm25IndexStream(docs: DataFrame, postingsDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text"): StreamingQuery = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        if (!landedSeq(spark, postingsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            // null text = no content = NOT indexed (named gate, round-11
            // review): split(NULL) explodes to zero rows, so a null-text
            // doc would silently leave no posting trace while the
            // docs-side n_docs counted it — the index's stats are over
            // INDEXED docs by contract, and the gate makes that contract
            // hold by construction rather than by corpus luck
            graft.ext.TextRank.postings(
              batch.toDF().filter(col(textCol).isNotNull), idCol, textCol),
            postingsDir, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** [[bm25IndexStream]] with DOC UPDATES — the retract-then-append
    * regime the append-only index names as out of scope (round-11
    * verdict item 2): a re-crawled/updated doc re-arrives under its
    * `idCol` with new text, and retrieval must see ONLY the latest
    * version — under the append-only contract the old postings
    * double-count df/tf forever.
    *
    * Design: PER-DOC VERSIONED POSTINGS RESOLVED AT READ, the
    * componentStreamWithForgets log idiom applied postings-side. Two
    * standing logs: the postings log (stamped posting rows, as in the
    * append-only stream) and a VERSION log of (idCol, ingest_seq) — one
    * row per doc ARRIVAL, including null-text arrivals. The version log
    * is what makes retraction-by-replacement total: a doc's live version
    * is its max ingest_seq in the version log, and [[resolvedPostings]]
    * keeps only posting rows stamped with exactly that seq. A null-text
    * re-arrival therefore DELETES the doc (its live version has no
    * posting rows — the version log advances, the postings log doesn't),
    * which the append-only stream's doc-count contract could not
    * express.
    *
    * Contracts:
    *   - at most one version of an `idCol` per micro-batch is the
    *     intended producer contract; a violating batch resolves
    *     deterministically (min full-row xxhash64 — the
    *     weightedSampleStream rule without a priority column), so
    *     replays are byte-stable either way;
    *   - exactly-once via the stamped-append idiom on BOTH logs
    *     independently (appends are not idempotent under re-delivery);
    *   - stale postings (superseded versions) linger until compaction
    *     but are invisible to every read — [[resolvedPostings]] filters
    *     them by construction. When the postings log exceeds
    *     `maxPostingFiles` data files, [[maybeCompactVersioned]] rewrites
    *     both logs keeping only live versions (the LSM trade again). A
    *     post-compaction replay of an old batch can re-append
    *     already-superseded rows; they never resolve (their seq is below
    *     the version log's max) and the next compaction drops them.
    *
    * Per-batch cost: O(batch tokens) tokenize + two stamped appends.
    * Read cost adds ONE doc-keyed equi-join of the postings log against
    * the version log's max-seq aggregate — O(log size), amortized back
    * to O(live postings) by compaction; retrieval stays O(query-term
    * postings) after resolution.
    */
  def bm25IndexUpsertStream(docs: DataFrame, postingsDir: String,
      versionsDir: String, checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", maxPostingFiles: Int = 64): StreamingQuery =
    versionedIndexStream(docs, postingsDir, versionsDir, checkpointDir,
      idCol, maxPostingFiles,
      b => graft.ext.TextRank.postings(
        b.filter(col(textCol).isNotNull), idCol, textCol))

  /** Read side of [[bm25IndexUpsertStream]]: the LIVE posting rows —
    * each doc's postings stamped with its max version-log seq. One
    * doc-keyed equi-join (both sides shuffle on `idCol` — never a corpus
    * or text re-scan); output columns match [[graft.ext.TextRank.postings]]
    * so every retrieval entry point takes it via `postingsOpt`.
    */
  def resolvedPostings(spark: SparkSession, postingsDir: String,
      versionsDir: String, idCol: String = "doc_id"): DataFrame =
    resolvedRows(spark, postingsDir, versionsDir, idCol)
      .select(col(idCol), col("term"), col("tf"), col("dl"))

  /** [[bm25IndexUpsertStream]]'s idiom for the standing MinHash BAND
    * index behind batch x51 / [[dedupedCorpusStream]] (round-12): a
    * re-crawled doc re-arrives under its `idCol` with new text, and the
    * index must serve ONLY the latest version's bands — under an
    * append-only index the stale version's signature keeps matching
    * future arrivals forever, and a null-text/unshingleable re-arrival
    * must RETRACT the doc from the index entirely (its live version
    * carries no bands — the version log advances, the band log
    * doesn't). Same two-log machinery, contracts, and compaction as the
    * postings index; `signer` maps a resolved arrival batch to its
    * signature frame ([[graft.ext.TextDedup.minhashSignatures]] fast
    * path by default; pass the portable variant when an oracle reads
    * the index).
    */
  // ---- FLAT twins of the migrated index families: DEMOTED ---------------
  // (round-16, r15 verdict item 3.) The heavy standing-index families —
  // bands, vectors, CDC chunks, their fused dedup/novelty loops, and the
  // IVF upsert/refit/policy lifecycle — run the BUCKETED layout in the
  // registry (zero-exchange resolves, bucket-pruned probes, the scale
  // path at 100 TB). Their flat parquet-dir twins below stay for the
  // internal contrast suites and the flat-vs-bucketed property tests,
  // but are `private[graft]`: a library user can no longer pick the
  // O(two-exchanges-per-read) variant by accident. The DOCUMENTED flat
  // escape hatch for non-catalog environments (no Spark table catalog,
  // plain object-store dirs) is the doc-store/as-of family
  // ([[docStoreStream]], [[resolvedDocs]], [[resolvedRowsAsOfChecked]])
  // plus the flat BM25 pair ([[bm25IndexUpsertStream]] /
  // [[resolvedPostings]]) — the same two-log versioned contract, kept
  // public on the flat layout because an environment without a catalog
  // cannot host the bucketed form at all.
  private[graft] def bandIndexUpsertStream(docs: DataFrame, bandsDir: String,
      versionsDir: String, checkpointDir: String, idCol: String = "doc_id",
      maxBandFiles: Int = 64,
      signer: DataFrame => DataFrame = graft.ext.TextDedup.minhashSignatures(_)): StreamingQuery =
    versionedIndexStream(docs, bandsDir, versionsDir, checkpointDir,
      idCol, maxBandFiles,
      b => graft.ext.TextDedup.signatureBands(signer(b)))

  /** Read side of [[bandIndexUpsertStream]]: the LIVE band rows in the
    * [[graft.ext.TextDedup.signatureBands]] layout, ready for
    * [[graft.ext.TextDedup.incrementalDedupBanded]]'s probe.
    */
  private[graft] def resolvedBands(spark: SparkSession, bandsDir: String,
      versionsDir: String, idCol: String = "doc_id"): DataFrame =
    resolvedRows(spark, bandsDir, versionsDir, idCol)
      .select(col("band"), col("band_hash"), col(idCol), col("sig"))

  /** The versioned-index idiom applied to the LAST similarity-family
    * standing index that was append-only (round-13, the r12 verdict
    * item 1): [[embeddingDedupStream]]'s vector index. A re-embedded doc
    * re-arrives under its `idCol` with a new vector and dedup verdicts
    * must probe ONLY the latest embedding — append-only, the stale
    * vector keeps winning verdicts against future arrivals forever
    * (the compaction policy at [[compactEmbeddingIndex]] even documents
    * uniqueness-by-`vec_id`, which breaks the moment updates exist) —
    * and a null-embedding re-arrival must remove the doc from the index
    * entirely (its live version derives zero vector rows = retraction).
    * Same two-log machinery, contracts, and compaction as the
    * postings/bands indexes; `derive` buckets each live vector once
    * ([[graft.ext.Similarity.lshBucket]]), so the resolved frame is
    * exactly what [[graft.ext.Similarity.embeddingDedupVerdicts]]
    * probes.
    */
  private[graft] def embIndexUpsertStream(vectors: DataFrame, vecsDir: String,
      versionsDir: String, checkpointDir: String, idCol: String = "vec_id",
      maxVecFiles: Int = 64): StreamingQuery =
    versionedIndexStream(vectors, vecsDir, versionsDir, checkpointDir,
      idCol, maxVecFiles,
      b => b.filter(col("embedding").isNotNull)
        .select(col(idCol),
          graft.ext.Similarity.lshBucket(col("embedding")).as("bucket"),
          col("embedding")))

  /** Read side of [[embIndexUpsertStream]]: the LIVE
    * (idCol, bucket, embedding) rows — the standing-index frame
    * [[graft.ext.Similarity.embeddingDedupVerdicts]] probes.
    */
  private[graft] def resolvedVectors(spark: SparkSession, vecsDir: String,
      versionsDir: String, idCol: String = "vec_id"): DataFrame =
    resolvedRows(spark, vecsDir, versionsDir, idCol)
      .select(col(idCol), col("bucket"), col("embedding"))

  /** The versioned-index idiom applied to the ANN SERVING structure
    * (round-13, x128): an incrementally-maintained IVF index. The batch
    * IVF path ([[graft.ext.Similarity.knnIvf]]) fits centroids once and
    * assigns the whole corpus per run — at 100 TB the corpus cannot be
    * re-assigned on every arrival, and without retraction a re-embedded
    * doc would keep being SERVED from its stale cell forever. Here the
    * cell structure is PINNED (`centroids` — fit once, broadcast-sized;
    * the standard IVF production posture: structure refresh is a rare
    * offline event, membership churn is continuous) and each arriving
    * vector version is assigned to its nearest pinned cell at arrival
    * time, O(batch × C) — never O(corpus). Updates move a doc's live
    * row to the new vector's cell; a null-embedding re-arrival advances
    * the version log with zero rows = the doc leaves the served index.
    * Serving reads [[resolvedIvfVectors]] straight into
    * [[graft.ext.Similarity.knnIvf]]'s `assignedOpt` — the stored
    * assignment IS the inverted file, so queries pay only nprobe-cell
    * candidate generation. `centroids` must be (vec_id, embedding),
    * pre-materialized by the caller (it is re-read every micro-batch).
    */
  private[graft] def ivfIndexUpsertStream(vectors: DataFrame, vecsDir: String,
      versionsDir: String, checkpointDir: String, centroids: DataFrame,
      idCol: String = "vec_id", maxVecFiles: Int = 64): StreamingQuery =
    versionedIndexStream(vectors, vecsDir, versionsDir, checkpointDir,
      idCol, maxVecFiles,
      b => graft.ext.Similarity.ivfAssign(
          b.filter(col("embedding").isNotNull)
            .select(col(idCol).as("vec_id"), col("embedding")), centroids)
        .select(col("vec_id").as(idCol), col("cell_id"), col("embedding")))

  /** Read side of [[ivfIndexUpsertStream]]: the LIVE
    * (idCol, cell_id, embedding) rows — exactly the inverted-file frame
    * [[graft.ext.Similarity.knnIvf]] accepts as `assignedOpt`.
    */
  private[graft] def resolvedIvfVectors(spark: SparkSession, vecsDir: String,
      versionsDir: String, idCol: String = "vec_id"): DataFrame =
    resolvedRows(spark, vecsDir, versionsDir, idCol)
      .select(col(idCol), col("cell_id"), col("embedding"))

  /** The RARE-OFFLINE-EVENT half of the IVF serving lifecycle (x130).
    * [[ivfIndexUpsertStream]] maintains membership per arrival against
    * a pinned cell structure; x129 measures what that pin costs in
    * recall as the corpus churns; this REFITS when the cost is no
    * longer acceptable: derive a fresh centroid set from the LIVE
    * corpus with the caller's policy, re-assign every live vector once
    * — the only whole-corpus pass anywhere in the lifecycle — and swap
    * the data log in place. The refit IS a compaction: superseded
    * versions are dropped by the rewrite and the version log shrinks to
    * one max-seq row per id (the [[maybeCompactVersioned]] move), so a
    * fragmented log and a stale structure are fixed by the same pass.
    * Crash-safe in either swap order: every surviving data row keeps
    * its original `ingest_seq` stamp, so resolution reads max-seq rows
    * correctly whether the version-log shrink landed or not, and
    * [[swapRewrite]]'s bak dance leaves each log current or restored.
    * Returns the new centroid frame (localCheckpointed) — the caller
    * MUST feed it to subsequent [[ivfIndexUpsertStream]] batches:
    * assignment policy is a parameter, not hidden state. Precondition:
    * both logs exist (an index that has ingested at least one batch).
    */
  private[graft] def ivfRefitSwap(spark: SparkSession, vecsDir: String, versionsDir: String,
      centroidPolicy: DataFrame => DataFrame =
        graft.ext.Similarity.strideCentroids(_, 16),
      idCol: String = "vec_id"): DataFrame = {
    val latest = spark.read.parquet(versionsDir)
      .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
      .localCheckpoint(false) // read before either log is swapped
    val live = spark.read.parquet(vecsDir)
      .join(latest.withColumnRenamed("__vmax", "ingest_seq"), Seq(idCol, "ingest_seq"))
      .select(col(idCol), col("embedding"), col("ingest_seq"))
      .localCheckpoint(false) // feeds the policy, the re-assign, and the stamp join
    val cents = centroidPolicy(
      live.select(col(idCol).as("vec_id"), col("embedding")))
      .localCheckpoint(false) // survives the swap; returned to the caller
    val reassigned = graft.ext.Similarity.ivfAssign(
        live.select(col(idCol).as("vec_id"), col("embedding")), cents)
      .select(col("vec_id").as(idCol), col("cell_id"), col("embedding"))
      .join(live.select(col(idCol), col("ingest_seq")), Seq(idCol))
    swapRewrite(spark, vecsDir, reassigned)
    swapRewrite(spark, versionsDir,
      latest.select(col(idCol), col("__vmax").as("ingest_seq")))
    cents
  }

  /** [[ivfRefitSwap]] on the bucketed table layout (round-15): the same
    * whole-corpus refit event — derive fresh centroids from the live
    * corpus, re-assign, re-stamp — with both rewrites landing through
    * [[graft.pipeline.Bucketing.rewriteBucketed]]'s crash-safe
    * tmp/rename dance, so the pair keeps its id-bucketed layout across
    * the structure swap and the serving resolve stays shuffle-free
    * afterwards. The refit itself is corpus-linear by nature; the
    * layout is preserved for the READS that follow it.
    */
  def ivfRefitSwapBucketed(spark: SparkSession, vecsTable: String,
      versionsTable: String,
      centroidPolicy: DataFrame => DataFrame =
        graft.ext.Similarity.strideCentroids(_, 16),
      idCol: String = "vec_id", buckets: Int = 32): DataFrame = {
    import graft.pipeline.Bucketing
    Bucketing.healBucketedSwap(spark, vecsTable)
    Bucketing.healBucketedSwap(spark, versionsTable)
    val latest = spark.table(versionsTable)
      .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
      .localCheckpoint(false) // read before either log is swapped
    val live = spark.table(vecsTable)
      .join(latest.withColumnRenamed("__vmax", "ingest_seq"), Seq(idCol, "ingest_seq"))
      .select(col(idCol), col("embedding"), col("ingest_seq"))
      .localCheckpoint(false) // feeds the policy, the re-assign, and the stamp join
    val cents = centroidPolicy(
      live.select(col(idCol).as("vec_id"), col("embedding")))
      .localCheckpoint(false) // survives the swap; returned to the caller
    val reassigned = graft.ext.Similarity.ivfAssign(
        live.select(col(idCol).as("vec_id"), col("embedding")), cents)
      .select(col("vec_id").as(idCol), col("cell_id"), col("embedding"))
      .join(live.select(col(idCol), col("ingest_seq")), Seq(idCol))
    Bucketing.rewriteBucketed(spark, vecsTable, reassigned, idCol, buckets)
    Bucketing.rewriteBucketed(spark, versionsTable,
      latest.select(col(idCol), col("__vmax").as("ingest_seq")), idCol, buckets)
    cents
  }

  /** Occupancy-drift statistic for the gauge-triggered refit policy
    * (round-14, x140): the total-variation distance, in basis points,
    * between the structure's FIT-TIME cell-occupancy distribution and
    * the current one — `floor(Σ_cells |n_now·N_fit − n_fit·N_now| ·
    * 10000 / (2·N_now·N_fit))`. Pure integer arithmetic end to end, so
    * the reading is bit-identical cross-engine (no cosine ever enters
    * the gauge — x131's csim-mass arms need float sums; occupancy
    * re-skew is the drift dimension that needs none). Cost: the counts
    * come from ONE group-by over the stored assignments — O(live) with
    * zero float work, strictly cheaper than x131's O(live × C)
    * re-assignment. Maps are model-sized (≤ C cells) by construction.
    * Conventions: an empty CURRENT corpus reads 10000 (total drift —
    * nothing the fit distribution described remains) and an empty FIT
    * map reads 10000 symmetrically; both are degenerate states the
    * policy layer must decide on (x140's loop never refits an empty
    * corpus — there is nothing to fit). Overflow (round-15, the r14
    * verdict item 2): the cross-products `n·N` and the `Σ|…|·10000`
    * numerator leave Long range beyond ~10^7 vectors per side, and a
    * silently-wrapped gauge would suppress or spuriously trigger
    * refits at exactly the 100 TB posture the policy exists for — so
    * the fold runs in BigInt end to end and only the final ≤10000
    * quotient narrows back to Long (exact by construction; the
    * per-call cost is C-ish BigInt ops on a model-sized map, nothing
    * against the O(live) count collection that feeds it).
    * IvfPolicyPropertySpec pins agreement with a BigInt reference on
    * counts past 2^31 where the old Long arithmetic wrapped.
    */
  def occupancyDriftBp(now: Map[Long, Long], fit: Map[Long, Long]): Long = {
    val nNow = now.values.foldLeft(BigInt(0))(_ + _)
    val nFit = fit.values.foldLeft(BigInt(0))(_ + _)
    if (nNow == 0 || nFit == 0) 10000L
    else {
      val num = (now.keySet ++ fit.keySet).toSeq.map { c =>
        (BigInt(now.getOrElse(c, 0L)) * nFit - BigInt(fit.getOrElse(c, 0L)) * nNow).abs
      }.sum
      (num * 10000 / (2 * nNow * nFit)).toLong
    }
  }

  /** The refit-trigger decision, strict-greater by contract: a gauge
    * reading EXACTLY at the threshold does not fire (the boundary
    * IvfUpsertStreamSpec pins — "threshold" names the highest tolerated
    * drift, not the first intolerable one).
    */
  def ivfDriftFired(tvBp: Long, thresholdBp: Long): Boolean = tvBp > thresholdBp

  // ---- standing occupancy view (round-15, r14 verdict item 5) -------------
  // x140's gauge re-aggregated the full live corpus every wave — an
  // O(live) group-by per micro-batch that is exactly the shape x139's
  // additive IVM maintains at O(batch): cell counts are SUBTRACTABLE
  // sufficient statistics. The view is a tiny (cell_id, n) parquet dir
  // next to the vectors log (≤ C data rows + one null-cell marker row
  // that keeps `occ_seq` readable when the corpus empties), stamped
  // with the last applied batch for exactly-once under replay. Per
  // wave the maintenance is O(batch): subtract each arriving id's
  // PREVIOUS live cell (read via the batchId-capped resolve, which is
  // why the update is ordered BEFORE compaction — a replayed batch
  // must still see the superseded rows it subtracts), add the batch's
  // landed assignments. Only the refit — corpus-linear by nature —
  // resets the view from a full group-by. Bit-equality with the
  // O(live) group-by is pinned every wave by IvfPolicyPropertySpec and
  // IvfUpsertStreamSpec; x140's gauge history hashes are unchanged.

  private[graft] def occViewDir(baseDir: String): String =
    baseDir.stripSuffix("/") + "_occ_view"

  /** Fit-reference state shared by the flat and bucketed policy loops:
    * (fit-time cell occupancy, the seq that installed it).
    */
  private def ivfFitState(spark: SparkSession, fitDir: String): (Map[Long, Long], Long) = {
    val rows = spark.read.parquet(fitDir).collect()
    (rows.map(r => r.getAs[Long]("cell_id") -> r.getAs[Long]("n_fit")).toMap,
      rows.headOption.map(_.getAs[Long]("fit_seq")).getOrElse(-1L))
  }

  private def ivfWriteFit(spark: SparkSession, fitDir: String,
      occ: Map[Long, Long], seq: Long): Unit = {
    import spark.implicits._
    val df = occ.toSeq.toDF("cell_id", "n_fit").withColumn("fit_seq", lit(seq))
    if (pathExists(spark, fitDir)) swapRewrite(spark, fitDir, df)
    else df.write.mode("overwrite").parquet(fitDir)
  }

  /** The standing view's state: (per-cell live counts, last applied
    * seq); None when never written.
    */
  private[graft] def readOccView(spark: SparkSession,
      vecsDir: String): Option[(Map[Long, Long], Long)] = {
    val dir = occViewDir(vecsDir)
    if (!pathExists(spark, dir)) None
    else {
      val rows = spark.read.parquet(dir).collect()
      val seq = rows.map(_.getAs[Long]("occ_seq")).max
      Some((rows.filter(!_.isNullAt(0))
        .map(r => r.getAs[Long]("cell_id") -> r.getAs[Long]("n")).toMap, seq))
    }
  }

  private def writeOccView(spark: SparkSession, vecsDir: String,
      occ: Map[Long, Long], seq: Long): Unit = {
    import spark.implicits._
    val df = (Seq((Option.empty[Long], 0L)) ++
        occ.toSeq.map { case (c, n) => (Some(c), n) })
      .toDF("cell_id", "n").withColumn("occ_seq", lit(seq))
    val dir = occViewDir(vecsDir)
    if (pathExists(spark, dir)) swapRewrite(spark, dir, df)
    else df.write.mode("overwrite").parquet(dir)
  }

  /** The gauge-triggered refit POLICY composing the whole IVF serving
    * lifecycle into one loop (round-14, x140; r13 verdict item 2):
    * x128 maintains membership per arrival against the current
    * structure, x131 showed drift can be gauged affordably, x130
    * executes the refit — this closes the control loop: per
    * micro-batch, maintain the index, read the occupancy-drift gauge
    * ([[occupancyDriftBp]] — O(live), integer-exact, off the STORED
    * assignments), append the reading to a standing policy log, and
    * fire [[ivfRefitSwap]] exactly when the reading crosses
    * `thresholdBp` ([[ivfDriftFired]], strict >). Serving continues
    * off whichever structure is current: `centsDir` always holds it
    * (installed from `initialCentroids` on the first batch, swapped by
    * each refit), so a serving read is always
    * ([[resolvedIvfVectors]], read centsDir) with no coordination.
    *
    * State beyond the x128 logs: `centsDir` (current structure, C
    * rows), `fitDir` (the structure's fit-time occupancy, ≤ C rows,
    * every row stamped `fit_seq` = the batch that installed it),
    * `gaugeDir` (the policy log: one stamped row per batch —
    * n_live, tv_bp, fired). Exactly-once: both gauge append and index
    * appends are landed-seq guarded; the refit itself is IDEMPOTENT
    * (a pure function of the live corpus, which the refit does not
    * change — replaying it rewrites the same rows), and a crash
    * BETWEEN the gauge append and the refit is healed on the next
    * batch: a landed `fired` row newer than fitDir's `fit_seq` means
    * the chosen refit never landed, so it runs before the new batch
    * assigns (the batch must see the structure the policy already
    * committed to). The install batch pins tv_bp = 0 / fired = false
    * by definition — the corpus it gauges IS the fit corpus.
    * 100 TB posture (round-15, r14 verdict item 5): per-batch cost is
    * O(batch × C) assignment + O(batch) view maintenance — the gauge
    * reads a standing ≤ C-row additive occupancy view ([[readOccView]];
    * cell counts are subtractable sufficient statistics, x139's class)
    * instead of re-aggregating the live corpus every wave. The refit
    * remains the lifecycle's only whole-corpus pass (it also resets the
    * view) and fires only when the gauge says the pin is no longer
    * serving the corpus that exists.
    */
  private[graft] def ivfPolicyStream(vectors: DataFrame, vecsDir: String,
      versionsDir: String, checkpointDir: String,
      initialCentroids: DataFrame, centsDir: String, fitDir: String,
      gaugeDir: String, thresholdBp: Long = 3000L,
      centroidPolicy: DataFrame => DataFrame =
        graft.ext.Similarity.strideCentroids(_, 16),
      idCol: String = "vec_id", maxVecFiles: Int = 64): StreamingQuery = {
    def occupancy(spark: SparkSession): Map[Long, Long] =
      resolvedRows(spark, vecsDir, versionsDir, idCol)
        .groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def fitState(spark: SparkSession): (Map[Long, Long], Long) =
      ivfFitState(spark, fitDir)
    def writeFit(spark: SparkSession, occ: Map[Long, Long], seq: Long): Unit =
      ivfWriteFit(spark, fitDir, occ, seq)
    def doRefit(spark: SparkSession, seq: Long): Unit = {
      val newCents = ivfRefitSwap(spark, vecsDir, versionsDir, centroidPolicy, idCol)
      swapRewrite(spark, centsDir,
        newCents.select(col("vec_id"), col("embedding")))
      // the refit re-assigned the whole corpus, so the standing view is
      // reset from the same full group-by that stamps the fit reference
      // — the lifecycle's one corpus-linear pass pays for both
      val occ = occupancy(spark)
      writeFit(spark, occ, seq)
      writeOccView(spark, vecsDir, occ, seq)
    }
    // O(batch) maintenance of the standing occupancy view (round-15,
    // r14 verdict item 5 — rationale at [[readOccView]]): subtract the
    // batch ids' previous live cells, add the batch's landed
    // assignments. Replay-exact: a view already stamped >= batchId is
    // returned as-is; otherwise the subtraction side reads the
    // batchId-capped resolve (this runs BEFORE compaction, so the
    // superseded rows are still present even on a replay) and the
    // addition side reads the batch's landed stamped rows.
    def updateOccView(spark: SparkSession, b: DataFrame, batchId: Long): Map[Long, Long] = {
      val cur = readOccView(spark, vecsDir)
      if (cur.exists(_._2 >= batchId)) cur.get._1
      else {
        // Staleness heal (round-16, the r15 ADVICE medium): the one-batch
        // delta is only valid against a base stamped EXACTLY batchId-1.
        // A view lost in writeOccView's swap-rename crash window, a
        // deleted _occ_view dir, or a resume of a pre-view stream (logs
        // present, no view) would otherwise wedge the negative-count
        // require() on every replay — or worse, gauge against a wrong
        // base and fire/suppress refits silently. Any other stamp
        // rebuilds the base from the batchId-capped full group-by (the
        // packWatermarkBefore idiom: fast path when fresh, replay-exact
        // recompute otherwise); the write below re-heals the view.
        val base =
          if (cur.exists(_._2 == batchId - 1)) cur.get._1
          else liveRowsBefore(spark, vecsDir, versionsDir, idCol, batchId)
            .map(_.groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
            .getOrElse(Map.empty[Long, Long])
        val old = liveRowsBefore(spark, vecsDir, versionsDir, idCol, batchId)
          .map(_.join(b.select(col(idCol)), Seq(idCol))
            .groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
          .getOrElse(Map.empty[Long, Long])
        val fresh = spark.read.parquet(vecsDir)
          .filter(col("ingest_seq") === batchId)
          .groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val merged = (base.keySet ++ old.keySet ++ fresh.keySet).toSeq.map { c =>
          c -> (base.getOrElse(c, 0L) - old.getOrElse(c, 0L) + fresh.getOrElse(c, 0L))
        }.filter(_._2 != 0L).toMap
        require(merged.values.forall(_ > 0L),
          s"occupancy view went negative at batch $batchId — delta accounting broke")
        writeOccView(spark, vecsDir, merged, batchId)
        merged
      }
    }
    // heal a crash between a landed fired-row and its refit: a gauge row
    // with fired=true newer than fitDir's fit_seq means the chosen refit
    // never landed, so it must run before anything serves or assigns
    // against the stale structure
    def healFiredWithoutRefit(spark: SparkSession): Unit =
      if (pathExists(spark, gaugeDir) && pathExists(spark, fitDir)) {
        val last = spark.read.parquet(gaugeDir)
          .orderBy(col("ingest_seq").desc).limit(1).collect()
        val fitSeq = fitState(spark)._2
        if (last.nonEmpty && last(0).getAs[Boolean]("fired") &&
            last(0).getAs[Long]("ingest_seq") > fitSeq)
          doRefit(spark, last(0).getAs[Long]("ingest_seq"))
      }
    // ... ONCE AT STREAM START too (round-15, the r14 ADVICE): an
    // AvailableNow restart with no new source files never executes a
    // batch, so a heal that lives only inside foreachBatch would leave
    // serving indefinitely on the structure the policy already committed
    // to replace. The start-side heal closes that: restart-with-nothing-
    // new still converges the structure.
    healFiredWithoutRefit(vectors.sparkSession)
    val q = vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        if (!pathExists(spark, centsDir))
          initialCentroids.select(col("vec_id"), col("embedding"))
            .write.mode("overwrite").parquet(centsDir)
        // heal BEFORE assigning this batch — the batch must see the
        // structure the policy already committed to
        healFiredWithoutRefit(spark)
        val b = resolveBatchVersions(batch.toDF(), idCol)
        if (!landedSeq(spark, versionsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(b.select(col(idCol)), versionsDir, batchId)
        if (!landedSeq(spark, vecsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            graft.ext.Similarity.ivfAssign(
                b.filter(col("embedding").isNotNull)
                  .select(col(idCol).as("vec_id"), col("embedding")),
                spark.read.parquet(centsDir))
              .select(col("vec_id").as(idCol), col("cell_id"), col("embedding")),
            vecsDir, batchId)
        // view update BEFORE compaction (it must still see the
        // superseded rows it subtracts); the gauge then reads the
        // ≤ C-row view instead of re-aggregating the live corpus
        val occ = updateOccView(spark, b, batchId)
        maybeCompactVersioned(spark, vecsDir, versionsDir, maxVecFiles, idCol)
        val nLive = occ.values.sum
        if (!pathExists(spark, fitDir)) {
          writeFit(spark, occ, batchId)
          if (!landedSeq(spark, gaugeDir, batchId)) {
            import spark.implicits._
            graft.pipeline.Ingest.appendWithSeq(
              Seq((nLive, 0L, false)).toDF("n_live", "tv_bp", "fired"),
              gaugeDir, batchId)
          }
        } else {
          val (fit, _) = fitState(spark)
          val tvBp = occupancyDriftBp(occ, fit)
          val fired = nLive > 0L && ivfDriftFired(tvBp, thresholdBp)
          if (!landedSeq(spark, gaugeDir, batchId)) {
            import spark.implicits._
            graft.pipeline.Ingest.appendWithSeq(
              Seq((nLive, tvBp, fired)).toDF("n_live", "tv_bp", "fired"),
              gaugeDir, batchId)
          }
          if (fired) doRefit(spark, batchId)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Read side of [[ivfPolicyStream]]'s policy log: one row per
    * maintenance cycle — (wave, n_live, tv_bp, fired).
    */
  def ivfPolicyLog(spark: SparkSession, gaugeDir: String): DataFrame =
    spark.read.parquet(gaugeDir)
      .select(col("ingest_seq").as("wave"), col("n_live"), col("tv_bp"),
        col("fired"))

  /** [[ivfPolicyStream]] on the BUCKETED log layout (round-15, closing
    * the r14 verdict item-1 family list): the x128 logs land as
    * id-bucketed table pairs, so every read the loop repeats — the
    * serving resolve, the occupancy view's subtraction side (the
    * batch-ids' previous live cells), and the refit's live-corpus
    * read — rides the bucket partitioning: zero exchanges, and the
    * per-batch subtraction probe prunes to the arriving ids' buckets
    * instead of scanning the whole data log. Policy semantics,
    * exactly-once contracts, heal paths, and the gauge/fit/cents/view
    * sidecar dirs are the flat loop's verbatim (the sidecars are
    * model-sized — a bucketed layout would buy them nothing); the
    * occupancy view keys off `gaugeDir` here since the logs are tables.
    */
  def ivfPolicyStreamBucketed(vectors: DataFrame, vecsTable: String,
      versionsTable: String, checkpointDir: String,
      initialCentroids: DataFrame, centsDir: String, fitDir: String,
      gaugeDir: String, thresholdBp: Long = 3000L,
      centroidPolicy: DataFrame => DataFrame =
        graft.ext.Similarity.strideCentroids(_, 16),
      idCol: String = "vec_id", buckets: Int = 32,
      maxVecFiles: Int = 64): StreamingQuery = {
    import graft.pipeline.{Bucketing, Ingest}
    val occDir = occViewDir(gaugeDir)
    def occupancy(spark: SparkSession): Map[Long, Long] =
      resolvedIvfVectorsBucketed(spark, vecsTable, versionsTable, idCol)
        .groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def doRefit(spark: SparkSession, seq: Long): Unit = {
      val newCents = ivfRefitSwapBucketed(spark, vecsTable, versionsTable,
        centroidPolicy, idCol, buckets)
      swapRewrite(spark, centsDir,
        newCents.select(col("vec_id"), col("embedding")))
      val occ = occupancy(spark)
      ivfWriteFit(spark, fitDir, occ, seq)
      writeOccView(spark, gaugeDir, occ, seq)
    }
    // Returns the fit state it settled on (None ⇔ fitDir absent), so the
    // per-batch drift decision reuses the read instead of re-collecting
    // fitDir a second time in the same batch (round-16 optimization
    // round — the duplicate read was one more floor-priced job per
    // batch). Heal semantics unchanged: a landed fired-row newer than
    // fit_seq means the chosen refit never landed; it runs before the
    // batch assigns.
    def healFiredWithoutRefit(spark: SparkSession): Option[(Map[Long, Long], Long)] =
      if (!pathExists(spark, fitDir)) None
      else {
        val fitState = ivfFitState(spark, fitDir)
        if (!pathExists(spark, gaugeDir)) Some(fitState)
        else {
          val last = spark.read.parquet(gaugeDir)
            .orderBy(col("ingest_seq").desc).limit(1).collect()
          if (last.nonEmpty && last(0).getAs[Boolean]("fired") &&
              last(0).getAs[Long]("ingest_seq") > fitState._2) {
            doRefit(spark, last(0).getAs[Long]("ingest_seq"))
            Some(ivfFitState(spark, fitDir))
          } else Some(fitState)
        }
      }
    def updateOccView(spark: SparkSession, b: DataFrame, batchId: Long): Map[Long, Long] = {
      val cur = readOccView(spark, gaugeDir)
      if (cur.exists(_._2 >= batchId)) cur.get._1
      else {
        // staleness heal — the flat loop's rationale verbatim (round-16
        // ADVICE medium): any base not stamped exactly batchId-1 rebuilds
        // from the capped full group-by instead of trusting a stale view
        val base =
          if (cur.exists(_._2 == batchId - 1)) cur.get._1
          else liveRowsBeforeBucketed(spark, vecsTable, versionsTable, idCol, batchId)
            .map(_.groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
            .getOrElse(Map.empty[Long, Long])
        // `- departed + arrived` as ONE signed-count job (round-16
        // optimization round): the two per-cell collects were separate
        // tiny jobs paying the scheduling floor twice per batch; the
        // union groups once and the sums are integer-exact, so `merged`
        // is bit-identical to the two-map form. The join inside still
        // rides the buckets (union happens above it).
        val departedSgn = liveRowsBeforeBucketed(spark, vecsTable, versionsTable,
            idCol, batchId)
          .map(_.join(b.select(col(idCol)), Seq(idCol))
            .select(col("cell_id"), lit(-1L).as("sgn")))
        val arrivedSgn = spark.table(vecsTable)
          .filter(col("ingest_seq") === batchId)
          .select(col("cell_id"), lit(1L).as("sgn"))
        val delta = departedSgn.map(_.unionByName(arrivedSgn)).getOrElse(arrivedSgn)
          .groupBy(col("cell_id")).agg(sum(col("sgn")).as("d"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val merged = (base.keySet ++ delta.keySet).toSeq.map { c =>
          c -> (base.getOrElse(c, 0L) + delta.getOrElse(c, 0L))
        }.filter(_._2 != 0L).toMap
        require(merged.values.forall(_ > 0L),
          s"occupancy view went negative at batch $batchId — delta accounting broke")
        writeOccView(spark, gaugeDir, merged, batchId)
        merged
      }
    }
    healFiredWithoutRefit(vectors.sparkSession)
    val q = vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        if (!pathExists(spark, centsDir))
          initialCentroids.select(col("vec_id"), col("embedding"))
            .write.mode("overwrite").parquet(centsDir)
        // the heal's fit read doubles as the batch's drift reference —
        // nothing writes fitDir between here and the gauge decision
        val fitState = healFiredWithoutRefit(spark)
        val b = resolveBatchVersions(batch.toDF(), idCol)
        // both log appends concurrently (round-16, r15 verdict item 1)
        Ingest.appendBucketedPairWithSeq(spark,
          Seq(
            b.select(col(idCol)) -> versionsTable,
            graft.ext.Similarity.ivfAssign(
                b.filter(col("embedding").isNotNull)
                  .select(col(idCol).as("vec_id"), col("embedding")),
                spark.read.parquet(centsDir))
              .select(col("vec_id").as(idCol), col("cell_id"), col("embedding"))
              -> vecsTable),
          idCol, buckets, batchId)
        val occ = updateOccView(spark, b, batchId)
        Bucketing.maybeCompactVersionedBucketed(spark, vecsTable,
          versionsTable, idCol, buckets, maxVecFiles)
        val nLive = occ.values.sum
        if (fitState.isEmpty) {
          ivfWriteFit(spark, fitDir, occ, batchId)
          if (!landedSeq(spark, gaugeDir, batchId)) {
            import spark.implicits._
            Ingest.appendWithSeq(
              Seq((nLive, 0L, false)).toDF("n_live", "tv_bp", "fired"),
              gaugeDir, batchId)
          }
        } else {
          val (fit, _) = fitState.get
          val tvBp = occupancyDriftBp(occ, fit)
          val fired = nLive > 0L && ivfDriftFired(tvBp, thresholdBp)
          if (!landedSeq(spark, gaugeDir, batchId)) {
            import spark.implicits._
            Ingest.appendWithSeq(
              Seq((nLive, tvBp, fired)).toDF("n_live", "tv_bp", "fired"),
              gaugeDir, batchId)
          }
          if (fired) doRefit(spark, batchId)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Doc retraction for the standing CDC chunk-hash index (round-13,
    * the r12 verdict item 2). [[cdcNoveltyStream]]'s index is keyed by
    * content hash `h` ALONE, so a doc update/deletion cannot retract
    * its chunks — an updated doc's obsolete chunks permanently suppress
    * `novel_chars` for future arrivals. Unlike postings or bands, chunk
    * hashes are SHARED across docs, so retraction needs doc attribution:
    * this index stores per-doc versioned `(idCol, h)` rows (distinct h
    * per doc version), and the LIVE chunk-hash set is the union over
    * live doc versions — an updated doc's EXCLUSIVE chunks leave the
    * index while chunks shared with any live doc survive through that
    * doc's rows. The trade vs the attribution-free index: size is
    * O(live (doc, chunk) pairs) rather than O(distinct content); the
    * probe side collapses to distinct `h` before the equi-join
    * ([[graft.ext.TextDedup.cdcIncrementalAgainstIndex]] does exactly
    * that), so probe cost is unchanged. Same two-log machinery,
    * contracts, and compaction as the postings/bands/vector indexes;
    * a null-text re-arrival derives zero chunk rows = total retraction.
    * `chunker` defaults to the gear-hash fast path; pass the portable
    * [[graft.ext.TextDedup.cdcChunks]] when an oracle reads the index.
    */
  private[graft] def cdcIndexUpsertStream(docs: DataFrame, chunksDir: String,
      versionsDir: String, checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", maxChunkFiles: Int = 64,
      chunker: DataFrame => DataFrame = graft.ext.TextDedup.cdcChunksFast(_)): StreamingQuery =
    versionedIndexStream(docs, chunksDir, versionsDir, checkpointDir,
      idCol, maxChunkFiles,
      b => chunker(b.filter(col(textCol).isNotNull))
        .select(col(idCol), col("h")).distinct())

  /** Read side of [[cdcIndexUpsertStream]]: the LIVE (idCol, h) chunk
    * rows. Feed it to
    * [[graft.ext.TextDedup.cdcIncrementalAgainstIndex]] — only `h` is
    * read there, and its index-side distinct collapses the shared-chunk
    * multiplicity this layout carries for retraction's sake.
    */
  private[graft] def resolvedChunks(spark: SparkSession, chunksDir: String,
      versionsDir: String, idCol: String = "doc_id"): DataFrame =
    resolvedRows(spark, chunksDir, versionsDir, idCol)
      .select(col(idCol), col("h"))

  /** The versioned-index idiom applied to the CORPUS ITSELF (round-13,
    * x132): a last-write-wins document STORE with retraction and as-of
    * reads — the lineage-bearing raw table every derived index (postings,
    * bands, vectors, chunks) hangs off. `derive` is the arrival rows
    * themselves, so the data log retains every version verbatim until
    * compaction: [[resolvedDocs]] is the live corpus and
    * [[resolvedRowsAsOf]] reconstructs any historical snapshot — which
    * is what makes a training run REPRODUCIBLE ("rebuild the exact
    * corpus batch S saw") and what the monotone-sketch rebuild remedy
    * (x133) reads. A null-`textCol` re-arrival derives zero rows =
    * deletion. Same two-log machinery, exactly-once contracts, and
    * compaction as every other versioned family.
    */
  def docStoreStream(docs: DataFrame, docsDir: String, versionsDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", maxFiles: Int = 64): StreamingQuery =
    versionedIndexStream(docs, docsDir, versionsDir, checkpointDir,
      idCol, maxFiles, b => b.filter(col(textCol).isNotNull))

  /** [[docStoreStream]] over the BUCKETED log layout (round-14, r13
    * verdict item 5): both logs land as tables bucketed by `idCol`
    * ([[graft.pipeline.Ingest.appendBucketedWithSeq]] — its repartition
    * caps each append at `buckets` files), so the resolve
    * ([[graft.pipeline.Bucketing.resolvedBucketed]]) plans with ZERO
    * shuffle exchanges — the per-id max-seq aggregate and the doc-keyed
    * join both ride the bucket partitioning — and a single-doc probe
    * prunes to one bucket per log (SelectedBucketsCount in the scan).
    * Same exactly-once/replay contract as the flat stream (stamped
    * appends, landed-seq guards). Compaction of the pair:
    * [[graft.pipeline.Ingest.compactBucketed]] on the version log
    * (per-id max row) has the right last-write-wins shape; the data
    * log's live-rows rewrite is resolve → overwrite with the same
    * bucket spec — both shuffle-free because the aggregate rides the
    * buckets. The bucketed layout is for logs whose READ path dominates
    * their rewrite path, which is exactly the standing-index serving
    * shape.
    */
  def docStoreStreamBucketed(docs: DataFrame, dataTable: String,
      versionsTable: String, checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 32,
      maxFiles: Int = 64): StreamingQuery =
    versionedIndexStreamBucketed(docs, dataTable, versionsTable,
      checkpointDir, idCol, buckets, b => b.filter(col(textCol).isNotNull),
      maxFiles)

  /** The GENERIC bucketed versioned-index maintenance loop — the
    * [[versionedIndexStream]] contract (per-batch intra-batch version
    * resolve, two stamped landed-seq-guarded appends, zero-row derive =
    * retraction) on the bucketed table layout, serving every derived
    * family the flat loop serves (postings, bands, vectors, chunks:
    * pass the same `derive`). What changes is only WHERE the rows land
    * and what the read plans: [[graft.pipeline.Bucketing.resolvedBucketed]]
    * resolves with zero shuffle exchanges. No automatic compaction
    * cadence yet — [[graft.pipeline.Bucketing.compactVersionedBucketed]]
    * is the caller-owned rewrite (the bucketed layout targets logs
    * whose read path dominates their rewrite path).
    */
  def versionedIndexStreamBucketed(docs: DataFrame, dataTable: String,
      versionsTable: String, checkpointDir: String, idCol: String,
      buckets: Int, derive: DataFrame => DataFrame,
      maxFiles: Int = 64): StreamingQuery = {
    import graft.pipeline.{Bucketing, Ingest}
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = resolveBatchVersions(batch.toDF(), idCol)
        // both log appends concurrently (round-16, r15 verdict item 1:
        // the serial pair paid both micro-batch jobs' fixed costs
        // end-to-end — the attributed sf0.1 append floor)
        Ingest.appendBucketedPairWithSeq(spark,
          Seq(b.select(col(idCol)) -> versionsTable, derive(b) -> dataTable),
          idCol, buckets, batchId)
        Bucketing.maybeCompactVersionedBucketed(spark, dataTable,
          versionsTable, idCol, buckets, maxFiles)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** [[bm25IndexUpsertStream]] on the bucketed layout: per-doc versioned
    * postings rows in an id-bucketed table pair, resolve shuffle-free.
    */
  def bm25IndexUpsertStreamBucketed(docs: DataFrame, postingsTable: String,
      versionsTable: String, checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 32,
      maxFiles: Int = 64): StreamingQuery =
    versionedIndexStreamBucketed(docs, postingsTable, versionsTable,
      checkpointDir, idCol, buckets,
      b => graft.ext.TextRank.postings(
        b.filter(col(textCol).isNotNull), idCol, textCol),
      maxFiles)

  // ---- round-15 (r14 verdict item 1): the HEAVY standing-index families
  // migrate to the bucketed layout x143 proved. Their registry rows were
  // the slowest precisely because every serving read re-shuffled the
  // data log (two exchanges: the per-id max-seq aggregate + the
  // doc-keyed join) — SCALING.md's bucketed-vs-flat table put the flat
  // resolve at 2-3.4× at ×100 and widening. The bucketed twins below
  // are the SAME derive functions over versionedIndexStreamBucketed,
  // so the resolved rows are bit-identical to the flat streams
  // (CORRECTNESS hashes unchanged — the r15 gate pins it); what changes
  // is only the plan: zero exchanges, bucket-pruned point probes.

  /** [[bandIndexUpsertStream]] on the bucketed layout: per-doc versioned
    * band rows in an id-bucketed table pair, resolve shuffle-free.
    */
  def bandIndexUpsertStreamBucketed(docs: DataFrame, bandsTable: String,
      versionsTable: String, checkpointDir: String, idCol: String = "doc_id",
      buckets: Int = 32, maxFiles: Int = 64,
      signer: DataFrame => DataFrame = graft.ext.TextDedup.minhashSignatures(_)): StreamingQuery =
    versionedIndexStreamBucketed(docs, bandsTable, versionsTable,
      checkpointDir, idCol, buckets,
      b => graft.ext.TextDedup.signatureBands(signer(b)), maxFiles)

  /** Read side of [[bandIndexUpsertStreamBucketed]] — the
    * [[resolvedBands]] frame off the shuffle-free bucketed resolve.
    */
  def resolvedBandsBucketed(spark: SparkSession, bandsTable: String,
      versionsTable: String, idCol: String = "doc_id"): DataFrame =
    graft.pipeline.Bucketing.resolvedBucketed(spark, bandsTable, versionsTable, idCol)
      .select(col("band"), col("band_hash"), col(idCol), col("sig"))

  /** [[embIndexUpsertStream]] on the bucketed layout. */
  def embIndexUpsertStreamBucketed(vectors: DataFrame, vecsTable: String,
      versionsTable: String, checkpointDir: String, idCol: String = "vec_id",
      buckets: Int = 32, maxFiles: Int = 64): StreamingQuery =
    versionedIndexStreamBucketed(vectors, vecsTable, versionsTable,
      checkpointDir, idCol, buckets,
      b => b.filter(col("embedding").isNotNull)
        .select(col(idCol),
          graft.ext.Similarity.lshBucket(col("embedding")).as("bucket"),
          col("embedding")),
      maxFiles)

  /** Read side of [[embIndexUpsertStreamBucketed]] — the
    * [[resolvedVectors]] frame off the shuffle-free bucketed resolve.
    */
  def resolvedVectorsBucketed(spark: SparkSession, vecsTable: String,
      versionsTable: String, idCol: String = "vec_id"): DataFrame =
    graft.pipeline.Bucketing.resolvedBucketed(spark, vecsTable, versionsTable, idCol)
      .select(col(idCol), col("bucket"), col("embedding"))

  /** [[cdcIndexUpsertStream]] on the bucketed layout. */
  def cdcIndexUpsertStreamBucketed(docs: DataFrame, chunksTable: String,
      versionsTable: String, checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 32, maxFiles: Int = 64,
      chunker: DataFrame => DataFrame = graft.ext.TextDedup.cdcChunksFast(_)): StreamingQuery =
    versionedIndexStreamBucketed(docs, chunksTable, versionsTable,
      checkpointDir, idCol, buckets,
      b => chunker(b.filter(col(textCol).isNotNull))
        .select(col(idCol), col("h")).distinct(),
      maxFiles)

  /** Read side of [[cdcIndexUpsertStreamBucketed]] — the
    * [[resolvedChunks]] frame off the shuffle-free bucketed resolve.
    */
  def resolvedChunksBucketed(spark: SparkSession, chunksTable: String,
      versionsTable: String, idCol: String = "doc_id"): DataFrame =
    graft.pipeline.Bucketing.resolvedBucketed(spark, chunksTable, versionsTable, idCol)
      .select(col(idCol), col("h"))

  /** [[ivfIndexUpsertStream]] on the bucketed layout: the stored
    * assignment (the inverted file) lands id-bucketed, so the serving
    * resolve is shuffle-free and a per-doc membership probe prunes to
    * one bucket.
    */
  def ivfIndexUpsertStreamBucketed(vectors: DataFrame, vecsTable: String,
      versionsTable: String, checkpointDir: String, centroids: DataFrame,
      idCol: String = "vec_id", buckets: Int = 32,
      maxFiles: Int = 64): StreamingQuery =
    versionedIndexStreamBucketed(vectors, vecsTable, versionsTable,
      checkpointDir, idCol, buckets,
      b => graft.ext.Similarity.ivfAssign(
          b.filter(col("embedding").isNotNull)
            .select(col(idCol).as("vec_id"), col("embedding")), centroids)
        .select(col("vec_id").as(idCol), col("cell_id"), col("embedding")),
      maxFiles)

  /** Read side of [[ivfIndexUpsertStreamBucketed]] — the
    * [[resolvedIvfVectors]] frame off the shuffle-free bucketed resolve.
    */
  def resolvedIvfVectorsBucketed(spark: SparkSession, vecsTable: String,
      versionsTable: String, idCol: String = "vec_id"): DataFrame =
    graft.pipeline.Bucketing.resolvedBucketed(spark, vecsTable, versionsTable, idCol)
      .select(col(idCol), col("cell_id"), col("embedding"))

  /** The shared PRODUCTION-FUSION loop on the bucketed layout — the
    * [[bandIndexUpsertDedupStream]] choreography (verdict/stats append
    * FIRST under its own landedSeq guard; both log reads capped at
    * `ingest_seq < batchId` so a replayed batch never sees the crashed
    * attempt's own appends; recomputation deterministic) with the two
    * versioned logs landing as id-bucketed tables. The per-batch probe
    * resolve ([[liveRowsBeforeBucketed]]) is where this earns its keep:
    * the flat fusions re-shuffle the data log on EVERY micro-batch to
    * resolve the live index the probe needs — two exchanges per batch,
    * forever — while here the capped aggregate and the id join both
    * ride the bucket partitioning (zero exchanges; the cap is a
    * non-key predicate). The side log (verdicts/novelty stats) stays a
    * flat stamped parquet dir: it is append-only data that is never
    * key-joined back, so a bucketed layout would buy it nothing.
    * `perBatch(resolvedBatch, liveBefore)` returns (side rows,
    * data-log rows); `liveBefore` is None on the first batch.
    * `probePlanDir`, when set, records ONE row per batch — the probe
    * resolve's shuffle-exchange count — into a stamped side log, so
    * the no-shuffle property of the loop's recurring read can sit
    * under the correctness gate itself (the x143 idiom applied to the
    * FUSED per-batch plan; x146 hash-pins it to 0). A batch with no
    * prior index records 0 (vacuously shuffle-free).
    */
  private def fusedUpsertStreamBucketed(docs: DataFrame, dataTable: String,
      versionsTable: String, sideDir: String, checkpointDir: String,
      idCol: String, buckets: Int, maxFiles: Int,
      perBatch: (DataFrame, Option[DataFrame]) => (DataFrame, DataFrame),
      probePlanDir: Option[String] = None): StreamingQuery = {
    import graft.pipeline.{Bucketing, Ingest}
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = resolveBatchVersions(batch.toDF(), idCol)
        val live = liveRowsBeforeBucketed(spark, dataTable, versionsTable, idCol, batchId)
        probePlanDir.foreach { dir =>
          if (!landedSeq(spark, dir, batchId)) {
            import spark.implicits._
            Ingest.appendWithSeq(
              Seq(live.map(Bucketing.countExchanges).getOrElse(0).toLong)
                .toDF("probe_exchanges"),
              dir, batchId)
          }
        }
        val (sideRows, dataRows) = perBatch(b, live)
        if (!landedSeq(spark, sideDir, batchId))
          Ingest.appendWithSeq(sideRows, sideDir, batchId)
        // both log appends concurrently (round-16, r15 verdict item 1)
        Ingest.appendBucketedPairWithSeq(spark,
          Seq(b.select(col(idCol)) -> versionsTable, dataRows -> dataTable),
          idCol, buckets, batchId)
        Bucketing.maybeCompactVersionedBucketed(spark, dataTable,
          versionsTable, idCol, buckets, maxFiles)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** [[bandIndexUpsertDedupStream]] on the bucketed layout (semantics
    * verbatim — verdicts against the live index of strictly-prior
    * batches, self-matches excluded, null-text arrival = retraction).
    */
  def bandIndexUpsertDedupStreamBucketed(docs: DataFrame, bandsTable: String,
      versionsTable: String, verdictsDir: String, checkpointDir: String,
      idCol: String = "doc_id", buckets: Int = 32, maxFiles: Int = 64,
      signer: DataFrame => DataFrame = graft.ext.TextDedup.minhashSignatures(_),
      threshold: Double = 0.5,
      maxBucket: Int = graft.ext.TextDedup.DefaultMaxBucket,
      probePlanDir: Option[String] = None): StreamingQuery = {
    import graft.ext.TextDedup
    fusedUpsertStreamBucketed(docs, bandsTable, versionsTable, verdictsDir,
      checkpointDir, idCol, buckets, maxFiles, { (b, liveOpt) =>
        val sigs = signer(b).localCheckpoint(false) // feeds verdicts AND bands
        val live = liveOpt
          .map(_.select(col("band"), col("band_hash"), col(idCol), col("sig")))
          .getOrElse(TextDedup.signatureBands(sigs).limit(0))
        (TextDedup.incrementalDedupBanded(live, sigs, threshold, maxBucket,
          excludeSelf = true),
          TextDedup.signatureBands(sigs))
      }, probePlanDir)
  }

  /** [[embIndexUpsertDedupStream]] on the bucketed layout (semantics
    * verbatim; `idCol` must be "vec_id" — the verdict kernel's name).
    */
  def embIndexUpsertDedupStreamBucketed(vectors: DataFrame, vecsTable: String,
      versionsTable: String, verdictsDir: String, checkpointDir: String,
      idCol: String = "vec_id", buckets: Int = 32, maxFiles: Int = 64,
      threshold: Double = 0.9): StreamingQuery = {
    import graft.ext.Similarity
    fusedUpsertStreamBucketed(vectors, vecsTable, versionsTable, verdictsDir,
      checkpointDir, idCol, buckets, maxFiles, { (b, liveOpt) =>
        val arrivals = b.filter(col("embedding").isNotNull)
          .select(col(idCol),
            Similarity.lshBucket(col("embedding")).as("bucket"),
            col("embedding"))
          .localCheckpoint(false) // one bucketing pass feeds verdicts AND the append
        val live = liveOpt
          .map(_.select(col(idCol), col("bucket"), col("embedding")))
          .getOrElse(arrivals.limit(0))
        (Similarity.embeddingDedupVerdicts(live, arrivals, threshold,
            excludeSelf = true)
          .select(col(idCol), col("bucket"), col("keep")),
          arrivals)
      })
  }

  /** [[cdcIndexUpsertNoveltyStream]] on the bucketed layout (semantics
    * verbatim — self INCLUDED in the live content store at probe time).
    */
  def cdcIndexUpsertNoveltyStreamBucketed(docs: DataFrame, chunksTable: String,
      versionsTable: String, statsDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 32, maxFiles: Int = 64,
      chunker: DataFrame => DataFrame = graft.ext.TextDedup.cdcChunksFast(_)): StreamingQuery = {
    import graft.ext.TextDedup
    fusedUpsertStreamBucketed(docs, chunksTable, versionsTable, statsDir,
      checkpointDir, idCol, buckets, maxFiles, { (b, liveOpt) =>
        val chunks = chunker(b.filter(col(textCol).isNotNull))
          .localCheckpoint(false) // one chunk pass feeds stats AND the append
        val live = liveOpt.map(_.select(col("h")))
          .getOrElse(chunks.select(col("h")).limit(0))
        (TextDedup.cdcIncrementalAgainstIndex(live, chunks, idCol),
          chunks.select(col(idCol), col("h")).distinct())
      })
  }

  /** Read side of [[docStoreStream]]: the LIVE corpus — each doc's
    * latest-version row, deletions absent (all arrival columns,
    * `ingest_seq` dropped).
    */
  def resolvedDocs(spark: SparkSession, docsDir: String,
      versionsDir: String, idCol: String = "doc_id"): DataFrame =
    resolvedRows(spark, docsDir, versionsDir, idCol)

  /** AS-OF (time-travel) resolution of a versioned data log — the
    * training-run reproducibility read (round-13, x132): "the exact
    * index/corpus snapshot batch `asOfSeq` saw" is each id's data rows
    * stamped with its max version-log seq AMONG seqs <= `asOfSeq`. Ids
    * first arriving later do not exist yet; ids whose version at that
    * point derived zero rows (null text, deleted) are absent — exactly
    * the state [[resolvedRows]] served the moment batch `asOfSeq`
    * committed. GENERIC over every versioned family (doc store,
    * postings, bands, vectors, chunks, IVF cells): the logs share one
    * layout, so one read serves all — DocStoreAsOfSpec pins it against the
    * postings log too. Same cost shape as the live read: one id-keyed
    * equi-join of the data log against the capped max-seq aggregate.
    *
    * FIDELITY BOUND (pinned as data by x132's s0_compacted arm):
    * [[maybeCompactVersioned]] and [[ivfRefitSwap]] destroy superseded
    * versions, so an as-of read OLDER than the last rewrite silently
    * loses every id updated or deleted since — only never-touched ids
    * survive into the reconstruction. A snapshot that must outlive
    * compaction is a parquet-dir copy of both logs taken before it;
    * at 100 TB that is the familiar LSM trade — history retention and
    * read amplification are the same knob (`maxFiles`).
    */
  def resolvedRowsAsOf(spark: SparkSession, dataDir: String,
      versionsDir: String, idCol: String, asOfSeq: Long): DataFrame = {
    val latest = spark.read.parquet(versionsDir)
      .filter(col("ingest_seq") <= asOfSeq)
      .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
    spark.read.parquet(dataDir)
      .join(latest, Seq(idCol))
      .filter(col("ingest_seq") === col("__vmax"))
      .drop("__vmax", "ingest_seq")
  }

  /** The PRODUCTION continuous-dedup loop over a RETRACTABLE index
    * (round-13, x125) — [[dedupedCorpusStream]]'s verdict step fused
    * with [[bandIndexUpsertStream]]'s versioned maintenance, which is
    * the composition a real update-capable ingest runs: every arriving
    * doc version gets a dedup VERDICT against the live index of
    * strictly-prior batches (updates/retractions applied — a stale band
    * can neither convict nor exonerate), and then enters the versioned
    * index as its doc's newest version (null-text arrival = retraction,
    * derives no bands). Self-matches are EXCLUDED from verdicts
    * (`excludeSelf` — a doc's update probes an index still serving its
    * own previous version, and "near-dup of your own last crawl" is not
    * a dedup signal); in-batch smaller-id rivals still count.
    *
    * Deliberately NOT composed from the two existing streams: the
    * verdict probe and the band append share ONE signature pass per
    * batch (`sigs`), and the probe must cap BOTH logs at
    * `ingest_seq < batchId` — a replayed batch must not see the crashed
    * attempt's own appends (the dedupedCorpusStream idiom applied to
    * the resolve). Exactly-once: the verdict append lands FIRST under
    * its own landedSeq guard, so a replay that finds it landed skips
    * recomputation entirely; if it hasn't landed, no later batch ran
    * (AvailableNow is ordered), the previous batch's compaction kept
    * exactly the per-id max-seq rows ≤ batchId-1 — the state the probe
    * needs — and the recomputation is deterministic.
    *
    * Per-batch cost: one O(batch) signature pass + the bucketed index
    * probe (O(batch × touched buckets) after the doc-keyed resolve
    * join) + three stamped appends; compaction amortizes the resolve
    * back to O(live bands).
    */
  private[graft] def bandIndexUpsertDedupStream(docs: DataFrame, bandsDir: String,
      versionsDir: String, verdictsDir: String, checkpointDir: String,
      idCol: String = "doc_id", maxBandFiles: Int = 64,
      signer: DataFrame => DataFrame = graft.ext.TextDedup.minhashSignatures(_),
      threshold: Double = 0.5,
      maxBucket: Int = graft.ext.TextDedup.DefaultMaxBucket): StreamingQuery = {
    import graft.ext.TextDedup
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = resolveBatchVersions(batch.toDF(), idCol)
        val sigs = signer(b).localCheckpoint(false) // feeds verdicts AND bands
        val live = liveRowsBefore(spark, bandsDir, versionsDir, idCol, batchId)
          .map(_.select(col("band"), col("band_hash"), col(idCol), col("sig")))
          .getOrElse(TextDedup.signatureBands(sigs).limit(0))
        if (!landedSeq(spark, verdictsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            TextDedup.incrementalDedupBanded(live, sigs, threshold, maxBucket,
              excludeSelf = true),
            verdictsDir, batchId)
        if (!landedSeq(spark, versionsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(b.select(col(idCol)), versionsDir, batchId)
        if (!landedSeq(spark, bandsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            TextDedup.signatureBands(sigs), bandsDir, batchId)
        maybeCompactVersioned(spark, bandsDir, versionsDir, maxBandFiles, idCol)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** The [[bandIndexUpsertDedupStream]] fusion applied to the VECTOR
    * index (round-13, x126) — [[embeddingDedupStream]]'s verdict step
    * over [[embIndexUpsertStream]]'s versioned maintenance: every
    * arriving embedding VERSION gets a dedup verdict against the live
    * vector index of strictly-prior batches (updates applied,
    * retractions invisible — a stale vector can neither convict nor
    * exonerate), then enters the versioned index as its doc's newest
    * version. Null-embedding arrival = retraction: it advances the
    * version log, derives no vector row, and gets NO verdict row (it
    * has no bucket to probe). Self-matches are EXCLUDED
    * ([[graft.ext.Similarity.embeddingDedupVerdicts]]'s `excludeSelf` —
    * a re-embedded doc probes an index still serving its own previous
    * vector, and "near-dup of your own last embedding" is not a dedup
    * signal); in-batch smaller-id rivals still count.
    *
    * Same exactly-once choreography as the band fusion: the verdict
    * append lands FIRST under its own landedSeq guard, both logs are
    * capped at `ingest_seq < batchId` so a replayed batch never sees
    * the crashed attempt's own appends, and the recomputation is
    * deterministic (cosine is the fused kernel's fixed left-to-right
    * accumulation). One bucketing pass per batch feeds both the probe
    * and the vector append. Per-batch cost: O(batch) bucketing + the
    * bucket equi-join probe (O(batch × touched buckets) after the
    * doc-keyed resolve join) + three stamped appends; compaction
    * amortizes the resolve back to O(live vectors). The verdict kernel
    * reads the id column as `vec_id`, so `idCol` must be "vec_id".
    */
  private[graft] def embIndexUpsertDedupStream(vectors: DataFrame, vecsDir: String,
      versionsDir: String, verdictsDir: String, checkpointDir: String,
      idCol: String = "vec_id", maxVecFiles: Int = 64,
      threshold: Double = 0.9): StreamingQuery = {
    import graft.ext.Similarity
    val q = vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = resolveBatchVersions(batch.toDF(), idCol)
        // one bucketing pass feeds verdicts AND the index append (the
        // verdict kernel reuses a caller-materialized bucket column)
        val arrivals = b.filter(col("embedding").isNotNull)
          .select(col(idCol),
            Similarity.lshBucket(col("embedding")).as("bucket"),
            col("embedding"))
          .localCheckpoint(false)
        val live = liveRowsBefore(spark, vecsDir, versionsDir, idCol, batchId)
          .map(_.select(col(idCol), col("bucket"), col("embedding")))
          .getOrElse(arrivals.limit(0))
        if (!landedSeq(spark, verdictsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            Similarity.embeddingDedupVerdicts(live, arrivals, threshold,
                excludeSelf = true)
              .select(col(idCol), col("bucket"), col("keep")),
            verdictsDir, batchId)
        if (!landedSeq(spark, versionsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(b.select(col(idCol)), versionsDir, batchId)
        if (!landedSeq(spark, vecsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(arrivals, vecsDir, batchId)
        maybeCompactVersioned(spark, vecsDir, versionsDir, maxVecFiles, idCol)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** The production fusion for the CHUNK index (round-13, x127) —
    * [[cdcNoveltyStream]]'s per-arrival novelty accounting over
    * [[cdcIndexUpsertStream]]'s doc-attributed versioned maintenance:
    * every arriving doc version gets CDC novelty stats (chunks / corpus
    * hits / novel chars) against the live chunk set of strictly-prior
    * batches, then its chunks enter the index as the doc's newest
    * version (null-text arrival = total retraction, derives no chunks
    * and no stats row). Unlike the dedup fusions, SELF is INCLUDED: the
    * live index is the content store, and at probe time the doc's own
    * previous version is still stored — an update's re-used chunks are
    * exactly the bytes a content-addressable store would NOT write
    * again, so they are not novel. The retraction win is about OTHERS:
    * a third doc's stale chunks no longer suppress novelty once that
    * doc was updated or deleted.
    *
    * One chunking pass per batch feeds both the stats probe and the
    * index append; the probe collapses the live index to distinct `h`
    * before its equi-join, so probe cost matches the attribution-free
    * [[cdcNoveltyStream]]. Exactly-once: stats land first under their
    * own landedSeq guard, both logs capped at `ingest_seq < batchId`.
    * `chunker` defaults to the gear-hash fast path; pass the portable
    * [[graft.ext.TextDedup.cdcChunks]] when an oracle replays the run.
    */
  private[graft] def cdcIndexUpsertNoveltyStream(docs: DataFrame, chunksDir: String,
      versionsDir: String, statsDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      maxChunkFiles: Int = 64,
      chunker: DataFrame => DataFrame = graft.ext.TextDedup.cdcChunksFast(_)): StreamingQuery = {
    import graft.ext.TextDedup
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = resolveBatchVersions(batch.toDF(), idCol)
        val chunks = chunker(b.filter(col(textCol).isNotNull))
          .localCheckpoint(false) // one chunk pass feeds stats AND the index append
        val live = liveRowsBefore(spark, chunksDir, versionsDir, idCol, batchId)
          .map(_.select(col("h")))
          .getOrElse(chunks.select(col("h")).limit(0))
        if (!landedSeq(spark, statsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            TextDedup.cdcIncrementalAgainstIndex(live, chunks, idCol),
            statsDir, batchId)
        if (!landedSeq(spark, versionsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(b.select(col(idCol)), versionsDir, batchId)
        if (!landedSeq(spark, chunksDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            chunks.select(col(idCol), col("h")).distinct(), chunksDir, batchId)
        maybeCompactVersioned(spark, chunksDir, versionsDir, maxChunkFiles, idCol)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming GLOBAL concat-chunk packing (round-15, x149) — x147's
    * packer as a CONTINUOUS ingest op: the standing state is one
    * TOKEN-OFFSET WATERMARK (the total token count of everything
    * packed so far), and each arriving batch is assigned chunk ids by
    * the batch-local two-level cumsum shifted by that base
    * ([[graft.ext.TextStats.concatChunkPack]]'s `baseOffset`). Because
    * concat-chunk assignment is a pure function of (tokens before me,
    * my tokens), the assignment is PREFIX-STABLE: a doc's chunk ids
    * never change once written, no matter how much later data arrives
    * — which is what makes the packed log WRITE-ONCE training data (a
    * re-pack is a new log; updates/retractions belong UPSTREAM of
    * packing, in the versioned doc store). Exactly-once: the append is
    * landed-seq guarded, and the base ([[packWatermarkBefore]]) is
    * view-backed O(1) on the fast path — total tokens are an additive
    * scalar (the x139 class), maintained as a one-row standing view
    * stamped with the last applied batch — with any staleness (first
    * batch, crash between append and view write, deleted view) healing
    * through the replay-exact capped sum over the landed rows stamped
    * `< batchId`. 100 TB posture: the steady-state per-batch cost is
    * O(batch) — one batch-local cumsum, one seq-pruned batch read, one
    * tiny view swap; the log-wide sum is only ever the heal path.
    */
  def packStream(docs: DataFrame, packDir: String, checkpointDir: String,
      budget: Int, sourceCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text", chunkViewDir: Option[String] = None,
      maxViewFiles: Int = 64): StreamingQuery = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // ONE offset-view read per batch (round-16 optimization round):
        // the append's watermark, the view-staleness check, and the view
        // advance each re-read the 1-row view — three floor-priced jobs
        // for one scalar. Nothing writes the view or the < batchId slice
        // of the log between these uses, so a single read is exact.
        val cur = readOffsetView(spark, packDir)
        lazy val wmBefore: Long = cur match {
          case Some((total, seq)) if seq == batchId - 1 => total
          case _ =>
            if (!pathExists(spark, packDir)) 0L
            else spark.read.parquet(packDir)
              .filter(col("ingest_seq") < batchId)
              .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
        }
        if (!landedSeq(spark, packDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            graft.ext.TextStats.concatChunkPack(batch.toDF(), budget,
              sourceCol, idCol, textCol, wmBefore),
            packDir, batchId)
        // scalar-view maintenance OUTSIDE the landed guard (idempotent,
        // seq-stamped): a replayed batch whose rows landed still
        // advances the view, so the next batch keeps the O(1) fast path
        if (!cur.exists(_._2 >= batchId)) {
          val batchTokens = spark.read.parquet(packDir)
            .filter(col("ingest_seq") === batchId)
            .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
          writeOffsetView(spark, packDir, wmBefore + batchTokens, batchId)
        }
        // PER-CHUNK serving state (round-16, r15 verdict item 7 —
        // ROADMAP's own candidate): x148's per-chunk view as a STANDING
        // additive rollup keyed by chunk_id, the x139 delta-log idiom.
        // Per batch the delta is the batch's landed packed rows exploded
        // into (chunk, doc-segment) incidences and partially aggregated
        // — O(batch) work; prefix-stability means arrivals only ever ADD
        // segments (insert-only deltas, no subtraction side), and only
        // the frontier chunk is ever touched by more than one batch.
        // The served view ([[packChunkView]]) is the group-keyed sum
        // over the log, folded by the rollup compaction cadence.
        chunkViewDir.foreach { cvDir =>
          // replay guard by MAX seq, not exact match: deltas are
          // insert-only and land in batch order, so "max stamp >=
          // batchId" is exactly "this batch's delta landed" — and unlike
          // the exact-match guard it survives the rollup fold's
          // max-seq re-stamp, so even a fresh-checkpoint FULL replay
          // after compaction stays a no-op (spec-pinned). The landed
          // MARKER carries the same max (appends advance it, the fold's
          // swapRewrite preserves it), so the happy path is one glob;
          // marker-less dirs keep the row read (round-16 optimization
          // round).
          val landed = pathExists(spark, cvDir) && {
            val loc = new org.apache.hadoop.fs.Path(cvDir)
            val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
            graft.pipeline.Bucketing.landedMarkerSeqAt(fs, loc) match {
              case Some(m) => m >= batchId
              case None => spark.read.parquet(cvDir).agg(max(col("ingest_seq")))
                .head().getLong(0) >= batchId
            }
          }
          if (!landed) {
            val delta = spark.read.parquet(packDir)
              .filter(col("ingest_seq") === batchId)
              .select(col("first_chunk"),
                explode(sequence(col("first_chunk"), col("last_chunk")))
                  .as("chunk_id"))
              .groupBy(col("chunk_id"))
              .agg(count(lit(1)).as("n_rows"),
                count(lit(1)).as("n_segments"),
                sum((col("first_chunk") === col("chunk_id")).cast("long"))
                  .as("n_docs_started"))
            graft.pipeline.Ingest.appendWithSeq(delta, cvDir, batchId)
          }
          maybeCompactRollup(spark, cvDir, Seq("chunk_id"), maxViewFiles)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Read side of [[packStream]]'s standing per-chunk view: for every
    * chunk of the packed stream, how many document segments it holds
    * and how many documents START in it — x148's fragmentation
    * accounting served incrementally (one group-keyed sum over the
    * delta log, never a corpus re-pack; x151 pins it against the batch
    * recompute).
    */
  def packChunkView(spark: SparkSession, chunkViewDir: String): DataFrame =
    resolvedRollup(spark, chunkViewDir, Seq("chunk_id"))
      .select(col("chunk_id"), col("n_segments"), col("n_docs_started"))

  private def packOffsetViewDir(packDir: String): String =
    packDir.stripSuffix("/") + "_offset_view"

  private def readOffsetView(spark: SparkSession,
      packDir: String): Option[(Long, Long)] = {
    val dir = packOffsetViewDir(packDir)
    if (!pathExists(spark, dir)) None
    else spark.read.parquet(dir).collect().headOption
      .map(r => (r.getAs[Long]("total_tokens"), r.getAs[Long]("off_seq")))
  }

  private def writeOffsetView(spark: SparkSession, packDir: String,
      total: Long, seq: Long): Unit = {
    import spark.implicits._
    val df = Seq((total, seq)).toDF("total_tokens", "off_seq")
    val dir = packOffsetViewDir(packDir)
    if (pathExists(spark, dir)) swapRewrite(spark, dir, df)
    else df.write.mode("overwrite").parquet(dir)
  }

  /** The pack log's token watermark BEFORE `batchId` — the total token
    * count of every batch stamped strictly earlier. Fast path: the
    * standing scalar view (one row; total tokens are an additive
    * scalar, the x139 class) when it is stamped exactly at the
    * previous batch; any staleness — first batch, a crash between the
    * append and the view write, a view dir someone deleted — falls
    * back to the replay-exact capped sum over the log and the next
    * view write heals it. Public read at `batchId = Long.MaxValue` is
    * the CURRENT watermark ([[packWatermark]]).
    */
  private def packWatermarkBefore(spark: SparkSession, packDir: String,
      batchId: Long): Long =
    readOffsetView(spark, packDir) match {
      case Some((total, seq)) if seq == batchId - 1 => total
      case _ =>
        if (!pathExists(spark, packDir)) 0L
        else spark.read.parquet(packDir)
          .filter(col("ingest_seq") < batchId)
          .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
    }

  /** The packed stream's current token watermark — view-backed O(1)
    * when fresh, log-derived otherwise.
    */
  def packWatermark(spark: SparkSession, packDir: String): Long =
    readOffsetView(spark, packDir) match {
      case Some((total, _)) => total
      case None =>
        if (!pathExists(spark, packDir)) 0L
        else spark.read.parquet(packDir)
          .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
    }

  /** Intra-batch duplicate-version resolution shared by every
    * versioned-index loop: at most one version per id survives a batch,
    * chosen deterministically (min full-row xxhash64 — the
    * weightedSampleStream rule without a priority column; the intended
    * producer contract is one version per id per batch anyway). The
    * result is localCheckpointed: every caller feeds it to at least two
    * stamped appends.
    */
  private def resolveBatchVersions(raw: DataFrame, idCol: String): DataFrame = {
    val perId = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(xxhash64(raw.columns.map(col).toIndexedSeq: _*).asc)
    raw.withColumn("__v", row_number().over(perId))
      .filter(col("__v") === 1).drop("__v")
      .localCheckpoint(false)
  }

  /** The batchId-capped live-index resolve shared by the production
    * fusions ([[bandIndexUpsertDedupStream]] /
    * [[embIndexUpsertDedupStream]] / [[cdcIndexUpsertNoveltyStream]]):
    * each id's data rows stamped with its max version-log seq, BOTH
    * logs capped at `ingest_seq < batchId` — a replayed batch must not
    * see the crashed attempt's own appends (the dedupedCorpusStream
    * idiom applied to the resolve). None when either log does not
    * exist yet (first batch); callers select their index columns.
    */
  private[graft] def liveRowsBefore(spark: SparkSession, dataDir: String,
      versionsDir: String, idCol: String, batchId: Long): Option[DataFrame] =
    if (pathExists(spark, dataDir) && pathExists(spark, versionsDir)) {
      val latest = spark.read.parquet(versionsDir)
        .filter(col("ingest_seq") < batchId)
        .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
      Some(spark.read.parquet(dataDir)
        .filter(col("ingest_seq") < batchId)
        .join(latest, Seq(idCol))
        .filter(col("ingest_seq") === col("__vmax"))
        .drop("__vmax"))
    } else None

  /** [[liveRowsBefore]] on the bucketed table layout (round-15): the
    * batchId cap is a non-key predicate, so BOTH the capped max-seq
    * aggregate and the id-keyed join still ride the buckets'
    * HashPartitioning — the per-batch probe resolve of the fused
    * production loops plans with ZERO shuffle exchanges, which is where
    * the flat fusions paid two exchanges per micro-batch forever. The
    * seq-match stays the subtraction form ([[graft.pipeline.Bucketing
    * .resolvedBucketed]]'s rationale: a bare cross-side equality is
    * extracted into the join KEYS and refuses the id-only bucket
    * partitioning). Heals the rewrite crash window before reading.
    */
  private[graft] def liveRowsBeforeBucketed(spark: SparkSession, dataTable: String,
      versionsTable: String, idCol: String, batchId: Long): Option[DataFrame] = {
    graft.pipeline.Bucketing.healBucketedSwap(spark, dataTable)
    graft.pipeline.Bucketing.healBucketedSwap(spark, versionsTable)
    if (spark.catalog.tableExists(dataTable) && spark.catalog.tableExists(versionsTable)) {
      val latest = spark.table(versionsTable)
        .filter(col("ingest_seq") < batchId)
        .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
      Some(spark.table(dataTable)
        .filter(col("ingest_seq") < batchId)
        .join(latest, Seq(idCol))
        .filter(col("ingest_seq") - col("__vmax") === 0)
        .drop("__vmax"))
    } else None
  }

  /** The shared versioned-index maintenance loop (postings: x117,
    * bands: x120, vectors: x122, chunks: x123): per micro-batch, resolve
    * intra-batch duplicate versions ([[resolveBatchVersions]]), append
    * (idCol, seq) to the version log and `derive(batch)` rows to the
    * data log — both landedSeq-guarded stamped appends — then compact
    * when fragmented. A doc's LIVE rows are the ones stamped with its
    * max version-log seq ([[resolvedRows]]); a version that derives
    * ZERO rows (null text, unshingleable) is thereby a retraction.
    */
  private def versionedIndexStream(docs: DataFrame, dataDir: String,
      versionsDir: String, checkpointDir: String, idCol: String,
      maxFiles: Int, derive: DataFrame => DataFrame): StreamingQuery = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = resolveBatchVersions(batch.toDF(), idCol) // feeds both log appends, one pass
        if (!landedSeq(spark, versionsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(b.select(col(idCol)), versionsDir, batchId)
        if (!landedSeq(spark, dataDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(derive(b), dataDir, batchId)
        maybeCompactVersioned(spark, dataDir, versionsDir, maxFiles, idCol)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Live rows of a versioned data log: each id's rows stamped with its
    * max version-log seq (all data columns, `ingest_seq` dropped).
    */
  private def resolvedRows(spark: SparkSession, dataDir: String,
      versionsDir: String, idCol: String): DataFrame = {
    val latest = spark.read.parquet(versionsDir)
      .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
    spark.read.parquet(dataDir)
      .join(latest, Seq(idCol))
      .filter(col("ingest_seq") === col("__vmax"))
      .drop("__vmax", "ingest_seq")
  }

  /** Compaction for a versioned data log ([[bm25IndexUpsertStream]] /
    * [[bandIndexUpsertStream]] / [[embIndexUpsertStream]] /
    * [[cdcIndexUpsertStream]]): when EITHER log exceeds `maxFiles`
    * data files, rewrite the data log keeping only live-version rows and
    * shrink the version log to one max-seq row per id. Each rewrite is the
    * crash-safe [[swapRewrite]] swap, and the two are INDEPENDENTLY
    * safe in either crash order: resolution only ever compares data
    * seqs against the version log's per-id max, which both rewrites
    * preserve. Returns whether it compacted.
    */
  def maybeCompactVersioned(spark: SparkSession, dataDir: String,
      versionsDir: String, maxFiles: Int = 64,
      idCol: String = "doc_id"): Boolean = {
    // EITHER log's fragmentation triggers the joint rewrite (round-12
    // ADVICE): a deletion-heavy or small-derive workload appends one
    // version-log file per batch while the data log stays small, so a
    // data-log-only gate never fires and the per-read max-seq aggregate
    // scans an ever-growing version log. The version log must EXIST for
    // any rewrite (liveness is defined by it — round-13 review: a
    // public-API caller pointing at a data-only log must get `false`,
    // not a mid-batch read crash).
    val fragmented = pathExists(spark, versionsDir) && (
      (pathExists(spark, dataDir) &&
        cdcIndexFileCount(spark, dataDir) > maxFiles) ||
      cdcIndexFileCount(spark, versionsDir) > maxFiles)
    if (fragmented) {
      val latest = spark.read.parquet(versionsDir)
        .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
        .localCheckpoint(false) // both rewrites read it; versionsDir is about to be swapped
      if (pathExists(spark, dataDir))
        swapRewrite(spark, dataDir,
          spark.read.parquet(dataDir)
            .join(latest, Seq(idCol))
            .filter(col("ingest_seq") === col("__vmax"))
            .drop("__vmax"))
      swapRewrite(spark, versionsDir,
        latest.select(col(idCol), col("__vmax").as("ingest_seq")))
    }
    fragmented
  }

  /** HISTORY-PRESERVING compaction for a versioned log (round-14, x141;
    * r13 verdict item 3). [[maybeCompactVersioned]] folds EVERYTHING to
    * the live versions, so an as-of consumer had to choose between
    * fragmentation forever (`maxFiles = Int.MaxValue`, the x132/x138
    * pin) and losing history at every rewrite. This folds only the
    * history no promised read needs: versions stamped `<= floorSeq`
    * collapse to each id's max-seq-at-or-below-floor row(s); versions
    * above the floor are retained VERBATIM. Contract:
    * [[resolvedRowsAsOf]] at any `asOfSeq >= floorSeq` is bit-equal to
    * the uncompacted twin — for S >= floor, an id's max version <= S is
    * either a retained above-floor row or exactly the fold survivor —
    * while as-of below the floor silently loses ids updated/deleted in
    * (S, floor], which is why the floor is RECORDED (a one-row marker
    * next to the version log) and [[resolvedRowsAsOfChecked]] refuses
    * by name instead of answering wrong. Crash-safe in either swap
    * order, the [[maybeCompactVersioned]] argument verbatim: resolution
    * only compares data seqs against the version log's capped per-id
    * max, and both rewrites preserve every (id, max<=S) pair with
    * S >= floor whichever lands first (DocStoreAsOfSpec pins both
    * partial states). The live read is untouched. Repeated floors
    * compose: a later call with a higher floor folds further; the
    * marker keeps the highest floor applied (floors only rise).
    * 100 TB posture: one id-keyed fold over the below-floor slice of
    * both logs — the same shape as the full compaction, amortized the
    * same way; what it buys is that the slice ABOVE the floor keeps
    * every version, so reproducibility and compactness stop being the
    * same knob.
    */
  def compactVersionedKeepAfter(spark: SparkSession, dataDir: String,
      versionsDir: String, floorSeq: Long, idCol: String = "doc_id"): Unit = {
    // the marker lands FIRST (round-14 self-review): a crash between
    // the log swaps and a marker-last write would leave folded history
    // with no recorded floor, and the checked read would silently
    // answer wrong below it. Marker-first fails in the SAFE direction —
    // a crash before the swaps refuses below-floor reads that were
    // still answerable, which is a lost capability, never a wrong
    // answer (and the re-run completes the fold).
    import spark.implicits._
    val marker = Seq(math.max(floorSeq, asOfFloorSeq(spark, versionsDir)))
      .toDF("floor_seq")
    val floorDir = asOfFloorDir(versionsDir)
    if (pathExists(spark, floorDir)) swapRewrite(spark, floorDir, marker)
    else marker.write.mode("overwrite").parquet(floorDir)
    val versions = spark.read.parquet(versionsDir).localCheckpoint(false)
    val below = versions.filter(col("ingest_seq") <= floorSeq)
      .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
      .localCheckpoint(false) // both rewrites read it; versionsDir is about to be swapped
    val data = spark.read.parquet(dataDir).localCheckpoint(false)
    swapRewrite(spark, dataDir,
      data.filter(col("ingest_seq") > floorSeq)
        .unionByName(data.join(below, Seq(idCol))
          .filter(col("ingest_seq") === col("__vmax")).drop("__vmax")))
    swapRewrite(spark, versionsDir,
      versions.filter(col("ingest_seq") > floorSeq)
        .unionByName(below.select(col(idCol), col("__vmax").as("ingest_seq"))))
  }

  private def asOfFloorDir(versionsDir: String): String =
    versionsDir.stripSuffix("/") + "_asof_floor"

  /** The recorded history floor of a versioned log: the highest
    * `floorSeq` any [[compactVersionedKeepAfter]] applied, or
    * `Long.MinValue` when no floor compaction ever ran (every as-of in
    * range — subject to the [[maybeCompactVersioned]] fidelity bound,
    * which records nothing because it promises nothing).
    */
  def asOfFloorSeq(spark: SparkSession, versionsDir: String): Long = {
    val floorDir = asOfFloorDir(versionsDir)
    if (pathExists(spark, floorDir))
      spark.read.parquet(floorDir).agg(max(col("floor_seq"))).head().getLong(0)
    else Long.MinValue
  }

  /** [[resolvedRowsAsOf]] with the x141 floor contract enforced: an
    * as-of below the recorded compaction floor would silently lose
    * every id updated or deleted between it and the floor, so it fails
    * the named precondition instead of answering wrong.
    */
  def resolvedRowsAsOfChecked(spark: SparkSession, dataDir: String,
      versionsDir: String, idCol: String, asOfSeq: Long): DataFrame = {
    val floor = asOfFloorSeq(spark, versionsDir)
    require(asOfSeq >= floor,
      s"as-of $asOfSeq is below the recorded compaction floor $floor: " +
        "history at or below the floor was folded away " +
        "(compactVersionedKeepAfter contract — re-ingest or raise the as-of)")
    resolvedRowsAsOf(spark, dataDir, versionsDir, idCol, asOfSeq)
  }

  /** TRAINING CUT manifest (round-14, x144): a reproducible training
    * run needs one CONSISTENT cut across several independently-seq'd
    * versioned logs — "the corpus as-of S_c, the model stats as-of
    * S_m, together" — published atomically so a training job either
    * sees the whole cut or the previous one, never half. The cut is a
    * tiny (log_name, as_of_seq) table committed through
    * [[graft.pipeline.ManifestTable]] (replace-commit: one manifest
    * flip makes it current; readers mid-resolve keep their version;
    * optimistic concurrency refuses forked history), so cuts are
    * themselves VERSIONED — `readTrainingCut(version = Some(v))`
    * reproduces any historical cut, and every consumer read goes
    * through [[resolvedRowsAsOfChecked]]-class as-ofs whose fidelity
    * the x141 floor contract governs. This is the x132/x138 time
    * travel lifted from "one log" to "the published, atomic,
    * versioned RECIPE over all of them".
    */
  def publishTrainingCut(spark: SparkSession, manifestRoot: String,
      cut: Seq[(String, Long)]): Long = {
    import spark.implicits._
    graft.pipeline.ManifestTable.commit(spark, manifestRoot,
      cut.toDF("log_name", "as_of_seq"), replace = true)
  }

  /** The cut as committed — current manifest version, or any historical
    * one. Model-sized by construction (one row per participating log).
    */
  def readTrainingCut(spark: SparkSession, manifestRoot: String,
      version: Option[Long] = None): Map[String, Long] = {
    val df = version
      .map(v => graft.pipeline.ManifestTable.readVersion(spark, manifestRoot, v))
      .getOrElse(graft.pipeline.ManifestTable.read(spark, manifestRoot))
    df.select(col("log_name"), col("as_of_seq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Streaming GROUPED pps sample — the [[weightedSampleStream]] fold
    * applied per group (the x101 batch form made continuous): the
    * standing state is exactly-n rows PER GROUP, each micro-batch
    * contributes its own per-group top-n and the union re-selects.
    *
    * Equality contract (GroupedWeightedSampleStreamSpec pins it on real
    * arrival splits): for APPEND-ONLY arrivals — and for weight updates
    * that keep a doc in its group — the standing table equals the batch
    * [[graft.ext.TextStats.weightedSamplePerGroup]] over the
    * min-priority version of everything that has arrived. The argument
    * is the global one, groupwise: priorities are pure functions of
    * (id, weight), a row outside a batch's per-group top-n is dominated
    * within its group by n union rows, and per-id min-priority
    * resolution never WORSENS any doc's standing — so a
    * boundary-dropped row can never re-enter the true top-n, and
    * dropping it is lossless. Top-n-per-group under fixed priorities is
    * associative and idempotent, hence batch-split-invariant and safe
    * under foreachBatch replay with no seq-stamp machinery (a crash
    * mid-publish leaves the previous manifest version current).
    *
    * GROUP MOVES are deliberately weaker (round-11 review): a doc
    * re-arriving in a new group resolves deterministically per id (min
    * (priority, w, full-row hash) — one version survives, in exactly
    * one group, and the same arrival sequence replays identically),
    * with two bounded-state caveats. (1) A vacated slot cannot backfill
    * from rows dropped at EARLIER batch boundaries — the old group may
    * stand below n until those rows re-arrive, and on re-arrival they
    * DO backfill, because per-id resolution runs over the whole
    * arriving batch before the per-group trim. (2) Arrival ORDER can
    * change which version of a FORGOTTEN id survives: a version that
    * was dropped from the standing state cannot oppose a later worse
    * re-arrival of the same id (retained min-priority versions, by
    * contrast, never regress — min is monotone on retained ids).
    * GroupedWeightedSampleStreamSpec pins underfill, recovery,
    * single-membership, regression-freedom, and replay-determinism.
    * That is the price of O(groups×n) state — exactness under re-keying
    * would require keeping every arrival. Workloads that re-key docs
    * should route through a keyed dedup upstream or rebuild the
    * affected groups batch-side.
    *
    * `ledger` (round-13, the r12 verdict item 3) BOUNDS both caveats
    * instead of accepting them outright: the standing state keeps the
    * top n+ledger rows per group — the `ledger` rows past the published
    * budget are exactly the last-`ledger`-dropped-per-group versions, so
    * a boundary-dropped version within that horizon (1) backfills a
    * vacated slot immediately and (2) still OPPOSES a later worse
    * re-arrival of its id (x121's `regressed` column reads all-zero on
    * its exact script at ledger ≥ 3 — x124 pins that as oracle data).
    * State grows to O(groups × (n+ledger)); the published sample is the
    * rk ≤ n prefix (the trailing rows carry rk in (n, n+ledger] — filter
    * on read). Versions dropped BEYOND the ledger horizon keep the
    * original caveats — the overflow case is itself spec-pinned.
    *
    * Standing state: O(groups × (n+ledger)) rows forever; per batch one
    * group-keyed shuffle of O(batch + groups·(n+ledger)) — the corpus is
    * never re-scanned. New groups simply appear with their own budget.
    */
  def groupedWeightedSampleStream(docs: DataFrame, groupCol: String,
      weightColName: String, n: Int, sampleDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      salt: String = "pps", ledger: Int = 0): StreamingQuery = {
    import graft.ext.TextStats
    import graft.pipeline.ManifestTable
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // NO per-batch pre-trim (round-11 review): trimming the batch to
        // its own per-group top-n BEFORE per-id resolution let a stale
        // version of a group-moved doc occupy a batch slot and crowd out
        // the very row that should backfill the vacated group — even a
        // full re-delivery could then never refill it. Resolution runs
        // over the whole batch first (the union is O(batch + groups·n)
        // rows — the same order as the batch itself), THEN the per-group
        // trim; the global weightedSampleStream keeps its pre-trim
        // because without re-keying the trim is provably lossless.
        val batchPri = TextStats.prioritize(
            batch.toDF(), col(weightColName), idCol, salt)
          .select(col(idCol), col(groupCol), col("w"), col("priority"))
        val standing = ManifestTable.currentVersion(spark, sampleDir) match {
          case Some(_) => ManifestTable.read(spark, sampleDir).drop("rk")
          case None => batchPri.limit(0)
        }
        val perGroup = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
          .orderBy(col("priority").asc, col(idCol).asc)
        val next = resolvePerId(standing.unionByName(batchPri), idCol)
          .withColumn("rk", row_number().over(perGroup).cast("long"))
          .filter(col("rk") <= n + ledger)
          .localCheckpoint(false) // pin: commit must not re-read the table it replaces
        ManifestTable.commit(spark, sampleDir, next, replace = true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming CDC novelty accounting with a self-maintaining chunk-hash
    * index — the continuous-ingest rendering of batch x71
    * (`TextDedup.cdcIncremental`), on the gear fast path
    * (`cdcChunksFast`). Each micro-batch is chunked (only the batch —
    * the standing corpus is never re-chunked), every chunk probes the
    * index built by all PRIOR batches (one hash equi-join), per-doc
    * novelty stats (`n_chunks, n_corpus_hits, novel_chars`) land in
    * `statsDir`, and the batch's previously-unseen distinct chunk
    * hashes are appended to the index — which therefore grows with
    * DISTINCT content, not with arrivals (the x51 index property, at
    * chunk granularity). Content-defined boundaries make the probe
    * byte-offset-robust: an arriving doc embedding shifted corpus
    * content still hits on every preserved chunk.
    *
    * Exactly-once under foreachBatch's at-least-once replay, by the
    * `dedupedCorpusStream` idiom: probes are restricted to
    * `ingest_seq < batchId` (a replay must not see the crashed
    * attempt's own appends), both appends are stamped and skipped
    * independently once their directory holds this batchId, and the
    * recomputation is deterministic — a half-committed batch heals to
    * identical bytes.
    */
  def cdcNoveltyStream(docs: DataFrame, indexDir: String, statsDir: String,
      checkpointDir: String, maskBits: Int = 6, minChunk: Int = 16): StreamingQuery = {
    import graft.ext.TextDedup
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // see pathExists/landedSeq for the silent-fallback posture: only
        // "index/stats table not created yet" reads as empty — a
        // swallowed read failure here would overstate novel_chars,
        // re-append already-indexed hashes, and the equally-swallowed
        // landed() guard would pin the wrong stats forever (round-7
        // advisory)
        def landed(dir: String): Boolean = landedSeq(spark, dir, batchId)
        val b = batch.toDF().localCheckpoint(false)
        val chunks = TextDedup.cdcChunksFast(b, maskBits, minChunk)
          .localCheckpoint(false)
        val index =
          if (pathExists(spark, indexDir))
            spark.read.parquet(indexDir)
              .filter(col("ingest_seq") < batchId).select(col("h"))
          else chunks.select(col("h")).limit(0)
        val probed = chunks.join(
            index.distinct().withColumn("__hit", lit(1)), Seq("h"), "left")
          .localCheckpoint(false)
        val stats = probed.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_corpus_hits"),
            sum(when(col("__hit").isNull, col("clen")).otherwise(0L)).as("novel_chars"))
        if (!landed(statsDir)) {
          graft.pipeline.Ingest.appendWithSeq(stats, statsDir, batchId)
        }
        if (!landed(indexDir)) {
          graft.pipeline.Ingest.appendWithSeq(
            probed.filter(col("__hit").isNull).select(col("h")).distinct(),
            indexDir, batchId)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Maintenance for the standing CDC chunk-hash index behind
    * [[cdcNoveltyStream]] / batch x71 (round-8, verdict item 6): the
    * index grows with DISTINCT content — `h` values are globally unique
    * by construction (each append is filtered against all prior
    * batches) — so its scale problem is not row duplication but FILE
    * fragmentation: every micro-batch appends its own file group, and
    * after N batches each probe's index scan opens N footer sets (the
    * read amplification SCALING.md's cdc_index rows measure). Compaction
    * is therefore a pure rewrite: `Ingest.compact` keyed on `h` keeps
    * every (h, ingest_seq) row bit-identical — unique keys make
    * last-write-wins the identity — and collapses the layout to one
    * file group, so the exactly-once machinery (`ingest_seq < batchId`
    * probes, `landed()` replay guards) is untouched.
    *
    * Run it QUIESCENT — between `Trigger.AvailableNow()` runs or from
    * the maintenance slot of a scheduler, never concurrent with a
    * running stream (same external-lock caveat as `Ingest.compact`).
    */
  def compactCdcIndex(spark: SparkSession, indexDir: String): Unit =
    graft.pipeline.Ingest.compact(spark, indexDir, Seq("h"))

  /** Maintenance for the standing embedding-LSH vector index behind
    * [[embeddingDedupStream]] (round 9, r8-verdict item 4 — the chunk
    * index got its policy in round 8; the vector index appends
    * `(vec_id, bucket, embedding)` per batch and needed the same
    * treatment). Index rows are unique by `vec_id` by construction
    * (only verdict survivors append, each exactly once under the seq
    * stamps), so — exactly the [[compactCdcIndex]] argument — its scale
    * problem is FILE fragmentation, not row duplication, and a keyed
    * rewrite via `Ingest.compact(…, Seq("vec_id"))` is the identity on
    * content: every (vec_id, bucket, embedding, ingest_seq) row
    * survives bit-identical, the `ingest_seq < batchId` probe
    * restriction and `landed()` replay guards are untouched, and
    * EmbDedupStreamSpec proves verdicts are IDENTICAL before/after a
    * mid-stream compaction. Same quiescence caveat: run between
    * `Trigger.AvailableNow()` runs, never concurrent with the stream.
    */
  def compactEmbeddingIndex(spark: SparkSession, indexDir: String): Unit =
    graft.pipeline.Ingest.compact(spark, indexDir, Seq("vec_id"))

  /** The policy knob, mirroring [[maybeCompactCdcIndex]]: rewrite when
    * the data-file count exceeds `maxFiles`, so between compactions a
    * probe opens ≤ maxFiles file groups and each compaction is one
    * linear rewrite of the distinct-content-sized index.
    */
  def maybeCompactEmbeddingIndex(spark: SparkSession, indexDir: String,
      maxFiles: Int = 64): Boolean = {
    val fragmented = cdcIndexFileCount(spark, indexDir) > maxFiles
    if (fragmented) compactEmbeddingIndex(spark, indexDir)
    fragmented
  }

  /** Data-file count of a standing-index table — the fragmentation
    * observable both compaction policies trigger on.
    */
  def cdcIndexFileCount(spark: SparkSession, indexDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
  }

  /** The compaction POLICY: rewrite when the file count exceeds
    * `maxFiles`. Bounded read amplification — between compactions a
    * probe opens ≤ maxFiles file groups; each compaction is one linear
    * rewrite of the (distinct-content-sized) index — the classic LSM
    * trade dialed by one knob. Returns whether it compacted.
    */
  def maybeCompactCdcIndex(spark: SparkSession, indexDir: String,
      maxFiles: Int = 64): Boolean = {
    val fragmented = cdcIndexFileCount(spark, indexDir) > maxFiles
    if (fragmented) compactCdcIndex(spark, indexDir)
    fragmented
  }

  /** Streaming twin of batch x90's re-aggregatable sketch rollup
    * (round 9): each micro-batch appends its per-(event_type, day)
    * DataSketches-HLL partials — MERGEABLE state, the property that
    * makes this shape work: partials from different batches for the
    * same key need no reconciliation, because `hll_union_agg` at read
    * time absorbs them all. So the write path is a blind stamped
    * append (no standing-index probe, no dedup), the sink grows with
    * (batches × touched keys), and [[distinctUsersFromPartials]]
    * answers the global distinct question from sketch bytes alone —
    * never re-scanning raw events. Exactly-once under foreachBatch
    * replay by the usual landedSeq guard; the sketch bytes themselves
    * are deterministic for a given batch (DataSketches HLL update
    * order over a deterministic recomputation).
    */
  def sketchRollupStream(events: DataFrame, partialsDir: String,
      checkpointDir: String, lgK: Int = 12): StreamingQuery = {
    val q = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        if (!landedSeq(spark, partialsDir, batchId)) {
          val partials = batch.toDF()
            .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
            .groupBy(col("event_type"), col("day"))
            .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"),
              count(lit(1)).as("n_rows"))
          graft.pipeline.Ingest.appendWithSeq(partials, partialsDir, batchId)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Read-side merge of the partial-sketch table: per event_type, union
    * every landed partial (across days AND batches) into one estimate.
    * Cost is O(landed partial rows × sketch bytes) — independent of the
    * raw event count, which is the entire point of storing mergeable
    * state.
    */
  def distinctUsersFromPartials(spark: SparkSession, partialsDir: String): DataFrame =
    spark.read.parquet(partialsDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_partials"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx_users"),
        sum(col("n_rows")).as("n_rows"))

  /** Streaming KLL quantile-partial rollup — [[sketchRollupStream]]'s
    * blind-stamped-append pattern for percentiles (batch twin: x99):
    * per-(event_type, day) KLL partials land per micro-batch, no
    * standing-index probe, because mergeable state needs no
    * reconciliation; [[quantilesFromPartials]] is the read side.
    * Consumers must use the rank-window error contract (KLL compaction
    * is randomized — see [[graft.functions.KllSketchAgg]]).
    */
  def quantileRollupStream(events: DataFrame, partialsDir: String,
      checkpointDir: String, k: Int = 200): StreamingQuery = {
    val q = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        if (!landedSeq(spark, partialsDir, batchId)) {
          val partials = batch.toDF()
            .filter(col("value").isNotNull)
            .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
            .groupBy(col("event_type"), col("day"))
            .agg(graft.functions.kll_sketch_agg(col("value"), k).as("sk"),
              count(lit(1)).as("n_rows"))
          graft.pipeline.Ingest.appendWithSeq(partials, partialsDir, batchId)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Read-side merge of the KLL partial table: per event_type, one
    * quantile probe over the union of every landed partial. Cost is
    * O(landed partials × sketch bytes) — independent of raw row count.
    */
  def quantilesFromPartials(spark: SparkSession, partialsDir: String,
      rank: Double, k: Int = 200): DataFrame =
    spark.read.parquet(partialsDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_partials"),
        sum(col("n_rows")).as("n_rows"),
        graft.functions.kll_quantile(
          graft.functions.kll_merge_agg(col("sk"), k), lit(rank)).as("approx"))

  /** Streaming component maintenance — the cluster-collapse member of
    * the streaming dedup family (batch twin: x100): each micro-batch of
    * near-dup EDGES folds into the standing `(node, component)` table
    * via [[graft.operators.ConnectedComponents.incrementalAssign]]
    * (contract → O(batch) mini-CC → broadcast remap), and the result
    * replaces the [[graft.pipeline.ManifestTable]] version atomically.
    * The fold is batch-split-invariant and idempotent
    * (CcIncrementalSpec), so replaying a landed batch recomputes the
    * identical table — the weightedSampleStream exactly-once story: no
    * seq-stamp machinery, a crash mid-publish leaves the previous
    * version current.
    */
  def componentStream(edges: DataFrame, componentsDir: String,
      checkpointDir: String, srcCol: String = "doc_a",
      dstCol: String = "doc_b"): StreamingQuery = {
    import graft.pipeline.ManifestTable
    val q = edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF()
        val standing = ManifestTable.currentVersion(spark, componentsDir) match {
          case Some(_) => ManifestTable.read(spark, componentsDir)
          case None => b.select(col(srcCol).cast("long").as("node"),
            col(srcCol).cast("long").as("component")).limit(0)
        }
        val next = graft.operators.ConnectedComponents
          .incrementalAssign(standing, b, srcCol, dstCol)
          .localCheckpoint(false) // commit must not re-read the table it replaces
        ManifestTable.commit(spark, componentsDir, next, replace = true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** [[componentStream]] with DELETION support — the streaming
    * composition of [[graft.operators.ConnectedComponents.incrementalAssign]]
    * (grow) and [[graft.operators.ConnectedComponents.removeAssign]]
    * (forget, the x109 right-to-be-forgotten pass). The event stream is
    * mixed: `kind = 'edge'` rows carry (src, dst); `kind = 'forget'`
    * rows carry the node to delete in the src column.
    *
    * Removal needs the EDGE HISTORY (a deleted bridge may split its
    * component, and only the surviving subgraph's edges can re-label
    * it), so the stream keeps two standing sinks next to the components
    * manifest: a stamped append-only edge log (`edgesDir`) and a
    * tombstone log (`tombstonesDir`). Contracts, chosen for exactness:
    *
    *   - WITHIN one micro-batch, edge additions fold BEFORE forgets —
    *     a doc added and forgotten in the same batch ends up forgotten;
    *   - tombstones are PERMANENT: a later edge touching a forgotten
    *     node is rejected at fold time (doc ids must not be reused —
    *     the deletion-request semantics; re-admission would need a new
    *     id). This keeps every read path a plain filter, never a
    *     point-in-time range join against tombstone sequence numbers;
    *   - both logs are landedSeq-guarded stamped appends and the fold
    *     itself is idempotent (re-folding edges is a no-op, re-removing
    *     absent nodes is a no-op), so foreachBatch replay is
    *     exactly-once end-to-end. One replay timing nuance: a crash
    *     between the tombstone append and the components commit replays
    *     with the batch's own forgets already tombstoned, so a node
    *     whose only edges touched same-batch forgets lands ABSENT
    *     rather than as a singleton row — the same thing under the
    *     read convention (absent nodes are singletons at read time,
    *     the incrementalAssign coalesce contract), and survivor
    *     connectivity is identical because edges through a forgotten
    *     node can never connect survivors;
    *   - stale edges incident to forgotten nodes linger in the log
    *     until compaction but are HARMLESS to correctness:
    *     removeAssign's surviving-node filters drop them (a forgotten
    *     endpoint is in no standing component). When the log exceeds
    *     `maxEdgeFiles` data files it is compacted — one linear rewrite
    *     anti-joining the tombstones, the LSM trade every standing
    *     index here makes (ComponentStreamSpec asserts compaction is
    *     invisible to the verdicts);
    *   - the tombstone log is O(total forgets ever) and is BROADCAST
    *     into the per-batch edge gate only WHILE IT IS SMALL: a size
    *     gate ([[tombsForJoin]] — on-disk bytes, one filesystem
    *     metadata call, no job) drops the hint automatically once the
    *     log outgrows `maxTombBroadcastBytes`, so the 100 TB posture
    *     does not depend on a human editing hints (round-11 verdict
    *     item 8). Past the bound the joins degrade to shuffles of the
    *     BATCH (never of history), which is the honest cost at that
    *     scale; verdicts are identical on both paths
    *     (ComponentStreamSpec forces the shuffle path).
    *
    * Per-batch cost: O(batch) fold + O(affected components) removal —
    * never a re-label of history, never a scan bounded by the corpus.
    */
  def componentStreamWithForgets(events: DataFrame, componentsDir: String,
      edgesDir: String, tombstonesDir: String, checkpointDir: String,
      kindCol: String = "kind", srcCol: String = "doc_a",
      dstCol: String = "doc_b", maxEdgeFiles: Int = 64,
      maxTombBroadcastBytes: Long = 8L << 20): StreamingQuery = {
    import graft.pipeline.ManifestTable
    val q = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF().localCheckpoint(false) // two consumers, one pass
        val priorTombs = tombsForJoin(spark, tombstonesDir, maxTombBroadcastBytes)
          .getOrElse(b.select(col(srcCol).cast("long").as("node")).limit(0))
        // permanent-tombstone contract: edges touching a forgotten node
        // are rejected at the gate, so the standing assignment can never
        // resurrect one
        val eb = b.filter(col(kindCol) === "edge")
          .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
          .join(priorTombs.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
          .join(priorTombs.withColumnRenamed("node", "b"), Seq("b"), "left_anti")
          .localCheckpoint(false) // feeds the log append AND the fold
        val fb = b.filter(col(kindCol) === "forget")
          .select(col(srcCol).cast("long").as("node"))
        val standing = ManifestTable.currentVersion(spark, componentsDir) match {
          case Some(_) => ManifestTable.read(spark, componentsDir)
          case None => eb.select(col("a").as("node"), col("a").as("component")).limit(0)
        }
        if (!landedSeq(spark, edgesDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(eb, edgesDir, batchId)
        val afterAdd = graft.operators.ConnectedComponents
          .incrementalAssign(standing, eb, "a", "b")
          .localCheckpoint(false)
        val edgeLog = spark.read.parquet(edgesDir).select(col("a"), col("b"))
        val next = graft.operators.ConnectedComponents
          .removeAssign(afterAdd, edgeLog, fb, "a", "b")
          .localCheckpoint(false) // commit must not re-read the table it replaces
        if (!landedSeq(spark, tombstonesDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(fb, tombstonesDir, batchId)
        ManifestTable.commit(spark, componentsDir, next, replace = true)
        maybeCompactEdgeLog(spark, edgesDir, tombstonesDir, maxEdgeFiles,
          maxTombBroadcastBytes)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** The tombstone log prepared for the anti-join gate, with the
    * broadcast decision made PER BATCH from the log's on-disk size (one
    * `getContentSummary` metadata call — no Spark job): broadcast while
    * parquet bytes ≤ `maxBytes` (compressed bytes under-estimate
    * in-memory size, so the 8 MB default sits well inside Spark's
    * 10 MB auto-broadcast posture), plain join — a shuffle of the
    * batch, never of history — once the cumulative forgets outgrow it.
    * None ⇔ the log does not exist yet.
    */
  private def tombsForJoin(spark: SparkSession, tombstonesDir: String,
      maxBytes: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tombstonesDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val tombs = spark.read.parquet(tombstonesDir).select(col("node"))
      val bytes = fs.getContentSummary(p).getLength
      Some(if (bytes <= maxBytes) broadcast(tombs) else tombs)
    }
  }

  /** Compaction for [[componentStreamWithForgets]]'s edge log: when the
    * append-only log exceeds `maxEdgeFiles` data files, rewrite it once,
    * dropping edges incident to tombstoned nodes (keyed rewrite =
    * identity on the surviving content — the chunk-index/embedding-index
    * policy applied to the edge history). Returns whether it compacted.
    */
  def maybeCompactEdgeLog(spark: SparkSession, edgesDir: String,
      tombstonesDir: String, maxEdgeFiles: Int = 64,
      maxTombBroadcastBytes: Long = 8L << 20): Boolean = {
    val fragmented = pathExists(spark, edgesDir) &&
      cdcIndexFileCount(spark, edgesDir) > maxEdgeFiles
    if (fragmented) {
      val tombs = tombsForJoin(spark, tombstonesDir, maxTombBroadcastBytes)
        .getOrElse(spark.range(0).select(col("id").as("node")))
      swapRewrite(spark, edgesDir,
        spark.read.parquet(edgesDir)
          .join(tombs.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
          .join(tombs.withColumnRenamed("node", "b"), Seq("b"), "left_anti"))
    }
    fragmented
  }

  /** The Ingest.compact scratch-dir dance, shared by every standing-log
    * compaction here (Spark cannot overwrite a path it is reading):
    * write the survivors to a dot-sibling, then rename(live->bak),
    * rename(tmp->live), delete(bak) — a crash mid-swap either leaves the
    * old log current or restores it.
    */
  private def swapRewrite(spark: SparkSession, dir: String, survivors: DataFrame): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(live.getParent, "." + live.getName + ".compact-tmp")
    val bak = new org.apache.hadoop.fs.Path(live.getParent, "." + live.getName + ".compact-bak")
    survivors.write.mode("overwrite").parquet(tmp.toString)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(bak, true)
    if (!fs.rename(live, bak)) sys.error(s"swapRewrite: cannot stage $live -> $bak")
    if (!fs.rename(tmp, live)) {
      fs.rename(bak, live)
      sys.error(s"swapRewrite: cannot publish $tmp -> $live (old log restored)")
    }
    // landed markers ride inside the log dir (round-16): copy them into
    // the rewritten log before dropping the staged copy, else the replay
    // guard degrades to the row probe over a COMPACTED log — which may
    // have folded away every row of a landed seq and would re-append it.
    // A crash between the publish rename and this copy degrades to the
    // row probe, never to a wrong answer for live reads.
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(bak, "_graft_landed_*")))
      .getOrElse(Array.empty)
      .foreach { s =>
        fs.create(new org.apache.hadoop.fs.Path(live, s.getPath.getName), true).close()
      }
    fs.delete(bak, true)
  }

  /** Streaming incremental classifier fit (the x104 twin): each arriving
    * doc micro-batch contributes ONE normal-equation sufficient-statistics
    * row ([[graft.ext.LinearModel.fitStats]]) and the standing single-row
    * stats table folds cell-wise per batch — O(1) state, O(batch) work
    * per arrival, raw history never re-scanned. Because the fold is exact
    * integer sums/maxes, a model refit from the standing row after any
    * prefix of arrivals equals the all-at-once fit on the docs seen so
    * far — mergeable state needs no reconciliation (the x90/x99 rollup
    * posture extended to model fitting). `features`/`label` are column
    * expressions over the streamed doc rows.
    */
  def classifierStatsStream(docs: DataFrame, statsDir: String,
      checkpointDir: String,
      features: Seq[org.apache.spark.sql.Column],
      label: org.apache.spark.sql.Column,
      idCol: String = "doc_id"): StreamingQuery = {
    import graft.ext.LinearModel
    val d = features.size + 1
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // blind stamped append (the x90/x99 pattern): sums are NOT
        // idempotent under re-delivery, so the landed-seq guard is the
        // exactly-once boundary, like every mergeable-partial sink here
        if (!landedSeq(spark, statsDir, batchId)) {
          val partial = LinearModel.fitStats(
            LinearModel.featFrame(batch.toDF(), features, label, idCol), d)
          graft.pipeline.Ingest.appendWithSeq(partial, statsDir, batchId)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Read side of [[classifierStatsStream]]: fold every landed partial
    * into the single sufficient-statistics row the refit solves from —
    * O(landed partials), independent of the raw doc count.
    */
  def classifierStatsFromPartials(spark: SparkSession, statsDir: String,
      d: Int): DataFrame =
    graft.ext.LinearModel.foldStats(spark.read.parquet(statsDir), d)

  /** [[classifierStatsStream]] with RETRACTION (round-13, x134): the
    * classifier stays EXACTLY consistent with the live corpus as docs
    * update and delete, because normal-equation sufficient statistics
    * are SUBTRACTABLE — integer sums forget a superseded version by
    * folding in its negation ([[graft.ext.LinearModel.negateStats]]) —
    * the precise contrast to x133's monotone sketch registers, which
    * cannot forget and need the rebuild remedy. Fused with
    * [[docStoreStream]]'s versioned maintenance (the x125 posture):
    * per batch, each arriving id's PREVIOUS live version is read from
    * the standing store (both logs capped at `ingest_seq < batchId` —
    * a replay must not see its own appends), its stats contribution
    * leaves as negated rows while the new version's enters as added
    * rows (a null-`textCol` arrival adds nothing = deletion), then the
    * arrivals enter the doc store as their ids' newest versions.
    * O(batch) work per arrival — the corpus is never re-aggregated;
    * the refit is [[classifierFromStatsLog]].
    *
    * Exactly-once boundary (documented, spec-pinned): the stats log's
    * landed-seq guard covers the streaming replay window — the last
    * uncommitted batch, whose own seq always survives
    * [[maybeCompactStats]] (the folded row is stamped with the max
    * seq: the version-log argument). A FULL-log replay (a fresh
    * checkpoint over existing logs) is a no-op only until the first
    * stats compaction — folded-away seqs answer "not landed" and
    * re-append, and unlike the versioned logs there is no read-side
    * resolution to ignore them (sums are not idempotent). Compact on
    * the production cadence (`maxFiles`), never right before a
    * deliberate full replay; ClassifierRetractStreamSpec pins the
    * boundary from both sides.
    */
  def classifierRetractStream(docs: DataFrame, docsDir: String,
      versionsDir: String, statsDir: String, checkpointDir: String,
      features: Seq[org.apache.spark.sql.Column],
      label: org.apache.spark.sql.Column,
      idCol: String = "doc_id", textCol: String = "text",
      maxFiles: Int = 64): StreamingQuery = {
    import graft.ext.LinearModel
    val d = features.size + 1
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = resolveBatchVersions(batch.toDF(), idCol)
        if (!landedSeq(spark, statsDir, batchId)) {
          val add = LinearModel.fitStats(LinearModel.featFrame(
            b.filter(col(textCol).isNotNull), features, label, idCol), d)
          val delta = liveRowsBefore(spark, docsDir, versionsDir, idCol, batchId)
            .map(_.join(b.select(col(idCol)), Seq(idCol), "left_semi"))
            .map(prev => add.unionByName(LinearModel.negateStats(
              LinearModel.fitStats(
                LinearModel.featFrame(prev, features, label, idCol), d), d)))
            .getOrElse(add)
          graft.pipeline.Ingest.appendWithSeq(delta, statsDir, batchId)
        }
        if (!landedSeq(spark, versionsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(b.select(col(idCol)), versionsDir, batchId)
        if (!landedSeq(spark, docsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            b.filter(col(textCol).isNotNull), docsDir, batchId)
        maybeCompactVersioned(spark, docsDir, versionsDir, maxFiles, idCol)
        maybeCompactStats(spark, statsDir, maxFiles)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** INCREMENTAL VIEW MAINTENANCE for additive rollups (round-13, x139)
    * — the [[classifierRetractStream]] subtraction idiom generalized
    * from model statistics to ANY additive GROUP BY view: maintain an
    * exact rollup table (group -> SUM measures + row count) over a
    * churning corpus at O(batch) per arrival, never re-aggregating
    * history. Per batch, arriving versions contribute +measures and
    * each arriving id's previous live version contributes -measures
    * (read back from the fused doc store, both logs capped at
    * `ingest_seq < batchId`); the standing view is one group-keyed sum
    * over the delta log ([[resolvedRollup]]) — bit-equal to the batch
    * rollup over the live corpus because integer addition has an
    * inverse (the forgettability taxonomy's subtractable class; README
    * Scale posture). A null-`textCol` arrival contributes
    * subtract-only = deletion; a group whose last doc leaves sums to
    * row count 0 and disappears from the read. Measures must be
    * ADDITIVE (sums of per-row expressions) — that is the class with
    * an inverse; min/max/distinct belong to the monotone class and
    * need the versioned-log rebuild instead.
    *
    * Exactly-once boundary: identical to the stats log
    * ([[classifierRetractStream]]'s note) — the landed-seq guard covers
    * the streaming replay window, and [[maybeCompactRollup]] stamps the
    * folded rows with the max seq.
    */
  def ivmRollupStream(docs: DataFrame, docsDir: String, versionsDir: String,
      rollupDir: String, checkpointDir: String, groupCols: Seq[String],
      measures: Seq[(String, org.apache.spark.sql.Column)],
      idCol: String = "doc_id", textCol: String = "text",
      maxFiles: Int = 64): StreamingQuery = {
    def delta(f: DataFrame, sign: Int): DataFrame = {
      val m = sum(lit(sign.toLong)).as("n_rows") +:
        measures.map { case (n, e) => sum(e * lit(sign.toLong)).as(n) }
      f.groupBy(groupCols.map(col): _*).agg(m.head, m.tail: _*)
    }
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = resolveBatchVersions(batch.toDF(), idCol)
        if (!landedSeq(spark, rollupDir, batchId)) {
          val add = delta(b.filter(col(textCol).isNotNull), 1)
          val deltas = liveRowsBefore(spark, docsDir, versionsDir, idCol, batchId)
            .map(_.join(b.select(col(idCol)), Seq(idCol), "left_semi"))
            .map(prev => add.unionByName(delta(prev, -1)))
            .getOrElse(add)
          graft.pipeline.Ingest.appendWithSeq(deltas, rollupDir, batchId)
        }
        if (!landedSeq(spark, versionsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(b.select(col(idCol)), versionsDir, batchId)
        if (!landedSeq(spark, docsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            b.filter(col(textCol).isNotNull), docsDir, batchId)
        maybeCompactVersioned(spark, docsDir, versionsDir, maxFiles, idCol)
        maybeCompactRollup(spark, rollupDir, groupCols, maxFiles)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** MONOTONE-class view maintenance — the rebuild-remedy half of the
    * forgettability taxonomy's cost CONTRAST (round-14, x142; x139 is
    * the subtractable half). A min/max view cannot forget by
    * subtraction: deleting the group's extremal row leaves no way to
    * derive the new extremum from the old value and the delta (min/max
    * have no inverse), so the maintenance policy is two-tier —
    * INSERT-ONLY batches fold monotonically (min'=min(min,Δ),
    * max'=max(max,Δ), count'=count+Δ: one O(batch) aggregate merged
    * into the group-sized standing view), while any batch carrying an
    * UPDATE or DELETION (an arriving id with a prior version, or a
    * null-`textCol` arrival) triggers a REBUILD: one full group-by
    * over the live corpus ([[resolvedDocs]] off the fused doc-store
    * logs this stream maintains anyway). Each rebuild appends a
    * stamped marker row, so the policy's cost history is DATA
    * ([[monotoneRebuildCount]]) — x142 pins it against the wave
    * script, and the contrast with [[ivmRollupStream]]'s zero-rebuild
    * delta maintenance is the taxonomy's cost table made measurable:
    * the rebuild term is the corpus-linear one (SCALING.md row).
    * Exactly-once: the view is wholly rewritten per batch with every
    * row stamped `ingest_seq = batchId` — the landed-seq guard makes a
    * replayed fold a no-op (a re-fold into an already-folded view
    * would double-count), and the rebuild marker append is guarded the
    * same way. The view read is `viewDir` minus the stamp.
    */
  def monotoneRollupStream(docs: DataFrame, docsDir: String,
      versionsDir: String, viewDir: String, rebuildsDir: String,
      checkpointDir: String, groupCols: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      maxFiles: Int = 64): StreamingQuery = {
    val charLen = length(col(textCol)).cast("long")
    def rollup(rows: DataFrame): DataFrame =
      rows.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n_rows"), min(charLen).as("min_chars"),
          max(charLen).as("max_chars"))
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = resolveBatchVersions(batch.toDF(), idCol)
          .localCheckpoint(false) // read for the policy test, both appends, and the fold
        // retraction sensor: a prior-version arrival or an explicit
        // deletion means this batch can LOWER a group's extremum
        val hasRetraction =
          b.filter(col(textCol).isNull).limit(1).count() > 0 ||
          (pathExists(spark, versionsDir) &&
            spark.read.parquet(versionsDir).filter(col("ingest_seq") < batchId)
              .join(b.select(col(idCol)), Seq(idCol), "left_semi")
              .limit(1).count() > 0)
        if (!landedSeq(spark, versionsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(b.select(col(idCol)), versionsDir, batchId)
        if (!landedSeq(spark, docsDir, batchId))
          graft.pipeline.Ingest.appendWithSeq(
            b.filter(col(textCol).isNotNull), docsDir, batchId)
        // the view is wholly rewritten each batch, so only the LAST
        // stamp survives — the landed guard is therefore max-stamp >=
        // batchId, which is exact because AvailableNow batches are
        // ordered (and it makes a full fresh-checkpoint replay a no-op,
        // where an exact-seq probe would re-fold early batches into the
        // final view and double-count). Marker fast path (round-16
        // optimization round): the view write advances a landed marker
        // below, so the happy path is one glob instead of a per-batch
        // max-seq job; a crash between the write and the marker, or a
        // pre-marker view, falls back to exactly the old row read.
        val viewLoc = new org.apache.hadoop.fs.Path(viewDir)
        val viewFs = viewLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val viewLanded = pathExists(spark, viewDir) && {
          graft.pipeline.Bucketing.landedMarkerSeqAt(viewFs, viewLoc) match {
            case Some(m) => m >= batchId
            case None => spark.read.parquet(viewDir).agg(max(col("ingest_seq")))
              .head().getLong(0) >= batchId
          }
        }
        if (!viewLanded) {
          val view =
            if (hasRetraction) {
              if (!landedSeq(spark, rebuildsDir, batchId)) {
                import spark.implicits._
                graft.pipeline.Ingest.appendWithSeq(
                  Seq(1L).toDF("rebuild"), rebuildsDir, batchId)
              }
              rollup(resolvedDocs(spark, docsDir, versionsDir, idCol))
            } else {
              val delta = rollup(b.filter(col(textCol).isNotNull))
              if (!pathExists(spark, viewDir)) delta
              else spark.read.parquet(viewDir).drop("ingest_seq")
                .filter(col("n_rows") > 0) // never fold the stamp sentinel
                .unionByName(delta)
                .groupBy(groupCols.map(col): _*)
                .agg(sum(col("n_rows")).as("n_rows"),
                  min(col("min_chars")).as("min_chars"),
                  max(col("max_chars")).as("max_chars"))
            }
          val folded = view.withColumn("ingest_seq", lit(batchId))
            .localCheckpoint(false) // the rewrite reads viewDir itself
          // an empty view must still carry the batch stamp (the
          // maybeCompactRollup boundary): keep one all-zero sentinel
          // row the n_rows>0 read never surfaces
          val stamped =
            if (folded.isEmpty)
              spark.range(1).select(folded.schema.fields.toIndexedSeq.map { f =>
                if (f.name == "ingest_seq") lit(batchId).cast(f.dataType).as(f.name)
                else if (f.name == "n_rows") lit(0L).cast(f.dataType).as(f.name)
                else lit(null).cast(f.dataType).as(f.name)
              }: _*)
            else folded
          if (pathExists(spark, viewDir)) swapRewrite(spark, viewDir, stamped)
          else stamped.write.mode("overwrite").parquet(viewDir)
          // marker strictly after the write (the guard's fast path; the
          // row-stamp fallback stays authoritative for a crash window)
          graft.pipeline.Bucketing.advanceLandedMarkerAt(viewFs, viewLoc, batchId)
        }
        maybeCompactVersioned(spark, docsDir, versionsDir, maxFiles, idCol)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Read side of [[monotoneRollupStream]]'s standing view (the
    * n_rows > 0 filter hides the empty-view stamp sentinel).
    */
  def resolvedMonotoneRollup(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(viewDir).drop("ingest_seq").filter(col("n_rows") > 0)

  /** How many times [[monotoneRollupStream]]'s policy paid the
    * corpus-linear rebuild — the taxonomy's cost contrast as data.
    */
  def monotoneRebuildCount(spark: SparkSession, rebuildsDir: String): Long =
    if (pathExists(spark, rebuildsDir)) spark.read.parquet(rebuildsDir).count()
    else 0L

  /** Read side of [[ivmRollupStream]]: one group-keyed sum over the
    * delta log; groups whose docs have all left (row count 0) are
    * absent, exactly as in the batch rollup over the live corpus.
    */
  def resolvedRollup(spark: SparkSession, rollupDir: String,
      groupCols: Seq[String]): DataFrame = {
    val log = spark.read.parquet(rollupDir).drop("ingest_seq")
    val mcols = log.columns.filterNot(groupCols.contains)
    log.groupBy(groupCols.map(col): _*)
      .agg(sum(col(mcols.head)).as(mcols.head),
        mcols.tail.toIndexedSeq.map(c => sum(col(c)).as(c)): _*)
      .filter(col("n_rows") > 0)
  }

  /** Compaction for a rollup delta log: fold to one row per group
    * stamped with the log's max seq (the stats-log argument), dropping
    * fully-retracted groups (row count 0 — pure garbage, and a read
    * filters them anyway). Boundary: when EVERY group has been fully
    * retracted the rewrite must not leave an empty log — that would
    * destroy the max-seq stamp [[landedSeq]] reads to guard the
    * streaming replay window, so a crash-replay of the last batch
    * would re-append its delta (a re-added doc then nets to n_rows 0
    * and is silently hidden). Keep one all-null-group, all-zero
    * sentinel row stamped with maxSeq instead, mirroring
    * [[maybeCompactStats]] which always retains one folded row; the
    * read's `n_rows > 0` filter never surfaces it, and a later
    * compaction with live groups folds it away again.
    */
  def maybeCompactRollup(spark: SparkSession, rollupDir: String,
      groupCols: Seq[String], maxFiles: Int = 64): Boolean = {
    val fragmented = pathExists(spark, rollupDir) &&
      cdcIndexFileCount(spark, rollupDir) > maxFiles
    if (fragmented) {
      val log = spark.read.parquet(rollupDir).localCheckpoint(false)
      val maxSeq = log.agg(max(col("ingest_seq"))).head().getLong(0)
      val mcols = log.columns.filterNot(c => groupCols.contains(c) || c == "ingest_seq")
      val folded = log.groupBy(groupCols.map(col): _*)
        .agg(sum(col(mcols.head)).as(mcols.head),
          mcols.tail.toIndexedSeq.map(c => sum(col(c)).as(c)): _*)
        .filter(col("n_rows") =!= 0)
        .withColumn("ingest_seq", lit(maxSeq))
        .localCheckpoint(false)
      val survivors =
        if (folded.isEmpty)
          log.limit(1).select(log.schema.fields.toIndexedSeq.map { f =>
            if (f.name == "ingest_seq") lit(maxSeq).cast(f.dataType).as(f.name)
            else if (groupCols.contains(f.name)) lit(null).cast(f.dataType).as(f.name)
            else lit(0).cast(f.dataType).as(f.name)
          }: _*)
        else folded
      swapRewrite(spark, rollupDir, survivors)
    }
    fragmented
  }

  /** Compaction for a mergeable-stats log: fold every landed row into
    * one (the read does this anyway), stamped with the log's MAX seq so
    * the streaming replay window's landed-seq guard still answers
    * "landed" — only the last batch can replay, and its seq is the max
    * (the version-log argument). `d` is recovered from the schema.
    */
  def maybeCompactStats(spark: SparkSession, statsDir: String,
      maxFiles: Int = 64): Boolean = {
    val fragmented = pathExists(spark, statsDir) &&
      cdcIndexFileCount(spark, statsDir) > maxFiles
    if (fragmented) {
      val log = spark.read.parquet(statsDir).localCheckpoint(false)
      val d = log.columns.count(_.startsWith("b"))
      val maxSeq = log.agg(max(col("ingest_seq"))).head().getLong(0)
      swapRewrite(spark, statsDir,
        graft.ext.LinearModel.foldStats(log.drop("ingest_seq"), d)
          .withColumn("ingest_seq", lit(maxSeq)))
    }
    fragmented
  }

  /** AS-OF fold of a mergeable-stats log (round-13, x138): the model's
    * sufficient statistics EXACTLY as they stood when batch `asOfSeq`
    * committed — deltas are stamped once per batch, so the historical
    * state is the fold over stamps <= `asOfSeq`. Paired with
    * [[resolvedRowsAsOf]] on the doc store this reproduces a historical
    * training run end to end: the model as-of S scored over the corpus
    * as-of S, off the same logs. Same fidelity bound as every as-of
    * read: [[maybeCompactStats]] folds history away (the single
    * compacted row carries the max seq), so model time travel reaches
    * back only to the last compaction.
    */
  def classifierStatsAsOf(spark: SparkSession, statsDir: String,
      d: Int, asOfSeq: Long): DataFrame =
    graft.ext.LinearModel.foldStats(
      spark.read.parquet(statsDir).filter(col("ingest_seq") <= asOfSeq), d)

  /** Model refit + live-corpus scoring off [[classifierRetractStream]]'s
    * logs: fold the stats log, solve driver-side, score `liveDocs`
    * (usually [[resolvedDocs]]). Decisions equal the batch
    * [[graft.ext.LinearModel.weakLabelClassifier]] over the live corpus
    * because the folded sums are bit-equal to the one-shot aggregate —
    * the x104 invariance carried through churn.
    */
  def classifierFromStatsLog(spark: SparkSession, statsDir: String,
      liveDocs: DataFrame, features: Seq[org.apache.spark.sql.Column],
      label: org.apache.spark.sql.Column,
      idCol: String = "doc_id"): DataFrame = {
    val d = features.size + 1
    graft.ext.LinearModel.scoreWithStats(
      classifierStatsFromPartials(spark, statsDir, d),
      liveDocs, features, label, idCol)
  }

  /** Stream-static enrichment: each micro-batch joins the (small, slowly
    * changing) dimension read as a plain batch table — the streaming
    * rendering of the reference's token-metadata join. The static side
    * re-resolves per micro-batch, so a republished dim is picked up
    * without restarting the stream; broadcast keeps it off the shuffle
    * path.
    */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
        broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"), "left")
      .withColumn("segment", coalesce(col("c_mktsegment"), lit("No Segment")))
      .drop("c_custkey", "c_mktsegment")
}
