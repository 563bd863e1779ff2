package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Bucketing

/** Bucketed layout must make the recurring fact⋈fact join shuffle-free. */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("join of two tables bucketed on the key plans zero shuffle exchanges") {
    val facts = (1L to 5000L).map(i => (i, s"h$i")).toDF("block_number", "block_hash")
    val events = (1L to 20000L).map(i => (i, i % 5000 + 1, s"e$i"))
      .toDF("event_id", "block_number", "payload")

    Bucketing.writeBucketed(facts, "b_blocks", "block_number", 4, Some("block_number"))
    Bucketing.writeBucketed(events, "b_events", "block_number", 4, Some("block_number"))

    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val joined = spark.table("b_events")
        .join(spark.table("b_blocks"), Seq("block_number"))
      assert(Bucketing.countExchanges(joined) == 0,
        s"expected co-located join, plan:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 20000)

      // contrast: the same join over plain (unbucketed) frames shuffles
      val plain = events.join(facts, Seq("block_number"))
      assert(Bucketing.countExchanges(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_blocks")
      spark.sql("DROP TABLE IF EXISTS b_events")
    }
  }

  test("bucketed append table: keyed dedup and compaction plan zero shuffle exchanges") {
    import graft.pipeline.Ingest
    import graft.operators.Dedup

    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS b_append")
      spark.sql("DROP TABLE IF EXISTS b_append_compact_tmp")

      // three overlapping micro-batches: keys re-ingested with new values
      def batch(lo: Long, hi: Long, tag: String) =
        (lo to hi).map(i => (i, s"$tag$i")).toDF("block_number", "block_hash")
      Ingest.appendBucketedWithSeq(batch(1, 3000, "a"), "b_append", "block_number", 4, seq = 1)
      Ingest.appendBucketedWithSeq(batch(2000, 4000, "b"), "b_append", "block_number", 4, seq = 2)
      Ingest.appendBucketedWithSeq(batch(3500, 5000, "c"), "b_append", "block_number", 4, seq = 3)

      // dedup-on-read: bucket-local, no exchange
      val latest = Ingest.latestView(spark.table("b_append"), Seq("block_number"))
      assert(Bucketing.countExchanges(latest) == 0,
        s"bucketed dedup should be shuffle-free:\n${latest.queryExecution.executedPlan}")
      // contrast: identical rows through a plain parquet path shuffle
      val plainDir = "/tmp/graft-bucket-contrast"
      spark.table("b_append").write.mode("overwrite").parquet(plainDir)
      val plainLatest = Ingest.latestView(spark.read.parquet(plainDir), Seq("block_number"))
      assert(Bucketing.countExchanges(plainLatest) > 0)

      // last-write-wins semantics across batches
      val rows = latest.select("block_number", "block_hash").as[(Long, String)].collect().toMap
      assert(rows.size == 5000)
      assert(rows(1500L) == "a1500" && rows(2500L) == "b2500" && rows(3700L) == "c3700")

      // compaction rewrites in place, stays bucketed, and the NEXT dedup
      // over the compacted table is still shuffle-free
      Ingest.compactBucketed(spark, "b_append", Seq("block_number"), "block_number", 4)
      assert(spark.table("b_append").count() == 5000)
      val again = Ingest.latestView(spark.table("b_append"), Seq("block_number"))
      assert(Bucketing.countExchanges(again) == 0,
        s"post-compaction table lost its bucketing:\n${again.queryExecution.executedPlan}")
      assert(again.select("block_number", "block_hash").as[(Long, String)]
        .collect().toMap.apply(2500L) == "b2500")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS b_append")
      spark.sql("DROP TABLE IF EXISTS b_append_compact_tmp")
    }
  }

  // ---- bucketed versioned logs (round-14, r13 verdict item 5) ------------

  test("bucketed versioned logs: resolve is row-identical to the flat resolve, plans zero exchanges, and single-doc probes prune buckets") {
    import graft.streaming.StreamingIngest
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS bv_docs")
      spark.sql("DROP TABLE IF EXISTS bv_versions")
      val root = tempDir("graft-bucketed-vlog")
      val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
      // the doc-store lifecycle: insert, update, delete — via the
      // bucketed stream (same waves through the flat stream as truth)
      writeWaveTo(root + "/src", 0, mk(Seq(1L -> "one v0", 2L -> "two v0", 3L -> "three v0")))
      writeWaveTo(root + "/src", 1, mk(Seq(1L -> "one v1", 4L -> "four v1")))
      writeWaveTo(root + "/src", 2,
        mk(Seq(2L -> "x")).withColumn("text", lit(null).cast("string")))
      def stream() = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
      StreamingIngest.docStoreStreamBucketed(stream(), "bv_docs", "bv_versions",
        root + "/bckpt", buckets = 4)
      StreamingIngest.docStoreStream(stream(), root + "/docs", root + "/versions",
        root + "/fckpt")
      val bucketed = Bucketing.resolvedBucketed(spark, "bv_docs", "bv_versions", "doc_id")
      val flat = StreamingIngest.resolvedDocs(spark, root + "/docs", root + "/versions")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select(col("doc_id"), col("text")).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows(bucketed) == rows(flat), "bucketed resolve diverged from the flat resolve")
      assert(rows(bucketed) == Set(1L -> "one v1", 3L -> "three v0", 4L -> "four v1"))
      // THE point: the resolve's max-seq aggregate + doc-keyed join ride
      // the bucket partitioning — zero shuffle exchanges
      assert(Bucketing.countExchanges(bucketed) == 0,
        s"bucketed resolve must be shuffle-free:\n${bucketed.queryExecution.executedPlan}")
      // the flat twin pays the shuffles the layout removes
      assert(Bucketing.countExchanges(flat) > 0,
        "the flat resolve should shuffle — if it stopped, re-examine the contrast")
      // single-doc probe prunes to one bucket per log
      val probe = Bucketing.resolvedBucketed(spark, "bv_docs", "bv_versions", "doc_id")
        .filter(col("doc_id") === 1L)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
        s"single-doc probe must prune to one bucket:\n$plan")
      assert(rows(probe) == Set(1L -> "one v1"))
      // replay through a fresh checkpoint is a no-op (landed-seq guards)
      StreamingIngest.docStoreStreamBucketed(stream(), "bv_docs", "bv_versions",
        root + "/bckpt2", buckets = 4)
      assert(rows(Bucketing.resolvedBucketed(spark, "bv_docs", "bv_versions", "doc_id"))
        == rows(flat), "bucketed replay changed the resolved corpus")
      // bucketed compaction: live rows keep their stamps, superseded
      // versions drop, and the post-compaction resolve is still
      // row-identical and shuffle-free
      Bucketing.compactVersionedBucketed(spark, "bv_docs", "bv_versions", "doc_id", 4)
      val after = Bucketing.resolvedBucketed(spark, "bv_docs", "bv_versions", "doc_id")
      assert(rows(after) == rows(flat), "bucketed compaction changed the resolved corpus")
      assert(Bucketing.countExchanges(after) == 0,
        s"post-compaction bucketed resolve lost the layout:\n${after.queryExecution.executedPlan}")
      assert(spark.table("bv_docs").groupBy(col("doc_id"))
        .agg(countDistinct(col("ingest_seq")).as("nv")).filter(col("nv") > 1).count() == 0,
        "superseded versions survived the bucketed compaction")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS bv_docs")
      spark.sql("DROP TABLE IF EXISTS bv_versions")
    }
  }

  test("the bucketed loop is generic: the postings family resolves row-identical to the flat stream, shuffle-free") {
    import graft.streaming.StreamingIngest
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS bp_postings")
      spark.sql("DROP TABLE IF EXISTS bp_versions")
      val root = tempDir("graft-bucketed-postings")
      val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
      writeWaveTo(root + "/src", 0, mk(Seq(
        1L -> "alpha beta beta", 2L -> "beta gamma", 3L -> "delta")))
      writeWaveTo(root + "/src", 1, mk(Seq(1L -> "alpha only now")))
      writeWaveTo(root + "/src", 2,
        mk(Seq(3L -> "x")).withColumn("text", lit(null).cast("string")))
      def stream() = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
      StreamingIngest.bm25IndexUpsertStreamBucketed(stream(),
        "bp_postings", "bp_versions", root + "/bckpt", buckets = 4)
      StreamingIngest.bm25IndexUpsertStream(stream(),
        root + "/postings", root + "/versions", root + "/fckpt")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select(col("doc_id"), col("term"), col("tf").cast("long"), col("dl").cast("long"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val bucketed = Bucketing.resolvedBucketed(spark, "bp_postings", "bp_versions", "doc_id")
      val flat = StreamingIngest.resolvedPostings(spark, root + "/postings", root + "/versions")
      assert(rows(bucketed) == rows(flat),
        "bucketed postings resolve diverged from the flat stream")
      assert(Bucketing.countExchanges(bucketed) == 0,
        s"bucketed postings resolve must be shuffle-free:\n${bucketed.queryExecution.executedPlan}")
      // the update replaced doc 1's postings, the deletion removed doc 3
      assert(!rows(bucketed).exists { case (id, t, _, _) => id == 1L && t == "beta" })
      assert(!rows(bucketed).exists(_._1 == 3L))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS bp_postings")
      spark.sql("DROP TABLE IF EXISTS bp_versions")
    }
  }

  test("the bucketed loop's automatic compaction cadence: maxFiles=0 compacts every batch, resolve unchanged and shuffle-free") {
    import graft.streaming.StreamingIngest
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS bc_docs")
      spark.sql("DROP TABLE IF EXISTS bc_versions")
      val root = tempDir("graft-bucketed-cadence")
      val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
      writeWaveTo(root + "/src", 0, mk(Seq(1L -> "one v0", 2L -> "two v0")))
      writeWaveTo(root + "/src", 1, mk(Seq(1L -> "one v1")))
      writeWaveTo(root + "/src", 2,
        mk(Seq(2L -> "x")).withColumn("text", lit(null).cast("string")))
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
      StreamingIngest.docStoreStreamBucketed(stream, "bc_docs", "bc_versions",
        root + "/ckpt", buckets = 2, maxFiles = 0)
      // superseded versions dropped by the in-loop cadence
      assert(spark.table("bc_docs").groupBy(col("doc_id"))
        .agg(countDistinct(col("ingest_seq")).as("nv")).filter(col("nv") > 1).count() == 0,
        "superseded versions survived the bucketed cadence")
      val resolved = Bucketing.resolvedBucketed(spark, "bc_docs", "bc_versions", "doc_id")
      assert(resolved.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet == Set(1L -> "one v1"),
        "post-cadence resolve served the wrong corpus")
      assert(Bucketing.countExchanges(resolved) == 0,
        "the compacted pair lost the bucketed layout")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS bc_docs")
      spark.sql("DROP TABLE IF EXISTS bc_versions")
    }
  }

  test("round-15 migration: the fused loops' capped probe resolve and the family resolves ride the buckets — zero exchanges, rows identical to flat") {
    import graft.streaming.StreamingIngest
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Seq("mb_vecs", "mb_vers").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val root = tempDir("graft-bucketed-mig")
      def v(seed: Int) = Array.tabulate(64)(i => (seed * 64 + i + 1).toFloat)
      val mk = (rows: Seq[(Long, Array[Float])]) => rows.toDF("vec_id", "embedding")
      writeWaveTo(root + "/src", 0, mk(Seq(1L -> v(1), 2L -> v(2), 3L -> v(3))))
      writeWaveTo(root + "/src", 1, mk(Seq(1L -> v(4))))
      writeWaveTo(root + "/src", 2,
        mk(Seq(2L -> v(0))).withColumn("embedding", lit(null).cast("array<float>")))
      def stream() = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
      StreamingIngest.embIndexUpsertStreamBucketed(stream(), "mb_vecs", "mb_vers",
        root + "/bckpt", buckets = 4)
      StreamingIngest.embIndexUpsertStream(stream(), root + "/vecs", root + "/versions",
        root + "/fckpt")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select(col("vec_id"), col("bucket")).collect()
          .map(r => (r.getLong(0), r.getAs[Number](1).longValue())).toSet
      // the family resolve: row-identical to flat, shuffle-free
      val bres = StreamingIngest.resolvedVectorsBucketed(spark, "mb_vecs", "mb_vers")
      assert(rows(bres) == rows(StreamingIngest.resolvedVectors(
        spark, root + "/vecs", root + "/versions")),
        "bucketed vector resolve diverged from the flat resolve")
      assert(Bucketing.countExchanges(bres) == 0,
        s"bucketed vector resolve must be shuffle-free:\n${bres.queryExecution.executedPlan}")
      // the fused loops' per-batch CAPPED resolve (ingest_seq < batchId):
      // the cap is a non-key predicate, so it must not cost the layout —
      // this is the plan every fused micro-batch pays, forever
      val bcap = StreamingIngest.liveRowsBeforeBucketed(
        spark, "mb_vecs", "mb_vers", "vec_id", 2L).get
      val fcap = StreamingIngest.liveRowsBefore(
        spark, root + "/vecs", root + "/versions", "vec_id", 2L).get
      assert(rows(bcap) == rows(fcap),
        "bucketed capped probe resolve diverged from the flat cap")
      assert(rows(bcap).map(_._1) == Set(1L, 2L, 3L),
        "the cap at batch 2 must serve exactly the pre-wave-2 live ids " +
          "(id 2's deletion lands at seq 2, so the capped probe still sees it)")
      assert(Bucketing.countExchanges(bcap) == 0,
        s"capped probe resolve must be shuffle-free:\n${bcap.queryExecution.executedPlan}")
      assert(Bucketing.countExchanges(fcap) > 0,
        "the flat capped resolve should shuffle — if it stopped, re-examine the contrast")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      Seq("mb_vecs", "mb_vers").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("a restarted bucketed stream heals the rewriteBucketed crash window instead of orphaning the history (r14 ADVICE)") {
    import graft.streaming.StreamingIngest
    try {
      spark.sql("DROP TABLE IF EXISTS hb_docs")
      spark.sql("DROP TABLE IF EXISTS hb_versions")
      val root = tempDir("graft-bucketed-heal")
      val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
      writeWaveTo(root + "/src", 0, mk(Seq(1L -> "one v0", 2L -> "two v0")))
      writeWaveTo(root + "/src", 1, mk(Seq(3L -> "three v1")))
      def stream() = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
      StreamingIngest.docStoreStreamBucketed(stream(), "hb_docs", "hb_versions",
        root + "/ckpt", buckets = 4)
      // simulate the rewriteBucketed crash window on the DATA log: the
      // full rewrite sits under the tmp name, the live name is gone
      spark.sql("ALTER TABLE hb_docs RENAME TO hb_docs_compact_tmp")
      // healBucketedSwap is the primitive: dangling heals (true),
      // healthy and never-created are no-ops (false)
      assert(Bucketing.healBucketedSwap(spark, "hb_docs"))
      assert(!Bucketing.healBucketedSwap(spark, "hb_docs"))
      assert(!Bucketing.healBucketedSwap(spark, "hb_no_such_table"))
      // crash again, then let the RESTARTED STREAM hit it: without the
      // heal, landedSeqBucketed reads "nothing landed", the append
      // recreates the table with only wave 2, and waves 0-1 are lost
      spark.sql("ALTER TABLE hb_docs RENAME TO hb_docs_compact_tmp")
      writeWaveTo(root + "/src", 2, mk(Seq(2L -> "two v2")))
      StreamingIngest.docStoreStreamBucketed(stream(), "hb_docs", "hb_versions",
        root + "/ckpt", buckets = 4)
      val live = Bucketing.resolvedBucketed(spark, "hb_docs", "hb_versions", "doc_id")
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(live == Set(1L -> "one v0", 2L -> "two v2", 3L -> "three v1"),
        s"history lost across the healed restart: $live")
      // the replay guard itself reads the healed history: wave-0 stamps
      // are visible even when the guard is the first touch after a crash
      spark.sql("ALTER TABLE hb_docs RENAME TO hb_docs_compact_tmp")
      assert(Bucketing.landedSeqBucketed(spark, "hb_docs", 0L),
        "landedSeqBucketed must heal the dangling name before answering")
    } finally {
      spark.sql("DROP TABLE IF EXISTS hb_docs")
      spark.sql("DROP TABLE IF EXISTS hb_docs_compact_tmp")
      spark.sql("DROP TABLE IF EXISTS hb_versions")
    }
  }

  test("countExchanges sees through AQE (round-15 self-review): a shuffling plan reads its true count with adaptive on, pre- and post-execution") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // pre-execution: the adaptive wrapper's initial plan carries the
      // ensured exchange — the naive leaf-stopping collect read 0 here,
      // which made every hash-pinned exchange count vacuous under the
      // Verify/Bench sessions (AQE is their default)
      def agg() = spark.range(0, 10000, 1, 4)
        .groupBy((col("id") % 97).as("k")).count()
      assert(Bucketing.countExchanges(agg()) >= 1,
        "a shuffling aggregate must count its exchange under AQE")
      // post-execution: the materialized shuffle is a query-stage LEAF
      val ran = agg(); ran.collect()
      assert(Bucketing.countExchanges(ran) >= 1,
        "an executed adaptive plan must still count its materialized shuffle stage")
      // and a genuinely exchange-free plan still reads 0
      assert(Bucketing.countExchanges(spark.range(10).select(col("id") + 1)) == 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  // ---- direct bucket-file commit path (round-16, r15 verdict item 1) ----

  test("direct bucket-file commit: appended files carry correct bucket placement — the pruned point probe finds every row a full scan finds") {
    import graft.pipeline.Ingest
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val autoB = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // a bare filter has no operator wanting the hash distribution, so
      // the planner's DisableUnnecessaryBucketedScan would turn bucketed
      // reading (and with it the prune this test asserts) off
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS b_direct")
      def batch(lo: Long, hi: Long, tag: String) =
        (lo to hi).map(i => (i, s"$tag$i")).toDF("k", "v")
      // append 1 creates via the catalog; appends 2-3 take the direct path
      Ingest.appendBucketedWithSeq(batch(1, 500, "a"), "b_direct", "k", 4, seq = 1)
      Ingest.appendBucketedWithSeq(batch(400, 900, "b"), "b_direct", "k", 4, seq = 2)
      Ingest.appendBucketedWithSeq(batch(850, 1200, "c"), "b_direct", "k", 4, seq = 3)
      // file-count cap holds on the direct path too (≤ buckets per append)
      assert(spark.table("b_direct").inputFiles.length <= 12,
        "direct appends must stay capped at buckets files per call")
      // THE placement invariant: for every key, the bucket-PRUNED point
      // probe must return exactly the full-scan rows — a misplaced file
      // (partition index != murmur3-pmod bucket) would silently lose
      // rows only on pruned reads
      val full = spark.table("b_direct").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      Seq(1L, 400L, 567L, 850L, 900L, 1200L).foreach { k =>
        val probe = spark.table("b_direct").filter(col("k") === k)
        val plan = probe.queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
          s"point probe must prune to one bucket:\n$plan")
        val got = probe.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(got == full.filter(_._1 == k),
          s"pruned probe on k=$k lost rows: $got vs ${full.filter(_._1 == k)}")
      }
      // every row is present exactly once per (key, seq) it was appended with
      assert(spark.table("b_direct").count() ==
        500 + 501 + 351, "direct appends lost or duplicated rows")
      // dedup-on-read stays shuffle-free over directly-committed files
      val latest = Ingest.latestView(spark.table("b_direct"), Seq("k"))
      assert(Bucketing.countExchanges(latest) == 0,
        s"direct-committed table lost its bucket partitioning:\n${latest.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", autoB)
      spark.sql("DROP TABLE IF EXISTS b_direct")
    }
  }

  test("direct bucket-file commit: a crashed append's staging dir is invisible to readers and swept by the next append") {
    import graft.pipeline.Ingest
    try {
      spark.sql("DROP TABLE IF EXISTS b_stage")
      val rows = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
      Ingest.appendBucketedWithSeq(rows, "b_stage", "k", 2, seq = 1)
      val loc = new java.io.File(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier("b_stage")).location.getPath)
      // plant a fake crashed staging dir with a parquet file inside
      val stale = new java.io.File(loc, ".graft-append-deadbeef")
      stale.mkdirs()
      rows.limit(5).withColumn("ingest_seq", lit(99L))
        .coalesce(1).write.mode("overwrite")
        .parquet(stale.getPath + "/inner")
      spark.catalog.refreshTable("b_stage")
      // invisible: dot-dirs are pruned from the table's file listing
      assert(spark.table("b_stage").count() == 100,
        "a dot-staging dir leaked into the table read")
      // swept: the next direct append removes it
      Ingest.appendBucketedWithSeq(rows, "b_stage", "k", 2, seq = 2)
      assert(!stale.exists(), "stale staging dir survived the next append")
      assert(spark.table("b_stage").count() == 200)
    } finally spark.sql("DROP TABLE IF EXISTS b_stage")
  }

  test("direct bucket-file commit: schema or bucket-spec drift falls back to the catalog path's named error, never lands misplaced files") {
    import graft.pipeline.Ingest
    try {
      spark.sql("DROP TABLE IF EXISTS b_drift")
      Ingest.appendBucketedWithSeq(
        (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"), "b_drift", "k", 2, seq = 1)
      // wrong bucket count: must NOT silently write 4-bucket-placed files
      // into a 2-bucket table — the catalog append path raises by name
      val e = intercept[Exception] {
        Ingest.appendBucketedWithSeq(
          (1L to 10L).map(i => (i, s"w$i")).toDF("k", "v"), "b_drift", "k", 4, seq = 2)
      }
      assert(e.getMessage != null)
      // wrong column set: same contract
      intercept[Exception] {
        Ingest.appendBucketedWithSeq(
          (1L to 10L).map(i => (i, i * 2)).toDF("k", "other"), "b_drift", "k", 2, seq = 3)
      }
      // the table is still intact and readable
      assert(spark.table("b_drift").count() == 10)
    } finally spark.sql("DROP TABLE IF EXISTS b_drift")
  }

  test("appendBucketedPairWithSeq: both sides land once, a replay with one side already landed appends only the other") {
    import graft.pipeline.Ingest
    try {
      spark.sql("DROP TABLE IF EXISTS bp_data"); spark.sql("DROP TABLE IF EXISTS bp_vers")
      val data = (1L to 200L).map(i => (i, s"d$i")).toDF("k", "v")
      val vers = (1L to 200L).map(i => Tuple1(i)).toDF("k")
      Ingest.appendBucketedPairWithSeq(spark,
        Seq(data -> "bp_data", vers -> "bp_vers"), "k", 2, seq = 1)
      assert(spark.table("bp_data").count() == 200 && spark.table("bp_vers").count() == 200)
      // full replay: both guards hold, nothing duplicates
      Ingest.appendBucketedPairWithSeq(spark,
        Seq(data -> "bp_data", vers -> "bp_vers"), "k", 2, seq = 1)
      assert(spark.table("bp_data").count() == 200 && spark.table("bp_vers").count() == 200)
      // partial-crash replay: data side of seq 2 landed, versions did not
      Ingest.appendBucketedWithSeq(data, "bp_data", "k", 2, seq = 2)
      Ingest.appendBucketedPairWithSeq(spark,
        Seq(data -> "bp_data", vers -> "bp_vers"), "k", 2, seq = 2)
      assert(spark.table("bp_data").count() == 400,
        "the already-landed side must not re-append")
      assert(spark.table("bp_vers").count() == 400,
        "the missing side must land on replay")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bp_data"); spark.sql("DROP TABLE IF EXISTS bp_vers")
    }
  }

  test("landed marker: a crashed partial publish reads NOT landed and the replay scrubs it — exactly-once under mid-publish crashes (round-16)") {
    import graft.pipeline.Ingest
    try {
      spark.sql("DROP TABLE IF EXISTS b_marker"); spark.sql("DROP TABLE IF EXISTS b_marker_src")
      def batch(tag: String) = (1L to 100L).map(i => (i, s"$tag$i")).toDF("k", "v")
      Ingest.appendBucketedWithSeq(batch("a"), "b_marker", "k", 2, seq = 1)
      assert(Bucketing.landedSeqBucketed(spark, "b_marker", 1))
      // simulate a crashed mid-publish of seq 2: take a real seq-2
      // bucket file (from a twin table with the same spec) and plant it
      // under the seq-2 tag — stamped rows visible, marker NOT advanced
      Ingest.appendBucketedWithSeq(batch("b"), "b_marker_src", "k", 2, seq = 2)
      // second append re-runs the DIRECT path (scrub + re-publish), so the
      // donor table now holds seq-2 files from BOTH paths: untagged ones
      // from the catalog-create append and `-s2_`-tagged ones from the
      // direct re-publish
      Ingest.appendBucketedWithSeq(batch("b"), "b_marker_src", "k", 2, seq = 2)
      val srcLoc = new java.io.File(
        Bucketing.tableLocation(spark, "b_marker_src").toUri.getPath)
      val loc = new java.io.File(
        Bucketing.tableLocation(spark, "b_marker").toUri.getPath)
      // the planted file MUST carry the `-s2_` tag (a crashed DIRECT-path
      // publish is the scenario; only tagged files are scrub-addressable).
      // listFiles().head was flaky here: its order is filesystem-dependent
      // and under load picked an untagged catalog-path file the scrub
      // rightly ignores (inherited round-16 flake, fixed this round).
      val srcFile = srcLoc.listFiles()
        .filter(f => f.getName.startsWith("part-00000") && f.getName.contains("-s2_")).head
      java.nio.file.Files.copy(srcFile.toPath,
        new java.io.File(loc, srcFile.getName).toPath)
      spark.catalog.refreshTable("b_marker")
      // partial seq-2 rows ARE visible (the transient window both
      // publish paths share)...
      assert(spark.table("b_marker")
        .filter(col("ingest_seq") === 2L).count() > 0)
      // ...but the marker guard reads the batch as NOT landed — the
      // row probe alone would have skipped the replay and lost the rest
      assert(!Bucketing.landedSeqBucketed(spark, "b_marker", 2),
        "a partial publish must not read as landed")
      // the replay scrubs the crashed attempt's tagged files and
      // re-publishes: exactly once, never additive
      Ingest.appendBucketedWithSeq(batch("b"), "b_marker", "k", 2, seq = 2)
      assert(spark.table("b_marker").count() == 200,
        "replay after a partial publish duplicated or lost rows")
      assert(spark.table("b_marker")
        .filter(col("ingest_seq") === 2L).count() == 100)
      assert(Bucketing.landedSeqBucketed(spark, "b_marker", 2))
      assert(!Bucketing.landedSeqBucketed(spark, "b_marker", 3))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_marker")
      spark.sql("DROP TABLE IF EXISTS b_marker_src")
    }
  }

  test("landed marker survives the compaction swap; max-seq semantics keep earlier batches landed (round-16)") {
    import graft.pipeline.Ingest
    try {
      spark.sql("DROP TABLE IF EXISTS b_mcomp")
      def batch(lo: Long, hi: Long, tag: String) =
        (lo to hi).map(i => (i, s"$tag$i")).toDF("k", "v")
      Ingest.appendBucketedWithSeq(batch(1, 100, "a"), "b_mcomp", "k", 2, seq = 1)
      Ingest.appendBucketedWithSeq(batch(50, 150, "b"), "b_mcomp", "k", 2, seq = 2)
      Ingest.compactBucketed(spark, "b_mcomp", Seq("k"), "k", 2)
      // post-compaction: every landed batch still reads landed through
      // the surviving marker (the row probe alone could not answer for
      // seq 1 — compaction kept only the latest rows per key)
      assert(Bucketing.landedSeqBucketed(spark, "b_mcomp", 1))
      assert(Bucketing.landedSeqBucketed(spark, "b_mcomp", 2))
      assert(!Bucketing.landedSeqBucketed(spark, "b_mcomp", 3))
      // the versioned-pair rewrite preserves it too
      Bucketing.rewriteBucketed(spark, "b_mcomp",
        spark.table("b_mcomp"), "k", 2)
      assert(Bucketing.landedSeqBucketed(spark, "b_mcomp", 2))
    } finally spark.sql("DROP TABLE IF EXISTS b_mcomp")
  }

  test("compactBucketed re-run after a crash between DROP and RENAME recovers, not destroys") {
    import graft.pipeline.Ingest
    try {
      val rows = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "payload")
      Ingest.appendBucketedWithSeq(rows, "b_crash", "k", 2, seq = 1)
      // simulate the crash window: the compacted rewrite exists under the
      // tmp name and the live name has already been dropped
      spark.table("b_crash").write.bucketBy(2, "k").sortBy("k")
        .saveAsTable("b_crash_compact_tmp")
      spark.sql("DROP TABLE b_crash")
      // a naive re-run would DROP the tmp (the only copy) and then fail;
      // the recovery path must complete the rename instead
      Ingest.compactBucketed(spark, "b_crash", Seq("k"), "k", 2)
      assert(spark.table("b_crash").count() == 100)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_crash")
      spark.sql("DROP TABLE IF EXISTS b_crash_compact_tmp")
    }
  }
}
