package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** The versioned DOC STORE and the generic AS-OF read (round-13, x132):
  * resolvedRowsAsOf reconstructs the exact snapshot any batch saw —
  * late-arriving ids absent before their first arrival, deletions
  * absent after theirs — equals the live read at the max seq, serves
  * the postings log through the same code path (one log layout for
  * every family), and loses exactly the touched ids when compaction
  * destroys superseded versions (the fidelity bound x132 pins as data).
  */
class DocStoreAsOfSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .localCheckpoint(false)

  private lazy val h4docs = docs.withColumn("h4",
      pmod(graft.ext.TextDedup.portableHashBuiltin(col("doc_id").cast("string"), ""), lit(4L)))
    .localCheckpoint(false)

  private def doubled(d: DataFrame): DataFrame =
    d.withColumn("text", concat(col("text"), lit(" "), col("text")))

  // the x117 update script (waves share it with Bm25UpsertStreamSpec)
  private def waves(root: String): Unit = {
    writeWaveTo(root + "/src", 0, h4docs.drop("h4"))
    writeWaveTo(root + "/src", 1,
      doubled(h4docs.filter(col("h4") === 1)).drop("h4")
        .unionByName(h4docs.filter(col("h4") === 3)
          .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4")))
    writeWaveTo(root + "/src", 2,
      h4docs.filter(col("h4") === 2)
        .withColumn("text", lit(null).cast("string")).drop("h4")
        .unionByName(h4docs.filter(col("h4") === 3).drop("h4")))
  }

  private def run(root: String, maxFiles: Int = 64): Unit = {
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.docStoreStream(stream, root + "/docs",
      root + "/versions", root + "/ckpt", maxFiles = maxFiles)
    ()
  }

  private def asOf(root: String, seq: Long): DataFrame =
    StreamingIngest.resolvedRowsAsOf(spark, root + "/docs",
      root + "/versions", "doc_id", seq)

  private def idText(d: DataFrame): Set[(Long, String)] =
    d.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  // closed-form snapshot corpora
  private def wave1Corpus: DataFrame =
    doubled(h4docs.filter(col("h4") === 1))
      .unionByName(h4docs.filter(col("h4") === 3)
        .withColumn("text", concat(col("text"), lit(" alpha"))))
      .unionByName(h4docs.filter(col("h4") === 0 || col("h4") === 2))
      .drop("h4")
  private def latestCorpus: DataFrame =
    doubled(h4docs.filter(col("h4") === 1))
      .unionByName(h4docs.filter(col("h4") === 0 || col("h4") === 3))
      .drop("h4")

  test("as-of reconstructs each snapshot on a hand-built lifecycle (late arrival, update, delete)") {
    val root = tempDir("graft-asof-tiny")
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
    writeWaveTo(root + "/src", 0, mk(Seq(1L -> "one v0", 2L -> "two v0")))
    writeWaveTo(root + "/src", 1, mk(Seq(1L -> "one v1", 3L -> "three v1")))
    writeWaveTo(root + "/src", 2,
      mk(Seq(2L -> "x")).withColumn("text", lit(null).cast("string")))
    run(root)
    assert(idText(asOf(root, 0)) == Set(1L -> "one v0", 2L -> "two v0"),
      "as-of(0) != wave-0 snapshot (doc 3 must not exist yet)")
    assert(idText(asOf(root, 1)) == Set(1L -> "one v1", 2L -> "two v0", 3L -> "three v1"),
      "as-of(1) != wave-1 snapshot")
    assert(idText(asOf(root, 2)) == Set(1L -> "one v1", 3L -> "three v1"),
      "as-of(2) must drop the deleted doc 2")
    assert(idText(asOf(root, 2)) == idText(
        StreamingIngest.resolvedDocs(spark, root + "/docs", root + "/versions")),
      "as-of at the max seq != the live read")
  }

  test("as-of over the corpus update script equals the closed-form wave corpora") {
    val root = tempDir("graft-asof-sf")
    waves(root)
    run(root)
    assert(idText(asOf(root, 0)) == idText(docs), "as-of(0) != the original corpus")
    assert(idText(asOf(root, 1)) == idText(wave1Corpus), "as-of(1) != the wave-1 corpus")
    assert(idText(asOf(root, 2)) == idText(latestCorpus), "as-of(2) != the latest corpus")
  }

  test("compaction destroys superseded history: old as-of keeps only never-touched ids, the live read is invariant") {
    val root = tempDir("graft-asof-compact")
    waves(root)
    run(root)
    val liveBefore = idText(StreamingIngest.resolvedDocs(spark, root + "/docs", root + "/versions"))
    assert(StreamingIngest.maybeCompactVersioned(
      spark, root + "/docs", root + "/versions", 0, "doc_id"), "forced compaction did not run")
    assert(idText(asOf(root, 0)) ==
        idText(h4docs.filter(col("h4") === 0).drop("h4")),
      "post-compaction as-of(0) must shrink to the never-touched bucket")
    assert(idText(StreamingIngest.resolvedDocs(spark, root + "/docs", root + "/versions")) == liveBefore,
      "compaction changed the live read")
  }

  test("the IN-STREAM compaction cadence destroys as-of history too — retention is the maxFiles knob, a history consumer must own it") {
    // the x100-sweep finding: per-append file counts grow with scale
    // (AQE stops coalescing), the default cadence trips mid-stream, and
    // the as-of arms silently read compacted state. maxFiles=0 forces
    // that regime at any scale: every batch compacts, so after the run
    // only never-touched ids reconstruct at seq 0 — while the LIVE read
    // stays exactly right (compaction keeps live versions by contract).
    val root = tempDir("graft-asof-midstream")
    waves(root)
    run(root, maxFiles = 0)
    assert(idText(asOf(root, 0)) ==
        idText(h4docs.filter(col("h4") === 0).drop("h4")),
      "mid-stream compaction should have destroyed the touched ids' seq-0 history")
    assert(idText(StreamingIngest.resolvedDocs(spark, root + "/docs", root + "/versions")) ==
        idText(latestCorpus),
      "the live read must survive any compaction cadence")
  }

  // ---- history-preserving floor compaction (round-14, x141) --------------

  private def copyDir(from: String, to: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(from)
    val dst = new org.apache.hadoop.fs.Path(to)
    org.apache.hadoop.fs.FileUtil.copy(
      src.getFileSystem(conf), src, dst.getFileSystem(conf), dst, false, conf)
    ()
  }

  test("floor compaction: as-of at and above the floor is bit-equal to the uncompacted twin; below it the checked read refuses by name") {
    val root = tempDir("graft-asof-floor")
    waves(root)
    run(root, maxFiles = Int.MaxValue)
    val twin0 = idText(asOf(root, 0))
    val twin1 = idText(asOf(root, 1))
    val twin2 = idText(asOf(root, 2))
    StreamingIngest.compactVersionedKeepAfter(
      spark, root + "/docs", root + "/versions", 1L)
    // the fold genuinely destroyed below-floor history: wave-0 versions
    // of the updated h4 1/3 ids are gone from the data log
    assert(idText(asOf(root, 0)) != twin0,
      "floor-1 compaction should have folded away the updated ids' seq-0 versions")
    // AT the floor and above: exact
    assert(idText(asOf(root, 1)) == twin1, "as-of(floor) diverged from the uncompacted twin")
    assert(idText(asOf(root, 2)) == twin2, "as-of(floor+1) diverged from the uncompacted twin")
    // the checked read serves >= floor and refuses < floor by name
    assert(idText(StreamingIngest.resolvedRowsAsOfChecked(
        spark, root + "/docs", root + "/versions", "doc_id", 1L)) == twin1)
    val e = intercept[IllegalArgumentException] {
      StreamingIngest.resolvedRowsAsOfChecked(
        spark, root + "/docs", root + "/versions", "doc_id", 0L)
    }
    assert(e.getMessage.contains("compaction floor"),
      s"the refusal must name the floor contract: ${e.getMessage}")
    // floors only rise: a lower re-floor must not lower the marker
    StreamingIngest.compactVersionedKeepAfter(
      spark, root + "/docs", root + "/versions", 0L)
    assert(StreamingIngest.asOfFloorSeq(spark, root + "/versions") == 1L,
      "a lower floor must not regress the recorded marker")
  }

  test("BUCKETED floor compaction (round-15, r14 verdict item 4): as-of >= floor bit-equal, below-floor refused by name, zero exchanges in the as-of plan") {
    import graft.pipeline.Bucketing
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val tables = Seq("fb_docs", "fb_vers", "fb_vers_asof_floor")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val root = tempDir("graft-asof-floorbucketed")
      waves(root)
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
      // retention pinned off the automatic cadence — the FLOOR is the
      // retention policy here (the x141 posture on the table layout)
      StreamingIngest.docStoreStreamBucketed(stream, "fb_docs", "fb_vers",
        root + "/ckpt", buckets = 4, maxFiles = Int.MaxValue)
      def asOfB(seq: Long) = Bucketing.resolvedBucketedAsOfChecked(
        spark, "fb_docs", "fb_vers", "doc_id", seq)
      val twin1 = idText(asOfB(1))
      val twin2 = idText(asOfB(2))
      assert(twin1 == idText(wave1Corpus), "bucketed as-of(1) != the wave-1 corpus")
      assert(twin2 == idText(latestCorpus), "bucketed as-of(2) != the latest corpus")
      Bucketing.compactVersionedBucketedKeepAfter(
        spark, "fb_docs", "fb_vers", "doc_id", 4, 1L)
      // AT the floor and above: bit-equal to the uncompacted twin
      assert(idText(asOfB(1)) == twin1,
        "bucketed as-of(floor) diverged across the floor fold")
      assert(idText(asOfB(2)) == twin2,
        "bucketed as-of(floor+1) diverged across the floor fold")
      // THE composition point: the as-of read keeps the layout's
      // zero-exchange plan — history-preserving retention did not cost
      // the shuffle-free serving read
      val plan = asOfB(1)
      assert(Bucketing.countExchanges(plan) == 0,
        s"bucketed as-of must stay shuffle-free:\n${plan.queryExecution.executedPlan}")
      // below the floor: refused BY NAME
      val e = intercept[IllegalArgumentException] { asOfB(0) }
      assert(e.getMessage.contains("compaction floor"),
        s"the refusal must name the floor contract: ${e.getMessage}")
      // the marker is recorded and floors only rise
      assert(Bucketing.asOfFloorSeqBucketed(spark, "fb_vers") == 1L)
      Bucketing.compactVersionedBucketedKeepAfter(
        spark, "fb_docs", "fb_vers", "doc_id", 4, 0L)
      assert(Bucketing.asOfFloorSeqBucketed(spark, "fb_vers") == 1L,
        "a lower floor must not regress the recorded marker")
      // the live read is invariant across the fold and still shuffle-free
      val live = Bucketing.resolvedBucketed(spark, "fb_docs", "fb_vers", "doc_id")
      assert(idText(live) == idText(latestCorpus),
        "the live read changed across the floor fold")
      assert(Bucketing.countExchanges(live) == 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("BUCKETED floor compaction is crash-safe in either swap order: cross-read of folded/unfolded table pairs serves exact as-of >= floor and the live read") {
    import graft.pipeline.Bucketing
    val tables = Seq("pbx_docs", "pbx_vers", "cbx_docs", "cbx_vers",
      "cbx_vers_asof_floor")
    try {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val root = tempDir("graft-asof-floorcrash-b")
      waves(root)
      def runB(dt: String, vt: String, ckpt: String): Unit = {
        val stream = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
        StreamingIngest.docStoreStreamBucketed(stream, dt, vt,
          root + s"/$ckpt", buckets = 4, maxFiles = Int.MaxValue)
        ()
      }
      // two identical pairs off the same waves (deterministic stamps),
      // one then floor-folded — a mixed read of (folded, unfolded) IS
      // the crash-partial state, no copying needed on the table layout
      runB("pbx_docs", "pbx_vers", "ckpt-p")
      runB("cbx_docs", "cbx_vers", "ckpt-c")
      val twin1 = idText(Bucketing.resolvedBucketedAsOf(
        spark, "pbx_docs", "pbx_vers", "doc_id", 1L))
      val twin2 = idText(Bucketing.resolvedBucketedAsOf(
        spark, "pbx_docs", "pbx_vers", "doc_id", 2L))
      Bucketing.compactVersionedBucketedKeepAfter(
        spark, "cbx_docs", "cbx_vers", "doc_id", 4, 1L)
      for (((dt, vt), label) <- Seq(
        ("cbx_docs", "pbx_vers") -> "data-first",
        ("pbx_docs", "cbx_vers") -> "versions-first")) {
        assert(idText(Bucketing.resolvedBucketedAsOf(
            spark, dt, vt, "doc_id", 1L)) == twin1,
          s"$label partial state broke bucketed as-of(floor)")
        assert(idText(Bucketing.resolvedBucketedAsOf(
            spark, dt, vt, "doc_id", 2L)) == twin2,
          s"$label partial state broke bucketed as-of(floor+1)")
        assert(idText(Bucketing.resolvedBucketed(
            spark, dt, vt, "doc_id")) == twin2,
          s"$label partial state broke the bucketed live read")
      }
    } finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("marker-first crash state: a recorded floor with the fold not yet landed refuses below-floor reads but answers them nowhere wrong") {
    val root = tempDir("graft-asof-floormarker")
    waves(root)
    run(root, maxFiles = Int.MaxValue)
    val twin1 = idText(asOf(root, 1))
    // simulate the crash window: marker landed, swaps did not — build
    // the marker exactly as the compaction's first step does
    import spark.implicits._
    Seq(1L).toDF("floor_seq").write.mode("overwrite")
      .parquet(root + "/versions_asof_floor")
    assert(StreamingIngest.asOfFloorSeq(spark, root + "/versions") == 1L)
    // below-floor: refused by name (the history is actually still there
    // — a lost capability, never a wrong answer)
    intercept[IllegalArgumentException] {
      StreamingIngest.resolvedRowsAsOfChecked(
        spark, root + "/docs", root + "/versions", "doc_id", 0L)
    }
    // at/above the floor: exact, fold landed or not
    assert(idText(StreamingIngest.resolvedRowsAsOfChecked(
      spark, root + "/docs", root + "/versions", "doc_id", 1L)) == twin1)
    // the re-run completes the fold and nothing changes at/above
    StreamingIngest.compactVersionedKeepAfter(
      spark, root + "/docs", root + "/versions", 1L)
    assert(idText(StreamingIngest.resolvedRowsAsOfChecked(
      spark, root + "/docs", root + "/versions", "doc_id", 1L)) == twin1)
  }

  test("floor compaction is crash-safe in either swap order: both partial states serve exact as-of >= floor and the live read") {
    val root = tempDir("graft-asof-floorcrash")
    waves(root)
    run(root, maxFiles = Int.MaxValue)
    val twin1 = idText(asOf(root, 1))
    val twin2 = idText(asOf(root, 2))
    // full compaction on side copies gives the two swapped halves
    copyDir(root + "/docs", root + "/c/docs")
    copyDir(root + "/versions", root + "/c/versions")
    StreamingIngest.compactVersionedKeepAfter(
      spark, root + "/c/docs", root + "/c/versions", 1L)
    // partial state A: data log swapped, version log still original
    copyDir(root + "/c/docs", root + "/pa/docs")
    copyDir(root + "/versions", root + "/pa/versions")
    // partial state B: version log swapped, data log still original
    copyDir(root + "/docs", root + "/pb/docs")
    copyDir(root + "/c/versions", root + "/pb/versions")
    for ((p, label) <- Seq("pa" -> "data-first", "pb" -> "versions-first")) {
      assert(idText(StreamingIngest.resolvedRowsAsOf(spark, root + s"/$p/docs",
          root + s"/$p/versions", "doc_id", 1L)) == twin1,
        s"$label partial state broke as-of(floor)")
      assert(idText(StreamingIngest.resolvedRowsAsOf(spark, root + s"/$p/docs",
          root + s"/$p/versions", "doc_id", 2L)) == twin2,
        s"$label partial state broke as-of(floor+1)")
      assert(idText(StreamingIngest.resolvedDocs(spark, root + s"/$p/docs",
          root + s"/$p/versions")) == twin2,
        s"$label partial state broke the live read")
    }
  }

  test("the stream continues over a floor-compacted log through the same checkpoint (the x141 mid-script shape)") {
    val root = tempDir("graft-asof-floormid")
    // waves 0 and 1 only, then floor-compact, then wave 2 arrives
    writeWaveTo(root + "/src", 0, h4docs.drop("h4"))
    writeWaveTo(root + "/src", 1,
      doubled(h4docs.filter(col("h4") === 1)).drop("h4")
        .unionByName(h4docs.filter(col("h4") === 3)
          .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4")))
    run(root, maxFiles = Int.MaxValue)
    StreamingIngest.compactVersionedKeepAfter(
      spark, root + "/docs", root + "/versions", 1L)
    writeWaveTo(root + "/src", 2,
      h4docs.filter(col("h4") === 2)
        .withColumn("text", lit(null).cast("string")).drop("h4")
        .unionByName(h4docs.filter(col("h4") === 3).drop("h4")))
    run(root, maxFiles = Int.MaxValue)
    assert(idText(asOf(root, 1)) == idText(wave1Corpus),
      "as-of(floor) after the post-compaction wave diverged from the wave-1 corpus")
    assert(idText(asOf(root, 2)) == idText(latestCorpus),
      "as-of over the post-compaction wave diverged from the latest corpus")
  }

  test("the floor fold is generic: on the postings log (many rows per id) the surviving version keeps ALL its rows") {
    val root = tempDir("graft-asof-floorpostings")
    waves(root)
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.bm25IndexUpsertStream(stream, root + "/postings",
      root + "/versions", root + "/ckpt", maxPostingFiles = Int.MaxValue)
    def rows(d: DataFrame): Set[(Long, String, Long)] =
      d.select(col("doc_id"), col("term"), col("tf").cast("long"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val twin1 = rows(StreamingIngest.resolvedRowsAsOf(spark, root + "/postings",
      root + "/versions", "doc_id", 1L))
    val twin2 = rows(StreamingIngest.resolvedRowsAsOf(spark, root + "/postings",
      root + "/versions", "doc_id", 2L))
    StreamingIngest.compactVersionedKeepAfter(
      spark, root + "/postings", root + "/versions", 1L)
    assert(rows(StreamingIngest.resolvedRowsAsOfChecked(spark, root + "/postings",
      root + "/versions", "doc_id", 1L)) == twin1,
      "the postings floor fold dropped or duplicated rows of a surviving version")
    assert(rows(StreamingIngest.resolvedRowsAsOfChecked(spark, root + "/postings",
      root + "/versions", "doc_id", 2L)) == twin2,
      "above-floor postings changed under the fold")
    // multiplicity check: a multi-term doc's surviving version keeps one
    // row per term, exactly
    val perDoc = spark.read.parquet(root + "/postings")
      .groupBy(col("doc_id"), col("ingest_seq"))
      .agg(countDistinct(col("term")).as("nt"), count(lit(1)).as("nr"))
      .filter(col("nt") =!= col("nr"))
    assert(perDoc.count() == 0, "duplicate (doc, term) posting rows after the fold")
  }

  // ---- the training-cut manifest (round-14, x144) ------------------------

  test("training cuts are atomic and versioned: the current cut reads whole, historical cuts stay readable, and composed reads match direct as-ofs") {
    val root = tempDir("graft-asof-cut")
    waves(root)
    run(root, maxFiles = Int.MaxValue)
    val mroot = root + "/cut"
    val v0 = StreamingIngest.publishTrainingCut(spark, mroot,
      Seq("corpus" -> 1L, "aux" -> 1L))
    val v1 = StreamingIngest.publishTrainingCut(spark, mroot,
      Seq("corpus" -> 2L, "aux" -> 2L))
    assert(v0 == 0L && v1 == 1L, s"manifest versions must advance: $v0, $v1")
    // current = the newest whole cut; history by version
    assert(StreamingIngest.readTrainingCut(spark, mroot)
      == Map("corpus" -> 2L, "aux" -> 2L))
    assert(StreamingIngest.readTrainingCut(spark, mroot, Some(0L))
      == Map("corpus" -> 1L, "aux" -> 1L))
    // a read composed through the historical cut equals the direct as-of
    val cut0 = StreamingIngest.readTrainingCut(spark, mroot, Some(0L))
    assert(idText(StreamingIngest.resolvedRowsAsOfChecked(
        spark, root + "/docs", root + "/versions", "doc_id", cut0("corpus")))
      == idText(asOf(root, 1L)),
      "the cut-composed corpus read diverged from the direct as-of")
    // the current cut resolves the latest corpus
    val cut1 = StreamingIngest.readTrainingCut(spark, mroot)
    assert(idText(StreamingIngest.resolvedRowsAsOfChecked(
        spark, root + "/docs", root + "/versions", "doc_id", cut1("corpus")))
      == idText(StreamingIngest.resolvedDocs(spark, root + "/docs", root + "/versions")))
  }

  test("the as-of read is generic: the postings log resolves to batch postings over the wave-1 corpus") {
    val root = tempDir("graft-asof-postings")
    waves(root)
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.bm25IndexUpsertStream(stream, root + "/postings",
      root + "/versions", root + "/ckpt")
    def rows(d: DataFrame): Set[(Long, String, Long, Long)] =
      d.select(col("doc_id"), col("term"),
          col("tf").cast("long").as("tf"), col("dl").cast("long").as("dl"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val got = rows(StreamingIngest.resolvedRowsAsOf(spark, root + "/postings",
      root + "/versions", "doc_id", 1L))
    val want = rows(graft.ext.TextRank.postings(wave1Corpus))
    assert(got == want, "postings-log as-of(1) != batch postings over the wave-1 corpus")
  }
}
