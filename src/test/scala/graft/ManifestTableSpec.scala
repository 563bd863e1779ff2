package graft

import org.apache.spark.sql.functions._

import graft.pipeline.ManifestTable

/** The commit-log table contract: readers always see a complete
  * committed version — across appends, compaction, crash orphans, and
  * vacuum.
  */
class ManifestTableSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    tempDir("graft-manifest") + "/t"

  test("append commits are cumulative and versioned") {
    val root = freshRoot()
    val v0 = ManifestTable.append(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ingest_seq"))
    assert(v0 == 0L)
    val v1 = ManifestTable.append(spark, root,
      Seq((3L, "c", 2L)).toDF("id", "v", "ingest_seq"))
    assert(v1 == 1L)
    assert(ManifestTable.read(spark, root).count() == 3)
    assert(ManifestTable.currentVersion(spark, root).contains(1L))
  }

  test("time travel: every surviving version reads as its exact historical file set") {
    val root = freshRoot()
    ManifestTable.append(spark, root, Seq((1L, "a", 1L)).toDF("id", "v", "ingest_seq"))
    ManifestTable.append(spark, root, Seq((2L, "b", 2L)).toDF("id", "v", "ingest_seq"))
    ManifestTable.compact(spark, root, Seq("id"))
    ManifestTable.append(spark, root, Seq((1L, "a2", 3L)).toDF("id", "v", "ingest_seq"))
    // v0: first append; v1: both; v2: compacted (same rows); v3: + re-ingest of id 1
    assert(ManifestTable.readVersion(spark, root, 0).select("id").as[Long].collect().toSet == Set(1L))
    assert(ManifestTable.readVersion(spark, root, 1).select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(ManifestTable.readVersion(spark, root, 2).count() == 2)
    assert(ManifestTable.readVersion(spark, root, 3).count() == 3)
    assert(ManifestTable.read(spark, root).count() == 3)
  }

  test("lost commit race raises typed ConcurrentCommitException; retry loop converges") {
    val root = freshRoot()
    ManifestTable.append(spark, root, Seq((1L, "a", 1L)).toDF("id", "v", "ingest_seq"))
    // simulate a racer that has already published the next manifest
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // racer's manifest re-publishes v0's (real) file list as v1
    val m0 = new org.apache.hadoop.fs.Path(s"$root/manifest/m-${"%020d".format(0L)}.json")
    val body = {
      val in = f.open(m0)
      try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    }
    val racer = new org.apache.hadoop.fs.Path(s"$root/manifest/m-${"%020d".format(1L)}.json")
    val out = f.create(racer, false)
    try out.write(body) finally out.close()

    // a writer that read head=v0 BEFORE the racer published v1 must
    // detect the conflict rather than fork history
    intercept[graft.pipeline.ConcurrentCommitException] {
      ManifestTable.commitAgainst(spark, root,
        Seq((2L, "b", 2L)).toDF("id", "v", "ingest_seq"), replace = false, prev = Some(0L))
    }
    // commitWithRetry re-reads the head (now the racer's v1) and lands v2
    val v = ManifestTable.commitWithRetry(spark, root, { _ =>
      (Seq((3L, "c", 3L)).toDF("id", "v", "ingest_seq"), false)
    })
    assert(v == 2L)
    assert(ManifestTable.currentVersion(spark, root).contains(2L))
  }

  test("genuinely concurrent writers all land exactly once (latch serializes versions)") {
    val root = freshRoot()
    val writers = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val futures = (1 to writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = ManifestTable.commitWithRetry(spark, root, { _ =>
            (Seq((w.toLong, s"w$w", w.toLong)).toDF("id", "v", "ingest_seq"), false)
          }, maxRetries = 30)
        })
      }
      val versions = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // every writer got a DISTINCT version and the head is the last one
      assert(versions.toSet.size == writers, versions.toString)
      assert(versions.max == writers - 1L)
    } finally pool.shutdown()
    // no commit was silently dropped: all six rows are in the final state
    val rows = ManifestTable.read(spark, root).select("id").as[Long].collect().sorted
    assert(rows.toSeq == (1L to writers.toLong))
    assert(ManifestTable.currentVersion(spark, root).contains(writers - 1L))
  }

  test("vacuum clears an abandoned commit latch so the version unwedges") {
    val root = freshRoot()
    ManifestTable.append(spark, root, Seq((1L, "a", 1L)).toDF("id", "v", "ingest_seq"))
    // simulate a writer that died between latch and rename of version 1
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latch = new org.apache.hadoop.fs.Path(
      s"$root/manifest/.c-${"%020d".format(1L)}.latch")
    f.create(latch, false).close()
    // the wedged version: commits at head+1 keep losing to the dead latch
    intercept[graft.pipeline.ConcurrentCommitException] {
      ManifestTable.append(spark, root, Seq((2L, "b", 2L)).toDF("id", "v", "ingest_seq"))
    }
    // age-0 vacuum (no live writers in the test) reclaims it; commit lands
    ManifestTable.vacuum(spark, root, keepVersions = 2, minAgeMs = 0L)
    assert(!f.exists(latch))
    val v = ManifestTable.append(spark, root, Seq((2L, "b", 2L)).toDF("id", "v", "ingest_seq"))
    assert(v == 1L)
  }

  test("compact collapses duplicates by last write and flips one version") {
    val root = freshRoot()
    ManifestTable.append(spark, root,
      Seq((1L, "old", 1L), (2L, "keep", 1L)).toDF("id", "v", "ingest_seq"))
    ManifestTable.append(spark, root,
      Seq((1L, "new", 2L)).toDF("id", "v", "ingest_seq"))
    val v = ManifestTable.compact(spark, root, Seq("id"))
    assert(v == 2L)
    val got = ManifestTable.read(spark, root)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "keep"))
  }

  test("uncommitted data files are invisible (crash between write and commit)") {
    val root = freshRoot()
    ManifestTable.append(spark, root, Seq((1L, "a", 1L)).toDF("id", "v", "ingest_seq"))
    // simulate a crashed writer: data lands, no manifest follows
    Seq((99L, "orphan", 9L)).toDF("id", "v", "ingest_seq")
      .write.parquet(s"$root/data/b-orphan99")
    assert(ManifestTable.read(spark, root).count() == 1)
  }

  test("vacuum removes orphans and stale versions but keeps live files readable") {
    val root = freshRoot()
    ManifestTable.append(spark, root,
      Seq((1L, "x", 1L), (2L, "y", 1L)).toDF("id", "v", "ingest_seq"))
    ManifestTable.append(spark, root, Seq((1L, "z", 2L)).toDF("id", "v", "ingest_seq"))
    ManifestTable.compact(spark, root, Seq("id"))
    Seq((99L, "orphan", 9L)).toDF("id", "v", "ingest_seq")
      .write.parquet(s"$root/data/b-orphan99")
    // minAgeMs = 0: in tests no writer is in flight; the default 1h
    // threshold is the production in-flight-commit guard
    ManifestTable.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    val got = ManifestTable.read(spark, root)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "z", 2L -> "y"))
    // the orphan batch directory is gone entirely (no empty prefixes)
    assert(!new java.io.File(s"$root/data/b-orphan99").exists())
  }

  test("manifested report publish: old version serves while the new one lands") {
    val root = freshRoot()
    val r1 = Seq(("A/B", BigDecimal("10.5"), 3L)).toDF("pair", "vol_24h", "txn_24h")
    graft.pipeline.Ingest.publishReportManifested(spark, r1, root)
    val served = ManifestTable.read(spark, root)
    val r2 = Seq(("C/D", BigDecimal("99.0"), 7L)).toDF("pair", "vol_24h", "txn_24h")
    graft.pipeline.Ingest.publishReportManifested(spark, r2, root)
    // the pre-publish reader still sees version 0 in full; fresh reads see v1
    assert(served.select("pair").as[String].collect().toSeq == Seq("A/B"))
    assert(ManifestTable.read(spark, root)
      .select("pair").as[String].collect().toSeq == Seq("C/D"))
  }

  test("vacuum's age threshold protects an in-flight commit's fresh data") {
    val root = freshRoot()
    ManifestTable.append(spark, root, Seq((1L, "a", 1L)).toDF("id", "v", "ingest_seq"))
    // a writer mid-commit: data landed seconds ago, manifest not yet written
    Seq((2L, "inflight", 2L)).toDF("id", "v", "ingest_seq")
      .write.parquet(s"$root/data/b-inflight")
    ManifestTable.vacuum(spark, root) // default 1h minAge
    assert(new java.io.File(s"$root/data/b-inflight").exists(),
      "vacuum deleted data a committing writer is about to reference")
  }

  test("ManifestedReportHandle picks up a new published version without a refresh call") {
    val root = freshRoot()
    val r1 = Seq(("A/B", BigDecimal("10.5"), 3L)).toDF("pair", "vol_24h", "txn_24h")
    graft.pipeline.Ingest.publishReportManifested(spark, r1, root)
    val handle = new graft.api.ReportApi.ManifestedReportHandle(spark, root)
    assert(handle.df.select("pair").as[String].collect().toSeq == Seq("A/B"))
    val r2 = Seq(("C/D", BigDecimal("99.0"), 7L)).toDF("pair", "vol_24h", "txn_24h")
    graft.pipeline.Ingest.publishReportManifested(spark, r2, root)
    assert(handle.df.select("pair").as[String].collect().toSeq == Seq("C/D"))
  }

  test("table stays continuously readable across a compaction (no swap window)") {
    val root = freshRoot()
    ManifestTable.append(spark, root,
      (1L to 500L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "ingest_seq"))
    ManifestTable.append(spark, root,
      (1L to 500L).map(i => (i, s"w$i", 2L)).toDF("id", "v", "ingest_seq"))
    // reader resolved BEFORE the compaction keeps its version's files
    val before = ManifestTable.read(spark, root)
    ManifestTable.compact(spark, root, Seq("id"))
    // old version still fully present (no vacuum yet): the pre-compaction
    // plan still executes — the property Ingest.compact cannot give
    assert(before.count() == 1000)
    assert(ManifestTable.read(spark, root).count() == 500)
  }

  test("two writer JVMs racing commitWithRetry produce a linear version chain, no lost commits") {
    // real process boundaries (round-4 item 6): the latch's O_EXCL
    // createNewFile is only proven multi-writer-safe by crossing JVMs —
    // in-process races share one filesystem view and can't catch a
    // broken CAS
    val root = tempDir("graft-manifest-mproc")
    val perWriter = 4
    val javaBin = sys.props("java.home") + "/bin/java"
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .sliding(2).collect { case Array("--add-opens", v) => Seq("--add-opens", v) }
      .flatten.toSeq
    def launch(id: String) = new ProcessBuilder(
      (Seq(javaBin, "-Xmx1g", "-cp", sys.props("java.class.path")) ++ addOpens ++
        Seq("graft.tools.ManifestStress", root, id, perWriter.toString)): _*)
      .inheritIO().start()
    val (p1, p2) = (launch("w1"), launch("w2"))
    assert(p1.waitFor() == 0, "writer 1 JVM failed")
    assert(p2.waitFor() == 0, "writer 2 JVM failed")

    // linear chain: versions 0..2n-1, each version's file set a strict
    // superset of its parent's (append-only history, no forks)
    val head = ManifestTable.currentVersion(spark, root).get
    assert(head == 2L * perWriter - 1, s"expected ${2 * perWriter} commits, head=$head")
    (0L to head).sliding(2).foreach { case Seq(a, b) =>
      val (fa, fb) = (ManifestTable.files(spark, root, a).toSet,
        ManifestTable.files(spark, root, b).toSet)
      assert(fa.subsetOf(fb) && fb.size > fa.size,
        s"version $b is not an append descendant of $a")
    case _ => ()
    }
    // no lost or duplicated commit: exactly one row per (writer, i)
    val rows = ManifestTable.read(spark, root)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows.size == 2 * perWriter, s"row count ${rows.size}")
    assert(rows.toSet == (for (w <- Set("w1", "w2"); i <- 0 until perWriter) yield (w, i)),
      s"commit set mismatch: $rows")
  }
}
