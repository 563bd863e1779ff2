package graft.pipeline

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Derived physical layouts of the corpus tables, materialized once per
  * (corpus dir, machine) into the JVM temp dir and read back as ordinary
  * parquet tables. These exist to PROVE layout-dependent plan behavior —
  * partition pruning needs an actually-partitioned table on disk, which
  * the flat driver corpus (TESTDATA.md) doesn't provide.
  *
  * Scale note: in production this materialization IS the ingest path
  * (`Ingest.appendPartitioned` on every slice, reference
  * `export_blocks_and_events_dag.py:56-57` landing hourly slices); here
  * it runs lazily so the registered query stays a pure
  * `(spark, sfDir) => DataFrame` function of the corpus.
  */
object Derived {

  /** `events` re-laid out hive-partitioned by `event_date` (the SURVEY §4
    * layout): calendar predicates prune whole date directories at
    * planning time instead of scanning the fact history — at 100 TB the
    * difference between reading a week and reading two years. Written
    * via [[Ingest.appendPartitioned]] (so the fixture exercises the real
    * ingest writer); `_SUCCESS` marks a complete materialization, a
    * half-written dir (crashed prior run) is deleted and rewritten.
    */
  def eventsByDate(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = new File(derivedRoot(sfDir), "events_by_date")
    this.synchronized {
      // Cross-PROCESS exclusion on top of the JVM-local synchronized:
      // parallel test JVMs (and concurrent driver runs) may race the
      // first build after a corpus refresh, and a half-written fixture
      // read by the other process fails or silently under-counts. An
      // OS-level advisory lock on a sibling lockfile serializes builds;
      // the post-acquire re-check makes the losers find the winner's
      // _SUCCESS and skip their own rebuild.
      val root = derivedRoot(sfDir)
      root.mkdirs()
      val lockCh = java.nio.channels.FileChannel.open(
        new File(root, "events_by_date.lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock = lockCh.lock()
      try {
        // stale-fixture guard: a cached copy older than the source corpus
        // (regenerated test data) would silently diverge from the oracle's
        // flat events table — rebuild whenever the source is newer
        val success = new File(dir, "_SUCCESS")
        val srcMtime = latestMtime(new File(s"$sfDir/events.parquet"))
        if (!success.exists() || success.lastModified() < srcMtime) {
          deleteRecursively(dir)
          Ingest.appendPartitioned(
            Tables.events(spark, sfDir).withColumn("event_date", to_date(col("ts"))),
            dir.toString, seq = 1L, partitionCols = Seq("event_date"))
        }
      } finally {
        lock.release()
        lockCh.close()
      }
    }
    spark.read.parquet(dir.toString)
  }

  private def latestMtime(f: File): Long =
    // listFiles is null on I/O error or concurrent removal (the
    // synchronized block above is JVM-local) — treat as empty, not NPE
    if (f.isDirectory)
      (f.lastModified() +:
        Option(f.listFiles()).getOrElse(Array.empty).map(latestMtime).toSeq).max
    else f.lastModified()

  /** Per-corpus scratch root, keyed by the corpus path so sf0.01 and
    * sf0.1 fixtures never collide.
    */
  private def derivedRoot(sfDir: String): File =
    new File(sys.props("java.io.tmpdir"),
      "graft-derived-" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(sfDir).toLong & 0xffffffffL))

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }
}
