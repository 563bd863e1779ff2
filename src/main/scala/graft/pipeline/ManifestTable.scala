package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest (commit-log) table layout — the transactional answer to
  * [[Ingest.compact]]'s rename-swap window (ROADMAP item, ADVICE round
  * 1): the table directory accumulates immutable data files plus
  * numbered manifest files, and the CURRENT table state is defined by
  * the highest-numbered complete manifest, never by directory listing.
  *
  *   table/
  *     data/part-<uuid>.parquet      immutable, append-only
  *     manifest/m-00000000000042.json  file list of version 42
  *
  * Commit protocol (object-store safe, no renames on data):
  *   1. write new data files under data/ (invisible to readers — they
  *      only read what a manifest names);
  *   2. write manifest m-{v+1} naming the new complete file set.
  *   A crash between 1 and 2 leaves orphan data files (GC'd later) and
  *   readers still see version v. Readers NEVER observe a missing or
  *   half-swapped table, so compaction needs no reader coordination.
  *
  * Multi-writer commits are serialized per VERSION by a commit latch:
  * `.c-{v}.latch` is created with atomic create-no-overwrite (an
  * O_EXCL `createNewFile` on local filesystems, the namenode-atomic
  * `create(overwrite=false)` on HDFS), and only the latch winner may
  * publish manifest v — losers get [[ConcurrentCommitException]] and
  * retry against the new head ([[ManifestTable.commitWithRetry]]).
  * Plain rename-then-verify is NOT enough: POSIX rename overwrites, so
  * two racers could each verify their own bytes in a window and both
  * report success, silently dropping one commit. On object stores with
  * no atomic create the latch degrades to best-effort and a catalog or
  * lock service is still required — the same rule Delta (DynamoDB
  * LogStore on S3) and Iceberg (catalog) apply.
  *
  * This is the minimal home-grown form of the Delta/Iceberg idea, built
  * only on "a completely-written small file wins" — manifests are
  * written to a temp name and renamed into place, which is atomic on
  * local/HDFS filesystems and on object stores reduces to a small-object
  * PUT.
  */
/** A commit lost the manifest-publication race to a concurrent writer.
  * The table is NOT corrupted — the winner's manifest is complete and
  * this writer's data files are unreferenced orphans (reclaimed by
  * [[ManifestTable.vacuum]]). Schedulers should treat this as retryable:
  * re-read the current version and re-commit.
  */
final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

object ManifestTable {

  private val ManifestDir = "manifest"
  private val DataDir = "data"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long): Path =
    new Path(s"$root/$ManifestDir/m-${"%020d".format(v)}.json")

  /** Highest committed version, or None for an uninitialized table. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val dir = new Path(s"$root/$ManifestDir")
    val f = fs(spark, root)
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("m-") && n.endsWith(".json") =>
        n.stripPrefix("m-").stripSuffix(".json").toLong
      }
    versions.sorted.lastOption
  }

  private def readBytes(f: org.apache.hadoop.fs.FileSystem, p: Path): Array[Byte] = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** File list of a committed version (relative to the table root). */
  def files(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val f = fs(spark, root)
    // one relative path per line — no JSON parser needed on read
    new String(readBytes(f, manifestPath(root, v)), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Read the current table state (throws on an uninitialized table —
    * probe with [[currentVersion]] first). Resolution is
    * manifest-driven — concurrent commits or orphaned data files never
    * affect what this returns.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root)
      .getOrElse(sys.error(s"ManifestTable.read: no committed version under $root"))
    readVersion(spark, root, v)
  }

  /** Time-travel read: the table exactly as of version `v`. Valid while
    * the version's manifest and data files survive [[vacuum]]'s keep
    * window (`keepVersions` back from the head) — the same contract as
    * Delta/Iceberg time travel bounded by their retention. Committed
    * data files are immutable, so a historical version is simply its
    * manifest's file list.
    */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val paths = files(spark, root, v).map(rel => s"$root/$rel")
    spark.read.parquet(paths: _*)
  }

  /** Commit `df` as the NEXT version with file set = previous files ∪
    * newly written ones (append), or = newly written only (replace —
    * the compaction/publish path).
    */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      replace: Boolean): Long =
    commitAgainst(spark, root, df, replace, currentVersion(spark, root))

  /** Commit against an explicitly-read head version — the head observed
    * at read-modify-write start. If another writer published past `prev`
    * in the meantime, this throws [[ConcurrentCommitException]] instead
    * of silently forking history (optimistic concurrency, Delta-style).
    */
  private[graft] def commitAgainst(spark: SparkSession, root: String, df: DataFrame,
      replace: Boolean, prev: Option[Long]): Long = {
    val f = fs(spark, root)
    val batchDir = s"$DataDir/b-${java.util.UUID.randomUUID().toString}"
    df.write.parquet(s"$root/$batchDir")
    val newFiles = f.listStatus(new Path(s"$root/$batchDir"))
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet"))
      .map(n => s"$batchDir/$n").toSeq
    val carried =
      if (replace) Nil
      else prev.map(v => files(spark, root, v)).getOrElse(Nil)
    val next = prev.getOrElse(-1L) + 1L
    val body = (carried ++ newFiles).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8)
    // temp-write + latch + rename: the tmp write keeps a half-written
    // manifest from ever sitting at the published name (a crash mid-write
    // must leave version `next` unpublished, not truncated), and the
    // atomic latch makes exactly one writer the publisher of `next` —
    // rename-then-verify alone cannot do that, because POSIX rename
    // overwrites and both racers can verify their own bytes in a window
    // where each rename "succeeded".
    val dest = manifestPath(root, next)
    f.mkdirs(new Path(s"$root/$ManifestDir"))
    val tmp = new Path(
      s"$root/$ManifestDir/.m-$next.${java.util.UUID.randomUUID().toString}.tmp")
    val out = f.create(tmp, false)
    try out.write(body) finally out.close()
    if (f.exists(dest) || !acquireLatch(f, latchPath(root, next))) {
      f.delete(tmp, false)
      throw new ConcurrentCommitException(
        s"ManifestTable.commit: version $next already committed or being committed " +
          "(concurrent writer) — re-read currentVersion and retry the commit")
    }
    // latch held: no other writer can publish `next`; the rename is ours.
    // Defense-in-depth re-check (round-4 review): vacuum reclaims latches
    // of writers stalled past its age threshold, after which a second
    // writer can legitimately own `next` — a stalled first writer waking
    // up here would silently rename OVER the published manifest (POSIX
    // rename overwrites). Re-verifying our latch still exists immediately
    // before the rename shrinks that undetected window from "any stall
    // longer than vacuum's minAgeMs" to the microseconds between this
    // check and the rename syscall.
    if (!f.exists(latchPath(root, next)) || f.exists(dest)) {
      f.delete(tmp, false)
      throw new ConcurrentCommitException(
        s"ManifestTable.commit: latch for version $next was reclaimed (writer " +
          "presumed dead) and the version may have been re-committed — retry")
    }
    if (!f.rename(tmp, dest))
      sys.error(s"ManifestTable.commit: cannot publish manifest $next")
    next
  }

  private def latchPath(root: String, v: Long): Path =
    new Path(s"$root/$ManifestDir/.c-${"%020d".format(v)}.latch")

  /** Atomic create-no-overwrite: returns true iff THIS caller created the
    * file. `java.io.File.createNewFile` is O_CREAT|O_EXCL on local
    * filesystems (Hadoop's RawLocalFileSystem `create(overwrite=false)`
    * is an exists-then-open TOCTOU, so it cannot be the local-path CAS);
    * on HDFS the namenode makes `create(overwrite=false)` atomic. Object
    * stores without conditional PUT reduce this to best-effort — see the
    * class doc.
    */
  private def acquireLatch(f: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    if (f.getScheme == "file") new java.io.File(p.toUri.getPath).createNewFile()
    else
      try { f.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }

  /** Retry wrapper for multi-writer use: recompute + re-commit on a lost
    * race. `body` receives the current table state (None when
    * uninitialized) and returns the DataFrame to commit, so a retry sees
    * the WINNER's rows instead of replaying a stale read — the
    * read-modify-write loop a catalog-less multi-writer needs.
    */
  def commitWithRetry(spark: SparkSession, root: String,
      body: Option[DataFrame] => (DataFrame, Boolean), maxRetries: Int = 5): Long = {
    var attempt = 0
    while (true) {
      val head = currentVersion(spark, root)
      val current = head.map(_ => read(spark, root))
      val (df, replace) = body(current)
      try return commitAgainst(spark, root, df, replace, head)
      catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Append-commit (ingest path). */
  def append(spark: SparkSession, root: String, df: DataFrame): Long =
    commit(spark, root, df, replace = false)

  /** Replace-commit with last-write-wins dedup — compaction without a
    * reader-visible gap: new compacted files land first, the manifest
    * flip is the only mutation, old files are garbage (collectable once
    * no reader can hold the old version).
    */
  def compact(spark: SparkSession, root: String, keys: Seq[String],
      seqCol: String = "ingest_seq"): Long = {
    val current = read(spark, root)
    val deduped = graft.operators.Dedup.lastWriteWinsAgg(
      current, keys, Seq(org.apache.spark.sql.functions.col(seqCol)))
    commit(spark, root, deduped, replace = true)
  }

  /** Delete batch directories no kept manifest references (crash
    * orphans, compacted-away versions older than `keepVersions`), plus
    * manifests and stale commit temp files outside the keep window.
    *
    * `minAgeMs` is the in-flight-commit guard: a writer mid-commit has
    * landed data that no manifest names YET — deleting it would corrupt
    * the commit it is about to make. Only artifacts older than the age
    * threshold are reclaimed (Delta/Iceberg's retention-window rule);
    * pass 0 only when no writer can be active.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2,
      minAgeMs: Long = 60L * 60 * 1000): Unit = {
    val f = fs(spark, root)
    val vOpt = currentVersion(spark, root)
    if (vOpt.isEmpty) return
    val v = vOpt.get
    val keepFrom = math.max(0L, v - (keepVersions - 1))
    // A version gap inside the keep window (possible when an older
    // manifest was already vacuumed after a replace-commit) contributes
    // no files; but a manifest that EXISTS and fails to read must abort
    // the vacuum — a Try-swallowed transient read error would empty
    // that version's live set and the loop below would DELETE data a
    // kept manifest still references (the round-7 advisory's silent-
    // fallback class, here with destructive stakes).
    val live = (keepFrom to v).flatMap { ver =>
      if (f.exists(manifestPath(root, ver))) files(spark, root, ver) else Nil
    }.toSet
    val liveBatches = live.map(rel => rel.split("/")(1))
    val cutoff = System.currentTimeMillis() - minAgeMs
    val dataRoot = new Path(s"$root/$DataDir")
    if (f.exists(dataRoot)) {
      // batch dirs are commit-atomic units: every file of a batch is
      // referenced by the committing manifest or none is, so reclamation
      // is whole-directory (which also removes _SUCCESS markers and
      // leaves no empty prefixes behind)
      f.listStatus(dataRoot).foreach { batch =>
        if (!liveBatches.contains(batch.getPath.getName) &&
            batch.getModificationTime < cutoff)
          f.delete(batch.getPath, true)
      }
    }
    // drop manifests below the keep window and stale commit temp files —
    // driven by a listing, not a 0-to-keepFrom loop of blind deletes
    f.listStatus(new Path(s"$root/$ManifestDir")).foreach { m =>
      val name = m.getPath.getName
      val staleTmp = name.startsWith(".m-") && name.endsWith(".tmp") &&
        m.getModificationTime < cutoff
      val belowWindow = name.startsWith("m-") && name.endsWith(".json") &&
        name.stripPrefix("m-").stripSuffix(".json").toLong < keepFrom
      // commit latches: below the keep window they are spent bookkeeping;
      // at/above it, an old latch with NO published manifest is an
      // abandoned commit (writer died between latch and rename) that
      // would wedge its version forever — the age threshold is the same
      // live-writer guard as for data files
      val latchVer = if (name.startsWith(".c-") && name.endsWith(".latch"))
        Some(name.stripPrefix(".c-").stripSuffix(".latch").toLong) else None
      val staleLatch = latchVer.exists(ver =>
        ver < keepFrom ||
          (m.getModificationTime < cutoff && !f.exists(manifestPath(root, ver))))
      if (staleTmp || belowWindow || staleLatch) f.delete(m.getPath, false)
    }
  }
}
