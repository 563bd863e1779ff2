package graft.pipeline

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental ingest semantics of the reference's hourly DAG
  * (SURVEY §2.10, export_blocks_and_events_dag.py):
  *
  *   - watermark = max(offset in sink) + 1, defaulting to an origin on an
  *     empty sink (`:30-37`); upper bound = head − 1 (`:39`);
  *   - work planned in fixed-size slices (`:56-57`, 10k blocks);
  *   - appends stamped with a monotonic `ingest_seq` (ClickHouse gets
  *     insert order implicitly; Parquet needs it explicit — SURVEY §7.4);
  *   - at-least-once delivery tolerated, collapsed by keyed
  *     last-write-wins compaction (= ReplacingMergeTree + OPTIMIZE FINAL).
  *
  * Scale posture: the watermark is the only driver-side scalar; appends
  * are partitioned writes; compaction shuffles once on the key.
  */
object Ingest {

  final case class BlockRange(from: Long, to: Long)

  val DefaultOrigin: Long = 1000000L

  /** Next range to ingest: `[max(sink)+1, head-1]`, origin on empty sink;
    * None when the sink is already caught up.
    */
  def nextRange(sinkMax: Option[Long], head: Long, origin: Long = DefaultOrigin): Option[BlockRange] = {
    val from = sinkMax.map(_ + 1).getOrElse(origin)
    val to = head - 1
    if (from > to) None else Some(BlockRange(from, to))
  }

  /** Driver-side watermark scalar from the landed table (O-16). */
  def sinkMax(df: DataFrame, offsetCol: String): Option[Long] = {
    val row = df.agg(max(col(offsetCol)).cast("long")).first()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  /** Fixed-size slice plan over a range (10k-block batching shape). */
  def slices(r: BlockRange, size: Long): Seq[BlockRange] =
    (r.from to r.to by size).map(s => BlockRange(s, math.min(s + size - 1, r.to)))

  /** Run `f` under a thread-local Spark job description (optimization
    * guide §1.5): the streaming lifecycle queries spend their wall in
    * dozens of tiny per-batch jobs that all inherit the stream's START
    * callsite, so without labels neither the UI nor the JobProfile tool
    * can attribute a batch's cost to its phases (probe vs append vs
    * compaction). Restores the previous description so nested labels
    * compose.
    */
  private[graft] def withJobDesc[T](spark: SparkSession, desc: String)(f: => T): T = {
    val sc = spark.sparkContext
    val old = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try f finally sc.setJobDescription(old)
  }

  /** Append a batch stamped with its ingest sequence (K-1/K-2 append).
    *
    * Round-16 optimization round: the flat stamped logs adopt the
    * bucketed path's marker protocol ([[directBucketAppend]]'s rationale
    * verbatim). Motivation is twofold:
    *
    *   - SPEED (optimization guide §1/§5 — no driver-side Spark jobs for
    *     bookkeeping): the streaming loops' landed-seq replay guard was a
    *     per-batch `read.parquet(dir).filter(seq).limit(1).count()` —
    *     one full Spark job plus schema inference and footer reads per
    *     batch PER LOG, paid on the happy path forever (JobProfile:
    *     x142 ran 33 such probe jobs per build). With the marker the
    *     guard is one filesystem glob.
    *   - CORRECTNESS (ROADMAP known limit, now closed): `mode("append")`
    *     published through the commit protocol's multi-file rename, and
    *     the row-based landed probe read a PARTIAL batch as landed — a
    *     driver crash mid-commit silently lost the batch's remaining
    *     rows on replay. Here every published file carries its seq in
    *     the name (`-s<seq>-` tag), the `_graft_landed_<seq>` marker is
    *     written strictly AFTER the last file, and a replay of an
    *     unlanded seq first SCRUBS its tagged partial files — the
    *     replay is exact, never additive and never lossy.
    *
    * Layout compatibility: tags ride the file NAME only; marker and
    * dot-staging names are invisible to parquet readers, so every
    * existing reader of these dirs is unaffected. The marker encodes the
    * MAX landed seq (appends to one log are serial with non-decreasing
    * seqs by the streaming-loop contract — the bucketed protocol's
    * assumption, shared here); marker-less dirs (pre-round-16 layouts)
    * keep the row-probe fallback in the guard.
    */
  def appendWithSeq(df: DataFrame, path: String, seq: Long): Unit =
    withJobDesc(df.sparkSession, s"graft:append-flat s$seq") {
      val spark = df.sparkSession
      val loc = new Path(path)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(loc)
      // sweep THIS seq's staging leftovers and scrub its partial publish
      // (a crashed prior attempt); same-seq-only globs keep concurrent
      // different-seq appenders (none today by contract) unharmed
      fs.globStatus(new Path(loc, s".graft-append-s$seq-*")) match {
        case null => ()
        case stale => stale.foreach(s => fs.delete(s.getPath, true))
      }
      fs.globStatus(new Path(loc, s"part-*-s$seq-*")) match {
        case null => ()
        case partial => partial.foreach(s => fs.delete(s.getPath, false))
      }
      val staging = new Path(loc, s".graft-append-s$seq-${java.util.UUID.randomUUID()}")
      df.withColumn("ingest_seq", lit(seq))
        .write.mode("overwrite").parquet(staging.toString)
      fs.listStatus(staging).map(_.getPath)
        .filter(_.getName.startsWith("part-")).foreach { p =>
          // part-00000-<uuid>-c000.snappy.parquet ->
          // part-00000-s<seq>-<uuid>-c000.snappy.parquet (the `-s<seq>-`
          // tag is what the scrub globs; `-s1-` can never match `-s12-`).
          // Insert after the task index, not at a fixed offset — the
          // index widens past 5 digits on very wide writes.
          val name = p.getName
          val cut = name.indexOf('-', "part-".length)
          fs.rename(p, new Path(loc, name.patch(cut, s"-s$seq", 0)))
        }
      fs.delete(staging, true)
      // marker LAST: everything before this line is invisible or scrubbable
      Bucketing.advanceLandedMarkerAt(fs, loc, seq)
    }

  /** Same, hive-partitioned by derived columns (e.g. a date column off
    * the block timestamp). At 100 TB this is what makes the reports'
    * time-range predicates partition-prune instead of scanning the full
    * fact history (SURVEY §4 partition pruning).
    */
  def appendPartitioned(df: DataFrame, path: String, seq: Long, partitionCols: Seq[String]): Unit =
    df.withColumn("ingest_seq", lit(seq))
      .write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** Append clustered by `sortCols` within each output file: parquet
    * row-group min/max stats then let point/range predicates on those
    * columns skip row groups entirely (the ClickHouse ORDER-BY-key
    * read-pruning effect, without a custom format).
    */
  def appendSorted(df: DataFrame, path: String, seq: Long, sortCols: Seq[String]): Unit =
    df.withColumn("ingest_seq", lit(seq))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("append").parquet(path)

  /** Append a micro-batch into a hash-BUCKETED managed table (same
    * bucket count and column every call), stamped with `ingest_seq` and
    * sorted by the key within each file. The layout is the full
    * ClickHouse ReplacingMergeTree analog: hash clustering plays ORDER
    * BY-key placement, the within-file sort gives row-group min/max
    * pruning, and — the scale win — every row for a given key lands in
    * the SAME bucket across every appended batch, so keyed dedup and
    * compaction become bucket-local: Catalyst sees the scan's
    * HashPartitioning(bucket key) already satisfies the aggregation's
    * required distribution and plans ZERO shuffle exchanges
    * (BucketingSpec proves it). A plain-path append table re-shuffles
    * the whole history on every compaction instead — the dominant
    * recurring cost of an append-mostly fact table at 100 TB
    * (SCALING.md's ×100 q19 measurement: dedup cost is linear in
    * shuffled bytes).
    */
  def appendBucketedWithSeq(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, seq: Long): Unit = {
    // repartition on the bucket column first: a bucketed write emits one
    // file per (task, bucket-with-data) pair, so an unpartitioned P-task
    // micro-batch appends up to P×buckets files per call and the table
    // fragments until compaction. Hash-partitioning to `buckets` tasks
    // (the same murmur3-pmod placement bucketBy uses) caps each append
    // at exactly `buckets` files for the price of shuffling one
    // micro-batch — the batch, not the table history (round-4 review).
    val stamped = df.withColumn("ingest_seq", lit(seq))
    if (!directBucketAppend(stamped, table, bucketCol, buckets, seq)) {
      withJobDesc(df.sparkSession, s"graft:append-bucketed-catalog $table s$seq") {
        stamped
          .repartition(buckets, col(bucketCol))
          .write.mode("append")
          .bucketBy(buckets, bucketCol).sortBy(bucketCol)
          .saveAsTable(table)
      }
      // catalog-path appends advance the marker too, so every table
      // born through this function is marker-guarded from batch one
      Bucketing.advanceLandedMarker(df.sparkSession, table, seq)
    }
  }

  /** The DIRECT bucket-file commit path for an append into an EXISTING
    * bucketed table (round-16, r15 verdict item 1): the catalog insert
    * command (`saveAsTable` append) pays command planning, bucket-spec
    * revalidation, and a staged commit-protocol publish on every call —
    * at micro-batch sizes that fixed cost was the attributed ~1.4-1.6×
    * sf0.1 floor on every migrated index family (ProfileAppendFloor:
    * the catalog round-trip is ~40% of a tiny append's wall). This
    * path writes the SAME shuffled batch as plain parquet into a
    * dot-prefixed staging dir INSIDE the table location (invisible to
    * readers — `InMemoryFileIndex` prunes leading-dot names; same-FS by
    * construction so the publish renames never copy, which matters on
    * HDFS and is the difference between rename and object-copy on S3),
    * then renames each staging file into the table dir with the
    * bucket-suffixed name the bucketed reader parses, and refreshes the
    * table's file listing.
    *
    * CORRECTNESS invariant — placement must equal `bucketBy`'s:
    * `repartition(buckets, col)` places a row in partition
    * `pmod(murmur3(col), buckets)`, the exact `partitionIdExpression`
    * bucketing uses, so staging partition index == bucket id and the
    * bucket-pruned point probe (SelectedBucketsCount) stays correct
    * (BucketingSpec pins a direct-path probe against a full scan).
    *
    * Exactly-once under a crashed publish (round-16): the publish is a
    * non-atomic multi-file rename sequence (as is the commit protocol's
    * own job commit in the `saveAsTable` path), so a crash mid-publish
    * leaves a PARTIAL stamped batch visible. The marker protocol
    * ([[Bucketing.landedSeqBucketed]]) reads that state as NOT landed
    * (the marker is written strictly after the last file), and the
    * replay's first move here is the SCRUB: every published file
    * carries its seq in the name (`-s<seq>` tag), so the crashed
    * attempt's partial files are deleted by glob before the re-publish
    * — the replay is exact, never additive. A crash before any rename
    * leaves only the dot-staging dir, which readers never see and the
    * next append sweeps.
    *
    * Falls back (returns false) when the table does not exist (the
    * catalog round-trip is what CREATES the schema + bucket spec) or
    * when the table's bucket spec / column layout does not match the
    * caller's — drift must surface through the catalog path's named
    * errors, not land as silently misplaced files.
    */
  private def directBucketAppend(stamped: DataFrame, table: String,
      bucketCol: String, buckets: Int, seq: Long): Boolean = {
    val spark = stamped.sparkSession
    if (!spark.catalog.tableExists(table)) return false
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val specOk = meta.bucketSpec.exists(bs =>
      bs.numBuckets == buckets && bs.bucketColumnNames == Seq(bucketCol))
    val schemaOk = meta.schema.fieldNames.toSeq == stamped.schema.fieldNames.toSeq
    if (!specOk || !schemaOk) return false
    val loc = new Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // sweep staging leftovers from a crashed prior append (appends on
    // one table are serial by the landed-seq loop contract, so any
    // .graft-append-* dir here is dead)
    fs.globStatus(new Path(loc, ".graft-append-*")) match {
      case null => ()
      case stale => stale.foreach(s => fs.delete(s.getPath, true))
    }
    // SCRUB this seq's partial files from a crashed prior publish —
    // reached only when the marker says the seq never landed
    fs.globStatus(new Path(loc, s"part-*-s$seq" + "_*")) match {
      case null => ()
      case partial => partial.foreach(s => fs.delete(s.getPath, false))
    }
    val staging = new Path(loc, s".graft-append-${java.util.UUID.randomUUID()}")
    withJobDesc(spark, s"graft:append-bucketed-direct $table s$seq") {
      stamped
        .repartition(buckets, col(bucketCol))
        .sortWithinPartitions(col(bucketCol))
        .write.mode("overwrite").parquet(staging.toString)
    }
    val uuid = java.util.UUID.randomUUID().toString
    fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.startsWith("part-")).foreach { p =>
      val name = p.getName
      val idx = name.substring(5, 10).toInt
      // keep the staged file's codec extension (".snappy.parquet" at the
      // session default); the trailing `_<idx>` bucket tag is what the
      // bucketed reader parses, the `-s<seq>` tag is what the scrub globs
      val c0 = name.indexOf("-c000")
      val tail = if (c0 >= 0) name.substring(c0 + "-c000".length) else ".parquet"
      fs.rename(p, new Path(loc,
        f"part-$idx%05d-$uuid%s-s$seq%d_$idx%05d.c000$tail"))
    }
    fs.delete(staging, true)
    // marker LAST: everything before this line is invisible-or-scrubbable
    Bucketing.advanceLandedMarker(spark, table, seq)
    spark.catalog.refreshTable(table)
    true
  }

  /** Both logs of a bucketed versioned pair appended CONCURRENTLY —
    * each side is its own landed-seq-guarded [[appendBucketedWithSeq]],
    * submitted from its own thread so the two micro-batch jobs overlap
    * on the scheduler (round-16, r15 verdict item 1: at sf0.1 wave
    * sizes each append underutilizes the session and the serial form
    * pays both fixed costs end-to-end — ProfileAppendFloor measured the
    * concurrent submit alone worth ~2× on the append phase). Replay
    * semantics are unchanged: the guards are per-table, a crash leaves
    * at most one side landed exactly as the serial form could, and a
    * replayed batch re-runs only the side that never landed. Sides are
    * DISTINCT tables by contract (concurrent appends to one table are
    * not serialized here).
    */
  def appendBucketedPairWithSeq(spark: SparkSession,
      sides: Seq[(DataFrame, String)], bucketCol: String, buckets: Int,
      seq: Long): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = sides.map { case (df, table) =>
      val t = new Thread(() =>
        try {
          if (!Bucketing.landedSeqBucketed(spark, table, seq))
            appendBucketedWithSeq(df, table, bucketCol, buckets, seq)
        } catch { case e: Throwable => errs.add(e); () })
      t.setName(s"graft-append-$table-$seq")
      t.start(); t
    }
    ts.foreach(_.join())
    Option(errs.peek()).foreach(throw _)
  }

  /** Shuffle-free compaction of an [[appendBucketedWithSeq]] table:
    * read (bucket-local tasks) → last-write-wins aggregate (no exchange,
    * see above) → rewrite with the same bucket spec (output partitioning
    * already matches, so the write shuffles nothing either), then swap
    * via a catalog rename. Crash window: between DROP and RENAME the
    * table name dangles — same maintenance-under-lock caveat as
    * [[compact]]; [[ManifestTable]] is the gap-free layout. A re-run
    * after a crash in that window RECOVERS instead of destroying the
    * sole surviving copy: when the live name is gone but the tmp table
    * exists, the tmp (a complete compacted rewrite) is renamed into
    * place and the function returns — dropping it first would lose the
    * table outright (round-4 review finding).
    */
  def compactBucketed(spark: SparkSession, table: String, keys: Seq[String],
      bucketCol: String, buckets: Int, seqCol: String = "ingest_seq"): Unit = {
    val tmp = table + "_compact_tmp"
    val cat = spark.catalog
    if (!cat.tableExists(table)) {
      if (cat.tableExists(tmp)) { spark.sql(s"ALTER TABLE $tmp RENAME TO $table"); return }
      sys.error(s"compactBucketed: neither $table nor $tmp exists")
    }
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    Dedup.lastWriteWinsAgg(spark.table(table), keys, Seq(col(seqCol)))
      .write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(tmp)
    // the landed marker survives the swap (Bucketing.rewriteBucketed's
    // round-16 rationale)
    Bucketing.copyLandedMarker(spark, table, tmp)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Compaction = ReplacingMergeTree `OPTIMIZE TABLE FINAL`: rewrite the
    * table keeping the latest row per key (Spark cannot overwrite a path
    * it is reading, hence the scratch-dir dance).
    *
    * The scratch and backup dirs are dot-prefixed SIBLINGS of the table
    * path — never inside it — so partition discovery on a parent table
    * can't mistake them for data. The swap is rename(old→backup),
    * rename(new→live), delete(backup): a crash leaves either the old or
    * the new table plus a recoverable dot-dir, never nothing. (True
    * atomicity needs a table format with a commit log — Delta/Iceberg —
    * or an HDFS-like FS with atomic rename; on object stores treat this
    * as maintenance run under an external lock.)
    */
  def compact(spark: SparkSession, path: String, keys: Seq[String], seqCol: String = "ingest_seq"): Unit = {
    val live = new Path(path)
    val tmp = new Path(live.getParent, "." + live.getName + ".compact-tmp")
    val bak = new Path(live.getParent, "." + live.getName + ".compact-bak")
    Dedup.lastWriteWinsAgg(spark.read.parquet(path), keys, Seq(col(seqCol)))
      .write.mode("overwrite").parquet(tmp.toString)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(bak, true)
    if (!fs.rename(live, bak)) sys.error(s"compact: cannot stage $live -> $bak")
    if (!fs.rename(tmp, live)) {
      fs.rename(bak, live) // restore the old table; nothing was lost
      sys.error(s"compact: cannot publish $tmp -> $live (old table restored)")
    }
    // landed markers ride inside the dir (round-16) — preserve them so a
    // compacted log keeps its glob-cheap replay guard (losing one only
    // degrades the guard to the row probe, but keep the fast path)
    Option(fs.globStatus(new Path(bak, "_graft_landed_*")))
      .getOrElse(Array.empty)
      .foreach(s => fs.create(new Path(live, s.getPath.getName), true).close())
    fs.delete(bak, true)
    // any cached plan for this path now lists deleted files
    graft.sources.Tables.invalidate()
  }

  /** Partition-scoped compaction: rewrite only one hive partition of a
    * table written via [[appendPartitioned]]. At 100 TB compaction must
    * be incremental — recent partitions churn, old ones are immutable —
    * so the full-table [[compact]] is reserved for small dims and this
    * form runs per partition behind the ingest frontier.
    */
  def compactPartition(spark: SparkSession, path: String, keys: Seq[String],
      partCol: String, partValue: String, seqCol: String = "ingest_seq"): Unit =
    compact(spark, s"$path/$partCol=$partValue", keys, seqCol)

  /** Dedup-on-read view of an append table (the cheap alternative when
    * readers can afford the window; compaction amortizes it).
    */
  def latestView(df: DataFrame, keys: Seq[String], seqCol: String = "ingest_seq"): DataFrame =
    Dedup.lastWriteWinsAgg(df, keys, Seq(col(seqCol)))

  /** K-3 truncate-and-replace report publish. Overwrite is momentarily
    * non-atomic for concurrent readers (ReportApi's ReportHandle retries
    * around it); [[publishReportManifested]] is the gap-free flavor.
    */
  def publishReport(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Report publish as a [[ManifestTable]] replace-commit: the new
    * report lands invisibly, one manifest flip makes it current, and a
    * reader mid-request keeps its resolved version. Serve it with
    * `ReportApi.startManifested` (its version-tracking handle re-resolves
    * only when the committed version moves, so publishes are picked up
    * with zero failed requests and no per-GET metadata cost).
    */
  def publishReportManifested(spark: SparkSession, df: DataFrame, path: String): Long =
    ManifestTable.commit(spark, path, df, replace = true)
}
