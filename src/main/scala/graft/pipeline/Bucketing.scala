package graft.pipeline

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) table layout — the co-located-join tool for
  * repeatedly-joined fact tables (SURVEY §7.1 scale posture). Writing
  * both sides bucketed by the join key into the session catalog lets
  * Catalyst plan the join with ZERO shuffle exchanges: each bucket pair
  * joins in place. At 100 TB this converts the dominant recurring cost
  * (re-shuffling the same fact table every run) into a one-time layout
  * decision, exactly like ClickHouse's ORDER BY-key clustering.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Count shuffle exchanges in a plan — 0 for a co-located join.
    * SEES THROUGH AQE (round-15 self-review): `AdaptiveSparkPlanExec`
    * is a LEAF node, so the naive collect over `executedPlan` returned
    * 0 for ANY plan whenever adaptive execution was enabled — which is
    * the Verify/Bench default, making the x143-class hash-pinned
    * exchange counts vacuous (AqeProbe demonstrates: a plainly
    * shuffling aggregate read (AdaptiveSparkPlanExec, 0) with AQE on
    * and (WholeStageCodegenExec, 1) with it off). The fix recurses into
    * the wrapper's `inputPlan` — the initial physical plan AFTER
    * EnsureRequirements placed every exchange. That is the
    * CONSERVATIVE side for a zero-exchange gate: AQE's runtime
    * re-planning can only remove exchanges (e.g. SMJ→BHJ), never add
    * one, so inputPlan=0 implies final=0, while a plan that shuffles
    * reads its true count whether or not AQE wraps it.
    *
    * Two AQE-internal wrinkles make the naive recursion read 0 anyway
    * (AqeProbe pinned both): the wrapper's `inputPlan` field is the
    * plan BEFORE EnsureRequirements (no exchanges placed yet), so the
    * recursion targets its `executedPlan` — initially the
    * exchange-ensured initial plan, later the evolving adaptive one —
    * and in an already-executed adaptive plan every materialized
    * shuffle appears as a `ShuffleQueryStageExec` LEAF (its exchange
    * hidden under `.plan`), so query stages recurse too.
    */
  def countExchanges(df: DataFrame): Int = {
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          count(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          count(q.plan)
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
      }.sum
    count(df.queryExecution.executedPlan)
  }

  // ---- bucketed VERSIONED-LOG layout (round-14, r13 verdict item 5) ------
  // Every `resolvedRows` read joins the full data log against the
  // version log's per-id max-seq aggregate — on flat parquet dirs that
  // is two shuffles (agg + join) scanning every file group of both
  // logs, which at 100 TB is the dominant recurring cost of every
  // standing-index read. Writing BOTH logs as tables bucketed by the id
  // column ([[graft.pipeline.Ingest.appendBucketedWithSeq]] — its
  // repartition caps each append at `buckets` files) removes all of it:
  // the bucketed scan reports HashPartitioning(id), so the max-seq
  // aggregate needs no exchange, the doc-keyed join co-partitions
  // bucket-to-bucket, and a single-doc probe (the x117-class per-doc
  // read) prunes to one bucket per log (SelectedBucketsCount in the
  // scan). Stamped appends keep the landed-seq replay contract.

  /** Heal the [[rewriteBucketed]] crash window BEFORE any liveness
    * decision is taken on the table name (round-15, the r14 ADVICE
    * medium): a crash between DROP TABLE and RENAME leaves the live
    * name dangling while `<table>_compact_tmp` holds the sole complete
    * copy. Without this, a restarted stream's [[landedSeqBucketed]]
    * reads the missing table as "nothing landed" and
    * [[graft.pipeline.Ingest.appendBucketedWithSeq]] silently RECREATES
    * the table containing only the replayed batch, while
    * [[maybeCompactVersionedBucketed]]'s exists-gate skips — the full
    * log in the tmp table is orphaned and all prior history is lost.
    * Completing the rename first makes every downstream guard see the
    * true state. Returns whether it healed (idempotent: a healthy or
    * never-created table is a no-op).
    */
  def healBucketedSwap(spark: SparkSession, table: String): Boolean = {
    val tmp = table + "_compact_tmp"
    val dangling = !spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp)
    if (dangling) spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    dangling
  }

  /** Table location on the filesystem (managed tables move their dir on
    * RENAME, so this is always read fresh, never cached).
    */
  private[graft] def tableLocation(spark: SparkSession, table: String): Path =
    new Path(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).location)

  private[graft] def tableFs(spark: SparkSession, loc: Path) =
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- landed markers (round-16): exactly-once under partial publish ----
  // Both append paths publish a batch as a non-atomic multi-file rename
  // sequence, and the row-based landed check read a PARTIAL batch as
  // landed — a driver crash mid-publish silently lost the batch's
  // remaining rows on replay. The marker protocol closes it: a batch is
  // landed iff the table's landed marker (an empty `_graft_landed_<seq>`
  // file inside the table dir — underscore names are invisible to the
  // reader's file listing) has reached its seq, and the marker is
  // written strictly AFTER the batch's files. Batches land in order
  // (the streaming loops are serial per table), so one MAX marker per
  // table suffices — `advanceLandedMarker` deletes lower ones. A crash
  // anywhere before the marker write leaves seq > marker, and the
  // replay's scrub (`Ingest.directBucketAppend` deletes this seq's
  // tagged partial files before re-publishing) makes the re-append
  // exact, not additive.

  /** Path-based marker core (round-16 optimization round: the FLAT
    * stamped logs adopt the same protocol — see
    * [[graft.pipeline.Ingest.appendWithSeq]] — so the helpers take a
    * location, and the table forms below resolve the location first).
    */
  private[graft] def landedMarkerSeqAt(fs: org.apache.hadoop.fs.FileSystem,
      loc: Path): Option[Long] =
    Option(fs.globStatus(new Path(loc, "_graft_landed_*")))
      .getOrElse(Array.empty)
      .flatMap(s => s.getPath.getName.stripPrefix("_graft_landed_").toLongOption)
      .reduceOption(_ max _)

  private[graft] def advanceLandedMarkerAt(fs: org.apache.hadoop.fs.FileSystem,
      loc: Path, seq: Long): Unit = {
    fs.create(new Path(loc, s"_graft_landed_$seq"), true).close()
    Option(fs.globStatus(new Path(loc, "_graft_landed_*")))
      .getOrElse(Array.empty)
      .filter(_.getPath.getName.stripPrefix("_graft_landed_")
        .toLongOption.exists(_ < seq))
      .foreach(s => fs.delete(s.getPath, false))
  }

  private[graft] def landedMarkerSeq(spark: SparkSession, table: String): Option[Long] = {
    val loc = tableLocation(spark, table)
    landedMarkerSeqAt(tableFs(spark, loc), loc)
  }

  private[graft] def advanceLandedMarker(spark: SparkSession, table: String, seq: Long): Unit = {
    val loc = tableLocation(spark, table)
    advanceLandedMarkerAt(tableFs(spark, loc), loc, seq)
  }

  /** Copy the landed marker into a sibling dir (the compaction rewrite's
    * tmp table) so the replay guard survives the swap.
    */
  private[graft] def copyLandedMarker(spark: SparkSession, fromTable: String,
      toTable: String): Unit = {
    val from = tableLocation(spark, fromTable)
    val to = tableLocation(spark, toTable)
    val fs = tableFs(spark, from)
    Option(fs.globStatus(new Path(from, "_graft_landed_*")))
      .getOrElse(Array.empty)
      .foreach(s => fs.create(new Path(to, s.getPath.getName), true).close())
  }

  /** The landed-seq replay guard over a bucketed log table (the
    * [[graft.pipeline.Ingest.appendBucketedWithSeq]] writer keeps the
    * same stamp column as the flat logs). Heals the [[rewriteBucketed]]
    * crash window first — a dangling name must read as its tmp-side
    * history, not as an empty log (see [[healBucketedSwap]]).
    *
    * Marker-first (round-16): when the table carries a landed marker,
    * "landed" is `marker >= seq` — strictly stronger than the row probe,
    * because a crashed PARTIAL publish has rows with this stamp but no
    * marker (the row probe would skip the replay and silently lose the
    * batch's missing rows). The row probe remains only as the fallback
    * for marker-less tables (pre-round-16 layouts).
    */
  def landedSeqBucketed(spark: SparkSession, table: String, seq: Long): Boolean = {
    healBucketedSwap(spark, table)
    spark.catalog.tableExists(table) && {
      landedMarkerSeq(spark, table) match {
        case Some(m) => m >= seq
        case None => spark.table(table)
          .filter(org.apache.spark.sql.functions.col("ingest_seq") === seq)
          .limit(1).count() > 0
      }
    }
  }

  /** In-place bucketed rewrite keeping only `survivors` — the
    * tmp-table/rename dance of
    * [[graft.pipeline.Ingest.compactBucketed]] generalized to a
    * caller-supplied survivor frame (versioned data logs are NOT
    * last-write-wins per key: postings keep many rows per doc, so the
    * survivor set is "rows stamped with the id's live seq", not "one
    * row per id"). Same crash window and recovery: between DROP and
    * RENAME the name dangles; a re-run that finds the live name gone
    * but the tmp present completes the rename instead of dropping the
    * sole surviving copy.
    */
  def rewriteBucketed(spark: SparkSession, table: String,
      survivors: DataFrame, bucketCol: String, buckets: Int): Unit = {
    val tmp = table + "_compact_tmp"
    val cat = spark.catalog
    if (!cat.tableExists(table)) {
      if (cat.tableExists(tmp)) { spark.sql(s"ALTER TABLE $tmp RENAME TO $table"); return }
      sys.error(s"rewriteBucketed: neither $table nor $tmp exists")
    }
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    survivors.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol).saveAsTable(tmp)
    // the landed marker must survive the swap (round-16): markers ride
    // inside the table dir, and losing one would degrade the replay
    // guard back to the row probe exactly when compaction re-stamped
    // nothing (copy BEFORE the drop — a crash in the swap window then
    // heals into a marker-carrying table either way)
    copyLandedMarker(spark, table, tmp)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** The automatic cadence over [[compactVersionedBucketed]] — the
    * [[graft.streaming.StreamingIngest.maybeCompactVersioned]] gate on
    * the table layout: when EITHER table holds more than `maxFiles`
    * data files (the version log fragments on deletion-heavy workloads
    * while the data log stays small — the round-12 lesson applies
    * verbatim), rewrite the pair. Returns whether it compacted.
    */
  def maybeCompactVersionedBucketed(spark: SparkSession, dataTable: String,
      versionsTable: String, idCol: String, buckets: Int,
      maxFiles: Int = 64): Boolean = {
    // a dangling name from a crashed rewrite must heal before the
    // exists-gates read it as "no table" (r14 ADVICE — the skip would
    // orphan the tmp-side history)
    healBucketedSwap(spark, dataTable)
    healBucketedSwap(spark, versionsTable)
    val fragmented = spark.catalog.tableExists(versionsTable) &&
      spark.catalog.tableExists(dataTable) &&
      (spark.table(dataTable).inputFiles.length > maxFiles ||
        spark.table(versionsTable).inputFiles.length > maxFiles)
    if (fragmented)
      compactVersionedBucketed(spark, dataTable, versionsTable, idCol, buckets)
    fragmented
  }

  /** Compaction for a bucketed versioned log pair — the
    * [[graft.streaming.StreamingIngest.maybeCompactVersioned]] move on
    * the table layout: the data log keeps live-version rows (original
    * stamps), the version log shrinks to one max-seq row per id. Both
    * rewrites ride the buckets (no exchange) and the pair stays
    * resolvable between the two swaps in either order, because
    * resolution only compares data stamps against the version log's
    * per-id max, which both rewrites preserve.
    */
  def compactVersionedBucketed(spark: SparkSession, dataTable: String,
      versionsTable: String, idCol: String, buckets: Int): Unit = {
    import org.apache.spark.sql.functions.{col, max}
    val latest = spark.table(versionsTable)
      .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
      .localCheckpoint(false) // survives both table swaps
    rewriteBucketed(spark, dataTable,
      spark.table(dataTable).join(latest, Seq(idCol))
        .filter(col("ingest_seq") - col("__vmax") === 0).drop("__vmax")
        .localCheckpoint(false),
      idCol, buckets)
    rewriteBucketed(spark, versionsTable,
      latest.select(col(idCol), col("__vmax").as("ingest_seq")),
      idCol, buckets)
  }

  // ---- bucketed FLOOR compaction + as-of (round-15, r14 verdict item 4)
  // x141 proved history-preserving compaction on the flat logs and x143
  // proved the shuffle-free bucketed resolve; composing them lets ONE
  // log layout hold both properties a 100 TB doc store needs — a
  // serving read with zero exchanges AND reproducible as-of snapshots
  // at any seq >= the recorded floor. The floor marker is itself a
  // (1-row, 1-bucket) catalog table swapped through the same crash-safe
  // tmp/rename dance as the logs, marker-FIRST like the flat twin: a
  // crash before the swaps refuses below-floor reads that were still
  // answerable (lost capability, never a wrong answer).

  private def asOfFloorTable(versionsTable: String): String =
    versionsTable + "_asof_floor"

  /** The recorded history floor of a bucketed versioned log pair —
    * the [[graft.streaming.StreamingIngest.asOfFloorSeq]] contract on
    * the table layout. Long.MinValue when no floor compaction ever ran.
    */
  def asOfFloorSeqBucketed(spark: SparkSession, versionsTable: String): Long = {
    import org.apache.spark.sql.functions.{col, max}
    val t = asOfFloorTable(versionsTable)
    healBucketedSwap(spark, t)
    if (spark.catalog.tableExists(t))
      spark.table(t).agg(max(col("floor_seq"))).head().getLong(0)
    else Long.MinValue
  }

  /** HISTORY-PRESERVING compaction for a bucketed versioned log pair —
    * [[graft.streaming.StreamingIngest.compactVersionedKeepAfter]] on
    * the table layout: versions stamped <= `floorSeq` collapse to each
    * id's at-or-below-floor survivor rows, versions above the floor are
    * retained VERBATIM, and the marker records the highest floor applied
    * (floors only rise). Both log rewrites ride the buckets (the fold's
    * max-seq aggregate and id-join need no exchange) and swap through
    * [[rewriteBucketed]], crash-safe in either order for the same
    * reason as the flat twin: as-of resolution at S >= floor only
    * compares data stamps against the version log's capped per-id max,
    * which both partial states preserve.
    */
  def compactVersionedBucketedKeepAfter(spark: SparkSession, dataTable: String,
      versionsTable: String, idCol: String, buckets: Int, floorSeq: Long): Unit = {
    import org.apache.spark.sql.functions.{col, max}
    import spark.implicits._
    healBucketedSwap(spark, dataTable)
    healBucketedSwap(spark, versionsTable)
    // marker FIRST (the x141 rationale — fails in the safe direction)
    val floorTable = asOfFloorTable(versionsTable)
    val marker = Seq(math.max(floorSeq, asOfFloorSeqBucketed(spark, versionsTable)))
      .toDF("floor_seq")
    if (spark.catalog.tableExists(floorTable))
      rewriteBucketed(spark, floorTable, marker, "floor_seq", 1)
    else marker.write.mode("overwrite")
      .bucketBy(1, "floor_seq").sortBy("floor_seq").saveAsTable(floorTable)
    val versions = spark.table(versionsTable).localCheckpoint(false)
    val below = versions.filter(col("ingest_seq") <= floorSeq)
      .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
      .localCheckpoint(false) // both rewrites read it across the swaps
    val data = spark.table(dataTable).localCheckpoint(false)
    rewriteBucketed(spark, dataTable,
      data.filter(col("ingest_seq") > floorSeq)
        .unionByName(data.join(below, Seq(idCol))
          .filter(col("ingest_seq") - col("__vmax") === 0).drop("__vmax")),
      idCol, buckets)
    rewriteBucketed(spark, versionsTable,
      versions.filter(col("ingest_seq") > floorSeq)
        .unionByName(below.select(col(idCol), col("__vmax").as("ingest_seq"))),
      idCol, buckets)
  }

  /** AS-OF resolution of a bucketed versioned log pair — row-identical
    * to [[graft.streaming.StreamingIngest.resolvedRowsAsOf]], planned
    * with ZERO shuffle exchanges: the seq caps are non-key predicates,
    * so the capped max-seq aggregate and the id-keyed join both ride the
    * bucket partitioning (the data-side cap is a strict optimization —
    * a data row above the cap can never match a capped __vmax).
    */
  def resolvedBucketedAsOf(spark: SparkSession, dataTable: String,
      versionsTable: String, idCol: String, asOfSeq: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, max}
    healBucketedSwap(spark, dataTable)
    healBucketedSwap(spark, versionsTable)
    val latest = spark.table(versionsTable)
      .filter(col("ingest_seq") <= asOfSeq)
      .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
    spark.table(dataTable)
      .filter(col("ingest_seq") <= asOfSeq)
      .join(latest, Seq(idCol))
      .filter(col("ingest_seq") - col("__vmax") === 0)
      .drop("__vmax", "ingest_seq")
  }

  /** [[resolvedBucketedAsOf]] with the x141 floor contract enforced:
    * an as-of below the recorded floor fails BY NAME instead of
    * silently losing every id updated or deleted between it and the
    * floor.
    */
  def resolvedBucketedAsOfChecked(spark: SparkSession, dataTable: String,
      versionsTable: String, idCol: String, asOfSeq: Long): DataFrame = {
    val floor = asOfFloorSeqBucketed(spark, versionsTable)
    require(asOfSeq >= floor,
      s"as-of $asOfSeq is below the recorded compaction floor $floor: " +
        "history at or below the floor was folded away " +
        "(compactVersionedBucketedKeepAfter contract — re-ingest or raise the as-of)")
    resolvedBucketedAsOf(spark, dataTable, versionsTable, idCol, asOfSeq)
  }

  /** Live rows of a bucketed versioned log pair — row-identical to the
    * flat [[graft.streaming.StreamingIngest]] resolve, planned with
    * ZERO shuffle exchanges (BucketingSpec locks both).
    */
  def resolvedBucketed(spark: SparkSession, dataTable: String,
      versionsTable: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, max}
    healBucketedSwap(spark, dataTable)
    healBucketedSwap(spark, versionsTable)
    val latest = spark.table(versionsTable)
      .groupBy(col(idCol)).agg(max(col("ingest_seq")).as("__vmax"))
    spark.table(dataTable)
      .join(latest, Seq(idCol))
      // `seq - vmax === 0`, NOT `seq === vmax`: a bare cross-side
      // equality is extracted into the equi-join KEYS, and with
      // requireAllClusterKeysForCoPartition (default true) a join keyed
      // on (id, seq) refuses the buckets' id-only partitioning — both
      // sides re-shuffle and the layout buys nothing. The subtraction
      // form stays a post-match condition, the join keys stay [idCol],
      // and the plan keeps zero exchanges (BucketingSpec locks it).
      .filter(col("ingest_seq") - col("__vmax") === 0)
      .drop("__vmax", "ingest_seq")
  }
}
