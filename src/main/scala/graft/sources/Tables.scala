package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Parquet table loaders for the driver corpus (TESTDATA.md) and explicit
  * schemas for the logical reference tables (SURVEY §1). Schema-on-read
  * from parquet footers for batch; the explicit StructTypes exist for
  * Structured Streaming readers (which require a schema up front) and for
  * documentation of the engine's data model.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  // One analyzed DataFrame per (session, path): `spark.read.parquet`
  // re-lists files and re-reads footers on every call, which across a
  // 50-query bench pass is seconds of pure metadata work. DataFrames are
  // immutable plans, so per-session reuse is safe; the file index inside
  // the cached plan is what we want to keep warm. Sessions are weak keys
  // (identity-compared), so stopped, GC'd sessions evict their entries
  // and no hash-collision can hand one session another's plans;
  // Ingest.compact invalidates after rewriting files.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]())

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    loadImpl(spark, sfDir, name, fanout = false)

  /** [[load]], but fanned out past the row-group parallelism bound when
    * (and only when) that bound actually binds — see
    * [[fanoutIfRowGroupBound]]. Opt-in per consumer: the round-robin
    * shuffle costs a whole extra stage, which A/B measurement showed is
    * a net LOSS for every scan whose downstream work is I/O- or
    * shuffle-dominated (blanket fanout regressed the 67-query bench
    * 37 s → 62 s), and a multiple-of-wall win only where a genuinely
    * expensive per-row kernel sits between the scan and the first
    * shuffle (q40: 5.0 s → 1.3 s). Use for scans feeding heavy per-row
    * compute; use [[load]] everywhere else.
    */
  def loadFanout(spark: SparkSession, sfDir: String, name: String): DataFrame =
    loadImpl(spark, sfDir, name, fanout = true)

  private def loadImpl(
      spark: SparkSession, sfDir: String, name: String, fanout: Boolean): DataFrame = {
    val perSession = cache.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap.empty[String, DataFrame])
    val path = s"$sfDir/$name.parquet"
    perSession.getOrElseUpdate(s"$path#fanout=$fanout", {
      val df = spark.read.parquet(path)
      if (fanout) fanoutIfRowGroupBound(spark, path, df) else df
    })
  }

  // ---- small-table scan fanout -------------------------------------------

  private val FanoutMinBytes = 512L * 1024
  private val FanoutMaxBytes = 1L << 30

  /** Effective parquet scan parallelism is bounded by the ROW-GROUP count,
    * not by split arithmetic: Spark plans byte-range splits over the file,
    * but each row group is consumed whole by the single split containing
    * its start offset, so a table written as one row group executes its
    * scan — and every pre-shuffle projection above it — on ONE core, no
    * matter how `spark.sql.files.*` is tuned (measured at sf0.1: 32
    * planned splits, `spark_partition_id()` showed 1 data-bearing task,
    * and the q40 u256 stage timed exactly its single-threaded kernel
    * cost). When the row-group count is below the cluster parallelism and
    * the table is small enough that one round-robin shuffle is cheap,
    * fan the scan out explicitly. Filters and column pruning still push
    * through the Repartition node to the scan, so pushdown is preserved
    * and the shuffle carries only the pruned columns. At production scale
    * the condition is inert twice over: a real table carries orders of
    * magnitude more row groups than the cluster has cores, and the byte
    * cap refuses the shuffle outright.
    */
  private def fanoutIfRowGroupBound(
      spark: SparkSession, path: String, df: DataFrame): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    if (par <= 1) return df
    val (groups, bytes) =
      try rowGroupsAndBytes(spark, path)
      catch { case scala.util.control.NonFatal(_) => (Int.MaxValue, 0L) }
    if (groups < par && bytes >= FanoutMinBytes && bytes <= FanoutMaxBytes)
      df.repartition(par)
    else df
  }

  private def rowGroupsAndBytes(spark: SparkSession, path: String): (Int, Long) = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val root = fs.getFileStatus(p)
    val files =
      if (root.isDirectory)
        fs.listStatus(p).toSeq.filter(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
      else Seq(root)
    var groups = 0
    var bytes = 0L
    files.foreach { st =>
      bytes += st.getLen
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try groups += rd.getRowGroups.size
      finally rd.close()
    }
    (groups, bytes)
  }

  /** Drop cached plans — required after rewriting files under a cached
    * path (compaction does this automatically).
    */
  def invalidate(): Unit = cache.clear()

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The corpus stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * has no timestamp type for. The (runtime-settable) legacy conf makes
    * the read yield long nanos; it is set only around THIS schema
    * inference and restored, so a caller-built session keeps its own
    * semantics for its own nanos data — entry/queries still work under
    * any session (the driver's bare smoke session included). The loader
    * then truncates ns→µs with integer division (`div`, not `/` — ns
    * epoch values exceed double's 2^53 exact range), matching DuckDB's
    * own ns→µs truncation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = s.conf.getOption(NanosConf)
    val raw =
      try { s.conf.set(NanosConf, "true"); load(s, d, "events") }
      finally prior match {
        case Some(v) => s.conf.set(NanosConf, v)
        case None => s.conf.unset(NanosConf)
      }
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      // A µs-precision corpus (isAdjustedToUTC=false) reads as
      // TIMESTAMP_NTZ under Spark 4's NTZ inference. Normalize to the
      // session-zone TimestampType the rest of the engine was written
      // against (every session here pins UTC, so the cast is
      // value-preserving and matches DuckDB's naive-timestamp reading) —
      // otherwise instant functions like unix_micros reject the column.
      case TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events schema — needed by streaming readers (readStream requires an
    * explicit schema; parquet footers are not consulted).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Logical schemas of the reference's ingest tables (SURVEY §1.2):
    * blocks (ReplacingMergeTree key block_number), events (append-only),
    * token dimension (ReplacingMergeTree key token). Used by
    * [[graft.pipeline.Ingest]].
    */
  val blocksSchema: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("block_hash", StringType),
    StructField("block_timestamp", LongType),
    StructField("ingest_seq", LongType)))

  val tokenSchema: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("name", StringType),
    StructField("symbol", StringType),
    StructField("decimals", IntegerType),
    StructField("ingest_seq", LongType)))
}
