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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = cache.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap.empty[String, DataFrame])
    perSession.getOrElseUpdate(s"$sfDir/$name.parquet",
      spark.read.parquet(s"$sfDir/$name.parquet"))
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
