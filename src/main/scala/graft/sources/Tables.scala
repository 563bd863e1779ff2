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

  // One analyzed DataFrame per (sessionUUID, path): `spark.read.parquet`
  // re-lists files and re-reads footers on every call, which across a
  // 44-query bench pass is seconds of pure metadata work. DataFrames are
  // immutable plans, so reuse within a session is safe; the file index
  // inside the cached plan is what we want to keep warm. Keyed by the
  // session UUID (not the session object) and size-bounded so stopped
  // sessions don't pin entries forever; Ingest.compact invalidates after
  // rewriting files.
  private val MaxCached = 128
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // the corpus's events.ts is parquet TIMESTAMP(NANOS), which Spark 4
    // refuses unless this (runtime-settable) conf is on. Set it here so
    // entry/queries work under ANY caller-built session, not only our
    // mains — without it the driver's smoke session would fail the read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (cache.size > MaxCached) cache.clear()
    cache.getOrElseUpdate((String.valueOf(System.identityHashCode(spark)), s"$sfDir/$name.parquet"),
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
    * has no timestamp type for. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`; this loader then
    * truncates ns→µs with integer division (`div`, not `/` — the ns
    * epoch values exceed double's 2^53 exact range) and yields a proper
    * TimestampType column. Truncation matches DuckDB's own ns→µs read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
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
