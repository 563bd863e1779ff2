package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarityExpr, HexToDecimal, Md5Prefix60}

/** `spark.sql.extensions`-style injection of the graft functions — the
  * idiomatic production path:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * (`graft.functions.registerAll` is the post-hoc equivalent for an
  * already-built session; both routes register the same builders.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("hex_to_decimal"),
      new ExpressionInfo(classOf[HexToDecimal].getName, "hex_to_decimal"),
      (children: Seq[Expression]) => HexToDecimal(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (children: Seq[Expression]) => Md5Prefix60(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarityExpr(children(0), children(1))))
    // hoist repeated expensive graft kernels out of projections (runs in
    // the operator-optimization batch; CollapseProject's non-cheap
    // multi-reference guard keeps the split stable)
    ext.injectOptimizerRule(_ => graft.plans.ExtractExpensiveSubexpressions)
  }
}

/** Canonical session factory + SQL catalog setup for the engine. */
object GraftSession {

  /** A fully-configured local session: graft extensions, UTC, AQE,
    * ns-as-long parquet reads, µs parquet writes, shuffle partitions
    * sized to the core count rather than the 200 default.
    */
  def build(master: String = "local[*]", shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // getOrCreate may have returned a PRE-EXISTING session, in which case
    // the builder's configs and extensions were silently ignored. All the
    // load-bearing settings here are SQL runtime confs, so apply them
    // unconditionally on the session we actually got — without
    // nanosAsLong the corpus events table fails to read, and a non-UTC
    // timezone silently shifts every windowed result.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    graft.functions.registerAll(s)
    s
  }

  /** Register the corpus tables as temp views so `spark.sql` text queries
    * run against them by name (the ClickHouse-SQL user experience).
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
