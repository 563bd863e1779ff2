package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarityExpr, HexToDecimal}

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
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarityExpr(children(0), children(1))))
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // getOrCreate may have returned a pre-existing session whose builder
    // ran without our extensions — make function registration unconditional
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
