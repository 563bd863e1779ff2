package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions._
import graft.sources.Tables

/** The reference's flagship analytics slice (SURVEY §3.2,
  * generate_report_dag.py:32-122) recast over the driver corpus:
  * trailing-24h window → JSON payload extract → broadcast dimension
  * left-join with default fill → canonical pair key → grouped sum/count →
  * top-30. One shuffle (the pair aggregation); the dimension join is
  * broadcast; the limit plans as TakeOrderedAndProject.
  *
  * "now" is pinned to max(ts) so the query is deterministic (SURVEY §7.4).
  */
object Report {

  /** Top-30 (pair, vol_24h, txn_24h) — both report flavors of the
    * reference differ only in the ranking metric; vol ranking shown here,
    * `topPairsByTxn` gives the txn ranking.
    */
  def topPairs(spark: SparkSession, sfDir: String): DataFrame =
    rankedPairs(spark, sfDir).orderBy(col("vol_24h").desc, col("pair")).limit(30)

  def topPairsByTxn(spark: SparkSession, sfDir: String): DataFrame =
    rankedPairs(spark, sfDir).orderBy(col("txn_24h").desc, col("pair")).limit(30)

  /** §3.3 serving layer: the published report parquet IS the API. The
    * reference's FastAPI endpoints are `SELECT ... ORDER BY metric DESC`
    * over the precomputed table (api/ekubo_api.py:29-33,50-54); here
    * that is one pruned-scan + TakeOrderedAndProject read.
    */
  def serve(spark: SparkSession, reportPath: String, metric: String, topN: Int): DataFrame =
    serveFrom(spark.read.parquet(reportPath), metric, topN)

  /** Same ranking over an already-loaded report frame (lets a server
    * cache the plan across requests).
    */
  def serveFrom(report: DataFrame, metric: String, topN: Int): DataFrame =
    report
      .select(col("pair"), col("vol_24h"), col("txn_24h"))
      .orderBy(col(metric).desc, col("pair"))
      .limit(topN)

  /** The shared 24h pair aggregate feeding both rankings
    * (reference recomputes it twice; we share the plan).
    */
  def rankedPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val mx = ev.agg(max(col("ts")).as("mx"))
    val e24 = ev.crossJoin(broadcast(mx))
      .filter(col("ts") >= col("mx") - expr("INTERVAL 1 DAY"))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    e24.join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .withColumn("segment", coalesce(col("c_mktsegment"), lit("No Segment")))
      .withColumn("pair", pair_key(col("event_type"), col("segment")))
      .withColumn("vol", dec6(col("value") * col("k")))
      .groupBy(col("pair"))
      .agg(
        sum(col("vol")).cast(DecimalType(38, 6)).as("vol_24h"),
        count(lit(1)).as("txn_24h"))
  }
}
