package graft.pipeline

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

  /** Count shuffle exchanges in a plan — 0 for a co-located join. */
  def countExchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
  }
}
