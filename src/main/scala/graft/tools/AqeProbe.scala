package graft.tools
import org.apache.spark.sql.SparkSession
/** One-shot probe (round-15 self-review): does
  * [[graft.pipeline.Bucketing.countExchanges]] see through the AQE
  * wrapper? AdaptiveSparkPlanExec is a leaf node, so a naive collect
  * may return 0 on ANY plan with AQE enabled — which would make the
  * x143/x145/x146 hash-pinned exchange counts vacuous. Prints the
  * executed-plan class and the count for a known-shuffling aggregate
  * under AQE on and off.
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def mk() = spark.range(0, 100000).groupBy((col("id") % 100).as("k")).count()
    def cnt(d: org.apache.spark.sql.DataFrame) = {
      val p = d.queryExecution.executedPlan
      (p.getClass.getSimpleName, graft.pipeline.Bucketing.countExchanges(d))
    }
    println("AQE on:  " + cnt(mk()))
    // post-execution the adaptive plan is stage-ified: the shuffle
    // appears as a ShuffleQueryStageExec LEAF, not a ShuffleExchangeLike
    val ran = mk(); ran.collect()
    println("AQE ran: " + cnt(ran))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println("AQE off: " + cnt(mk()))
    spark.stop()
  }
}
