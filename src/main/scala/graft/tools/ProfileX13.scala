package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: x13 plan alternatives. */
object ProfileX13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", 32)
    val ev = graft.sources.Tables.events(spark, sfDir)
    ev.count()
    def noopRun(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time3(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noopRun(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[p] $name%-36s min ${ts.min}%6.2f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time3("declared (mixed, rsd .01)")(graft.SparkEntry.queries("x13_approx_distinct")(spark, sfDir))
    time3("exact only")(ev.groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("x")))
    time3("exact via 2-level")(ev.groupBy(col("event_type"), col("user_id")).agg(count(lit(1)))
      .groupBy(col("event_type")).agg(count(lit(1)).as("x")))
    time3("approx only rsd .01")(ev.groupBy(col("event_type")).agg(approx_count_distinct(col("user_id"), 0.01).as("x")))
    time3("approx only rsd .02")(ev.groupBy(col("event_type")).agg(approx_count_distinct(col("user_id"), 0.02).as("x")))
    time3("separate + join")(
      ev.groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n_users_exact"), count(lit(1)).as("n"))
        .join(ev.groupBy(col("event_type")).agg(approx_count_distinct(col("user_id"), 0.01).as("approx")), "event_type"))
    time3("2-level exact + hll in pass1")(
      ev.groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("c"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_users_exact"), sum(col("c")).as("n"))
        .join(ev.groupBy(col("event_type")).agg(approx_count_distinct(col("user_id"), 0.01).as("approx")), "event_type"))
    spark.stop()
  }
}
