package graft.tools

import org.apache.spark.sql.SparkSession

/** Rehearses the driver's t1 smoke exactly: a DELIBERATELY bare session
  * (none of our configs) calling `SparkEntry.entry` — proves the engine
  * self-configures whatever it needs (e.g. the TIMESTAMP(NANOS) read
  * conf) instead of relying on its own mains' session setup.
  *
  *   sbt 'runMain graft.tools.EntrySmoke'
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("entry-smoke")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
