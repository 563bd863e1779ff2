package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: repeated-pass timing of the u256 queries to separate plan
  * cost from host noise. */
object ProfileQ40 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", 32)
    import graft.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    li.count()
    def noopRun(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time5(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noopRun(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[p] $name%-28s min ${ts.min}%6.2f  med ${ts.sorted.apply(2)}%6.2f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val h = concat(md5(col("l_orderkey").cast("string")), md5(col("l_partkey").cast("string")))
    val base = li.select(col("l_orderkey"), col("l_linenumber"), h.as("hex"))
    time5("scan only")(li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey")))
    time5("md5||md5")(base)
    time5("+u256_dec only")(base.select(col("l_orderkey"), u256_dec(col("hex")).as("d")))
    time5("+render_limbs only")(base.select(col("l_orderkey"), u256_render_limbs(u256_limbs(col("hex"))).as("d")))
    time5("q40 declared")(graft.SparkEntry.queries("q40_u256_decimal")(spark, sfDir))
    time5("q41 declared")(graft.SparkEntry.queries("q41_u256_sum")(spark, sfDir))
    spark.stop()
  }
}
