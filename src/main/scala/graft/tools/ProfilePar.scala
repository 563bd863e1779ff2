package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: is the heavy projection actually parallel? */
object ProfilePar {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", 32)
    import graft.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    li.count()
    def noopRun(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time3(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noopRun(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[p] $name%-34s min ${ts.min}%6.2f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val h = concat(md5(col("l_orderkey").cast("string")), md5(col("l_partkey").cast("string")))
    val base = li.select(col("l_orderkey"), col("l_linenumber"), h.as("hex"))
    // partition count of the actual executed plan
    val dist = base.select(spark_partition_id().as("p")).groupBy("p").count().count()
    println(s"[p] distinct partition ids in projection stage: $dist")
    time3("u256_dec, scan-partitioned")(base.select(col("l_orderkey"), u256_dec(col("hex")).as("d")))
    time3("u256_dec, repartition(32) first")(
      li.repartition(32).select(col("l_orderkey"), col("l_linenumber"), h.as("hex"))
        .select(col("l_orderkey"), u256_dec(col("hex")).as("d")))
    spark.stop()
  }
}
