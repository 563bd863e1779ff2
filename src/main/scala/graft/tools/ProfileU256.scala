package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the q40/q41 uint256 path.
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.ProfileU256'
  */
object ProfileU256 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)
    import graft.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    li.count() // warm

    def noopRun(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save(); 0L
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val h = concat(md5(col("l_orderkey").cast("string")), md5(col("l_partkey").cast("string")))
    val base = li.select(col("l_orderkey"), col("l_linenumber"), h.as("hex"))

    time("scan only")(noopRun(li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))))
    time("md5||md5 only")(noopRun(base))
    time("+ u256_dec")(noopRun(base.select(col("*"), u256_dec(col("hex")).as("d"))))
    time("+ u256_limbs elem1 only")(noopRun(
      base.select(col("l_orderkey"), element_at(u256_limbs(col("hex")), 1).as("l0"))))
    val limbs = u256_limbs(col("hex"))
    time("+ limbs + render (elem x5)")(noopRun(
      base.select(col("l_orderkey"),
        u256_render(element_at(limbs, 1), element_at(limbs, 2), element_at(limbs, 3),
          element_at(limbs, 4), element_at(limbs, 5)).as("r"))))
    time("q40 as declared")(noopRun(graft.SparkEntry.queries("q40_u256_decimal")(spark, sfDir)))
    time("q40 as declared (2nd)")(noopRun(graft.SparkEntry.queries("q40_u256_decimal")(spark, sfDir)))
    time("q41 as declared")(noopRun(graft.SparkEntry.queries("q41_u256_sum")(spark, sfDir)))
    time("q41 limbs+5 decimal sums")(noopRun(
      base.select(col("l_orderkey"), u256_limbs(col("hex")).as("limbs"))
        .groupBy(col("l_orderkey") % 3)
        .agg(sum(element_at(col("limbs"), 1).cast("decimal(38,0)")).as("s0"),
          Seq.tabulate(4)(i =>
            sum(element_at(col("limbs"), i + 2).cast("decimal(38,0)")).as(s"s${i + 1}")): _*)))
    spark.stop()
  }
}
