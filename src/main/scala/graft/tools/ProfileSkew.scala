package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only breakdown of skewAwareJoin's cost at an amplified scale:
  * detection pass alone, conditional-salt join alone, plain join floor.
  *   sbt 'runMain graft.tools.ProfileSkew /tmp/graft-skew10'
  */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-skew10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)
    import graft.operators.Salt
    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
    val dim = spark.read.parquet(s"$dir/orders.parquet")
    fact.count(); dim.count() // warm

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[pskew] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def agg(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))

    time("detect sampled 2%") {
      fact.select(col("l_orderkey").cast("string").as("__k"))
        .sample(withReplacement = false, 0.02, seed = 42L)
        .agg(graft.functions.frequent_items(col("__k"), 16).as("hh"))
        .collect()
    }
    time("detect full") {
      fact.select(col("l_orderkey").cast("string").as("__k"))
        .agg(graft.functions.frequent_items(col("__k"), 16).as("hh"))
        .collect()
    }
    time("plain join + agg")(noop(agg(
      fact.join(dim, fact("l_orderkey") === dim("o_orderkey")))))
    time("skewAware sampled (total)")(noop(agg(
      Salt.skewAwareJoin(fact, dim, "l_orderkey", "o_orderkey",
        col("l_linenumber"), 8))))
    // join phase alone with a fixed literal hot set (no detection job)
    val hot = Seq("1", "7")
    val isHotFact = coalesce(col("l_orderkey").cast("string").isin(hot: _*), lit(false))
    val isHotDim = coalesce(col("o_orderkey").cast("string").isin(hot: _*), lit(false))
    val salted = fact.withColumn("__salt",
      when(isHotFact, Salt.saltExpr("l_orderkey", col("l_linenumber"), 8)).otherwise(lit(0)))
    val replicated = dim
      .withColumn("__salt", explode(when(isHotDim,
        sequence(lit(0), lit(7))).otherwise(sequence(lit(0), lit(0)))))
      .withColumn("__salt", col("__salt").cast("int"))
    time("cond-salt join alone")(noop(agg(
      salted.join(replicated,
        salted("l_orderkey") === replicated("o_orderkey") &&
          salted("__salt") === replicated("__salt")).drop("__salt"))))
    // is the 2-column join key the cost? plain join with a constant second key
    val f2 = fact.withColumn("__z", lit(0))
    val d2 = dim.withColumn("__z", lit(0))
    time("plain join + const 2nd key")(noop(agg(
      f2.join(d2, f2("l_orderkey") === d2("o_orderkey") && f2("__z") === d2("__z")))))
    spark.stop()
  }
}
