package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Prefilter

/** Measured contrast for bloom semi-join reduction (q44): a fact table
  * joined to a selective dim whose key set fits a bloom but whose rows
  * exceed the broadcast threshold (modeled by disabling auto-broadcast
  * and Spark's own InjectRuntimeFilter — the operator's target is
  * exactly the shapes where that heuristic does not fire). Plain
  * sort-merge join shuffles the full fact side; the bloom probe drops
  * non-matching fact rows at the scan, so only (selectivity + fpp) of
  * the fact shuffles. SCALING.md records the numbers.
  *
  *   sbt 'runMain graft.tools.BloomJoinBench 50000000'
  */
object BloomJoinBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val spark = graft.GraftSession.build("local[32]", 32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    spark.conf.set("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "false")

    val domain = n / 10           // key domain
    val dimKeys = domain / 50     // dim selects 2% of the domain
    val fact = spark.range(n)
      .select((col("id") % domain).as("k"),
        concat(lit("payload-"), col("id")).as("payload"))
    val dim = spark.range(dimKeys)
      .select((col("id") * 50).as("dk"), concat(lit("dim-"), col("id")).as("name"))

    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      shuffleBytes = 0L
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let stage-completed events drain
      println(f"[b] $name%-14s $sec%6.2f s  shuffled ${shuffleBytes / 1048576}%d MiB")
    }
    for (_ <- 1 to 2) {
      time("plain join") {
        fact.join(dim, fact("k") === dim("dk"))
          .groupBy("name").agg(count(lit(1)).as("cnt"))
      }
      time("bloom join") {
        Prefilter.bloomPrefilteredJoin(fact, dim, "k", "dk",
            expectedKeys = dimKeys, fpp = 0.01)
          .groupBy("name").agg(count(lit(1)).as("cnt"))
      }
    }
    spark.stop()
  }
}
