package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.TextDedup

/** Measured contrast for the x36 duplicate-span operator's two gram
  * keys: raw 8-gram strings (what the oracle checks) vs the 8-byte
  * xxhash64 gram key (`hashGrams = true`, the production default). The
  * dataflow is identical — explode positional grams, find cross-doc
  * grams, semi-join postings, count covered positions — so the contrast
  * isolates what the gram KEY costs through the two aggregation/join
  * exchanges. SCALING.md records the numbers.
  *
  * Corpus: synthetic ~60-word docs over a 50k vocabulary (random grams
  * are unique, the realistic worst case for posting-list size), with a
  * 12-word boilerplate span planted in every 10th doc so the duplicated
  * slice is non-trivial.
  *
  *   sbt 'runMain graft.tools.DupSpanBench 200000'
  */
object DupSpanBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = graft.GraftSession.build("local[32]", 32)

    val body = concat_ws(" ",
      (0 until 60).map(i => concat(lit("w"), pmod(hash(col("id"), lit(i)), lit(50000)))): _*)
    val docs = spark.range(n)
      .select(col("id").as("doc_id"), body.as("body"))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 0,
          concat(col("body"), lit(" the quick brown fox jumps over the lazy dog again and again")))
          .otherwise(col("body")))
      .drop("body")
      .cache()
    docs.count() // materialize so both variants read identical input

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
      println(f"[b] $name%-12s $sec%6.2f s  shuffled ${shuffleBytes / 1048576}%d MiB")
    }
    for (_ <- 1 to 2) {
      time("raw strings")(TextDedup.dupSpanCoverage(docs, n = 8, hashGrams = false))
      time("hashed")(TextDedup.dupSpanCoverage(docs, n = 8, hashGrams = true))
    }
    spark.stop()
  }
}
