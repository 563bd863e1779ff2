package graft.tools

import org.apache.spark.sql.functions._

/** Measured contrast for the bucketed-append layout (round 4): keyed
  * last-write-wins dedup over the same N-row three-batch append history
  * (every batch re-ingests the full key set — the ReplacingMergeTree
  * worst case), (a) as a plain parquet path (one full-history shuffle
  * per dedup) vs (b) as a hash-bucketed table (bucket-local, zero
  * exchanges). Full evaluation through a noop write (count() would let
  * Catalyst prune the max_by aggregates). SCALING.md records the
  * numbers.
  *
  *   sbt 'runMain graft.tools.BucketDedupBench 21000000'
  */
object BucketDedupBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(21000000L)
    val spark = graft.GraftSession.build("local[32]", 32)
    import graft.pipeline.Ingest
    spark.sql("DROP TABLE IF EXISTS bd_bucketed")
    val plainDir = "/tmp/graft-bd-plain"
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(plainDir), true)

    def batch(seq: Int) = spark.range(n / 3).toDF("k")
      .withColumn("payload", concat(lit("v"), col("k") + seq))
    (1 to 3).foreach { s =>
      Ingest.appendWithSeq(batch(s), plainDir, s)
      Ingest.appendBucketedWithSeq(batch(s), "bd_bucketed", "k", 32, s)
    }

    @volatile var shuffleBytes = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    spark.sparkContext.addSparkListener(listener)
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      shuffleBytes = 0L
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let stage-completed events drain
      println(f"[b] $name%-18s $sec%6.2f s  shuffled ${shuffleBytes / 1048576}%d MiB")
    }
    for (_ <- 1 to 2) {
      time("plain dedup")(Ingest.latestView(spark.read.parquet(plainDir), Seq("k")))
      time("bucketed dedup")(Ingest.latestView(spark.table("bd_bucketed"), Seq("k")))
    }
    spark.sql("DROP TABLE IF EXISTS bd_bucketed")
    spark.stop()
  }
}
