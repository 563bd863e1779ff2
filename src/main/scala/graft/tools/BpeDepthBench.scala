package graft.tools

/** BPE fit cost vs merge depth (round-10 verdict item 6): x57 registers
  * a 4-merge fit, but a production tokenizer is 32k merges and each
  * merge is one sequential Spark job over the vocab-sized frame — the
  * question is whether per-merge cost stays FLAT with depth (iterations
  * are vocab-sized, corpus-independent) or accumulates (lineage/plan
  * growth), and what the per-job overhead floor implies for a 32k-merge
  * fit.
  *
  *   sbt 'runMain graft.tools.BpeDepthBench /root/testdata/sf0.1'
  */
object BpeDepthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir).cache()
    val nDocs = docs.count()
    println(s"docs=$nDocs sfDir=$sfDir")
    println("form\tmerges\ttotal_s\tper_merge_ms\tmerge_rows\tbatches")
    for (depth <- Seq(4, 16, 64, 128, 256)) {
      val t0 = System.nanoTime()
      val table = graft.ext.Bpe.fit(docs, depth)
      val n = table.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"serial\t$depth\t$dt%.1f\t${dt * 1000 / depth}%.0f\t$n\t$depth")
      // batched non-interfering form (round 10): same output rows
      // (BpeBatchSpec), one candidate-window pass per BATCH — the
      // batch count is what bounds a 32k-merge production fit now
      val t1 = System.nanoTime()
      val bt = graft.ext.Bpe.fitBatched(docs, depth, window = 64)
      val bn = bt.count()
      val dtB = (System.nanoTime() - t1) / 1e9
      val batches = graft.ext.Bpe.lastBatchSizes
      println(f"batched\t$depth\t$dtB%.1f\t${dtB * 1000 / depth}%.0f\t$bn\t${batches.size} (sizes ${batches.mkString(",")})")
    }
    spark.stop()
  }
}
