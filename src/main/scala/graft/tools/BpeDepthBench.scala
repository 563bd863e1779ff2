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
    println("merges\ttotal_s\tper_merge_ms\tmerge_rows")
    for (depth <- Seq(4, 16, 64, 128, 256)) {
      val t0 = System.nanoTime()
      val table = graft.ext.Bpe.fit(docs, depth)
      val n = table.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$depth\t$dt%.1f\t${dt * 1000 / depth}%.0f\t$n")
    }
    spark.stop()
  }
}
