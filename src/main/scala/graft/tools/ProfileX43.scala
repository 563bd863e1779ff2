package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the x43 curation pipeline: times each
  * composed stage in isolation, then the full chain, to locate which
  * stage moved when the end-to-end number drifts.
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.ProfileX43'
  */
object ProfileX43 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)
    import graft.ext.{TextDedup, TextStats}
    import graft.operators.ConnectedComponents

    val docs = graft.sources.Tables.documents(spark, sfDir).filter(col("doc_id") < 300)
    docs.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[x43] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    val keep1 = TextDedup.exactGroups(docs).select(col("keep_id").as("doc_id"))
    val d1 = docs.join(keep1, Seq("doc_id"), "left_semi")
    val passed = TextStats.qualityFilter(d1, minTokens = 10, maxAvgWordLen = 9.0,
      minStopRatio = 0.01).filter(col("keep") === 1).select(col("doc_id"))
    val d2 = d1.join(passed, Seq("doc_id"), "left_semi")

    time("exactGroups")(keep1.count())
    time("d1 semi")(d1.count())
    time("qualityFilter")(passed.count())
    time("d2 semi")(d2.count())
    time("sharedShingleEdges")(TextDedup.sharedShingleEdges(d2, "lang", 4).count())
    time("cc labels")(ConnectedComponents.labels(
      TextDedup.sharedShingleEdges(d2, "lang", 4), "doc_a", "doc_b").count())
    for (pass <- 1 to 3)
      time(s"full x43 pass $pass") {
        graft.SparkEntry.queries("x43_curation_pipeline")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        0L
      }
    // Sweep-context simulation: accumulate the cached-block / heap
    // state a full bench pass builds up, then re-time x43.
    println(s"[x43] persistent RDDs before sweep: ${spark.sparkContext.getPersistentRDDs.size}")
    val sweep = Seq("x33_dup_clusters", "x35_semantic_dedup", "x30_decontaminate",
      "x36_dup_span_coverage", "x47_strip_dup_spans", "x46_split_overlap",
      "x03_minhash_pairs", "x02_minhash_bands", "x29_lang_id_ngram", "x41_lm_score")
    for (p <- 1 to 2; n <- sweep)
      graft.SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
    println(s"[x43] persistent RDDs after sweep: ${spark.sparkContext.getPersistentRDDs.size}")
    for (pass <- 4 to 6)
      time(s"full x43 pass $pass (dirty)") {
        graft.SparkEntry.queries("x43_curation_pipeline")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        0L
      }
    println(s"[x43] persistent RDDs end: ${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
