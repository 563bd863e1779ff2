package graft.tools

/** Dev-only single-query timer with graft.Bench's exact semantics
  * (noop-format write = full evaluation of every output column; min of
  * the passes printed per query). Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.TimeQ x64_hybrid_rrf x54_bm25_retrieval'
  * Optional first arg `passes=N` (default 2).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (passes, names) = args.headOption match {
      case Some(p) if p.startsWith("passes=") => (p.drop(7).toInt, args.tail.toSeq)
      case _ => (2, args.toSeq)
    }
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // warmup (Bench's): one shuffle+agg and one tiny parquet read
    spark.range(0, 100000, 1, 4)
      .groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k"))
      .count().count()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def one(name: String): Double = {
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save() }
      catch { case e: Throwable => println(s"[timeq] $name ERROR: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- names) {
      val samples = (1 to passes).map(_ => one(n))
      println(f"[timeq] $n%-28s min ${samples.min}%6.3f s  samples ${samples.map(s => f"$s%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
