package graft.tools

/** Dev-only audit: per registered query, how many parquet scans does
  * the physical plan carry per table? Repeated scans of the same table
  * inside one plan usually mean a shared subtree the optimizer did not
  * reuse (the round-10 x64 finding: 16 scans, zero ReusedExchange).
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val threshold = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.registry.foreach { q =>
      try {
        val plan = q.build(spark, sfDir).queryExecution.executedPlan
        // AQE wraps any exchange-bearing plan in AdaptiveSparkPlanExec,
        // whose children are not visible to collectWithSubqueries — walk
        // into each wrapper's initialPlan explicitly (pre-execution, the
        // initial plan is the full physical tree).
        def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
          p.collectWithSubqueries {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              allScans(a.initialPlan)
            case s: org.apache.spark.sql.execution.FileSourceScanExec =>
              Seq(s.relation.location.rootPaths.headOption.fold("?")(p =>
                p.getName.stripSuffix(".parquet")))
          }.flatten
        val scans = allScans(plan)
        val byTable = scans.groupBy(identity).view.mapValues(_.size).toMap
        val hot = byTable.filter(_._2 >= threshold)
        if (hot.nonEmpty)
          println(s"[scan-audit] ${q.name}: $byTable")
      } catch { case e: Throwable =>
        println(s"[scan-audit] ${q.name} ERROR: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
