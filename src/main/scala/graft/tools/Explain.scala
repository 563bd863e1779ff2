package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints `.explain("formatted")` for registered queries,
  * for checking the scale posture (PushedFilters reaching the parquet
  * scan, pruned ReadSchema, broadcast joins on dims, WholeStageCodegen
  * spans, TakeOrderedAndProject for top-K).
  *
  *   sbt 'runMain graft.tools.Explain q01_scan_prune q04_double_dim_join'
  *   sbt 'runMain graft.tools.Explain all'
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark)

    val wanted =
      if (args.isEmpty || args.sameElements(Array("all"))) graft.SparkEntry.registry.map(_.name)
      else args.toSeq
    wanted.foreach { name =>
      println(s"\n======== $name ========")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
