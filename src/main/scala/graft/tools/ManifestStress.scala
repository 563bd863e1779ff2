package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.ManifestTable

/** One writer process of the multi-JVM ManifestTable race
  * (ManifestStressSpec launches two): performs `n` append commits through
  * [[ManifestTable.commitWithRetry]] against a shared table root. Each
  * commit appends exactly one (writer, i) row, so the spec can verify
  * that EVERY commit from BOTH processes survived into the final version
  * — the linear-history property the commit latch exists to guarantee
  * across real process boundaries (same-JVM races only exercise the
  * in-process filesystem view).
  */
object ManifestStress {
  def main(args: Array[String]): Unit = {
    val Array(root, writerId, nS) = args.take(3)
    val n = nS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-manifest-stress-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-stress-wh-$writerId")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (0 until n).foreach { i =>
      // body ignores the current state on purpose: append-only ingest.
      // maxRetries is generous — with two writers racing every commit,
      // losing several consecutive latches is the expected case, not an
      // error.
      ManifestTable.commitWithRetry(spark, root,
        _ => (Seq((writerId, i)).toDF("writer", "i"), false), maxRetries = 100)
    }
    spark.stop()
  }
}
