package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only contrast: the CDC pair's portable windowed-md5 path
  * (oracle-replayable, x68) vs the gear-hash codegen fast path
  * (`TextDedup.cdcChunksFast`) on an amplified corpus — the measured row
  * behind "O(md5-per-position) vs O(1)-per-position" in SCALING.md.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.CdcBench 10'
  */
object CdcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)
    val base = graft.sources.Tables.documents(spark, sfDir)
    val docs = (0 until factor)
      .map(i => base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionAll _)
      .localCheckpoint(true)
    val nChars = docs.agg(sum(length(col("text")))).first().getLong(0)
    println(s"[cdcbench] docs=${docs.count()} chars=$nChars (x$factor)")

    def time(name: String)(f: => Long): Unit = {
      // two passes, min — same rationale as graft.Bench
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = samples.map(_._1).min
      println(f"[cdcbench] $name%-26s $best%7.2f s  (rows=${samples.head._2})")
    }

    time("portable windowed-md5")(
      graft.ext.TextDedup.cdcChunks(docs).agg(count(lit(1))).first().getLong(0))
    time("gear codegen fast path")(
      graft.ext.TextDedup.cdcChunksFast(docs).agg(count(lit(1))).first().getLong(0))
    spark.stop()
  }
}
