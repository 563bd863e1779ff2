package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the packing pass on a skewed corpus (round-16, r15 verdict
  * item 2): a real pretraining mix is a handful of sources with one
  * dominant one (CommonCrawl ≈ 80-90%), and the two-level
  * concatChunkPack sorted that source's per-doc cumsum on ONE task.
  * This times the three-level form at bands=1 (the old shape) vs
  * bands=cores on a 90%-one-source synthetic corpus, plus a row-count
  * sweep, so the claim "the pass scales with cores, not with the
  * largest source" is a measured number in SCALING.md.
  *
  *   sbt 'runMain graft.tools.ProfilePackSkew [nDocs]'
  */
object ProfilePackSkew {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pack-skew")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)

    // 90% of docs in one source, the rest across 9 small ones; 1-13
    // tokens per doc (enough rows that the per-source sort dominates)
    def corpus(n: Long) = spark.range(0, n, 1, cpus.toInt)
      .select(col("id").as("doc_id"),
        when(col("id") % 10 < 9, lit("crawl"))
          .otherwise(concat(lit("s"), (col("id") % 10).cast("string"))).as("source"),
        rtrim(expr("repeat('w ', cast(id % 13 + 1 as int))")).as("text"))
      .localCheckpoint(false) // corpus generation outside every timed arm

    val docs = corpus(nDocs)
    def run(bands: Int): Double = {
      val t0 = System.nanoTime()
      graft.ext.TextStats.concatChunkPack(docs, 2048, bands = bands)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(1); run(cpus.toInt) // JIT/codegen warmup
    val single = (1 to 3).map(_ => run(1)).min
    val banded = (1 to 3).map(_ => run(cpus.toInt)).min
    println(f"[pack-skew] nDocs=$nDocs 90%%-one-source: bands=1 $single%.2f s, " +
      f"bands=$cpus $banded%.2f s, speedup ${single / banded}%.2f x")

    // growth check: does the banded pass stay flat-ish per row as the
    // dominant source grows?
    Seq(nDocs / 4, nDocs).foreach { n =>
      val d = corpus(n)
      def runN(bands: Int): Double = {
        val t0 = System.nanoTime()
        graft.ext.TextStats.concatChunkPack(d, 2048, bands = bands)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      runN(cpus.toInt)
      val b = (1 to 2).map(_ => runN(cpus.toInt)).min
      val s = (1 to 2).map(_ => runN(1)).min
      println(f"[pack-skew] n=$n%-9d bands=1 $s%.2f s  bands=$cpus $b%.2f s")
    }
    spark.stop()
  }
}
