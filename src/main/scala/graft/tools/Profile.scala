package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for hot query stages.
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.Profile'
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    docs.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    time("docs.count")(docs.count())
    time("shingle explode")(
      docs.select(explode(graft.functions.word_shingles(col("text"), 3))).count())
    time("shingle + md5_prefix60")(
      docs.select(explode(graft.functions.word_shingles(col("text"), 3)).as("sh"))
        .select(graft.functions.md5_prefix60(col("sh").cast("binary")).as("h")).agg(max(col("h"))).count())
    time("shingle + builtin conv hash")(
      docs.select(explode(graft.functions.word_shingles(col("text"), 3)).as("sh"))
        .select(graft.ext.TextDedup.portableHashBuiltin(col("sh"), "").as("h")).agg(max(col("h"))).count())
    time("signatures portable")(
      graft.ext.TextDedup.minhashSignaturesPortable(docs).count())
    time("signatures xxhash64")(
      graft.ext.TextDedup.minhashSignatures(docs).count())
    time("bands portable")(
      graft.ext.TextDedup.lshBandsPortable(docs).count())
    time("pairs portable")(
      graft.ext.TextDedup.candidatePairsFrom(
        graft.ext.TextDedup.minhashSignaturesPortable(docs)).count())
    time("bigram explode count")(
      docs.select(explode(graft.functions.word_ngrams(col("text"), 2)).as("g"))
        .groupBy(col("g")).count().count())
    spark.stop()
  }
}
