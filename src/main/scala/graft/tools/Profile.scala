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

    val ev = graft.sources.Tables.events(spark, sfDir)
    def noopRun(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save(); 0L
    }
    time("x13 exact countDistinct only")(noopRun(
      ev.groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("x"))))
    time("x13 approx only (rsd 0.01)")(noopRun(
      ev.groupBy(col("event_type")).agg(approx_count_distinct(col("user_id"), 0.01).as("x"))))
    time("x13 approx only (rsd 0.05)")(noopRun(
      ev.groupBy(col("event_type")).agg(approx_count_distinct(col("user_id"), 0.05).as("x"))))
    time("x13 combined (as declared)")(noopRun(
      graft.SparkEntry.queries("x13_approx_distinct")(spark, sfDir)))
    spark.stop()
  }
}
