package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only per-JOB decomposition of a registered query's wall time —
  * the measure-first step of the optimization guide (§1) applied to the
  * multi-pass streaming lifecycle queries, whose cost is spread over
  * dozens of small Spark jobs (wave writes, per-batch probes, appends,
  * compactions, serving reads) plus driver-side gaps (catalog ops, FS
  * renames, checkpoint bookkeeping) that no single plan shows.
  *
  * Prints one line per Spark job (duration, callsite) in completion
  * order, then a by-callsite aggregate and the wall/jobs/gap split. The
  * gap — wall time minus time covered by at-least-one-running-job — is
  * driver-side work: catalog round-trips, file renames, offset-log
  * fsyncs, plan compilation.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.JobProfile x125_dedup_stream_retract'
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // Bench's warmup
    spark.range(0, 100000, 1, 4)
      .groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k"))
      .count().count()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    case class Job(id: Int, start: Long, var end: Long = -1L, site: String)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val p = Option(js.properties)
        val site = p.flatMap(q => Option(q.getProperty("spark.job.description")))
          .filter(_.startsWith("graft:"))
          .orElse(p.flatMap(q => Option(q.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs(js.jobId) = Job(js.jobId, js.time, site = site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
    }

    for (name <- args.toSeq) {
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      } catch { case e: Throwable => println(s"[jobprofile] $name ERROR: ${e.getMessage}") }
      val wallMs = (System.nanoTime() - t0) / 1e6
      // give the async listener bus a beat so late onJobEnd events land
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      val done = jobs.values.filter(_.end > 0).toSeq.sortBy(_.start)
      println(s"\n==== $name ====")
      done.foreach { j =>
        println(f"[job] ${j.id}%4d ${(j.end - j.start) / 1000.0}%7.3f s  ${j.site}")
      }
      def norm(s: String): String =
        s.replaceAll(" s\\d+$", "").replaceAll("_?graft[-_][-_a-zA-Z0-9]*", "<tag>")
      val bySite = done.groupBy(j => norm(j.site)).map { case (s, js) =>
        (s, js.map(j => j.end - j.start).sum / 1000.0, js.size)
      }.toSeq.sortBy(-_._2)
      println("---- by callsite ----")
      bySite.foreach { case (s, sec, n) => println(f"[site] $sec%8.3f s  n=$n%-4d $s") }
      // union of job intervals = time at least one job was running
      val iv = done.map(j => (j.start, j.end)).sortBy(_._1)
      var covered = 0L
      var curS = -1L; var curE = -1L
      for ((s, e) <- iv) {
        if (curE < 0) { curS = s; curE = e }
        else if (s <= curE) { curE = math.max(curE, e) }
        else { covered += curE - curS; curS = s; curE = e }
      }
      if (curE > 0) covered += curE - curS
      println(f"[total] wall ${wallMs / 1000.0}%7.3f s  jobs-covered ${covered / 1000.0}%7.3f s  " +
        f"driver-gap ${(wallMs - covered) / 1000.0}%7.3f s  n_jobs=${done.size}")
    }
    spark.stop()
  }
}
