package graft.util

/** Scratch temp dirs removed at JVM exit — the one sanctioned way to
  * create them (round-11; the x91 leak class): eager deletion is often
  * impossible (lazy DataFrames, long-lived servers), but without the
  * hook every invocation leaked a dir into /tmp forever. Query-side
  * callers go through `ExtensionQueries.scratchTempDir` and specs
  * through `SparkSuite.tempDir` (both delegate here); demo mains and
  * bench tools call this directly.
  *
  * ONE static hook drains a queue of registered dirs (round-11 review):
  * a hook-Thread per call meant thousands of simultaneously-started
  * deletion threads at JVM exit on spec-heavy runs — the JVM starts all
  * shutdown hooks concurrently.
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()

  // never recurse through a symlink (round-11 ADVICE): listFiles on a
  // symlinked directory enumerates the TARGET's children, so a link
  // inside a scratch dir would have its target's contents deleted —
  // unlink the link itself and stop. Package-visible so the contract is
  // spec-pinned (ScratchSpec) instead of living untestable inside the
  // shutdown hook (round-13, r12 verdict item 7).
  private[graft] def rm(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
    }
    f.delete(); ()
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var d = dirs.poll()
    while (d != null) {
      try rm(d) catch { case _: Throwable => () }
      d = dirs.poll()
    }
  }))

  def tempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(dir.toFile)
    dir.toString
  }
}

/** One pinned-mtime arrival wave for file-stream replays — shared by
  * the streaming read-back queries (x111/x113/x116) and the specs
  * (`SparkSuite.writeWaveTo`), so a future change to the
  * trigger-ordering contract (mtime granularity, _SUCCESS handling)
  * lands in exactly one place (round-11 review): a single-file parquet
  * under `dir` with mtimes pinned to `1.7e12 + b·60s`, which makes
  * `maxFilesPerTrigger=1` replay waves in wave-number order
  * deterministically.
  */
object FileWaves {
  def write(dir: String, b: Int, df: org.apache.spark.sql.DataFrame): Unit =
    graft.pipeline.Ingest.withJobDesc(df.sparkSession, s"graft:wave-write b$b") {
      val f = new java.io.File(dir, f"batch$b%03d.parquet")
      df.coalesce(1).write.mode("overwrite").parquet(f.toString)
      pinMtime(f, b)
    }

  private def pinMtime(f: java.io.File, b: Int): Unit = {
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }

  /** All of a script's up-front waves in ONE Spark job (round-16
    * optimization round, guide §1.2 "remove passes"): the per-wave
    * [[write]] paid one plan + job + commit per wave — pure
    * orchestration floor at micro-wave sizes, repeated by every
    * streaming lifecycle query in the registry. Here the waves are
    * unioned under a `__wave` tag, written once through a single-task
    * dynamic-partition write (one task ⇒ exactly ONE data file per
    * wave — the `maxFilesPerTrigger=1` trigger-ordering contract needs
    * one file per wave), and each `__wave=N` dir is renamed to the
    * `batchNNN.parquet` name [[write]] produces, mtimes pinned
    * identically. Reader-visible layout, schema (the tag column is a
    * partition column — never in the files), rows, and trigger order
    * are byte-for-byte the [[write]] loop's (FileWavesSpec pins it).
    * Waves whose schemas disagree, and empty waves (a zero-row
    * dynamic-partition write emits no dir at all), fall back to the
    * per-wave path — behavior-identical, just not fused.
    */
  def writeAll(dir: String, waves: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    val fuse = waves.size > 1 &&
      waves.map(_.schema.map(f => (f.name, f.dataType)).toSeq).distinct.size == 1
    if (!fuse) { waves.zipWithIndex.foreach { case (w, b) => write(dir, b, w) }; return }
    import org.apache.spark.sql.functions.lit
    graft.pipeline.Ingest.withJobDesc(waves.head.sparkSession,
      s"graft:wave-write-all n${waves.size}") {
      val tagged = waves.zipWithIndex
        .map { case (w, i) => w.withColumn("__wave", lit(i)) }
        .reduce(_ unionByName _)
      val tmp = new java.io.File(dir, ".graft-waves-tmp")
      tagged.coalesce(1).write.mode("overwrite").partitionBy("__wave")
        .parquet(tmp.toString)
      waves.indices.foreach { b =>
        val src = new java.io.File(tmp, s"__wave=$b")
        val dst = new java.io.File(dir, f"batch$b%03d.parquet")
        if (src.isDirectory) {
          Scratch.rm(dst)
          if (!src.renameTo(dst)) sys.error(s"writeAll: cannot publish $src -> $dst")
          pinMtime(dst, b)
        } else write(dir, b, waves(b)) // empty wave: the unfused behavior
      }
      Scratch.rm(tmp)
    }
  }
}
