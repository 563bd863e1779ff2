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
      val t = 1700000000000L + b * 60000L
      f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
    }
}
