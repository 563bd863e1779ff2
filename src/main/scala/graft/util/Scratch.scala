package graft.util

/** Scratch temp dirs removed at JVM exit — the one sanctioned way to
  * create them (round-11; the x91 leak class): eager deletion is often
  * impossible (lazy DataFrames, long-lived servers), but without the
  * hook every invocation leaked a dir into /tmp forever. Query-side
  * callers go through `ExtensionQueries.scratchTempDir` (which
  * delegates here); demo mains and bench tools call this directly.
  */
object Scratch {
  def tempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      try rm(dir.toFile) catch { case _: Throwable => () }
    }))
    dir.toString
  }
}
