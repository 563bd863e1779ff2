package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per JVM (Test/fork), config
  * mirrors graft.Verify so specs see what the driver sees.
  */
object SparkSuite {
  private[graft] def tempDir(prefix: String): String = {
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

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // keep catalog artifacts (derby metastore, warehouse) out of the
    // repo — and UNIQUE per JVM: suites run as parallel forked JVMs
    // (build.sbt testGrouping), and two catalogs writing one warehouse
    // dir corrupt each other's saveAsTable output
    val scratch = SparkSuite.tempDir("graft-suite")
    System.setProperty("derby.system.home", s"$scratch/derby")
    val s = SparkSession.builder()
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(s)
    s
  }

  val sf: String = "/root/testdata/sf0.001"

  /** Scratch dir removed at JVM exit — specs MUST use this instead of
    * Files.createTempDirectory: forked test JVMs leaked ~3.5k dirs per
    * round into /tmp (the x91 leak class, test-side; round-11 review).
    */
  protected def tempDir(prefix: String): String = SparkSuite.tempDir(prefix)

  /** One pinned-mtime arrival wave for file-stream specs — the twin of
    * ExtensionQueries.writeStreamWave (one-file parquet, mtimes
    * 1.7e12 + b·60s so maxFilesPerTrigger=1 replays waves in order).
    * A future change to the trigger-ordering contract lands here once.
    */
  protected def writeWaveTo(dir: String, b: Int,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val f = new java.io.File(dir, f"batch$b%03d.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(f.toString)
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }
}
