package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per JVM (Test/fork), config
  * mirrors graft.Verify so specs see what the driver sees.
  */
object SparkSuite {
  // delegate to the main-side helper: the deletion logic (single
  // shutdown hook draining a queue) must not fork between trees
  private[graft] def tempDir(prefix: String): String =
    graft.util.Scratch.tempDir(prefix)
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

  /** One pinned-mtime arrival wave for file-stream specs — delegates to
    * [[graft.util.FileWaves]], the ONE place the trigger-ordering
    * contract lives.
    */
  protected def writeWaveTo(dir: String, b: Int,
      df: org.apache.spark.sql.DataFrame): Unit =
    graft.util.FileWaves.write(dir, b, df)
}
