package graft

import org.apache.spark.sql.functions._

import graft.util.FileWaves

/** Pins [[FileWaves.writeAll]] (round-16 optimization round) to the
  * per-wave [[FileWaves.write]] contract it fuses: same dir names, ONE
  * data file per wave (the maxFilesPerTrigger=1 trigger-ordering
  * contract), same pinned mtimes, same rows and reader schema, and the
  * empty-wave / schema-mismatch fallbacks behave exactly like the
  * unfused loop.
  */
class FileWavesSpec extends SparkSuite {
  import spark.implicits._

  private def layout(dir: String): Seq[(String, Long, Int)] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.startsWith("batch")).sortBy(_.getName).toSeq
      .map { w =>
        (w.getName, w.lastModified(),
          w.listFiles().count(f => f.getName.endsWith(".parquet")))
      }
  }

  test("writeAll produces the per-wave write()'s exact reader-visible layout") {
    val a = tempDir("graft-fw-a") + "/src"
    val b = tempDir("graft-fw-b") + "/src"
    val waves = Seq(
      Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"),
      Seq((1L, "xx")).toDF("doc_id", "text"),
      Seq((2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    waves.zipWithIndex.foreach { case (w, i) => FileWaves.write(a, i, w) }
    FileWaves.writeAll(b, waves)
    assert(layout(a) == layout(b),
      s"fused layout drifted: ${layout(a)} vs ${layout(b)}")
    waves.indices.foreach { i =>
      val ra = spark.read.parquet(f"$a/batch$i%03d.parquet")
      val rb = spark.read.parquet(f"$b/batch$i%03d.parquet")
      assert(ra.schema == rb.schema, s"wave $i schema drifted")
      assert(ra.collect().toSet == rb.collect().toSet, s"wave $i rows drifted")
    }
    // the streaming source replays the fused dirs in the same wave order
    val got = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(b + "/*")
    val q = got.writeStream.format("memory").queryName("fw_replay")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("fw_replay").count() == 4)
  }

  test("writeAll falls back per-wave on empty waves and schema mismatch") {
    val c = tempDir("graft-fw-c") + "/src"
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    FileWaves.writeAll(c, Seq(
      Seq((1L, "x")).toDF("doc_id", "text"), empty))
    // wave 0 fused or not, wave 1 exists with zero rows — exactly what
    // the unfused loop produces
    assert(spark.read.parquet(f"$c/batch${0}%03d.parquet").count() == 1)
    assert(new java.io.File(c, "batch001.parquet").exists())
    val d = tempDir("graft-fw-d") + "/src"
    FileWaves.writeAll(d, Seq(
      Seq((1L, "x")).toDF("doc_id", "text"),
      Seq((2L, 3L)).toDF("doc_id", "n")))
    assert(spark.read.parquet(f"$d/batch${0}%03d.parquet")
      .columns.toSeq == Seq("doc_id", "text"))
    assert(spark.read.parquet(f"$d/batch${1}%03d.parquet")
      .columns.toSeq == Seq("doc_id", "n"))
  }
}
