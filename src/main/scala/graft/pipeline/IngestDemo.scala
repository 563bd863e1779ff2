package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Runnable walkthrough of the incremental-ingest lifecycle (SURVEY
  * §3.1): watermark → slice plan → stamped appends (redelivery included)
  * → ReplacingMergeTree-style compaction → next watermark. Serves as the
  * executable documentation for [[Ingest]] and as a manual smoke surface:
  *
  *   sbt "runMain graft.pipeline.IngestDemo"
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ingest-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = graft.util.Scratch.tempDir("graft-demo") + "/blocks"
    val head = 1000005L

    // empty sink → start at the origin
    val r1 = Ingest.nextRange(None, head)
    println(s"[demo] first range: $r1")
    println(s"[demo] slices(2): ${Ingest.slices(r1.get, 2)}")

    // sliced distributed fetch (fake RPC), then a redelivery of overlap
    graft.sources.SlicedSource.ingestBlocks(
      spark, r1.get, sliceSize = 2, dir, seq = 1)
    graft.sources.SlicedSource.ingestBlocks(
      spark, Ingest.BlockRange(1000003, 1000004), sliceSize = 2, dir, seq = 2)
    println(s"[demo] rows before compaction: ${spark.read.parquet(dir).count()}")

    Ingest.compact(spark, dir, Seq("block_number"))
    println("[demo] after compaction (last write wins):")
    spark.read.parquet(dir).orderBy("block_number").show(truncate = false)

    val wm = Ingest.sinkMax(spark.read.parquet(dir), "block_number")
    println(s"[demo] watermark: $wm; next range: ${Ingest.nextRange(wm, head)}")

    // streaming twin: file-source stream → watermarked hourly rollup
    val sdir = graft.util.Scratch.tempDir("graft-demo-stream") + "/events"
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 00:40:00"), "click", 2.0),
        (3L, java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), "view", 3.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.parquet(sdir)
    val stream = graft.streaming.StreamingIngest.eventsStream(
      spark, sdir, spark.read.parquet(sdir).schema)
    graft.streaming.StreamingIngest.runToMemory(
      graft.streaming.StreamingIngest.hourlyRollup(stream), "demo_rollup")
    println("[demo] streaming hourly rollup:")
    spark.table("demo_rollup").orderBy("hour_start", "event_type").collect()
      .foreach(r => println(s"[demo]   $r"))
    spark.stop()
  }
}
