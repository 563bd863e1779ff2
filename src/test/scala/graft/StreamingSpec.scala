package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingIngest

/** Structured Streaming rollup over a file stream must agree with the
  * batch q22 rollup on the same data (stream/batch unification check).
  */
class StreamingSpec extends SparkSuite {

  test("streaming hourly rollup matches batch rollup") {
    // stage the (ns→µs normalized) events as a stream source dir
    val dir = Files.createTempDirectory("graft-stream").toString + "/events"
    val events = Tables.events(spark, sf)
    events.write.parquet(dir)

    val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
    StreamingIngest.runToMemory(
      StreamingIngest.hourlyRollup(stream), "rollup", mode = "complete")

    val streamed = spark.table("rollup")
      .select(col("hour_start").cast("long"), col("event_type"), col("n"))
      .orderBy("hour_start", "event_type")
      .collect()

    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("hour_start"),
        col("event_type"), col("n"))
      .orderBy("hour_start", "event_type")
      .collect()

    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }

  test("dedupedStream drops redelivered event_ids within the watermark") {
    val dir = Files.createTempDirectory("graft-stream2").toString + "/events"
    val events = Tables.events(spark, sf).limit(100)
    // redeliver everything twice
    events.unionAll(events).write.parquet(dir)

    val stream = StreamingIngest.eventsStream(spark, dir, events.schema)
    StreamingIngest.runToMemory(
      StreamingIngest.dedupedStream(stream)
        .groupBy().agg(count(lit(1)).as("n")),
      "deduped", mode = "complete")

    assert(spark.table("deduped").first().getLong(0) == 100L)
  }
}
