package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Bucketing

/** Bucketed layout must make the recurring fact⋈fact join shuffle-free. */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("join of two tables bucketed on the key plans zero shuffle exchanges") {
    val facts = (1L to 5000L).map(i => (i, s"h$i")).toDF("block_number", "block_hash")
    val events = (1L to 20000L).map(i => (i, i % 5000 + 1, s"e$i"))
      .toDF("event_id", "block_number", "payload")

    Bucketing.writeBucketed(facts, "b_blocks", "block_number", 4, Some("block_number"))
    Bucketing.writeBucketed(events, "b_events", "block_number", 4, Some("block_number"))

    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val joined = spark.table("b_events")
        .join(spark.table("b_blocks"), Seq("block_number"))
      assert(Bucketing.countExchanges(joined) == 0,
        s"expected co-located join, plan:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 20000)

      // contrast: the same join over plain (unbucketed) frames shuffles
      val plain = events.join(facts, Seq("block_number"))
      assert(Bucketing.countExchanges(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_blocks")
      spark.sql("DROP TABLE IF EXISTS b_events")
    }
  }
}
