package graft

import org.apache.spark.sql.functions._

import graft.functions.{kll_merge_agg, kll_quantile, kll_sketch_agg}

/** KLL quantile-sketch aggregate family (round-10, the x99 kernel):
  * partial build, second-level merge, quantile probe — all under the
  * rank-window error contract (KLL compaction is randomized, so tests
  * assert rank windows, never exact estimates).
  */
class KllSpec extends SparkSuite {
  import spark.implicits._

  // 10k distinct values 0..9999 in shuffled-ish order across 8 partitions
  private def data = spark.range(0, 10000, 1, 8)
    .select(((col("id") * 7919) % 10000).cast("double").as("v"))

  test("direct sketch: quantile lands within the rank window") {
    val bytes = data.agg(kll_sketch_agg(col("v")).as("sk"))
      .select(kll_quantile(col("sk"), lit(0.5)).as("q"))
      .collect().head.getDouble(0)
    // true p50 of 0..9999 is ~5000; k=200 rank error ~1.65% => ±165
    // ranks; allow 5x
    assert(math.abs(bytes - 5000.0) < 825, s"p50 estimate $bytes")
  }

  test("partial + merge equals the single-level contract (mergeable summary)") {
    val parted = data.withColumn("g", (col("v") % 13).cast("int"))
    val merged = parted.groupBy("g").agg(kll_sketch_agg(col("v")).as("sk"))
      .agg(kll_merge_agg(col("sk")).as("m"))
      .select(kll_quantile(col("m"), lit(0.9)).as("q"))
      .collect().head.getDouble(0)
    assert(math.abs(merged - 9000.0) < 825, s"merged p90 estimate $merged")
  }

  test("nulls are skipped, not counted") {
    val withNulls = data.select(
      when(col("v") < 5000, col("v")).otherwise(lit(null)).as("v"))
    val q = withNulls.agg(kll_sketch_agg(col("v")).as("sk"))
      .select(kll_quantile(col("sk"), lit(0.5)).as("q"))
      .collect().head.getDouble(0)
    // if nulls entered, the median of [0,5000) would shift far above 2500
    assert(math.abs(q - 2500.0) < 450, s"null-skipping median $q")
  }

  test("empty input probes to null") {
    val q = data.filter(col("v") < 0).agg(kll_sketch_agg(col("v")).as("sk"))
      .select(kll_quantile(col("sk"), lit(0.5)).as("q"))
      .collect().head
    assert(q.isNullAt(0))
  }

  test("sketch bytes are small: O(k log n), not O(n)") {
    val n = data.agg(kll_sketch_agg(col("v")).as("sk"))
      .select(length(col("sk"))).collect().head.getInt(0)
    assert(n < 8192, s"sketch is $n bytes")
  }
}
