package graft

import org.apache.spark.sql.functions._

/** DataSourceV2 block-range source: slice-aligned partition planning,
  * bound-predicate pushdown that PRUNES slices (not post-filters), and
  * column pruning reaching the reader.
  */
class BlockRangeSourceSpec extends SparkSuite {
  import spark.implicits._

  private def read(from: Long, to: Long, slice: Long = 10000) =
    spark.read.format("blockrange")
      .option("from", from).option("to", to).option("slice", slice).load()

  test("full read matches the fakeBlockFetcher content, slice-per-partition") {
    val df = read(1000000, 1019999, slice = 5000)
    assert(df.rdd.getNumPartitions == 4, "ceil(20000/5000) slices")
    val got = df.as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.length == 20000)
    val expected = graft.sources.SlicedSource
      .fakeBlockFetcher(Iterator(1000000L, 1010000L, 1019999L)).toSeq
    for (e <- expected) {
      val g = got(e.block_number.toInt - 1000000)
      assert((g._1, g._2, g._3) == (e.block_number, e.block_hash, e.block_timestamp))
    }
  }

  test("block_number bounds prune planned slices, not rows-after-scan") {
    val df = read(1000000, 1099999, slice = 10000) // 10 slices
      .filter($"block_number" >= 1057000 && $"block_number" < 1072000)
    // pruned range [1057000, 1071999] spans 2 slices of the re-planned
    // range (15000 blocks / 10000)
    assert(df.rdd.getNumPartitions == 2, df.rdd.getNumPartitions.toString)
    assert(df.count() == 15000)
    val mm = df.agg(min($"block_number"), max($"block_number")).as[(Long, Long)].head()
    assert(mm == ((1057000L, 1071999L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BlockRangeScan[1057000..1071999"), plan)
  }

  test("equality bound plans exactly one single-block slice") {
    val df = read(1000000, 1999999).filter($"block_number" === 1234567)
    assert(df.rdd.getNumPartitions == 1)
    val r = df.as[(Long, String, Long)].head()
    assert(r == ((1234567L, graft.sources.BlockRangeSource.blockHash(1234567L), 1701234567L)))
  }

  test("non-bound predicates stay post-scan residuals and still apply") {
    val df = read(1000000, 1000999)
      .filter($"block_number" <= 1000499 && $"block_hash".endsWith("0"))
    val viaSpark = df.as[(Long, String, Long)].collect()
    val expected = (1000000L to 1000499L)
      .filter(n => graft.sources.BlockRangeSource.blockHash(n).endsWith("0"))
    assert(viaSpark.map(_._1).sorted.toSeq == expected)
    assert(viaSpark.forall(r => r._2.endsWith("0")))
  }

  test("column pruning reaches the reader schema") {
    val df = read(1000000, 1000099).select($"block_timestamp")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=block_timestamp]"), plan)
    assert(df.as[Long].collect().sorted.toSeq == (1700000000L + 1000000L to 1700000000L + 1000099L))
  }

  test("contradictory bounds plan zero partitions") {
    val df = read(1000000, 1000999).filter($"block_number" > 2000000)
    assert(df.count() == 0)
    assert(df.rdd.getNumPartitions == 0)
  }
}
