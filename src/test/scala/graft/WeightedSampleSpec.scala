package graft

import org.apache.spark.sql.functions._

import graft.ext.{TextDedup, TextStats}

/** x96 sequential-Poisson weighted sampling (round-10). */
class WeightedSampleSpec extends SparkSuite {

  // 500 heavy docs (w=100) + 500 light (w=1): inclusion odds ~100:1
  private def corpus = spark.range(0, 1000).select(
    col("id").as("doc_id"),
    when(col("id") < 500, 100L).otherwise(1L).as("w"))

  test("returns exactly n rows; the whole corpus when n exceeds it") {
    assert(TextStats.weightedSample(corpus, col("w"), 50).count() == 50)
    val tiny = spark.range(0, 10).select(col("id").as("doc_id"), lit(2L).as("w"))
    assert(TextStats.weightedSample(tiny, col("w"), 50).count() == 10)
  }

  test("deterministic and partitioning-invariant") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      TextStats.weightedSample(df, col("w"), 50)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids(corpus) == ids(corpus.repartition(17)))
    assert(ids(corpus) == ids(corpus))
  }

  test("heavy weights dominate the sample (100:1 odds, 50 of 1000)") {
    val heavy = TextStats.weightedSample(corpus, col("w"), 50)
      .filter(col("doc_id") < 500).count()
    assert(heavy >= 45, s"only $heavy/50 sampled docs were heavy-weight")
  }

  test("non-positive weights are never sampled") {
    val in = spark.range(0, 100).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, lit(-1L)).otherwise(lit(5L)).as("w"))
    val got = TextStats.weightedSample(in, col("w"), 100).collect()
    assert(got.length == 50)
    assert(got.forall(_.getAs[Long]("w") == 5L))
  }

  test("priority is exactly portable-hash div weight") {
    val one = spark.range(7, 8).select(col("id").as("doc_id"), lit(3L).as("w"))
    val row = TextStats.weightedSample(one, col("w"), 1).collect().head
    val h = spark.range(7, 8)
      .select(TextDedup.portableHash(col("id").cast("string"), "pps").as("h"))
      .collect().head.getAs[Long]("h")
    assert(row.getAs[Long]("priority") == h / 3L)
  }

  test("plans as TakeOrderedAndProject — no global sort of the corpus") {
    val plan = TextStats.weightedSample(corpus, col("w"), 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("threshold path is row-identical to the single-pass form") {
    val plain = TextStats.weightedSample(corpus, col("w"), 50)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("priority"))).toSet
    val thresh = TextStats.weightedSampleThreshold(corpus, col("w"), 50)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("priority"))).toSet
    assert(thresh == plain)
  }

  test("threshold fallback (empty pilot on a tiny corpus) is still exact") {
    // 30 docs at a 1% pilot rate: the pilot is almost surely empty, the
    // survivor count check trips, and the fallback single-pass form runs
    val tiny = spark.range(0, 30).select(col("id").as("doc_id"),
      (col("id") % 7 + 1).as("w"))
    val plain = TextStats.weightedSample(tiny, col("w"), 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val thresh = TextStats.weightedSampleThreshold(tiny, col("w"), 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(thresh == plain)
  }

  test("threshold path is partitioning-invariant too") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      TextStats.weightedSampleThreshold(df, col("w"), 50)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids(corpus) == ids(corpus.repartition(17)))
  }

  test("grouped sample: exactly n per group, small groups kept whole") {
    val in = spark.range(0, 300).select(
      col("id").as("doc_id"),
      when(col("id") < 280, "big").otherwise("small").as("src"),
      (col("id") % 5 + 1).as("w"))
    val got = TextStats.weightedSamplePerGroup(in, "src", col("w"), 25)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("big" -> 25L, "small" -> 20L))
  }

  test("grouped sample agrees with the global sample run per group") {
    val in = spark.range(0, 200).select(
      col("id").as("doc_id"),
      (col("id") % 3).cast("string").as("src"),
      (col("id") % 7 + 1).as("w"))
    val grouped = TextStats.weightedSamplePerGroup(in, "src", col("w"), 12)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("doc_id"))).toSet
    val perGroup = (0 until 3).flatMap { g =>
      TextStats.weightedSample(in.filter(col("src") === g.toString), col("w"), 12)
        .collect().map(r => (g.toString, r.getAs[Long]("doc_id")))
    }.toSet
    assert(grouped == perGroup)
  }
}
