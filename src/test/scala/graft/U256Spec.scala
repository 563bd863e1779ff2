package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions._

/** uint256 limb family: the scale path past Decimal(38,0) (ROADMAP
  * "uint256 ceiling"). Ground truth is java BigInteger on the driver.
  */
class U256Spec extends SparkSuite {
  import spark.implicits._

  private def groundTruth(hex: String): String = new java.math.BigInteger(hex, 16).toString

  private val edge = Seq(
    "0", "1", "f", "a0", "ffffffffffffffff", // <= 64-bit
    "ffffffffffffffffffffffffffffffff", // 2^128-1
    "100000000000000000000000000000000", // 2^128
    "0de0b6b3a7640000", // 10^18 (limb base)
    "0de0b6b3a763ffff",
    "f" * 64, // 2^256-1
    "8000000000000000000000000000000000000000000000000000000000000000")

  private def randHexes(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val nibbles = 1 + rnd.nextInt(64)
      Seq.fill(nibbles)("0123456789abcdef".charAt(rnd.nextInt(16))).mkString
    }
  }

  test("u256_dec and the limb render both equal BigInteger, 0x and case tolerated") {
    val hexes = edge ++ randHexes(300, seed = 41)
    val df = hexes.zipWithIndex.map { case (h, i) => (i, "0x" + h.toUpperCase) }.toDF("i", "h")
    val limbs = u256_limbs(col("h"))
    val got = df.select(col("i"), u256_dec(col("h")).as("d1"),
        u256_render(element_at(limbs, 1), element_at(limbs, 2), element_at(limbs, 3),
          element_at(limbs, 4), element_at(limbs, 5)).as("d2"),
        u256_render_limbs(u256_limbs(col("h"))).as("d3"))
      .as[(Int, String, String, String)].collect().sortBy(_._1)
    got.zip(hexes).foreach { case ((_, d1, d2, d3), h) =>
      assert(d1 == groundTruth(h), s"u256_dec($h)")
      assert(d2 == groundTruth(h), s"u256_render(limbs($h))")
      assert(d3 == groundTruth(h), s"u256_render_limbs(limbs($h))")
    }
  }

  test("garbage contract: null/empty/non-hex/oversized all yield null, never corrupt") {
    val bad = Seq(null, "", "0x", "xyz", "12 34", "-ff", "f" * 65, "0x" + "f" * 65)
    val df = bad.zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "h")
    val got = df.select(u256_dec(col("h")), u256_limbs(col("h")),
      u256_render_limbs(u256_limbs(col("h")))).collect()
    assert(got.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)))
  }

  test("grouped u256 sum is exact over values that overflow Decimal(38,0) thousands of times") {
    val rnd = new scala.util.Random(97)
    val rows = (1 to 2000).map { i =>
      val h = Seq.fill(64)("0123456789abcdef".charAt(rnd.nextInt(16))).mkString
      (i % 3, h)
    }
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(r => BigInt(r._2, 16)).sum.toString).toMap
    val got = rows.toDF("g", "h")
      .groupBy(col("g"))
      .agg(u256_sum_dec(u256_limbs(col("h"))).as("total"))
      .as[(Int, String)].collect().toMap
    assert(got == expected)
  }

  test("u256_render carry-normalizes arbitrary (unnormalized) limb magnitudes") {
    // limbs deliberately far above the base: 5 * 10^30 in every position
    val big = java.math.BigDecimal.valueOf(5).scaleByPowerOfTen(30)
    val df = Seq(1).toDF("one").select(
      u256_render(lit(big).cast(DecimalType(38, 0)), lit(big).cast(DecimalType(38, 0)),
        lit(big).cast(DecimalType(38, 0)), lit(big).cast(DecimalType(38, 0)),
        lit(big).cast(DecimalType(38, 0))).as("s"))
    val b = BigInt(10).pow(30) * 5
    val base = BigInt(10).pow(18)
    val expected = (0 to 4).map(i => b * base.pow(i)).sum.toString
    assert(df.as[String].head() == expected)
  }

  test("SQL registration: u256_dec / u256_limbs / u256_render_limbs resolve in spark.sql") {
    graft.functions.registerAll(spark)
    val r = spark.sql(s"SELECT u256_dec('0x${"f" * 64}') AS d, u256_limbs('ff')[0] AS l0, " +
        "u256_render_limbs(u256_limbs('ff')) AS r")
      .as[(String, Long, String)].head()
    assert(r._1 == groundTruth("f" * 64))
    assert(r._2 == 255L)
    assert(r._3 == "255")
  }
}
