package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._

import graft.functions.hex_to_decimal

/** FIXTURES.md §B.1: hex→decimal edge cases, eval + codegen + SQL paths,
  * BigInteger as the reference implementation.
  */
class HexToDecimalSpec extends SparkSuite {
  import spark.implicits._

  private def run(s: String): Option[BigDecimal] = {
    val r = Seq(s).toDF("h").select(hex_to_decimal(col("h")).as("d")).first()
    if (r.isNullAt(0)) None else Some(r.getDecimal(0))
  }

  test("basic values, prefix variants") {
    assert(run("0x0").contains(BigDecimal(0)))
    assert(run("0x1").contains(BigDecimal(1)))
    assert(run("0xff").contains(BigDecimal(255)))
    assert(run("FF").contains(BigDecimal(255)))
    assert(run("0XfF").contains(BigDecimal(255)))
    assert(run(" 0xff ").contains(BigDecimal(255)))
  }

  test("64-bit boundary and beyond (conv() would saturate here)") {
    assert(run("0xffffffffffffffff").contains(BigDecimal("18446744073709551615")))
    // 31 hex digits = 124 bits, still > 64-bit but within Decimal(38,0)
    assert(run("0x" + "f" * 31).contains(BigDecimal(new BigInteger("f" * 31, 16))))
    // 32 hex digits (uint128 max ≈ 3.4e38) exceeds 10^38-1 → saturates to null
    assert(run("0x" + "f" * 32).isEmpty)
  }

  test("overflow past Decimal(38,0) → null") {
    assert(run("0x" + "f" * 40).isEmpty)
  }

  test("garbage, empty, null → null") {
    assert(run("0xzz").isEmpty)
    assert(run("").isEmpty)
    assert(run("0x").isEmpty)
    val r = Seq(Option.empty[String]).toDF("h")
      .select(hex_to_decimal(col("h")).as("d")).first()
    assert(r.isNullAt(0))
  }

  test("SQL registration path resolves") {
    val r = spark.sql("SELECT hex_to_decimal('0xdeadbeef') AS d").first()
    assert(r.getDecimal(0) == new java.math.BigDecimal(new BigInteger("deadbeef", 16)))
  }

  test("property: matches BigInteger for random hex up to 30 digits (seeded)") {
    val rnd = new scala.util.Random(42)
    val digits = "0123456789abcdefABCDEF"
    val cases = Seq.fill(200) {
      val n = 1 + rnd.nextInt(30)
      (1 to n).map(_ => digits(rnd.nextInt(digits.length))).mkString
    }
    // one DataFrame pass: exercises codegen over a batch, not row-at-a-time
    val got = cases.toDF("h")
      .select(col("h"), hex_to_decimal(concat(lit("0x"), col("h"))).as("d"))
      .collect()
    got.foreach { r =>
      val expected = new BigInteger(r.getString(0), 16)
      assert(BigDecimal(r.getDecimal(1)) == BigDecimal(expected), r.getString(0))
    }
  }
}
