package graft

import org.apache.spark.sql.functions._

import graft.functions._

/** ExtractExpensiveSubexpressions: repeated expensive kernels in one
  * projection are hoisted and evaluated once, the optimizer reaches a
  * fixed point (no CollapseProject ping-pong), and results are
  * unchanged. (Inputs derive from `spark.range` — a local Seq relation
  * would be constant-folded away entirely and leave nothing to hoist.)
  */
class CseRuleSpec extends SparkSuite {
  import spark.implicits._

  // range(id) -> 'ff', '100', '101', ... (lowercase hex of id+255)
  private def hexDf(n: Int) =
    spark.range(n).select(lower(hex(col("id") + 255)).as("h"))

  private def limbsCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect { case e: U256Limbs => e }.size).sum
    }.sum

  test("element_at x5 over u256_limbs optimizes to ONE parse per row") {
    val df = hexDf(3)
    val limbs = u256_limbs(col("h"))
    val naive = df.select(
      u256_render(element_at(limbs, 1), element_at(limbs, 2), element_at(limbs, 3),
        element_at(limbs, 4), element_at(limbs, 5)).as("d"))
    // the authored plan carries five copies; the optimized plan exactly one
    assert(limbsCount(naive) == 1, naive.queryExecution.optimizedPlan.toString)
    // and the result is still correct (equal to the fused kernel)
    val fused = df.select(u256_render_limbs(u256_limbs(col("h"))).as("d"))
    assert(naive.as[String].collect().toSeq == fused.as[String].collect().toSeq)
    assert(naive.as[String].collect().toSeq == Seq("255", "256", "257"))
  }

  test("single occurrence is left alone (no gratuitous project split)") {
    val once = hexDf(1).select(u256_dec(col("h")).as("d"))
    val plan = once.queryExecution.optimizedPlan.toString
    assert(!plan.contains("_graft_cse_"), plan)
    assert(once.as[String].head() == "255")
  }

  test("mixed kernels: each distinct repeated kernel hoisted independently") {
    val df = spark.range(1).select(
      lower(hex(col("id") + 255)).as("h"),
      concat(lit("t"), col("id")).as("t"))
    val hexd = hex_to_decimal(col("h"))
    val fp = md5_prefix60(col("t").cast("binary"))
    val q = df.select((hexd + hexd).as("two_hex"), (fp - fp).as("zero_fp"),
      hexd.cast("string").as("hex_str"))
    val optimized = q.queryExecution.optimizedPlan
    val nHex = optimized.collect { case p =>
      p.expressions.map(_.collect { case e: HexToDecimal => e }.size).sum
    }.sum
    val nFp = optimized.collect { case p =>
      p.expressions.map(_.collect { case e: Md5Prefix60 => e }.size).sum
    }.sum
    assert(nHex == 1, optimized.toString)
    assert(nFp == 1, optimized.toString)
    val r = q.head()
    assert(r.getDecimal(0).longValue() == 510L)
    assert(r.getLong(1) == 0L)
    assert(r.getString(2) == "255")
  }

  test("conditional-only duplicates are NOT hoisted; one unconditional occurrence unlocks extraction") {
    val df = hexDf(3)
    val dec = u256_dec(col("h"))
    // both occurrences live inside when() branches: hoisting would force
    // the parse on 100% of rows where the plan runs it on the
    // branch-taken fraction — the rule must leave this alone
    val condOnly = df.select(
      when(col("h") === "ff", dec).otherwise(lit(null)).as("a"),
      when(col("h") === "100", dec).otherwise(lit(null)).as("b"))
    assert(!condOnly.queryExecution.optimizedPlan.toString.contains("_graft_cse_"),
      condOnly.queryExecution.optimizedPlan.toString)
    // an unconditional third occurrence already pays the every-row cost,
    // so extraction strictly wins and all three collapse to one
    val mixed = df.select(dec.as("always"),
      when(col("h") === "ff", dec).otherwise(lit(null)).as("a"),
      when(col("h") === "100", dec).otherwise(lit(null)).as("b"))
    val n = mixed.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect { case e: U256DecString => e }.size).sum
    }.sum
    assert(n == 1, mixed.queryExecution.optimizedPlan.toString)
    assert(mixed.select(col("always")).as[String].collect().toSeq ==
      Seq("255", "256", "257"))
  }

  test("rule holds under the extensions-injected path too (GraftSession)") {
    // `spark` from SparkSuite is built via GraftSession.build → the rule
    // runs inside the operator-optimization fixed point alongside
    // CollapseProject; reaching this assertion at all means no
    // max-iterations blowup, and the dedup held
    val df = hexDf(1)
    val limbs = u256_limbs(col("h"))
    val q = df.select(element_at(limbs, 1).as("l0"), element_at(limbs, 2).as("l1"))
    assert(limbsCount(q) == 1, q.queryExecution.optimizedPlan.toString)
    assert(q.as[(Long, Long)].head() == ((255L, 0L)))
  }
}
