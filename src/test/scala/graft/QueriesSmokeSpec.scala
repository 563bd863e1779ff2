package graft

/** Every registered query builds and executes on sf0.001; known-cardinality
  * checks where the result size is structural. (Value-level correctness is
  * the driver's DuckDB gate + tools/check_oracle.py.)
  */
class QueriesSmokeSpec extends SparkSuite {

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} executes") {
      val n = q.build(spark, sf).count()
      // q20 (anti join) may legitimately be empty; everything else has rows
      if (q.name != "q20_anti_join") assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("every declared query carries an oracle (round-2 invariant)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("structural cardinalities") {
    assert(SparkEntry.queries("q05_topk")(spark, sf).count() == 30)
    assert(SparkEntry.queries("q16_watermark")(spark, sf).count() == 1)
    assert(SparkEntry.queries("x01_dedup_exact")(spark, sf).count() == 500)
  }
}
