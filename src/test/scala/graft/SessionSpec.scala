package graft

/** GraftSession: SQL-text user experience over registered views with the
  * injected functions (the ClickHouse-SQL shape of the reference).
  */
class SessionSpec extends SparkSuite {

  test("registerTables + spark.sql runs a reference-shaped text query") {
    GraftSession.registerTables(spark, sf)
    val top = spark.sql(
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q
        |FROM lineitem GROUP BY l_returnflag ORDER BY n DESC LIMIT 3""".stripMargin)
      .collect()
    assert(top.length == 3)
    assert(top.head.getLong(1) >= top.last.getLong(1))
  }

  test("injected functions usable from SQL text over views") {
    GraftSession.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT p_partkey,
        |       hex_to_decimal(concat('0x', lower(hex(p_partkey)))) AS back
        |FROM part ORDER BY p_partkey LIMIT 5""".stripMargin).collect()
    r.foreach(row => assert(row.getDecimal(1).longValueExact() == row.getLong(0)))
  }

  test("GraftExtensions applies cleanly to a fresh extensions set") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; function list injected
  }
}
