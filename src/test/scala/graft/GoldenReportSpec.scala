package graft

/** SURVEY §5.4: end-to-end golden test — the flagship report on sf0.001
  * pinned row-for-row (deterministic clock = max(ts), decimal-exact
  * volumes, total tie-break ordering). Any change to the pipeline's
  * semantics — window boundary, join type, default fill, pair key,
  * aggregation — moves at least one of these rows.
  */
class GoldenReportSpec extends SparkSuite {

  test("flagship entry: golden head rows and cardinality at sf0.001") {
    val got = SparkEntry.entry(spark).collect()
      .map(r => (r.getString(0), r.getDecimal(1).toPlainString, r.getLong(2)))
    assert(got.length == 18)
    assert(got.take(8).toSeq == Seq(
      ("HOUSEHOLD/view", "12691.820000", 4L),
      ("HOUSEHOLD/click", "11382.390000", 3L),
      ("FURNITURE/purchase", "9407.840000", 2L),
      ("BUILDING/purchase", "7075.490000", 3L),
      ("HOUSEHOLD/signup", "5867.360000", 2L),
      ("MACHINERY/error", "5686.520000", 1L),
      ("HOUSEHOLD/error", "5216.100000", 3L),
      ("BUILDING/view", "4235.260000", 3L)))
    // ranking is strictly non-increasing with pair tie-break
    val vols = got.map(t => BigDecimal(t._2))
    assert(vols.zip(vols.tail).forall { case (a, b) => a >= b })
  }
}
