package graft

import graft.pipeline.{Ingest, Report}

/** §3.2/§3.3 end-to-end: compute → publish (K-3) → serve (API shape). */
class ReportSpec extends SparkSuite {

  test("publish then serve both report flavors off the parquet layer") {
    val path = tempDir("graft-report") + "/top_pairs"
    Ingest.publishReport(Report.rankedPairs(spark, sf), path)

    val byVol = Report.serve(spark, path, "vol_24h", 5).collect()
    assert(byVol.length == 5)
    val vols = byVol.map(_.getDecimal(1).doubleValue())
    assert(vols.sameElements(vols.sorted.reverse), "not sorted by vol desc")

    val byTxn = Report.serve(spark, path, "txn_24h", 5).collect()
    val txns = byTxn.map(_.getLong(2))
    assert(txns.sameElements(txns.sorted.reverse), "not sorted by txn desc")
  }

  test("topPairs and topPairsByTxn both cap at 30 over the shared aggregate") {
    val vol = Report.topPairs(spark, sf).collect().map(_.getString(0))
    val txn = Report.topPairsByTxn(spark, sf).collect().map(_.getString(0))
    assert(vol.nonEmpty && vol.length <= 30)
    assert(txn.nonEmpty && txn.length <= 30)
    assert(vol.distinct.length == vol.length, "duplicate pairs in ranking")
  }
}
