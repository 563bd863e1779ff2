package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import graft.api.ReportApi
import graft.pipeline.{Ingest, Report}

/** Entry point C end-to-end: publish the report, hit both HTTP endpoints
  * like the reference's FastAPI clients would.
  */
class ReportApiSpec extends SparkSuite {

  test("both endpoints serve ranked JSON off the published report") {
    val path = tempDir("graft-api-spec") + "/report"
    Ingest.publishReport(Report.rankedPairs(spark, sf), path)
    val server = ReportApi.start(spark, path, 0)
    val port = server.getAddress.getPort
    val client = HttpClient.newHttpClient()
    try {
      def get(url: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(new URI(url)).GET().build(),
          HttpResponse.BodyHandlers.ofString())

      val vol = get(s"http://localhost:$port/top_n_vol_token?top_n=3")
      assert(vol.statusCode() == 200)
      assert(vol.body().contains("top_tokens"))
      // top-1 by volume is the golden HOUSEHOLD/view pair at sf0.001
      assert(vol.body().indexOf("HOUSEHOLD/view") >= 0)
      assert(vol.body().split("\"pair\"").length == 4) // exactly 3 items

      val txn = get(s"http://localhost:$port/top_n_txn_token")
      assert(txn.statusCode() == 200 && txn.body().contains("txn_24h"))

      // client errors are 400 with a named reason, not 500
      val bad = get(s"http://localhost:$port/top_n_vol_token?top_n=abc")
      assert(bad.statusCode() == 400 && bad.body().contains("invalid top_n"))
      val neg = get(s"http://localhost:$port/top_n_vol_token?top_n=-1")
      assert(neg.statusCode() == 400)

      // empty-table behavior: point a server at an empty report
      val emptyPath = tempDir("graft-api-empty") + "/report"
      Ingest.publishReport(Report.rankedPairs(spark, sf).limit(0), emptyPath)
      val server2 = ReportApi.start(spark, emptyPath, 0)
      try {
        val none = get(s"http://localhost:${server2.getAddress.getPort}/top_n_vol_token")
        assert(none.statusCode() == 200 && none.body().contains("no data"))
      } finally server2.stop(0)
    } finally server.stop(0)
  }
}
