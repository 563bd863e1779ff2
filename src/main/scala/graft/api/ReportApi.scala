package graft.api

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession

import graft.pipeline.Report

/** Entry point C of the reference (SURVEY §3.3, api/ekubo_api.py): two
  * GET endpoints serving the precomputed report table ranked by either
  * metric. Implemented over the JDK's built-in HTTP server (zero extra
  * dependencies) reading the published report parquet through
  * [[Report.serve]] — same endpoints, same response shape:
  *
  *   GET /top_n_vol_token?top_n=30  →  {"top_tokens": [...]}
  *   GET /top_n_txn_token?top_n=30
  *
  * Error behavior mirrors the reference: empty table → message body;
  * failure → HTTP 500 (`ekubo_api.py:39-45,60-66`).
  */
object ReportApi {

  /** Cached read of the report table that survives truncate-and-replace
    * publishes (round-2, ADVICE.md): the plan (file listing + footers) is
    * resolved once and reused per request — per-request spark.read would
    * pay full metadata cost each GET — but when a publish invalidates the
    * listing (request throws FileNotFound), the handle refreshes the
    * path's cached listing and retries once instead of 500-ing until
    * restart. `refresh()` is also the publish hook: call it right after
    * `Ingest.publishReport` for a zero-failed-request handover.
    */
  final class ReportHandle(spark: SparkSession, path: String) {
    @volatile private var cached: org.apache.spark.sql.DataFrame = doLoad()
    private def doLoad(): org.apache.spark.sql.DataFrame = {
      spark.catalog.refreshByPath(path)
      spark.read.parquet(path)
    }
    def df: org.apache.spark.sql.DataFrame = cached
    def refresh(): org.apache.spark.sql.DataFrame = synchronized { cached = doLoad(); cached }
  }

  def start(spark: SparkSession, reportPath: String, port: Int): HttpServer =
    startWithHandle(spark, reportPath, port)._1

  /** Version-tracking handle over a [[graft.pipeline.ManifestTable]]
    * report: each access does one cheap manifest-directory listing and
    * re-resolves the DataFrame only when the committed version moved —
    * so a long-lived server picks up every
    * `Ingest.publishReportManifested` with zero failed requests and
    * without paying parquet-footer metadata cost per GET.
    */
  final class ManifestedReportHandle(spark: SparkSession, root: String) {
    @volatile private var state: (Long, org.apache.spark.sql.DataFrame) = load()
    private def load(): (Long, org.apache.spark.sql.DataFrame) = {
      val v = graft.pipeline.ManifestTable.currentVersion(spark, root)
        .getOrElse(sys.error(s"no committed report at $root"))
      (v, graft.pipeline.ManifestTable.read(spark, root))
    }
    def df: org.apache.spark.sql.DataFrame = {
      val current = graft.pipeline.ManifestTable.currentVersion(spark, root)
      if (!current.contains(state._1)) synchronized {
        if (!current.contains(state._1)) state = load()
      }
      state._2
    }
  }

  /** Serve a manifested report table (gap-free publishes, see
    * [[ManifestedReportHandle]]).
    */
  def startManifested(spark: SparkSession, reportRoot: String, port: Int): HttpServer = {
    val handle = new ManifestedReportHandle(spark, reportRoot)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/top_n_vol_token",
      (ex: HttpExchange) => handleManifested(ex, handle, "vol_24h"))
    server.createContext("/top_n_txn_token",
      (ex: HttpExchange) => handleManifested(ex, handle, "txn_24h"))
    server.start()
    server
  }

  private def handleManifested(ex: HttpExchange, h: ManifestedReportHandle,
      metric: String): Unit = {
    // the DataFrame is version-pinned for the whole request; "retry" is
    // simply re-resolving the handle (a newer committed version)
    handleWith(ex, metric, () => h.df, () => h.df)
  }

  /** Like [[start]] but also returns the [[ReportHandle]], so a publisher
    * can call `handle.refresh()` right after `Ingest.publishReport` for a
    * zero-failed-request handover (round-2 review: start() alone kept the
    * handle unreachable, forcing the first post-publish request through
    * the throw-refresh-retry path).
    */
  def startWithHandle(spark: SparkSession, reportPath: String, port: Int): (HttpServer, ReportHandle) = {
    val report = new ReportHandle(spark, reportPath)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/top_n_vol_token", (ex: HttpExchange) => handle(ex, report, "vol_24h"))
    server.createContext("/top_n_txn_token", (ex: HttpExchange) => handle(ex, report, "txn_24h"))
    server.start()
    (server, report)
  }

  private def handle(ex: HttpExchange, report: ReportHandle, metric: String): Unit =
    handleWith(ex, metric, () => report.df, () => report.refresh())

  private def handleWith(ex: HttpExchange, metric: String,
      get: () => org.apache.spark.sql.DataFrame,
      onFailure: () => org.apache.spark.sql.DataFrame): Unit = {
    val topN: Either[String, Int] = Option(ex.getRequestURI.getQuery)
      .flatMap(_.split("&").collectFirst {
        case kv if kv.startsWith("top_n=") => kv.stripPrefix("top_n=")
      }) match {
      case None => Right(30)
      case Some(raw) => raw.toIntOption.filter(_ > 0)
        .toRight(s"invalid top_n: '$raw' (positive integer required)")
    }
    val (code, body) = topN match {
      case Left(msg) => (400, s"""{"error": ${jsonStr(msg)}}""")
      case Right(n) =>
        def serveOnce(df: org.apache.spark.sql.DataFrame): (Int, String) = {
          val rows = Report.serveFrom(df, metric, n).collect()
          if (rows.isEmpty) (200, """{"message": "no data"}""")
          else {
            val items = rows.map { r =>
              val vol = Option(r.getDecimal(1)).map(_.toPlainString).getOrElse("null")
              s"""{"pair": ${jsonStr(r.getString(0))}, "vol_24h": $vol, "txn_24h": ${r.getLong(2)}}"""
            }
            (200, items.mkString("""{"top_tokens": [""", ", ", "]}"))
          }
        }
        try serveOnce(get())
        catch {
          // Refresh-and-retry ONLY for a stale file listing (a publish
          // replaced the table under the cached plan). Any other failure
          // is deterministic — retrying would rerun the full collect and
          // report the SECOND error, masking the original — so it goes
          // straight to 500 with the first error.
          case e: Throwable if isStaleListing(e) =>
            try serveOnce(onFailure())
            catch {
              case e2: Throwable => (500, s"""{"error": ${jsonStr(String.valueOf(e2.getMessage))}}""")
            }
          case e: Throwable =>
            (500, s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}""")
        }
    }
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** True when the failure chain indicates the scan read a file listing
    * that a concurrent publish invalidated: FileNotFoundException (incl.
    * Spark's SparkFileNotFoundException subclass) anywhere in the cause
    * chain, or Spark's REFRESH-TABLE guidance wrapped in a runtime error.
    */
  private def isStaleListing(t: Throwable): Boolean = {
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).exists { c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        Option(c.getMessage).exists(_.contains("REFRESH TABLE"))
    }
  }

  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Standalone: publish the flagship report from an sf dir, then serve.
    *   sbt 'runMain graft.api.ReportApi /root/testdata/sf0.001 8080'
    */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val port = if (args.length > 1) args(1).toInt else 8080
    val spark = graft.GraftSession.build("local[4]", 4)
    val reportPath = graft.util.Scratch.tempDir("graft-api") + "/report"
    graft.pipeline.Ingest.publishReport(Report.rankedPairs(spark, sfDir), reportPath)
    start(spark, reportPath, port)
    println(s"[api] serving /top_n_vol_token and /top_n_txn_token on :$port")
    Thread.currentThread().join()
  }
}
