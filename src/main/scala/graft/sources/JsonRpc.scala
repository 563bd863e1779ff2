package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal JSON-RPC 2.0 client with the reference's exact retry policy
  * (`starknetetl/utils/send_request.py:3-16`): up to `maxRetries`
  * attempts, fixed `sleepMs` backoff between them, per-request
  * `timeoutMs`, and — the subtle part — an HTTP 200 whose body carries
  * a JSON `error` member counts as a FAILED attempt (JSON-RPC servers
  * signal application errors in-band with status 200). Exhaustion
  * returns None, the reference's `return None` after the loop.
  *
  * Executor-side by design: the client is created inside the partition
  * (one per task, connections never serialized), and a post-exhaustion
  * failure in a Spark task is thrown so the TASK retries — the
  * scheduling layer the reference delegates to Airflow
  * (`export_blocks_and_events_dag.py:83-84`) is Spark's own task retry
  * here (SURVEY's S-8 call: infra, not an operator).
  *
  * Zero-egress discipline: nothing in the repo ever constructs a
  * non-loopback URL; `RpcLoopbackSpec` drives this client against a
  * stub node on 127.0.0.1 (real sockets, real HTTP, no egress).
  */
object JsonRpcClient {
  // One HttpClient per (executor JVM, connect timeout): HttpClient owns
  // a selector thread and a connection pool with no close() before
  // Java 21, so constructing one per partition-reader task accumulates
  // idle threads on a long-lived executor. connectTimeout is builder
  // state, hence the timeout key; request timeouts stay per-request.
  private val shared =
    new java.util.concurrent.ConcurrentHashMap[Long, java.net.http.HttpClient]()
  private[graft] def httpFor(timeoutMs: Long): java.net.http.HttpClient =
    shared.computeIfAbsent(timeoutMs, t =>
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(t))
        .build())
}

final class JsonRpcClient(
    val url: String,
    val maxRetries: Int = 5,
    val sleepMs: Long = 5000L,
    val timeoutMs: Long = 10000L) {

  private val http = JsonRpcClient.httpFor(timeoutMs)

  /** POST `payload` (already-serialized JSON), return the parsed body of
    * the first attempt that is HTTP 200 with no top-level `error`
    * member; None after `maxRetries` failed attempts.
    */
  def post(payload: String): Option[JsonNode] = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
      .build()
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      val parsed =
        try {
          val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() == 200) {
            val node = JsonRpc.mapper.readTree(resp.body())
            // batch responses are arrays; an `error` member only exists on
            // objects (the reference checks `'error' not in response.json()`,
            // which for a list checks ELEMENT membership — an error OBJECT
            // inside a batch passes that check, a quirk we do not replicate:
            // any element-level error fails the attempt here)
            val hasError =
              if (node.isArray) node.elements().asScala.exists(_.has("error"))
              else node.has("error")
            if (hasError) None else Some(node)
          } else None
        } catch {
          // NonFatal only: an InterruptedException here is Spark killing
          // the task (speculation, job cancel) — swallowing it into the
          // retry loop would delay cancellation by retries × sleepMs
          case scala.util.control.NonFatal(_) => None
        }
      parsed match {
        case some @ Some(_) => return some
        case None => if (attempt < maxRetries) Thread.sleep(sleepMs)
      }
    }
    None
  }
}

object JsonRpc {
  private[sources] val mapper = new ObjectMapper()

  /** The reference's hardcoded default event key filter
    * (`fetch_data.py:72-74`, the Transfer event selector).
    */
  val DefaultEventKey =
    "0x157717768aca88da4ac4279765f09f4d0151823d573537fbbeb950cdbd9a870"

  case class RpcEvent(
      block_number: Long,
      transaction_hash: String,
      from_address: String,
      event_key: String,
      data: Seq[String])

  /** `starknet_blockNumber` → the chain head (S-1's scalar watermark
    * input; `fetch_data.py:5-16`). None if the node never answered.
    */
  def latestBlock(client: JsonRpcClient): Option[Long] = {
    val p = mapper.createObjectNode()
    p.put("jsonrpc", "2.0").put("method", "starknet_blockNumber").put("id", 1)
    p.putArray("params")
    client.post(mapper.writeValueAsString(p)).map(_.get("result").asLong())
  }

  /** ONE batched POST for a whole slice — a JSON array of
    * `starknet_getBlockWithTxHashes` requests, one per block, id =
    * block_number (`fetch_data.py:18-46`). This is exactly the payload
    * shape a slice's `SlicePartitionReader` issues: the 10k-block slice
    * is the RPC batching unit AND the Spark InputPartition.
    */
  def blocksBatch(client: JsonRpcClient, from: Long, to: Long): Option[Seq[SlicedSource.FetchedBlock]] = {
    val arr = mapper.createArrayNode()
    (from to to).foreach { n =>
      val r = arr.addObject()
      r.put("jsonrpc", "2.0").put("method", "starknet_getBlockWithTxHashes").put("id", n)
      r.putArray("params").addObject().put("block_number", n)
    }
    client.post(mapper.writeValueAsString(arr)).map { node =>
      val rows = node.elements().asScala.map { el =>
        val b = el.get("result")
        // a malformed element carrying neither `error` (which fails the
        // attempt inside post()) nor `result` must fail with slice
        // context, not a bare NPE from the field reads below
        require(b != null && !b.isNull,
          s"blocks batch [$from,$to]: element id=" +
            s"${Option(el.get("id")).fold("?")(_.asText())} has no result member")
        SlicedSource.FetchedBlock(
          b.get("block_number").asLong(),
          b.get("block_hash").asText(),
          b.get("timestamp").asLong())
      }.toSeq
      // a 200-ok response covering only part of the batch is node
      // misbehavior, not success: emitting it would silently under-ingest
      // the slice (the reference iterates whatever came back —
      // a truncation bug class we don't replicate)
      require(rows.size == (to - from + 1).toInt,
        s"blocks batch [$from,$to]: node returned ${rows.size} of ${to - from + 1} results")
      // the count alone cannot see a duplicated-plus-missing combination;
      // require the returned id set to cover the range exactly
      val got = rows.map(_.block_number).toSet
      val missing = (from to to).filterNot(got)
      require(missing.isEmpty,
        s"blocks batch [$from,$to]: node response omits block(s) " +
          s"${missing.take(5).mkString(",")}${if (missing.size > 5) ",…" else ""}" +
          " (duplicates elsewhere kept the count right)")
      rows
    }
  }

  /** `starknet_getEvents` with the reference's pagination protocol
    * (`fetch_data.py:48-101`): the key filter and chunk_size ride IN the
    * request (the reference's own predicate pushdown — the server never
    * sends non-matching events), and the client re-POSTs with the
    * returned `continuation_token` until the server omits it. A
    * mid-pagination exhaustion returns None rather than a silent prefix
    * (the reference's while loop would return the partial list — a
    * truncation bug class we don't replicate; a task is all-or-nothing
    * so Spark's retry re-runs the whole slice).
    */
  def eventsPaged(
      client: JsonRpcClient,
      contractAddress: String,
      fromBlock: Long,
      toBlock: Long,
      chunkSize: Int = 5000,
      eventKey: String = DefaultEventKey,
      maxPages: Long = 1000000L): Option[Seq[RpcEvent]] = {
    def payload(token: Option[String]): String = {
      val p = mapper.createObjectNode()
      p.put("jsonrpc", "2.0").put("method", "starknet_getEvents").put("id", 1)
      val prm = p.putArray("params").addObject()
      prm.putObject("from_block").put("block_number", fromBlock)
      prm.putObject("to_block").put("block_number", toBlock)
      prm.put("address", contractAddress)
      prm.put("chunk_size", chunkSize)
      prm.putArray("keys").addArray().add(eventKey)
      token.foreach(prm.put("continuation_token", _))
      mapper.writeValueAsString(p)
    }
    val out = Seq.newBuilder[RpcEvent]
    var token: Option[String] = None
    var first = true
    var pages = 0L
    while (first || token.isDefined) {
      first = false
      pages += 1
      // a buggy/hostile node that keeps returning a continuation token
      // (or the same one forever) would otherwise spin this loop
      // unbounded inside an executor task — fail loudly instead
      require(pages <= maxPages,
        s"starknet_getEvents [$fromBlock,$toBlock]: exceeded $maxPages pages " +
          s"(runaway continuation token${token.fold("")(t => s" '$t'")})")
      client.post(payload(token)) match {
        case None => return None
        case Some(node) =>
          val result = node.get("result")
          result.get("events").elements().asScala.foreach { e =>
            out += RpcEvent(
              e.get("block_number").asLong(),
              e.get("transaction_hash").asText(),
              e.get("from_address").asText(),
              e.get("keys").get(0).asText(),
              e.get("data").elements().asScala.map(_.asText()).toSeq)
          }
          // some servers serialize the done state as an EXPLICIT
          // "continuation_token": null rather than omitting the member;
          // Jackson surfaces that as NullNode (not Java null), whose
          // asText() is the string "null" — without the isNull filter the
          // pager would re-POST with token "null" until maxPages trips
          token = Option(result.get("continuation_token"))
            .filterNot(_.isNull).map(_.asText())
      }
    }
    Some(out.result())
  }
}
