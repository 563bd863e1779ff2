package graft

import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.{BlockRangeSource, JsonRpc}

/** Shared loopback stub Starknet node for the RPC specs (round 9) —
  * real sockets on 127.0.0.1, zero egress. Deterministic corpus: the
  * chain head is `head` (mutable, so ingest-cycle specs can advance the
  * chain between cycles); block n's hash/timestamp use the engine's
  * shared formulas (so RPC-path rows are comparable with the fake-path
  * rows); block n carries three events for `address`: two with the
  * default Transfer key (tx suffixes "a","b") and one with OtherKey
  * ("c"). The events handler applies the requested key filter
  * SERVER-side and pages with `continuation_token` — the reference
  * node's contract (`fetch_data.py:48-101`). `failNext` makes the next
  * k requests fail (HTTP 500, or in-band JSON-RPC error objects when
  * `inBandError` is set). Every request body is recorded for
  * pushdown/pruning assertions.
  */
class StubStarknetNode(@volatile var head: Long, val address: String) {
  val mapper = new ObjectMapper()
  val requests = new java.util.concurrent.ConcurrentLinkedQueue[JsonNode]()
  val failNext = new AtomicInteger(0)
  @volatile var inBandError = false
  // round-10 tamper modes for the client's malformed-response contracts:
  // serialize the pagination done state as an EXPLICIT null token (some
  // servers do) instead of omitting the member
  @volatile var nullTokenWhenDone = false
  // batch element for this block id comes back with NO result member
  @volatile var dropResultFor: Long = -1L
  // (victim, impostor): victim's result carries impostor's block_number —
  // count stays right, coverage doesn't
  @volatile var misnumberBlock: Option[(Long, Long)] = None

  val OtherKey = "0xother"

  def eventsOf(n: Long): Seq[(String, String, Seq[String])] = Seq(
    (JsonRpc.DefaultEventKey, s"0xt${n}a", Seq(s"0x${n * 3}")),
    (JsonRpc.DefaultEventKey, s"0xt${n}b", Seq(s"0x${n * 3 + 1}")),
    (OtherKey, s"0xt${n}c", Seq(s"0x${n * 3 + 2}")))

  private def blockResult(n: Long) = {
    val r = mapper.createObjectNode()
    r.put("block_number", n)
    r.put("block_hash", BlockRangeSource.blockHash(n))
    r.put("timestamp", BlockRangeSource.blockTimestamp(n))
    r
  }

  val server: HttpServer = HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => {
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val req = mapper.readTree(body)
    requests.add(req)
    val out: (Int, String) =
      if (failNext.getAndUpdate(k => math.max(0, k - 1)) > 0) {
        if (inBandError) {
          val o = mapper.createObjectNode()
          o.putObject("error").put("code", -32000).put("message", "injected")
          (200, mapper.writeValueAsString(o))
        } else (500, "boom")
      } else if (req.isArray) {
        // batched starknet_getBlockWithTxHashes
        val arr = mapper.createArrayNode()
        req.elements().asScala.foreach { r =>
          val n = r.get("params").get(0).get("block_number").asLong()
          val o = arr.addObject()
          o.put("jsonrpc", "2.0").put("id", n)
          if (n != dropResultFor) {
            val eff = misnumberBlock match {
              case Some((victim, impostor)) if victim == n => impostor
              case _ => n
            }
            o.set[JsonNode]("result", blockResult(eff))
          }
        }
        (200, mapper.writeValueAsString(arr))
      } else req.get("method").asText() match {
        case "starknet_blockNumber" =>
          val o = mapper.createObjectNode()
          o.put("jsonrpc", "2.0").put("id", 1).put("result", head)
          (200, mapper.writeValueAsString(o))
        case "starknet_getEvents" =>
          val p = req.get("params").get(0)
          assert(p.get("address").asText() == address, "wrong contract address")
          val lo = p.get("from_block").get("block_number").asLong()
          val hi = p.get("to_block").get("block_number").asLong()
          val chunk = p.get("chunk_size").asInt()
          val keys = p.get("keys").get(0).elements().asScala.map(_.asText()).toSet
          val off = Option(p.get("continuation_token")).map(_.asText().toInt).getOrElse(0)
          // the key filter is applied SERVER-side — pushdown semantics
          val all = (lo to hi).flatMap(n => eventsOf(n).collect {
            case (k, tx, data) if keys.contains(k) => (n, k, tx, data)
          })
          val o = mapper.createObjectNode()
          val res = o.putObject("result")
          val evs = res.putArray("events")
          all.slice(off, off + chunk).foreach { case (n, k, tx, data) =>
            val e = evs.addObject()
            e.put("block_number", n)
            e.put("transaction_hash", tx)
            e.put("from_address", address)
            e.putArray("keys").add(k)
            val d = e.putArray("data"); data.foreach(d.add)
          }
          if (off + chunk < all.size)
            res.put("continuation_token", (off + chunk).toString)
          else if (nullTokenWhenDone)
            res.putNull("continuation_token")
          o.put("jsonrpc", "2.0").put("id", 1)
          (200, mapper.writeValueAsString(o))
      }
    val bytes = out._2.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(out._1, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  })
  server.start()
  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}/"
  def stop(): Unit = server.stop(0)
  def nRequests: Int = requests.size()
  def clear(): Unit = requests.clear()
}
