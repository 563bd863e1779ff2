package graft

import scala.jdk.CollectionConverters._

import graft.pipeline.Ingest.BlockRange
import graft.sources.{BlockRangeSource, JsonRpc, JsonRpcClient, SlicedSource}

/** Round-9 closure of the last S-2/S-3 delta: the JSON-RPC fetcher
  * shape of `starknetetl/fetch_data.py:18-101` proven over REAL
  * loopback sockets with zero egress — a stub node on 127.0.0.1 serves
  * `starknet_blockNumber`, batched `starknet_getBlockWithTxHashes`, and
  * `starknet_getEvents` with continuation-token pagination, and the
  * engine's client/source drive it through real HTTP:
  *
  *  - retry policy (`send_request.py:3-16`): 5 attempts, fixed backoff,
  *    in-band JSON-RPC `error` on HTTP 200 counts as a failed attempt;
  *  - pagination: the events pager follows `continuation_token` until
  *    the server omits it, and the key filter + chunk_size ride in
  *    EVERY request (server-side pushdown);
  *  - Spark slice pruning reaches the WIRE: a `block_number` filter on
  *    the DataSourceV2 read means pruned slices are never requested.
  */
class RpcLoopbackSpec extends SparkSuite {

  private val Addr = "0x04718f5a0fc34cc1af16a1cdee98ffb20c31f5cd61d6ab07201858f4287c938d"

  test("retry policy: 500s and in-band JSON-RPC errors both retry; success on a later attempt") {
    val node = new StubStarknetNode(head = 1234567L, Addr)
    try {
      val client = new JsonRpcClient(node.url, maxRetries = 5, sleepMs = 5, timeoutMs = 2000)
      node.failNext.set(2)
      assert(JsonRpc.latestBlock(client) == Some(1234567L))
      assert(node.nRequests == 3, "2 failed attempts + 1 success")

      // in-band error member on HTTP 200 must ALSO count as a failed
      // attempt (send_request.py checks 'error' not in response.json())
      node.clear(); node.inBandError = true; node.failNext.set(1)
      assert(JsonRpc.latestBlock(client) == Some(1234567L))
      assert(node.nRequests == 2)
    } finally node.stop()
  }

  test("retry exhaustion: exactly maxRetries attempts, then None") {
    val node = new StubStarknetNode(head = 7L, Addr)
    try {
      val client = new JsonRpcClient(node.url, maxRetries = 5, sleepMs = 5, timeoutMs = 2000)
      node.failNext.set(1000)
      assert(JsonRpc.latestBlock(client).isEmpty)
      assert(node.nRequests == 5, "the reference's 5-attempt policy")
    } finally node.stop()
  }

  test("blocks: ONE batched POST per slice, rows identical to the deterministic formulas") {
    val node = new StubStarknetNode(head = 2000000L, Addr)
    try {
      val client = new JsonRpcClient(node.url, maxRetries = 5, sleepMs = 5, timeoutMs = 2000)
      val got = JsonRpc.blocksBatch(client, 1000000L, 1000019L).get
      assert(node.nRequests == 1, "a 20-block slice is ONE batched request")
      assert(node.requests.peek().size() == 20, "one sub-request per block, array payload")
      assert(got == (1000000L to 1000019L).map(n => SlicedSource.FetchedBlock(
        n, BlockRangeSource.blockHash(n), BlockRangeSource.blockTimestamp(n))))
    } finally node.stop()
  }

  test("events: continuation-token pagination with the key filter in every request") {
    val node = new StubStarknetNode(head = 0L, Addr)
    try {
      val client = new JsonRpcClient(node.url, maxRetries = 5, sleepMs = 5, timeoutMs = 2000)
      // blocks 10..14: 5 blocks x 2 Transfer events = 10 events; chunk 4
      // => pages of 4, 4, 2 = 3 requests
      val evs = JsonRpc.eventsPaged(client, Addr, 10L, 14L, chunkSize = 4).get
      assert(evs.size == 10)
      assert(node.nRequests == 3, "ceil(10/4) pages")
      assert(evs.forall(_.event_key == JsonRpc.DefaultEventKey),
        "server-side key filter: only Transfer events crossed the wire")
      assert(evs.map(_.transaction_hash).toSet ==
        (10L to 14L).flatMap(n => Seq(s"0xt${n}a", s"0xt${n}b")).toSet)
      // EVERY request (including continuation pages) re-states the filter
      node.requests.asScala.foreach { r =>
        val p = r.get("params").get(0)
        assert(p.get("keys").get(0).get(0).asText() == JsonRpc.DefaultEventKey)
        assert(p.get("chunk_size").asInt() == 4)
      }
      // a different key selects the other event family
      node.clear()
      val others = JsonRpc.eventsPaged(client, Addr, 10L, 14L, chunkSize = 4,
        eventKey = node.OtherKey).get
      assert(others.size == 5 && others.forall(_.transaction_hash.endsWith("c")))
    } finally node.stop()
  }

  test("pagination boundaries: chunk dividing exactly, chunk 1, chunk > total, empty result") {
    val node = new StubStarknetNode(head = 0L, Addr)
    try {
      val client = new JsonRpcClient(node.url, maxRetries = 5, sleepMs = 5, timeoutMs = 2000)
      // 5 blocks x 2 = 10 events
      def run(chunk: Int): (Int, Int) = {
        node.clear()
        val evs = JsonRpc.eventsPaged(client, Addr, 10L, 14L, chunkSize = chunk).get
        (evs.size, node.nRequests)
      }
      // chunk divides the total exactly: the last FULL page still omits
      // the token only because off+chunk == total, not off+chunk < total
      // — the boundary where an off-by-one pager would loop forever or
      // fetch one empty extra page
      assert(run(5) == ((10, 2)), "10/5 = exactly 2 pages")
      assert(run(10) == ((10, 1)), "single exact page")
      assert(run(1) == ((10, 10)), "degenerate chunk walks one event per page")
      assert(run(1000) == ((10, 1)), "chunk > total is one page")
      // a key that matches nothing: one request, zero events, no token
      node.clear()
      val none = JsonRpc.eventsPaged(client, Addr, 10L, 14L, chunkSize = 4,
        eventKey = "0xnomatch").get
      assert(none.isEmpty && node.nRequests == 1)
    } finally node.stop()
  }

  test("pager fuzz: random chunk sizes and random mid-pagination failures never lose or duplicate events") {
    val node = new StubStarknetNode(head = 0L, Addr)
    try {
      val client = new JsonRpcClient(node.url, maxRetries = 3, sleepMs = 5, timeoutMs = 2000)
      val rnd = new scala.util.Random(4242)
      for (trial <- 1 to 10) {
        val lo = rnd.nextInt(50).toLong
        val hi = lo + rnd.nextInt(12)
        val chunk = 1 + rnd.nextInt(9)
        val expect = (lo to hi).flatMap(n => Seq(s"0xt${n}a", s"0xt${n}b"))
        // inject 0-2 failures at a random point: the per-POST retry
        // absorbs them (each page retries independently), so the final
        // event list is exactly-once regardless of where the 500s land
        node.failNext.set(rnd.nextInt(3))
        val evs = JsonRpc.eventsPaged(client, Addr, lo, hi, chunkSize = chunk).get
        assert(evs.map(_.transaction_hash) == expect,
          s"trial $trial (lo=$lo hi=$hi chunk=$chunk): wrong event sequence")
      }
      // failures beyond the budget surface as None, never a partial list
      node.failNext.set(1000)
      assert(JsonRpc.eventsPaged(client, Addr, 0L, 5L, chunkSize = 3).isEmpty)
      node.failNext.set(0)
    } finally node.stop()
  }

  test("DataSourceV2 over real HTTP: rows match the fake path; pruned slices never hit the wire") {
    val node = new StubStarknetNode(head = 2000000L, Addr)
    try {
      def readRpc() = spark.read.format("blockrange")
        .option("from", 1000000L).option("to", 1000039L).option("slice", 10L)
        .option("rpc_url", node.url).option("rpc_sleep_ms", 5L)
        .load()
      val fake = spark.read.format("blockrange")
        .option("from", 1000000L).option("to", 1000039L).option("slice", 10L)
        .load().collect().toSet
      val viaHttp = readRpc().collect().toSet
      assert(viaHttp == fake, "RPC path and fake path agree row-for-row")
      assert(node.nRequests == 4, "4 slices => 4 batched POSTs")

      // pushdown prunes slices BEFORE partitions exist, so the pruned
      // slices are never requested over the wire
      node.clear()
      val filtered = readRpc().filter("block_number >= 1000020").collect()
      assert(filtered.length == 20)
      assert(node.nRequests == 2, "2 surviving slices => 2 POSTs; pruned slices never fetched")
      val askedRanges = node.requests.asScala.map { r =>
        val ns = r.elements().asScala.map(_.get("params").get(0).get("block_number").asLong()).toSeq
        (ns.min, ns.max)
      }.toSet
      assert(askedRanges == Set((1000020L, 1000029L), (1000030L, 1000039L)))

      // retry inside a reader task: one 500 per window still succeeds
      node.clear(); node.failNext.set(1)
      assert(readRpc().filter("block_number < 1000010").count() == 10L)
      assert(node.nRequests == 2, "1 failed + 1 retried batched POST")
    } finally node.stop()
  }

  test("sliced events ingest over real HTTP: slice-per-partition pagers, distributed landing") {
    val node = new StubStarknetNode(head = 0L, Addr)
    try {
      val rpc = BlockRangeSource.RpcConf(node.url, retries = 5, sleepMs = 5, timeoutMs = 2000)
      // 20 blocks, slice 5 => 4 partitions; each has 10 Transfer events,
      // chunk 4 => 3 pages per slice = 12 requests total
      val ds = SlicedSource.fetchEventsRpc(spark, BlockRange(100L, 119L), 5L,
        rpc, Addr, chunkSize = 4)
      assert(ds.rdd.getNumPartitions == 4, "slice-per-partition")
      val evs = ds.collect()
      assert(evs.length == 40)
      assert(node.nRequests == 12, "4 slices x ceil(10/4) pages")
      assert(evs.map(_.transaction_hash).toSet ==
        (100L to 119L).flatMap(n => Seq(s"0xt${n}a", s"0xt${n}b")).toSet)
      assert(evs.forall(e => e.from_address == Addr && e.data.nonEmpty))
    } finally node.stop()
  }

  test("exhaustion inside a reader task fails the task loudly (no partial slice)") {
    val node = new StubStarknetNode(head = 0L, Addr)
    try {
      node.failNext.set(1000000)
      val ex = intercept[org.apache.spark.SparkException] {
        spark.read.format("blockrange")
          .option("from", 0L).option("to", 9L).option("slice", 10L)
          .option("rpc_url", node.url)
          .option("rpc_retries", 2L).option("rpc_sleep_ms", 5L)
          .load().count()
      }
      assert(ex.getMessage.contains("failed after 2 attempts")
        || Option(ex.getCause).exists(_.getMessage.contains("failed after 2 attempts")))
    } finally node.stop()
  }

  test("explicit-null continuation token terminates pagination (no 'null' re-POST)") {
    val node = new StubStarknetNode(head = 0L, Addr)
    try {
      node.nullTokenWhenDone = true
      val client = new JsonRpcClient(node.url, maxRetries = 5, sleepMs = 5, timeoutMs = 2000)
      // 5 blocks x 2 = 10 events, chunk 4 => pages 4,4,2; the DONE page
      // carries "continuation_token": null — Jackson's NullNode, whose
      // asText() is the string "null": an unfiltered pager would re-POST
      // with token "null" until the maxPages guard trips
      val evs = JsonRpc.eventsPaged(client, Addr, 10L, 14L, chunkSize = 4).get
      assert(evs.size == 10)
      assert(node.nRequests == 3, "the explicit null is termination, not a token")
    } finally node.stop()
  }

  test("batch element with no result member fails with slice context, not an NPE") {
    val node = new StubStarknetNode(head = 2000000L, Addr)
    try {
      node.dropResultFor = 1000003L
      val client = new JsonRpcClient(node.url, maxRetries = 2, sleepMs = 5, timeoutMs = 2000)
      val ex = intercept[IllegalArgumentException] {
        JsonRpc.blocksBatch(client, 1000000L, 1000009L)
      }
      assert(ex.getMessage.contains("[1000000,1000009]"))
      assert(ex.getMessage.contains("no result member"))
    } finally node.stop()
  }

  test("duplicated-plus-missing block combination is rejected (count alone would pass)") {
    val node = new StubStarknetNode(head = 2000000L, Addr)
    try {
      // block 1000003's element answers with 1000001's payload: 10 rows
      // come back for 10 asked, but 1000003 is silently absent
      node.misnumberBlock = Some((1000003L, 1000001L))
      val client = new JsonRpcClient(node.url, maxRetries = 2, sleepMs = 5, timeoutMs = 2000)
      val ex = intercept[IllegalArgumentException] {
        JsonRpc.blocksBatch(client, 1000000L, 1000009L)
      }
      assert(ex.getMessage.contains("omits block(s) 1000003"))
    } finally node.stop()
  }

  test("one HttpClient per executor JVM per timeout (no per-task selector-thread leak)") {
    assert(JsonRpcClient.httpFor(123456L) eq JsonRpcClient.httpFor(123456L),
      "same timeout shares the client")
    assert(!(JsonRpcClient.httpFor(123456L) eq JsonRpcClient.httpFor(654321L)),
      "connectTimeout is builder state, so distinct timeouts get distinct clients")
  }
}
