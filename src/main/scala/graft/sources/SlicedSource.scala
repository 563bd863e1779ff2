package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.pipeline.Ingest.BlockRange

/** The reference's batched-fetch sources (SURVEY §2.1 S-2/S-3): a block
  * range is split into fixed slices and each slice fetched by one worker
  * (`fetch_blocks_data` / paginated `fetch_events_data`). Re-expressed
  * Spark-first: `spark.range(from, to+1)` partitioned so each partition
  * covers one slice, and a pluggable partition-local fetch function.
  *
  * In production the fetch is an HTTP JSON-RPC pager (executors hold the
  * connections; the key filter is pushed down into the request — the
  * reference's own predicate pushdown). In this zero-egress environment
  * tests plug a deterministic fake; the planning/distribution layer is
  * the part that must hold at scale: number of partitions = number of
  * slices, no driver-side materialization, results land via
  * `df.write.mode("append")`.
  */
object SlicedSource {

  /** One row per block number in `range`, partitioned slice-per-partition:
    * partition i covers EXACTLY slice i of `Ingest.slices(range, size)`
    * (a plain `spark.range(..., n)` would split evenly and misalign the
    * last slices, so a fetcher could exceed the RPC batch limit).
    * Built from `spark.range(0, n, 1, n)` — one slice index per
    * partition — expanded to that slice's block numbers.
    */
  def blockNumbers(spark: SparkSession, range: BlockRange, sliceSize: Long): Dataset[java.lang.Long] = {
    val ss = graft.pipeline.Ingest.slices(range, sliceSize).toIndexedSeq
    implicit val enc = org.apache.spark.sql.Encoders.LONG
    spark.range(0, ss.size, 1, ss.size)
      .flatMap { i =>
        val s = ss(i.toInt)
        (s.from to s.to).iterator.map(java.lang.Long.valueOf)
      }
  }

  /** Distributed fetch: `fetch` runs once per partition over its block
    * numbers (the per-slice RPC batch call). Must be serializable and
    * side-effect free per retry (Spark task retries re-run it).
    */
  def fetchBlocks[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, range: BlockRange, sliceSize: Long)(
      fetch: Iterator[Long] => Iterator[T]): Dataset[T] =
    blockNumbers(spark, range, sliceSize)
      .mapPartitions(it => fetch(it.map(_.longValue())))

  /** Deterministic fake fetcher standing in for the JSON-RPC node:
    * block_number → (block_number, block_hash, block_timestamp). Used by
    * specs/demos; replace with the real pager in production.
    */
  case class FetchedBlock(block_number: Long, block_hash: String, block_timestamp: Long)

  def fakeBlockFetcher(nums: Iterator[Long]): Iterator[FetchedBlock] =
    // single source of truth for the fake row content: BlockRangeSource
    // defines the formulas, the q42 oracle replays them in SQL — a third
    // inline copy here silently desynchronized all three (round-4 review)
    nums.map(n => FetchedBlock(n,
      BlockRangeSource.blockHash(n), BlockRangeSource.blockTimestamp(n)))

  /** End-to-end sliced ingest of a range into a parquet sink (the
    * etl_blocks task shape: plan → fetch → append).
    */
  def ingestBlocks(spark: SparkSession, range: BlockRange, sliceSize: Long, sink: String, seq: Long): Unit = {
    import spark.implicits._
    val df: DataFrame = fetchBlocks(spark, range, sliceSize)(fakeBlockFetcher).toDF()
    graft.pipeline.Ingest.appendWithSeq(df, sink, seq)
  }

  /** S-3 over REAL HTTP (round 9): the paginated `starknet_getEvents`
    * scan, one pager per slice — each partition opens its own
    * [[JsonRpcClient]] and walks the continuation-token loop for ITS
    * block sub-range (`fetch_data.py:48-101`). The key filter and
    * chunk_size ride in every request (server-side pushdown, the
    * reference's own semantics); pager exhaustion throws so a partial
    * page list can never masquerade as a complete slice — Spark's task
    * retry re-runs the slice. Scale shape: slices × pages bounded
    * requests, no driver-side materialization, events land already
    * distributed.
    */
  def fetchEventsRpc(
      spark: SparkSession, range: BlockRange, sliceSize: Long,
      rpc: BlockRangeSource.RpcConf, contractAddress: String,
      chunkSize: Int = 5000,
      eventKey: String = JsonRpc.DefaultEventKey): Dataset[JsonRpc.RpcEvent] = {
    import spark.implicits._
    val ss = graft.pipeline.Ingest.slices(range, sliceSize).toIndexedSeq
    spark.range(0, ss.size, 1, ss.size).flatMap { i =>
      val s = ss(i.toInt)
      val client = new JsonRpcClient(rpc.url, rpc.retries, rpc.sleepMs, rpc.timeoutMs)
      JsonRpc.eventsPaged(client, contractAddress, s.from, s.to, chunkSize, eventKey)
        .getOrElse(throw new java.io.IOException(
          s"starknet_getEvents slice [${s.from},${s.to}] failed after " +
            s"${rpc.retries} attempts against ${rpc.url}"))
        .iterator
    }
  }
}
