package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Ingest.BlockRange
import graft.sources.{BlockRangeSource, JsonRpc, JsonRpcClient, SlicedSource}

/** The reference's hourly export DAG as ONE pipeline function over real
  * JSON-RPC (`export_blocks_and_events_dag.py:30-72`, round 9 —
  * composing the loopback-proven fetcher pieces into the full
  * watermark-driven cycle):
  *
  *   1. watermark: `max(block_number) + 1` from the EVENTS sink
  *      (`load_config`'s `SELECT MAX(block_number) FROM events`),
  *      falling back to the backfill origin 1,000,000 when the sink is
  *      empty — `Ingest.sinkMax`, the O-16 scalar;
  *   2. head: `starknet_blockNumber` − 1 (the node's tip is still
  *      mutable, so the cycle stops one short — the reference's
  *      `fetch_lastest_block(rpc_url) - 1`);
  *   3. blocks: the DataSourceV2 `blockrange` read in RPC mode — one
  *      batched `starknet_getBlockWithTxHashes` POST per 10k-slice,
  *      appended seq-stamped (K-1);
  *   4. events: slice-per-partition `starknet_getEvents` pagers with
  *      the key filter in every request, list columns JSON-stringified
  *      before landing (K-4, `etl_events`' json.dumps).
  *
  * Differences from the reference, by design: slices fetch in PARALLEL
  * (executors) instead of a driver-side `range(start, end, batch_size)`
  * loop; a failed slice throws and Spark's task retry re-runs it
  * (all-or-nothing, no silent partial prefix); and an inverted range
  * (watermark past the head — the hourly no-op) returns None instead of
  * silently iterating an empty Python range. Re-running a half-landed
  * cycle re-appends under a new seq and the K-2 last-write-wins
  * dedup-on-read (`Ingest.latestView` keyed on block_number /
  * transaction_hash+event_key) collapses it — the ReplacingMergeTree
  * posture the reference leans on for exactly the same reason.
  */
object RpcIngest {

  /** One cycle; returns the ingested range, or None when already caught
    * up. `seq` is the cycle's ingest stamp (the hourly run id).
    */
  def ingestCycle(
      spark: SparkSession,
      rpc: BlockRangeSource.RpcConf,
      contractAddress: String,
      blocksSink: String,
      eventsSink: String,
      seq: Long,
      sliceSize: Long = 10000L,
      origin: Long = 1000000L,
      chunkSize: Int = 5000,
      eventKey: String = JsonRpc.DefaultEventKey,
      partitionBlocksByDate: Boolean = false): Option[BlockRange] = {

    // a crashed first cycle can leave the sink directory existing but
    // holding no readable parquet footers (e.g. only _temporary/): the
    // path probe alone would then wedge EVERY subsequent cycle on the
    // unable-to-infer-schema AnalysisException instead of falling back
    // to the origin backfill, so a failed sink read means "no watermark"
    val watermark =
      if (pathExists(spark, eventsSink))
        try Ingest.sinkMax(spark.read.parquet(eventsSink), "block_number")
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      else None
    val client = new JsonRpcClient(rpc.url, rpc.retries, rpc.sleepMs, rpc.timeoutMs)
    val head = JsonRpc.latestBlock(client).getOrElse(
      throw new java.io.IOException(
        s"starknet_blockNumber failed after ${rpc.retries} attempts against ${rpc.url}"))
    val range = Ingest.nextRange(watermark, head, origin).getOrElse(return None)
    val blocks = spark.read.format("blockrange")
      .option("from", range.from).option("to", range.to).option("slice", sliceSize)
      .option("rpc_url", rpc.url).option("rpc_retries", rpc.retries)
      .option("rpc_sleep_ms", rpc.sleepMs).option("rpc_timeout_ms", rpc.timeoutMs)
      .load()
    // date-partitioned landing (SURVEY §4): at 100 TB of chain history
    // the reports' trailing-window predicates must partition-prune, not
    // scan the full fact dir — the ClickHouse PARTITION BY toDate(...)
    // the reference's tables get from their DDL. Derived column, so the
    // raw schema is unchanged for readers that project it away.
    if (partitionBlocksByDate)
      Ingest.appendPartitioned(
        blocks.withColumn("block_date",
          to_date(from_unixtime(col("block_timestamp")))),
        blocksSink, seq, Seq("block_date"))
    else Ingest.appendWithSeq(blocks, blocksSink, seq)

    val events = SlicedSource.fetchEventsRpc(
        spark, range, sliceSize, rpc, contractAddress, chunkSize, eventKey)
      .toDF()
      // K-4: list columns land JSON-stringified (etl_events json.dumps);
      // `data` is the only list in RpcEvent
      .withColumn("data", to_json(col("data")))
    Ingest.appendWithSeq(events, eventsSink, seq)
    Some(range)
  }

  private def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
