package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.Ingest.BlockRange

/** DataSourceV2 connector for the reference's batched block-range fetch
  * (SURVEY §2.1 S-2/S-3) — the full-fidelity promotion of
  * [[SlicedSource]]'s `mapPartitions` shape into Spark's planner-visible
  * source API:
  *
  *   spark.read.format("blockrange")
  *     .option("from", 1000000).option("to", 1019999)
  *     .option("slice", 10000)        // the reference's 10k batch size
  *     .load()
  *     .filter($"block_number" >= 1005000)   // prunes whole slices
  *
  * What the V2 surface buys over `mapPartitions`:
  *  - **Slice = InputPartition.** One planned partition per 10k-block
  *    slice (`export_blocks_and_events_dag.py:27,56,66`), visible to the
  *    scheduler — 100 TB of chain history plans into bounded-size RPC
  *    units with no driver-side materialization.
  *  - **Predicate pushdown prunes slices.** Bounds on `block_number`
  *    are absorbed by [[BlockRangeScanBuilder.pushFilters]], narrow the
  *    planned range BEFORE partitions exist, and never reach a post-scan
  *    Filter — the Spark-native form of the reference pushing its key
  *    filter into the `starknet_getEvents` request
  *    (`fetch_data.py:74-80`).
  *  - **Column pruning reaches the reader.** `pruneColumns` drops
  *    unrequested fields from the rows the reader materializes.
  *
  * Row content comes from one of two fetchers behind the same reader
  * seam (round 9 closed the "no real HTTP has run through it" gap):
  *  - default: the deterministic fake of
  *    [[SlicedSource.fakeBlockFetcher]] (zero-egress environment);
  *  - `.option("rpc_url", ...)`: the REAL JSON-RPC pager — each slice
  *    issues ONE batched `starknet_getBlockWithTxHashes` POST
  *    (`fetch_data.py:18-46`) through [[JsonRpcClient]] with the
  *    reference's 5×5s/10s retry policy, executor-local connections.
  *    Post-exhaustion failure throws, so Spark's task retry re-runs the
  *    slice (the Airflow-retry analogue). `RpcLoopbackSpec` proves this
  *    path over real loopback sockets, including that filter-pruned
  *    slices never hit the wire.
  */
class BlockRangeSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "blockrange"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockRangeSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlockRangeTable(new CaseInsensitiveStringMap(properties))
}

object BlockRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("block_hash", StringType, nullable = false),
    StructField("block_timestamp", LongType, nullable = false)))

  /** Same deterministic content as [[SlicedSource.fakeBlockFetcher]]. */
  def blockHash(n: Long): String = "0x" + java.lang.Long.toHexString(n * 2654435761L)
  def blockTimestamp(n: Long): Long = 1700000000L + n

  /** Executor-side JSON-RPC config, carried from reader options into the
    * serialized [[SliceReaderFactory]]. Defaults are the reference's
    * (`send_request.py:3-7`): 5 attempts, 5 s backoff, 10 s timeout.
    */
  case class RpcConf(url: String, retries: Int = 5,
      sleepMs: Long = 5000L, timeoutMs: Long = 10000L)

  private[sources] def rpcConf(options: CaseInsensitiveStringMap): Option[RpcConf] =
    Option(options.get("rpc_url")).map { url =>
      RpcConf(url,
        Option(options.get("rpc_retries")).map(_.toInt).getOrElse(5),
        Option(options.get("rpc_sleep_ms")).map(_.toLong).getOrElse(5000L),
        Option(options.get("rpc_timeout_ms")).map(_.toLong).getOrElse(10000L))
    }
}

private[sources] class BlockRangeTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  private val from = options.get("from").toLong
  private val to = options.get("to").toLong
  private val slice = Option(options.get("slice")).map(_.toLong).getOrElse(10000L)
  private val rpc = BlockRangeSource.rpcConf(options)
  require(from <= to, s"empty block range [$from, $to]")
  require(slice > 0, "slice must be positive")

  override def name(): String = s"blockrange[$from,$to]"
  override def schema(): StructType = BlockRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new BlockRangeScanBuilder(from, to, slice, rpc)
}

/** Absorbs `block_number` bound predicates into the planned range and
  * prunes the output schema. Only top-level conjunctive bounds are
  * taken (the pushed array IS a conjunction); anything else is returned
  * as a post-scan residual for Spark to evaluate.
  */
private[sources] class BlockRangeScanBuilder(from: Long, to: Long, slice: Long,
    rpc: Option[BlockRangeSource.RpcConf])
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = from
  private var hi = to
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = BlockRangeSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case EqualTo("block_number", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v); true
      // saturating +-1: v+1 on Long.MaxValue would wrap negative and the
      // claimed-as-pushed filter would silently widen the range instead
      // of emptying it (round-4 review finding)
      case GreaterThan("block_number", v: Long) =>
        lo = math.max(lo, if (v == Long.MaxValue) v else v + 1)
        if (v == Long.MaxValue) hi = math.min(hi, v - 1) // strict > max is empty
        true
      case GreaterThanOrEqual("block_number", v: Long) => lo = math.max(lo, v); true
      case LessThan("block_number", v: Long) =>
        hi = math.min(hi, if (v == Long.MinValue) v else v - 1)
        if (v == Long.MinValue) lo = math.max(lo, v + 1) // strict < min is empty
        true
      case LessThanOrEqual("block_number", v: Long) => hi = math.min(hi, v); true
      case _ => false
    }
    pushed = handled
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new BlockRangeScan(lo, hi, slice, required, rpc)
}

private[sources] class BlockRangeScan(
    lo: Long, hi: Long, slice: Long, required: StructType,
    rpc: Option[BlockRangeSource.RpcConf])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"BlockRangeScan[$lo..$hi slice=$slice cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    if (lo > hi) Array.empty
    else graft.pipeline.Ingest.slices(BlockRange(lo, hi), slice)
      .map(s => SliceInputPartition(s.from, s.to): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SliceReaderFactory(required.fieldNames, rpc)
}

private[sources] case class SliceInputPartition(from: Long, to: Long) extends InputPartition

private[sources] class SliceReaderFactory(cols: Array[String],
    rpc: Option[BlockRangeSource.RpcConf])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SliceInputPartition]
    rpc match {
      case Some(c) => new RpcSlicePartitionReader(p.from, p.to, cols, c)
      case None => new SlicePartitionReader(p.from, p.to, cols)
    }
  }
}

/** Generates the slice's rows from the deterministic fake (default,
  * zero-egress path). Projects only the pruned columns.
  */
private[sources] class SlicePartitionReader(from: Long, to: Long, cols: Array[String])
    extends PartitionReader[InternalRow] {

  private var n = from - 1

  override def next(): Boolean = { n += 1; n <= to }

  override def get(): InternalRow =
    new GenericInternalRow(cols.map[Any] {
      case "block_number" => n
      case "block_hash" => UTF8String.fromString(BlockRangeSource.blockHash(n))
      case "block_timestamp" => BlockRangeSource.blockTimestamp(n)
    })

  override def close(): Unit = ()
}

/** The REAL fetcher behind the same reader seam: one batched
  * `starknet_getBlockWithTxHashes` JSON-RPC POST for the whole slice on
  * first advance (`fetch_data.py:18-46` — the slice IS the RPC batching
  * unit), executor-local HTTP client with the reference's retry policy.
  * Retry exhaustion throws: a partial slice must never look like a
  * complete one, and Spark's task retry re-runs the fetch (the
  * reference's Airflow task retry, `export_blocks_and_events_dag.py:
  * 83-84`). Projects only the pruned columns.
  */
private[sources] class RpcSlicePartitionReader(
    from: Long, to: Long, cols: Array[String], conf: BlockRangeSource.RpcConf)
    extends PartitionReader[InternalRow] {

  private var it: Iterator[SlicedSource.FetchedBlock] = _
  private var cur: SlicedSource.FetchedBlock = _

  override def next(): Boolean = {
    if (it == null) {
      val client = new JsonRpcClient(conf.url, conf.retries, conf.sleepMs, conf.timeoutMs)
      it = JsonRpc.blocksBatch(client, from, to).getOrElse(
        throw new java.io.IOException(
          s"JSON-RPC blocks batch [$from,$to] failed after ${conf.retries} attempts " +
            s"against ${conf.url}")).iterator
    }
    if (it.hasNext) { cur = it.next(); true } else false
  }

  override def get(): InternalRow =
    new GenericInternalRow(cols.map[Any] {
      case "block_number" => cur.block_number
      case "block_hash" => UTF8String.fromString(cur.block_hash)
      case "block_timestamp" => cur.block_timestamp
    })

  override def close(): Unit = ()
}
