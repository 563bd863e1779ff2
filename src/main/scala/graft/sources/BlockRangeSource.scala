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
  * The per-block row content is the deterministic fake of
  * [[SlicedSource.fakeBlockFetcher]] (zero-egress environment); a
  * production deployment swaps the row generator for the JSON-RPC pager
  * inside [[SlicePartitionReader]] — the planning, pruning, and pushdown
  * layers are exactly what it needs and do not change.
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
}

private[sources] class BlockRangeTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  private val from = options.get("from").toLong
  private val to = options.get("to").toLong
  private val slice = Option(options.get("slice")).map(_.toLong).getOrElse(10000L)
  require(from <= to, s"empty block range [$from, $to]")
  require(slice > 0, "slice must be positive")

  override def name(): String = s"blockrange[$from,$to]"
  override def schema(): StructType = BlockRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new BlockRangeScanBuilder(from, to, slice)
}

/** Absorbs `block_number` bound predicates into the planned range and
  * prunes the output schema. Only top-level conjunctive bounds are
  * taken (the pushed array IS a conjunction); anything else is returned
  * as a post-scan residual for Spark to evaluate.
  */
private[sources] class BlockRangeScanBuilder(from: Long, to: Long, slice: Long)
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

  override def build(): Scan = new BlockRangeScan(lo, hi, slice, required)
}

private[sources] class BlockRangeScan(
    lo: Long, hi: Long, slice: Long, required: StructType)
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
    new SliceReaderFactory(required.fieldNames)
}

private[sources] case class SliceInputPartition(from: Long, to: Long) extends InputPartition

private[sources] class SliceReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SliceInputPartition]
    new SlicePartitionReader(p.from, p.to, cols)
  }
}

/** Generates the slice's rows. In production this is where the JSON-RPC
  * pager lives (one batched call per slice, iterator over the response);
  * here the rows are the deterministic fake. Projects only the pruned
  * columns.
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
