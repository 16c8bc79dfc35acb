package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.{Decimal, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.RpcBlock
import graft.types.Schemas

/** DataSource V2 block source (SURVEY §2 A1-A2, §4.2-3): the reference's
  * sequential `for i in from..=to { get_block_with_txs(i) }` loop
  * (reference: src/main.rs:172-173) becomes a partitioned Spark scan —
  * one InputPartition per contiguous block sub-range, each reader owning
  * its own "RPC client" (here: the deterministic offline generator; in
  * production: a WS/HTTP client constructed per partition).
  *
  * Pushdown (mirrors `--from/--to`, main.rs:28-33):
  *   - predicates on `number` (>, >=, <, <=, =) narrow the scanned range
  *     BEFORE partitions are planned — Spark never even asks for blocks a
  *     WHERE clause excludes, the moral equivalent of not issuing the RPC;
  *   - column pruning: readers materialize only the projected fields.
  *
  * Usage: spark.read.format("chainblocks").option("from", 0)
  *        .option("to", 999).option("blocksPerPartition", 250).load()
  */
class ChainBlocksSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "chainblocks"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Schemas.blocks
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChainBlocksTable(new CaseInsensitiveStringMap(properties))
}

class ChainBlocksTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "chainblocks"
  override def schema(): StructType = Schemas.blocks
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(o)
    new ChainScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

/** Pure range-narrowing from pushed filters — unit-testable in isolation. */
object RangePlanner {
  /** Returns (from, to, accepted) after folding `number` bounds in. */
  def narrow(from: Long, to: Long, filters: Seq[Filter]): (Long, Long, Seq[Filter]) =
    filters.foldLeft((from, to, Seq.empty[Filter])) { case ((lo, hi, acc), f) =>
      f match {
        case sources.GreaterThan("number", v: Long) => (math.max(lo, v + 1), hi, acc :+ f)
        case sources.GreaterThanOrEqual("number", v: Long) => (math.max(lo, v), hi, acc :+ f)
        case sources.LessThan("number", v: Long) => (lo, math.min(hi, v - 1), acc :+ f)
        case sources.LessThanOrEqual("number", v: Long) => (lo, math.min(hi, v), acc :+ f)
        case sources.EqualTo("number", v: Long) => (math.max(lo, v), math.min(hi, v), acc :+ f)
        case _ => (lo, hi, acc)
      }
    }

  def ranges(from: Long, to: Long, perPartition: Long): Seq[(Long, Long)] =
    if (to < from) Seq.empty
    else (from to to by perPartition).map(s => (s, math.min(s + perPartition - 1, to)))
}

class ChainScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var from = options.getLong("from", 0L)
  private var to = options.getLong("to", 999L)
  private val perPartition = options.getLong("blocksPerPartition", 1000L)
  private val endpoint = Option(options.get("endpoint")) // JSON-RPC url; absent = fixture
  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = Schemas.blocks

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (lo, hi, accepted) = RangePlanner.narrow(from, to, filters.toSeq)
    from = lo; to = hi; pushed = accepted.toArray
    // pushed bounds are exact — no residual evaluation needed for them;
    // everything else stays with Spark
    filters.filterNot(accepted.contains)
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(required: StructType): Unit = {
    // preserve table column order; drop unprojected fields
    val names = required.fieldNames.toSet
    requiredSchema = StructType(Schemas.blocks.fields.filter(f => names.contains(f.name)))
  }
  override def build(): Scan = ChainScan(from, to, perPartition, requiredSchema, endpoint)
}

case class ChainRangePartition(start: Long, end: Long) extends InputPartition

case class ChainScan(from: Long, to: Long, perPartition: Long, schema: StructType,
    endpoint: Option[String]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"chainblocks range=[$from,$to] perPartition=$perPartition cols=${schema.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    RangePlanner.ranges(from, to, perPartition)
      .map { case (s, e) => ChainRangePartition(s, e): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ChainReaderFactory(schema, endpoint)
}

class ChainReaderFactory(schema: StructType, endpoint: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChainRangePartition]
    // one transport per partition reader, executor-side (main.rs:173-174)
    new ChainPartitionReader(p.start, p.end, schema, BlockFetcher.forEndpoint(endpoint))
  }
}

/** Per-partition reader — owns one [[BlockFetcher]] transport (HTTP
  * JSON-RPC when `endpoint` is set, offline generator otherwise) and
  * iterates it over the partition's contiguous sub-range. */
class ChainPartitionReader(start: Long, end: Long, schema: StructType,
    fetcher: BlockFetcher) extends PartitionReader[InternalRow] {

  private var cursor = start - 1
  private var current: InternalRow = _

  private val fieldBuilders: Array[RpcBlock => Any] = schema.fields.map { f =>
    val fn: RpcBlock => Any = f.name match {
      case "hash" => _.hash
      case "number" => _.number
      case "parentHash" => _.parentHash
      case "uncles" => b => new GenericArrayData(b.uncles.toArray[Any])
      case "sha3Uncles" => _.unclesHash
      case "totalDifficulty" => _.totalDifficulty
      case "miner" => _.author
      case "difficulty" => _.difficulty
      case "nonce" => _.nonce
      case "mixHash" => _.mixHash
      case "baseFeePerGas" => _.baseFeePerGas.map(d => Decimal(d, 38, 0)).orNull
      case "gasLimit" => b => Decimal(b.gasLimit, 38, 0)
      case "gasUsed" => b => Decimal(b.gasUsed, 38, 0)
      case "stateRoot" => _.stateRoot
      case "transactionsRoot" => _.transactionsRoot
      case "receiptsRoot" => _.receiptsRoot
      case "logsBloom" => _.logsBloom
      case "withdrawlsRoot" => _.withdrawalsRoot.orNull
      case "extraData" => _.extraData
      case "timestamp" => b => Decimal(b.timestamp, 38, 0)
      case "size" => b => Decimal(b.size, 38, 0)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    fn
  }

  override def next(): Boolean = {
    cursor += 1
    if (cursor > end) return false
    val block = fetcher.blockWithTxs(cursor)
    current = InternalRow.fromSeq(fieldBuilders.map(_(block)).toIndexedSeq)
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = fetcher.close()
}
