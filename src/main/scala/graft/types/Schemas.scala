package graft.types

import org.apache.spark.sql.types._

/** Canonical schemas for the four chain tables, mirroring the reference
  * DDL (reference: src/main.rs:52-163) re-expressed in Spark types per
  * the SURVEY §1.2 mapping:
  *
  *   - FixedString(N) hashes/addresses      -> BinaryType (N enforced by writer)
  *   - UInt64                               -> LongType
  *   - UInt256, value/difficulty-class      -> BinaryType 32-byte big-endian
  *     (lossless; bytewise comparison == unsigned numeric order)
  *   - UInt256, empirically-narrow columns  -> DecimalType(38,0)
  *     (gas, fees, timestamps, indexes, amounts)
  *   - Nullable(T)                          -> nullable StructField
  *   - Array(FixedString)/Array(String)     -> ArrayType(BinaryType)
  *
  * Quirks preserved on purpose for drop-in query parity (SURVEY §1.2):
  * the `withdrawlsRoot` typo (main.rs:83), reserved-word column names
  * `from`/`to`/`type`/`index` (main.rs:101-103,152).
  */
object Schemas {

  /** DecimalType used for UInt256 columns whose real-world values fit. */
  val U256Decimal: DecimalType = DecimalType(38, 0)

  /** Field-metadata key carrying a ClickHouse FixedString(N) width.
    * The reference DDL types hashes/addresses as FixedString(32/20/8)
    * (main.rs:66-160); the width rides the Spark schema so the Native
    * codec/DDL emit `FixedString(N)` and fixed-width payloads for
    * exactly these columns, while arbitrary binary frames keep the
    * variable-length `String` wire type. */
  val FixedWidthKey = "chFixedWidth"

  private def fixedMeta(n: Int): Metadata =
    new MetadataBuilder().putLong(FixedWidthKey, n.toLong).build()

  /** FixedString(n) column (32 = hash, 20 = address, 8 = block nonce). */
  private def fixed(name: String, n: Int, nullable: Boolean = false): StructField =
    StructField(name, BinaryType, nullable, fixedMeta(n))

  /** Array(FixedString(n)) column (events.topics, main.rs:137). */
  private def fixedArr(name: String, n: Int): StructField =
    StructField(name, ArrayType(BinaryType, containsNull = false),
      nullable = false, fixedMeta(n))

  /** Canonical schema by chain-table name. */
  def tableSchema(table: String): StructType = table match {
    case "blocks" => blocks
    case "transactions" => transactions
    case "events" => events
    case "withdraws" => withdraws
    case other => throw new IllegalArgumentException(s"unknown chain table '$other'")
  }

  // ---- blocks (reference: main.rs:64-88) ----
  val blocks: StructType = StructType(Seq(
    fixed("hash", 32),
    StructField("number", LongType, nullable = false),
    fixed("parentHash", 32),
    StructField("uncles", ArrayType(BinaryType, containsNull = false), nullable = false),
    fixed("sha3Uncles", 32),
    StructField("totalDifficulty", BinaryType, nullable = false), // u256, can exceed 38 digits
    fixed("miner", 20),
    StructField("difficulty", BinaryType, nullable = false),      // u256, can exceed 38 digits
    fixed("nonce", 8),
    fixed("mixHash", 32),
    StructField("baseFeePerGas", U256Decimal, nullable = true),
    StructField("gasLimit", U256Decimal, nullable = false),
    StructField("gasUsed", U256Decimal, nullable = false),
    fixed("stateRoot", 32),
    fixed("transactionsRoot", 32),
    fixed("receiptsRoot", 32),
    StructField("logsBloom", BinaryType, nullable = false),
    fixed("withdrawlsRoot", 32, nullable = true),   // sic — typo kept (main.rs:83)
    StructField("extraData", BinaryType, nullable = false),
    StructField("timestamp", U256Decimal, nullable = false),
    StructField("size", U256Decimal, nullable = false)
  ))

  // ---- transactions (reference: main.rs:93-123; body+receipt merged) ----
  val transactions: StructType = StructType(Seq(
    fixed("hash", 32),
    fixed("blockHash", 32),
    StructField("blockNumber", LongType, nullable = false),
    StructField("blockTimestamp", U256Decimal, nullable = false),
    StructField("transactionIndex", LongType, nullable = false),
    StructField("chainId", U256Decimal, nullable = true),
    StructField("type", LongType, nullable = true),
    fixed("from", 20),
    fixed("to", 20, nullable = true),
    StructField("value", BinaryType, nullable = false),           // u256 canonical binary
    StructField("nonce", U256Decimal, nullable = false),
    StructField("input", BinaryType, nullable = false),
    StructField("gas", U256Decimal, nullable = false),
    StructField("gasPrice", U256Decimal, nullable = true),
    StructField("maxFeePerGas", U256Decimal, nullable = true),
    StructField("maxPriorityFeePerGas", U256Decimal, nullable = true),
    StructField("r", BinaryType, nullable = false),               // 256-bit signature half
    StructField("s", BinaryType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("accessList", StringType, nullable = true),       // JSON text (main.rs:114)
    fixed("contractAddress", 20, nullable = true),
    StructField("cumulativeGasUsed", U256Decimal, nullable = false),
    StructField("effectiveGasPrice", U256Decimal, nullable = true),
    StructField("gasUsed", U256Decimal, nullable = false),
    StructField("logsBloom", BinaryType, nullable = false),
    fixed("root", 32, nullable = true),             // pre-EIP-658 only
    StructField("status", LongType, nullable = true)              // post-EIP-658 only
  ))

  // ---- events (reference: main.rs:128-140) ----
  val events: StructType = StructType(Seq(
    fixed("address", 20),
    fixed("blockHash", 32),
    StructField("blockNumber", LongType, nullable = false),
    StructField("blockTimestamp", U256Decimal, nullable = false),
    fixed("transactionHash", 32),
    StructField("transactionIndex", LongType, nullable = false),
    StructField("logIndex", U256Decimal, nullable = false),
    StructField("removed", BooleanType, nullable = false),
    fixedArr("topics", 32),
    StructField("data", BinaryType, nullable = false)
  ))

  // ---- withdraws (reference: main.rs:148-157) ----
  val withdraws: StructType = StructType(Seq(
    StructField("blockHash", BinaryType, nullable = false),
    StructField("blockNumber", LongType, nullable = false),
    StructField("blockTimestamp", U256Decimal, nullable = false),
    StructField("index", LongType, nullable = false),
    StructField("validatorIndex", LongType, nullable = false),
    // blockHash deliberately NOT fixed-width: the reference declares it
    // a plain String here, unlike every other table (main.rs:149 quirk)
    fixed("address", 20),
    StructField("amount", U256Decimal, nullable = false)
  ))

  /** Dedup keys of the ReplacingMergeTree ORDER BY clauses
    * (reference: main.rs:87-88, 122-123, 139-140, 156-157). */
  val dedupKeys: Map[String, Seq[String]] = Map(
    "blocks" -> Seq("hash", "number"),
    "transactions" -> Seq("hash"),
    "events" -> Seq("transactionHash", "logIndex"),
    "withdraws" -> Seq("blockHash", "index")
  )
}
