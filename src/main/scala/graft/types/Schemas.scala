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

  // ---- blocks (reference: main.rs:64-88) ----
  val blocks: StructType = StructType(Seq(
    StructField("hash", BinaryType, nullable = false),
    StructField("number", LongType, nullable = false),
    StructField("parentHash", BinaryType, nullable = false),
    StructField("uncles", ArrayType(BinaryType, containsNull = false), nullable = false),
    StructField("sha3Uncles", BinaryType, nullable = false),
    StructField("totalDifficulty", BinaryType, nullable = false), // u256, can exceed 38 digits
    StructField("miner", BinaryType, nullable = false),
    StructField("difficulty", BinaryType, nullable = false),      // u256, can exceed 38 digits
    StructField("nonce", BinaryType, nullable = false),
    StructField("mixHash", BinaryType, nullable = false),
    StructField("baseFeePerGas", U256Decimal, nullable = true),
    StructField("gasLimit", U256Decimal, nullable = false),
    StructField("gasUsed", U256Decimal, nullable = false),
    StructField("stateRoot", BinaryType, nullable = false),
    StructField("transactionsRoot", BinaryType, nullable = false),
    StructField("receiptsRoot", BinaryType, nullable = false),
    StructField("logsBloom", BinaryType, nullable = false),
    StructField("withdrawlsRoot", BinaryType, nullable = true),   // sic — typo kept (main.rs:83)
    StructField("extraData", BinaryType, nullable = false),
    StructField("timestamp", U256Decimal, nullable = false),
    StructField("size", U256Decimal, nullable = false)
  ))

  // ---- transactions (reference: main.rs:93-123; body+receipt merged) ----
  val transactions: StructType = StructType(Seq(
    StructField("hash", BinaryType, nullable = false),
    StructField("blockHash", BinaryType, nullable = false),
    StructField("blockNumber", LongType, nullable = false),
    StructField("blockTimestamp", U256Decimal, nullable = false),
    StructField("transactionIndex", LongType, nullable = false),
    StructField("chainId", U256Decimal, nullable = true),
    StructField("type", LongType, nullable = true),
    StructField("from", BinaryType, nullable = false),
    StructField("to", BinaryType, nullable = true),
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
    StructField("contractAddress", BinaryType, nullable = true),
    StructField("cumulativeGasUsed", U256Decimal, nullable = false),
    StructField("effectiveGasPrice", U256Decimal, nullable = true),
    StructField("gasUsed", U256Decimal, nullable = false),
    StructField("logsBloom", BinaryType, nullable = false),
    StructField("root", BinaryType, nullable = true),             // pre-EIP-658 only
    StructField("status", LongType, nullable = true)              // post-EIP-658 only
  ))

  // ---- events (reference: main.rs:128-140) ----
  val events: StructType = StructType(Seq(
    StructField("address", BinaryType, nullable = false),
    StructField("blockHash", BinaryType, nullable = false),
    StructField("blockNumber", LongType, nullable = false),
    StructField("blockTimestamp", U256Decimal, nullable = false),
    StructField("transactionHash", BinaryType, nullable = false),
    StructField("transactionIndex", LongType, nullable = false),
    StructField("logIndex", U256Decimal, nullable = false),
    StructField("removed", BooleanType, nullable = false),
    StructField("topics", ArrayType(BinaryType, containsNull = false), nullable = false),
    StructField("data", BinaryType, nullable = false)
  ))

  // ---- withdraws (reference: main.rs:148-157) ----
  val withdraws: StructType = StructType(Seq(
    StructField("blockHash", BinaryType, nullable = false),
    StructField("blockNumber", LongType, nullable = false),
    StructField("blockTimestamp", U256Decimal, nullable = false),
    StructField("index", LongType, nullable = false),
    StructField("validatorIndex", LongType, nullable = false),
    StructField("address", BinaryType, nullable = false),
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
