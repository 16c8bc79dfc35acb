package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{ChainFixture, Dedup, Flatten}
import graft.types.{Schemas, U256}

/** ETL-parity queries over the deterministic fixture chain (SURVEY §2 A-D).
  * These have no SQL-expressible DuckDB oracle (the chain source lives in
  * the engine, not in parquet), so the driver records rows-only checks;
  * the strong assertions live in the ScalaTest specs. Each query returns a
  * non-empty result whose values ARE the invariant being checked.
  */
object ChainQueries {

  private val From = 0L
  private val To = 199L

  /** The 4 flattened tables' row counts + key cardinalities — proves the
    * flatten spine (C1-C4) and that dedup keys are actually unique. */
  def chainTables(s: SparkSession, dir: String): DataFrame = {
    val blocks = ChainFixture.blocks(s, From, To)
    val receipts = ChainFixture.receipts(s, From, To)
    val b = Flatten.blockRows(blocks)
    val tx = Flatten.transactionRows(blocks, receipts)
    val ev = Flatten.eventRows(blocks, receipts)
    val wd = Flatten.withdrawalRows(blocks)
    def summary(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.agg(
        lit(name).as("table"),
        count(lit(1)).as("n_rows"),
        countDistinct(keys.head, keys.tail: _*).as("n_keys"))
    summary("blocks", b, Schemas.dedupKeys("blocks"))
      .unionByName(summary("transactions", tx, Schemas.dedupKeys("transactions")))
      .unionByName(summary("events", ev, Schemas.dedupKeys("events")))
      .unionByName(summary("withdraws", wd, Schemas.dedupKeys("withdraws")))
      .orderBy(col("table"))
  }

  /** C2 equivalence: the positional zip join and the defensive equi-join
    * must produce identical rows (count + full except in both directions). */
  def chainZipVsJoin(s: SparkSession, dir: String): DataFrame = {
    val blocks = ChainFixture.blocks(s, From, To)
    val receipts = ChainFixture.receipts(s, From, To)
    val zip = Flatten.transactionRows(blocks, receipts)
    val joined = Flatten.transactionRowsJoined(blocks, receipts)
    zip.agg(count(lit(1)).as("zip_rows")).crossJoin(
        joined.agg(count(lit(1)).as("join_rows"))).crossJoin(
        zip.except(joined).agg(count(lit(1)).as("zip_minus_join"))).crossJoin(
        joined.except(zip).agg(count(lit(1)).as("join_minus_zip")))
  }

  /** D5 idempotency: re-ingesting the same range (union of two identical
    * extracts) then deduping by the table key yields the original counts. */
  def chainDedupIdempotent(s: SparkSession, dir: String): DataFrame = {
    val b1 = Flatten.blockRows(ChainFixture.blocks(s, From, To))
    val doubled = b1.unionByName(Flatten.blockRows(ChainFixture.blocks(s, From, To)))
    val deduped = Dedup.exact(doubled, Schemas.dedupKeys("blocks"))
    b1.agg(count(lit(1)).as("single_run")).crossJoin(
        doubled.agg(count(lit(1)).as("double_run"))).crossJoin(
        deduped.agg(count(lit(1)).as("after_dedup")))
  }

  /** U256 codec roundtrip over real u256 columns (value, totalDifficulty):
    * decimal projection + binary roundtrip must preserve every value. */
  def chainU256(s: SparkSession, dir: String): DataFrame = {
    val blocks = ChainFixture.blocks(s, From, To)
    val receipts = ChainFixture.receipts(s, From, To)
    val tx = Flatten.transactionRows(blocks, receipts)
      .withColumn("value_dec", U256.toDecimal(col("value")))
      .withColumn("value_rt", U256.fromDecimal(U256.toDecimal(col("value"))))
    tx.agg(
      count(lit(1)).as("n_tx"),
      sum(when(col("value_rt") === col("value"), 1).otherwise(0)).as("n_roundtrip_ok"),
      sum(col("value_dec")).cast("string").as("total_value_wei"),
      // exact binary-domain sum (wraps mod 2^256, ClickHouse semantics) —
      // must agree with the decimal path while values fit in 38 digits
      lower(hex(graft.types.U256Arith.u256Sum(col("value")))).as("total_value_u256_hex"))
  }

  /** Aggregate over the flattened chain — gas usage per 1000-block bucket
    * (the reference's load unit, main.rs:165), exercising decimal aggs over
    * the u256-decimal projections. */
  def chainGasByRange(s: SparkSession, dir: String): DataFrame = {
    val blocks = ChainFixture.blocks(s, From, To)
    val receipts = ChainFixture.receipts(s, From, To)
    Flatten.transactionRows(blocks, receipts)
      .groupBy(floor(col("blockNumber") / 100).cast("long").as("range100"))
      .agg(count(lit(1)).as("n_tx"), sum(col("gasUsed")).cast("long").as("gas_used"),
        sum(when(col("status") === 1, 1).otherwise(0)).as("n_success"))
      .orderBy(col("range100"))
  }

  /** A2 as DSv2: scan via the chainblocks source with a pushed-down range
    * predicate, then aggregate — proves the source feeds ordinary Catalyst
    * plans and the filter prunes partitions before the scan. */
  def chainSourceScan(s: SparkSession, dir: String): DataFrame =
    s.read.format("chainblocks")
      .option("from", 0).option("to", 999).option("blocksPerPartition", 100)
      .load()
      .filter(col("number") >= 800)
      .groupBy((col("number") % 10).as("mod10"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("gasUsed")).cast("long").as("gas"))
      .orderBy(col("mod10"))

  /** Full ETL path in the graded surface: ingest 1000 blocks (the
    * reference's flush unit) into a temp warehouse via the bucketed
    * writer, read back, and report per-table counts — the whole
    * source→flatten→dedup→write→read loop as one checked row set. */
  def chainIngest1k(s: SparkSession, dir: String): DataFrame = {
    val wh = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    graft.etl.Load.ingest(s, 0, 999, wh)
    def counted(name: String): DataFrame =
      s.read.parquet(s"$wh/$name").agg(
        lit(name).as("table"), count(lit(1)).as("n_rows"),
        countDistinct(col("blockNumber")).as("n_blocks"))
    val blocks = s.read.parquet(s"$wh/blocks").agg(
      lit("blocks").as("table"), count(lit(1)).as("n_rows"),
      countDistinct(col("number")).as("n_blocks"))
    blocks
      .unionByName(counted("transactions"))
      .unionByName(counted("events"))
      .unionByName(counted("withdraws"))
      .orderBy(col("table"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chain_ingest_1k" -> (chainIngest1k _),
    "chain_source_scan" -> (chainSourceScan _),
    "chain_tables" -> (chainTables _),
    "chain_zip_vs_join" -> (chainZipVsJoin _),
    "chain_dedup_idempotent" -> (chainDedupIdempotent _),
    "chain_u256_roundtrip" -> (chainU256 _),
    "chain_gas_by_range" -> (chainGasByRange _)
  )
}
