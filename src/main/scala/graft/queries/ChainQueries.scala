package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DecimalType}

import graft.etl.{ChainFixture, Dedup, Flatten}
import graft.types.{Schemas, U256}

/** ETL-parity queries over the deterministic fixture chain (SURVEY §2 A-D).
  *
  * Oracle strategy: Verify materializes the four RAW flattened tables as
  * unregistered parquet dumps (`chain_raw_*` — binary/array columns stay
  * native so DuckDB can re-parse the bytes). The registered `chain_tbl_*`
  * queries are full-table PORTABLE projections (binary → hex, arrays →
  * joined hex, decimals → strings) whose DuckDB oracles recompute the same
  * projection from the raw dumps — so every cell of every flattened table
  * is hash-compared cross-engine, and the driver's pandas rows-check never
  * sees an unhashable array column (the round-2 err). The aggregate-only
  * chain queries scan the same raw dumps (materialized once per JVM by
  * [[raw]]) so their bench time is plan cost, not generator cost; the
  * source / flatten / ingest paths stay live in `chain_source_scan`,
  * `chain_zip_vs_join`, and `chain_ingest_1k`.
  */
object ChainQueries {

  private val From = 0L
  private val To = 199L

  /** Fixed ingest warehouse (deleted and rewritten on each ingest run) so
    * repeated bench/verify loops don't leak temp dirs, and so the DuckDB
    * oracle can re-count the ingested tables at a stable path. */
  val IngestWarehouse = "/tmp/graft_chain_wh"

  /** Fixed home for the raw (binary/array-typed) chain table dumps the
    * DuckDB oracles aggregate over. Deliberately OUTSIDE the verify
    * output dir: the driver treats every parquet dir under outDir as a
    * query result, and its pandas rows-check cannot hash the native
    * array<binary> columns these dumps keep (round-3 `chain_raw_*` err
    * rows). Rewritten from scratch on every Verify run. */
  val RawDumpDir = "/tmp/graft_chain_raw"

  private def rawTables(s: SparkSession): Seq[(String, DataFrame)] = {
    val blocks = ChainFixture.blocks(s, From, To)
    val receipts = ChainFixture.receipts(s, From, To)
    Seq(
      "blocks" -> Flatten.blockRows(blocks),
      "transactions" -> Flatten.transactionRows(blocks, receipts),
      "events" -> Flatten.eventRows(blocks, receipts),
      "withdraws" -> Flatten.withdrawalRows(blocks))
  }

  /** Called by Verify before the query loop: dumps the raw flattened tables
    * (native binary/array/decimal columns) to [[RawDumpDir]] for the DuckDB
    * oracles below. The previous run's dumps are removed first so stale
    * tables can never feed an oracle. */
  def materializeRaw(s: SparkSession): Unit = synchronized {
    val (fs, root) = graft.etl.WarehouseFs.resolve(s, RawDumpDir)
    graft.etl.WarehouseFs.deleteTree(fs, root)
    rawTables(s).foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$RawDumpDir/chain_raw_$name")
    }
    rawReady.set(true)
  }

  /** Reads one raw flattened-table dump, materializing all four first if
    * this JVM hasn't yet. The aggregate-only chain queries below scan these
    * parquet dumps instead of re-running the sha256-heavy fixture generator
    * per invocation, so bench times measure the QUERY PLAN, not the
    * generator (round 4 misattributed up to 8 s of generator time to
    * chain_gas_by_range et al.). Freshness: every JVM rematerializes once —
    * a stale dump from an older schema can never leak across processes.
    * `chain_source_scan` / `chain_ingest_1k` / `chain_zip_vs_join` stay on
    * the live generator path deliberately, keeping source + flatten + ingest
    * coverage in the graded surface. */
  private val rawReady = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def raw(s: SparkSession, name: String): DataFrame = {
    if (!rawReady.get()) synchronized { if (!rawReady.get()) materializeRaw(s) }
    s.read.parquet(s"$RawDumpDir/chain_raw_$name")
  }

  /** Portable projection: every column becomes a type the driver's pandas
    * rows-check can hash and DuckDB can reproduce exactly — binary → hex
    * (uppercase in both engines), array<binary> → comma-joined hex,
    * decimal(38,0) → digit string. Longs/booleans/strings pass through. */
  private def portable(df: DataFrame): DataFrame = {
    val cols: Seq[Column] = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case BinaryType => hex(col(f.name)).as(f.name)
        case ArrayType(BinaryType, _) =>
          array_join(transform(col(f.name), x => hex(x)), ",").as(f.name)
        case _: DecimalType => col(f.name).cast("string").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols: _*)
  }

  /** The flattened tables over the fixture range as portable full-table
    * queries — every cell oracle-checked against the raw dumps. */
  def chainTblBlocks(s: SparkSession, dir: String): DataFrame =
    portable(raw(s, "blocks").orderBy(col("number")))
  def chainTblTransactions(s: SparkSession, dir: String): DataFrame =
    portable(raw(s, "transactions")
      .orderBy(col("blockNumber"), col("transactionIndex")))
  def chainTblEvents(s: SparkSession, dir: String): DataFrame =
    portable(raw(s, "events")
      .orderBy(col("blockNumber"), col("transactionIndex"), col("logIndex")))
  def chainTblWithdraws(s: SparkSession, dir: String): DataFrame =
    portable(raw(s, "withdraws")
      .orderBy(col("blockNumber"), col("index")))

  /** The 4 flattened tables' row counts + key cardinalities — proves the
    * flatten spine (C1-C4) and that dedup keys are actually unique. */
  def chainTables(s: SparkSession, dir: String): DataFrame = {
    val b = raw(s, "blocks")
    val tx = raw(s, "transactions")
    val ev = raw(s, "events")
    val wd = raw(s, "withdraws")
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
    val b1 = raw(s, "blocks")
    val doubled = b1.unionByName(raw(s, "blocks"))
    val deduped = Dedup.exact(doubled, Schemas.dedupKeys("blocks"))
    b1.agg(count(lit(1)).as("single_run")).crossJoin(
        doubled.agg(count(lit(1)).as("double_run"))).crossJoin(
        deduped.agg(count(lit(1)).as("after_dedup")))
  }

  /** U256 codec roundtrip over real u256 columns: decimal projection +
    * binary roundtrip must preserve every value, and the exact binary-domain
    * sum (U256Sum, wraps mod 2^256 — ClickHouse semantics) must agree with
    * the decimal-domain sum while values fit in 38 digits. Both totals are
    * decimal strings so DuckDB can recompute them from the dumped bytes. */
  def chainU256(s: SparkSession, dir: String): DataFrame = {
    val tx = raw(s, "transactions")
      .withColumn("value_dec", U256.toDecimal(col("value")))
      .withColumn("value_rt", U256.fromDecimal(U256.toDecimal(col("value"))))
    tx.agg(
      count(lit(1)).as("n_tx"),
      sum(when(col("value_rt") === col("value"), 1L).otherwise(0L)).as("n_roundtrip_ok"),
      sum(col("value_dec")).cast("string").as("total_value_wei"),
      U256.toDecimal(graft.types.U256Arith.u256Sum(col("value")))
        .cast("string").as("total_value_u256"))
  }

  /** The u256 multiply/divide expressions in a real money query: per
    * 100-block bucket, the wei→gwei normalization of transferred value
    * (u256_div by 1e9, floor — how explorers display amounts) and a
    * doubled-value total (u256_mul, exercising the wrap-free domain),
    * both computed ENTIRELY in the 256-bit binary domain and only
    * narrowed to BIGINT at presentation. The DuckDB oracle recomputes
    * from the raw value bytes with 64-bit integer math (fixture values
    * fit in the low 7 bytes). Codegen expressions inline into the same
    * whole-stage-codegen span as the aggregation — no UDF boundary. */
  def chainU256Math(s: SparkSession, dir: String): DataFrame = {
    import graft.types.U256Arith
    val gweiB = U256.fromDecimal(lit("1000000000").cast(DecimalType(38, 0)))
    val twoB = U256.fromDecimal(lit("2").cast(DecimalType(38, 0)))
    raw(s, "transactions")
      .groupBy(floor(col("blockNumber") / 100).cast("long").as("range100"))
      .agg(
        count(lit(1)).as("n_tx"),
        sum(U256.toDecimal(U256Arith.u256Div(col("value"), gweiB)))
          .cast("long").as("gwei_sent"),
        sum(U256.toDecimal(U256Arith.u256Mul(col("value"), twoB)))
          .cast("long").as("wei_doubled"))
      .orderBy(col("range100"))
  }

  /** Per-address account profile over the flattened transactions — the
    * address-page query a chain warehouse serves constantly (explorer
    * address views, wallet analytics): tx count, block span, distinct
    * recipients, contract creations, gas burned, and total wei sent.
    * The wei total runs through the custom binary-domain U256Sum
    * aggregate and is surfaced as an exact BIGINT (fixture values fit
    * well inside 2^56, which the oracle re-decodes from the low value
    * bytes). One hash aggregation keyed on the sender — partial+final
    * with map-side combine; the distinct aggs expand to the standard
    * two-phase distinct plan. At 100 TB this shuffles once on the
    * natural key with no skew beyond real per-address activity. (The
    * fixture derives every sender by sha, so each group is a singleton
    * — which is the honest regime for this query: on a real chain the
    * address key has cardinality ~ row count, and the plan must win on
    * the high-cardinality shuffle, not on map-side collapse.) */
  def chainAddressActivity(s: SparkSession, dir: String): DataFrame = {
    val tx = raw(s, "transactions")
    tx.groupBy(hex(col("from")).as("sender"))
      .agg(
        count(lit(1)).as("n_tx"),
        countDistinct(col("blockNumber")).as("n_blocks"),
        min(col("blockNumber")).as("first_block"),
        max(col("blockNumber")).as("last_block"),
        countDistinct(col("to")).as("n_recipients"),
        count(col("contractAddress")).as("n_creates"),
        sum(col("gasUsed")).cast("long").as("gas_used"),
        U256.toDecimal(graft.types.U256Arith.u256Sum(col("value")))
          .cast("long").as("wei_sent"))
      .orderBy(col("sender"))
  }

  // ------------------------------------------------------------------
  // PageRank over the address transfer graph — the classic iterative
  // graph-analytics workload of a chain warehouse (address importance
  // from who-pays-whom), and the repo's second bounded-iteration graph
  // operator after connected components. All arithmetic is exact
  // integer micro-rank units (total mass 1e6): floor divisions are
  // positive-operand (Spark DIV truncation == DuckDB // floor), so the
  // 5 unrolled iterations are bit-identical cross-engine — the oracle
  // replays them as 5 chained CTEs. Dangling addresses (no out-edges)
  // leak their mass identically on both engines (documented classic
  // simplification).
  //
  // Shape for scale: edges (weighted by tx count) and out-weights are
  // materialized ONCE behind a lineage truncation; each iteration is
  // one join on src + one aggregation on dst (the Pregel step), with
  // per-round truncation so the plan stays bounded across iterations —
  // the CC loop's proven recipe. Rank state is one long per address.
  val PrIters = 5
  val PrMass = 1000000L

  def chainPagerank(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Lineage
    val tx = raw(s, "transactions")
    val edges = Lineage.truncate(
      tx.filter(col("to").isNotNull)
        .select(hex(col("from")).as("src"), hex(col("to")).as("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w")))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val nodes = Lineage.truncate(
      edges.select(col("src").as("addr"))
        .unionByName(edges.select(col("dst").as("addr"))).distinct())
    val n = nodes.count()
    val perNode = PrMass / n // positive floor div — identical to SQL //
    val eOut = Lineage.truncate(edges.join(outw, Seq("src")))
    var r = nodes.select(col("addr"), lit(perNode).as("r"))
    for (_ <- 1 to PrIters) {
      val contribs = eOut
        .join(r.select(col("addr").as("src"), col("r")), Seq("src"))
        .select(col("dst").as("addr"), expr("(r * w) DIV wout").as("c"))
        .groupBy(col("addr")).agg(sum(col("c")).as("csum"))
      r = Lineage.truncate(
        nodes.join(contribs, Seq("addr"), "left")
          .na.fill(0L, Seq("csum"))
          .select(col("addr"),
            expr(s"(150 * $perNode) DIV 1000 + (850 * csum) DIV 1000").as("r")))
    }
    r.select(col("addr"), col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("addr"))
  }

  // ------------------------------------------------------------------
  // HITS hubs & authorities over the same address transfer graph
  // (Kleinberg, JACM 1999) — the who-funds-the-funders complement to
  // PageRank: exchanges/dispensers surface as hubs, sinks/contracts as
  // authorities. Same engineering recipe as chainPagerank: edges and
  // nodes materialized ONCE behind lineage truncations; each iteration
  // is one src-keyed join + dst-keyed agg (authority step) and its
  // mirror (hub step), truncated per round so the plan stays bounded.
  //
  // All arithmetic is exact integer micro-score units. Normalization
  // per half-step is `score = raw DIV d` with d = ceil(Σraw / Mass) —
  // the ceil divisor keeps every post-normalization score ≤ Mass
  // (proof: raw ≤ Σraw ≤ d·Mass), so the next half-step's per-edge
  // product score·w stays within int64 whenever a single address's
  // weighted in/out-degree is < 2^63/Mass ≈ 9.2e12 transfers — beyond
  // any chain's lifetime traffic to one address. Positive-operand
  // floor division (Spark DIV == DuckDB //) makes the 4 unrolled
  // iterations bit-identical cross-engine; the oracle replays them as
  // paired CTEs with scalar-subquery divisors.
  val HitsIters = 4
  val HitsMass = 1000000L

  def chainHits(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Lineage
    val tx = raw(s, "transactions")
    val edges = Lineage.truncate(
      tx.filter(col("to").isNotNull)
        .select(hex(col("from")).as("src"), hex(col("to")).as("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w")))
    val nodes = Lineage.truncate(
      edges.select(col("src").as("addr"))
        .unionByName(edges.select(col("dst").as("addr"))).distinct())
    val n = nodes.count()
    // Precondition: n < HitsMass. With ≥ HitsMass distinct addresses the
    // integer seed HitsMass / n floors to 0, every raw sum is 0 and the
    // ceil divisor is 0 — Spark's DIV would yield NULL scores while
    // DuckDB's // errors. At 100 TB, raise HitsMass (the overflow bound
    // above scales as 2^63/Mass) rather than accepting a zero seed.
    require(n > 0 && n < HitsMass,
      s"chainHits: node count $n must be in (0, $HitsMass) or the integer seed floors to 0")
    var h = nodes.select(col("addr"), lit(HitsMass / n).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to HitsIters) {
      val aRaw = edges
        .join(h.select(col("addr").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst")).agg(sum(expr("h * w")).as("ar"))
        .withColumnRenamed("dst", "addr")
      val aDiv = aRaw.agg(
        expr(s"(sum(ar) + ${HitsMass - 1}) DIV $HitsMass").as("da"))
      a = Lineage.truncate(
        nodes.join(aRaw, Seq("addr"), "left").na.fill(0L, Seq("ar"))
          .crossJoin(aDiv) // 1-row divisor — broadcast literal
          .select(col("addr"), expr("ar DIV da").as("a")))
      val hRaw = edges
        .join(a.select(col("addr").as("dst"), col("a")), Seq("dst"))
        .groupBy(col("src")).agg(sum(expr("a * w")).as("hr"))
        .withColumnRenamed("src", "addr")
      val hDiv = hRaw.agg(
        expr(s"(sum(hr) + ${HitsMass - 1}) DIV $HitsMass").as("dh"))
      h = Lineage.truncate(
        nodes.join(hRaw, Seq("addr"), "left").na.fill(0L, Seq("hr"))
          .crossJoin(hDiv)
          .select(col("addr"), expr("hr DIV dh").as("h")))
    }
    a.join(h, Seq("addr"))
      .select(col("addr"), col("a").as("auth_micro"), col("h").as("hub_micro"))
      .orderBy(col("auth_micro").desc, col("hub_micro").desc, col("addr"))
  }

  // ------------------------------------------------------------------
  // Pass-through (mixer/hop) screen: per-address flow balance — the
  // forensics readout that classifies every address as source / relay /
  // sink and scores relays by how much of their inflow they forward
  // (mixers and sybil hops score passthrough → 1000). Chosen over the
  // reciprocal-pair / directed-cycle screens because the fixture
  // generator emits a strictly layered from→to pattern with ZERO
  // 2-cycles or directed triangles (probed in DuckDB round 11) — a
  // registered query whose answer is structurally empty verifies
  // nothing. The fixture is in fact fully BIPARTITE (sender and
  // receiver sets are disjoint on the tx, token and combined graphs —
  // also probed), so its relay class is empty and passthrough is 0
  // throughout; the spec pins that property so a generator change that
  // introduces relays fails loudly instead of silently shifting the
  // ranking. Shape: ONE aggregated-edge pass (truncated) feeds both
  // direction rollups; the full outer join is address-keyed; ratios
  // are exact integer milli with positive-operand floor division.
  def chainFlowBalance(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Lineage
    val edges = Lineage.truncate(
      raw(s, "transactions").filter(col("to").isNotNull)
        .select(hex(col("from")).as("src"), hex(col("to")).as("dst"))
        .filter(col("src") =!= col("dst")) // self-transfers balance trivially
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w")))
    val outw = edges.groupBy(col("src"))
      .agg(sum(col("w")).as("n_out"), countDistinct(col("dst")).as("out_deg"))
      .withColumnRenamed("src", "addr")
    val inw = edges.groupBy(col("dst"))
      .agg(sum(col("w")).as("n_in"), countDistinct(col("src")).as("in_deg"))
      .withColumnRenamed("dst", "addr")
    outw.join(inw, Seq("addr"), "full")
      .na.fill(0L, Seq("n_out", "out_deg", "n_in", "in_deg"))
      .select(col("addr"), col("n_in"), col("in_deg"), col("n_out"),
        col("out_deg"), (col("n_in") + col("n_out")).as("gross"),
        expr("""CASE WHEN n_in > 0 AND n_out > 0 THEN 'relay'
                WHEN n_out > 0 THEN 'source' ELSE 'sink' END""").as("role"),
        expr("""CASE WHEN n_in > 0 AND n_out > 0
                THEN (least(n_in, n_out) * 1000) DIV greatest(n_in, n_out)
                ELSE 0 END""").as("passthrough_milli"))
      .orderBy(col("passthrough_milli").desc, col("gross").desc, col("addr"))
  }

  /** EIP-1559 fee-market decomposition per 100-block bucket: the burned
    * base fee (baseFeePerGas·gasUsed) and the miner tip
    * ((effectiveGasPrice−baseFeePerGas)·gasUsed), with pre-London
    * transactions (null block base fee, fixture blocks < 8) counted
    * separately — the fee-analytics dashboard query of a chain
    * warehouse. Shape: the per-block base fee is a DIMENSION (one row
    * per block) broadcast to the transaction fact table — no shuffle on
    * the fact side; all money math is exact integer wei on both engines
    * (values ~1e9·1e5·row-count stay far below 2^63). */
  def chainFeeMarket(s: SparkSession, dir: String): DataFrame = {
    val dim = raw(s, "blocks")
      .select(col("number"), col("baseFeePerGas").cast("long").as("base_fee"))
    val tx = raw(s, "transactions")
      .select(col("blockNumber"),
        col("effectiveGasPrice").cast("long").as("egp"),
        col("gasUsed").cast("long").as("gas"))
    tx.join(broadcast(dim), tx("blockNumber") === dim("number"))
      .groupBy(floor(col("blockNumber") / 100).cast("long").as("range100"))
      .agg(
        count(lit(1)).as("n_tx"),
        sum(when(col("base_fee").isNull, 1L).otherwise(0L)).as("n_pre_london"),
        sum(when(col("base_fee").isNotNull, col("base_fee") * col("gas"))
          .otherwise(0L)).as("burn_wei"),
        sum(when(col("base_fee").isNotNull, (col("egp") - col("base_fee")) * col("gas"))
          .otherwise(0L)).as("tip_wei"),
        max(when(col("base_fee").isNotNull, col("egp") - col("base_fee")))
          .as("max_tip_per_gas"))
      .orderBy(col("range100"))
  }

  /** Aggregate over the flattened chain — gas usage per 100-block bucket
    * (the reference's load unit scaled to the fixture range, main.rs:165),
    * exercising decimal aggs over the u256-decimal projections. */
  def chainGasByRange(s: SparkSession, dir: String): DataFrame = {
    raw(s, "transactions")
      .groupBy(floor(col("blockNumber") / 100).cast("long").as("range100"))
      .agg(count(lit(1)).as("n_tx"), sum(col("gasUsed")).cast("long").as("gas_used"),
        sum(when(col("status") === 1, 1L).otherwise(0L)).as("n_success"))
      .orderBy(col("range100"))
  }

  /** Block-production cadence: per 100-block bucket, the min/max/mean
    * inter-block time from a lag window over the block spine — the
    * chain-health monitoring query (stalls and reorg storms show up as
    * gap outliers). The window partitions by the bucket and orders by
    * height; the first block of each bucket has no in-bucket
    * predecessor and is excluded from gap stats (count = 99 per full
    * bucket, exact on both engines). Mean is an integer DIV of exact
    * second counts. At 100 TB the blocks table is the SMALL spine
    * (rows = chain height), so the single window shuffle is trivial. */
  /** Uncle/ommer statistics per 100-block range — the chain-health
    * dashboard rollup over the one array column the reference stores on
    * blocks (uncles, main.rs:69, mapped main.rs:180-184): blocks with
    * uncles, total uncles, milli uncle rate (network-latency /
    * mining-centralization signal) and milli gas utilization (demand
    * signal), all exact integers with positive operands (Spark DIV ==
    * DuckDB //). One hash aggregation on the range key. */
  def chainUncleStats(s: SparkSession, dir: String): DataFrame =
    raw(s, "blocks")
      .select(floor(col("number") / 100).cast("long").as("range100"),
        size(col("uncles")).cast("long").as("n_unc"),
        col("gasUsed").cast("long").as("gu"),
        col("gasLimit").cast("long").as("gl"))
      .groupBy(col("range100"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("n_unc")).as("n_uncles"),
        sum(when(col("n_unc") > 0, 1L).otherwise(0L)).as("n_uncled_blocks"),
        expr("1000 * CAST(sum(n_unc) AS BIGINT) DIV count(1)")
          .as("uncle_rate_milli"),
        expr("1000 * CAST(sum(gu) AS BIGINT) DIV CAST(sum(gl) AS BIGINT)")
          .as("gas_util_milli"))
      .orderBy(col("range100"))

  def chainBlockCadence(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("range100")).orderBy(col("number"))
    raw(s, "blocks")
      .select(col("number"), col("timestamp").cast("long").as("ts_s"),
        floor(col("number") / 100).cast("long").as("range100"))
      .withColumn("gap_s", col("ts_s") - lag(col("ts_s"), 1).over(w))
      .groupBy(col("range100"))
      .agg(
        count(col("gap_s")).as("n_gaps"),
        min(col("gap_s")).as("min_gap_s"),
        max(col("gap_s")).as("max_gap_s"),
        expr("CAST(sum(gap_s) AS BIGINT) DIV count(gap_s)").as("mean_gap_s"))
      .orderBy(col("range100"))
  }

  /** Per-validator withdrawal economics over the flattened withdrawals
    * (C4's table finally queried, not just counted): withdrawal count,
    * exact gwei total, and block span per validator index — the
    * staking-dashboard rollup. One hash aggregation on the validator
    * key; the fixture only emits withdrawals post-Shanghai, so the
    * span floors at the fork. */
  def chainValidatorWithdrawals(s: SparkSession, dir: String): DataFrame =
    raw(s, "withdraws")
      .groupBy(col("validatorIndex").cast("long").as("validator"))
      .agg(
        count(lit(1)).as("n_withdrawals"),
        sum(col("amount").cast("long")).cast("long").as("gwei_total"),
        min(col("blockNumber")).as("first_block"),
        max(col("blockNumber")).as("last_block"))
      .orderBy(col("validator"))

  /** Top event-emitting contracts per 100-block bucket through the
    * CUSTOM TopKPerGroup operator (plans/TopKPerGroup.scala — the
    * two-phase heap exec, O(groups·k) memory instead of a full
    * per-group sort): the contract-leaderboard query, and the proof the
    * custom operator composes with the chain surface, not just the
    * TPC-H tables. Counts aggregate BEFORE the top-k (map-side
    * combined), so the heap sees (bucket, contract) rollup rows. */
  def chainTopContracts(s: SparkSession, dir: String): DataFrame = {
    val ev = raw(s, "events")
    val counts = ev.groupBy(
        floor(col("blockNumber") / 100).cast("long").as("range100"),
        hex(col("address")).as("contract"))
      .agg(count(lit(1)).as("n_events"))
    import graft.plans.TopKPerGroupOps.Sort
    graft.plans.TopKPerGroupOps.topKPerGroup(
        counts, groupCols = Seq("range100"),
        orderBy = Seq(Sort("n_events", desc = true), Sort("contract")), k = 3)
      .orderBy(col("range100"), col("n_events").desc, col("contract"))
  }

  /** A2 as DSv2: scan via the chainblocks source with a pushed-down range
    * predicate, then aggregate — proves the source feeds ordinary Catalyst
    * plans and the filter prunes partitions before the scan. Scoped to the
    * dumped fixture range so the DuckDB oracle re-aggregates the same rows
    * from chain_raw_blocks. */
  def chainSourceScan(s: SparkSession, dir: String): DataFrame =
    s.read.format("chainblocks")
      .option("from", From).option("to", To).option("blocksPerPartition", 20)
      .load()
      .filter(col("number") >= 100)
      .groupBy((col("number") % 10).as("mod10"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("gasUsed")).cast("long").as("gas"))
      .orderBy(col("mod10"))

  /** Referential-integrity audit across the flattened tables: every
    * transaction's blockHash must exist in blocks, every event's
    * transactionHash in transactions, every withdrawal's blockHash in
    * blocks — anti-join orphan counts, all zero for a consistent
    * extract (binary-key joins; at scale these are the standard
    * post-load audit queries). */
  def chainRefIntegrity(s: SparkSession, dir: String): DataFrame = {
    val b = raw(s, "blocks")
    val tx = raw(s, "transactions")
    val ev = raw(s, "events")
    val wd = raw(s, "withdraws")
    val txOrphans = tx.join(b.select(col("hash").as("_bh")),
      col("blockHash") === col("_bh"), "left_anti")
    val evOrphans = ev.join(tx.select(col("hash").as("_th")),
      col("transactionHash") === col("_th"), "left_anti")
    val wdOrphans = wd.join(b.select(col("hash").as("_bh")),
      col("blockHash") === col("_bh"), "left_anti")
    tx.agg(count(lit(1)).as("n_tx")).crossJoin(
        txOrphans.agg(count(lit(1)).as("tx_orphans"))).crossJoin(
        ev.agg(count(lit(1)).as("n_events"))).crossJoin(
        evOrphans.agg(count(lit(1)).as("event_orphans"))).crossJoin(
        wd.agg(count(lit(1)).as("n_withdraws"))).crossJoin(
        wdOrphans.agg(count(lit(1)).as("withdraw_orphans")))
  }

  /** Full ETL path in the graded surface: ingest 1000 blocks (the
    * reference's flush unit) into the fixed warehouse via the bucketed
    * writer, read back, and report per-table counts — the whole
    * source→flatten→dedup→write→read loop as one checked row set. */
  def chainIngest1k(s: SparkSession, dir: String): DataFrame = {
    val (fs, wh) = graft.etl.WarehouseFs.resolve(s, IngestWarehouse)
    graft.etl.WarehouseFs.deleteTree(fs, wh)
    graft.etl.Load.ingest(s, 0, 999, IngestWarehouse)
    def counted(name: String): DataFrame =
      s.read.parquet(s"$IngestWarehouse/$name").agg(
        lit(name).as("table"), count(lit(1)).as("n_rows"),
        countDistinct(col("blockNumber")).as("n_blocks"))
    val blocks = s.read.parquet(s"$IngestWarehouse/blocks").agg(
      lit("blocks").as("table"), count(lit(1)).as("n_rows"),
      countDistinct(col("number")).as("n_blocks"))
    blocks
      .unionByName(counted("transactions"))
      .unionByName(counted("events"))
      .unionByName(counted("withdraws"))
      .orderBy(col("table"))
  }

  /** ERC20-style Transfer decode over the flattened event log — the
    * flagship downstream analytics query of a chain warehouse: logs with
    * exactly 3 topics are transfer-shaped (event signature + 2 indexed
    * address args). Sender/recipient are the last 20 bytes of topics
    * 1/2 (ABI left-pads indexed addresses to a 32-byte word), the amount
    * is the log data right-aligned per ABI word semantics — the low 7
    * bytes are decoded so the value is an exact nonnegative BIGINT in
    * both engines. Emitted per row (cell-exact oracle over the raw
    * dumps), keyed by the (block, tx, log) position. At 100 TB this is a
    * narrow projection behind a topic-count filter — pushdown-friendly,
    * no shuffle until the final presentation sort. */
  def chainTransferDecode(s: SparkSession, dir: String): DataFrame =
    decodedTransfers(s)
      .orderBy(col("blockNumber"), col("txIndex"), col("logIndex"))

  /** The unsorted decoded-transfer stream shared by the per-row decode
    * query and the balance ledger below. */
  private def decodedTransfers(s: SparkSession): DataFrame = {
    val ev = raw(s, "events")
    ev.filter(size(col("topics")) === 3)
      .select(
        col("blockNumber"),
        col("transactionIndex").cast("long").as("txIndex"),
        col("logIndex").cast("long").as("logIndex"),
        hex(col("address")).as("token"),
        hex(expr("substring(topics[1], 13, 20)")).as("from_addr"),
        hex(expr("substring(topics[2], 13, 20)")).as("to_addr"),
        expr("CAST(conv(hex(substring(data, length(data) - 6, 7)), 16, 10) AS BIGINT)").as("amount"))
  }

  /** Token-holder balance ledger — the other half of the transfer-decode
    * story (token dashboards, holder counts, whale lists all read this
    * table): every decoded transfer becomes a credit row for the
    * recipient and a debit row for the sender, then ONE hash aggregation
    * on (token, holder) nets them out. The union doubles the row count
    * but stays narrow (4 columns) and map-side combines before the
    * single shuffle; at 100 TB this is the standard flows→balances
    * rollup, keyed on the natural (token, holder) pair with no skew
    * beyond real token popularity (a hot token is exactly the AQE
    * skew-join / salting case documented in SCALE.md). Amounts are
    * 7-byte values so BIGINT sums cannot overflow (2^56 · rows ≪ 2^63). */
  def chainTokenBalances(s: SparkSession, dir: String): DataFrame = {
    val tr = decodedTransfers(s)
    val flows = tr.select(col("token"), col("to_addr").as("holder"),
        col("amount").as("in_wei"), lit(0L).as("out_wei"))
      .unionByName(tr.select(col("token"), col("from_addr").as("holder"),
        lit(0L).as("in_wei"), col("amount").as("out_wei")))
    flows.groupBy(col("token"), col("holder"))
      .agg(
        count(lit(1)).as("n_transfers"),
        sum(col("in_wei")).cast("long").as("wei_in"),
        sum(col("out_wei")).cast("long").as("wei_out"),
        (sum(col("in_wei")) - sum(col("out_wei"))).cast("long").as("net_wei"))
      .orderBy(col("token"), col("holder"))
  }

  // ------------------------------------------------------------------
  // Holder-concentration Gini over decoded transfer inflows — the
  // wealth-concentration readout every token dashboard publishes. Exact
  // rank form over micro-wei-quantized balances:
  //   G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx),  ranks ascending,
  // quantized to milli with positive-operand integer division.
  //
  // SCALE SHAPE: Gini needs a global rank, and a single-partition
  // window over a ledger is the classic scale-killer — so this is the
  // q48 two-phase distributed rank: shard the value axis on a fixed
  // grid (shard(x) ≤ shard(y) whenever x ≤ y), per-shard row_numbers in
  // bounded tasks, then a grid-sized cumulative offset table broadcast
  // back; rank = offset + in-shard row_number, exactly. The only
  // corpus-sized sort is gone; the scale path past the documented
  // Σ rank·x < 2^63/1000 exactness bound is the log-histogram Gini
  // over sketch_quantile_hist buckets.
  //
  // Quantization: micro-wei (x DIV 1e6) keeps rank·x inside int64 at
  // ledger sizes the exact form is meant for; ties get the (q, token,
  // holder) total order so both engines rank identically.
  object Gini {
    val QuantDiv = 1000000L   // wei -> micro-wei
    val ShardWidth = 100000000L // micro-wei per rank shard (~720 shards max)
  }

  def chainBalanceGini(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.{Lineage, Windows}
    val bal = Lineage.truncate(decodedTransfers(s)
      .groupBy(col("token"), col("to_addr").as("holder"))
      .agg(sum(col("amount")).as("wei_in"))
      .select(col("token"), col("holder"),
        expr(s"wei_in DIV ${Gini.QuantDiv}").as("q"))
      .withColumn("_shard", expr(s"q DIV ${Gini.ShardWidth}")))
    // Phase 1: rank inside each value-grid shard (bounded tasks)
    val wIn = Window.partitionBy(col("_shard"))
      .orderBy(col("q"), col("token"), col("holder"))
    val inShard = bal.withColumn("_rn", row_number().over(wIn).cast("long"))
    // Phase 2: grid-sized offset table (bounded by the shard grid)
    val offsets = bal.groupBy(col("_shard")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset", coalesce(sum(col("_cnt")).over(
        Windows.boundedGlobal(col("_shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_shard"), col("_offset"))
    inShard.join(broadcast(offsets), Seq("_shard"))
      .withColumn("rk", col("_offset") + col("_rn"))
      .agg(count(lit(1)).as("n_holders"),
        sum(col("q")).as("total_q"),
        sum(col("rk") * col("q")).as("siq"))
      .select(col("n_holders"), col("total_q"),
        expr("""CASE WHEN total_q > 0
                THEN (2 * siq - (n_holders + 1) * total_q) * 1000
                     DIV (n_holders * total_q)
                ELSE NULL END""").as("gini_milli"))
  }

  val chainBalanceGiniSql: String =
    s"""WITH tr AS (
       |  SELECT hex(address) AS token,
       |    substr(hex(topics[3]), 25, 40) AS holder,
       |    CAST(concat('0x', substr(hex(data), 2 * octet_length(data) - 13, 14)) AS BIGINT) AS amount
       |  FROM ${tbl("events")}
       |  WHERE len(topics) = 3),
       |bal AS (
       |  SELECT token, holder,
       |    CAST(sum(amount) // ${Gini.QuantDiv} AS BIGINT) AS q
       |  FROM tr GROUP BY 1, 2),
       |r AS (
       |  SELECT q, row_number() OVER (ORDER BY q, token, holder) AS rk
       |  FROM bal),
       |s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_holders,
       |    CAST(sum(q) AS BIGINT) AS total_q,
       |    CAST(sum(rk * q) AS BIGINT) AS siq
       |  FROM r)
       |SELECT n_holders, total_q,
       |  CAST(CASE WHEN total_q > 0
       |       THEN (2 * siq - (n_holders + 1) * total_q) * 1000
       |            // (n_holders * total_q)
       |       ELSE NULL END AS BIGINT) AS gini_milli
       |FROM s""".stripMargin

  /** Sequence-integrity audit — the post-load ETL screen for any
    * "per-scope counter must be gapless" contract: gaps (missing
    * loads), duplicates (the same slot landed twice — a replay/idempotency
    * bug), and inclusion-order regressions (the counter going backwards
    * along arrival order) are each counted per scope. One window
    * exchange keyed by scope; all exact integers:
    *   n_gaps = (max − min + 1) − distinct  (holes in the span)
    *   n_dup  = n_rows − distinct           (a slot landed twice)
    *   n_regr = adjacent inversions along (blockNumber, txIndex) order
    * The registered query audits transactionIndex per block (the
    * contract C1's posexplode must preserve: exactly 0..n−1 per block);
    * the SAME operator keyed by sender over account nonces is the
    * classic account audit — this fixture's generator gives every tx a
    * unique sender, so the spec proves that path with planted
    * gap/dup/regression frames instead. 100 TB shape: everything
    * partitions by the scope key; no global pass. */
  def chainTxIndexAudit(s: SparkSession, dir: String): DataFrame =
    sequenceAuditOf(raw(s, "transactions")
      .select(lpad(col("blockNumber").cast("string"), 8, "0").as("scope"),
        col("blockNumber"), col("transactionIndex"),
        col("transactionIndex").as("seq")))

  /** The audit over any (scope, blockNumber, transactionIndex, seq)
    * frame — exposed so the spec can plant gaps/dups/regressions. */
  private[graft] def sequenceAuditOf(tx: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("scope"))
      .orderBy(col("blockNumber"), col("transactionIndex"))
    tx
      .withColumn("prev_seq", lag(col("seq"), 1).over(w))
      .withColumn("regr",
        when(col("prev_seq").isNotNull && col("seq") < col("prev_seq"), 1L)
          .otherwise(0L))
      .groupBy(col("scope"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("seq")).as("seq_min"),
        max(col("seq")).as("seq_max"),
        countDistinct(col("seq")).as("n_distinct"),
        sum(col("regr")).as("n_regressions"))
      .filter(col("n_rows") >= 2)
      .withColumn("n_gaps",
        col("seq_max") - col("seq_min") + lit(1L) - col("n_distinct"))
      .withColumn("n_dup", col("n_rows") - col("n_distinct"))
      .select(col("scope"), col("n_rows"), col("seq_min"), col("seq_max"),
        col("n_gaps"), col("n_dup"), col("n_regressions"))
      .orderBy(col("scope"))
  }

  /** EIP-1559 base-fee conformance template — the exact integer update
    * rule (all operands positive, so Spark `DIV` and DuckDB `//` agree;
    * `{IDIV}` is spliced per engine). parent target = gasLimit/2
    * (elasticity 2); delta floors at 1 only on the increase branch, per
    * the spec pseudocode. */
  private val Eip1559ExpectedTpl: String =
    """CASE WHEN pgu = tgt THEN pbf
      |     WHEN pgu > tgt THEN pbf + greatest(1, pbf * (pgu - tgt) {IDIV} tgt {IDIV} 8)
      |     ELSE pbf - pbf * (tgt - pgu) {IDIV} tgt {IDIV} 8 END""".stripMargin

  /** Spec access to the shared template (ChainEtlSpec's planted chain). */
  private[graft] def Eip1559ExpectedForTest: String = Eip1559ExpectedTpl

  /** Base-fee market-rule audit: does each post-London block's
    * baseFeePerGas equal the EIP-1559 update applied to its parent? A
    * conforming chain answers all-yes; an ETL that mixed up columns,
    * dropped blocks, or ingested a non-conforming devnet (this fixture's
    * generator uses a linear schedule — the audit REPORTS that, which is
    * its job) shows structured deviations per 100-block range. The lag
    * runs on the block SPINE (rows = chain height — the small table), so
    * the single ordered window is trivial at any scale; all arithmetic
    * is exact positive-integer math shared across engines. */
  def chainBasefeeAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Windows
    val w = Windows.boundedGlobal(col("number"))
    raw(s, "blocks")
      .select(col("number"),
        col("baseFeePerGas").cast("long").as("bf"),
        col("gasLimit").cast("long").as("gl"),
        col("gasUsed").cast("long").as("gu"))
      .withColumn("pbf", lag(col("bf"), 1).over(w))
      .withColumn("pgu", lag(col("gu"), 1).over(w))
      .withColumn("pgl", lag(col("gl"), 1).over(w))
      .filter(col("bf").isNotNull && col("pbf").isNotNull)
      .withColumn("tgt", expr("pgl DIV 2"))
      .withColumn("expected", expr(Eip1559ExpectedTpl.replace("{IDIV}", "DIV")))
      .groupBy(floor(col("number") / 100).cast("long").as("range100"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("bf") === col("expected"), 1L).otherwise(0L)).as("n_conforming"),
        max(abs(col("bf") - col("expected"))).as("max_abs_dev_wei"),
        sum(abs(col("bf") - col("expected"))).as("sum_abs_dev_wei"))
      .orderBy(col("range100"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chain_basefee_audit" -> (chainBasefeeAudit _),
    "chain_txindex_audit" -> (chainTxIndexAudit _),
    "chain_balance_gini" -> (chainBalanceGini _),
    "chain_transfer_decode" -> (chainTransferDecode _),
    "chain_token_balances" -> (chainTokenBalances _),
    "chain_fee_market" -> (chainFeeMarket _),
    "chain_block_cadence" -> (chainBlockCadence _),
    "chain_uncle_stats" -> (chainUncleStats _),
    "chain_top_contracts" -> (chainTopContracts _),
    "chain_validator_withdrawals" -> (chainValidatorWithdrawals _),
    "chain_address_activity" -> (chainAddressActivity _),
    "chain_address_hits" -> (chainHits _),
    "chain_flow_balance" -> (chainFlowBalance _),
    "chain_address_pagerank" -> (chainPagerank _),
    "chain_tbl_blocks" -> (chainTblBlocks _),
    "chain_tbl_transactions" -> (chainTblTransactions _),
    "chain_tbl_events" -> (chainTblEvents _),
    "chain_tbl_withdraws" -> (chainTblWithdraws _),
    "chain_ingest_1k" -> (chainIngest1k _),
    "chain_source_scan" -> (chainSourceScan _),
    "chain_tables" -> (chainTables _),
    "chain_zip_vs_join" -> (chainZipVsJoin _),
    "chain_dedup_idempotent" -> (chainDedupIdempotent _),
    "chain_ref_integrity" -> (chainRefIntegrity _),
    "chain_u256_roundtrip" -> (chainU256 _),
    "chain_u256_math" -> (chainU256Math _),
    "chain_gas_by_range" -> (chainGasByRange _)
  )

  // DuckDB oracles over the raw parquet dumps at the fixed RawDumpDir.
  // The chain_tbl_* oracles recompute the portable projection
  // cell-by-cell from the raw dumps; everything else re-aggregates them.
  private def tbl(name: String) = s"'$RawDumpDir/chain_raw_$name/*.parquet'"

  /** Oracle for [[chainPagerank]]: the identical 5 iterations unrolled
    * as chained CTEs — same integer micro-rank floor arithmetic, same
    * dangling-mass behavior. */
  private val chainPagerankSql: String = {
    val iterCtes = (1 to PrIters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT nodes.addr,
         |    CAST((150 * (1000000 // n)) // 1000 + (850 * COALESCE(cs.c, CAST(0 AS BIGINT))) // 1000 AS BIGINT) AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst AS addr, CAST(sum((p.r * e.w) // o.wout) AS BIGINT) AS c
         |    FROM edges e JOIN outw o USING (src) JOIN $prev p ON p.addr = e.src
         |    GROUP BY 1) cs ON cs.addr = nodes.addr)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT hex("from") AS src, hex("to") AS dst, CAST(count(*) AS BIGINT) AS w
       |  FROM ${tbl("transactions")} WHERE "to" IS NOT NULL GROUP BY 1, 2),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY 1),
       |nodes AS (SELECT src AS addr FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT addr, CAST(1000000 // n AS BIGINT) AS r FROM nodes CROSS JOIN nn),
       |$iterCtes
       |SELECT addr, r AS rank_micro FROM r$PrIters
       |ORDER BY rank_micro DESC, addr""".stripMargin
  }

  /** Oracle for [[chainHits]]: the identical 4 iterations unrolled as
    * paired authority/hub CTEs — same ceil-divisor micro-score floor
    * arithmetic, same left-join zero fill for edgeless sides. Every
    * iteration CTE is MATERIALIZED: each a_i/h_i layer is referenced
    * TWICE (the join and the scalar-subquery divisor), so default CTE
    * inlining would double the plan per layer — 2^(2·iters)-fold. */
  private val chainHitsSql: String = {
    val m = HitsMass
    val iterCtes = (1 to HitsIters).map { i =>
      val prevH = if (i == 1) "h0" else s"h${i - 1}"
      s"""a${i}r AS MATERIALIZED (
         |  SELECT e.dst AS addr, CAST(sum(p.h * e.w) AS BIGINT) AS ar
         |  FROM edges e JOIN $prevH p ON p.addr = e.src GROUP BY 1),
         |a$i AS MATERIALIZED (
         |  SELECT nodes.addr,
         |    CAST(COALESCE(ar, CAST(0 AS BIGINT))
         |      // (((SELECT sum(ar) FROM a${i}r) + ${m - 1}) // $m) AS BIGINT) AS a
         |  FROM nodes LEFT JOIN a${i}r USING (addr)),
         |h${i}r AS MATERIALIZED (
         |  SELECT e.src AS addr, CAST(sum(p.a * e.w) AS BIGINT) AS hr
         |  FROM edges e JOIN a$i p ON p.addr = e.dst GROUP BY 1),
         |h$i AS MATERIALIZED (
         |  SELECT nodes.addr,
         |    CAST(COALESCE(hr, CAST(0 AS BIGINT))
         |      // (((SELECT sum(hr) FROM h${i}r) + ${m - 1}) // $m) AS BIGINT) AS h
         |  FROM nodes LEFT JOIN h${i}r USING (addr))""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT hex("from") AS src, hex("to") AS dst, CAST(count(*) AS BIGINT) AS w
       |  FROM ${tbl("transactions")} WHERE "to" IS NOT NULL GROUP BY 1, 2),
       |nodes AS MATERIALIZED (SELECT src AS addr FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |h0 AS MATERIALIZED (SELECT addr, CAST($m // n AS BIGINT) AS h FROM nodes CROSS JOIN nn),
       |$iterCtes
       |SELECT a$HitsIters.addr, a AS auth_micro, h AS hub_micro
       |FROM a$HitsIters JOIN h$HitsIters USING (addr)
       |ORDER BY auth_micro DESC, hub_micro DESC, addr""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "chain_basefee_audit" ->
      s"""WITH b AS (
         |  SELECT CAST(number AS BIGINT) AS number,
         |    CAST(baseFeePerGas AS BIGINT) AS bf,
         |    lag(CAST(baseFeePerGas AS BIGINT)) OVER (ORDER BY number) AS pbf,
         |    lag(CAST(gasUsed AS BIGINT)) OVER (ORDER BY number) AS pgu,
         |    lag(CAST(gasLimit AS BIGINT)) OVER (ORDER BY number) // 2 AS tgt
         |  FROM ${tbl("blocks")}),
         |e AS (
         |  SELECT number, bf,
         |    ${Eip1559ExpectedTpl.replace("{IDIV}", "//").replace("\n", " ")} AS expected
         |  FROM b WHERE bf IS NOT NULL AND pbf IS NOT NULL)
         |SELECT CAST(number // 100 AS BIGINT) AS range100,
         |  CAST(count(*) AS BIGINT) AS n_blocks,
         |  CAST(sum(CASE WHEN bf = expected THEN 1 ELSE 0 END) AS BIGINT) AS n_conforming,
         |  CAST(max(abs(bf - expected)) AS BIGINT) AS max_abs_dev_wei,
         |  CAST(sum(abs(bf - expected)) AS BIGINT) AS sum_abs_dev_wei
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "chain_txindex_audit" ->
      s"""WITH tx AS (
         |  SELECT lpad(CAST(blockNumber AS VARCHAR), 8, '0') AS scope,
         |    blockNumber, transactionIndex,
         |    CAST(transactionIndex AS BIGINT) AS seq
         |  FROM ${tbl("transactions")}),
         |lagged AS (
         |  SELECT scope, seq,
         |    CASE WHEN lag(seq) OVER (PARTITION BY scope
         |           ORDER BY blockNumber, transactionIndex) IS NOT NULL
         |          AND seq < lag(seq) OVER (PARTITION BY scope
         |           ORDER BY blockNumber, transactionIndex)
         |         THEN 1 ELSE 0 END AS regr
         |  FROM tx)
         |SELECT scope, CAST(count(*) AS BIGINT) AS n_rows,
         |  min(seq) AS seq_min, max(seq) AS seq_max,
         |  CAST(max(seq) - min(seq) + 1 - count(DISTINCT seq) AS BIGINT) AS n_gaps,
         |  CAST(count(*) - count(DISTINCT seq) AS BIGINT) AS n_dup,
         |  CAST(sum(regr) AS BIGINT) AS n_regressions
         |FROM lagged
         |GROUP BY scope HAVING count(*) >= 2
         |ORDER BY scope""".stripMargin,
    "chain_balance_gini" -> chainBalanceGiniSql,
    "chain_address_hits" -> chainHitsSql,
    "chain_flow_balance" ->
      s"""WITH edges AS MATERIALIZED (
         |  SELECT hex("from") AS src, hex("to") AS dst, CAST(count(*) AS BIGINT) AS w
         |  FROM ${tbl("transactions")}
         |  WHERE "to" IS NOT NULL AND hex("from") <> hex("to")
         |  GROUP BY 1, 2),
         |o AS (SELECT src AS addr, CAST(sum(w) AS BIGINT) AS n_out,
         |        CAST(count(DISTINCT dst) AS BIGINT) AS out_deg FROM edges GROUP BY 1),
         |i AS (SELECT dst AS addr, CAST(sum(w) AS BIGINT) AS n_in,
         |        CAST(count(DISTINCT src) AS BIGINT) AS in_deg FROM edges GROUP BY 1),
         |j AS (
         |  SELECT COALESCE(o.addr, i.addr) AS addr,
         |    CAST(COALESCE(n_in, 0) AS BIGINT) AS n_in,
         |    CAST(COALESCE(in_deg, 0) AS BIGINT) AS in_deg,
         |    CAST(COALESCE(n_out, 0) AS BIGINT) AS n_out,
         |    CAST(COALESCE(out_deg, 0) AS BIGINT) AS out_deg
         |  FROM o FULL JOIN i ON o.addr = i.addr)
         |SELECT addr, n_in, in_deg, n_out, out_deg,
         |  n_in + n_out AS gross,
         |  CASE WHEN n_in > 0 AND n_out > 0 THEN 'relay'
         |       WHEN n_out > 0 THEN 'source' ELSE 'sink' END AS role,
         |  CAST(CASE WHEN n_in > 0 AND n_out > 0
         |       THEN (least(n_in, n_out) * 1000) // greatest(n_in, n_out)
         |       ELSE 0 END AS BIGINT) AS passthrough_milli
         |FROM j
         |ORDER BY passthrough_milli DESC, gross DESC, addr""".stripMargin,
    "chain_address_pagerank" -> chainPagerankSql,
    "chain_transfer_decode" ->
      s"""SELECT blockNumber,
         |  CAST(transactionIndex AS BIGINT) AS txIndex,
         |  CAST(logIndex AS BIGINT) AS logIndex,
         |  hex(address) AS token,
         |  substr(hex(topics[2]), 25, 40) AS from_addr,
         |  substr(hex(topics[3]), 25, 40) AS to_addr,
         |  CAST(concat('0x', substr(hex(data), 2 * octet_length(data) - 13, 14)) AS BIGINT) AS amount
         |FROM ${tbl("events")}
         |WHERE len(topics) = 3
         |ORDER BY blockNumber, txIndex, logIndex""".stripMargin,
    "chain_token_balances" ->
      s"""WITH tr AS (
         |  SELECT hex(address) AS token,
         |    substr(hex(topics[2]), 25, 40) AS from_addr,
         |    substr(hex(topics[3]), 25, 40) AS to_addr,
         |    CAST(concat('0x', substr(hex(data), 2 * octet_length(data) - 13, 14)) AS BIGINT) AS amount
         |  FROM ${tbl("events")}
         |  WHERE len(topics) = 3),
         |flows AS (
         |  SELECT token, to_addr AS holder, amount AS in_wei, 0 AS out_wei FROM tr
         |  UNION ALL
         |  SELECT token, from_addr AS holder, 0 AS in_wei, amount AS out_wei FROM tr)
         |SELECT token, holder, count(*) AS n_transfers,
         |  CAST(sum(in_wei) AS BIGINT) AS wei_in,
         |  CAST(sum(out_wei) AS BIGINT) AS wei_out,
         |  CAST(sum(in_wei) - sum(out_wei) AS BIGINT) AS net_wei
         |FROM flows GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "chain_tbl_blocks" ->
      s"""SELECT hex(hash) AS hash, number, hex(parentHash) AS parentHash,
         |coalesce(array_to_string(list_transform(uncles, x -> hex(x)), ','), '') AS uncles,
         |hex(sha3Uncles) AS sha3Uncles, hex(totalDifficulty) AS totalDifficulty,
         |hex(miner) AS miner, hex(difficulty) AS difficulty, hex(nonce) AS nonce,
         |hex(mixHash) AS mixHash, CAST(baseFeePerGas AS VARCHAR) AS baseFeePerGas,
         |CAST(gasLimit AS VARCHAR) AS gasLimit, CAST(gasUsed AS VARCHAR) AS gasUsed,
         |hex(stateRoot) AS stateRoot, hex(transactionsRoot) AS transactionsRoot,
         |hex(receiptsRoot) AS receiptsRoot, hex(logsBloom) AS logsBloom,
         |hex(withdrawlsRoot) AS withdrawlsRoot, hex(extraData) AS extraData,
         |CAST("timestamp" AS VARCHAR) AS "timestamp", CAST("size" AS VARCHAR) AS "size"
         |FROM ${tbl("blocks")} ORDER BY number""".stripMargin,
    "chain_tbl_transactions" ->
      s"""SELECT hex(hash) AS hash, hex(blockHash) AS blockHash, blockNumber,
         |CAST(blockTimestamp AS VARCHAR) AS blockTimestamp, transactionIndex,
         |CAST(chainId AS VARCHAR) AS chainId, "type", hex("from") AS "from",
         |hex("to") AS "to", hex("value") AS "value", CAST(nonce AS VARCHAR) AS nonce,
         |hex(input) AS input, CAST(gas AS VARCHAR) AS gas,
         |CAST(gasPrice AS VARCHAR) AS gasPrice,
         |CAST(maxFeePerGas AS VARCHAR) AS maxFeePerGas,
         |CAST(maxPriorityFeePerGas AS VARCHAR) AS maxPriorityFeePerGas,
         |hex(r) AS r, hex(s) AS s, v, accessList,
         |hex(contractAddress) AS contractAddress,
         |CAST(cumulativeGasUsed AS VARCHAR) AS cumulativeGasUsed,
         |CAST(effectiveGasPrice AS VARCHAR) AS effectiveGasPrice,
         |CAST(gasUsed AS VARCHAR) AS gasUsed, hex(logsBloom) AS logsBloom,
         |hex(root) AS root, status
         |FROM ${tbl("transactions")} ORDER BY blockNumber, transactionIndex""".stripMargin,
    "chain_tbl_events" ->
      s"""SELECT hex(address) AS address, hex(blockHash) AS blockHash, blockNumber,
         |CAST(blockTimestamp AS VARCHAR) AS blockTimestamp,
         |hex(transactionHash) AS transactionHash, transactionIndex,
         |CAST(logIndex AS VARCHAR) AS logIndex, removed,
         |coalesce(array_to_string(list_transform(topics, x -> hex(x)), ','), '') AS topics,
         |hex(data) AS data
         |FROM ${tbl("events")}
         |ORDER BY blockNumber, transactionIndex, CAST(logIndex AS BIGINT)""".stripMargin,
    "chain_tbl_withdraws" ->
      s"""SELECT hex(blockHash) AS blockHash, blockNumber,
         |CAST(blockTimestamp AS VARCHAR) AS blockTimestamp, "index", validatorIndex,
         |hex(address) AS address, CAST(amount AS VARCHAR) AS amount
         |FROM ${tbl("withdraws")} ORDER BY blockNumber, "index"""".stripMargin,
    "chain_tables" ->
      s"""SELECT * FROM (
         |SELECT 'blocks' AS "table", count(*) AS n_rows, count(DISTINCT (hash, number)) AS n_keys FROM ${tbl("blocks")}
         |UNION ALL SELECT 'events', count(*), count(DISTINCT (transactionHash, logIndex)) FROM ${tbl("events")}
         |UNION ALL SELECT 'transactions', count(*), count(DISTINCT hash) FROM ${tbl("transactions")}
         |UNION ALL SELECT 'withdraws', count(*), count(DISTINCT (blockHash, "index")) FROM ${tbl("withdraws")}
         |) t ORDER BY "table"""".stripMargin,
    "chain_zip_vs_join" ->
      s"""SELECT count(*) AS zip_rows, count(*) AS join_rows,
         |CAST(0 AS BIGINT) AS zip_minus_join, CAST(0 AS BIGINT) AS join_minus_zip
         |FROM ${tbl("transactions")}""".stripMargin,
    "chain_dedup_idempotent" ->
      s"""SELECT count(*) AS single_run, 2 * count(*) AS double_run,
         |count(*) AS after_dedup FROM ${tbl("blocks")}""".stripMargin,
    // Reconstructs each 32-byte value from its two low 64-bit limbs (exact
    // for values < 2^127; upper-limb-zero is asserted via n_roundtrip_ok,
    // which counts values representable in DECIMAL(38,0) — the precise
    // condition under which the Spark roundtrip succeeds).
    "chain_u256_roundtrip" ->
      s"""SELECT count(*) AS n_tx,
         |CAST(SUM(CASE WHEN substr(hex("value"), 1, 32) = repeat('0', 32)
         |          AND CAST(CAST(concat('0x', substr(hex("value"), 33, 16)) AS UBIGINT) AS HUGEINT) * 18446744073709551616
         |              + CAST(CAST(concat('0x', substr(hex("value"), 49, 16)) AS UBIGINT) AS HUGEINT)
         |              < CAST('100000000000000000000000000000000000000' AS HUGEINT)
         |     THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
         |CAST(CAST(SUM(CAST(CAST(concat('0x', substr(hex("value"), 33, 16)) AS UBIGINT) AS HUGEINT) * 18446744073709551616
         |              + CAST(CAST(concat('0x', substr(hex("value"), 49, 16)) AS UBIGINT) AS HUGEINT)) AS DECIMAL(38,0)) AS VARCHAR) AS total_value_wei,
         |CAST(CAST(SUM(CAST(CAST(concat('0x', substr(hex("value"), 33, 16)) AS UBIGINT) AS HUGEINT) * 18446744073709551616
         |              + CAST(CAST(concat('0x', substr(hex("value"), 49, 16)) AS UBIGINT) AS HUGEINT)) AS DECIMAL(38,0)) AS VARCHAR) AS total_value_u256
         |FROM ${tbl("transactions")}""".stripMargin,
    "chain_ref_integrity" ->
      s"""SELECT
         |  (SELECT count(*) FROM ${tbl("transactions")}) AS n_tx,
         |  (SELECT count(*) FROM ${tbl("transactions")} t
         |   WHERE NOT EXISTS (SELECT 1 FROM ${tbl("blocks")} b WHERE b.hash = t.blockHash)) AS tx_orphans,
         |  (SELECT count(*) FROM ${tbl("events")}) AS n_events,
         |  (SELECT count(*) FROM ${tbl("events")} e
         |   WHERE NOT EXISTS (SELECT 1 FROM ${tbl("transactions")} t WHERE t.hash = e.transactionHash)) AS event_orphans,
         |  (SELECT count(*) FROM ${tbl("withdraws")}) AS n_withdraws,
         |  (SELECT count(*) FROM ${tbl("withdraws")} w
         |   WHERE NOT EXISTS (SELECT 1 FROM ${tbl("blocks")} b WHERE b.hash = w.blockHash)) AS withdraw_orphans""".stripMargin,
    "chain_address_activity" ->
      s"""SELECT hex("from") AS sender,
         |  count(*) AS n_tx,
         |  count(DISTINCT blockNumber) AS n_blocks,
         |  min(blockNumber) AS first_block,
         |  max(blockNumber) AS last_block,
         |  count(DISTINCT "to") AS n_recipients,
         |  count(contractAddress) AS n_creates,
         |  CAST(sum(CAST(gasUsed AS BIGINT)) AS BIGINT) AS gas_used,
         |  CAST(sum(CAST(concat('0x', substr(hex("value"), 51, 14)) AS BIGINT)) AS BIGINT) AS wei_sent
         |FROM ${tbl("transactions")} GROUP BY 1 ORDER BY 1""".stripMargin,
    "chain_fee_market" ->
      s"""SELECT CAST(floor(t.blockNumber / 100) AS BIGINT) AS range100,
         |  count(*) AS n_tx,
         |  CAST(SUM(CASE WHEN b.baseFeePerGas IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_london,
         |  CAST(SUM(CASE WHEN b.baseFeePerGas IS NOT NULL
         |       THEN CAST(b.baseFeePerGas AS BIGINT) * CAST(t.gasUsed AS BIGINT) ELSE 0 END) AS BIGINT) AS burn_wei,
         |  CAST(SUM(CASE WHEN b.baseFeePerGas IS NOT NULL
         |       THEN (CAST(t.effectiveGasPrice AS BIGINT) - CAST(b.baseFeePerGas AS BIGINT)) * CAST(t.gasUsed AS BIGINT) ELSE 0 END) AS BIGINT) AS tip_wei,
         |  CAST(MAX(CASE WHEN b.baseFeePerGas IS NOT NULL
         |       THEN CAST(t.effectiveGasPrice AS BIGINT) - CAST(b.baseFeePerGas AS BIGINT) END) AS BIGINT) AS max_tip_per_gas
         |FROM ${tbl("transactions")} t JOIN ${tbl("blocks")} b ON b.number = t.blockNumber
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "chain_validator_withdrawals" ->
      s"""SELECT CAST(validatorIndex AS BIGINT) AS validator,
         |  count(*) AS n_withdrawals,
         |  CAST(sum(CAST(amount AS BIGINT)) AS BIGINT) AS gwei_total,
         |  min(blockNumber) AS first_block,
         |  max(blockNumber) AS last_block
         |FROM ${tbl("withdraws")}
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "chain_top_contracts" ->
      s"""SELECT range100, contract, n_events FROM (
         |  SELECT range100, contract, n_events,
         |    row_number() OVER (PARTITION BY range100
         |      ORDER BY n_events DESC, contract) AS rn
         |  FROM (
         |    SELECT CAST(floor(blockNumber / 100) AS BIGINT) AS range100,
         |      hex(address) AS contract, count(*) AS n_events
         |    FROM ${tbl("events")} GROUP BY 1, 2))
         |WHERE rn <= 3
         |ORDER BY range100, n_events DESC, contract""".stripMargin,
    "chain_uncle_stats" ->
      s"""WITH b AS (
         |  SELECT CAST(floor(number / 100) AS BIGINT) AS range100,
         |    CAST(len(uncles) AS BIGINT) AS n_unc,
         |    CAST(gasUsed AS BIGINT) AS gu, CAST(gasLimit AS BIGINT) AS gl
         |  FROM ${tbl("blocks")})
         |SELECT range100, CAST(count(*) AS BIGINT) AS n_blocks,
         |  CAST(sum(n_unc) AS BIGINT) AS n_uncles,
         |  CAST(sum(CASE WHEN n_unc > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_uncled_blocks,
         |  CAST(1000 * CAST(sum(n_unc) AS BIGINT) // CAST(count(*) AS BIGINT)
         |    AS BIGINT) AS uncle_rate_milli,
         |  CAST(1000 * CAST(sum(gu) AS BIGINT) // CAST(sum(gl) AS BIGINT)
         |    AS BIGINT) AS gas_util_milli
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "chain_block_cadence" ->
      s"""WITH g AS (
         |  SELECT CAST(floor(number / 100) AS BIGINT) AS range100,
         |    CAST("timestamp" AS BIGINT)
         |      - lag(CAST("timestamp" AS BIGINT), 1) OVER (
         |          PARTITION BY CAST(floor(number / 100) AS BIGINT)
         |          ORDER BY number) AS gap_s
         |  FROM ${tbl("blocks")})
         |SELECT range100, count(gap_s) AS n_gaps,
         |  CAST(min(gap_s) AS BIGINT) AS min_gap_s,
         |  CAST(max(gap_s) AS BIGINT) AS max_gap_s,
         |  CAST(sum(gap_s) AS BIGINT) // count(gap_s) AS mean_gap_s
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "chain_u256_math" ->
      s"""SELECT CAST(floor(blockNumber / 100) AS BIGINT) AS range100,
         |count(*) AS n_tx,
         |CAST(SUM(CAST(concat('0x', substr(hex("value"), 51, 14)) AS BIGINT) // 1000000000) AS BIGINT) AS gwei_sent,
         |CAST(SUM(CAST(concat('0x', substr(hex("value"), 51, 14)) AS BIGINT) * 2) AS BIGINT) AS wei_doubled
         |FROM ${tbl("transactions")} GROUP BY 1 ORDER BY 1""".stripMargin,
    "chain_gas_by_range" ->
      s"""SELECT CAST(floor(blockNumber / 100) AS BIGINT) AS range100,
         |count(*) AS n_tx,
         |CAST(SUM(CAST(gasUsed AS BIGINT)) AS BIGINT) AS gas_used,
         |CAST(SUM(CASE WHEN status = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_success
         |FROM ${tbl("transactions")} GROUP BY 1 ORDER BY 1""".stripMargin,
    "chain_source_scan" ->
      s"""SELECT CAST(number % 10 AS BIGINT) AS mod10, count(*) AS n_blocks,
         |CAST(SUM(CAST(gasUsed AS BIGINT)) AS BIGINT) AS gas
         |FROM ${tbl("blocks")} WHERE number >= 100 GROUP BY 1 ORDER BY 1""".stripMargin,
    "chain_ingest_1k" ->
      s"""SELECT * FROM (
         |SELECT 'blocks' AS "table", count(*) AS n_rows, count(DISTINCT number) AS n_blocks FROM read_parquet('$IngestWarehouse/blocks/*/*.parquet')
         |UNION ALL SELECT 'events', count(*), count(DISTINCT blockNumber) FROM read_parquet('$IngestWarehouse/events/*/*.parquet')
         |UNION ALL SELECT 'transactions', count(*), count(DISTINCT blockNumber) FROM read_parquet('$IngestWarehouse/transactions/*/*.parquet')
         |UNION ALL SELECT 'withdraws', count(*), count(DISTINCT blockNumber) FROM read_parquet('$IngestWarehouse/withdraws/*/*.parquet')
         |) t ORDER BY "table"""".stripMargin
  )
}
