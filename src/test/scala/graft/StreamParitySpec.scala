package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamParity

/** The streaming-executed oracle queries (round-12): genuinely
  * micro-batched AND equal to the one-pass batch semantics. */
class StreamParitySpec extends SparkSuite {

  test("stream_rollup_parity equals the one-pass batch rollup and ran multi-batch") {
    val got = StreamParity.streamRollupParity(spark, sf)
    val want = spark.read.parquet(s"$sf/events.parquet")
      .select(expr("CAST(CAST(ts AS TIMESTAMP) AS DATE)").as("day"),
        col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
      .orderBy(col("day"), col("event_type"))
    assert(got.collect().toSeq == want.collect().toSeq)
    // the maintained table really went through >1 micro-batch: every
    // batch touches every day partition (hash split), so the final
    // marker is the LAST batch id — id 0 would mean one degenerate batch
    val table = graft.etl.Scratch.path(spark, "stream_rollup/table")
    val lastId = spark.read.parquet(table)
      .select(max(col("last_batch"))).head().getLong(0)
    assert(lastId > 0, s"expected multi-batch execution, last batch id was $lastId")
  }

  test("stream_chain_ingest equals the batch flatten of the same height range") {
    val got = StreamParity.streamChainIngest(spark, sf).collect().toSeq
    val blocks = graft.etl.ChainFixture.blocks(spark, 0L, 199L)
    val receipts = graft.etl.ChainFixture.receipts(spark, 0L, 199L)
    val want = graft.etl.Flatten.transactionRows(blocks, receipts)
      .groupBy(col("blockNumber").cast("long").as("block_no"))
      .agg(count(lit(1)).as("n_tx"),
        countDistinct(hex(col("hash"))).as("n_hashes"),
        sum(col("transactionIndex")).as("sum_tx_index"))
      .orderBy(col("block_no"))
      .collect().toSeq
    assert(got == want)
    val wh = graft.etl.Scratch.path(spark, "stream_chain/wh")
    val batches = spark.read.parquet(s"$wh/transactions_stream")
      .select(countDistinct(col("batch_id"))).head().getLong(0)
    assert(batches > 1, s"expected multi-batch execution, saw $batches distinct batch ids")
  }

  test("stream_cms_parity equals the batch counter grid and ran multi-batch") {
    import graft.ops.SketchOps.{CmsMod, CmsWidth, cmsAB}
    val got = StreamParity.streamCmsParity(spark, sf)
    // batch grid from exact term counts through the same hash expressions
    val tf = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("exact_tf"))
      .withColumn("h", graft.functions.PolyHash.polyHash(col("term"), 31, CmsMod))
    val slots = cmsAB.zipWithIndex.map { case ((a, b), d) =>
      struct(lit(d.toLong).as("d"),
        (((lit(a) * col("h") + lit(b)) % CmsMod) % CmsWidth).as("slot"))
    }
    val want = tf.select(col("exact_tf"), explode(array(slots: _*)).as("ds"))
      .groupBy(col("ds.d").as("d"), col("ds.slot").as("slot"))
      .agg(sum(col("exact_tf")).as("c"))
      .orderBy(col("d"), col("slot"))
    assert(got.collect().toSeq == want.collect().toSeq)
    // the state genuinely accumulated across >1 micro-batch
    val cellsDir = graft.etl.Scratch.path(spark, "stream_cms/cells")
    val batches = spark.read.parquet(cellsDir)
      .select(countDistinct(col("batch_id"))).head().getLong(0)
    assert(batches > 1, s"expected multi-batch execution, saw $batches distinct batch ids")
  }

  test("stream_qhist_parity equals the batch ln-bucket grid and ran multi-batch") {
    import graft.ops.SketchOps.QWidthMilli
    val got = StreamParity.streamQhistParity(spark, sf)
    val want = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type").as("grp"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .select(col("grp"),
        expr(s"CAST(round(1000 * ln(1 + cents)) AS BIGINT) DIV $QWidthMilli").as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("c"))
      .orderBy(col("grp"), col("bucket"))
    assert(got.collect().toSeq == want.collect().toSeq)
    val cellsDir = graft.etl.Scratch.path(spark, "stream_qhist/cells")
    val batches = spark.read.parquet(cellsDir)
      .select(countDistinct(col("batch_id"))).head().getLong(0)
    assert(batches > 1, s"expected multi-batch execution, saw $batches distinct batch ids")
  }

  test("stream_hll_parity equals the batch register pipeline and ran multi-batch") {
    val got = StreamParity.streamHllParity(spark, sf)
    // the batch twin over the same (event_type, user_id) rows
    val want = graft.ops.SketchOps.hllKeyed(
        spark.read.parquet(s"$sf/events.parquet"),
        col("event_type"), col("user_id"))
      .select(col("grp").as("event_type"), col("n_hit"), col("n_zero"),
        col("s_scaled"), col("est_milli"))
      .orderBy(col("event_type"))
    assert(got.collect().toSeq == want.collect().toSeq)
    val outDir = graft.etl.Scratch.path(spark, "stream_hll/out")
    val batches = spark.read.parquet(outDir)
      .select(countDistinct(col("batch_id"))).head().getLong(0)
    assert(batches > 1, s"expected multi-batch execution, saw $batches distinct batch ids")
  }
}
