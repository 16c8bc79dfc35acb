package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructType}

import graft.sources.WsJsonRpcFetcher

/** Live chain-tip ingestion: `eth_subscribe("newHeads")` over the WS
  * transport feeding the replay-idempotent chain-ingest stream — the
  * reference's batch loop (main.rs:172) turned into a live tail.
  *
  * Architecture: the subscription lands each pushed head as ONE tiny
  * JSON-lines file in a spool directory (write-to-tmp + atomic rename,
  * so the file source never sees a partial file), and the streaming
  * query is a plain `readStream.json(spool)` — Spark's file source
  * tracks consumed files in the checkpoint, which is what makes
  * restart-mid-stream exactly-once WITHOUT a custom Source
  * implementation: a restarted query re-reads only files the
  * checkpoint hasn't committed, and the downstream foreachBatch
  * (StreamOps.chainIngestStream) is replay-idempotent per batchId for
  * the crash window where the sink committed but the offset didn't.
  * At 100 TB-scale tips the spool is tiny (heads, not blocks): the
  * heavy fetch runs distributed inside the micro-batch, 2 RPCs per
  * block, exactly like the batch ingest.
  */
object ChainTip {

  /** Tails newHeads into `dir`. AutoCloseable: close() unsubscribes and
    * tears down the WS connection. Spool I/O goes through the Hadoop
    * FileSystem resolved from `dir`'s scheme (conf override for
    * credentialed stores), so the spool can live on the shared FS the
    * streaming query reads — a local-only spool on a cluster driver
    * would be invisible to executor-side file listing. */
  class HeadSpool(endpoint: String, dir: String,
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()) extends AutoCloseable {
    private val (fs, root) = graft.etl.WarehouseFs.resolve(hadoopConf, dir)
    graft.etl.WarehouseFs.mkdirs(fs, root)
    private val seq = new AtomicLong(0L)
    private val fetcher = new WsJsonRpcFetcher(endpoint)
    private val subId = fetcher.subscribeNewHeads { number =>
      val name = f"head-${seq.getAndIncrement()}%012d.json"
      // write-to-dotfile + rename: the json file source ignores paths
      // starting with '.', so a reader never lists a partial file even
      // on stores where rename is copy-based
      val tmp = new org.apache.hadoop.fs.Path(root, s".$name.tmp")
      graft.etl.WarehouseFs.writeString(fs, tmp, s"""{"number":$number}""" + "\n")
      graft.etl.WarehouseFs.rename(fs, tmp, new org.apache.hadoop.fs.Path(root, name))
      ()
    }

    /** Heads spooled so far (files fully landed). */
    def count: Long = seq.get()

    override def close(): Unit = {
      try fetcher.unsubscribe(subId) catch { case _: Throwable => () }
      fetcher.close()
    }
  }

  /** The spool as a streaming frame of `number: Long` — plug into
    * [[StreamOps.chainIngestStream]]. */
  def heights(spark: SparkSession, spoolDir: String): DataFrame =
    spark.readStream
      .schema(new StructType().add("number", LongType))
      .json(spoolDir)
}
