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
    * tears down the WS connection. */
  class HeadSpool(endpoint: String, dir: String) extends AutoCloseable {
    new java.io.File(dir).mkdirs()
    private val seq = new AtomicLong(0L)
    private val fetcher = new WsJsonRpcFetcher(endpoint)
    private val subId = fetcher.subscribeNewHeads { number =>
      val name = f"head-${seq.getAndIncrement()}%012d.json"
      val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
      java.nio.file.Files.writeString(tmp, s"""{"number":$number}""" + "\n")
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
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
