package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.Executors

import com.fasterxml.jackson.databind.ObjectMapper

import graft.etl.{ChainFixture, Flatten}
import graft.sources.{BlockFetcher, WsJsonRpcFetcher}

/** A2/A3 over the reference's actual transport (WebSocket JSON-RPC,
  * main.rs:50): the WS fetcher against a stubbed node speaking RFC 6455 —
  * real HTTP upgrade handshake, masked client frames, fragmentation-safe
  * reads — serving the same fixture payloads as the HTTP stub
  * ([[RpcStubWire]]). */
class WsFetcherSpec extends SparkSuite {

  /** Minimal RFC 6455 server: upgrade handshake + text frame echo-style
    * request/response loop, one thread per connection (concurrent
    * partition readers each get their own connection). */
  private class StubWsServer {
    private val server = new ServerSocket(0, 50, InetAddress.getByName("127.0.0.1"))
    private val pool = Executors.newCachedThreadPool()
    @volatile private var running = true
    val port: Int = server.getLocalPort
    /** Connection accounting, for the per-task close (leak) regression. */
    val opened = new java.util.concurrent.atomic.AtomicInteger(0)
    val live = new java.util.concurrent.atomic.AtomicInteger(0)
    /** Heads the node will push to newHeads subscribers (spec enqueues). */
    val heads = new java.util.concurrent.LinkedBlockingQueue[Long]()

    def start(): Unit = {
      pool.submit(new Runnable {
        override def run(): Unit =
          while (running)
            try { val s = server.accept(); pool.submit(new Runnable { override def run(): Unit = handle(s) }); () }
            catch { case _: Throwable => () } // socket closed on stop
      })
      ()
    }

    def stop(): Unit = { running = false; server.close(); pool.shutdownNow(); () }

    private def handle(sock: Socket): Unit = {
      val mapper = new ObjectMapper()
      opened.incrementAndGet()
      live.incrementAndGet()
      try {
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val out = new BufferedOutputStream(sock.getOutputStream)
        // ---- HTTP upgrade handshake ----
        def readLine(): String = {
          val sb = new StringBuilder
          var c = in.read()
          while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
          sb.toString
        }
        var line = readLine()
        var wsKey: String = null
        while (line.nonEmpty) {
          val i = line.indexOf(':')
          if (i > 0 && line.substring(0, i).equalsIgnoreCase("Sec-WebSocket-Key"))
            wsKey = line.substring(i + 1).trim
          line = readLine()
        }
        require(wsKey != null, "handshake missing Sec-WebSocket-Key")
        val accept = Base64.getEncoder.encodeToString(MessageDigest.getInstance("SHA-1")
          .digest((wsKey + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(StandardCharsets.US_ASCII)))
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(StandardCharsets.US_ASCII))
        out.flush()
        // ---- frame loop ----
        def writeRawFrame(fin: Boolean, opcode: Int, payload: Array[Byte]): Unit = {
          out.write((if (fin) 0x80 else 0x00) | opcode) // server frames unmasked
          if (payload.length <= 125) out.write(payload.length)
          else if (payload.length <= 0xffff) {
            out.write(126); out.write(payload.length >>> 8); out.write(payload.length & 0xff)
          } else {
            out.write(127)
            var i = 7
            while (i >= 0) { out.write(((payload.length.toLong >>> (8 * i)) & 0xff).toInt); i -= 1 }
          }
          out.write(payload); out.flush()
        }
        // the subscription pusher writes from its own thread: one lock
        // per connection keeps frames atomic on the wire
        val writeLock = new Object
        def writeFrame(opcode: Int, payload: Array[Byte]): Unit = writeLock.synchronized {
          // fragment large text messages (text + continuation frames) so
          // the client's reassembly path is exercised by every block fetch
          if (opcode == 1 && payload.length > 1024) {
            val half = payload.length / 2
            writeRawFrame(fin = false, 1, payload.take(half))
            writeRawFrame(fin = true, 0, payload.drop(half))
          } else writeRawFrame(fin = true, opcode, payload)
        }
        @volatile var subscribed = false
        def startPusher(): Unit = {
          pool.submit(new Runnable {
            override def run(): Unit =
              while (subscribed && !sock.isClosed)
                Option(heads.poll(100, java.util.concurrent.TimeUnit.MILLISECONDS)).foreach { h =>
                  writeFrame(1, (s"""{"jsonrpc":"2.0","method":"eth_subscription","params":""" +
                    s"""{"subscription":"0xfeed1","result":{"number":"0x${h.toHexString}"}}}""")
                    .getBytes(StandardCharsets.UTF_8))
                }
          })
          ()
        }
        val msg = new java.io.ByteArrayOutputStream()
        var open = true
        while (open) {
          val b0 = in.read()
          if (b0 == -1) open = false
          else {
            val fin = (b0 & 0x80) != 0
            val opcode = b0 & 0x0f
            val b1 = in.readUnsignedByte()
            val masked = (b1 & 0x80) != 0
            var len: Long = b1 & 0x7f
            if (len == 126) len = in.readUnsignedShort().toLong
            else if (len == 127) len = in.readLong()
            val mask = if (masked) { val m = new Array[Byte](4); in.readFully(m); m } else null
            val payload = new Array[Byte](len.toInt)
            in.readFully(payload)
            if (masked) {
              var i = 0
              while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
            }
            opcode match {
              case 8 => writeFrame(8, payload); open = false // close echo
              case 9 => writeFrame(10, payload) // ping -> pong
              case 1 | 0 =>
                msg.write(payload)
                if (fin) {
                  val req = msg.toString(StandardCharsets.UTF_8); msg.reset()
                  val root = mapper.readTree(req)
                  root.get("method").asText() match {
                    case "eth_subscribe" =>
                      writeFrame(1, s"""{"jsonrpc":"2.0","id":${root.get("id").asLong()},"result":"0xfeed1"}"""
                        .getBytes(StandardCharsets.UTF_8))
                      if (!subscribed) { subscribed = true; startPusher() }
                    case "eth_unsubscribe" =>
                      subscribed = false
                      writeFrame(1, s"""{"jsonrpc":"2.0","id":${root.get("id").asLong()},"result":true}"""
                        .getBytes(StandardCharsets.UTF_8))
                    case _ =>
                      writeFrame(1, RpcStubWire.respond(req, mapper).getBytes(StandardCharsets.UTF_8))
                  }
                }
              case _ => ()
            }
          }
        }
      } catch { case _: Throwable => () } // connection torn down by client
      finally { live.decrementAndGet(); sock.close() }
    }
  }

  private def withStubWsNode[T](f: String => T): T = {
    val server = new StubWsServer
    server.start()
    try f(s"ws://127.0.0.1:${server.port}/")
    finally server.stop()
  }

  test("WS JSON-RPC fetcher parses blocks+receipts identically to the fixture") {
    withStubWsNode { url =>
      import spark.implicits._
      val fetcher = new WsJsonRpcFetcher(url)
      // cover pre/post EIP-658 and pre/post Shanghai block shapes
      val heights = Seq(0L, 5L, ChainFixture.Eip658At, 17L, 22L)
      val viaWs = heights.map(fetcher.blockWithTxs).toDS()
      val viaFixture = heights.map(ChainFixture.genBlock).toDS()
      val rcWs = heights.map(fetcher.blockReceipts).toDS()
      val rcFixture = heights.map(ChainFixture.genReceipts).toDS()
      fetcher.close()
      val bW = Flatten.blockRows(viaWs)
      val bF = Flatten.blockRows(viaFixture)
      assert(bW.except(bF).count() == 0 && bF.except(bW).count() == 0)
      val txW = Flatten.transactionRows(viaWs, rcWs)
      val txF = Flatten.transactionRows(viaFixture, rcFixture)
      assert(txW.count() == txF.count() && txW.count() > 0)
      assert(txW.except(txF).count() == 0 && txF.except(txW).count() == 0)
      val evW = Flatten.eventRows(viaWs, rcWs)
      val evF = Flatten.eventRows(viaFixture, rcFixture)
      assert(evW.except(evF).count() == 0 && evF.except(evW).count() == 0)
      val wdW = Flatten.withdrawalRows(viaWs)
      val wdF = Flatten.withdrawalRows(viaFixture)
      assert(wdW.count() > 0)
      assert(wdW.except(wdF).count() == 0 && wdF.except(wdW).count() == 0)
    }
  }

  test("forEndpoint dispatches ws:// to the WebSocket transport") {
    withStubWsNode { url =>
      val f = BlockFetcher.forEndpoint(Some(url))
      try {
        assert(f.isInstanceOf[WsJsonRpcFetcher], s"expected WS fetcher for $url")
        assert(f.blockWithTxs(3L).number == 3L)
      } finally f.close()
    }
    assert(BlockFetcher.forEndpoint(Some("http://x/")).isInstanceOf[graft.sources.HttpJsonRpcFetcher])
  }

  test("distributed extract closes its WS connection when each task completes") {
    val server = new StubWsServer
    server.start()
    try {
      val url = s"ws://127.0.0.1:${server.port}/"
      assert(BlockFetcher.blocks(spark, 0L, 9L, Some(url)).count() == 10)
      assert(server.opened.get() > 0, "extract should have opened WS connections")
      // the client's close frame is asynchronous; give it a moment
      val deadline = System.currentTimeMillis() + 10000
      while (server.live.get() != 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(server.live.get() == 0,
        s"${server.live.get()} WS connections still open after all tasks completed")
    } finally server.stop()
  }

  test("live chain tip: newHeads subscription -> spool -> streaming ingest, exactly-once across restart") {
    import org.apache.spark.sql.functions._
    val server = new StubWsServer
    server.start()
    val spool = java.nio.file.Files.createTempDirectory("graft_headspool").toString
    val wh = java.nio.file.Files.createTempDirectory("graft_tip_wh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tip_ck").toString
    val hs = new graft.streaming.ChainTip.HeadSpool(s"ws://127.0.0.1:${server.port}/", spool)
    def awaitSpooled(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (hs.count < n && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(hs.count == n, s"expected $n spooled heads, got ${hs.count}")
    }
    try {
      // phase 1: node pushes heads 0-9; a checkpointed query ingests them
      (0L until 10L).foreach(server.heads.put)
      awaitSpooled(10)
      val q1 = graft.streaming.StreamOps.chainIngestStream(
        spark, graft.streaming.ChainTip.heights(spark, spool), wh, Some(ckpt))
      q1.processAllAvailable()
      q1.stop() // "crash": the tip keeps moving while we are down
      // phase 2: heads 10-19 arrive while no query runs; a RESTARTED
      // query (same checkpoint) must ingest exactly the new files
      (10L until 20L).foreach(server.heads.put)
      awaitSpooled(20)
      val q2 = graft.streaming.StreamOps.chainIngestStream(
        spark, graft.streaming.ChainTip.heights(spark, spool), wh, Some(ckpt))
      q2.processAllAvailable()
      q2.stop()
      // ingested range == pushed range, each block exactly once
      val tx = spark.read.parquet(s"$wh/transactions_stream")
      val byBlock = tx.groupBy(col("blockNumber")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byBlock.keySet == (0L until 20L).toSet,
        s"ingested blocks must equal pushed heads, got ${byBlock.keySet.toSeq.sorted}")
      (0L until 20L).foreach { n =>
        assert(byBlock(n) == (n % 5) + 1, // the fixture's txs-per-block
          s"block $n must appear exactly once (no duplicate ingest on restart)")
      }
    } finally {
      hs.close()
      server.stop()
    }
  }

  test("graft.Ingest accepts --endpoint ws:// end-to-end (extract->flatten->load)") {
    withStubWsNode { url =>
      val wh = java.nio.file.Files.createTempDirectory("graft_ws_ingest").toString
      val c = Ingest.parse(Seq("--from", "0", "--to", "9", "--warehouse", wh, "--endpoint", url))
      assert(c.endpoint.contains(url))
      Ingest.run(spark, c)
      val viaWs = spark.read.parquet(s"$wh/blocks")
      assert(viaWs.count() == 10)
      // content identical to an offline (fixture-transport) ingest
      val whOff = java.nio.file.Files.createTempDirectory("graft_off_ingest").toString
      Ingest.run(spark, c.copy(warehouse = whOff, endpoint = None))
      val offline = spark.read.parquet(s"$whOff/blocks")
      assert(viaWs.except(offline).count() == 0 && offline.except(viaWs).count() == 0)
    }
  }
}
