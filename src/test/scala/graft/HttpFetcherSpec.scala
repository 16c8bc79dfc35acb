package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.etl.{ChainFixture, Flatten, RpcBlock, RpcReceipt}
import graft.sources.HttpJsonRpcFetcher

/** A2/A3 transport: the HTTP JSON-RPC fetcher against a stubbed node that
  * serves the fixture chain in the standard wire encoding (0x-hex
  * QUANTITY/DATA, geth field spellings). Equality is checked through the
  * flatten pipeline, where byte arrays compare structurally. */
class HttpFetcherSpec extends SparkSuite {

  // ---- fixture -> JSON-RPC wire format (test-side serializer) ----
  private def hx(b: Array[Byte]): String = "\"0x" + b.map("%02x".format(_)).mkString + "\""
  private def qty(v: BigDecimal): String = "\"0x" + v.toBigInt.toString(16) + "\""
  private def qty(v: Long): String = "\"0x" + v.toHexString + "\""
  private def qtyU256(b: Array[Byte]): String = "\"0x" + BigInt(1, b).toString(16) + "\""

  private def blockJson(b: RpcBlock): String = {
    val txs = b.transactions.zipWithIndex.map { case (t, _) =>
      val base = Seq(
        s""""hash":${hx(t.hash)}""",
        s""""from":${hx(t.from)}""",
        s""""value":${qtyU256(t.value)}""",
        s""""nonce":${qty(t.nonce)}""",
        s""""input":${hx(t.input)}""",
        s""""gas":${qty(t.gas)}""",
        s""""r":${hx(t.r)}""",
        s""""s":${hx(t.s)}""",
        s""""v":${qty(t.v)}""") ++
        t.to.map(a => s""""to":${hx(a)}""") ++
        t.chainId.map(c => s""""chainId":${qty(c)}""") ++
        t.txType.map(x => s""""type":${qty(x)}""") ++
        t.gasPrice.map(g => s""""gasPrice":${qty(g)}""") ++
        t.maxFeePerGas.map(g => s""""maxFeePerGas":${qty(g)}""") ++
        t.maxPriorityFeePerGas.map(g => s""""maxPriorityFeePerGas":${qty(g)}""") ++
        t.accessList.map(a => s""""accessList":$a""")
      base.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val withdrawals = b.withdrawals.map(_.map(w =>
      s"""{"index":${qty(w.index)},"validatorIndex":${qty(w.validatorIndex)},""" +
        s""""address":${hx(w.address)},"amount":${qty(w.amount)}}""")
      .mkString(""","withdrawals":[""", ",", "]")).getOrElse("")
    val wroot = b.withdrawalsRoot.map(r => s""","withdrawalsRoot":${hx(r)}""").getOrElse("")
    val baseFee = b.baseFeePerGas.map(f => s""","baseFeePerGas":${qty(f)}""").getOrElse("")
    s"""{"number":${qty(b.number)},"hash":${hx(b.hash)},"parentHash":${hx(b.parentHash)},""" +
      s""""uncles":${b.uncles.map(hx).mkString("[", ",", "]")},"sha3Uncles":${hx(b.unclesHash)},""" +
      s""""totalDifficulty":${qtyU256(b.totalDifficulty)},"miner":${hx(b.author)},""" +
      s""""difficulty":${qtyU256(b.difficulty)},"nonce":${hx(b.nonce)},"mixHash":${hx(b.mixHash)},""" +
      s""""gasLimit":${qty(b.gasLimit)},"gasUsed":${qty(b.gasUsed)},""" +
      s""""stateRoot":${hx(b.stateRoot)},"transactionsRoot":${hx(b.transactionsRoot)},""" +
      s""""receiptsRoot":${hx(b.receiptsRoot)},"logsBloom":${hx(b.logsBloom)},""" +
      s""""extraData":${hx(b.extraData)},"timestamp":${qty(b.timestamp)},"size":${qty(b.size)},""" +
      s""""transactions":$txs""" + baseFee + wroot + withdrawals + "}"
  }

  private def receiptJson(r: RpcReceipt): String = {
    val logs = r.logs.map(l =>
      s"""{"logIndex":${qty(l.logIndex)},"address":${hx(l.address)},""" +
        s""""topics":${l.topics.map(hx).mkString("[", ",", "]")},""" +
        s""""data":${hx(l.data)},"removed":${l.removed}}""").mkString("[", ",", "]")
    (Seq(
      s""""transactionHash":${hx(r.transactionHash)}""",
      s""""transactionIndex":${qty(r.transactionIndex)}""",
      s""""cumulativeGasUsed":${qty(r.cumulativeGasUsed)}""",
      s""""gasUsed":${qty(r.gasUsed)}""",
      s""""logsBloom":${hx(r.logsBloom)}""",
      s""""logs":$logs""") ++
      r.contractAddress.map(a => s""""contractAddress":${hx(a)}""") ++
      r.effectiveGasPrice.map(g => s""""effectiveGasPrice":${qty(g)}""") ++
      r.root.map(x => s""""root":${hx(x)}""") ++
      r.status.map(s => s""""status":${qty(s)}""")).mkString("{", ",", "}")
  }

  private def withStubNode[T](f: String => T): T = {
    val mapper = new ObjectMapper()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val req = mapper.readTree(new String(
          ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        val id = req.get("id").asLong()
        val n = java.lang.Long.parseLong(
          req.get("params").get(0).asText().stripPrefix("0x"), 16)
        val result = req.get("method").asText() match {
          case "eth_getBlockByNumber" => blockJson(ChainFixture.genBlock(n))
          case "eth_getBlockReceipts" =>
            ChainFixture.genReceipts(n).receipts.map(receiptJson).mkString("[", ",", "]")
          case m => throw new IllegalArgumentException(m)
        }
        val body = s"""{"jsonrpc":"2.0","id":$id,"result":$result}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/")
    finally server.stop(0)
  }

  test("HTTP JSON-RPC fetcher parses blocks+receipts identically to the fixture") {
    withStubNode { url =>
      import spark.implicits._
      val fetcher = new HttpJsonRpcFetcher(url)
      // cover pre/post EIP-658 and pre/post Shanghai block shapes
      val heights = Seq(0L, 5L, ChainFixture.Eip658At, 17L, 22L)
      val viaHttp = heights.map(fetcher.blockWithTxs).toDS()
      val viaFixture = heights.map(ChainFixture.genBlock).toDS()
      val rcHttp = heights.map(fetcher.blockReceipts).toDS()
      val rcFixture = heights.map(ChainFixture.genReceipts).toDS()
      fetcher.close()
      val bH = Flatten.blockRows(viaHttp)
      val bF = Flatten.blockRows(viaFixture)
      assert(bH.except(bF).count() == 0 && bF.except(bH).count() == 0)
      val txH = Flatten.transactionRows(viaHttp, rcHttp)
      val txF = Flatten.transactionRows(viaFixture, rcFixture)
      assert(txH.count() == txF.count() && txH.count() > 0)
      assert(txH.except(txF).count() == 0 && txF.except(txH).count() == 0)
      val evH = Flatten.eventRows(viaHttp, rcHttp)
      val evF = Flatten.eventRows(viaFixture, rcFixture)
      assert(evH.except(evF).count() == 0 && evF.except(evH).count() == 0)
      val wdH = Flatten.withdrawalRows(viaHttp)
      val wdF = Flatten.withdrawalRows(viaFixture)
      assert(wdH.count() > 0)
      assert(wdH.except(wdF).count() == 0 && wdF.except(wdH).count() == 0)
    }
  }

  test("chainblocks DSv2 source reads through the HTTP endpoint option") {
    withStubNode { url =>
      val viaHttp = spark.read.format("chainblocks")
        .option("from", 0).option("to", 9).option("blocksPerPartition", 3)
        .option("endpoint", url).load()
      val offline = spark.read.format("chainblocks")
        .option("from", 0).option("to", 9).option("blocksPerPartition", 3).load()
      assert(viaHttp.count() == 10)
      assert(viaHttp.except(offline).count() == 0 && offline.except(viaHttp).count() == 0)
    }
  }
}
