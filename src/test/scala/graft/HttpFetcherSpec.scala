package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.etl.{ChainFixture, Flatten}
import graft.sources.HttpJsonRpcFetcher

/** A2/A3 transport: the HTTP JSON-RPC fetcher against a stubbed node that
  * serves the fixture chain in the standard wire encoding (0x-hex
  * QUANTITY/DATA, geth field spellings — serializer in [[RpcStubWire]]).
  * Equality is checked through the flatten pipeline, where byte arrays
  * compare structurally. */
class HttpFetcherSpec extends SparkSuite {

  private def withStubNode[T](f: String => T): T = {
    val mapper = new ObjectMapper()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = RpcStubWire.respond(new String(
            ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8), mapper)
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
