package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.etl.{BlockReceipts, ChainFixture, RpcBlock, RpcLog, RpcReceipt, RpcTx, RpcWithdrawal}

/** A2/A3 transport abstraction: one instance per scan partition, issuing
  * the reference's two RPCs per block (`eth_getBlockByNumber(n, true)` +
  * `eth_getBlockReceipts(n)`, reference: src/main.rs:173-174). The DSv2
  * reader and the ETL are written against this trait; which transport
  * backs it is a per-job option.
  */
trait BlockFetcher extends AutoCloseable {
  def blockWithTxs(n: Long): RpcBlock
  def blockReceipts(n: Long): BlockReceipts
  override def close(): Unit = ()
}

/** Offline transport: the deterministic generator (sandbox has no node). */
object FixtureFetcher extends BlockFetcher {
  override def blockWithTxs(n: Long): RpcBlock = ChainFixture.genBlock(n)
  override def blockReceipts(n: Long): BlockReceipts = ChainFixture.genReceipts(n)
}

/** HTTP JSON-RPC transport. One client + connection per partition reader
  * (constructed executor-side), requests issued sequentially over the
  * partition's contiguous sub-range — the reference's loop, parallelized
  * across partitions instead of across blocks.
  *
  * Parsing uses the standard quantity/data hex encodings of the Ethereum
  * JSON-RPC wire format; `miner`/`author` and `sha3Uncles`/`unclesHash`
  * are both accepted (geth vs OpenEthereum spellings, the two shapes the
  * reference's ethers client normalizes, main.rs:176-290).
  */
class HttpJsonRpcFetcher(endpoint: String) extends BlockFetcher {

  private val client = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()
  private var nextId = 0L

  private def rpc(method: String, params: String): JsonNode = {
    nextId += 1
    val body = s"""{"jsonrpc":"2.0","id":$nextId,"method":"$method","params":$params}"""
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"$method HTTP ${resp.statusCode()}")
    val root = mapper.readTree(resp.body())
    if (root.has("error"))
      throw new java.io.IOException(s"$method RPC error: ${root.get("error")}")
    root.get("result")
  }

  // ---- hex codecs (0x-prefixed DATA / QUANTITY per the JSON-RPC spec) ----
  private def hexBytes(n: JsonNode): Array[Byte] = {
    val s0 = n.asText().stripPrefix("0x")
    val s = if (s0.length % 2 == 1) "0" + s0 else s0
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }
  private def hexU256(n: JsonNode): Array[Byte] =
    graft.types.U256.toBytes32(BigInt(n.asText().stripPrefix("0x"), 16))
  private def hexLong(n: JsonNode): Long =
    java.lang.Long.parseLong(n.asText().stripPrefix("0x"), 16)
  private def hexDec(n: JsonNode): BigDecimal =
    BigDecimal(BigInt(n.asText().stripPrefix("0x"), 16))
  private def opt(o: JsonNode, f: String): Option[JsonNode] =
    Option(o.get(f)).filterNot(_.isNull)

  private def parseTx(t: JsonNode): RpcTx = RpcTx(
    hash = hexBytes(t.get("hash")),
    chainId = opt(t, "chainId").map(hexDec),
    txType = opt(t, "type").map(hexLong),
    from = hexBytes(t.get("from")),
    to = opt(t, "to").map(hexBytes),
    value = hexU256(t.get("value")),
    nonce = hexDec(t.get("nonce")),
    input = hexBytes(t.get("input")),
    gas = hexDec(t.get("gas")),
    gasPrice = opt(t, "gasPrice").map(hexDec),
    maxFeePerGas = opt(t, "maxFeePerGas").map(hexDec),
    maxPriorityFeePerGas = opt(t, "maxPriorityFeePerGas").map(hexDec),
    r = hexBytes(t.get("r")),
    s = hexBytes(t.get("s")),
    v = hexLong(t.get("v")),
    accessList = opt(t, "accessList").map(_.toString))

  private def parseWithdrawal(w: JsonNode): RpcWithdrawal = RpcWithdrawal(
    index = hexLong(w.get("index")),
    validatorIndex = hexLong(w.get("validatorIndex")),
    address = hexBytes(w.get("address")),
    amount = hexDec(w.get("amount")))

  override def blockWithTxs(n: Long): RpcBlock = {
    val b = rpc("eth_getBlockByNumber", s"""["0x${n.toHexString}",true]""")
    if (b == null || b.isNull)
      throw new NoSuchElementException(s"block $n not found")
    import scala.jdk.CollectionConverters._
    RpcBlock(
      number = hexLong(b.get("number")),
      hash = hexBytes(b.get("hash")),
      parentHash = hexBytes(b.get("parentHash")),
      uncles = b.get("uncles").elements().asScala.map(hexBytes).toSeq,
      unclesHash = hexBytes(opt(b, "sha3Uncles").orElse(opt(b, "unclesHash")).getOrElse(
        throw new NoSuchElementException(s"block $n: no sha3Uncles/unclesHash field"))),
      // geth >= 1.14 omits totalDifficulty from eth_getBlockByNumber; the
      // reference's ethers client normalizes it to zero the same way.
      totalDifficulty = opt(b, "totalDifficulty").map(hexU256)
        .getOrElse(graft.types.U256.toBytes32(BigInt(0))),
      author = hexBytes(opt(b, "miner").orElse(opt(b, "author")).getOrElse(
        throw new NoSuchElementException(s"block $n: no miner/author field"))),
      difficulty = opt(b, "difficulty").map(hexU256)
        .getOrElse(graft.types.U256.toBytes32(BigInt(0))),
      nonce = opt(b, "nonce").map(hexBytes).getOrElse(new Array[Byte](8)),
      mixHash = opt(b, "mixHash").map(hexBytes).getOrElse(new Array[Byte](32)),
      baseFeePerGas = opt(b, "baseFeePerGas").map(hexDec),
      gasLimit = hexDec(b.get("gasLimit")),
      gasUsed = hexDec(b.get("gasUsed")),
      stateRoot = hexBytes(b.get("stateRoot")),
      transactionsRoot = hexBytes(b.get("transactionsRoot")),
      receiptsRoot = hexBytes(b.get("receiptsRoot")),
      logsBloom = hexBytes(b.get("logsBloom")),
      withdrawalsRoot = opt(b, "withdrawalsRoot").map(hexBytes),
      extraData = hexBytes(b.get("extraData")),
      timestamp = hexDec(b.get("timestamp")),
      size = hexDec(b.get("size")),
      transactions = b.get("transactions").elements().asScala.map(parseTx).toSeq,
      withdrawals = opt(b, "withdrawals")
        .map(_.elements().asScala.map(parseWithdrawal).toSeq))
  }

  override def blockReceipts(n: Long): BlockReceipts = {
    val arr = rpc("eth_getBlockReceipts", s"""["0x${n.toHexString}"]""")
    import scala.jdk.CollectionConverters._
    val rs = arr.elements().asScala.map { r =>
      RpcReceipt(
        transactionHash = hexBytes(r.get("transactionHash")),
        transactionIndex = hexLong(r.get("transactionIndex")),
        contractAddress = opt(r, "contractAddress").map(hexBytes),
        cumulativeGasUsed = hexDec(r.get("cumulativeGasUsed")),
        effectiveGasPrice = opt(r, "effectiveGasPrice").map(hexDec),
        gasUsed = hexDec(r.get("gasUsed")),
        logsBloom = hexBytes(r.get("logsBloom")),
        root = opt(r, "root").map(hexBytes),
        status = opt(r, "status").map(hexLong),
        logs = r.get("logs").elements().asScala.map { l =>
          RpcLog(
            logIndex = hexLong(l.get("logIndex")),
            address = hexBytes(l.get("address")),
            topics = l.get("topics").elements().asScala.map(hexBytes).toSeq,
            data = hexBytes(l.get("data")),
            removed = l.get("removed").asBoolean())
        }.toSeq)
    }.toSeq
    BlockReceipts(n, rs)
  }
}

object BlockFetcher {
  /** Transport selection for a scan partition: an `endpoint` option picks
    * the HTTP JSON-RPC client; absent, the offline fixture. */
  def forEndpoint(endpoint: Option[String]): BlockFetcher =
    endpoint match {
      case Some(url) => new HttpJsonRpcFetcher(url)
      case None => FixtureFetcher
    }

  /** Distributed block extract over any transport: each task constructs
    * its own fetcher for its contiguous sub-range (the parallel form of
    * the reference's sequential loop, main.rs:172). */
  def blocks(spark: org.apache.spark.sql.SparkSession, from: Long, to: Long,
      endpoint: Option[String]): org.apache.spark.sql.Dataset[RpcBlock] = {
    import spark.implicits._
    spark.range(from, to + 1).as[Long].mapPartitions { it =>
      val f = forEndpoint(endpoint)
      it.map(f.blockWithTxs)
    }
  }

  def receipts(spark: org.apache.spark.sql.SparkSession, from: Long, to: Long,
      endpoint: Option[String]): org.apache.spark.sql.Dataset[BlockReceipts] = {
    import spark.implicits._
    spark.range(from, to + 1).as[Long].mapPartitions { it =>
      val f = forEndpoint(endpoint)
      it.map(f.blockReceipts)
    }
  }
}
