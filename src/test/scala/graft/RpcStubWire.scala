package graft

import graft.etl.{RpcBlock, RpcReceipt}

/** Fixture -> Ethereum JSON-RPC wire format (test-side serializer),
  * shared by the HTTP and WebSocket stub nodes: 0x-hex QUANTITY/DATA,
  * geth field spellings. */
object RpcStubWire {

  def hx(b: Array[Byte]): String = "\"0x" + b.map("%02x".format(_)).mkString + "\""
  def qty(v: BigDecimal): String = "\"0x" + v.toBigInt.toString(16) + "\""
  def qty(v: Long): String = "\"0x" + v.toHexString + "\""
  def qtyU256(b: Array[Byte]): String = "\"0x" + BigInt(1, b).toString(16) + "\""

  def blockJson(b: RpcBlock): String = {
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

  def receiptJson(r: RpcReceipt): String = {
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

  /** The stub node's method dispatch, shared by both transports: a
    * JSON-RPC request body in, the full JSON-RPC response body out. */
  def respond(requestBody: String, mapper: com.fasterxml.jackson.databind.ObjectMapper): String = {
    val req = mapper.readTree(requestBody)
    val id = req.get("id").asLong()
    val n = java.lang.Long.parseLong(
      req.get("params").get(0).asText().stripPrefix("0x"), 16)
    val result = req.get("method").asText() match {
      case "eth_getBlockByNumber" => blockJson(graft.etl.ChainFixture.genBlock(n))
      case "eth_getBlockReceipts" =>
        graft.etl.ChainFixture.genReceipts(n).receipts.map(receiptJson).mkString("[", ",", "]")
      case m => throw new IllegalArgumentException(m)
    }
    s"""{"jsonrpc":"2.0","id":$id,"result":$result}"""
  }
}
