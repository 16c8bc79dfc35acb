package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.etl.{ChainFixture, Flatten}
import graft.sources.{ChCompressed, ChProto, ChTcpClient, ChTcpLoad, NativeCodec}

/** In-process stub implementing the SERVER side of the pinned protocol
  * revision (hello → header block → data packets → EndOfStream), the
  * same proof shape the WS transport uses (WsFetcherSpec's stub node):
  * no live ClickHouse exists in this sandbox, so the client is
  * validated against an independent implementation of the documented
  * packet layout, collecting every inserted block for comparison.
  * Accepts any number of sequential or concurrent connections (one
  * thread each) — the distributed foreachPartition path needs several.
  */
class ChTcpStubServer(compress: Boolean, failInsert: Boolean = false) extends AutoCloseable {
  import ChProto._

  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort
  val received = new ConcurrentLinkedQueue[NativeCodec.Block]()
  val queries = new ConcurrentLinkedQueue[String]()
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    try while (running) {
      val sock = server.accept()
      new Thread(() => try serve(sock) catch { case _: Throwable => () }
        finally sock.close()).start()
    } catch { case _: Throwable => () } // server closed
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def str(in: DataInputStream): String =
    new String(NativeCodec.readString(in), StandardCharsets.UTF_8)
  private def wstr(out: DataOutputStream, s: String): Unit =
    NativeCodec.writeString(out, s.getBytes(StandardCharsets.UTF_8))

  private def serve(sock: java.net.Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    // ---- hello ----
    require(NativeCodec.readVarUInt(in) == ClientHello, "expected client hello")
    str(in) // client name
    NativeCodec.readVarUInt(in); NativeCodec.readVarUInt(in) // version
    val clientRevision = NativeCodec.readVarUInt(in)
    str(in); str(in); str(in) // database, user, password
    NativeCodec.writeVarUInt(out, ServerHello)
    wstr(out, "graft-stub-clickhouse")
    NativeCodec.writeVarUInt(out, 23L); NativeCodec.writeVarUInt(out, 8L)
    NativeCodec.writeVarUInt(out, 54465L) // server revision; negotiation picks the client's
    val negotiated = math.min(clientRevision, 54465L)
    if (negotiated >= 54058L) wstr(out, "UTC")
    out.flush()
    // ---- query loop: one connection may carry several statements
    // (the CLI's --schema path runs 5 DDLs on one client) ----
    while (true) {
      val first = try NativeCodec.readVarUInt(in) catch {
        case _: java.io.EOFException => return // client closed cleanly
      }
      require(first == ClientQuery, "expected query packet")
      serveQuery(in, out, negotiated)
    }
  }

  private def serveQuery(in: DataInputStream, out: DataOutputStream, negotiated: Long): Unit = {
    str(in) // query id
    in.readByte() // query kind
    str(in); str(in); str(in) // initial user/query id/address
    in.readByte() // interface
    str(in); str(in); str(in) // os user, hostname, client name
    NativeCodec.readVarUInt(in); NativeCodec.readVarUInt(in); NativeCodec.readVarUInt(in)
    if (negotiated >= 54060L) str(in) // quota key
    require(str(in).isEmpty, "stub supports only empty settings") // settings terminator
    NativeCodec.readVarUInt(in) // stage
    val compression = NativeCodec.readVarUInt(in)
    require((compression == 1L) == compress, "compression flag mismatch with stub config")
    val sql = str(in)
    queries.add(sql)
    if (failInsert) {
      NativeCodec.writeVarUInt(out, ServerException)
      out.write(Array[Byte](60, 0, 0, 0)) // code 60 UNKNOWN_TABLE, i32 LE
      wstr(out, "DB::Exception"); wstr(out, "Table missing (stub)"); wstr(out, "")
      out.writeByte(0)
      out.flush()
      return
    }
    // DDL (CREATE …): no data phase, just EndOfStream
    if (!sql.trim.toUpperCase.startsWith("INSERT")) {
      NativeCodec.writeVarUInt(out, ServerEndOfStream)
      out.flush()
      return
    }
    // ---- INSERT header: an empty structure block ----
    sendBlock(out, NativeCodec.Block(IndexedSeq.empty, 0, IndexedSeq.empty))
    // ---- data packets until the empty terminator ----
    var done = false
    while (!done) {
      require(NativeCodec.readVarUInt(in) == ClientData, "expected data packet")
      str(in) // external-table name
      val block =
        if (compress) {
          val raw = ChCompressed.readFrame(in).getOrElse(sys.error("EOF in data packet"))
          val b = new DataInputStream(new java.io.ByteArrayInputStream(raw))
          ChProto.readBlockInfo(b)
          NativeCodec.readBlock(b).get
        } else {
          ChProto.readBlockInfo(in)
          NativeCodec.readBlock(in).get
        }
      if (block.rows == 0) done = true else received.add(block)
    }
    NativeCodec.writeVarUInt(out, ServerEndOfStream)
    out.flush()
  }

  private def sendBlock(out: DataOutputStream, block: NativeCodec.Block): Unit = {
    NativeCodec.writeVarUInt(out, ServerData)
    wstr(out, "")
    val bos = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(bos)
    ChProto.writeBlockInfo(b)
    NativeCodec.writeVarUInt(b, block.cols.size.toLong)
    NativeCodec.writeVarUInt(b, block.rows.toLong)
    b.flush()
    if (compress) ChCompressed.writeFrame(out, bos.toByteArray)
    else out.write(bos.toByteArray)
    out.flush()
  }

  override def close(): Unit = { running = false; server.close() }
}

class ChTcpSpec extends SparkSuite {

  private def txFrame = {
    val b = ChainFixture.blocks(spark, 0L, 19L)
    val r = ChainFixture.receipts(spark, 0L, 19L)
    Flatten.transactionRows(b, r)
  }

  private def hashesOf(blocks: Iterable[NativeCodec.Block]): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    blocks.foreach { blk =>
      val hi = blk.cols.indexWhere(_.name == "hash")
      assert(hi >= 0, s"hash column missing: ${blk.cols.map(_.name)}")
      (0 until blk.rows).foreach { r =>
        out += blk.data(hi)(r).asInstanceOf[Array[Byte]].map(x => f"$x%02x").mkString
      }
    }
    out.toSeq.sorted
  }

  test("uncompressed INSERT: handshake, header, blocks, terminator, EndOfStream") {
    val stub = new ChTcpStubServer(compress = false)
    try {
      val tx = txFrame
      val expected = tx.select(hex(col("hash"))).collect()
        .map(_.getString(0).toLowerCase).sorted.toSeq
      val spec = NativeCodec.specFor(tx.schema)
      val client = new ChTcpClient("127.0.0.1", stub.port)
      try {
        assert(client.serverInfo._1 == "graft-stub-clickhouse")
        assert(client.serverInfo._2 == ChProto.Revision, "negotiation must pick the client revision")
        assert(client.serverInfo._3 == "UTC")
        val rows = tx.queryExecution.toRdd.map(_.copy()).collect().toIndexedSeq
        val sent = client.insertNative("ethereum.transactions", spec, rows.grouped(64).map(_.toIndexedSeq))
        assert(sent == (rows.size + 63) / 64)
      } finally client.close()
      assert(stub.queries.peek() == "INSERT INTO ethereum.transactions FORMAT Native")
      assert(hashesOf(stub.received.toArray(Array.empty[NativeCodec.Block])) == expected)
    } finally stub.close()
  }

  test("compressed INSERT: the same blocks inside LZ4 frames survive a real socket") {
    val stub = new ChTcpStubServer(compress = true)
    try {
      val tx = txFrame
      val expected = tx.select(hex(col("hash"))).collect()
        .map(_.getString(0).toLowerCase).sorted.toSeq
      val spec = NativeCodec.specFor(tx.schema)
      val client = new ChTcpClient("127.0.0.1", stub.port, compress = true)
      try {
        val rows = tx.queryExecution.toRdd.map(_.copy()).collect().toIndexedSeq
        client.insertNative("ethereum.transactions", spec, rows.grouped(50).map(_.toIndexedSeq))
      } finally client.close()
      assert(hashesOf(stub.received.toArray(Array.empty[NativeCodec.Block])) == expected)
    } finally stub.close()
  }

  test("server exception surfaces as a loud client error with the server message") {
    val stub = new ChTcpStubServer(compress = false, failInsert = true)
    try {
      val tx = txFrame
      val spec = NativeCodec.specFor(tx.schema)
      val client = new ChTcpClient("127.0.0.1", stub.port)
      try {
        val e = intercept[RuntimeException] {
          client.insertNative("missing.table", spec, Iterator.empty)
        }
        assert(e.getMessage.contains("Table missing (stub)"))
        assert(e.getMessage.contains("60"))
      } finally client.close()
    } finally stub.close()
  }

  test("ChTcpLoad: distributed per-partition insert lands every row exactly once") {
    val stub = new ChTcpStubServer(compress = false)
    try {
      val tx = txFrame.repartition(4) // 4 partitions → up to 4 concurrent connections
      val expected = tx.select(hex(col("hash"))).collect()
        .map(_.getString(0).toLowerCase).sorted.toSeq
      ChTcpLoad.insert(tx, "127.0.0.1", stub.port, "ethereum.transactions", blockRows = 37)
      assert(hashesOf(stub.received.toArray(Array.empty[NativeCodec.Block])) == expected)
      // one INSERT query per non-empty partition
      assert(stub.queries.size <= 4 && stub.queries.size >= 1)
    } finally stub.close()
  }

  test("Ingest --schema --clickhouse: DDL bootstrap + full 4-table stream over TCP") {
    val stub = new ChTcpStubServer(compress = false)
    try {
      val wh = java.nio.file.Files.createTempDirectory("graft_chtcp_cli").toString
      graft.Ingest.run(spark, graft.Ingest.parse(Seq(
        "--schema", "--from", "0", "--to", "99",
        "--warehouse", s"$wh/wh",
        "--clickhouse", s"127.0.0.1:${stub.port}")))
      val qs = stub.queries.toArray(Array.empty[String]).toSeq
      // 1 CREATE DATABASE + 4 CREATE TABLE (reference main.rs:52-163) + 4 INSERTs
      assert(qs.count(_.startsWith("CREATE DATABASE")) == 1)
      val creates = qs.filter(_.startsWith("CREATE TABLE"))
      assert(creates.size == 4)
      // ORDER BY keys mirror the reference DDL exactly
      assert(creates.exists(q => q.contains("ethereum.blocks") && q.contains("ORDER BY (`hash`, `number`)")))
      assert(creates.exists(q => q.contains("ethereum.transactions") && q.contains("ORDER BY (`hash`)")))
      assert(creates.exists(q => q.contains("ethereum.events") && q.contains("ORDER BY (`transactionHash`, `logIndex`)")))
      assert(creates.exists(q => q.contains("ethereum.withdraws") && q.contains("ORDER BY (`blockHash`, `index`)")))
      assert(creates.forall(_.contains("ENGINE = ReplacingMergeTree")))
      val inserts = qs.filter(_.startsWith("INSERT"))
      assert(inserts.toSet == Set("blocks", "transactions", "events", "withdraws")
        .map(t => s"INSERT INTO ethereum.$t FORMAT Native"))
      // every flattened row arrived: blocks=100, txs per generator, events, withdraws
      val byTable = stub.received.toArray(Array.empty[NativeCodec.Block])
        .groupBy(b => b.cols.map(_.name).toSet)
      val rowTotals = byTable.values.map(_.map(_.rows).sum).toSeq.sorted
      val expectedTx = (0L to 99L).map(n => (n % 5) + 1).sum.toInt
      assert(rowTotals.contains(100), s"blocks rows missing: $rowTotals") // blocks table
      assert(rowTotals.contains(expectedTx), s"tx rows missing: $rowTotals")
      // the warehouse landed too (it remains the durable/resume layer)
      assert(spark.read.parquet(s"$wh/wh/blocks").count() == 100)
    } finally stub.close()
  }

  test("DDL carries the reference FixedString widths and the wire blocks match them byte-exact") {
    import graft.sources.ChDdl
    // DDL widths mirror main.rs:66-160 column for column
    val blocksDdl = ChDdl.createTableSql("blocks")
    assert(blocksDdl.contains("`hash` FixedString(32)"))
    assert(blocksDdl.contains("`miner` FixedString(20)"))
    assert(blocksDdl.contains("`nonce` FixedString(8)"))
    assert(blocksDdl.contains("`withdrawlsRoot` Nullable(FixedString(32))"))
    assert(blocksDdl.contains("`logsBloom` String"))
    val txDdl = ChDdl.createTableSql("transactions")
    assert(txDdl.contains("`from` FixedString(20)"))
    assert(txDdl.contains("`to` Nullable(FixedString(20))"))
    assert(txDdl.contains("`root` Nullable(FixedString(32))"))
    assert(txDdl.contains("`value` UInt256"), "u256 columns stay UInt256, never FixedString")
    val evDdl = ChDdl.createTableSql("events")
    assert(evDdl.contains("`address` FixedString(20)"))
    assert(evDdl.contains("`topics` Array(FixedString(32))"))
    val wDdl = ChDdl.createTableSql("withdraws")
    assert(wDdl.contains("`address` FixedString(20)"))
    assert(wDdl.contains("`blockHash` String"),
      "main.rs:149 quirk preserved: withdraws.blockHash is a plain String")

    // stub-server round-trip: a Schemas-typed blocks frame inserts over
    // TCP with fixed-width payloads; 32/20/8-byte values arrive byte-exact
    val stub = new ChTcpStubServer(compress = false)
    try {
      val blocks = Flatten.blockRows(ChainFixture.blocks(spark, 0L, 9L))
      // the canonical schema types the wire, exactly as Ingest's
      // --clickhouse path passes it through ChTcpLoad's `canonical`
      val spec = NativeCodec.specFor(graft.types.Schemas.blocks)
      val expected = blocks
        .select(hex(col("hash")), hex(col("miner")), hex(col("nonce"))).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      val client = new ChTcpClient("127.0.0.1", stub.port)
      try {
        val rows = blocks.queryExecution.toRdd.map(_.copy()).collect().toIndexedSeq
        client.insertNative("ethereum.blocks", spec, Iterator(rows))
      } finally client.close()
      val received = stub.received.toArray(Array.empty[NativeCodec.Block])
      assert(received.nonEmpty)
      val blk = received.head
      def colOf(n: String) = blk.cols(blk.cols.indexWhere(_.name == n))
      assert(colOf("hash").chType == "FixedString(32)",
        "the stub re-parsed the wire type — the header really said FixedString")
      assert(colOf("nonce").chType == "FixedString(8)")
      def hx(c: String, r: Int) = {
        val i = blk.cols.indexWhere(_.name == c)
        blk.data(i)(r).asInstanceOf[Array[Byte]].map(x => f"$x%02X").mkString
      }
      val got = (0 until blk.rows)
        .map(r => (hx("hash", r), hx("miner", r), hx("nonce", r))).sortBy(_._1)
      assert(got == expected)
      assert(got.forall { case (h, m, n) => h.length == 64 && m.length == 40 && n.length == 16 })
    } finally stub.close()
  }
}
