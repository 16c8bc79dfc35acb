package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow

/** Minimal ClickHouse native TCP protocol client — the transport the
  * reference's `insert_native_block` actually uses (klickhouse over
  * TCP, reference: src/main.rs:46-48,294-309). The Native BLOCK
  * encoding itself lives in [[NativeCodec]] (file format) — this adds
  * the wire around it: hello handshake, query packet, per-block data
  * packets (optionally inside [[ChCompressed]] LZ4 frames), and the
  * server response loop.
  *
  * ==Scope==
  * The client pins protocol revision 54060 (client-info + quota-key
  * era) and implements exactly that revision's field set — servers
  * negotiate `min(client, server)` and keep decades of back-compat, so
  * an old-revision client is valid against any modern server; pinning
  * it keeps every serialized field here individually accounted for
  * instead of chasing the newest revision's optional blocks. INSERT
  * streaming is the implemented surface (the reference's only use).
  * No live server exists in this sandbox: the protocol is validated
  * against an in-process stub implementing the server side of the same
  * revision (ChTcpSpec), the same way the WS transport was proven.
  */
object ChProto {
  // client → server packet ids
  val ClientHello = 0L
  val ClientQuery = 1L
  val ClientData = 2L
  // server → client packet ids
  val ServerHello = 0L
  val ServerData = 1L
  val ServerException = 2L
  val ServerProgress = 3L
  val ServerPong = 4L
  val ServerEndOfStream = 5L
  val ServerProfileInfo = 6L

  /** Pinned client protocol revision (see scaladoc). Field thresholds
    * implemented: ≥54032 client info in Query, ≥54058 server timezone
    * in Hello, ≥54060 quota key in client info. */
  val Revision = 54060L

  val QueryStageComplete = 2L
  val CompressionDisabled = 0L
  val CompressionEnabled = 1L

  def writeStr(out: DataOutputStream, s: String): Unit =
    NativeCodec.writeString(out, s.getBytes(StandardCharsets.UTF_8))

  def readStr(in: DataInputStream): String =
    new String(NativeCodec.readString(in), StandardCharsets.UTF_8)

  /** TCP data blocks carry a BlockInfo prefix that `FORMAT Native`
    * FILES do not: field-id-tagged (1: is_overflows u8, 2: bucket_num
    * i32 LE), terminated by field id 0. */
  def writeBlockInfo(out: DataOutputStream): Unit = {
    NativeCodec.writeVarUInt(out, 1L)
    out.writeByte(0) // is_overflows = false
    NativeCodec.writeVarUInt(out, 2L)
    // bucket_num = -1 (not part of a two-level aggregation), i32 LE
    out.write(0xff); out.write(0xff); out.write(0xff); out.write(0xff)
    NativeCodec.writeVarUInt(out, 0L) // end of fields
  }

  def readBlockInfo(in: DataInputStream): Unit = {
    var field = NativeCodec.readVarUInt(in)
    while (field != 0L) {
      field match {
        case 1L => in.readByte()
        case 2L => NativeCodec.readBytes(in, 4)
        case other =>
          throw new java.io.IOException(s"chtcp: unknown BlockInfo field $other")
      }
      field = NativeCodec.readVarUInt(in)
    }
  }
}

/** One INSERT-capable connection. Not thread-safe; one connection per
  * writing task (the per-partition shape [[ChTcpLoad]] uses). */
class ChTcpClient(
    host: String,
    port: Int,
    database: String = "default",
    user: String = "default",
    password: String = "",
    compress: Boolean = false) extends AutoCloseable {

  import ChProto._

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))

  /** Negotiated (server name, revision, timezone) from the hello
    * exchange — performed eagerly on construction. */
  val serverInfo: (String, Long, String) = hello()

  private def hello(): (String, Long, String) = {
    NativeCodec.writeVarUInt(out, ClientHello)
    writeStr(out, "graft-spark")
    NativeCodec.writeVarUInt(out, 0L) // version major
    NativeCodec.writeVarUInt(out, 1L) // version minor
    NativeCodec.writeVarUInt(out, Revision)
    writeStr(out, database)
    writeStr(out, user)
    writeStr(out, password)
    out.flush()
    val packet = NativeCodec.readVarUInt(in)
    if (packet == ServerException) throw readException()
    require(packet == ServerHello, s"chtcp: expected server hello, got packet $packet")
    val name = readStr(in)
    NativeCodec.readVarUInt(in) // server major
    NativeCodec.readVarUInt(in) // server minor
    val serverRevision = NativeCodec.readVarUInt(in)
    val negotiated = math.min(Revision, serverRevision)
    val tz = if (negotiated >= 54058L) readStr(in) else ""
    (name, negotiated, tz)
  }

  private def readException(): RuntimeException = {
    val code = { val b = NativeCodec.readBytes(in, 4)
      (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24) }
    val name = readStr(in)
    val message = readStr(in)
    val stack = readStr(in)
    val nested = in.readByte() != 0
    val _ = (stack, nested)
    new RuntimeException(s"chtcp: server exception $code $name: $message")
  }

  private def sendQuery(sql: String): Unit = {
    NativeCodec.writeVarUInt(out, ClientQuery)
    writeStr(out, "") // query id: let the server assign
    // client info (revision >= 54032)
    out.writeByte(1) // query kind: initial query
    writeStr(out, user) // initial user
    writeStr(out, "") // initial query id
    writeStr(out, "0.0.0.0:0") // initial address
    out.writeByte(1) // interface: TCP
    writeStr(out, "graft") // os user
    writeStr(out, "localhost") // client hostname
    writeStr(out, "graft-spark")
    NativeCodec.writeVarUInt(out, 0L) // version major
    NativeCodec.writeVarUInt(out, 1L) // version minor
    NativeCodec.writeVarUInt(out, Revision)
    writeStr(out, "") // quota key (revision >= 54060)
    writeStr(out, "") // settings: empty-name terminator (pre-54429 form)
    NativeCodec.writeVarUInt(out, QueryStageComplete)
    NativeCodec.writeVarUInt(out,
      if (compress) CompressionEnabled else CompressionDisabled)
    writeStr(out, sql)
    out.flush()
  }

  /** One data packet: table-name string (uncompressed), then the block
    * — BlockInfo + Native columns — straight or as ONE LZ4 frame. */
  private def sendBlock(spec: IndexedSeq[NativeCodec.ChCol],
      rows: IndexedSeq[InternalRow]): Unit = {
    NativeCodec.writeVarUInt(out, ClientData)
    writeStr(out, "") // external-table name: none
    if (compress) {
      val bos = new java.io.ByteArrayOutputStream()
      val b = new DataOutputStream(bos)
      writeBlockInfo(b)
      NativeCodec.writeBlock(b, spec, rows)
      b.flush()
      ChCompressed.writeFrame(out, bos.toByteArray)
    } else {
      writeBlockInfo(out)
      NativeCodec.writeBlock(out, spec, rows)
    }
    out.flush()
  }

  /** Reads one server block (the table-structure header the server
    * sends back after an INSERT query). */
  private def readServerBlock(): Option[NativeCodec.Block] = {
    readStr(in) // external-table name
    if (compress) {
      val raw = ChCompressed.readFrame(in)
        .getOrElse(throw new java.io.EOFException("chtcp: EOF inside data packet"))
      val b = new DataInputStream(new java.io.ByteArrayInputStream(raw))
      readBlockInfo(b)
      NativeCodec.readBlock(b)
    } else {
      readBlockInfo(in)
      NativeCodec.readBlock(in)
    }
  }

  /** Stream `batches` into `table` as one INSERT. Mirrors the server's
    * protocol: Query → server sends the structure header block → data
    * blocks → empty terminator block → EndOfStream. Returns the number
    * of blocks sent (excluding the terminator). */
  def insertNative(table: String, spec: IndexedSeq[NativeCodec.ChCol],
      batches: Iterator[IndexedSeq[InternalRow]]): Long = {
    sendQuery(s"INSERT INTO $table FORMAT Native")
    // await the structure header (servers may interleave Progress/Log)
    var headerSeen = false
    while (!headerSeen) {
      NativeCodec.readVarUInt(in) match {
        case ServerData => readServerBlock(); headerSeen = true
        case ServerProgress => skipProgress()
        case ServerException => throw readException()
        case other => throw new java.io.IOException(s"chtcp: unexpected packet $other before header")
      }
    }
    var n = 0L
    batches.foreach { rows => sendBlock(spec, rows); n += 1 }
    sendBlock(spec, IndexedSeq.empty) // empty block = end of data
    var done = false
    while (!done) {
      NativeCodec.readVarUInt(in) match {
        case ServerEndOfStream => done = true
        case ServerProgress => skipProgress()
        case ServerException => throw readException()
        case other => throw new java.io.IOException(s"chtcp: unexpected packet $other after data")
      }
    }
    n
  }

  private def skipProgress(): Unit = {
    // revision 54060 progress: rows, bytes, total_rows (all varuint)
    NativeCodec.readVarUInt(in)
    NativeCodec.readVarUInt(in)
    NativeCodec.readVarUInt(in)
    ()
  }

  /** Execute a resultless statement (DDL — the reference's `--schema`
    * bootstrap, main.rs:52-163): Query, then drain Progress/Data
    * packets until EndOfStream. */
  def execute(sql: String): Unit = {
    sendQuery(sql)
    var done = false
    while (!done) {
      NativeCodec.readVarUInt(in) match {
        case ServerEndOfStream => done = true
        case ServerProgress => skipProgress()
        case ServerData => readServerBlock()
        case ServerException => throw readException()
        case other => throw new java.io.IOException(s"chtcp: unexpected packet $other for DDL")
      }
    }
  }

  override def close(): Unit = {
    try out.flush() catch { case scala.util.control.NonFatal(_) => () }
    socket.close()
  }
}

/** Server-side schema bootstrap DDL — the reference's `--schema` path
  * (CREATE DATABASE + four ReplacingMergeTree tables, reference:
  * src/main.rs:52-163), generated from the SAME Spark schemas the
  * warehouse uses so the two layers can never drift. Engine and ORDER
  * BY keys mirror the reference exactly (blocks: (hash, number),
  * transactions: hash, events: (transactionHash, logIndex), withdraws:
  * (blockHash, index)). Hash/address columns declare the reference's
  * FixedString(32/20/8) widths (main.rs:66-160) — the widths ride the
  * Spark schemas as field metadata (graft.types.Schemas.FixedWidthKey)
  * and the wire blocks encode those columns as raw fixed-width
  * payloads, so DDL and payload can never disagree; withdraws.blockHash
  * stays a plain String on purpose (main.rs:149 declares it String,
  * unlike every other table — quirk preserved).
  */
object ChDdl {
  def createDatabaseSql: String = "CREATE DATABASE IF NOT EXISTS ethereum"

  def createTableSql(table: String): String = {
    val schema = table match {
      case "blocks" => graft.types.Schemas.blocks
      case "transactions" => graft.types.Schemas.transactions
      case "events" => graft.types.Schemas.events
      case "withdraws" => graft.types.Schemas.withdraws
      case other => throw new IllegalArgumentException(s"unknown chain table '$other'")
    }
    val cols = NativeCodec.specFor(schema)
      .map(c => s"`${c.name}` ${c.chType}").mkString(",\n  ")
    val orderBy = graft.types.Schemas.dedupKeys(table)
      .map(k => s"`$k`").mkString("(", ", ", ")")
    s"""CREATE TABLE IF NOT EXISTS ethereum.$table (
       |  $cols
       |) ENGINE = ReplacingMergeTree
       |ORDER BY $orderBy""".stripMargin
  }
}

/** Distributed INSERT of a DataFrame over the native TCP protocol: one
  * connection PER PARTITION, opened on the executor that holds the
  * partition (`toRdd.foreachPartition`) — rows never move to the
  * driver, and 1000 executors insert over 1000 parallel connections,
  * which is exactly how production Spark→ClickHouse connectors shape
  * the load. Blocks are cut every `blockRows` rows (the reference
  * flushes per 1000-block range; a row cap is the equivalent bound for
  * arbitrary frames). */
object ChTcpLoad {
  /** `canonical`: optional authoritative schema (graft.types.Schemas.*)
    * whose FixedString-width metadata and nullability type the wire
    * blocks, matching the bootstrap DDL exactly — the flatten layer's
    * select/cast chain drops field metadata and widens nullability, so
    * encoding from the frame's own schema would send
    * Nullable(String) where the server declares FixedString(32).
    * Columns are matched positionally (names must agree). */
  def insert(df: DataFrame, host: String, port: Int, table: String,
      blockRows: Int = NativeCodec.DefaultBlockRows,
      database: String = "default", user: String = "default",
      password: String = "", compress: Boolean = false,
      canonical: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    canonical.foreach { c =>
      require(c.fieldNames.toSeq == df.schema.fieldNames.toSeq,
        s"canonical schema column mismatch: ${c.fieldNames.toSeq} vs ${df.schema.fieldNames.toSeq}")
    }
    val spec = NativeCodec.specFor(canonical.getOrElse(df.schema))
    df.queryExecution.toRdd.foreachPartition { it: Iterator[InternalRow] =>
      if (it.hasNext) {
        val client = new ChTcpClient(host, port, database, user, password, compress)
        try client.insertNative(table, spec,
          it.map(_.copy()).grouped(blockRows).map(_.toIndexedSeq))
        finally client.close()
      }
    }
  }
}
