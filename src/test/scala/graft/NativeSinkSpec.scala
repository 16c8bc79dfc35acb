package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.{ChainFixture, ClickHouseNativeSink, Flatten}
import graft.sources.NativeCodec
import graft.types.Schemas

/** The ClickHouse Native sink: golden-byte format compliance (the
  * layout is pinned against hand-computed bytes, not merely
  * self-consistent), lossless roundtrips of the real chain tables,
  * and the full TableSink contract (bucketing, dynamic overwrite,
  * maintenance, CLI). */
class NativeSinkSpec extends SparkSuite {

  private def encode(spec: IndexedSeq[NativeCodec.ChCol],
      rows: Seq[GenericInternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    NativeCodec.writeBlock(out, spec, rows.toIndexedSeq)
    out.flush()
    bos.toByteArray
  }

  test("golden bytes: block layout matches the hand-computed Native encoding") {
    val schema = StructType(Seq(
      StructField("number", LongType, nullable = false),
      StructField("hash", BinaryType, nullable = false),
      StructField("status", LongType, nullable = true)))
    val spec = NativeCodec.specFor(schema)
    val rows = Seq(
      new GenericInternalRow(Array[Any](1L, Array[Byte](0xde.toByte, 0xad.toByte), 7L)),
      new GenericInternalRow(Array[Any](258L, Array.emptyByteArray, null)))
    val got = encode(spec, rows)
    val expected = Array.concat(
      Array[Byte](3, 2), // 3 columns, 2 rows (varuints)
      // column "number": name, type "UInt64", then 8-byte LE per row
      Array[Byte](6) ++ "number".getBytes("UTF-8"),
      Array[Byte](6) ++ "UInt64".getBytes("UTF-8"),
      Array[Byte](1, 0, 0, 0, 0, 0, 0, 0),
      Array[Byte](2, 1, 0, 0, 0, 0, 0, 0), // 258 = 0x0102 little-endian
      // column "hash": type "String", varuint length + bytes per row
      Array[Byte](4) ++ "hash".getBytes("UTF-8"),
      Array[Byte](6) ++ "String".getBytes("UTF-8"),
      Array[Byte](2, 0xde.toByte, 0xad.toByte),
      Array[Byte](0),
      // column "status": Nullable(UInt64) = null mask first, then data
      // for ALL rows with zero defaults at null positions
      Array[Byte](6) ++ "status".getBytes("UTF-8"),
      Array[Byte](16) ++ "Nullable(UInt64)".getBytes("UTF-8"),
      Array[Byte](0, 1), // row 0 present, row 1 NULL
      Array[Byte](7, 0, 0, 0, 0, 0, 0, 0),
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0))
    assert(got.toSeq == expected.toSeq,
      s"native block bytes diverge:\n got ${got.map("%02x".format(_)).mkString(" ")}\n " +
        s"exp ${expected.map("%02x".format(_)).mkString(" ")}")
  }

  test("golden bytes: UInt256 is little-endian, Bool one byte, Array(String) offsets-then-elements") {
    val schema = StructType(Seq(
      StructField("value", BinaryType, nullable = false),     // u256 canonical 32B BE
      StructField("gasUsed", DecimalType(38, 0), nullable = false),
      StructField("removed", BooleanType, nullable = false),
      StructField("topics", ArrayType(BinaryType, containsNull = false), nullable = false)))
    val spec = NativeCodec.specFor(schema)
    assert(spec.map(_.chType) == Seq("UInt256", "UInt256", "Bool", "Array(String)"))
    val be = new Array[Byte](32); be(30) = 0x01; be(31) = 0x02 // 0x0102 big-endian
    val rows = Seq(
      new GenericInternalRow(Array[Any](
        be, Decimal(new java.math.BigDecimal("258"), 38, 0), true,
        new GenericArrayData(Array[Any](Array[Byte](0x0a), Array[Byte](0x0b, 0x0c))))),
      new GenericInternalRow(Array[Any](
        new Array[Byte](32), Decimal(new java.math.BigDecimal(0), 38, 0), false,
        new GenericArrayData(Array.empty[Any]))))
    val got = encode(spec, rows)
    val u256le = Array[Byte](2, 1) ++ new Array[Byte](30) // 0x0102 -> LE: 02 01 00...
    val expected = Array.concat(
      Array[Byte](4, 2),
      Array[Byte](5) ++ "value".getBytes("UTF-8"),
      Array[Byte](7) ++ "UInt256".getBytes("UTF-8"),
      u256le, new Array[Byte](32),
      Array[Byte](7) ++ "gasUsed".getBytes("UTF-8"),
      Array[Byte](7) ++ "UInt256".getBytes("UTF-8"),
      u256le, new Array[Byte](32),
      Array[Byte](7) ++ "removed".getBytes("UTF-8"),
      Array[Byte](4) ++ "Bool".getBytes("UTF-8"),
      Array[Byte](1, 0),
      Array[Byte](6) ++ "topics".getBytes("UTF-8"),
      Array[Byte](13) ++ "Array(String)".getBytes("UTF-8"),
      // cumulative end offsets as UInt64 LE: 2, 2
      Array[Byte](2, 0, 0, 0, 0, 0, 0, 0),
      Array[Byte](2, 0, 0, 0, 0, 0, 0, 0),
      // flattened elements
      Array[Byte](1, 0x0a),
      Array[Byte](2, 0x0b, 0x0c))
    assert(got.toSeq == expected.toSeq,
      s"native block bytes diverge:\n got ${got.map("%02x".format(_)).mkString(" ")}\n " +
        s"exp ${expected.map("%02x".format(_)).mkString(" ")}")
    // and the codec reads its own bytes back
    val blk = NativeCodec.readBlock(
      new DataInputStream(new ByteArrayInputStream(got))).get
    assert(blk.rows == 2 && blk.cols.map(_.chType) == spec.map(_.chType))
    assert(blk.data(0)(0).asInstanceOf[Array[Byte]].toSeq == be.toSeq) // back to canonical BE
    assert(NativeCodec.toCatalyst(blk.data(1)(0), blk.cols(1), DecimalType(38, 0))
      .asInstanceOf[Decimal].toJavaBigDecimal.longValueExact() == 258L)
  }

  test("varuint: multi-byte lengths roundtrip (ULEB128)") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L, 1234567L, Int.MaxValue.toLong)) {
      val bos = new ByteArrayOutputStream()
      NativeCodec.writeVarUInt(bos, v)
      val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
      assert(NativeCodec.readVarUInt(in) == v)
    }
    // a string long enough to need a 2-byte varuint length
    val big = Array.fill[Byte](300)(0x41)
    val bos = new ByteArrayOutputStream()
    NativeCodec.writeString(new DataOutputStream(bos), big)
    val bytes = bos.toByteArray
    assert(bytes(0) == 0xac.toByte && bytes(1) == 0x02 && bytes.length == 302) // 300 = 0x012c
  }

  test("chnative sink: transactions + events roundtrip losslessly, bucketing + overwrite contract holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chnative").toString
    val b = ChainFixture.blocks(spark, 0L, 49L)
    val r = ChainFixture.receipts(spark, 0L, 49L)
    val tx = Flatten.transactionRows(b, r)
    val ev = Flatten.eventRows(b, r)
    graft.etl.Load.writeBucketed(tx, s"$dir/tx", Schemas.dedupKeys("transactions"),
      sink = ClickHouseNativeSink)
    graft.etl.Load.writeBucketed(ev, s"$dir/ev", Schemas.dedupKeys("events"),
      sink = ClickHouseNativeSink)
    // layout contract: blockRange dirs holding .native data files
    val part = new java.io.File(s"$dir/tx/blockRange=0")
    assert(part.isDirectory && part.listFiles().exists(_.getName.endsWith(".native")))
    // idempotent re-run (dynamic partition overwrite)
    graft.etl.Load.writeBucketed(tx, s"$dir/tx", Schemas.dedupKeys("transactions"),
      sink = ClickHouseNativeSink)
    def cols(df: org.apache.spark.sql.DataFrame, s: StructType) =
      df.select(s.fieldNames.map(col).toIndexedSeq: _*)
    val txBack = cols(ClickHouseNativeSink.read(spark, s"$dir/tx", Schemas.transactions),
      Schemas.transactions)
    val evBack = cols(ClickHouseNativeSink.read(spark, s"$dir/ev", Schemas.events),
      Schemas.events)
    assert(txBack.count() == tx.count())
    assert(txBack.except(tx).count() == 0 && tx.except(txBack).count() == 0,
      "chnative transactions roundtrip must be lossless (u256 binaries, decimals, " +
        "nullable root/status, accessList text)")
    assert(evBack.except(ev).count() == 0 && ev.except(evBack).count() == 0,
      "chnative events roundtrip must be lossless (topics arrays, removed bool)")
  }

  test("chnative sink: multi-block files decode seamlessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chnative_blocks").toString
    val b = ChainFixture.blocks(spark, 0L, 49L)
    val r = ChainFixture.receipts(spark, 0L, 49L)
    val tx = Flatten.transactionRows(b, r) // 150 rows
    tx.coalesce(1).write.option("blockRows", "16").format("chnative").save(s"$dir/t")
    val back = spark.read.schema(Schemas.transactions).format("chnative").load(s"$dir/t")
    assert(back.count() == tx.count())
    assert(back.except(tx).count() == 0 && tx.except(back).count() == 0)
  }

  test("chnative maintenance: compactPartitioned and deleteWhere work through the sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chnative_maint").toString
    val path = s"$dir/transactions"
    val b = ChainFixture.blocks(spark, 0L, 1999L)
    val r = ChainFixture.receipts(spark, 0L, 1999L)
    val tx = Flatten.transactionRows(b, r)
    graft.etl.Load.writeBucketed(tx, path, Schemas.dedupKeys("transactions"),
      sink = ClickHouseNativeSink)
    // fragment range 0 with appended debris, then compact through chnative
    val extra = Flatten.transactionRows(
      ChainFixture.blocks(spark, 0L, 99L), ChainFixture.receipts(spark, 0L, 99L))
      .withColumn("blockRange", lit(0L))
    (1 to 3).foreach { _ =>
      extra.repartition(4).write.mode("append").partitionBy("blockRange")
        .format("chnative").save(path)
    }
    val schemaOpt = Some(Schemas.transactions)
    val original = ClickHouseNativeSink.read(spark, path, Schemas.transactions)
    val originalHashes = original.select(hex(col("hash"))).collect()
      .map(_.getString(0)).sorted.toSeq
    val (before, after) = graft.etl.Load.compactPartitioned(
      spark, path, Schemas.dedupKeys("transactions"), numFiles = 1,
      sink = ClickHouseNativeSink, schema = schemaOpt)
    assert(before > after)
    val compacted = ClickHouseNativeSink.read(spark, path, Schemas.transactions)
      .select(hex(col("hash"))).collect().map(_.getString(0)).sorted.toSeq
    assert(compacted == originalHashes, "compaction through chnative must preserve content")
    // reorg rollback straight through the native layout
    val total = ClickHouseNativeSink.read(spark, path, Schemas.transactions).count()
    val (deleted, rewritten) = graft.etl.Load.deleteWhere(
      spark, path, col("blockNumber") >= 1000L,
      sink = ClickHouseNativeSink, schema = schemaOpt)
    assert(rewritten == 1L && deleted > 0L)
    assert(!new java.io.File(s"$path/blockRange=1").exists(),
      "fully-emptied native partition directory must be deleted")
    val left = ClickHouseNativeSink.read(spark, path, Schemas.transactions)
    assert(left.count() == total - deleted)
    assert(left.agg(max(col("blockNumber"))).head.getLong(0) == 999L)
  }

  test("chnative bare read: schema-less inference falls back to the lossless binary defaults") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chnative_bare").toString
    val b = ChainFixture.blocks(spark, 0L, 9L)
    val r = ChainFixture.receipts(spark, 0L, 9L)
    Flatten.transactionRows(b, r).coalesce(1)
      .write.format("chnative").save(s"$dir/t")
    val bare = spark.read.format("chnative").load(s"$dir/t")
    val f = bare.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(f("hash") == BinaryType)
    assert(f("blockNumber") == LongType)
    assert(f("gasUsed") == BinaryType, "UInt256 infers as lossless 32-byte binary")
    assert(f("accessList") == BinaryType, "CH String carries no text marker; bytes by default")
    assert(bare.count() == (0L to 9L).map(n => (n % 5) + 1).sum)
    // the inferred gasUsed is the canonical 32-byte big-endian u256 form
    val one = bare.select(col("gasUsed")).head.getAs[Array[Byte]](0)
    assert(one.length == 32)
  }

  test("compressed frame: golden bytes (checksum + method + sizes + LZ4 literal)") {
    // raw = "graft" (5 bytes, no repeats): LZ4 must emit a single
    // literal-only sequence (token 0x50 = 5<<4, then the 5 bytes) —
    // the payload is fully determined, so the whole frame is pinnable.
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    graft.sources.ChCompressed.writeFrame(out, "graft".getBytes("UTF-8"))
    out.flush()
    val expected = Array(
      // CityHash128 v1.0.2 of the 15 framed bytes: low64 LE, high64 LE
      // (self-golden: pins the checksummer against accidental change;
      // live-server parity needs a handshake this sandbox cannot open)
      0x00, 0xbf, 0x4f, 0x90, 0xab, 0xa4, 0x9a, 0x5f,
      0x5e, 0x10, 0x2b, 0x08, 0x9d, 0x3a, 0xca, 0x45,
      0x82,                   // method: LZ4
      0x0f, 0x00, 0x00, 0x00, // compressed_size = 15 (incl. 9-byte header)
      0x05, 0x00, 0x00, 0x00, // decompressed_size = 5
      0x50,                   // LZ4 token: 5 literals, no match
      0x67, 0x72, 0x61, 0x66, 0x74 // "graft"
    ).map(_.toByte)
    assert(bos.toByteArray.toSeq == expected.toSeq)
  }

  test("compressed frame: multi-frame roundtrip + one flipped byte is detected") {
    val blocks = Seq(
      "the quick brown fox jumps over the lazy dog " * 40, // compressible
      "x", "", "\u0000\u0001binary-ish \u00ff" * 7)
      .map(_.getBytes("UTF-8"))
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    blocks.foreach(graft.sources.ChCompressed.writeFrame(out, _))
    out.flush()
    val bytes = bos.toByteArray
    // the compressible frame actually compressed
    assert(bytes.length < blocks.map(_.length).sum)
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val back = Iterator.continually(graft.sources.ChCompressed.readFrame(in))
      .takeWhile(_.isDefined).flatten.toSeq
    assert(back.map(new String(_, "UTF-8")) == blocks.map(new String(_, "UTF-8")))
    // corruption anywhere in a frame (header or payload) must be LOUD
    for (i <- Seq(20, bytes.length - 1)) {
      val bad = bytes.clone()
      bad(i) = (bad(i) ^ 0x01).toByte
      val bin = new DataInputStream(new ByteArrayInputStream(bad))
      intercept[Exception] {
        while (graft.sources.ChCompressed.readFrame(bin).isDefined) ()
      }
    }
  }

  test("chnative compression=lz4: real chain tables roundtrip losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chnative_lz4").toString
    val b = ChainFixture.blocks(spark, 0L, 19L)
    val r = ChainFixture.receipts(spark, 0L, 19L)
    val tx = Flatten.transactionRows(b, r)
    tx.coalesce(1).write.format("chnative")
      .option("compression", "lz4").option("blockRows", "64")
      .save(s"$dir/t")
    // files carry the .lz4.native extension (still .native-suffixed so
    // sink-layout maintenance keeps matching them)
    val files = new java.io.File(s"$dir/t").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".lz4.native")), files.mkString(", "))
    val back = spark.read.schema(tx.schema).format("chnative").load(s"$dir/t")
    assert(back.count() == tx.count())
    val cols = tx.columns.map(col).toIndexedSeq
    assert(tx.except(back).isEmpty && back.except(tx).isEmpty
      || tx.select(cols: _*).collect().toSet == back.select(cols: _*).collect().toSet)
    // schema inference reads through the frames too
    assert(spark.read.format("chnative").load(s"$dir/t").columns.sameElements(tx.columns))
  }

  test("chnative lz4 sink: full contract — bucketed write, maintenance preserves compression") {
    import graft.etl.ClickHouseNativeLz4Sink
    val dir = java.nio.file.Files.createTempDirectory("graft_chnative_lz4sink").toString
    val path = s"$dir/transactions"
    val b = ChainFixture.blocks(spark, 0L, 1499L)
    val r = ChainFixture.receipts(spark, 0L, 1499L)
    val tx = Flatten.transactionRows(b, r)
    graft.etl.Load.writeBucketed(tx, path, Schemas.dedupKeys("transactions"),
      sink = ClickHouseNativeLz4Sink)
    def files(rangeDir: String): Seq[String] =
      new java.io.File(s"$path/$rangeDir").listFiles().toSeq.map(_.getName)
        .filter(_.endsWith(".native"))
    assert(files("blockRange=0").nonEmpty && files("blockRange=0").forall(_.endsWith(".lz4.native")),
      "lz4 sink must land compressed frames")
    val schemaOpt = Some(Schemas.transactions)
    val back = ClickHouseNativeLz4Sink.read(spark, path, Schemas.transactions)
    assert(back.count() == tx.count())
    // fragment then compact THROUGH THE LZ4 SINK: the rewrite must keep
    // the compression (writeOptions carried by the maintenance path) —
    // without it a compact would silently land a decompressed copy
    val extra = Flatten.transactionRows(
      ChainFixture.blocks(spark, 0L, 99L), ChainFixture.receipts(spark, 0L, 99L))
      .withColumn("blockRange", lit(0L))
    extra.repartition(4).write.mode("append").partitionBy("blockRange")
      .option("compression", "lz4").format("chnative").save(path)
    val originalHashes = ClickHouseNativeLz4Sink.read(spark, path, Schemas.transactions)
      .select(hex(col("hash"))).collect().map(_.getString(0)).sorted.toSeq
    val (before, after) = graft.etl.Load.compactPartitioned(
      spark, path, Schemas.dedupKeys("transactions"), numFiles = 1,
      sink = ClickHouseNativeLz4Sink, schema = schemaOpt)
    assert(before > after)
    assert(files("blockRange=0").forall(_.endsWith(".lz4.native")),
      "compaction must preserve the compressed encoding")
    val compacted = ClickHouseNativeLz4Sink.read(spark, path, Schemas.transactions)
      .select(hex(col("hash"))).collect().map(_.getString(0)).sorted.toSeq
    assert(compacted == originalHashes)
    // deleteWhere through the lz4 sink: rewritten partition stays compressed
    val total = compacted.size.toLong
    val (deleted, rewritten) = graft.etl.Load.deleteWhere(
      spark, path, col("blockNumber") >= 500L && col("blockNumber") <= 520L,
      sink = ClickHouseNativeLz4Sink, schema = schemaOpt)
    assert(rewritten == 1L && deleted > 0L)
    assert(files("blockRange=0").forall(_.endsWith(".lz4.native")),
      "deleteWhere rewrite must preserve the compressed encoding")
    assert(ClickHouseNativeLz4Sink.read(spark, path, Schemas.transactions).count()
      == total - deleted)
  }

  test("golden bytes: FixedString is raw width bytes with no length prefix; Nullable zero-fills") {
    def meta(n: Int) = new MetadataBuilder().putLong(Schemas.FixedWidthKey, n.toLong).build()
    val schema = StructType(Seq(
      StructField("a", BinaryType, nullable = false, meta(3)),
      StructField("b", BinaryType, nullable = true, meta(2))))
    val spec = NativeCodec.specFor(schema)
    assert(spec.map(_.chType) == Seq("FixedString(3)", "Nullable(FixedString(2))"))
    val rows = Seq(
      new GenericInternalRow(Array[Any](Array[Byte](1, 2, 3), Array[Byte](9, 8))),
      new GenericInternalRow(Array[Any](Array[Byte](4, 5, 6), null)))
    val got = encode(spec, rows)
    val expected = Array.concat(
      Array[Byte](2, 2), // 2 columns, 2 rows
      Array[Byte](1) ++ "a".getBytes("UTF-8"),
      Array[Byte](14) ++ "FixedString(3)".getBytes("UTF-8"),
      Array[Byte](1, 2, 3), // raw 3 bytes, NO varuint length prefix
      Array[Byte](4, 5, 6),
      Array[Byte](1) ++ "b".getBytes("UTF-8"),
      Array[Byte](24) ++ "Nullable(FixedString(2))".getBytes("UTF-8"),
      Array[Byte](0, 1), // null map: row 0 present, row 1 NULL
      Array[Byte](9, 8),
      Array[Byte](0, 0)) // null slot zero-fills its fixed width
    assert(got.toSeq == expected.toSeq,
      s"FixedString block bytes diverge:\n got ${got.map("%02x".format(_)).mkString(" ")}\n " +
        s"exp ${expected.map("%02x".format(_)).mkString(" ")}")
    // decode round-trip: raw widths come back byte-exact, null stays null
    val blk = NativeCodec.readBlock(
      new DataInputStream(new ByteArrayInputStream(got))).get
    assert(blk.cols.map(_.chType) == spec.map(_.chType))
    assert(blk.data(0)(0).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
    assert(blk.data(1)(0).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](9, 8))
    assert(blk.data(1)(1) == null)
  }

  test("FixedString writer fails fast on a width mismatch instead of padding or truncating") {
    def meta(n: Int) = new MetadataBuilder().putLong(Schemas.FixedWidthKey, n.toLong).build()
    val schema = StructType(Seq(
      StructField("h", BinaryType, nullable = false, meta(3))))
    val spec = NativeCodec.specFor(schema)
    val short = Seq(new GenericInternalRow(Array[Any](Array[Byte](1, 2))))
    val e = intercept[IllegalArgumentException](encode(spec, short))
    assert(e.getMessage.contains("FixedString(3)") && e.getMessage.contains("2-byte"))
  }

  test("chain schemas round-trip 32/20/8-byte values byte-exact through FixedString columns") {
    // the canonical blocks schema carries the reference widths
    // (main.rs:66-88) as field metadata — encode a fixture frame under
    // the CANONICAL spec (the flatten casts drop metadata and widen
    // nullability, so the frame's own schema would type these Nullable
    // String; the DDL-parity path always encodes from Schemas.*)
    val blocks = Flatten.blockRows(ChainFixture.blocks(spark, 0L, 4L))
    val spec = NativeCodec.specFor(Schemas.blocks)
    def tpe(n: String) = spec.find(_.name == n).get.chType
    assert(tpe("hash") == "FixedString(32)")
    assert(tpe("miner") == "FixedString(20)")
    assert(tpe("nonce") == "FixedString(8)")
    assert(tpe("withdrawlsRoot") == "Nullable(FixedString(32))")
    assert(tpe("logsBloom") == "String", "non-fixed binary stays variable-length")
    val rows = blocks.queryExecution.toRdd.map(_.copy()).collect().toIndexedSeq
    val bytes = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      NativeCodec.writeBlock(out, spec, rows)
      out.flush(); bos.toByteArray
    }
    val blk = NativeCodec.readBlock(
      new DataInputStream(new ByteArrayInputStream(bytes))).get
    val expected = blocks
      .select(hex(col("hash")), hex(col("miner")), hex(col("nonce"))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    def hx(c: String, r: Int) = {
      val i = blk.cols.indexWhere(_.name == c)
      blk.data(i)(r).asInstanceOf[Array[Byte]].map(x => f"$x%02X").mkString
    }
    val got = (0 until blk.rows)
      .map(r => (hx("hash", r), hx("miner", r), hx("nonce", r))).sortBy(_._1)
    assert(got == expected)
    assert(got.forall { case (h, m, n) => h.length == 64 && m.length == 40 && n.length == 16 })
  }
}
