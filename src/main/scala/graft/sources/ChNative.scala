package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse Native block format — the reference's actual landing
  * encoding (`insert_native_block`, reference: src/main.rs:294-309): the
  * columnar wire/file format ClickHouse itself uses between client and
  * server and for `FORMAT Native` files. This is the revision-0 layout
  * (what `NativeOutputFormat` writes to files): a file is a sequence of
  * blocks, each block =
  *
  *   varuint n_columns, varuint n_rows,
  *   then per column: name (varuint len + utf8), type (varuint len +
  *   utf8), column data
  *
  * with per-type data layouts (all little-endian, varuint = ULEB128):
  *
  *   String          per row: varuint byte-length + bytes
  *   UInt64          8 bytes LE per row
  *   UInt256         32 bytes LE per row
  *   Bool            1 byte per row (UInt8 layout)
  *   Array(String)   n_rows cumulative end-offsets as UInt64 LE, then
  *                   the flattened element column
  *   Nullable(T)     null mask (1 byte per row, 1 = NULL), then T data
  *                   for ALL rows with defaults at null positions
  *
  * Spark ↔ ClickHouse type mapping mirrors the reference's klickhouse
  * row derives (reference: src/schema.rs — `Bytes` → String, `u64` →
  * UInt64, `u256` → UInt256, `bool` → Bool, `Vec<Bytes>` →
  * Array(String), `Option<T>` → Nullable(T)) composed with this build's
  * Spark schemas (graft.types.Schemas): Decimal(38,0) columns are the
  * DDL's empirically-narrow UInt256s, and the five canonical 32-byte
  * big-endian binary columns ([[NativeCodec.U256BinaryCols]]) are the
  * full-range UInt256s (encoded by byte reversal — ClickHouse stores
  * wide integers little-endian).
  *
  * ClickHouse `String` carries no text/bytes distinction (the reference
  * lands hashes as String via klickhouse `Bytes`), so the mapping back
  * to Spark is not injective: reads are schema-driven (the sink is
  * declared non-self-describing and maintenance passes the table
  * schema), with [[NativeCodec.inferredField]] as the lossless default
  * (String → binary, UInt256 → canonical 32-byte big-endian binary) for
  * bare reads.
  */
object NativeCodec {

  /** Binary columns that are full-range u256 in the reference DDL
    * (reference: src/schema.rs — value/nonce-class `u256` fields kept as
    * lossless 32-byte big-endian binary in graft.types.Schemas rather
    * than Decimal(38,0)). Globally unambiguous across the four tables. */
  val U256BinaryCols: Set[String] = Set("value", "difficulty", "totalDifficulty", "r", "s")

  /** Rows per encoded block. The reference flushes 1000-block batches;
    * ClickHouse's own default insert block is 65409 rows — anything in
    * this range keeps a block comfortably in memory. */
  val DefaultBlockRows = 8192

  sealed trait Kind
  case object KBytes extends Kind    // CH String      <-> BinaryType
  case object KText extends Kind     // CH String      <-> StringType
  case object KU64 extends Kind      // CH UInt64      <-> LongType
  case object KU256Dec extends Kind  // CH UInt256     <-> DecimalType(38,0)
  case object KU256Bin extends Kind  // CH UInt256     <-> BinaryType 32B big-endian
  case object KBool extends Kind     // CH Bool        <-> BooleanType
  case object KArrBytes extends Kind // CH Array(String) <-> ArrayType(BinaryType)
  // FixedString(n): raw n bytes per row on the wire, NO length prefix —
  // the reference DDL's hash/address types (main.rs:66-160). The writer
  // REQUIRES every value to be exactly n bytes (fail fast beats silent
  // pad/truncate on a 32-byte hash).
  case class KFixed(n: Int) extends Kind    // CH FixedString(n)        <-> BinaryType (exact n)
  case class KArrFixed(n: Int) extends Kind // CH Array(FixedString(n)) <-> ArrayType(BinaryType)

  private def isArrayKind(k: Kind): Boolean = k match {
    case KArrBytes | KArrFixed(_) => true
    case _ => false
  }

  case class ChCol(name: String, kind: Kind, nullable: Boolean) {
    def chType: String = {
      val base = kind match {
        case KBytes | KText => "String"
        case KU64 => "UInt64"
        case KU256Dec | KU256Bin => "UInt256"
        case KBool => "Bool"
        case KArrBytes => "Array(String)"
        case KFixed(n) => s"FixedString($n)"
        case KArrFixed(n) => s"Array(FixedString($n))"
      }
      if (nullable && !isArrayKind(kind)) s"Nullable($base)" else base
    }
  }

  /** Field-metadata width marker (graft.types.Schemas.FixedWidthKey):
    * binary columns carrying it map to FixedString(n) instead of the
    * variable-length String wire type. */
  private def fixedWidthOf(f: StructField): Option[Int] =
    if (f.metadata.contains(graft.types.Schemas.FixedWidthKey))
      Some(f.metadata.getLong(graft.types.Schemas.FixedWidthKey).toInt)
    else None

  def specFor(schema: StructType): IndexedSeq[ChCol] =
    schema.fields.toIndexedSeq.map { f =>
      val kind = f.dataType match {
        case BinaryType if U256BinaryCols(f.name) => KU256Bin
        case BinaryType => fixedWidthOf(f).map(KFixed.apply).getOrElse(KBytes)
        case StringType => KText
        case LongType => KU64
        case d: DecimalType if d.precision == 38 && d.scale == 0 => KU256Dec
        case BooleanType => KBool
        case ArrayType(BinaryType, _) =>
          fixedWidthOf(f).map(KArrFixed.apply).getOrElse(KArrBytes)
        case other => throw new IllegalArgumentException(
          s"chnative: unsupported Spark type ${other.catalogString} for column ${f.name}")
      }
      ChCol(f.name, kind, f.nullable)
    }

  /** CH type string -> (kind for parsing, nullable). */
  def parseChType(name: String, t: String): ChCol = {
    val (inner, nullable) =
      if (t.startsWith("Nullable(") && t.endsWith(")")) (t.substring(9, t.length - 1), true)
      else (t, false)
    val kind = inner match {
      case "String" => KBytes // lossless bytes default; reads are schema-driven
      case "UInt64" => KU64
      case "UInt256" => if (U256BinaryCols(name)) KU256Bin else KU256Dec
      case "Bool" | "UInt8" => KBool
      case "Array(String)" => KArrBytes
      case FixedStringRe(n) => KFixed(n.toInt)
      case ArrFixedStringRe(n) => KArrFixed(n.toInt)
      case other => throw new IllegalArgumentException(s"chnative: unsupported ClickHouse type $other")
    }
    ChCol(name, kind, nullable)
  }

  private val FixedStringRe = """FixedString\((\d+)\)""".r
  private val ArrFixedStringRe = """Array\(FixedString\((\d+)\)\)""".r

  /** Lossless default Spark field for a bare (schema-less) read: String
    * and UInt256 both land as binary (UInt256 as the canonical 32-byte
    * big-endian form the rest of this build uses). */
  def inferredField(name: String, chType: String): StructField = {
    val (inner, nullable) =
      if (chType.startsWith("Nullable(") && chType.endsWith(")"))
        (chType.substring(9, chType.length - 1), true)
      else (chType, false)
    val dt: DataType = inner match {
      case "String" | "UInt256" => BinaryType
      case "UInt64" => LongType
      case "Bool" | "UInt8" => BooleanType
      case "Array(String)" => ArrayType(BinaryType, containsNull = false)
      case FixedStringRe(_) => BinaryType
      case ArrFixedStringRe(_) => ArrayType(BinaryType, containsNull = false)
      case other => throw new IllegalArgumentException(s"chnative: unsupported ClickHouse type $other")
    }
    StructField(name, dt, nullable)
  }

  // ---- varuint (ULEB128), LE scalars ----

  def writeVarUInt(out: OutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7fL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  def readVarUInt(in: DataInputStream): Long = {
    var v = 0L
    var shift = 0
    var b = 0
    do {
      b = in.read()
      if (b < 0) throw new EOFException("chnative: EOF inside varuint")
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  def writeLongLE(out: DataOutputStream, v: Long): Unit =
    out.writeLong(java.lang.Long.reverseBytes(v))

  def readLongLE(in: DataInputStream): Long =
    java.lang.Long.reverseBytes(in.readLong())

  def writeString(out: DataOutputStream, bytes: Array[Byte]): Unit = {
    writeVarUInt(out, bytes.length.toLong)
    out.write(bytes)
  }

  def readBytes(in: DataInputStream, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    in.readFully(a)
    a
  }

  def readString(in: DataInputStream): Array[Byte] =
    readBytes(in, readVarUInt(in).toInt)

  /** Canonical 32-byte big-endian -> 32-byte little-endian (and back:
    * the transform is an involution). Shorter big-endian input is
    * left-padded, i.e. high little-endian bytes stay zero. Longer input
    * may only carry leading ZERO bytes (BigInteger's sign byte for
    * values with the top bit set); any nonzero overflow byte means the
    * value doesn't fit in 256 bits and must fail, not truncate. */
  def beToLe32(be: Array[Byte]): Array[Byte] = {
    var off = 0
    while (be.length - off > 32) {
      require(be(off) == 0,
        s"chnative: value is wider than 32 bytes (${be.length} bytes, leading 0x${(be(off) & 0xff).toHexString})")
      off += 1
    }
    val n = be.length - off
    val le = new Array[Byte](32)
    var i = 0
    while (i < n) {
      le(i) = be(be.length - 1 - i)
      i += 1
    }
    le
  }

  def u256FromDecimal(d: org.apache.spark.sql.types.Decimal): Array[Byte] = {
    val bi = d.toJavaBigDecimal.unscaledValue()
    require(bi.signum() >= 0, s"chnative: UInt256 cannot encode negative value $bi")
    beToLe32(bi.toByteArray)
  }

  def decimalFromU256(le: Array[Byte]): org.apache.spark.sql.types.Decimal = {
    val bi = new java.math.BigInteger(1, beToLe32(le)) // LE -> BE, nonneg
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(bi), 38, 0)
  }

  private val EmptyBytes = Array.emptyByteArray
  private val ZeroU256 = new Array[Byte](32)

  // ---- block encode (from InternalRows laid out per `spec`) ----

  def writeBlock(out: DataOutputStream, spec: IndexedSeq[ChCol], rows: IndexedSeq[InternalRow]): Unit = {
    writeVarUInt(out, spec.length.toLong)
    writeVarUInt(out, rows.length.toLong)
    var c = 0
    while (c < spec.length) {
      val col = spec(c)
      writeString(out, col.name.getBytes("UTF-8"))
      writeString(out, col.chType.getBytes("UTF-8"))
      if (col.nullable && !isArrayKind(col.kind)) {
        var r = 0
        while (r < rows.length) {
          out.writeByte(if (rows(r).isNullAt(c)) 1 else 0)
          r += 1
        }
      }
      col.kind match {
        case KBytes =>
          var r = 0
          while (r < rows.length) {
            writeString(out, if (rows(r).isNullAt(c)) EmptyBytes else rows(r).getBinary(c))
            r += 1
          }
        case KText =>
          var r = 0
          while (r < rows.length) {
            writeString(out,
              if (rows(r).isNullAt(c)) EmptyBytes else rows(r).getUTF8String(c).getBytes)
            r += 1
          }
        case KU64 =>
          var r = 0
          while (r < rows.length) {
            writeLongLE(out, if (rows(r).isNullAt(c)) 0L else rows(r).getLong(c))
            r += 1
          }
        case KU256Dec =>
          var r = 0
          while (r < rows.length) {
            out.write(
              if (rows(r).isNullAt(c)) ZeroU256
              else u256FromDecimal(rows(r).getDecimal(c, 38, 0)))
            r += 1
          }
        case KU256Bin =>
          var r = 0
          while (r < rows.length) {
            out.write(if (rows(r).isNullAt(c)) ZeroU256 else beToLe32(rows(r).getBinary(c)))
            r += 1
          }
        case KBool =>
          var r = 0
          while (r < rows.length) {
            out.writeByte(if (!rows(r).isNullAt(c) && rows(r).getBoolean(c)) 1 else 0)
            r += 1
          }
        case KFixed(n) =>
          var r = 0
          while (r < rows.length) {
            if (rows(r).isNullAt(c)) out.write(new Array[Byte](n))
            else {
              val b = rows(r).getBinary(c)
              require(b.length == n,
                s"chnative: FixedString($n) column ${col.name} got ${b.length}-byte value")
              out.write(b)
            }
            r += 1
          }
        case KArrBytes =>
          // offsets pass: cumulative element-count end offsets, UInt64 LE
          var total = 0L
          var r = 0
          while (r < rows.length) {
            total += (if (rows(r).isNullAt(c)) 0 else rows(r).getArray(c).numElements())
            writeLongLE(out, total)
            r += 1
          }
          // flattened element column
          r = 0
          while (r < rows.length) {
            if (!rows(r).isNullAt(c)) {
              val arr = rows(r).getArray(c)
              var i = 0
              while (i < arr.numElements()) {
                // null elements encode as empty bytes, like null scalars —
                // getBinary on a null slot would NPE inside writeString
                writeString(out, if (arr.isNullAt(i)) EmptyBytes else arr.getBinary(i))
                i += 1
              }
            }
            r += 1
          }
        case KArrFixed(n) =>
          var total = 0L
          var r = 0
          while (r < rows.length) {
            total += (if (rows(r).isNullAt(c)) 0 else rows(r).getArray(c).numElements())
            writeLongLE(out, total)
            r += 1
          }
          r = 0
          while (r < rows.length) {
            if (!rows(r).isNullAt(c)) {
              val arr = rows(r).getArray(c)
              var i = 0
              while (i < arr.numElements()) {
                if (arr.isNullAt(i)) out.write(new Array[Byte](n))
                else {
                  val b = arr.getBinary(i)
                  require(b.length == n,
                    s"chnative: Array(FixedString($n)) column ${col.name} got ${b.length}-byte element")
                  out.write(b)
                }
                i += 1
              }
            }
            r += 1
          }
      }
      c += 1
    }
  }

  // ---- block decode ----

  /** One decoded block: file-declared columns with boxed values. */
  case class Block(cols: IndexedSeq[ChCol], rows: Int, data: IndexedSeq[Array[AnyRef]])

  /** Reads the next block, or None at clean EOF. Values are boxed in the
    * LOSSLESS default representation (bytes for String, 32-byte
    * big-endian for UInt256, java.lang.Long/Boolean for scalars,
    * Array[Array[Byte]] for arrays); nulls are null. */
  def readBlock(in: DataInputStream): Option[Block] = {
    val first = in.read()
    if (first < 0) return None
    // un-consume the first varuint byte by folding it into the read
    var nColsV = (first & 0x7fL)
    var shift = 7
    var b = first
    while ((b & 0x80) != 0) {
      b = in.read()
      if (b < 0) throw new EOFException("chnative: EOF inside block header")
      nColsV |= (b & 0x7fL) << shift
      shift += 7
    }
    val nCols = nColsV.toInt
    val nRows = readVarUInt(in).toInt
    val cols = ArrayBuffer.empty[ChCol]
    val data = ArrayBuffer.empty[Array[AnyRef]]
    var c = 0
    while (c < nCols) {
      val name = new String(readString(in), "UTF-8")
      val tpe = new String(readString(in), "UTF-8")
      val col = parseChType(name, tpe)
      val nulls: Array[Boolean] =
        if (col.nullable && !isArrayKind(col.kind)) Array.fill(nRows)(in.readByte() == 1)
        else null
      val out = new Array[AnyRef](nRows)
      col.kind match {
        case KBytes | KText =>
          var r = 0
          while (r < nRows) { out(r) = readString(in); r += 1 }
        case KFixed(n) =>
          var r = 0
          while (r < nRows) { out(r) = readBytes(in, n); r += 1 }
        case KU64 =>
          var r = 0
          while (r < nRows) { out(r) = java.lang.Long.valueOf(readLongLE(in)); r += 1 }
        case KU256Dec | KU256Bin =>
          var r = 0
          while (r < nRows) { out(r) = beToLe32(readBytes(in, 32)); r += 1 } // -> canonical BE
        case KBool =>
          var r = 0
          while (r < nRows) { out(r) = java.lang.Boolean.valueOf(in.readByte() != 0); r += 1 }
        case KArrBytes | KArrFixed(_) =>
          val offsets = new Array[Long](nRows)
          var r = 0
          while (r < nRows) { offsets(r) = readLongLE(in); r += 1 }
          val totalElems = if (nRows == 0) 0 else offsets(nRows - 1).toInt
          val elems = new Array[Array[Byte]](totalElems)
          val readElem: () => Array[Byte] = col.kind match {
            case KArrFixed(n) => () => readBytes(in, n)
            case _ => () => readString(in)
          }
          var i = 0
          while (i < totalElems) { elems(i) = readElem(); i += 1 }
          r = 0
          var prev = 0L
          while (r < nRows) {
            out(r) = elems.slice(prev.toInt, offsets(r).toInt)
            prev = offsets(r)
            r += 1
          }
      }
      if (nulls != null) {
        var r = 0
        while (r < nRows) { if (nulls(r)) out(r) = null; r += 1 }
      }
      cols += col
      data += out
      c += 1
    }
    Some(Block(cols.toIndexedSeq, nRows, data.toIndexedSeq))
  }

  /** Convert one boxed column value (lossless default representation)
    * to the Catalyst value the required Spark type expects. */
  def toCatalyst(v: AnyRef, col: ChCol, required: DataType): Any = (v, required) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => b
    case (b: Array[Byte], StringType) => UTF8String.fromBytes(b)
    case (b: Array[Byte], d: DecimalType) if d.precision == 38 && d.scale == 0 =>
      decimalFromU256(beToLe32(b)) // boxed form is canonical BE; helper expects LE
    case (l: java.lang.Long, LongType) => l.longValue()
    case (bl: java.lang.Boolean, BooleanType) => bl.booleanValue()
    case (a: Array[Array[Byte]], ArrayType(BinaryType, _)) =>
      new GenericArrayData(a.asInstanceOf[Array[Any]])
    case (other, t) => throw new IllegalArgumentException(
      s"chnative: cannot read column ${col.name} (${col.chType}) as ${t.catalogString} " +
        s"(decoded ${other.getClass.getSimpleName})")
  }
}

/** Spark V1 FileFormat for ClickHouse Native files — plugs `chnative`
  * into the standard datasource machinery, so partition discovery
  * (`blockRange=N` dirs), `partitionBy` writes, and dynamic partition
  * overwrite all work exactly as they do for parquet/orc/json. Files
  * are never split (blocks are the unit of parallelism across files —
  * the bucketed ingest layout produces one file per range partition per
  * task, which is the parallel grain at scale). */
class NativeFileFormat extends FileFormat with DataSourceRegister with Serializable {

  import NativeCodec._

  override def shortName(): String = "chnative"
  override def toString: String = "ClickHouseNative"
  override def hashCode(): Int = getClass.hashCode()
  override def equals(other: Any): Boolean = other.isInstanceOf[NativeFileFormat]

  override def isSplitable(spark: SparkSession, options: Map[String, String], path: Path): Boolean =
    false

  override def supportDataType(dataType: DataType): Boolean = dataType match {
    case BinaryType | StringType | LongType | BooleanType => true
    case d: DecimalType => d.precision == 38 && d.scale == 0
    case ArrayType(BinaryType, _) => true
    case _ => false
  }

  override def inferSchema(
      spark: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = {
    val conf = spark.sessionState.newHadoopConf()
    files.iterator.filter(_.getLen > 0).flatMap { f =>
      val base = new DataInputStream(
        new BufferedInputStream(f.getPath.getFileSystem(conf).open(f.getPath)))
      val in =
        if (f.getPath.getName.endsWith(".lz4.native"))
          new DataInputStream(new ChCompressed.FrameInputStream(base))
        else base
      try {
        readBlock(in).map { blk =>
          StructType(blk.cols.map(c => inferredField(c.name, c.chType)))
        }
      } finally in.close()
    }.nextOption()
  }

  override def prepareWrite(
      spark: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val blockRows = options.get("blockRows").map(_.toInt).getOrElse(DefaultBlockRows)
    // compression=lz4 wraps each block in the ClickHouse compressed
    // frame (checksum + method + sizes + LZ4) — the client protocol's
    // on-wire encoding (reference: the TCP INSERT of main.rs:294-309).
    // The extension KEEPS the .native suffix so sink-layout maintenance
    // (dataFiles/requireSinkLayout match on ".native") stays correct.
    val compressed = options.get("compression") match {
      case None | Some("none") => false
      case Some("lz4") => true
      case Some(other) =>
        throw new IllegalArgumentException(
          s"chnative: unsupported compression '$other' (lz4 or none)")
    }
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String =
        if (compressed) ".lz4.native" else ".native"
      override def newInstance(
          path: String,
          schema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new NativeOutputWriter(path, schema, context, blockRows, compressed)
    }
  }

  override def buildReader(
      spark: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val confBroadcast = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))
    val required = requiredSchema // serialize into the closure
    (file: PartitionedFile) => {
      val path = file.toPath
      val base = new DataInputStream(new BufferedInputStream(
        path.getFileSystem(confBroadcast.value.value).open(path)))
      val in =
        if (path.getName.endsWith(".lz4.native"))
          new DataInputStream(new ChCompressed.FrameInputStream(base))
        else base
      val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def closeOnce(): Unit = if (closed.compareAndSet(false, true)) in.close()
      org.apache.spark.TaskContext.get() match {
        case null => ()
        case tc => tc.addTaskCompletionListener[Unit](_ => closeOnce()); ()
      }
      new Iterator[InternalRow] {
        private var block: Block = null
        private var idx = Array.empty[Int] // required col -> file col
        private var row = 0
        private var done = false

        private def advance(): Unit = {
          while (!done && (block == null || row >= block.rows)) {
            readBlock(in) match {
              case Some(b) =>
                idx = required.fields.map { f =>
                  val i = b.cols.indexWhere(_.name == f.name)
                  require(i >= 0,
                    s"chnative: required column ${f.name} not present in $path " +
                      s"(file has ${b.cols.map(_.name).mkString(", ")})")
                  i
                }
                block = b
                row = 0
              case None =>
                done = true
                closeOnce()
            }
          }
        }

        override def hasNext: Boolean = { advance(); !done }

        override def next(): InternalRow = {
          advance()
          if (done) throw new NoSuchElementException
          val vals = new Array[Any](required.length)
          var j = 0
          while (j < required.length) {
            val fi = idx(j)
            vals(j) = toCatalyst(block.data(fi)(row), block.cols(fi), required.fields(j).dataType)
            j += 1
          }
          row += 1
          new GenericInternalRow(vals)
        }
      }
    }
  }
}

/** Buffers up to `blockRows` rows and flushes each batch as one Native
  * block; partition-directory naming, task commit, and rename-to-final
  * are Spark's standard FileFormatWriter machinery. */
private class NativeOutputWriter(
    val path: String,
    schema: StructType,
    context: TaskAttemptContext,
    blockRows: Int,
    compressed: Boolean = false) extends OutputWriter {

  import NativeCodec._

  private val spec = specFor(schema)
  private val out = new DataOutputStream(new BufferedOutputStream(
    new Path(path).getFileSystem(context.getConfiguration).create(new Path(path), true)))
  private val buf = new ArrayBuffer[InternalRow](blockRows)

  override def write(row: InternalRow): Unit = {
    buf += row.copy()
    if (buf.length >= blockRows) flush()
  }

  private def flush(): Unit = if (buf.nonEmpty) {
    if (compressed) {
      // one frame per block — the server's flush-per-block shape
      val bos = new java.io.ByteArrayOutputStream()
      val bout = new DataOutputStream(bos)
      writeBlock(bout, spec, buf.toIndexedSeq)
      bout.flush()
      ChCompressed.writeFrame(out, bos.toByteArray)
    } else writeBlock(out, spec, buf.toIndexedSeq)
    buf.clear()
  }

  override def close(): Unit = {
    flush()
    out.close()
  }
}
