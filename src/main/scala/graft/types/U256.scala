package graft.types

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** UInt256 codec (SURVEY §7.4).
  *
  * The reference stores 256-bit unsigned integers as ClickHouse `UInt256`
  * (reference: src/main.rs:71-86,104-118). Spark's widest exact numeric is
  * Decimal(38,0) (~1e38) < 2^256-1 (~1.2e77), so the canonical Spark
  * representation is a **32-byte big-endian BinaryType** — lossless, and
  * bytewise (unsigned) comparison order equals numeric order, which keeps
  * range predicates and sort keys meaningful on the binary form.
  *
  * Conversions are native Catalyst expressions with codegen (not UDFs) so
  * they inline into whole-stage codegen.
  */
object U256 {

  val WIDTH = 32

  /** Pad/normalize a non-negative BigInt to exactly 32 bytes big-endian. */
  def toBytes32(v: BigInt): Array[Byte] = {
    require(v.signum >= 0, s"u256 must be non-negative, got $v")
    val raw = v.toByteArray // may carry a leading 0x00 sign byte or be short
    val out = new Array[Byte](WIDTH)
    val src = if (raw.length > WIDTH) raw.length - WIDTH else 0
    val n = raw.length - src
    require(raw.take(src).forall(_ == 0), s"value does not fit in 256 bits")
    System.arraycopy(raw, src, out, WIDTH - n, n)
    out
  }

  def fromBytes32(b: Array[Byte]): BigInt = BigInt(new BigInteger(1, b))

  def decimalToBytes32(d: java.math.BigDecimal): Array[Byte] =
    toBytes32(BigInt(d.toBigIntegerExact))

  // ---- Catalyst expressions ----

  /** binary(32, big-endian) -> Decimal(38,0); null when the value exceeds
    * Decimal(38,0) range (documented divergence: caller opts into the
    * narrow projection, SURVEY §1.2). */
  case class U256ToDecimal(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DecimalType(38, 0)
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      U256.binToDecimal(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      nullSafeCodeGen(ctx, ev, c => {
        s"""
         |${ev.value} = graft.types.U256.binToDecimal($c);
         |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): U256ToDecimal = copy(c)
    override def prettyName: String = "u256_to_decimal"
  }

  /** Decimal(38,0) -> binary(32, big-endian). */
  case class DecimalToU256(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any =
      U256.decimalToBin(input.asInstanceOf[org.apache.spark.sql.types.Decimal])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.types.U256.decimalToBin($c);")
    override protected def withNewChildInternal(c: Expression): DecimalToU256 = copy(c)
    override def prettyName: String = "decimal_to_u256"
  }

  // Called from generated code — must be public static-like (object methods).
  def binToDecimal(b: Array[Byte]): Decimal = {
    val bi = new BigInteger(1, b)
    if (bi.bitLength > 126 && bi.toString.length > 38) null
    else Decimal(new java.math.BigDecimal(bi), 38, 0)
  }

  def decimalToBin(d: Decimal): Array[Byte] =
    toBytes32(BigInt(d.toJavaBigDecimal.toBigIntegerExact))

  // ---- Column API ----
  def toDecimal(c: Column): Column =
    ColumnBridge.column(U256ToDecimal(ColumnBridge.expression(c)))
  def fromDecimal(c: Column): Column =
    ColumnBridge.column(DecimalToU256(ColumnBridge.expression(c)))
}
