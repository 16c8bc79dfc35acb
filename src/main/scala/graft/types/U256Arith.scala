package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** u256 arithmetic on the canonical 32-byte big-endian binary form
  * (SURVEY §7.4) — for columns whose domain exceeds Decimal(38,0)
  * (value / difficulty class). Semantics match ClickHouse UInt256:
  * addition and SUM wrap modulo 2^256.
  */
object U256Arith {

  /** a + b mod 2^256 over 32-byte big-endian arrays. Allocation-free
    * carry loop; called from generated code. */
  def addBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](U256.WIDTH)
    var carry = 0
    var i = U256.WIDTH - 1
    while (i >= 0) {
      val s = (a(i) & 0xff) + (b(i) & 0xff) + carry
      out(i) = (s & 0xff).toByte
      carry = s >>> 8
      i -= 1
    }
    out // carry out of bit 256 drops: wrap semantics
  }

  case class U256Add(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      addBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.types.U256Arith.addBytes($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): U256Add =
      copy(left = l, right = r)
    override def prettyName: String = "u256_add"
  }

  /** a * b mod 2^256 over 32-byte big-endian arrays — ClickHouse UInt256
    * wrap semantics. Byte-wise schoolbook keeping only the low 32 output
    * bytes; per-cell accumulators stay far below Long range (≤ 32 products
    * of ≤ 255² plus carry), so one final carry sweep normalizes exactly. */
  def mulBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val W = U256.WIDTH
    val acc = new Array[Long](W) // acc(k) = coefficient of 256^k
    var i = 0
    while (i < W) {
      val ai = a(W - 1 - i) & 0xff
      if (ai != 0) {
        var j = 0
        val maxJ = W - i // higher cells would overflow past 2^256: dropped
        while (j < maxJ) {
          acc(i + j) += ai.toLong * (b(W - 1 - j) & 0xff)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](W)
    var carry = 0L
    var k = 0
    while (k < W) {
      val s = acc(k) + carry
      out(W - 1 - k) = (s & 0xff).toByte
      carry = s >>> 8
      k += 1
    }
    out // carry out of bit 256 drops: wrap semantics
  }

  /** a - b mod 2^256 over 32-byte big-endian arrays — wrap semantics
    * (ClickHouse UInt256 subtraction): 0 - 1 = 2^256 - 1. Borrow loop,
    * allocation-free. */
  def subBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](U256.WIDTH)
    var borrow = 0
    var i = U256.WIDTH - 1
    while (i >= 0) {
      val d = (a(i) & 0xff) - (b(i) & 0xff) - borrow
      out(i) = (d & 0xff).toByte
      borrow = if (d < 0) 1 else 0
      i -= 1
    }
    out // borrow out of bit 256 drops: wrap semantics
  }

  /** floor(a / b) over 32-byte big-endian arrays; null on division by
    * zero (SQL semantics — matches Spark's non-ANSI integral divide,
    * diverging from ClickHouse intDiv's throw, documented here). */
  def divBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val divisor = new java.math.BigInteger(1, b)
    if (divisor.signum == 0) null
    else U256.toBytes32(BigInt(new java.math.BigInteger(1, a).divide(divisor)))
  }

  /** a mod b over 32-byte big-endian arrays; null on modulo by zero
    * (same null-on-zero stance as [[divBytes]]). */
  def modBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val divisor = new java.math.BigInteger(1, b)
    if (divisor.signum == 0) null
    else U256.toBytes32(BigInt(new java.math.BigInteger(1, a).mod(divisor)))
  }

  case class U256Mul(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      mulBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.types.U256Arith.mulBytes($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): U256Mul =
      copy(left = l, right = r)
    override def prettyName: String = "u256_mul"
  }

  case class U256Sub(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      subBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.types.U256Arith.subBytes($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): U256Sub =
      copy(left = l, right = r)
    override def prettyName: String = "u256_sub"
  }

  case class U256Mod(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true // modulo by zero -> null
    override def nullSafeEval(a: Any, b: Any): Any =
      modBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
         |${ev.value} = graft.types.U256Arith.modBytes($a, $b);
         |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): U256Mod =
      copy(left = l, right = r)
    override def prettyName: String = "u256_mod"
  }

  case class U256Div(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true // division by zero -> null
    override def nullSafeEval(a: Any, b: Any): Any =
      divBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
         |${ev.value} = graft.types.U256Arith.divBytes($a, $b);
         |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): U256Div =
      copy(left = l, right = r)
    override def prettyName: String = "u256_div"
  }

  /** SUM over u256 binaries, wrapping mod 2^256 — a TypedImperativeAggregate
    * whose buffer is the running 32-byte total (partial sums merge
    * associatively, so map-side combine applies as usual). */
  case class U256Sum(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]]
      with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](U256.WIDTH)
    override def update(buf: Array[Byte], input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v == null) buf else addBytes(buf, v.asInstanceOf[Array[Byte]])
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = addBytes(b1, b2)
    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(offset: Int): U256Sum =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): U256Sum =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(c: Expression): U256Sum = copy(child = c)
    override def prettyName: String = "u256_sum"
  }

  // ---- Column API ----
  def u256Add(a: Column, b: Column): Column =
    ColumnBridge.column(U256Add(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def u256Mul(a: Column, b: Column): Column =
    ColumnBridge.column(U256Mul(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def u256Div(a: Column, b: Column): Column =
    ColumnBridge.column(U256Div(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def u256Sub(a: Column, b: Column): Column =
    ColumnBridge.column(U256Sub(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def u256Mod(a: Column, b: Column): Column =
    ColumnBridge.column(U256Mod(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def u256Sum(c: Column): Column =
    ColumnBridge.column(U256Sum(ColumnBridge.expression(c)).toAggregateExpression())
}
