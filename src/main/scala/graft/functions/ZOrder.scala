package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key: interleaves the low 16 bits of two LONG columns
  * into one 32-bit space-filling-curve rank, x on even bit positions and
  * y on odd. Sorting / range-partitioning a table by this key clusters
  * BOTH dimensions locally, so per-file parquet min/max footers become
  * tight boxes in (x, y) space and a conjunctive range filter on the two
  * columns prunes most files — the standard multi-dimensional data-layout
  * move (Z-ORDER in lakehouse table formats; Morton 1966) that a plain
  * single-column sort cannot provide: sorting by x alone leaves y's
  * per-file min/max spanning the whole domain, so `x BETWEEN … AND y
  * BETWEEN …` still touches every file on the y side.
  *
  * 100 TB shape: the key is a pure per-row projection (codegen, no
  * shuffle of its own); the layout write is one `repartitionByRange` on
  * the key (range exchange + local sort — exactly the cost of any sorted
  * write). Columns wider than 16 bits are first rank-compressed or
  * right-shifted into the 16-bit budget by the caller (for file-skipping
  * purposes only relative order matters, not exact values); widening the
  * interleave to 21+21+21 bits for 3 columns is mechanical (same spread
  * trick with different masks).
  */
case class BitInterleave16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitInterleave16 =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrder.interleave($x, $y);")

  override def prettyName: String = "zorder_key"
}

/** 3-dimensional Morton key: interleaves the low 21 bits of THREE LONG
  * columns into one 63-bit curve rank (x on positions 0,3,6,…, y on
  * 1,4,7,…, z on 2,5,8,…) — the mechanical widening of
  * [[BitInterleave16]] for three-column clustering (e.g. key × key ×
  * day). Same mask-doubling spread, 3-bit stride. */
case class BitInterleave21x3(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key3 requires (BIGINT, BIGINT, BIGINT), got " +
        children.map(_.dataType.catalogString).mkString("(", ", ", ")"))

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BitInterleave21x3 =
    copy(first = f, second = s, third = t)

  override def nullSafeEval(x: Any, y: Any, z: Any): Any =
    ZOrder.interleave3(x.asInstanceOf[Long], y.asInstanceOf[Long],
      z.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, z) =>
      s"${ev.value} = graft.functions.ZOrder.interleave3($x, $y, $z);")

  override def prettyName: String = "zorder_key3"
}

object ZOrder {

  /** Shared by interpreted eval and generated code — one definition of
    * the arithmetic. Low 16 bits of x on even positions, y on odd. */
  def interleave(x: Long, y: Long): Long =
    spread16(x & 0xffffL) | (spread16(y & 0xffffL) << 1)

  /** 3-D Morton: low 21 bits of each input, 3-bit stride. */
  def interleave3(x: Long, y: Long, z: Long): Long =
    spread21(x) | (spread21(y) << 1) | (spread21(z) << 2)

  /** Spreads the low 21 bits of v to positions 0,3,…,60 — the standard
    * 3-D Morton mask-doubling spread. */
  def spread21(v: Long): Long = {
    var x = v & 0x1fffffL
    x = (x | (x << 32)) & 0x1f00000000ffffL
    x = (x | (x << 16)) & 0x1f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** Spreads the low 16 bits of v to even bit positions 0,2,…,30 —
    * the standard mask-doubling Morton spread. */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Column form for DataFrame pipelines. */
  def zorderKey(x: Column, y: Column): Column =
    ColumnBridge.column(
      BitInterleave16(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Column form of the 3-D key. */
  def zorderKey3(x: Column, y: Column, z: Column): Column =
    ColumnBridge.column(BitInterleave21x3(ColumnBridge.expression(x),
      ColumnBridge.expression(y), ColumnBridge.expression(z)))
}
