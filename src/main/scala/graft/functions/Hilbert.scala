package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve key: maps the low 16 bits of two LONG columns to the
  * point's distance along the order-16 Hilbert space-filling curve
  * (d ∈ [0, 2^32)). Same layout role as [[BitInterleave16]] (Morton),
  * strictly better locality: consecutive curve positions are always
  * grid NEIGHBORS (no Morton "diagonal jumps" across the plane), so
  * equal-width key ranges cover more compact boxes — measured on
  * lineitem: average 64-bucket box widths 0.120/0.028 of the two
  * domains vs Morton's 0.163/0.049 (SCALE.md). The trade is a ~16-step
  * state loop per row instead of Morton's 10 mask ops — still a pure
  * codegen projection, no shuffle of its own. Rule of thumb: Morton
  * when write throughput dominates, Hilbert when the table is scanned
  * far more often than written (the usual big-warehouse regime).
  *
  * Algorithm: the standard xy2d bit-descent (Hilbert 1891; iterative
  * form as in Wikipedia "Hilbert curve"): at each scale s the quadrant
  * (rx, ry) contributes s²·((3·rx) XOR ry) to the distance and the
  * frame is reflected/transposed so the sub-square traversal matches
  * the parent's orientation.
  */
case class HilbertKey16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_key requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey16 =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.Hilbert.xy2d($x, $y);")

  override def prettyName: String = "hilbert_key"
}

object Hilbert {

  /** Grid side: the curve covers the 65536 × 65536 square. */
  val N = 1L << 16

  /** (x, y) → Hilbert distance, low 16 bits of each input. Shared by
    * interpreted eval and generated code — one definition. */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & (N - 1)
    var y = yIn & (N - 1)
    var d = 0L
    var s = N >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the frame so the child square is traversed in the
      // parent's orientation (reflect about the FULL grid, then swap)
      if (ry == 0) {
        if (rx == 1) {
          x = N - 1 - x
          y = N - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (distance → grid point) — used by the property specs
    * to prove the roundtrip and the neighbor-adjacency invariant. */
  def d2xy(dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column form for DataFrame pipelines. */
  def hilbertKey(x: Column, y: Column): Column =
    ColumnBridge.column(
      HilbertKey16(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
