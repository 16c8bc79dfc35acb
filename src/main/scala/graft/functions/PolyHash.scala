package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen polynomial string hash — the `(acc·base + byte) mod p`
  * fold that underpins rolling hashes, MinHash shingles, and SimHash
  * token signatures.
  *
  * Replaces the interpreted higher-order form
  * `aggregate(transform(split(s,''), c -> ascii(c)), 0, fold)`, which
  * allocates a per-character array and evaluates a lambda per character.
  * For the (verified pure-ASCII) corpus the byte fold below is
  * value-identical: `ascii(char)` = byte value, and `split('','')`'s
  * single empty token contributes `(0·base+0) mod p = 0` exactly like an
  * empty byte loop. The DuckDB oracles keep their own equivalent
  * `list_reduce` form — both engines produce the same integers, just via
  * different (now compiled, on the Spark side) loops.
  */
case class PolyHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // Reject non-string children at analysis time — without this a numeric
  // child only fails deep in generated code as a ClassCastException.
  // (ExpectsInputTypes would be the idiomatic mixin, but its
  // AbstractDataType signature is private[sql] in Spark 4.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a STRING child, got ${child.dataType.catalogString}")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PolyHash.fold(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.fold($c, ${base}L, ${mod}L);")

  override def prettyName: String = "poly_hash"
}

object PolyHash {

  /** The shared fold — called from both interpreted eval and generated
    * code, so there is exactly one definition of the arithmetic. */
  def fold(s: UTF8String, base: Long, mod: Long): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    acc
  }

  /** Column form for DataFrame pipelines. */
  def polyHash(c: Column, base: Long, mod: Long): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), base, mod))
}
