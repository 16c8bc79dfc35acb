package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003) as ONE codegen expression: `string -> array<struct<pos:int,
  * fp:long>>` of the selected k-gram fingerprints.
  *
  * Selection rule (standard "rightmost-min" winnowing): slide a window
  * of `w` consecutive k-gram hashes over the document; every full
  * window records its minimum hash, ties broken by the RIGHTMOST
  * position; consecutive windows recording the same position emit one
  * fingerprint. Guarantees: any shared substring of length ≥ k+w-1
  * between two documents yields at least one shared fingerprint, and
  * selected density is ~2/(w+1) — the corpus-linear knob that makes
  * cross-doc span detection feasible at 100 TB (the exploded artifact
  * is the winnowed set, ~n/(w+1)·2 rows, never the full k-gram grid).
  *
  * The k-gram hash is the exact [[PolyHash.fold]] arithmetic over the
  * gram's bytes — `(acc·base + byte) mod p` — so the DuckDB oracle can
  * reproduce every fingerprint with the established `list_reduce` fold
  * and the window selection with a windowed `min` + rightmost-argmax
  * join (cross-engine exact integers, no floats anywhere).
  *
  * Documents with fewer than k+w-1 characters have no full window and
  * return an EMPTY array (not null): winnowing's guarantee is vacuous
  * there, and downstream set algebra treats them as fingerprint-free.
  *
  * Rightmost-argmin positions are non-decreasing as the window slides,
  * so recording position changes yields a position-sorted, duplicate-
  * free output in a single O(n·w) pass with zero allocations beyond
  * the result.
  */
case class Winnow(child: Expression, k: Int, w: Int, base: Long, mod: Long)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "winnow needs k >= 1 and w >= 1")

  override def dataType: DataType = Winnow.ResultType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow requires a STRING child, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Winnow.select(input.asInstanceOf[UTF8String], k, w, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Winnow.select(
         |  $c, $k, $w, ${base}L, ${mod}L);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)

  override def prettyName: String = "winnow"
}

object Winnow {

  val ResultType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** The loop — shared by interpreted eval and generated code. */
  def select(s: UTF8String, k: Int, w: Int, base: Long, mod: Long): ArrayData = {
    val bytes = s.getBytes
    val m = bytes.length - k + 1 // number of k-grams
    if (m < w) return Empty
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * base + (bytes(i + j) & 0xff)) % mod
        j += 1
      }
      h(i) = acc
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var last = -1
    var start = 0
    while (start + w <= m) {
      var best = start
      var p = start + 1
      while (p < start + w) {
        if (h(p) <= h(best)) best = p // <= = rightmost tie-break
        p += 1
      }
      if (best != last) {
        out += new GenericInternalRow(Array[Any](best, h(best)))
        last = best
      }
      start += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column form with the corpus-wide parameters: 16-char grams,
    * window 8 → shared substrings of ≥ k+w-1 = 23 chars (≈ 4 tokens)
    * are guaranteed a match, density ~2/(w+1) ≈ 0.22 per gram. Grams
    * must be long enough to be DOC-specific: at 8 chars (~1.5 tokens)
    * nearly every fingerprint of a templated corpus is carried by more
    * than HotCap docs once the corpus grows 10×, and the stop-gram cap
    * (correctly) drops them all — measured 475 → 13 surviving pairs
    * from sf0.01 to sf0.1. At 16 chars fingerprints sit on doc-specific
    * token runs, which is what the MOSS parameterization (k in the
    * 25-50 char range for code/prose) is about. */
  def winnow(c: Column): Column = winnow(c, 16, 8, 31, 1000000007L)

  def winnow(c: Column, k: Int, w: Int, base: Long, mod: Long): Column =
    ColumnBridge.column(Winnow(ColumnBridge.expression(c), k, w, base, mod))
}
