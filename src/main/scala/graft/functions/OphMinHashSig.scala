package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-Permutation-Hashing MinHash signature (Li, Owen & Zhang, NIPS
  * 2012) with rotation densification (Shrivastava & Li, ICML 2014) —
  * the FAST variant of [[MinHashSig]]: instead of evaluating B affine
  * permutations per shingle (B multiply-mods + B compares), ONE hash is
  * split into (bin = h mod B, payload = h div B) and each bin keeps its
  * payload minimum — per shingle the inner loop is one mod, one div,
  * one compare. Collision probability per densified slot is ≈ Jaccard,
  * the same LSH guarantee, so banding and bucket caps are unchanged.
  *
  * Densification: an empty bin j borrows the payload of the NEAREST
  * non-empty bin to its right (circular) at distance k, offset by
  * k·[[OphMinHashSig.denseC]] — the offset keeps borrowed values
  * disjoint from genuine payloads (< mod/B) and from borrows at other
  * distances, so two docs' empty bins only collide when they borrow the
  * same value from the same distance (the Shrivastava-Li argument).
  * Deterministic, engine-replayable integer arithmetic throughout; the
  * DuckDB oracle reproduces bins, minima and borrows exactly.
  *
  * Same null contract as [[MinHashSig]]: fewer than 3 tokens → null
  * signature.
  */
case class OphMinHashSig(
    child: Expression,
    base: Long,
    mod: Long,
    shingleMult: Long,
    bins: Int)
    extends UnaryExpression {

  require(bins > 0, "oph_min_hash_sig needs at least one bin")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"oph_min_hash_sig requires ARRAY<STRING> input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    OphMinHashSig.sig(v.asInstanceOf[ArrayData], base, mod, shingleMult, bins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("ophRes")
      s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $res =
       |  graft.functions.OphMinHashSig.sig($v, ${base}L, ${mod}L, ${shingleMult}L, $bins);
       |if ($res == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OphMinHashSig =
    copy(child = newChild)

  override def prettyName: String = "oph_min_hash_sig"
}

object OphMinHashSig {

  /** Borrow offset per rotation step: strictly above the genuine
    * payload range [0, mod div bins], so borrows never alias real
    * minima and distinct borrow distances never alias each other
    * (bins·denseC + mod/bins < 2^63 by orders of magnitude). */
  def denseC(mod: Long, bins: Int): Long = mod / bins + 1L

  def sig(
      tokens: ArrayData,
      base: Long,
      mod: Long,
      shingleMult: Long,
      bins: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return null
    val th = new Array[Long](n)
    val thNull = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) thNull(i) = true
      else th(i) = PolyHash.fold(tokens.getUTF8String(i), base, mod)
      i += 1
    }
    val mins = new Array[Long](bins)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    i = 0
    while (i + 2 < n) {
      if (!thNull(i) && !thNull(i + 1) && !thNull(i + 2)) {
        any = true
        val h = ((th(i) * shingleMult + th(i + 1)) % mod * shingleMult + th(i + 2)) % mod
        val b = (h % bins).toInt
        val v = h / bins
        if (v < mins(b)) mins(b) = v
      }
      i += 1
    }
    if (!any) return null
    // rotation densification: empty bin j <- nearest non-empty to the
    // right (circular) + distance * C
    val c = denseC(mod, bins)
    val out = new Array[Long](bins)
    var j = 0
    while (j < bins) {
      if (mins(j) != Long.MaxValue) out(j) = mins(j)
      else {
        var k = 1
        while (mins((j + k) % bins) == Long.MaxValue) k += 1
        out(j) = mins((j + k) % bins) + k.toLong * c
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, base: Long, mod: Long, shingleMult: Long, bins: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(OphMinHashSig(
      org.apache.spark.sql.graft.ColumnBridge.expression(c),
      base, mod, shingleMult, bins))
}
