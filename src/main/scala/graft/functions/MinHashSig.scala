package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The whole MinHash signature — token hashes, 3-gram shingle
  * composition, and all NumPerms affine-permutation minima — as ONE
  * codegen expression over the token array: `tokens -> array<long>` of
  * the per-permutation minima.
  *
  * Replaces the explode-then-aggregate shape for SIGNATURE building
  * (shingle rows ≈ 50× the corpus, then a 32-column min groupBy back
  * down to one row per doc — measured 1.1 s + 0.5 s of the 3.7 s
  * `dedup_minhash_lsh` phases at sf0.1). A MIN is invariant under
  * duplicates, so the per-doc `array_distinct` the exploded form needs
  * to bound row count is simply unnecessary here: the loop feeds every
  * position-triple's hash into the 32 running minima directly. One
  * narrow scan, zero extra rows, zero shuffle.
  *
  * VALUE-IDENTICAL to the exploded form ([[graft.ops.DedupOps
  * .signaturesFromShingles]], kept as the spec's equality reference)
  * for every doc with ≥ 3 tokens: per-token hash is the exact
  * [[PolyHash.fold]]; the shingle hash is the same
  * `((th0·m + th1) mod p · m + th2) mod p` composition; the minima are
  * over the same multiset. Docs with FEWER than 3 tokens return a null
  * ARRAY here (downstream band-key folds null out element-wise; null
  * band keys still group together under the MaxBucket cap), where the
  * exploded form's out-of-range `_t[i+1]` subscript CRASHES under
  * Spark 4's default ANSI mode — a strict robustness improvement the
  * spec pins by contrast.
  */
case class MinHashSig(
    child: Expression,
    base: Long,
    mod: Long,
    shingleMult: Long,
    permA: IndexedSeq[Long],
    permB: IndexedSeq[Long])
    extends UnaryExpression {

  require(permA.nonEmpty && permA.length == permB.length,
    "min_hash_sig needs one (a, b) pair per permutation")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_hash_sig requires ARRAY<STRING> input, got ${t.catalogString}")
  }

  @transient private lazy val aArr: Array[Long] = permA.toArray
  @transient private lazy val bArr: Array[Long] = permB.toArray

  override def nullSafeEval(v: Any): Any =
    MinHashSig.sig(v.asInstanceOf[ArrayData], base, mod, shingleMult, aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minHashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minHashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("minHashRes")
      s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $res =
       |  graft.functions.MinHashSig.sig($v, ${base}L, ${mod}L, ${shingleMult}L, $aRef, $bRef);
       |if ($res == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "min_hash_sig"
}

object MinHashSig {

  /** The loop. Returns null (-> null signature array) when no complete
    * 3-token shingle exists — fewer than 3 tokens, or (defensively, the
    * tokenizer never produces one) a null token in every triple. */
  def sig(
      tokens: ArrayData,
      base: Long,
      mod: Long,
      shingleMult: Long,
      a: Array[Long],
      b: Array[Long]): ArrayData = {
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
    val mins = new Array[Long](a.length)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    i = 0
    while (i + 2 < n) {
      if (!thNull(i) && !thNull(i + 1) && !thNull(i + 2)) {
        any = true
        val h = ((th(i) * shingleMult + th(i + 1)) % mod * shingleMult + th(i + 2)) % mod
        var j = 0
        while (j < a.length) {
          val c = (a(j) * h + b(j)) % mod
          if (c < mins(j)) mins(j) = c
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  def apply(c: Column, base: Long, mod: Long, shingleMult: Long,
      perms: IndexedSeq[(Long, Long)]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c),
      base, mod, shingleMult, perms.map(_._1), perms.map(_._2)))
}
